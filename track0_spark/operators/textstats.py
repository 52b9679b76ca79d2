"""Text analysis operators: language-ID, quality scoring, token
counting, document fingerprinting. All pure Column expressions
(whole-stage codegen, zero Python) — these run per-document over the
full corpus, so staying JVM-side matters most here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from track0s import portable as P

#: tiny per-language stopword lists for the n-gram/stopword heuristic
#: language-ID. Deliberately small + frozen: deterministic and cheap;
#: a real model would be a broadcast table with the same plan shape.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "pas", "des", "une", "dans", "que"],
    "es": ["el", "la", "los", "y", "es", "no", "una", "con", "por", "que"],
    "pt": ["o", "a", "os", "e", "um", "uma", "com", "para", "por", "nao"],
    "it": ["il", "la", "i", "e", "un", "una", "con", "per", "non", "che"],
}


def tokens_expr(text_col: str) -> Column:
    return F.split(F.trim(F.lower(F.col(text_col))), P.TOKEN_SPLIT)


def token_count_expr(text_col: str) -> Column:
    return F.size(tokens_expr(text_col)).cast("bigint")


def langid_scores(df: DataFrame, text_col: str) -> DataFrame:
    """Per-language stopword-hit ratio columns + argmax ``lang_pred``."""
    toks = tokens_expr(text_col)
    out = df.withColumn("_toks", toks)
    score_cols = []
    for lang, words in STOPWORDS.items():
        lit_arr = F.array(*[F.lit(w) for w in words])
        score = (
            F.size(F.array_intersect(F.array_distinct(F.col("_toks")), lit_arr))
            / F.lit(len(words))
        ).alias(f"score_{lang}")
        out = out.withColumn(f"score_{lang}", score)
        score_cols.append(f"score_{lang}")
    # argmax via greatest + chained when (deterministic tie-break: dict order)
    best = F.greatest(*[F.col(c) for c in score_cols])
    pred = F.lit("und")
    for lang in reversed(list(STOPWORDS)):
        pred = F.when(
            (F.col(f"score_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return out.withColumn("lang_pred", pred).drop("_toks")


def quality_exprs(text_col: str) -> dict[str, Column]:
    """Quality-scoring feature columns (length/punct/stopword ratios)."""
    text = F.col(text_col)
    n_chars = F.length(text)
    n_tokens = token_count_expr(text_col)
    n_nonspace = F.length(F.regexp_replace(text, P.WS_CLASS, ""))
    n_punct = F.length(text) - F.length(
        F.regexp_replace(text, r"[^\w\s]", "")
    )
    n_digit = F.length(text) - F.length(F.regexp_replace(text, r"[0-9]", ""))
    return {
        "n_chars": n_chars.cast("bigint"),
        "n_tokens": n_tokens,
        "avg_token_len": F.round(n_nonspace / n_tokens, 4),
        "punct_ratio": F.round(n_punct / F.greatest(n_chars, F.lit(1)), 4),
        "digit_ratio": F.round(n_digit / F.greatest(n_chars, F.lit(1)), 4),
    }


def with_quality(df: DataFrame, text_col: str) -> DataFrame:
    out = df
    for name, col in quality_exprs(text_col).items():
        out = out.withColumn(name, col)
    return out


FP_MOD = 2_147_483_647  # 2^31 - 1; keeps the fold inside long range
FP_MUL = 1_000_003


def fingerprint_expr(text_col: str) -> Column:
    """Order-sensitive rolling document fingerprint: left fold of
    per-token PORTABLE char hashes (track0s/portable.py) with a
    polynomial accumulator, modular (ANSI-mode safe: acc < 2^31, so
    acc*MUL + h stays inside long). Same text -> same fingerprint on
    any partitioning (pure fold) — and on any ENGINE: the char-fold
    family is bit-identical in DuckDB SQL, so q26 is oracle-checked
    (the round-1 xxhash64 variant had no DuckDB twin)."""
    from .dedup import char_hash_sql

    tok_hash = char_hash_sql("t")
    return F.expr(
        f"aggregate(transform(split(trim(lower({text_col})), '{P.TOKEN_SPLIT_SPARK_LIT}'), "
        f"t -> {tok_hash}), CAST(0 AS BIGINT), "
        f"(acc, t) -> (acc * {FP_MUL} + t) % {FP_MOD})"
    )
