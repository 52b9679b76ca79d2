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


def fingerprint_kernel(words_col: str, keep_cols: tuple[str, ...] = ()):
    """mapInPandas kernel: (id, *keep, words) -> (id, *keep, n_tokens,
    fp) with ``fp`` bit-equal to fingerprint_expr's fold (r6, guide
    §4.2 — the per-character interpreted fold was q30's dominant cost).
    Exact-int closed form: fp = sum(tok_hash_t * FP_MUL^(T-1-t)) mod
    FP_MOD, all intermediates < 2^63 (see dedup.py kernel block)."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from .dedup import _cumsum0, _pow_mod, _word_hashes

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            docs = [list(w) for w in pdf[words_col]]
            mw = np.fromiter(
                (len(d) for d in docs), dtype=np.int64, count=len(docs)
            )
            flat: list[str] = [w for d in docs for w in d]
            h, _lens = _word_hashes(flat)
            ends = np.cumsum(mw)
            didx = np.repeat(np.arange(len(docs), dtype=np.int64), mw)
            k = ends[didx] - 1 - np.arange(int(mw.sum()), dtype=np.int64)
            pw = _pow_mod(FP_MUL, int(mw.max()) if len(mw) else 0)
            terms = h * pw[k] % FP_MOD
            fp = np.bincount(didx, weights=terms, minlength=len(docs)).astype(
                np.int64
            )
            fp %= FP_MOD
            out = {"id": pdf["id"]}
            for c in keep_cols:
                out[c] = pdf[c]
            out["n_tokens"] = mw
            out["fp"] = fp
            yield pd.DataFrame(out)

    return run


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


# --------------------------------------------------------------------------
# Gopher-style document quality rules (Rae et al. 2021, §A1.1 shape)
# --------------------------------------------------------------------------

#: words counted as stopword hits by the Gopher "contains at least N
#: stop words" rule. Frozen tiny set (same rationale as STOPWORDS).
GOPHER_STOPWORDS = ("the", "a")


def gopher_rules(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 30,
    max_words: int = 90,
    mwl_lo_x10: int = 39,
    mwl_hi_x10: int = 48,
    min_stop_hits: int = 2,
) -> DataFrame:
    """The Gopher rule family q36 does NOT cover (q36 has the
    repetition signals): word-count bounds, mean-word-length bounds,
    and the minimum-stopword-hits rule, composed into a keep decision
    (Rae et al. 2021 'Scaling Language Models: ... Gopher', quality
    appendix; thresholds here are tuned to the synthetic corpus, the
    paper's are constructor args).

    Every flag is computed in INTEGER arithmetic — the mean-word-length
    bound ``lo/10 <= sum(len)/n <= hi/10`` is evaluated as
    ``10*sum(len) between lo*n and hi*n`` — so the decision is
    bit-identical on any engine/partitioning; the reported
    ``mean_word_len`` is an int/int division rounded to 4dp (display
    only, never compared against). Scale shape: pure per-row Column
    fold over the token array, zero shuffle, whole-stage codegen."""
    w = F.split(F.col(text_col), " ")
    n = F.size(w).cast("bigint")
    sumlen = F.aggregate(
        w, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
    )
    stops = F.size(
        F.filter(w, lambda x: x.isin(*GOPHER_STOPWORDS))
    ).cast("bigint")
    rule_wc = (n >= min_words) & (n <= max_words)
    rule_mwl = (10 * sumlen >= mwl_lo_x10 * n) & (10 * sumlen <= mwl_hi_x10 * n)
    rule_stop = stops >= min_stop_hits
    return df.select(
        F.col(id_col),
        n.alias("n_words"),
        F.round(sumlen / n, 4).alias("mean_word_len"),
        stops.alias("stop_hits"),
        rule_wc.alias("rule_wordcount"),
        rule_mwl.alias("rule_wordlen"),
        rule_stop.alias("rule_stopwords"),
        (rule_wc & rule_mwl & rule_stop).alias("keep"),
    )
