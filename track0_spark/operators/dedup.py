"""Document deduplication operators for training-data pipelines.

Four tiers, cheapest first (all exact-arithmetic deterministic, seeded
from ``track0s.hashing.SEED`` — reruns give identical clusters):

  * exact           — md5 fingerprint hash-groupBy (native, no UDF)
  * ngram Jaccard   — all-pairs on a candidate subset (native arrays)
  * MinHash + LSH   — banded bucket join for candidates, estimated-
                      Jaccard verify; the 100 TB path: cost is
                      O(docs x bands) shuffle, never O(docs^2)
  * SimHash         — weighted-bit fingerprint, near-dups via banded
                      Hamming join (b bands of w bits finds all pairs
                      with distance <= b-1 by pigeonhole)

MinHash/SimHash each come in TWO hash-family flavors:

  * ``*_native_*`` — the PORTABLE family (track0s/portable.py):
    char-fold shingle hashes + seeded multiply-shift perms, evaluated
    entirely as whole-stage-codegen'd Columns (zero Python), and
    bit-identically expressible in DuckDB SQL — these back the
    oracle-checked contract queries q24/q25 AND are the 100 TB default
    (no Arrow crossing at all).
  * the numpy/blake2b variants below — the pluggable-hash path for
    callers who need a cryptographic-strength family; vectorized
    mapInPandas, rows-only checkable.

Scale notes: the LSH band join shuffles on (band, band_key) — skew
appears only when thousands of docs share a band key, which at 16
bands x 4 rows means they are near-identical anyway; AQE skew-join
handles the rest. The verify stage joins signatures, not texts, unless
``verify_exact`` pulls the shingle sets for true Jaccard.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from track0s.hashing import SEED

MERSENNE = (1 << 61) - 1


def _bind_words_sql(text_col: str, body_of_ws: str) -> str:
    """Evaluate the token split ONCE and bind it as lambda var ``ws``.

    Spark SQL has no let-binding, so naively interpolating the split
    expression into ``element_at(<split>, i + k)`` inside a transform
    lambda re-evaluates the O(doc-length) split for EVERY word access
    — measured 8.3s of q24's 12.9s signature stage at sf0.1 (quadratic
    in document size). ``element_at(transform(array(<split>), ws ->
    body), 1)`` computes the array one time and the lambda body indexes
    the bound value."""
    split = f"split(trim({text_col}), '{P.TOKEN_SPLIT_SPARK_LIT}')"
    return f"element_at(transform(array({split}), ws -> {body_of_ws}), 1)"


def shingles_expr(text_col: str, n: int = 3):
    """Native word-n-gram shingling (whitespace tokens, no UDF).

    Texts shorter than n tokens yield an empty array (guarded —
    ``sequence(0, negative)`` would otherwise generate a DESCENDING
    range and blow up element_at)."""
    grams = ", ".join(f"element_at(ws, i + {k + 1})" for k in range(n))
    return F.expr(
        _bind_words_sql(
            text_col,
            f"CASE WHEN size(ws) < {n} THEN array() "
            f"ELSE transform(sequence(0, size(ws) - {n}), "
            f"i -> concat_ws(' ', {grams})) END",
        )
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """-> (fp, n_dups, keeper): exact duplicate groups, keep-min policy."""
    return df.groupBy(F.md5(F.col(text_col)).alias("fp")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dups"),
        F.min(id_col).alias("keeper"),
    )


def _minhash_params(num_perm: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(SEED)
    a = rng.randint(1, MERSENNE, size=num_perm, dtype=np.int64)
    b = rng.randint(0, MERSENNE, size=num_perm, dtype=np.int64)
    return a, b


def _hash_shingles(shingles: list[str]) -> np.ndarray:
    import hashlib

    return np.fromiter(
        (
            int.from_bytes(
                hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big"
            )
            & 0x7FFF_FFFF_FFFF_FFFF
            for s in shingles
        ),
        dtype=np.int64,
        count=len(shingles),
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 64,
    shingle_n: int = 3,
) -> DataFrame:
    """-> (id, sig: array<bigint>[num_perm]) via one vectorized pass."""
    a, b = _minhash_params(num_perm)

    def sig_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sigs = [], []
            for i, text in zip(pdf[id_col], pdf[text_col]):
                toks = str(text).split()
                sh = [
                    " ".join(toks[j : j + shingle_n])
                    for j in range(max(0, len(toks) - shingle_n + 1))
                ]
                if not sh:
                    sigs.append(np.full(num_perm, MERSENNE, dtype=np.int64))
                    ids.append(i)
                    continue
                h = _hash_shingles(sh).astype(np.uint64)  # [n_sh]
                # multiply-shift permutation family, wrapping uint64
                # arithmetic (standard for MinHash; exact-deterministic)
                m = (
                    a.astype(np.uint64)[:, None] * h[None, :]
                    + b.astype(np.uint64)[:, None]
                ).min(axis=1)
                sigs.append((m >> np.uint64(1)).astype(np.int64))  # keep signed
                ids.append(i)
            yield pd.DataFrame({"id": ids, "sig": sigs})

    return df.select(F.col(id_col).alias(id_col), text_col).mapInPandas(
        sig_batches, f"id {_spark_type(df, id_col)}, sig array<bigint>"
    )


def _spark_type(df: DataFrame, col: str) -> str:
    return dict(df.dtypes)[col]


def lsh_candidate_pairs(
    sig_df: DataFrame, bands: int = 16, rows_per_band: int = 4
) -> DataFrame:
    """Banded LSH: docs sharing any band signature -> candidate pair.

    Returns distinct (id_a, id_b) with id_a < id_b. Shuffle key is
    (band, xxhash64 of the band's signature slice) — never all-pairs.
    """
    slices = F.array(
        *[
            F.xxhash64(
                F.lit(bi),
                *[F.col("sig")[bi * rows_per_band + ri] for ri in range(rows_per_band)],
            )
            for bi in range(bands)
        ]
    )
    banded = sig_df.select(
        "id", F.posexplode(slices).alias("band", "band_hash")
    )
    a = banded.select(
        F.col("id").alias("id_a"), "band", F.col("band_hash").alias("bh_a")
    )
    b = banded.select(
        F.col("id").alias("id_b"), "band", F.col("band_hash").alias("bh_b")
    )
    return (
        a.join(
            b,
            (a.band == b.band) & (a.bh_a == b.bh_b) & (a.id_a < b.id_b),
        )
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_estimated_similarity(
    sig_df: DataFrame, pairs: DataFrame
) -> DataFrame:
    """Estimated Jaccard = fraction of equal signature slots."""
    sa = sig_df.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sig_df.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    est = (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "est_jaccard",
            F.aggregate(
                F.zip_with(
                    "sig_a", "sig_b", lambda x, y: (x == y).cast("int")
                ),
                F.lit(0),
                lambda acc, x: acc + x,
            )
            / F.size("sig_a"),
        )
    )
    return est.select("id_a", "id_b", "est_jaccard")


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    num_perm: int = 64,
    bands: int = 16,
    handles: list | None = None,
) -> DataFrame:
    """End-to-end MinHash LSH near-dup pairs >= threshold (estimated).

    The signature DataFrame is persisted (read 3x: band explode + both
    sides of the similarity join). Pass ``handles`` to receive the
    persisted DF and unpersist it once the result is materialized —
    otherwise the cache lives until the session ends (fine for one-shot
    jobs, a leak in long-lived sessions; same pattern as
    operators/topk.select_batch)."""
    rows = num_perm // bands
    sig = minhash_signatures(df, id_col, text_col, num_perm).persist()
    if handles is not None:
        handles.append(sig)
    # docs with NO shingles (sentinel signature) cannot be near-dups by
    # shingle definition — and all share one signature, so leaving them
    # in makes the band join quadratic on that subset and reports
    # unrelated short docs as est=1.0 pairs
    pairs = lsh_candidate_pairs(
        sig.filter(F.col("sig")[0] != F.lit(MERSENNE)), bands, rows
    )
    est = minhash_estimated_similarity(sig, pairs)
    return est.filter(F.col("est_jaccard") >= threshold)


# ------------------- portable native family (q24/q25) ---------------------
# Constants + pure reference in track0s/portable.py; the SQL twins live
# in contract.py. Three-way bit-equality (Spark/DuckDB/Python) is
# pytest-asserted in tests/test_portable.py.

from track0s import portable as P


def char_hash_sql(var: str, mul: int = P.CHAR_MUL, bias: int = 0) -> str:
    """Spark-SQL fragment: portable char-fold hash of string ``var``."""
    plus = f" + {bias}" if bias else ""
    return (
        f"aggregate(split({var}, ''), CAST(0 AS BIGINT), "
        f"(a, c) -> (a * {mul} + ascii(c){plus}) % {P.MOD})"
    )


def _shingle_sql(text_col: str, n: int = 3) -> str:
    grams = ", ".join(f"element_at(ws, i + {k + 1})" for k in range(n))
    return _bind_words_sql(
        text_col,
        f"CASE WHEN size(ws) < {n} THEN array() "
        f"ELSE array_distinct(transform(sequence(0, size(ws) - {n}), "
        f"i -> concat_ws(' ', {grams}))) END",
    )


def _shingle_hash_sql(text_col: str, n: int = 3) -> str:
    """Shingle-hash array WITHOUT building shingle strings.

    ``char_hash`` is a polynomial fold, so it composes over
    concatenation: ``H(a+b) = (H(a) * MUL^len(b) + H(b)) % MOD``. One
    fused scan per word yields ``(h, p) = (char_hash(w),
    MUL^len(w) % MOD)``; each n-gram hash is then O(n) arithmetic —
    every word is scanned ONCE instead of once per covering shingle,
    and no shingle string is ever allocated (measured ~15% on q24's
    warmed signature stage at sf0.1; the bigger effect at corpus scale
    is allocating zero intermediate strings — shingle text is ~3x the
    corpus bytes of garbage per pass). Empty words hash as one
    zero-codepoint fold step
    (h=0, the engine split('') semantics) but contribute ZERO chars to
    the concatenation, so their power term is pinned to 1 — exactly
    the neutral element the identity needs.

    Duplicate shingles are NOT deduped here (the string path
    array_distincts for the q19/q20 counting queries): min() over the
    perm-mapped hashes is invariant under duplicates, so signatures
    are bit-identical to hashing the distinct shingle strings."""
    wh = (
        f"transform(ws, w -> aggregate(split(w, ''), "
        f"named_struct('h', CAST(0 AS BIGINT), 'p', CAST(1 AS BIGINT)), "
        f"(a, c) -> named_struct("
        f"'h', (a.h * {P.CHAR_MUL} + ascii(c)) % {P.MOD}, "
        f"'p', (a.p * {P.CHAR_MUL}) % {P.MOD}), "
        f"acc -> named_struct('h', acc.h, "
        f"'p', CASE WHEN w = '' THEN CAST(1 AS BIGINT) ELSE acc.p END)))"
    )
    acc = "element_at(wh, i + 1).h"
    for k in range(1, n):
        w = f"element_at(wh, i + {k + 1})"
        acc = f"((({acc}) * {P.CHAR_MUL} + 32) % {P.MOD})"  # append ' '
        acc = f"((({acc}) * {w}.p + {w}.h) % {P.MOD})"  # append word k
    body = (
        f"CASE WHEN size(ws) < {n} THEN array() "
        f"ELSE element_at(transform(array({wh}), wh -> "
        f"transform(sequence(0, size(ws) - {n}), i -> {acc})), 1) END"
    )
    return _bind_words_sql(text_col, body)


# ------------- exact-integer vectorized kernels (r6, guide §4.2) ----------
#
# The pure-Column signature stages fold per CHARACTER through
# interpreted higher-order functions (`aggregate(split(w,''))` is
# CodegenFallback — a lambda interpreter step per codepoint), which
# measured as the dominant cost of q24/q25/q39. All the arithmetic is
# integer mod 2^31-1, so numpy int64 reproduces it EXACTLY (every
# intermediate < 2^63 — the portable.py invariant): the char fold
# acc=(acc*mul+cp+bias)%M equals the closed form
# sum((cp_i+bias)*mul^(L-1-i)) mod M, the word-compose identity is the
# one _shingle_hash_sql already uses, and min/bit-count are order-free.
# Tokenization stays in the JVM (`split(trim(text), ..)`) so the
# engine-normative token semantics (portable.py WS_CLASS) are shared,
# not re-implemented. Bit-equality expr==arrow is pinned in
# tests/test_training_ops.py.

_POW_CACHE: dict[int, "np.ndarray"] = {}


def _pow_mod(mul: int, upto: int) -> np.ndarray:
    """[mul^0, mul^1, ... mul^upto] mod P.MOD as int64."""
    tbl = _POW_CACHE.get(mul)
    if tbl is None or len(tbl) <= upto:
        n = max(upto + 1, 4096)
        out = np.empty(n, dtype=np.int64)
        out[0] = 1
        acc = 1
        for i in range(1, n):
            acc = (acc * mul) % P.MOD
            out[i] = acc
        _POW_CACHE[mul] = tbl = out
    return tbl


def _word_hashes(words: list[str], mul: int = P.CHAR_MUL, bias: int = 0):
    """(h, lens) for a flat word list: h = portable char_hash per word
    (engine split('') semantics: the empty word folds ONE zero-codepoint
    step => hash == bias)."""
    lens = np.fromiter((len(w) for w in words), dtype=np.int64, count=len(words))
    total = int(lens.sum())
    if total:
        cp = np.frombuffer(
            "".join(words).encode("utf-32-le"), dtype=np.uint32
        ).astype(np.int64)
    else:
        cp = np.zeros(0, dtype=np.int64)
    ends = np.cumsum(lens)
    widx = np.repeat(np.arange(len(words), dtype=np.int64), lens)
    k = ends[widx] - 1 - np.arange(total, dtype=np.int64)
    pw = _pow_mod(mul, int(lens.max()) if len(lens) else 0)
    terms = (cp + bias) * pw[k] % P.MOD
    # per-word sums: bincount accumulates float64 — exact for sums
    # < 2^53 (terms < 2^31 => words up to 4M chars; asserted)
    assert int(lens.max() if len(lens) else 0) < (1 << 22), "word too long"
    h = np.bincount(widx, weights=terms, minlength=len(words)).astype(np.int64)
    h %= P.MOD
    if bias:
        h[lens == 0] = bias % P.MOD
    return h, lens


def _cumsum0(a: np.ndarray) -> np.ndarray:
    out = np.zeros(len(a) + 1, dtype=np.int64)
    np.cumsum(a, out=out[1:])
    return out


def _doc_gram_hashes(docs: list[list[str]], n: int):
    """Word-n-gram portable hashes for a batch of token lists, via the
    word-compose identity (the _shingle_hash_sql arithmetic, exact
    int64). Returns (mw, sc, acc): words per doc, grams per doc, and
    the flat gram-hash array in (doc, position) order."""
    mw = np.fromiter((len(d) for d in docs), dtype=np.int64, count=len(docs))
    flat: list[str] = [w for d in docs for w in d]
    h, lens = _word_hashes(flat)
    p = _pow_mod(P.CHAR_MUL, int(lens.max()) if len(lens) else 0)[lens]
    p = np.where(lens == 0, 1, p)  # empty word: neutral power
    dws = _cumsum0(mw)[:-1]
    sc = np.maximum(mw - (n - 1), 0)
    sdi = np.repeat(np.arange(len(docs), dtype=np.int64), sc)
    local = np.arange(int(sc.sum()), dtype=np.int64) - np.repeat(
        _cumsum0(sc)[:-1], sc
    )
    g0 = dws[sdi] + local
    acc = h[g0]
    for kk in range(1, n):
        acc = (acc * P.CHAR_MUL + 32) % P.MOD  # append ' '
        acc = (acc * p[g0 + kk] + h[g0 + kk]) % P.MOD
    return mw, sc, acc


def _band_keys_np(sigs: np.ndarray) -> np.ndarray:
    """[n, NUM_BANDS] band-fold keys from [n, NUM_PERM] signatures —
    the _band_keys_expr arithmetic, exact int64."""
    keys = np.empty((len(sigs), P.NUM_BANDS), dtype=np.int64)
    for b in range(P.NUM_BANDS):
        acc = np.zeros(len(sigs), dtype=np.int64)
        for r in range(P.ROWS_PER_BAND):
            acc = (acc * P.BAND_MUL + sigs[:, b * P.ROWS_PER_BAND + r]) % P.MOD
        keys[:, b] = acc
    return keys


def _minhash_sig_kernel(words_col: str, shingle_n: int, with_bands: bool = False):
    """mapInPandas kernel: (id, words) -> (id, sig[64][, bands[16]])
    bit-equal to the expr path (word-compose shingle hashes, 64 seeded
    perm minima, optional band-fold keys)."""
    A = np.array([a for a, _ in P.PERMS], dtype=np.int64)
    B = np.array([b for _, b in P.PERMS], dtype=np.int64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            docs = [list(w) for w in pdf[words_col]]
            mw, sc, acc = _doc_gram_hashes(docs, shingle_n)
            has = sc > 0
            X = (acc[:, None] * A[None, :] + B[None, :]) % P.MOD  # [S, 64]
            sigs = np.full((len(docs), P.NUM_PERM), P.EMPTY_SIG, dtype=np.int64)
            if int(has.sum()):
                starts = _cumsum0(sc[has])[:-1]
                sigs[has] = np.minimum.reduceat(X, starts, axis=0)
            out = {"id": pdf["id"], "sig": list(sigs)}
            if with_bands:
                out["bands"] = list(_band_keys_np(sigs))
            yield pd.DataFrame(out)

    return run


def gram_bucket_kernel(words_col: str, keep_cols: tuple[str, ...], n: int, buckets: int):
    """mapInPandas kernel: (id, *keep, words) -> one row per word
    n-gram: (id, *keep, bucket) where bucket = portable char_hash of
    the space-joined gram mod ``buckets`` — bit-equal to exploding the
    gram strings and char-folding them (q41's DSIR featurizer; the
    interpreted per-character fold over every gram was its dominant
    cost, r6 guide §4.2)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            docs = [list(w) for w in pdf[words_col]]
            mw, sc, acc = _doc_gram_hashes(docs, n)
            didx = np.repeat(np.arange(len(docs), dtype=np.int64), sc)
            out = {"id": pdf["id"].to_numpy()[didx]}
            for c in keep_cols:
                out[c] = pdf[c].to_numpy()[didx]
            out["bucket"] = acc % buckets
            yield pd.DataFrame(out)

    return run


def _simhash_kernel(words_col: str):
    """mapInPandas kernel: (id, words) -> (id, simhash) bit-equal to
    simhash_from_tokens_expr (62-bit majority fingerprint)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            docs = [list(w) for w in pdf[words_col]]
            mw = np.fromiter((len(d) for d in docs), dtype=np.int64, count=len(docs))
            flat: list[str] = [w for d in docs for w in d]
            h1, _ = _word_hashes(flat)
            h2, _ = _word_hashes(flat, P.CHAR_MUL2, 1)
            h62 = h1 + (h2 << 31)
            bits = (h62[:, None] >> np.arange(P.SIMHASH_BITS, dtype=np.int64)) & 1
            starts = _cumsum0(mw)[:-1]
            # split(text) always yields >= 1 token ([''] for empty), so
            # every reduceat segment is non-empty
            ones = np.add.reduceat(bits, starts, axis=0)  # [n, 62]
            fp = (
                ((2 * ones > mw[:, None]).astype(np.int64))
                << np.arange(P.SIMHASH_BITS, dtype=np.int64)
            ).sum(axis=1)
            yield pd.DataFrame({"id": pdf["id"], "simhash": fp})

    return run


def _with_words(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, words) with the NORMATIVE JVM tokenizer — the same
    split(trim(text)) every engine twin uses (portable.py WS_CLASS)."""
    return df.select(
        F.col(id_col).alias("id"),
        F.expr(
            f"split(trim({text_col}), '{P.TOKEN_SPLIT_SPARK_LIT}')"
        ).alias("_words"),
    )


def minhash_native_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    impl: str = "arrow",
) -> DataFrame:
    """-> (id, sig array<bigint>[64]) in the portable hash family.

    ``impl="arrow"`` (default since r6): JVM tokenization + one
    vectorized mapInPandas pass (exact int64 arithmetic — see the
    kernel block comment). ``impl="expr"``: the original pure-Column
    fold — the DuckDB-twin verification form (stage 1 computes shingle
    hashes via the composed word-scan ``_shingle_hash_sql``; stage 2
    takes the 64 seeded multiply-shift minima)."""
    if impl == "arrow":
        id_t = _spark_type(df, id_col)
        return _with_words(df, id_col, text_col).mapInPandas(
            _minhash_sig_kernel("_words", shingle_n),
            f"id {id_t}, sig array<bigint>",
        )
    d = df.select(F.col(id_col).alias("id"), text_col).withColumn(
        "_hs", F.expr(_shingle_hash_sql(text_col, shingle_n))
    )
    slots = ", ".join(
        f"CASE WHEN size(_hs) = 0 THEN CAST({P.EMPTY_SIG} AS BIGINT) ELSE "
        f"array_min(transform(_hs, x -> (CAST({a} AS BIGINT) * x + {b}) % {P.MOD})) END"
        for a, b in P.PERMS
    )
    return d.select("id", F.expr(f"array({slots})").alias("sig"))


def _band_keys_expr() -> str:
    """16 band keys: fold of each 4-slot signature slice (portable)."""
    keys = []
    for b in range(P.NUM_BANDS):
        acc = "CAST(0 AS BIGINT)"
        for r in range(P.ROWS_PER_BAND):
            acc = f"((({acc}) * {P.BAND_MUL} + sig[{b * P.ROWS_PER_BAND + r}]) % {P.MOD})"
        keys.append(acc)
    return "array(" + ", ".join(keys) + ")"


def minhash_native_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    handles: list | None = None,
    signatures: DataFrame | None = None,
    impl: str = "arrow",
) -> DataFrame:
    """Oracle-expressible MinHash LSH near-dup pairs >= threshold:
    (id_a, id_b, est_jaccard), est = equal-slot fraction.

    Pass ``signatures`` (an (id, sig) DataFrame from
    ``minhash_native_signatures``, already persisted by the caller) to
    reuse signatures computed once across several consumers — e.g. the
    incremental corpus job bands the same signatures within-batch AND
    against the prior corpus index."""
    if signatures is not None:
        sig = signatures
        bands_col = None
    elif impl == "arrow":
        # the kernel emits the 16 band-fold keys alongside the
        # signature (same int64 arithmetic as _band_keys_expr — one
        # vectorized pass instead of a 64-step interpreted fold per doc)
        id_t = _spark_type(df, id_col)
        sig = (
            _with_words(df, id_col, text_col)
            .mapInPandas(
                _minhash_sig_kernel("_words", 3, with_bands=True),
                f"id {id_t}, sig array<bigint>, bands array<bigint>",
            )
            .persist()
        )
        bands_col = "bands"
        if handles is not None:
            handles.append(sig)
    else:
        sig = minhash_native_signatures(df, id_col, text_col, impl=impl).persist()
        bands_col = None
        if handles is not None:
            handles.append(sig)
    # exclude no-shingle docs from banding (EMPTY_SIG = MOD is
    # unreachable by any real minimum, so the test is exact): they all
    # share the sentinel signature, which would otherwise band-join
    # every short/empty doc against every other (O(n^2) on that subset)
    # and report unrelated docs as est_jaccard=1.0 near-dups
    banded = sig.filter(F.col("sig")[0] != F.lit(P.EMPTY_SIG)).select(
        "id",
        F.posexplode(
            F.col(bands_col) if bands_col else F.expr(_band_keys_expr())
        ).alias("band", "key"),
    )
    a = banded.select(F.col("id").alias("id_a"), "band", "key")
    b = banded.select(F.col("id").alias("id_b"), "band", "key")
    pairs = (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    est = minhash_estimated_similarity(sig, pairs)
    return est.filter(F.col("est_jaccard") >= threshold)


def minhash_cross_pairs(
    sig_new: DataFrame, sig_prior: DataFrame, threshold: float = 0.7
) -> DataFrame:
    """Near-dup pairs BETWEEN two signature sets — the incremental
    corpus shape: every new-batch doc is checked against the PRIOR
    corpus's persisted MinHash index, never new-vs-new (that is the
    within-batch job's work) and never prior-vs-prior (already
    resolved when the prior corpus was built).

    -> (id_new, id_prior, est_jaccard >= threshold).  Band keys of the
    new batch hash-join the prior index's band keys (the prior side at
    10^10 docs is the big one: it stays partitioned by (band, key) on
    disk and is never broadcast or re-signed; each append only signs
    and shuffles the delta).  Estimated Jaccard = equal-slot fraction,
    same estimator as the within-batch path."""
    keys = F.expr(_band_keys_expr())
    bn = sig_new.filter(F.col("sig")[0] != F.lit(P.EMPTY_SIG)).select(
        F.col("id").alias("id_new"), F.posexplode(keys).alias("band", "key")
    )
    bo = sig_prior.filter(F.col("sig")[0] != F.lit(P.EMPTY_SIG)).select(
        F.col("id").alias("id_prior"), F.posexplode(keys).alias("band", "key")
    )
    # narrow (id, band, key) rows through the join + distinct; the fat
    # 64-slot signatures join back onto the deduplicated candidates
    cand = bn.join(bo, ["band", "key"]).select("id_new", "id_prior").distinct()
    est = (
        cand.join(
            sig_new.select(
                F.col("id").alias("id_new"), F.col("sig").alias("sig_a")
            ),
            "id_new",
        )
        .join(
            sig_prior.select(
                F.col("id").alias("id_prior"), F.col("sig").alias("sig_b")
            ),
            "id_prior",
        )
        .withColumn(
            "est_jaccard",
            F.aggregate(
                F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
                F.lit(0),
                lambda acc, x: acc + x,
            )
            / F.size("sig_a"),
        )
    )
    return est.filter(F.col("est_jaccard") >= threshold).select(
        "id_new", "id_prior", "est_jaccard"
    )


def simhash_tokens_expr(text_col: str) -> F.Column:
    """Portable 62-bit token hashes of a document (array<bigint>)."""
    words = f"split(trim({text_col}), '{P.TOKEN_SPLIT_SPARK_LIT}')"
    th62 = f"({char_hash_sql('t')}) + shiftleft({char_hash_sql('t', P.CHAR_MUL2, 1)}, 31)"
    return F.expr(f"transform({words}, t -> {th62})")


def simhash_from_tokens_expr(th_col: str = "_th") -> F.Column:
    """62-bit SimHash from a token-hash array column.

    62 independent primitive long folds (one per bit) rather than one
    fold with an array accumulator — the array variant allocates a
    fresh 62-slot array per token and measured ~20 ms/doc at sf0.1;
    primitive folds stay in codegen'd scalar code."""
    bits = " + ".join(
        f"IF(2 * aggregate({th_col}, CAST(0 AS BIGINT), "
        f"(a, h) -> a + (shiftright(h, {i}) & 1)) > size({th_col}), "
        f"CAST({1 << i} AS BIGINT), CAST(0 AS BIGINT))"
        for i in range(P.SIMHASH_BITS)
    )
    return F.expr(bits)


def simhash_native_expr(text_col: str) -> F.Column:
    """Portable 62-bit SimHash fingerprint as one Column expression.
    (Composition helper — callers that reuse the token-hash array
    should stage it with simhash_tokens_expr to hash each token once.)"""
    return simhash_from_tokens_expr(
        f"transform(split(trim({text_col}), '{P.TOKEN_SPLIT_SPARK_LIT}'), t -> "
        f"({char_hash_sql('t')}) + shiftleft({char_hash_sql('t', P.CHAR_MUL2, 1)}, 31))"
    )


def simhash_native_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    handles: list | None = None,
    impl: str = "arrow",
) -> DataFrame:
    """Portable SimHash near-dup pairs via the 4 x 16-bit banded Hamming
    join — full recall guaranteed for distance <= 3 (pigeonhole); the
    default enforces that bound. ``impl`` picks the signature stage:
    "arrow" (vectorized exact-int kernel, default since r6) or "expr"
    (pure-Column folds, the DuckDB-twin verification form)."""
    assert max_hamming <= 3, "4x16 banding guarantees recall only to d<=3"
    if impl == "arrow":
        sig = (
            _with_words(df, id_col, text_col)
            .mapInPandas(
                _simhash_kernel("_words"),
                f"id {_spark_type(df, id_col)}, simhash bigint",
            )
            .persist()
        )
    else:
        # stage the token-hash array as its own column so each token is
        # hashed ONCE (Catalyst won't inline a non-cheap
        # multi-referenced alias into the 62 per-bit folds)
        sig = (
            df.select(
                F.col(id_col).alias("id"),
                simhash_tokens_expr(text_col).alias("_th"),
            )
            .select("id", simhash_from_tokens_expr("_th").alias("simhash"))
            .persist()
        )
    if handles is not None:
        handles.append(sig)
    bands = F.array(
        *[
            F.shiftright("simhash", 16 * i).bitwiseAND(F.lit(0xFFFF))
            for i in range(4)
        ]
    )
    banded = sig.select("id", "simhash", F.posexplode(bands).alias("band", "key"))
    a = banded.select(
        F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"), "band", "key"
    )
    b = banded.select(
        F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"), "band", "key"
    )
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
    )
    ham = cand.withColumn(
        "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    )
    return ham.filter(F.col("hamming") <= max_hamming).select(
        "id_a", "id_b", "hamming"
    )


# ---------------------------- SimHash ------------------------------------


def simhash_udf_batches(id_col: str, text_col: str):
    """Vectorized SimHash (numpy): per-token 64-bit hash, signed bit-sum,
    sign bit -> fingerprint bit."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = []
            for text in pdf[text_col]:
                toks = str(text).split()
                if not toks:
                    out.append(0)
                    continue
                hs = np.fromiter(
                    (
                        int.from_bytes(
                            hashlib.blake2b(t.encode(), digest_size=8).digest(),
                            "big",
                        )
                        for t in toks
                    ),
                    dtype=np.uint64,
                    count=len(toks),
                )
                bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
                    np.int32
                )
                v = (bits * 2 - 1).sum(axis=0)
                sh = np.uint64(0)
                for bit in np.nonzero(v > 0)[0]:
                    sh |= np.uint64(1) << np.uint64(bit)
                out.append(int(sh & np.uint64(0x7FFF_FFFF_FFFF_FFFF)))
            yield pd.DataFrame({"id": pdf[id_col], "simhash": pd.Series(out, dtype="int64")})

    return run


def simhash_near_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    handles: list | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash banded Hamming join.

    RECALL BOUND: 4 x 16-bit bands guarantee full recall only for
    Hamming distance <= 3 (pigeonhole: any 4-band split of <=3 flipped
    bits leaves one band intact). Callers asking for ``max_hamming > 3``
    get correct-as-computed but PARTIAL results — pairs differing in all
    four bands are invisible to the join. Guaranteed recall at higher
    distances needs more/narrower bands (b bands of 64/b bits cover
    d <= b-1).

    ``handles`` receives the persisted signature DF for caller-managed
    unpersist (see minhash_dedup_pairs)."""
    if max_hamming > 3:
        import warnings

        warnings.warn(
            f"simhash_near_pairs(max_hamming={max_hamming}): 4x16-bit "
            "banding guarantees recall only to distance 3; results above "
            "that are best-effort",
            stacklevel=2,
        )
    sig = df.mapInPandas(
        simhash_udf_batches(id_col, text_col),
        f"id {_spark_type(df, id_col)}, simhash bigint",
    ).persist()
    if handles is not None:
        handles.append(sig)
    bands = F.array(
        *[
            F.shiftright("simhash", 16 * i).bitwiseAND(F.lit(0xFFFF))
            for i in range(4)
        ]
    )
    banded = sig.select("id", "simhash", F.posexplode(bands).alias("band", "key"))
    a = banded.select(
        F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"), "band", "key"
    )
    b = banded.select(
        F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"), "band", "key"
    )
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
    )
    ham = cand.withColumn(
        "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    )
    return ham.filter(F.col("hamming") <= max_hamming).select(
        "id_a", "id_b", "hamming"
    )


# --------------------------------------------------------------------------
# paragraph-granularity cross-document dedup (RefinedWeb / Falcon shape)
# --------------------------------------------------------------------------


def paragraph_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 10,
    hashed: bool = True,
) -> DataFrame:
    """Paragraph-granularity EXACT dedup across the whole corpus
    (the RefinedWeb/Falcon 'remove duplicated spans, keep documents'
    discipline — Penedo et al. 2023 — as opposed to q43's Lee-et-al
    duplication PROFILE which only measures): split each document into
    fixed ``chunk_words``-word paragraphs, keep exactly ONE occurrence
    of every distinct paragraph corpus-wide (the lexicographically
    first (doc, position) — deterministic on any partitioning), remove
    the rest, and reconstruct each document's cleaned text from its
    kept paragraphs in original order.

    Returns (id, n_paras, n_removed, dup_frac, text_clean). All
    counts are integers and dup_frac is an int/int division, so the
    output is bit-stable across partitionings and engines (no float
    accumulation anywhere — the q01 lesson).

    Scale shape: one explode over the corpus; the keeper group-by runs
    on int64 ``xxhash64(paragraph)`` keys when ``hashed`` (8-byte
    shuffle keys instead of ~60-char strings — the q37/q43 trick; a
    collision at 10^10 paragraphs is ~1e-7 per bucket and could only
    drop one extra paragraph). The keeper table joins back on that
    same key (plain hash join, nothing broadcast, no skew: a paragraph
    shared by millions of docs lands in one group but its keeper row
    is 1 row; Catalyst broadcasts the keeper side only while its stats
    say it is small — at corpus scale it shuffles), then one final
    group-by on the doc id reassembles the text with a sorted-struct
    fold — no window, no driver state.
    The (doc, position) occurrence key is packed as
    ``id * POS_PACK + pos``; POS_PACK bounds paragraphs per doc, far
    above any real document at chunk_words >= 10."""
    POS_PACK = 1 << 20
    # the split is BOUND as a column before the paragraph transform —
    # inlining it re-evaluates the O(doc) split for every paragraph
    # access (the _bind_words_sql trap; measured ~10x on the gram
    # explode shape at sf0.1, r6)
    paras = F.expr(
        f"transform(sequence(0, cast(ceil(size(_ws)/{chunk_words}.0) - 1 as int)), "
        f"g -> struct(cast(g as bigint) as pos, "
        f"concat_ws(' ', slice(_ws, g*{chunk_words}+1, {chunk_words})) as para))"
    )
    occ = df.select(
        F.col(id_col).alias("_id"),
        F.split(F.col(text_col), " ").alias("_ws"),
    ).select(
        F.col("_id"), F.explode(paras).alias("o")
    ).select(
        "_id",
        F.col("o.pos").alias("pos"),
        F.col("o.para").alias("para"),
        (F.col("_id") * POS_PACK + F.col("o.pos")).alias("okey"),
    )
    key = F.xxhash64("para") if hashed else F.col("para")
    occ = occ.withColumn("pkey", key)
    keepers = occ.groupBy("pkey").agg(F.min("okey").alias("keep_key"))
    flagged = occ.join(keepers, "pkey").withColumn(
        "kept", F.col("okey") == F.col("keep_key")
    )
    return flagged.groupBy(F.col("_id").alias(id_col)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_paras"),
        F.sum(F.when(~F.col("kept"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_removed"),
        F.round(
            F.sum(F.when(~F.col("kept"), 1).otherwise(0))
            / F.count(F.lit(1)),
            4,
        ).alias("dup_frac"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("kept"), F.struct("pos", "para"))
                    )
                ),
                lambda x: x["para"],
            ),
        ).alias("text_clean"),
    )
