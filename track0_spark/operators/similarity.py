"""Similarity search over embedding columns (``array<float>``).

Baseline: brute-force cosine top-k with a native fold (no UDF, no
collect — the score is one codegen'd expression, top-k is TakeOrdered).
Scale path: random-hyperplane LSH bucketing — each vector gets a
``planes``-bit signature; a query probes only buckets within a small
Hamming radius of its own signature, turning a full scan into a
bucket-pruned scan. Hyperplanes are seeded (track0s SEED) so bucket
assignments are reproducible across runs and cluster sizes.

At 100 TB: bucket signatures are computed once at ingest (one
vectorized pass), stored as a column, and the bucket id is a partition
key — a probe then prunes partitions at the storage layer instead of
scanning; the brute-force stage runs only inside surviving buckets.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from track0s.hashing import SEED


def cosine_score_expr(vec_col: str, query: list[float]):
    """Native cosine(vec, literal query) as a codegen'd fold."""
    qarr = F.array(*[F.lit(float(v)) for v in query])
    emb = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(emb, qarr, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    na = F.sqrt(
        F.aggregate(F.transform(emb, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    nq = float(np.sqrt(sum(v * v for v in query)))
    return dot / (na * F.lit(nq))


def brute_force_topk(
    df: DataFrame, id_col: str, vec_col: str, query: list[float], k: int = 10
) -> DataFrame:
    return (
        df.select(id_col, cosine_score_expr(vec_col, query).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, planes: int) -> np.ndarray:
    rng = np.random.RandomState(SEED)
    return rng.standard_normal((planes, dim)).astype(np.float64)


def lsh_signature_batches(id_col: str, vec_col: str, dim: int, planes: int):
    """Vectorized bucket signatures: one matmul per Arrow batch."""
    H = _hyperplanes(dim, planes)
    weights = (1 << np.arange(planes, dtype=np.int64))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            M = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            bits = (M @ H.T) > 0  # [n, planes]
            sig = (bits.astype(np.int64) * weights).sum(axis=1)
            yield pd.DataFrame({"id": pdf[id_col], "bucket": sig})

    return run


def lsh_bucket_expr(vec_col: str, dim: int, planes: int):
    """Native bucket signature: bit p set iff the SEQUENTIAL-left-fold
    dot(vec, hyperplane_p) > 0. The fold order is the point — Python's
    plain loop, Spark's ``aggregate`` and DuckDB's ``list_reduce`` all
    evaluate the identical IEEE-754 sum, so bucket assignments are
    bit-equal across engines (the q27 oracle twin relies on it). The
    numpy/matmul variant below remains for bulk ingest, where pairwise
    summation differences don't matter."""
    H = _hyperplanes(dim, planes)
    emb = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    bucket = F.lit(0).cast("long")
    for p in range(planes):
        row = F.array(*[F.lit(float(v)) for v in H[p]])
        dot = F.aggregate(
            F.zip_with(emb, row, lambda x, y: x * y),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def with_lsh_bucket_native(
    df: DataFrame, vec_col: str, dim: int, planes: int = 12
) -> DataFrame:
    """UDF-free bucketing — the oracle-checked path (q27)."""
    return df.withColumn("bucket", lsh_bucket_expr(vec_col, dim, planes))


def query_signature_fold(query: list[float], dim: int, planes: int) -> int:
    """Query bucket via the same sequential fold as lsh_bucket_expr."""
    H = _hyperplanes(dim, planes)
    sig = 0
    for p in range(planes):
        acc = 0.0
        for x, y in zip(query, H[p]):
            acc += float(x) * float(y)
        if acc > 0:
            sig |= 1 << p
    return sig


# ---------------- bit-exact vectorized folds (r6, guide §4.2) -------------
#
# The native-Column folds above (`F.aggregate` / `F.transform` /
# `F.zip_with`) are CodegenFallback expressions — Spark evaluates the
# lambda interpreter-style per array element, which measured as the
# dominant cost of every similarity query (q29: 38.7M candidate pairs
# x 64-element folds at sf1.0). These kernels compute the IDENTICAL
# IEEE-754 arithmetic in vectorized numpy: ``np.add.accumulate`` is a
# strict sequential left-to-right accumulation, i.e. exactly the fold
# order `F.aggregate(.., lit(0.0), (a,x) -> a+x)` and DuckDB's
# `list_reduce(list_prepend(0.0, ..))` evaluate — so results are
# bit-equal, including the leading `0.0 + x0` step (applied explicitly:
# it differs from plain accumulation only on a -0.0 first element).
# Three-way bit-equality is pinned in tests/test_training_ops.py.


def _seq_fold_sum(P: np.ndarray) -> np.ndarray:
    """Sequential left-fold sum along the LAST axis of float64 ``P``,
    with the fold's 0.0 initial value (in place on P's first slice)."""
    P[..., 0] = P[..., 0] + 0.0
    return np.add.accumulate(P, axis=-1)[..., -1]


def _as_matrix(series) -> np.ndarray:
    """[n, d] float64 from a pandas Series of float32 arrays (the exact
    per-element widening `transform(v, x -> cast(x as double))` does)."""
    return np.stack([np.asarray(v, dtype=np.float64) for v in series])


def _spark_gt(x: np.ndarray, y: float) -> np.ndarray:
    """Spark SQL `>` ordering semantics: NaN compares larger than any
    value (numpy would say False)."""
    return (x > y) | np.isnan(x)


def lsh_sig_norm_batches(id_col: str, vec_col: str, dim: int, planes: int):
    """mapInPandas kernel: (id, vec passthrough, bucket, nrm) with the
    bucket/norm folds bit-equal to lsh_bucket_expr / vec_norm_expr."""
    H = _hyperplanes(dim, planes)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            M = _as_matrix(pdf[vec_col])
            Pr = M[:, None, :] * H[None, :, :]  # [n, planes, d]
            dots = _seq_fold_sum(Pr)
            bucket = (
                _spark_gt(dots, 0.0).astype(np.int64)
                << np.arange(planes, dtype=np.int64)
            ).sum(axis=1)
            nrm = np.sqrt(_seq_fold_sum(M * M))
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "vec": pdf[vec_col],
                    "bucket": bucket,
                    "nrm": nrm,
                }
            )

    return run


def _group_score_batches(threshold: float, screen_margin: float = 1e-6):
    """applyInPandas kernel for one (band, key) LSH group: all i<j pairs,
    exact sequential-fold cosine, keep >= threshold (Spark NaN-largest
    `>=` semantics). A BLAS matmul SCREEN first bounds which pairs can
    possibly pass: |matmul - sequential fold| is ~1e-13 for unit-scale
    values, so only pairs within ``screen_margin`` of the threshold (7
    orders of magnitude wider) get the exact fold — the output set is
    decided solely by the exact arithmetic."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        empty = pd.DataFrame(
            {
                "id_a": pd.Series([], dtype=pdf["id"].dtype),
                "id_b": pd.Series([], dtype=pdf["id"].dtype),
                "cosine": pd.Series([], dtype="float64"),
            }
        )
        if n < 2:
            return empty
        # positional i<j must mean id_a < id_b (the pair orientation the
        # expr path's `id_a < id_b` join condition produces)
        pdf = pdf.sort_values("id", kind="mergesort", ignore_index=True)
        M = _as_matrix(pdf["vec"])
        nrm = pdf["nrm"].to_numpy(dtype=np.float64)
        ids = pdf["id"].to_numpy()
        with np.errstate(divide="ignore", invalid="ignore"):
            U = M / nrm[:, None]
            S = U @ U.T
        cand = (S >= threshold - screen_margin) | ~np.isfinite(S)
        ii, jj = np.nonzero(np.triu(cand, 1))
        if not len(ii):
            return empty
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = _seq_fold_sum(M[ii] * M[jj]) / (nrm[ii] * nrm[jj])
        keep = (cos >= threshold) | np.isnan(cos)
        return pd.DataFrame(
            {"id_a": ids[ii[keep]], "id_b": ids[jj[keep]], "cosine": cos[keep]}
        )

    return run


def with_lsh_bucket(
    df: DataFrame, id_col: str, vec_col: str, dim: int, planes: int = 12
) -> DataFrame:
    sig = df.mapInPandas(
        lsh_signature_batches(id_col, vec_col, dim, planes),
        f"id {dict(df.dtypes)[id_col]}, bucket bigint",
    )
    return df.join(sig.withColumnRenamed("id", id_col), id_col)


def query_buckets(query: list[float], dim: int, planes: int, radius: int = 1):
    """All bucket ids within Hamming ``radius`` of the query signature
    (signature via the portable sequential fold — engine-agnostic)."""
    sig = query_signature_fold(query, dim, planes)
    buckets = {sig}
    if radius >= 1:
        buckets |= {sig ^ (1 << i) for i in range(planes)}
    if radius >= 2:
        buckets |= {
            sig ^ (1 << i) ^ (1 << j)
            for i in range(planes)
            for j in range(i + 1, planes)
        }
    return sorted(buckets)


def ann_topk_lsh(
    bucketed: DataFrame,
    id_col: str,
    vec_col: str,
    query: list[float],
    dim: int,
    planes: int = 12,
    radius: int = 1,
    k: int = 10,
) -> DataFrame:
    """Approximate top-k: brute-force cosine only inside probed buckets.

    ``bucket IN (...)`` is a pushable predicate — with bucket as a
    partition key this prunes at the storage layer.
    """
    probe = query_buckets(query, dim, planes, radius)
    cand = bucketed.filter(F.col("bucket").isin(probe))
    return brute_force_topk(cand, id_col, vec_col, query, k)


def ann_topk_lsh_arrow(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: list[float],
    dim: int,
    planes: int = 12,
    radius: int = 1,
    k: int = 10,
) -> DataFrame:
    """LSH-probed approximate top-k in ONE Arrow crossing (r6, guide
    §4.2): the kernel computes bucket signature AND query cosine per
    row with the exact sequential-fold arithmetic of
    lsh_bucket_expr/cosine_score_expr (bit-equal — see the fold-kernel
    block comment); bucket probe filter + TakeOrdered stay JVM-side."""
    H = _hyperplanes(dim, planes)
    qarr = np.asarray(query, dtype=np.float64)
    qn = float(np.sqrt(sum(v * v for v in query)))
    id_t = dict(df.dtypes)[id_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            M = _as_matrix(pdf[vec_col])
            Pr = M[:, None, :] * H[None, :, :]
            dots = _seq_fold_sum(Pr)
            bucket = (
                _spark_gt(dots, 0.0).astype(np.int64)
                << np.arange(planes, dtype=np.int64)
            ).sum(axis=1)
            na = np.sqrt(_seq_fold_sum(M * M))
            qdot = _seq_fold_sum(M * qarr)
            with np.errstate(divide="ignore", invalid="ignore"):
                score = qdot / (na * qn)
            yield pd.DataFrame(
                {"id": pdf[id_col], "bucket": bucket, "score": score}
            )

    scored = df.select(id_col, vec_col).mapInPandas(
        run, f"id {id_t}, bucket bigint, score double"
    )
    probe = query_buckets(query, dim, planes, radius)
    return (
        scored.filter(F.col("bucket").isin(probe))
        .select(F.col("id").alias(id_col), "score")
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def ivf_topk_arrow(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: list[float],
    dim: int,
    cells: int = 16,
    nprobe: int = 4,
    k: int = 10,
    codebook=None,
) -> DataFrame:
    """IVF-probed approximate top-k in ONE Arrow crossing — the exact
    fold arithmetic of ivf_cell_expr (argmin of -2*dot+||c||^2, first
    minimum wins) + cosine_score_expr, vectorized (r6, guide §4.2)."""
    C = ivf_centroids(dim, cells) if codebook is None else codebook
    norms = np.asarray(_centroid_norms(C), dtype=np.float64)
    qarr = np.asarray(query, dtype=np.float64)
    qn = float(np.sqrt(sum(v * v for v in query)))
    id_t = dict(df.dtypes)[id_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            M = _as_matrix(pdf[vec_col])
            Pr = M[:, None, :] * C[None, :, :]
            dots = _seq_fold_sum(Pr)  # [n, cells]
            dist = -2.0 * dots + norms[None, :]
            cell = np.argmin(dist, axis=1).astype(np.int64) + 1
            na = np.sqrt(_seq_fold_sum(M * M))
            qdot = _seq_fold_sum(M * qarr)
            with np.errstate(divide="ignore", invalid="ignore"):
                score = qdot / (na * qn)
            yield pd.DataFrame({"id": pdf[id_col], "cell": cell, "score": score})

    scored = df.select(id_col, vec_col).mapInPandas(
        run, f"id {id_t}, cell int, score double"
    )
    probe = query_cells(query, dim, cells, nprobe, codebook=codebook)
    return (
        scored.filter(F.col("cell").isin(probe))
        .select(F.col("id").alias(id_col), "score")
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def vec_norm_expr(vec_col: str):
    """Sequential-fold L2 norm (portable: same left-fold order as
    DuckDB's ``list_reduce``, so bit-equal across engines)."""
    emb = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return F.sqrt(
        F.aggregate(F.transform(emb, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )


def pair_cosine_expr(vec_a: str, vec_b: str, norm_a: str, norm_b: str):
    """cosine(vec_a, vec_b) with precomputed norms — sequential-fold dot
    product over ``zip_with`` (portable, codegen'd, no UDF)."""
    ea = F.transform(F.col(vec_a), lambda x: x.cast("double"))
    eb = F.transform(F.col(vec_b), lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(ea, eb, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    return dot / (F.col(norm_a) * F.col(norm_b))


def cosine_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    planes: int = 12,
    band_bits: int = 4,
    threshold: float = 0.35,
    handles: list | None = None,
    impl: str = "arrow",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: banded hyperplane-LSH
    candidate generation + exact-cosine re-rank (never all-pairs).

    The ``planes``-bit signature splits into ``planes/band_bits`` bands;
    two vectors are candidates iff they share any band value (classic
    OR-amplification: P[candidate] = 1-(1-p^band_bits)^bands with
    p = 1 - theta/pi). Exact cosine then filters candidates to
    ``>= threshold`` — so precision is exact and only recall is
    approximate, the standard LSH near-dup contract.

    ``impl="arrow"`` (default since r6 — guide §4.2, measured 38.7M
    candidate folds at sf1.0): signatures/norms come from one
    vectorized mapInPandas pass, and each (band, key) group scores its
    own i<j pairs inside one applyInPandas kernel (BLAS screen + exact
    sequential-fold rescore), so the 30M+ candidate id-pairs are never
    materialized into a distinct+join — only surviving pairs leave the
    group, then one distinct dedupes band overlap (identical cosine
    bits per band by construction). Every float op is bit-equal to the
    interpreted-fold path (tests/test_training_ops.py pins equality).

    ``impl="expr"`` is the pure-Column original (the DuckDB-twin
    verification form; also what a no-Python-workers deploy would run).

    Scale shape (100 TB): one Arrow pass per row for signatures; the
    banded shuffle carries (id, vec, nrm) x bands — band_bits tunes
    candidate volume against recall; group skew is bounded by the key
    width and AQE splits the rest. Nothing is broadcast and no driver
    state exists in either impl.
    """
    bands = planes // band_bits
    mask = (1 << band_bits) - 1
    if impl == "arrow":
        id_t = dict(df.dtypes)[id_col]
        vec_t = dict(df.dtypes)[vec_col]
        sig = df.select(F.col(id_col), F.col(vec_col)).mapInPandas(
            lsh_sig_norm_batches(id_col, vec_col, dim, planes),
            f"id {id_t}, vec {vec_t}, bucket bigint, nrm double",
        )
        band_arr = F.array(
            *[
                F.shiftright("bucket", band_bits * i).bitwiseAND(F.lit(mask))
                for i in range(bands)
            ]
        )
        banded = sig.select(
            "id", "vec", "nrm", F.posexplode(band_arr).alias("band", "key")
        )
        scored = banded.groupBy("band", "key").applyInPandas(
            _group_score_batches(threshold),
            f"id_a {id_t}, id_b {id_t}, cosine double",
        )
        return scored.distinct()
    # ---- impl == "expr": the original interpreted-fold pipeline ----
    # persist: sig is read three times (banded explode + both re-rank
    # sides) and the 12-plane fold + norm are the dominant per-row
    # cost — without this they recompute on every branch. The caller
    # owns the unpersist via `handles` (same contract as
    # minhash_native_pairs / simhash_native_pairs).
    sig = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        lsh_bucket_expr(vec_col, dim, planes).alias("bucket"),
        vec_norm_expr(vec_col).alias("nrm"),
    ).persist()
    if handles is not None:
        handles.append(sig)
    band_arr = F.array(
        *[
            F.shiftright("bucket", band_bits * i).bitwiseAND(F.lit(mask))
            for i in range(bands)
        ]
    )
    banded = sig.select("id", F.posexplode(band_arr).alias("band", "key"))
    a = banded.select(F.col("id").alias("id_a"), "band", "key")
    b = banded.select(F.col("id").alias("id_b"), "band", "key")
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = sig.select(
        F.col("id").alias("id_a"), F.col("vec").alias("va"), F.col("nrm").alias("na")
    )
    vb = sig.select(
        F.col("id").alias("id_b"), F.col("vec").alias("vb"), F.col("nrm").alias("nb")
    )
    scored = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine", pair_cosine_expr("va", "vb", "na", "nb"))
    )
    return scored.filter(F.col("cosine") >= threshold).select(
        "id_a", "id_b", "cosine"
    )


# ---------------------------- IVF --------------------------------------


def ivf_centroids(dim: int, cells: int) -> np.ndarray:
    """Frozen coarse-quantizer codebook (seeded — deterministic across
    engines and cluster sizes). In production the codebook comes from
    k-means over an ingest sample; freezing a seeded one here keeps the
    assignment a pure function so the DuckDB oracle can replay it. The
    plumbing — cell assignment, inverted-list partitioning, nprobe
    probing — is identical either way."""
    rng = np.random.RandomState(SEED + 1)
    return rng.standard_normal((cells, dim)).astype(np.float64)


def train_ivf_codebook(
    df,
    vec_col: str,
    cells: int = 16,
    max_iter: int = 20,
    seed: int = SEED + 1,
    sample_fraction: float | None = None,
):
    """Train the IVF coarse quantizer with DISTRIBUTED k-means
    (pyspark.ml.clustering.KMeans — Lloyd iterations as Spark jobs,
    k-means|| init; the idiomatic scale path the frozen seeded codebook
    stands in for). Returns a (cells, dim) float64 ndarray that every
    ivf_* function below accepts via ``codebook=``.

    Operational contract at scale: train ONCE (optionally on a
    ``sample_fraction`` of the corpus — k-means quality needs only a
    sample), persist the returned array next to the index, and treat it
    as configuration. k-means|| inits from per-partition seeded draws,
    so the result is deterministic for a fixed (data, partitioning,
    seed) triple but NOT across different partitionings — which is why
    the codebook is an artifact, not something re-derived per query
    (same reasoning as the frozen codebook's determinism note)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    data = df.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias(
            "features"
        )
    )
    if sample_fraction is not None:
        data = data.sample(sample_fraction, seed=seed)
    model = KMeans(
        k=cells, maxIter=max_iter, seed=seed, initMode="k-means||"
    ).fit(data)
    # clusterCenters() returns numpy arrays in pyspark 4
    return np.array(model.clusterCenters(), dtype=np.float64)


def _centroid_norms(C: np.ndarray) -> list[float]:
    """||c||^2 per centroid via the same sequential left fold every
    engine uses (bit-equal constants embedded as literals)."""
    out = []
    for row in C:
        acc = 0.0
        for x in row:
            acc += float(x) * float(x)
        out.append(acc)
    return out


def ivf_cell_expr(vec_col: str, dim: int, cells: int = 16, codebook=None):
    """1-based nearest-centroid cell id as a native Column: argmin over
    ``-2*dot(v,c) + ||c||^2`` (the ||v||^2 term is constant per row).
    Sequential folds keep every distance bit-equal to the DuckDB twin;
    first-minimum wins ties in both engines (array_position /
    list_position)."""
    C = ivf_centroids(dim, cells) if codebook is None else codebook
    norms = _centroid_norms(C)
    emb = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scores = []
    for c in range(cells):
        row = F.array(*[F.lit(float(v)) for v in C[c]])
        dot = F.aggregate(
            F.zip_with(emb, row, lambda x, y: x * y),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        scores.append(F.lit(-2.0) * dot + F.lit(norms[c]))
    arr = F.array(*scores)
    return F.array_position(arr, F.array_min(arr)).cast("int")


def with_ivf_cell(
    df: DataFrame, vec_col: str, dim: int, cells: int = 16, codebook=None
) -> DataFrame:
    """Assign every vector its inverted-list cell. At 100 TB the cell id
    is a partition key: a probe reads only nprobe of `cells` partitions
    (storage-level pruning), exactly like the LSH bucket column."""
    return df.withColumn(
        "cell", ivf_cell_expr(vec_col, dim, cells, codebook=codebook)
    )


def query_cells(
    query: list[float], dim: int, cells: int = 16, nprobe: int = 4,
    codebook=None,
) -> list[int]:
    """The nprobe nearest cells for a query (same fold arithmetic as
    ivf_cell_expr, evaluated in plain Python — engine-agnostic)."""
    C = ivf_centroids(dim, cells) if codebook is None else codebook
    norms = _centroid_norms(C)
    dists = []
    for c in range(cells):
        acc = 0.0
        for x, y in zip(query, C[c]):
            acc += float(x) * float(y)
        dists.append((-2.0 * acc + norms[c], c + 1))
    dists.sort()
    return sorted(cell for _, cell in dists[:nprobe])


def ivf_topk(
    celled: DataFrame,
    id_col: str,
    vec_col: str,
    query: list[float],
    dim: int,
    cells: int = 16,
    nprobe: int = 4,
    k: int = 10,
    codebook=None,
) -> DataFrame:
    """IVF-flat approximate top-k: exact cosine only inside the nprobe
    probed cells. ``cell IN (...)`` is a pushable partition-prune
    predicate, the same scale shape as ann_topk_lsh."""
    probe = query_cells(query, dim, cells, nprobe, codebook=codebook)
    cand = celled.filter(F.col("cell").isin(probe))
    return brute_force_topk(cand, id_col, vec_col, query, k)
