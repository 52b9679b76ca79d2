"""Distributed connected components over a pair/edge DataFrame.

The clustering half of near-duplicate removal: MinHash/SimHash banding
(operators/dedup.py) emits PAIRS, but production dedup keeps ONE doc
per transitive duplicate CLUSTER (the public CC-over-LSH recipe used
by large text-corpus pipelines), so pairs must be contracted to
components first.

Algorithm: min-label hook + pointer-jump to fixpoint — each iteration
every node takes the minimum label among itself and its neighbours
(hook), then shortcuts to its label's label (compress), the classic
Shiloach-Vishkin / MapReduce-CC doubling scheme (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14 — public).
Pointer jumping halves chain depth per round, so convergence is
O(log n) rounds even on path graphs, not O(diameter).

Scale posture (10^10 edges): each round is two hash-partitioned joins
and one hash aggregation, all keyed on node id — the exact shuffle
pattern AQE load-balances; no step ever materialises a component's
member list on one task. Labels are monotonically non-increasing, so
convergence is detected by an exact-decimal label-sum checksum (one
cheap agg; no extra change-count join). ``localCheckpoint`` after
every round truncates the otherwise exponentially-growing lineage (on
a real cluster use ``checkpoint`` to HDFS for executor-loss safety —
same call site).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """(node, cluster) for every node with >= 1 edge; ``cluster`` is
    the component's MINIMUM node id (deterministic representative).
    Isolated nodes never appear in ``edges`` and are the caller's to
    union in as their own singletons if wanted."""
    from ._iterative import iteration_scope

    sym0 = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .persist()
    )
    n_edges = sym0.count()
    with iteration_scope(sym0.sparkSession, n_edges) as p:
        # pin the edge list to the hook join's key ONCE — every round's
        # big-side shuffle disappears (labels, the small side, moves)
        sym = sym0.repartition(p, "v").persist()
        labels = _cc_loop(sym, max_iter)
    sym.unpersist()
    sym0.unpersist()
    return labels.select("node", F.col("label").alias("cluster"))


def _cc_loop(sym: DataFrame, max_iter: int) -> DataFrame:
    labels = (
        sym.select("u")
        .distinct()
        .select(F.col("u").alias("node"), F.col("u").alias("label"))
        .localCheckpoint()
    )
    prev_sum = object()  # sentinel != any checksum, incl. empty-graph None
    for _ in range(max_iter):
        # hook: label(u) <- min(label(u), min over neighbours' labels)
        nbr = (
            sym.join(
                labels.select(F.col("node").alias("v"), "label"), "v"
            )
            .groupBy("u")
            .agg(F.min("label").alias("nbr_min"))
        )
        hooked = (
            labels.join(nbr, labels["node"] == nbr["u"], "left")
            .select(
                labels["node"],
                F.least(
                    labels["label"],
                    F.coalesce(nbr["nbr_min"], labels["label"]),
                ).alias("label"),
            )
        )
        # compress: label(u) <- label(label(u))  (pointer jump)
        parent = hooked.select(
            F.col("node").alias("p"), F.col("label").alias("plabel")
        )
        labels = (
            hooked.join(parent, hooked["label"] == parent["p"], "left")
            .select(
                hooked["node"],
                F.coalesce(parent["plabel"], hooked["label"]).alias("label"),
            )
            .localCheckpoint()
        )
        # labels only decrease; an unchanged exact sum means a fixpoint
        chk = labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).first()["s"]
        if chk == prev_sum:
            break
        prev_sum = chk
    else:
        raise RuntimeError(
            f"connected_components: no fixpoint in {max_iter} rounds "
            "(doubling converges in O(log n) — raise max_iter only for "
            "graphs beyond ~2^50 nodes)"
        )
    return labels
