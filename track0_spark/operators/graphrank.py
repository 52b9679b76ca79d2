"""Weighted PageRank over an edge DataFrame, fixed iteration count.

The canonical web link-graph quality signal (Page et al. 1999 —
public): crawl frontiers prioritise by it, pretraining pipelines weight
and filter documents by host-graph centrality (the public Common Crawl
host-level ranking recipe). The engine's frontier scoring (P1 top-k)
consumes exactly this shape of (node, rank) table.

Implementation is the textbook join-aggregate power iteration kept
fully declarative: per round, ranks are hash-joined to the out-edge
table on ``src`` (one shuffle, reusable partitioning), contributions
``rank * w / out_weight`` are hash-aggregated on ``dst`` (the second
shuffle), and the damping redistribution is a map. No RDDs, no
driver-side state beyond the node count.

Scale posture (10^11 edges): the edge table is partitioned by ``src``
ONCE and persisted, so every iteration reuses the co-location and only
the (much smaller) rank table moves; hub skew on ``dst`` is the AQE
skew-join/salting case; ``localCheckpoint`` per round truncates
iterative lineage (``checkpoint`` to HDFS on a real cluster).

Dangling nodes are NOT redistributed: every node must carry at least
one out-edge (symmetrise the graph, or pre-drop sinks) — asserted
cheaply by construction since nodes are taken from ``src``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    iters: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """(node, rank) after ``iters`` damped power iterations from the
    uniform vector; ranks sum to ~1. Nodes = distinct ``src`` values
    (give every node an out-edge; see module docstring)."""
    from ._iterative import iteration_scope

    e0 = edges.persist()
    n_edges = e0.count()
    with iteration_scope(e0.sparkSession, n_edges) as p:
        outw = e0.groupBy(src).agg(F.sum(weight).alias("_tot"))
        # pin the edge table to the contribution join's key ONCE (p
        # co-partitioned with every in-loop shuffle): each round then
        # moves only the rank table, never the edges
        e = (
            e0.join(outw, src)
            .select(
                F.col(src).alias("_src"),
                F.col(dst).alias("_dst"),
                F.col(weight).alias("_w"),
                "_tot",
            )
            .repartition(p, F.col("_src"))
            .persist()
        )
        ranks = _pr_loop(e, iters, damping)
    e.unpersist()
    e0.unpersist()
    return ranks


def _pr_loop(e: DataFrame, iters: int, damping: float) -> DataFrame:
    nodes = e.select(F.col("_src").alias("node")).distinct().persist()
    n = nodes.count()
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(iters):
        contrib = (
            e.join(ranks, e["_src"] == ranks["node"])
            .groupBy("_dst")
            .agg(
                F.sum(
                    F.col("rank") * F.col("_w") / F.col("_tot")
                ).alias("_c")
            )
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["_dst"], "left")
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.coalesce("_c", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    nodes.unpersist()
    return ranks
