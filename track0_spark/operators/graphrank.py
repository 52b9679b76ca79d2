"""Weighted PageRank over an edge DataFrame, fixed iteration count.

The canonical web link-graph quality signal (Page et al. 1999 —
public): crawl frontiers prioritise by it, pretraining pipelines weight
and filter documents by host-graph centrality (the public Common Crawl
host-level ranking recipe). The engine's frontier scoring (P1 top-k)
consumes exactly this shape of (node, rank) table.

Implementation is the textbook join-aggregate power iteration kept
fully declarative — no RDDs, no driver-side loops over data. r6
restructuring (guide §2.3/§2.4/§3.1), all measured at sf1.0:

- The graph profile (out-weights, distinct dsts, nodes, sinks) is
  derived from TWO passes over the cached edge table instead of five —
  ``outw``/``dsts`` are node-cardinality and persisted; nodes, the
  dangling probe and the sink set are joins OF THOSE, not re-scans.
- **broadcast layout** (node count <= ``TRACK0S_PR_BROADCAST_MAX_NODES``,
  default 4M): the edge table is pinned by ``dst`` ONCE, each iteration
  broadcasts the (node, rank) table into the contribution join, and the
  per-``dst`` aggregation reuses the edge partitioning — an iteration
  is ONE exchange-free stage over the cached edges. With
  ``iters >= _INT_ID_MIN_ITERS`` the loop additionally translates node
  names to dense int ids first (string join/agg keys measured ~2x the
  per-iteration cost; the translation itself costs ~2 iterations'
  worth, so short loops skip it). (A numpy bincount variant of the
  iteration was tried and REVERTED: re-serializing the cached edge
  table through Arrow every iteration cost far more than the JVM
  hash-agg it replaced — 27s vs 13s q40 wall at sf1.0.)
- **shuffle layout** (bigger node sets): the edge table is pinned by
  ``src`` so the rank join is co-partitioned, and each iteration pays
  one exchange of partially-aggregated contributions — the layout that
  scales to page-graph node counts, kept as the fallback.

Either way the loop runs under ``iteration_scope`` (AQE off, working-
set-sized partitions, shuffled-hash joins — sort-merge was re-sorting
the full edge table every iteration before r6).

Dangling nodes (``dst``-only, no out-edges) are handled per the
``dangling`` mode (VERDICT r4 #8):

- ``"forbid"`` (default, preserves prior semantics for pre-symmetrised
  graphs): a cheap anti-join of the distinct ``dst`` set against the
  out-weight keys runs ONCE up front and raises ``ValueError`` if any
  sink exists — the silent-leak case fails loudly.
- ``"redistribute"``: the standard dangling-mass term (Page et al.
  1999 §2.7 convention): nodes = ``src`` ∪ ``dst``; each iteration the
  rank mass sitting on sinks is redistributed uniformly,
  ``r' = (1-d)/n + d*(contrib + dangling_mass/n)``, so ranks keep
  summing to ~1 on ANY graph. The per-round dangling mass is a 1-row
  aggregate broadcast into the update (no driver round-trip).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

#: above this node count the per-iteration rank broadcast stops being
#: cheap (rank rows are ~50B; 4M ~ 200MB relation) and the loop falls
#: back to the co-partitioned shuffle layout. Env-tunable for cluster
#: profiles with more executor memory.
PR_BROADCAST_MAX_NODES = int(
    os.environ.get("TRACK0S_PR_BROADCAST_MAX_NODES", "4000000")
)

#: measured break-even for the int-id translation (costs ~2 iterations'
#: worth of probes up front, saves ~half of every iteration after)
_INT_ID_MIN_ITERS = 4


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
        # graph profile: 2 passes over e0, node-cardinality results
        outw = (
            e0.groupBy(F.col(src).alias("node"))
            .agg(F.sum(weight).alias("_tot"))
            .persist()
        )
        dsts = e0.select(F.col(dst).alias("node")).distinct().persist()
        sinks_df = dsts.join(outw.select("node"), "node", "left_anti")
        if dangling == "forbid":
            # short-circuit probe (isEmpty == LIMIT 1): pennies when the
            # precondition holds, loud when it doesn't
            if not sinks_df.isEmpty():
                ex = [r["node"] for r in sinks_df.limit(3).collect()]
                raise ValueError(
                    f"dangling node(s) (dst with no out-edge), e.g. {ex}; "
                    "symmetrise/pre-drop, or pass dangling='redistribute'"
                )
            sinks_df = None
            nodes = outw.select("node").persist()
        else:
            sinks_df = sinks_df.persist()
            nodes = (
                outw.select("node").union(dsts).distinct().persist()
            )
        n = nodes.count()
        if n <= PR_BROADCAST_MAX_NODES:
            ranks = _pr_loop_broadcast(
                e0, outw, nodes, n, src, dst, weight, iters, damping,
                sinks=sinks_df, p=p,
            )
        else:
            # pin the edge table to the contribution join's key ONCE:
            # each round then moves only partially-aggregated
            # contributions, never edges
            e = (
                e0.join(
                    outw.select(F.col("node").alias(src), "_tot"), src
                )
                .select(
                    F.col(src).alias("_src"),
                    F.col(dst).alias("_dst"),
                    F.col(weight).alias("_w"),
                    "_tot",
                )
                .repartition(p, F.col("_src"))
                .persist()
            )
            ranks = _pr_loop_shuffle(
                e, nodes, n, iters, damping, sinks=sinks_df
            )
            e.unpersist()
        if sinks_df is not None:
            sinks_df.unpersist()
        nodes.unpersist()
        dsts.unpersist()
        outw.unpersist()
    e0.unpersist()
    return ranks


def _rank_update(nodes_df, key, contrib, dm, n, damping):
    """nodes LEFT JOIN contrib (+ optional dangling-mass broadcast) ->
    next rank column; shared by both layouts so the float expression
    shape is identical."""
    upd = nodes_df.join(contrib, nodes_df[key] == contrib["_d"], "left")
    if dm is not None:
        upd = upd.crossJoin(dm)
        rank_col = (
            F.lit((1.0 - damping) / n)
            + F.lit(damping)
            * (F.coalesce("_c", F.lit(0.0)) + F.col("_dm") / F.lit(float(n)))
        )
    else:
        rank_col = (
            F.lit((1.0 - damping) / n)
            + F.lit(damping) * F.coalesce("_c", F.lit(0.0))
        )
    return upd.select(key, rank_col.alias("rank")).localCheckpoint()


def _pr_loop_broadcast(
    e0, outw, nodes, n, src, dst, weight, iters, damping, sinks, p
) -> DataFrame:
    """Broadcast layout (see module docstring): edges pinned by dst,
    exchange-free iterations with a broadcast rank table; node names
    translated to dense int ids when the loop is long enough to
    amortize the translation. localCheckpoint per round truncates
    lineage and materializes the small rank table the next round's
    broadcast (and the dangling variant's second reference) read."""
    int_ids = iters >= _INT_ID_MIN_ITERS
    if int_ids:
        from pyspark.sql import Window

        idx = nodes.select(
            "node",
            (F.row_number().over(Window.orderBy("node")) - 1).alias("nid"),
        ).persist()
        # fold _tot into the src-side translation: ONE broadcast probe
        # carries (nid, tot), the dst side needs only nid
        src_map = F.broadcast(
            idx.join(outw, "node").select(
                F.col("node").alias(src),
                F.col("nid").alias("_sid"),
                "_tot",
            )
        )
        dst_map = F.broadcast(
            idx.select(F.col("node").alias(dst), F.col("nid").alias("_did"))
        )
        e_pin = (
            e0.join(src_map, src)
            .join(dst_map, dst)
            .select("_sid", "_did", F.col(weight).alias("_w"), "_tot")
            .repartition(p, F.col("_did"))
            .persist()
        )
        key, skey = "nid", "_sid"
        loop_nodes = idx.select("nid")
        sink_keys = (
            sinks.join(idx, "node").select("nid").persist()
            if sinks is not None
            else None
        )
    else:
        src_map = F.broadcast(
            outw.select(F.col("node").alias(src), "_tot")
        )
        e_pin = (
            e0.join(src_map, src)
            .select(
                F.col(src).alias("_sid"),
                F.col(dst).alias("_did"),
                F.col(weight).alias("_w"),
                "_tot",
            )
            .repartition(p, F.col("_did"))
            .persist()
        )
        key, skey = "node", "_sid"
        loop_nodes = nodes
        sink_keys = sinks
    ranks = loop_nodes.select(key, F.lit(1.0 / n).alias("rank"))
    for _ in range(iters):
        r = F.broadcast(ranks)
        dm = None
        if sink_keys is not None:
            dm = F.broadcast(
                ranks.join(sink_keys, key, "left_semi").agg(
                    F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")
                )
            )
        contrib = (
            e_pin.join(r, e_pin["_sid"] == r[key])
            .groupBy(F.col("_did").alias("_d"))
            .agg(
                F.sum(F.col("rank") * F.col("_w") / F.col("_tot")).alias("_c")
            )
        )
        ranks = _rank_update(loop_nodes, key, contrib, dm, n, damping)
    if int_ids:
        ranks = idx.join(ranks, "nid").select("node", "rank").localCheckpoint()
        if sink_keys is not None:
            sink_keys.unpersist()
        idx.unpersist()
    e_pin.unpersist()
    return ranks


def _pr_loop_shuffle(
    e: DataFrame, nodes, n, iters, damping, sinks
) -> DataFrame:
    """Shuffle layout: co-partitioned rank join on the src-pinned edge
    table, one contribution exchange per round."""
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(iters):
        dm = None
        if sinks is not None:
            dm = F.broadcast(
                ranks.join(sinks, "node", "left_semi").agg(
                    F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")
                )
            )
        contrib = (
            e.join(ranks, e["_src"] == ranks["node"])
            .groupBy(F.col("_dst").alias("_d"))
            .agg(
                F.sum(F.col("rank") * F.col("_w") / F.col("_tot")).alias("_c")
            )
        )
        ranks = _rank_update(nodes, "node", contrib, dm, n, damping)
    return ranks
