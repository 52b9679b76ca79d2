"""Shared conf scope for iterative DataFrame loops (CC, PageRank).

The analytics session profile keeps AQE ON (session.py) — right for
one-shot queries, but an iterative loop pays AQE's per-QueryStage
materialization latency (~1-1.5s per shuffle stage on this host,
measured for the crawl loop in session.py's CRAWL_PROFILE note) on
EVERY round, and the loop's plans have a known, fixed shape: hash
joins and hash aggs keyed on node id over a working set whose size the
loop just measured. So inside a loop we pin the same known-shape
profile the crawl loop uses — AQE off, shuffle partitions sized to the
measured working set (~100k rows/partition, floored at 1, capped at
the session default so a real cluster keeps its full parallelism) —
and restore the caller's conf on exit, even on error."""

from __future__ import annotations

from contextlib import contextmanager

#: target rows per shuffle partition inside an iteration
ROWS_PER_PARTITION = 100_000


@contextmanager
def iteration_scope(spark, working_set_rows: int):
    conf = spark.conf
    old = {
        k: conf.get(k)
        for k in (
            "spark.sql.adaptive.enabled",
            "spark.sql.shuffle.partitions",
            "spark.sql.join.preferSortMergeJoin",
        )
    }
    p = max(1, min(
        int(old["spark.sql.shuffle.partitions"]),
        working_set_rows // ROWS_PER_PARTITION + 1,
    ))
    try:
        conf.set("spark.sql.adaptive.enabled", "false")
        conf.set("spark.sql.shuffle.partitions", str(p))
        # shuffled-hash, not sort-merge (r6, guide §3.1): every loop
        # join streams the PINNED big side (edges) against a small
        # node-cardinality build side (ranks/labels) — sort-merge was
        # re-SORTING the full edge table every iteration (measured
        # ~2.8s/iter of q40's 12M-edge loop at sf1.0). Build sides are
        # per-partition node tables, bounded by p x ROWS_PER_PARTITION.
        conf.set("spark.sql.join.preferSortMergeJoin", "false")
        yield p
    finally:
        for k, v in old.items():
            conf.set(k, v)
