"""The deterministic BSP driver loop (SURVEY.md §3.2, §3.4).

Each iteration re-reads the checkpointed frontier/seen snapshot and
runs one RoundPlanner job — lineage is truncated naturally every round
(no unbounded plan growth over 100s of rounds), and any round boundary
is a valid kill/resume point: ``CrawlLoop.run`` starting from an
existing store continues from the newest complete snapshot and
reproduces the exact same crawl_log (BASELINE.json:14; the resume test
in tests/test_spark_crawl.py).

Per-round metrics land in each round's MANIFEST.json (rows per table,
wall seconds, fetched/admitted counts) — the lineage/metrics checkpoint
of BASELINE.json:6; optional per-partition row counts are collected via
``spark_partition_id`` when ``partition_metrics=True``.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from track0s.config import CrawlConfig

from ..sources.snapshot import SnapshotStore
from .round import RoundPlanner


@dataclass
class CrawlSummary:
    rounds: int = 0
    fetched: int = 0
    seen: int = 0
    frontier_pending: int = 0
    wall_s: float = 0.0
    round_metrics: list = field(default_factory=list)


class CrawlLoop:
    def __init__(
        self,
        spark: SparkSession,
        cfg: CrawlConfig,
        pages: DataFrame,
        store_root: str,
        salt: int = 0,
        partition_metrics: bool = False,
        bloom: bool = True,
        bloom_expected_keys: int = 2_000_000,
        compact_every: int = 0,
        gate: str = "bloom",
        robots_df=None,
    ):
        self.spark = spark
        self.cfg = cfg
        # cache the (url, html) projection of pages across rounds: every
        # round's fetch scans it, and re-decoding 2.6 GB of parquet per
        # round is pure fixed cost. At the 10^10 design point this is
        # instead Iceberg bucket pruning — only the batch's url buckets
        # are read per round (SURVEY.md §4 join-strategy row).
        self.planner = RoundPlanner(
            spark, cfg, pages, salt=salt, robots_df=robots_df
        )
        self.planner.pages = self.planner.pages.persist()
        self.store = SnapshotStore(spark, store_root)
        self.partition_metrics = partition_metrics
        self.use_bloom = bloom
        self.bloom_expected_keys = bloom_expected_keys
        #: which approximate seen-gate structure to build: "bloom"
        #: (default — vectorized OR build, bit-identical incremental/
        #: distributed) or "cuckoo" (deletable; operators/cuckoo.py).
        #: Both preserve exactness by construction; the probe interface
        #: is identical so the round plan never knows which it got.
        assert gate in (
            "bloom", "cuckoo", "bloom-colocated", "cuckoo-colocated"
        )
        self.gate_kind = gate
        #: compact the fragmented seen deltas every K committed rounds
        #: (0 = off). Pure optimization: load_seen output is identical
        #: (sources/snapshot.py compact_seen); bounds resume cost over
        #: 100s of rounds.
        self.compact_every = compact_every

    def _build_bloom(self, upto_round: int):
        """(Re)build the partitioned bloom from the committed seen
        snapshot — pure function of the store, so resume gets the
        identical gate. Built DISTRIBUTED (one applyInPandas job over
        the seen table, per-bucket bitmaps computed executor-side);
        bit-identical to incrementally adding every delta driver-side
        (shared bucket_bitmap kernel; asserted in tests/test_bloom.py).
        Per-round maintenance stays the O(delta) incremental add in
        ``run``. With gate="cuckoo" the same pattern builds per-bucket
        cuckoo tables instead (layout is order-dependent, membership
        semantics — no false negatives — is not; tests assert the crawl
        output is invariant)."""
        seen = self.store.load_seen(upto_round).select("url_h64")
        if self.gate_kind in ("bloom-colocated", "cuckoo-colocated"):
            if self.gate_kind == "cuckoo-colocated":
                from ..operators.cuckoo_colocated import (
                    ColocatedCuckooGate as _GateCls,
                )
            else:
                from ..operators.bloom_colocated import (
                    ColocatedBloomGate as _GateCls,
                )

            gate = _GateCls(
                self.spark,
                self.store.root,
                expected_keys=self.bloom_expected_keys,
            )
            # self-heal any round whose bloom_delta is missing (fresh
            # store, gate-off history, or a crash between a commit and
            # its gate write) from that round's seen_delta
            gate.ensure(upto_round)
            return gate
        if self.gate_kind == "cuckoo":
            from ..operators.cuckoo import build_cuckoo_distributed

            return build_cuckoo_distributed(
                seen, expected_keys=self.bloom_expected_keys
            )
        from ..operators.bloom import build_bloom_distributed

        return build_bloom_distributed(
            seen, expected_keys=self.bloom_expected_keys
        )

    def _part_counts(self, df: DataFrame) -> list:
        rows = (
            df.groupBy(F.spark_partition_id().alias("pid"))
            .count()
            .orderBy("pid")
            .collect()
        )
        return [[r["pid"], r["count"]] for r in rows]

    def run(self, max_rounds: int | None = None) -> CrawlSummary:
        t0 = time.time()
        limit = max_rounds if max_rounds is not None else self.cfg.max_rounds
        latest = self.store.latest_round()
        if latest is None:
            # round_00000 = initial state (seed frontier, seed seen, no log)
            self.store.commit(
                0,
                self.planner.seed_frontier(),
                self.planner.seed_seen(),
                None,
                {"kind": "initial"},
            )
            latest = 0
        summary = CrawlSummary()
        colocated = self.use_bloom and self.gate_kind in (
            "bloom-colocated", "cuckoo-colocated"
        )
        bloom = self._build_bloom(latest) if self.use_bloom else None
        r = latest
        while r < limit:
            man = self.store.manifest(r)
            if man["counts"]["frontier"] == 0:
                break  # crawl complete
            frontier = self.store.load_frontier(r)
            seen = self.store.load_seen(r)
            rt0 = time.time()
            if colocated:
                bloom_bc, gate_probe = None, bloom.make_probe(r)
            else:
                bloom_bc = (
                    self.spark.sparkContext.broadcast(bloom)
                    if bloom is not None
                    else None
                )
                gate_probe = None
            res = self.planner.run_round(
                r, frontier, seen, bloom_bc=bloom_bc, gate_probe=gate_probe
            )
            t_plan = time.time() - rt0
            extra = {
                "kind": "round",
                "log_round": r,
                "plan_s": round(t_plan, 2),
            }
            if self.partition_metrics:
                extra["frontier_partitions"] = self._part_counts(res.frontier_next)
            man2 = self.store.commit(
                r + 1, res.frontier_next, res.seen_delta, res.crawl_log, extra
            )
            for df in res.persisted:
                df.unpersist()
            if colocated:
                # O(delta) distributed maintenance: the committed round's
                # seen_delta -> per-bucket delta bitmaps, written next to
                # it; the driver never reads a key (VERDICT r2 #2)
                bloom.write_delta(
                    r + 1, self.store.load_seen_delta(r + 1)
                )
            elif bloom is not None:
                bloom.add_many(self.store.read_delta_column(r + 1, "url_h64"))
                bloom_bc.destroy()
                man2["bloom_fill"] = round(bloom.fill_ratio(), 4)
            if self.compact_every and (r + 1) % self.compact_every == 0:
                man2["compact"] = self.store.compact_seen(r + 1)
                if colocated:
                    if self.gate_kind == "cuckoo-colocated":
                        # fingerprint tables can't be merged key-free:
                        # the cuckoo compact rebuilds from the exact
                        # seen keys (one pass the seen compaction just
                        # made anyway)
                        man2["compact"]["gate"] = bloom.compact(
                            r + 1, self.store.load_seen(r + 1)
                        )
                    else:
                        man2["compact"]["bloom"] = bloom.compact(r + 1)
            man2["round_wall_s"] = round(time.time() - rt0, 3)
            summary.round_metrics.append(man2)
            summary.fetched += man2["counts"]["crawl_log"]
            r += 1
            if man2["counts"]["crawl_log"] == 0 and man2["counts"]["frontier"] > 0:
                # budget pathology (e.g. all budgets 0): avoid spinning
                break
        final = self.store.manifest(r)
        summary.rounds = r
        summary.seen = final["counts"]["seen"]
        summary.frontier_pending = final["counts"]["frontier"]
        summary.wall_s = round(time.time() - t0, 3)
        return summary

    def crawl_log(self) -> DataFrame | None:
        return self.store.full_crawl_log()

    def saved_pages(self, pages: DataFrame | None = None) -> DataFrame | None:
        """S3 mirror-write view: pages the @save pipeline admitted.

        The crawl_log's ``saved`` flag is the authoritative mirror
        index; joining back to ``pages`` re-attaches bodies without
        ever storing them twice (the store is already the mirror —
        content-addressed by canonical URL). Link rewriting (E4) is a
        documented post-v1 extension (SURVEY.md §2.5)."""
        log = self.store.full_crawl_log()
        if log is None:
            return None
        from pyspark.sql import functions as F

        saved = log.filter(F.col("saved"))
        if pages is None:
            return saved
        return saved.join(
            pages.select(F.col("url").alias("url_canon"), "html", "text", "lang"),
            "url_canon",
            "left",
        )
