"""One crawl round as a single declarative DataFrame job (SURVEY.md §3.2).

Stage order is the plan-shape discipline of SURVEY.md §4: politeness
ranking runs on the skinny ``frontier`` columns ONLY; the fat
``pages.html`` column is joined in *after* the top-k cut, so the scan
of ``pages`` is column-pruned and the window never carries page bodies.
Exactly one JVM->Python crossing per round (the fused extract UDF).

Determinism: every ordering key is a pure function of row data
(host, priority, depth, discovered_round, url_canon); dedup is a keyed
row_number, not dropDuplicates; fetch_seq derives from per-host offsets
(operators/topk.py). Given the same snapshot + config this job is a
pure function — the basis of the resume guarantee (BASELINE.json:14).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from track0s.config import CrawlConfig
from track0s.robots import DEFAULT_BUDGET
from track0s.rules import DEFAULTS

from ..functions.exprs import (
    content_type_expr,
    header_content_type_expr,
    is_html_expr,
    redirect_target_expr,
    retry_after_expr,
    url_hash_expr,
)
from ..functions.rules_compile import compile_rules
from ..functions.udfs import (
    EXTRACT_INPUT_COLS,
    LINK_IDX_BITS,
    make_extract_candidates,
)
from ..operators.topk import select_batch, with_fetch_seq
from ..schemas import CANDIDATE, CRAWL_LOG, FRONTIER, ROBOTS, SEEN


@dataclass
class RoundResult:
    crawl_log: DataFrame  # this round's log rows
    frontier_next: DataFrame
    seen_delta: DataFrame  # ONLY the URLs admitted this round (append)
    persisted: list  # DataFrames to unpersist after the snapshot commit
    materialize: DataFrame  # deepest cached DF: ONE action on it fills
    # every cache level (ranked -> fetched -> admitted) so the commit's
    # concurrent writes are cache-read-only — parallel writers racing to
    # compute shared cache blocks serialize on block locks and idle the
    # cluster (measured: local[32] slower than local[8] without this)


class RoundPlanner:
    """Compiles a CrawlConfig once; builds the per-round DataFrame plan."""

    def __init__(
        self,
        spark: SparkSession,
        cfg: CrawlConfig,
        pages: DataFrame,
        salt: int = 0,
        robots_df: DataFrame | None = None,
    ):
        self.spark = spark
        self.cfg = cfg
        self.salt = salt
        # fetch join needs only (url, html): column-pruned here so the
        # parquet scan never reads text/lang/warc_ts (SURVEY.md §4).
        self.pages = pages.select(
            F.col("url").alias("p_url"), F.col("html").alias("html")
        )
        hosts = sorted(cfg.seed_hosts)
        prefixes = list(cfg.seed_prefixes)
        self.follow_col = compile_rules(
            cfg.follow, DEFAULTS["follow"], hosts, prefixes, psl=cfg.psl
        )
        self.save_col = compile_rules(
            cfg.save, DEFAULTS["save"], hosts, prefixes, psl=cfg.psl
        )
        self.stop_col = compile_rules(
            cfg.stop, DEFAULTS["stop"], hosts, prefixes, psl=cfg.psl
        )
        if robots_df is not None:
            # storage-resident politeness artifact (budgets_from_rank /
            # robots_rows_from_pages parquet): consumed as a DataFrame,
            # never collected — at the 10^8-host design point the
            # per-host rows must not transit the driver (ADVICE r4).
            # The sequential oracle reads the SAME file via
            # RobotsTable.from_parquet, preserving parity by
            # construction.
            cols = {f.name for f in ROBOTS.fields}
            missing = cols - set(robots_df.columns)
            sel = [
                (
                    F.col(f.name).cast(f.dataType).alias(f.name)
                    if f.name not in missing
                    else F.lit(None).cast(f.dataType).alias(f.name)
                )
                for f in ROBOTS.fields
            ]
            self.robots_df = robots_df.select(*sel)
        else:
            self.robots_df = spark.createDataFrame(
                [
                    (
                        p.host,
                        list(p.disallow_prefixes),
                        p.crawl_delay_s,
                        p.budget_per_round,
                        list(p.allow_prefixes),
                    )
                    for p in cfg.robots.policies.values()
                ],
                schema=ROBOTS,
            )
        self._build_static_exprs()

    def _build_static_exprs(self) -> None:
        """Round-invariant Column expression trees, built ONCE.

        A Column is an immutable JVM expression wrapper; reusing the
        same object across rounds is safe (each plan re-resolves it) and
        removes ~2k py4j round-trips per round — measured ~0.9 s of pure
        driver<->JVM socket latency, the fixed cost that capped
        whole-crawl scaling efficiency (VERDICT r2 next #3)."""
        ct_fetched = F.coalesce(
            header_content_type_expr(F.col("html")),
            content_type_expr(F.col("path")),
        )
        if self.cfg.retry_max is not None:
            # transient-failure tier (in-band 503/Retry-After analog,
            # track0s/http.py retry_after): unavailable until the
            # declared attempt index. Precedence 503 > 301 > 200, and
            # an unavailable page exposes neither its redirect nor its
            # in-band content-type — exactly the oracle's override.
            _ra = retry_after_expr(F.col("html"))
            unavail = _ra.isNotNull() & (F.col("attempts") < _ra)
            self._status_col = (
                F.when(F.col("html").isNull(), 404)
                .when(unavail, 503)
                .when(redirect_target_expr(F.col("html")).isNotNull(), 301)
                .otherwise(200)
                .alias("status")
            )
            self._ct_col = (
                F.when(unavail, content_type_expr(F.col("path")))
                .otherwise(ct_fetched)
                .alias("content_type")
            )
        else:
            # retry tier off (default): the 503 sniff is never built,
            # so crawls without the knob run the pre-round-5 plan
            self._status_col = (
                F.when(F.col("html").isNull(), 404)
                .when(redirect_target_expr(F.col("html")).isNotNull(), 301)
                .otherwise(200)
                .alias("status")
            )
            self._ct_col = ct_fetched.alias("content_type")
        self._size_col = F.length("html").alias("size")
        self._saved_col = (
            (F.col("status") == 200) & self.save_col
        ).alias("saved")
        self._stop_named = self.stop_col.alias("stop")
        extractable = is_html_expr(F.col("content_type")) | F.col(
            "content_type"
        ).startswith("text/css")
        self._parent_filter = (~F.col("stop")) & (
            ((F.col("status") == 200) & extractable)
            | (F.col("status") == 301)
        )
        hop = F.when(F.col("is_redirect"), F.lit(0)).otherwise(F.lit(1))
        self._cand_cols = [
            F.col(c)
            for c in (
                "url_canon", "host", "path", "protocol", "src_tag",
                "src_attr", "is_requisite", "parent_seq", "link_idx",
                "via_url", "via_host", "is_redirect", "url_h64",
                "maybe_seen",
            )
        ] + [
            (F.col("parent_depth") + hop).alias("depth"),
            F.when(
                F.col("host") == F.col("via_host"),
                F.col("parent_domain_depth") + hop,
            )
            .otherwise(0)
            .alias("domain_depth"),
            content_type_expr(F.col("path")).alias("content_type"),
            F.lit(None).cast("int").alias("size"),
            # D1 discovery-order key: rides the same select so the
            # candidate cache holds it
            (
                F.shiftleft(F.col("parent_seq"), LINK_IDX_BITS)
                + F.col("link_idx").cast("long")
            ).alias("_ord"),
        ]
        # P3 robots: projection broadcast + longest-match keep condition
        self._robots_probe = F.broadcast(
            self.robots_df.select(
                "host", "disallow_prefixes", "allow_prefixes"
            )
        )

        def best_match(col: str):
            lens = F.transform(
                F.filter(F.col(col), lambda p: F.col("path").startswith(p)),
                lambda p: F.length(p),
            )
            return F.coalesce(F.array_max(lens), F.lit(-1))

        self._robots_keep = F.col("disallow_prefixes").isNull() | (
            best_match("allow_prefixes") >= best_match("disallow_prefixes")
        )
        _frontier_exprs = {
            "url_hash": url_hash_expr(F.col("url_canon")),
            "priority": F.when(F.col("is_requisite"), 0).otherwise(1),
            "attempts": F.lit(0).cast("int"),
        }
        # discovered_round is the one per-round literal: filled in
        # run_round by index (kept last here)
        self._admitted_cols = [
            _frontier_exprs[f.name].alias(f.name)
            if f.name in _frontier_exprs
            else F.col(f.name)
            for f in FRONTIER.fields
            if f.name != "discovered_round"
        ]
        self._frontier_names = [f.name for f in FRONTIER.fields]
        self._log_cols = [
            F.col(c)
            for c in (
                "fetch_seq", "url_canon", "url_hash", "host", "depth",
                "domain_depth", "status", "saved", "is_requisite",
                "via_url",
            )
        ]

    # ---------------- initial state ----------------

    def seed_frontier(self) -> DataFrame:
        from track0s import canon
        from track0s.config import priority_of
        from track0s.hashing import h64

        from ..operators.bloom import H64_MASK

        seen_urls: set[str] = set()
        rows = []
        for u in self.cfg.seed_canon:
            if u in seen_urls:
                continue
            seen_urls.add(u)
            rows.append(
                (
                    u,
                    None,
                    h64(u) & H64_MASK,
                    canon.host_of(u),
                    canon.path_of(u),
                    canon.scheme_of(u),
                    0,
                    0,
                    None,
                    None,
                    None,
                    None,
                    False,
                    0,
                    priority_of(False),
                    0,
                )
            )
        df = self.spark.createDataFrame(rows, schema=FRONTIER)
        return df.withColumn("url_hash", url_hash_expr(F.col("url_canon")))

    def seed_seen(self) -> DataFrame:
        return self.seed_frontier().select(
            "url_canon", "url_hash", "url_h64", F.lit(0).alias("first_round")
        )

    # ---------------- one round ----------------

    def run_round(
        self,
        r: int,
        frontier: DataFrame,
        seen: DataFrame,
        bloom_bc=None,
        gate_probe=None,
    ) -> RoundResult:
        cfg = self.cfg

        # P1-P4: per-host politeness ranking on skinny frontier columns.
        # P5: fetch_seq lands here too — per-host offsets are a tiny
        # broadcast join over the ranked cache, and carrying the global
        # sequence as ONE BIGINT is what lets in-round dedup (D1 below)
        # hash-aggregate over a packed primitive key.
        batch, rest, topk_handles = select_batch(
            frontier, self.robots_df, cfg.default_budget, self.salt,
            persist=True, round_period_s=cfg.round_period_s,
        )
        batch = with_fetch_seq(batch)

        # S2: fetch = left join against pages (keeps 404-analog misses).
        # The batch's keys are broadcast as a semi-join pre-filter so the
        # fat pages table is SCANNED (columnar, pruned to url+html) but
        # never SHUFFLED — without this the full pages table (html bytes
        # included) reshuffles every round and dominates the round wall.
        # At the 10^10 design point the same effect comes from Iceberg
        # bucket(url) storage-partitioned joins instead of a broadcast
        # (batch keys stay ≤ hosts x budget, so both paths stay small);
        # sources/bucketed.py demonstrates that plan on Hive bucketing —
        # ZERO Exchange on either side, html never shuffled (PLANS.md).
        batch_keys = F.broadcast(batch.select(F.col("url_canon").alias("p_url")))
        # SHUFFLE_HASH: hash the (semi-join-filtered, ≈batch-sized) pages
        # side instead of sort-merge — sorting rows that carry html bytes
        # is the worst possible plan for this join
        pages_hit = self.pages.join(batch_keys, "p_url", "left_semi").hint(
            "SHUFFLE_HASH"
        )
        fetched = batch.join(
            pages_hit, batch.url_canon == pages_hit.p_url, "left"
        ).drop("p_url")
        # in-band HTTP analogs (track0s/http.py, native twins in
        # functions/exprs.py): meta-refresh -> status 301; in-band
        # content-type declaration overrides the extension guess (R8)
        # single select per layer (not a withColumn chain): every
        # DataFrame op re-analyzes the whole tree driver-side, and at
        # ~1s of py4j/Catalyst chatter per round that fixed cost is what
        # caps whole-crawl scaling efficiency (VERDICT r2 next #3)
        fetched = fetched.select(
            "*", self._status_col, self._size_col, self._ct_col
        )
        # R8/R9 + @save/@stop: compiled CASE WHEN chains, no UDF
        fetched = fetched.select("*", self._saved_col, self._stop_named)
        # the round's three sink actions all read ``fetched``; persist so
        # the window+join+fetch lineage executes once, not three times
        fetched = fetched.persist()

        crawl_log = fetched.select(
            F.lit(r).alias("round"), *self._log_cols
        )

        # E1-E3 (+U1/U2 fused): the single JVM->Python crossing.
        # 301 parents ride along (the UDF emits their single resolved
        # redirect target); css parents get the url(...) requisite pass.
        parents = fetched.filter(self._parent_filter).select(
            *EXTRACT_INPUT_COLS
        )
        links = parents.mapInPandas(make_extract_candidates(bloom_bc), CANDIDATE)

        # U5/U6: depth + domain-depth propagation (native arithmetic);
        # a redirect is not a hop — same depth, domain_depth preserved
        # within-host, reset across hosts
        cand = links.select(*self._cand_cols)

        # R1-R11: @follow pipeline — codegen'd, pushes down
        cand = cand.filter(self.follow_col)

        # P3: robots longest-match Allow/Disallow (broadcast, native
        # higher-order fns — the same RFC 9309 §2.2.2 resolution as
        # track0s/robots.py: longest matching prefix wins, Allow on tie,
        # absent host allows everything)
        cand = (
            cand.join(self._robots_probe, "host", "left")
            .filter(self._robots_keep)
            .drop("disallow_prefixes", "allow_prefixes")
        )
        # D1's min+join-back reads the candidate set twice; cache it so
        # the extraction UDF (the round's expensive Python pass) runs once
        cand_cached = cand.persist()
        cand = cand_cached

        # D1: in-round dedup — deterministic first-discovery-wins as a
        # real HASH aggregate. The discovery order is the single BIGINT
        # _ord = parent_fetch_seq << 28 | link_idx (unique per candidate;
        # the extractor asserts <2^28 links/page). min(_ord) per url is a
        # HashAggregate with map-side partial combine (min_by over any
        # string/struct payload compiles to SortAggregate in Spark —
        # measured, see PLANS.md), and the winner row comes back via an
        # equi-join on url_canon alone so the output stays hash-partitioned
        # by url_canon for the seen anti-join below — no extra shuffle.
        firsts = (
            cand.groupBy("url_canon")
            .agg(F.min("_ord").alias("_min_ord"))
            .hint("SHUFFLE_HASH")  # build the narrow (url, min) side
        )
        cand = (
            cand.join(firsts, "url_canon")
            .filter(F.col("_ord") == F.col("_min_ord"))
            .drop("_ord", "_min_ord")
        )

        # D3 co-located variant: the gate verdict comes from a
        # bucket-aligned applyInPandas whose tasks each read only their
        # own bucket's bitmap from storage (operators/bloom_colocated.py)
        # — no whole-structure broadcast. Runs AFTER dedup so it probes
        # unique candidates only; the extract UDF left maybe_seen=True
        # everywhere (bloom_bc is None in this mode) and the verdict
        # replaces it.
        if gate_probe is not None:
            cand = gate_probe(cand)

        # D3 + D2: bloom-negative rows are PROVABLY unseen (no false
        # negatives) and skip the join; maybe-seen rows get the exact
        # anti-join — the seen set stays exact either way
        # SHUFFLE_HASH hint: the anti-join probe side is already
        # partitioned by url_canon (dedup agg), and hashing the seen
        # side beats sorting both sides (SMJ) every round
        seen_keys = seen.select("url_canon").hint("SHUFFLE_HASH")
        # The split applies whenever ANY gate produced a maybe_seen
        # verdict: the broadcast bloom fuses it into the extract UDF
        # (bloom_bc), the co-located gate writes it via gate_probe. The
        # r3 ADVICE bug was testing only bloom_bc here, which sent every
        # candidate through the exact anti-join in colocated mode and
        # silently discarded the gate's verdict (correct output, pure
        # wasted probe cost).
        if bloom_bc is not None or gate_probe is not None:
            surely_new = cand.filter(~F.col("maybe_seen"))
            maybe = cand.filter(F.col("maybe_seen")).join(
                seen_keys, "url_canon", "left_anti"
            )
            fresh = surely_new.unionByName(maybe)
        else:
            fresh = cand.join(seen_keys, "url_canon", "left_anti")

        admitted = fresh.select(
            *self._admitted_cols, F.lit(r + 1).alias("discovered_round")
        ).select(
            *self._frontier_names  # restore FRONTIER field order
        ).persist()  # consumed by both frontier_next and seen_delta

        frontier_next = rest.select(*self._frontier_names).unionByName(
            admitted
        )
        if cfg.retry_max is not None:
            # transient 503s re-queue with attempts+1 (ORIGINAL
            # discovery order key — a retry is not a rediscovery), up
            # to retry_max additional attempts; the urls stay in the
            # seen set, so they re-enter only through this path
            retries = (
                fetched.filter(
                    (F.col("status") == 503)
                    & (F.col("attempts") + 1 <= cfg.retry_max)
                )
                .withColumn("attempts", F.col("attempts") + 1)
                .select(*self._frontier_names)
            )
            frontier_next = frontier_next.unionByName(retries)
        # D4: seen update — append-only delta (the Iceberg append);
        # url_h64 rides along so the bloom rebuilds from storage on resume
        seen_delta = admitted.select(
            "url_canon", "url_hash", "url_h64", F.lit(r + 1).alias("first_round")
        )
        return RoundResult(
            crawl_log,
            frontier_next,
            seen_delta,
            [*topk_handles, fetched, cand_cached, admitted],
            materialize=admitted,
        )
