"""SparkSession factory with the engine's frozen config profile.

Scale posture (SURVEY.md §4): AQE on (runtime re-plan + skew-join
splitting for the fetch join), runtime Bloom-filter join pushdown on
(helps the seen anti-join), Arrow on with a modest batch size because
``pages.html`` rows are fat, and a pinned shuffle-partition count per
scale profile (determinism: partition counts must not drift between a
run and its resume).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_spark(
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    app_name: str = "track0s",
    driver_memory: str | None = None,
    extra: dict | None = None,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle = shuffle_partitions or max(cores, 8)
    # executor Python workers import track0s/track0_spark by module
    # reference (mapInPandas closures) but do NOT inherit the driver's
    # sys.path — make the repo root visible via PYTHONPATH so sessions
    # built from any cwd work. Cluster deploys use --py-files instead.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if repo_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            repo_root + (os.pathsep + pp if pp else "")
        )
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # r6 guide §6: the contract tables ship as one file each with
        # 21MB row groups (lineitem sf1.0: 6 groups / 126MB) — the 128m
        # default turns every scan into ONE task. 16m splits them to
        # row-group granularity. Float-agg parity with the single-
        # threaded oracle is unaffected at the driver's correctness
        # scales (every sf<=0.1 file is <16m => still one split,
        # bit-identical plans); at bench scale DuckDB itself is
        # accumulation-order-unstable (threads=1 vs 32 differ), so no
        # bit-contract exists there to preserve. Parameterised; the
        # crawl profile pins the default (CRAWL_PROFILE) so golden-
        # pinned crawl plans are untouched. (A 64m auto-broadcast
        # threshold was tried here and REVERTED: building a 1.5M-row
        # broadcast relation measured slower than the shuffle join it
        # replaced — q40 edge build 4.5s vs 3.3s.)
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "16m"),
        )
        # guide §3.1/§9: let the planner pick shuffled-hash over
        # sort-merge when its size conditions hold — the contract
        # queries' non-broadcast joins (q40/q49 fact-fact edge build)
        # were paying a full sort of both sides. AQE's runtime SMJ->SHJ
        # rewrite gets the same 64m-per-partition budget.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            "64m",
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


#: Crawl-loop session profile. The BSP round loop runs MANY small-to-
#: medium deterministic jobs; AQE's per-shuffle QueryStage
#: materialization + re-optimization adds ~1-1.5s latency per stage,
#: which measured as ~15s/round of pure serial overhead — the Amdahl
#: term that killed 8->32 scaling. The crawl plans have known shapes
#: (skew is handled explicitly by salted top-k, joins are hash-
#: friendly), so: AQE off, shuffled-hash join preferred. Analytics /
#: contract queries keep the default profile (AQE on).
CRAWL_PROFILE = {
    "spark.sql.adaptive.enabled": "false",
    "spark.sql.join.preferSortMergeJoin": "false",
    # pin the Spark defaults the golden crawl plans were built under —
    # the r6 query-profile scan/broadcast tuning above must not leak
    # into the round loop (its joins are explicitly hinted/gated and
    # its input layout is the bench web, not the contract tables)
    "spark.sql.files.maxPartitionBytes": "128m",
    "spark.sql.autoBroadcastJoinThreshold": "10m",
}


def build_crawl_spark(cores: int | None = None, **kw) -> SparkSession:
    extra = {**CRAWL_PROFILE, **kw.pop("extra", {})}
    return build_spark(cores=cores, extra=extra, **kw)
