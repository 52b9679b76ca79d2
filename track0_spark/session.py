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
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
