"""Hive-style bucketed storage for the crawl's two big joins
(VERDICT r2 "Next round" #4).

The production notes (SURVEY.md §4, snapshot.py docstring) describe
Iceberg ``bucket(url_hash)`` storage-partitioned joins; no Iceberg jars
exist in the sandbox, but Spark's built-in Hive-style bucketing
(``bucketBy`` + ``spark.sql.sources.bucketing.enabled``) demonstrates
the same plan property on plain parquet:

- **seen anti-join**: the ``seen`` table written with
  ``bucketBy(N, url_canon)`` reports hash-partitioned output straight
  from the scan, so the anti-join plans with ZERO Exchange on the seen
  side; the candidate probe side reuses the Exchange the D1 dedup
  aggregation already inserted (same key, and Spark requires
  ``spark.sql.shuffle.partitions == N`` for the partitionings to
  match) — no join-specific shuffle at all.
- **fetch join**: ``pages`` bucketed by ``url`` and the frontier
  bucketed by ``url_canon`` at the same N co-locate, so the fat
  html-carrying side is neither shuffled NOR broadcast-filtered — the
  cluster-scale replacement for the batch-keys broadcast in
  plans/round.py (which stays the right call at hosts x budget batch
  sizes).

Tables are EXTERNAL (``.option("path", ...)`` + ``saveAsTable``): data
lands at the caller's location, only the bucket-spec metadata lives in
the session's in-memory catalog — no Hive metastore, no Derby.
``sortBy`` on the bucket key lets sort-merge consume the buckets
without sorting; shuffled-hash (the crawl profile's preference)
consumes the hash distribution directly.

The demo plans are dumped into PLANS.md by tools/explain_plans.py and
asserted Exchange-free in tests/test_bucketed.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    key: str,
    n_buckets: int,
) -> None:
    """Write ``df`` as an external parquet table bucketed (and sorted)
    by ``key`` into ``n_buckets`` files per write-task group."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(name)
    )


def seen_anti_join_bucketed(
    spark: SparkSession, cand: DataFrame, seen_table: str
) -> DataFrame:
    """The crawl's D2 exact seen anti-join against a BUCKETED seen
    table: fresh = candidates (deduped first-discovery-wins, exactly as
    plans/round.py D1) LEFT ANTI JOIN seen. With
    shuffle.partitions == bucket count, the only Exchange in the plan
    is the dedup aggregation's — the join itself adds none."""
    from pyspark.sql import functions as F

    seen_keys = spark.table(seen_table).select("url_canon")
    firsts = cand.groupBy("url_canon").agg(F.min("_ord").alias("_min_ord"))
    deduped = cand.join(firsts, "url_canon").filter(
        F.col("_ord") == F.col("_min_ord")
    )
    return deduped.join(seen_keys, "url_canon", "left_anti")


def fetch_join_bucketed(
    spark: SparkSession, frontier_table: str, pages_table: str
) -> DataFrame:
    """The crawl's S2 fetch join with BOTH sides bucketed on the url
    key at the same count: the html-carrying pages side is neither
    shuffled nor pre-filtered by a broadcast — each bucket joins its
    co-located partner directly (zero Exchange in the whole plan)."""
    from pyspark.sql import functions as F

    frontier = spark.table(frontier_table)
    pages = spark.table(pages_table).select(
        F.col("url").alias("p_url"), "html"
    )
    return frontier.join(
        pages, frontier.url_canon == pages.p_url, "left"
    ).drop("p_url")
