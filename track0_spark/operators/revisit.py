"""S4 — mirror update / revisit: conditional refetch as a dedup-overwrite
MERGE keyed by url_canon (SURVEY.md §2.1 S4; VERDICT r1 next #7).

track0's ``--update`` workflow refetches previously-mirrored URLs and
rewrites only what changed, using etag/last-modified conditional
requests. The stored-pages analog (the input table carries no headers):

  * last-modified analog — ``warc_ts`` of the page row at save time
  * etag analog         — ``md5(html)`` computed at save time (native)

``revisit_merge(saved, pages)`` is one left join + CASE — the exact
shape Iceberg ``MERGE INTO saved WHEN MATCHED ...`` compiles to, so the
production swap is a DDL change, not a rewrite. Per row:

  * pages row missing                      -> ``gone``      (keep old
    bytes; a mirror never silently loses content — track0-style)
  * warc_ts unchanged                      -> ``unchanged`` (304 analog:
    skipped without reading the body — the cheap conditional path)
  * warc_ts newer, md5(html) equal         -> ``validated`` (etag hit:
    body read but not rewritten)
  * md5 differs                            -> ``modified``  (refetch:
    new bytes, new etag, new last-modified)

Everything is native Columns (no UDF); both join sides key on
url_canon, bucket-aligned at the 10^10 design point. The join is
hinted SHUFFLE_HASH — the mirror side streams, the (pruned, url+ts+
html) pages side builds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: columns a revisitable saved_pages snapshot carries
SAVED_COLS = ["url_canon", "html", "etag", "last_modified"]


def with_save_metadata(saved: DataFrame) -> DataFrame:
    """Attach the conditional-refetch metadata at save time:
    (url_canon, html, warc_ts) -> + etag (md5) + last_modified."""
    return saved.select(
        "url_canon",
        "html",
        F.md5(F.col("html")).alias("etag"),
        F.col("warc_ts").alias("last_modified"),
    )


def latest_unique_pages(pages: DataFrame) -> DataFrame:
    """-> (url_canon, html, warc_ts, _etag), EXACTLY one row per url.

    MERGE (and the saved-set artifact) require a UNIQUE source row per
    url (Iceberg MERGE INTO raises a cardinality violation otherwise;
    r2 review): a pages snapshot holding several fetches of one url
    keeps the LATEST (max warc_ts), tie-broken by min etag — hash
    aggregates + join-backs only, no sort, no min_by-over-payload. The
    final dropDuplicates is deterministic: surviving rows for a url
    are byte-identical in every selected column."""
    p = pages.select(
        F.col("url").alias("url_canon"),
        "html",
        "warc_ts",
        F.md5("html").alias("_etag"),
    )
    latest = p.groupBy("url_canon").agg(F.max("warc_ts").alias("warc_ts"))
    at_latest = p.join(latest, ["url_canon", "warc_ts"])
    pick = at_latest.groupBy("url_canon", "warc_ts").agg(
        F.min("_etag").alias("_etag")
    )
    return (
        at_latest.join(pick, ["url_canon", "warc_ts", "_etag"])
        .dropDuplicates(["url_canon"])
    )


def revisit_merge(saved: DataFrame, pages: DataFrame) -> DataFrame:
    """-> (url_canon, html, etag, last_modified, refetch_status).

    Exactly one output row per saved url (dedup-overwrite MERGE
    semantics); ``refetch_status`` ∈ {gone, unchanged, validated,
    modified}. Deterministic: pure function of the two snapshots."""
    p = latest_unique_pages(pages).select(
        "url_canon",
        F.col("html").alias("_new_html"),
        F.col("warc_ts").alias("_new_ts"),
        F.col("_etag").alias("_new_etag"),
    ).hint("SHUFFLE_HASH")
    j = saved.join(p, "url_canon", "left")
    new_etag = F.col("_new_etag")
    status = (
        F.when(F.col("_new_html").isNull(), F.lit("gone"))
        .when(F.col("_new_ts") <= F.col("last_modified"), F.lit("unchanged"))
        .when(new_etag == F.col("etag"), F.lit("validated"))
        .otherwise(F.lit("modified"))
    )
    j = j.withColumn("refetch_status", status)
    modified = F.col("refetch_status") == "modified"
    # validated rows keep their bytes+etag but record the new
    # last-modified (a revalidation refreshes the cache date) — this is
    # what makes revisit idempotent: re-running against the same pages
    # snapshot yields only unchanged/gone
    fresh_ts = F.col("refetch_status").isin("modified", "validated")
    return j.select(
        "url_canon",
        F.when(modified, F.col("_new_html")).otherwise(F.col("html")).alias("html"),
        F.when(modified, new_etag).otherwise(F.col("etag")).alias("etag"),
        F.when(fresh_ts, F.col("_new_ts"))
        .otherwise(F.col("last_modified"))
        .alias("last_modified"),
        "refetch_status",
    )


def history_delta(saved: DataFrame, pages: DataFrame) -> DataFrame:
    """One observation row per SAVED url present in this snapshot:
    ``(url_canon, fetch_ts timestamp, etag)`` — the raw material
    ``recrawl_schedule`` estimates change rates from, appended into
    the history store by each ``--update --history`` run. URLs gone
    from the snapshot contribute no observation (absence is not a
    content state). One narrow semi-join; html never leaves the
    latest-pick it already needed."""
    p = latest_unique_pages(pages)
    keys = saved.select("url_canon")
    return p.join(keys, "url_canon", "left_semi").select(
        "url_canon",
        F.col("warc_ts").cast("timestamp").alias("fetch_ts"),
        F.col("_etag").alias("etag"),
    )


def recrawl_schedule(history: DataFrame) -> DataFrame:
    """S4's policy half: WHEN to revisit each url, from its own fetch
    history — the engine-tier twin of contract q44 (same Cho &
    Garcia-Molina 2003 smoothed change-frequency estimator, same
    one-shuffle window+agg shape; contract.py:q44 carries the DuckDB
    oracle for the math).

    ``history``: one row per past fetch — ``(url_canon, fetch_ts
    timestamp, etag string)`` — i.e. the revisit tier's own artifacts
    accumulated over runs (etag = md5(html) from with_save_metadata;
    any content fingerprint works).  Output per url with >= 3
    observations:

      n_obs, n_changes, avg_gap_s, change_rate_per_day,
      due_at (timestamp; NULL when no change was ever observed —
      recrawl at the policy floor, never a fabricated rate)

    where due_at = last fetch + 1/rate (the Poisson mean time to next
    change).  One hash shuffle: the lag window partitions by url_canon
    and the aggregation reuses that partitioning.
    """
    from pyspark.sql import Window

    us = F.unix_micros(F.col("fetch_ts").cast("timestamp"))
    w = Window.partitionBy("url_canon").orderBy("us", "etag")
    o = history.select("url_canon", us.alias("us"), "etag")
    prev = F.lag("etag").over(w)
    o = o.withColumn(
        "chg",
        F.when(prev.isNotNull() & (F.col("etag") != prev), 1).otherwise(0),
    )
    a = (
        o.groupBy("url_canon")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_obs"),
            F.sum("chg").cast("bigint").alias("n_changes"),
            F.min("us").alias("us0"),
            F.max("us").alias("us1"),
        )
        .filter(F.col("n_obs") >= 3)
    )
    gap_s = (F.col("us1") - F.col("us0")) / (F.col("n_obs") - 1) / 1000000.0
    r_hat = -F.log(
        (F.col("n_obs") - 1 - F.col("n_changes") + 0.5)
        / (F.col("n_obs") - 1 + 0.5)
    )
    due_us = F.col("us1") + (gap_s / r_hat * 1000000.0).cast("long")
    return a.select(
        "url_canon",
        "n_obs",
        "n_changes",
        F.round(gap_s, 6).alias("avg_gap_s"),
        F.round(r_hat / gap_s * 86400.0, 8).alias("change_rate_per_day"),
        F.when(
            F.col("n_changes") > 0, F.timestamp_micros(due_us)
        ).alias("due_at"),
    )


def due_urls(schedule: DataFrame, as_of) -> DataFrame:
    """URLs whose next expected change is at or before ``as_of`` —
    the set a scheduled --update run should refetch.  Never-changed
    urls (due_at NULL) are excluded; they belong to the caller's
    policy-floor sweep."""
    return schedule.filter(
        F.col("due_at").isNotNull() & (F.col("due_at") <= F.lit(as_of))
    ).select("url_canon", "due_at")
