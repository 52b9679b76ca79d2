"""Bucketed-storage join plans (sources/bucketed.py; VERDICT r2 #4):
the seen anti-join plans with zero Exchange beyond the dedup agg's, the
co-located fetch join plans with zero Exchange anywhere, and both
produce results identical to the unbucketed twins."""

import pytest
from pyspark.sql import functions as F  # noqa: F401

from track0_spark.sources.bucketed import (
    fetch_join_bucketed,
    seen_anti_join_bucketed,
    write_bucketed,
)

N_BUCKETS = 4  # == the test session's spark.sql.shuffle.partitions


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_seen_anti_join_single_exchange(spark, tmp_path, no_broadcast):
    seen_rows = [(f"http://h{i % 5}.test/p/{i}", i) for i in range(400)]
    cand_rows = [
        (f"http://h{i % 5}.test/p/{i}", 1000 + i) for i in range(200, 600)
    ]
    seen = spark.createDataFrame(seen_rows, "url_canon string, first_round int")
    cand = spark.createDataFrame(cand_rows, "url_canon string, _ord long")
    write_bucketed(
        seen, "seen_bucketed_t", str(tmp_path / "seen_b"), "url_canon",
        N_BUCKETS,
    )

    fresh = seen_anti_join_bucketed(spark, cand, "seen_bucketed_t")
    plan = _plan(fresh)
    # the bucketed seen scan feeds the anti-join DIRECTLY — its only
    # Exchange savings vs the identical unbucketed query is exactly the
    # seen-side shuffle (the probe side's exchanges — dedup agg +
    # repartition-for-join — are identical in both)
    assert "Bucketed: true" in plan, plan
    firsts = cand.groupBy("url_canon").agg(F.min("_ord").alias("_min_ord"))
    plain = (
        cand.join(firsts, "url_canon")
        .filter(F.col("_ord") == F.col("_min_ord"))
        .join(seen.select("url_canon"), "url_canon", "left_anti")
    )
    n_b, n_u = plan.count("Exchange"), _plan(plain).count("Exchange")
    assert n_b == n_u - 1, (n_b, n_u, plan)
    got = sorted(r["url_canon"] for r in fresh.collect())
    want = sorted(
        u for u, _ in cand_rows if u not in {s for s, _ in seen_rows}
    )
    assert got == want and len(got) == 200
    spark.sql("DROP TABLE seen_bucketed_t")


def test_fetch_join_zero_exchange(spark, tmp_path, no_broadcast):
    frontier_rows = [(f"http://h.test/p/{i}", i % 7) for i in range(300)]
    pages_rows = [
        (f"http://h.test/p/{i}", f"<html>{i}</html>".encode())
        for i in range(0, 600, 2)
    ]
    frontier = spark.createDataFrame(
        frontier_rows, "url_canon string, depth int"
    )
    pages = spark.createDataFrame(pages_rows, "url string, html binary")
    write_bucketed(
        frontier, "frontier_bucketed_t", str(tmp_path / "fr_b"),
        "url_canon", N_BUCKETS,
    )
    write_bucketed(
        pages, "pages_bucketed_t", str(tmp_path / "pg_b"), "url", N_BUCKETS
    )

    fetched = fetch_join_bucketed(
        spark, "frontier_bucketed_t", "pages_bucketed_t"
    )
    plan = _plan(fetched)
    # both sides co-located: NO Exchange anywhere in the plan
    assert "Exchange" not in plan, plan
    rows = fetched.collect()
    assert len(rows) == 300
    hits = [r for r in rows if r["html"] is not None]
    assert len(hits) == 150  # every even-numbered page resolves
    spark.sql("DROP TABLE frontier_bucketed_t")
    spark.sql("DROP TABLE pages_bucketed_t")


def test_bucketed_matches_unbucketed(spark, tmp_path, no_broadcast):
    """Same anti-join computed bucketed and plain: identical output."""
    seen_rows = [(f"http://x.test/{i}", 0) for i in range(0, 500, 3)]
    cand_rows = [(f"http://x.test/{i}", i) for i in range(500)]
    seen = spark.createDataFrame(seen_rows, "url_canon string, first_round int")
    cand = spark.createDataFrame(cand_rows, "url_canon string, _ord long")
    write_bucketed(
        seen, "seen_eq_t", str(tmp_path / "seen_eq"), "url_canon", N_BUCKETS
    )
    bucketed = sorted(
        r["url_canon"]
        for r in seen_anti_join_bucketed(spark, cand, "seen_eq_t").collect()
    )
    firsts = cand.groupBy("url_canon").agg(F.min("_ord").alias("_min_ord"))
    plain = sorted(
        r["url_canon"]
        for r in cand.join(firsts, "url_canon")
        .filter(F.col("_ord") == F.col("_min_ord"))
        .join(seen.select("url_canon"), "url_canon", "left_anti")
        .collect()
    )
    assert bucketed == plain
    spark.sql("DROP TABLE seen_eq_t")
