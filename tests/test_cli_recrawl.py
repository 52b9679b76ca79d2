"""--update --history / --due-only: the Cho & Garcia-Molina recrawl
scheduler (operators/revisit.recrawl_schedule, oracle-checked by
contract q44) wired end-to-end through the CLI — update sweeps
accumulate per-url observations, and a --due-only sweep refetches only
the urls whose estimated next change has arrived, deferring the rest
(never-changed and under-observed urls belong to the plain --update
policy-floor sweep, never to a fabricated rate)."""

import datetime as dt
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

T0 = dt.datetime(2026, 1, 1)


def _cli(args):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "crawl.py"), *args],
        capture_output=True,
        text=True,
        timeout=500,
        cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return json.loads(
        [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    )


def _snapshot(spark, tmp_path, k, fast_version):
    """Snapshot at T0+k hours: /fast's body is at ``fast_version``,
    everything else is byte-constant (only warc_ts advances)."""
    from track0_spark.schemas import PAGES

    ts = T0 + dt.timedelta(hours=k)
    rows = [
        ("http://h.test/fast", ts, f"fast-v{fast_version}".encode(), "t", "en"),
        ("http://h.test/slow", ts, b"slow-const", "t", "en"),
        ("http://h.test/a", ts, b"a-const", "t", "en"),
        ("http://h.test/b", ts, b"b-const", "t", "en"),
    ]
    path = str(tmp_path / f"pages_{k}.parquet")
    spark.createDataFrame(rows, schema=PAGES).write.parquet(path)
    return path


def test_due_from_sitemaps_sweep(spark, tmp_path):
    """--due-from-sitemaps: a saved url whose sitemap <lastmod>
    postdates the saved copy is refetched; everything else defers —
    usable from the FIRST sweep, no history required."""
    from pyspark.sql import functions as F

    from track0_spark.operators.revisit import with_save_metadata
    from track0_spark.schemas import PAGES
    from track0_spark.sources.pages import read_pages

    saved_out = str(tmp_path / "saved.parquet")
    p0 = _snapshot(spark, tmp_path, 0, fast_version=0)
    with_save_metadata(
        read_pages(spark, p0).select(
            F.col("url").alias("url_canon"), "html", "warc_ts"
        )
    ).write.parquet(saved_out)

    sitemap = (
        '<?xml version="1.0"?>'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>HTTP://H.TEST/fast#frag</loc>"  # non-fixpoint form:
        # scheme/host case + fragment must canonicalize before the join
        f"<lastmod>{(T0 + dt.timedelta(minutes=30)).isoformat()}</lastmod>"
        "</url>"
        "<url><loc>http://h.test/slow</loc>"
        f"<lastmod>{(T0 - dt.timedelta(days=1)).isoformat()}</lastmod>"
        "</url></urlset>"
    )
    ts1 = T0 + dt.timedelta(hours=1)
    rows = [
        ("http://h.test/fast", ts1, b"fast-v1", "t", "en"),
        ("http://h.test/slow", ts1, b"slow-const", "t", "en"),
        ("http://h.test/a", ts1, b"a-const", "t", "en"),
        ("http://h.test/b", ts1, b"b-const", "t", "en"),
        ("http://h.test/sitemap.xml", ts1, sitemap.encode(), "t", "en"),
    ]
    p1 = str(tmp_path / "pages_sm.parquet")
    spark.createDataFrame(rows, schema=PAGES).write.parquet(p1)

    res = _cli(
        ["--pages", p1, "--update", "--due-from-sitemaps",
         "--saved-out", saved_out, "--cores", "4"]
    )
    # fast: lastmod (T0+30m) > saved last_modified (T0) -> checked,
    # modified; slow's lastmod is old, a/b unlisted -> all deferred
    assert res["update"] == {"modified": 1, "deferred": 3}
    final = {
        r["url_canon"]: bytes(r["html"])
        for r in spark.read.parquet(saved_out).collect()
    }
    assert final["http://h.test/fast"] == b"fast-v1"
    assert final["http://h.test/slow"] == b"slow-const"


def test_update_history_then_due_only_sweep(spark, tmp_path):
    from pyspark.sql import functions as F

    from track0_spark.operators.revisit import with_save_metadata
    from track0_spark.sources.pages import read_pages

    saved_out = str(tmp_path / "saved.parquet")
    hist = str(tmp_path / "history")

    # bootstrap the saved set from snapshot 0
    p0 = _snapshot(spark, tmp_path, 0, fast_version=0)
    with_save_metadata(
        read_pages(spark, p0).select(
            F.col("url").alias("url_canon"), "html", "warc_ts"
        )
    ).write.parquet(saved_out)

    # --due-only before any history exists must abort loudly
    p1 = _snapshot(spark, tmp_path, 1, fast_version=1)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "crawl.py"),
         "--pages", p1, "--update", "--due-only",
         "--saved-out", saved_out, "--history", hist, "--cores", "4"],
        capture_output=True, text=True, timeout=500, cwd=REPO,
    )
    assert r.returncode != 0 and "--due-only requires" in r.stderr

    # three hourly update sweeps; /fast changes every time
    for k in (1, 2, 3):
        pk = _snapshot(spark, tmp_path, k, fast_version=k) if k != 1 else p1
        res = _cli(
            ["--pages", pk, "--update", "--saved-out", saved_out,
             "--history", hist, "--cores", "4"]
        )
        assert res["update"] == {"modified": 1, "validated": 3}
        assert res["history"] == hist
    # 4 urls observed per sweep
    assert spark.read.parquet(hist).count() == 12

    # /fast: 3 obs, 2 changes -> r = ln(5) per 3600 s interval,
    # due_at = T0+3h + 3600/ln(5) s ~ T0+3h37m; snapshot 4's warc_ts
    # (the default --as-of) is past that. /slow, /a, /b never changed
    # -> NULL due -> deferred.
    p4 = _snapshot(spark, tmp_path, 4, fast_version=4)
    res = _cli(
        ["--pages", p4, "--update", "--due-only", "--saved-out", saved_out,
         "--history", hist, "--cores", "4"]
    )
    assert res["update"] == {"modified": 1, "deferred": 3}

    final = {
        r["url_canon"]: bytes(r["html"])
        for r in spark.read.parquet(saved_out).collect()
    }
    assert final["http://h.test/fast"] == b"fast-v4"
    assert final["http://h.test/slow"] == b"slow-const"
    # only the CHECKED url observed anything in the due-only sweep
    h = spark.read.parquet(hist)
    assert h.count() == 13
    assert (
        h.groupBy("url_canon").count().filter("count = 4").collect()[0][
            "url_canon"
        ]
        == "http://h.test/fast"
    )


