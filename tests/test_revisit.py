"""S4 mirror update / revisit tests: conditional-refetch MERGE keyed by
url_canon — recrawl over a mutated pages table updates changed rows and
preserves unchanged ones (VERDICT r1 next #7 done-criterion)."""

from pyspark.sql import functions as F

from track0_spark.operators.revisit import revisit_merge, with_save_metadata


def _saved(spark):
    rows = [
        ("http://h.test/keep", b"<html>same</html>", 100),
        ("http://h.test/touch", b"<html>same-bytes</html>", 100),
        ("http://h.test/change", b"<html>old</html>", 100),
        ("http://h.test/vanish", b"<html>bye</html>", 100),
    ]
    df = spark.createDataFrame(
        rows, "url_canon string, html binary, warc_ts long"
    )
    return with_save_metadata(df)


def _pages_now(spark):
    rows = [
        # keep: warc_ts unchanged -> 304-analog skip
        ("http://h.test/keep", b"<html>IGNORED: ts unchanged</html>", 100),
        # touch: newer ts, identical bytes -> etag validates
        ("http://h.test/touch", b"<html>same-bytes</html>", 200),
        # change: newer ts, new bytes -> refetched
        ("http://h.test/change", b"<html>new</html>", 200),
        # vanish: no row -> gone
    ]
    return spark.createDataFrame(rows, "url string, html binary, warc_ts long")


def test_revisit_statuses_and_merge(spark):
    out = {
        r["url_canon"]: r
        for r in revisit_merge(_saved(spark), _pages_now(spark)).collect()
    }
    assert len(out) == 4  # dedup-overwrite: one row per saved url
    assert out["http://h.test/keep"]["refetch_status"] == "unchanged"
    assert bytes(out["http://h.test/keep"]["html"]) == b"<html>same</html>"
    assert out["http://h.test/keep"]["last_modified"] == 100

    assert out["http://h.test/touch"]["refetch_status"] == "validated"
    assert bytes(out["http://h.test/touch"]["html"]) == b"<html>same-bytes</html>"
    assert out["http://h.test/touch"]["last_modified"] == 200  # date refreshed

    assert out["http://h.test/change"]["refetch_status"] == "modified"
    assert bytes(out["http://h.test/change"]["html"]) == b"<html>new</html>"
    assert out["http://h.test/change"]["last_modified"] == 200

    assert out["http://h.test/vanish"]["refetch_status"] == "gone"
    assert bytes(out["http://h.test/vanish"]["html"]) == b"<html>bye</html>"


def test_revisit_idempotent(spark):
    """Merging the merged state against the same pages is a fixpoint
    (all unchanged/gone, bytes identical) — safe to re-run --update."""
    pages = _pages_now(spark)
    once = revisit_merge(_saved(spark), pages)
    twice = revisit_merge(once.select("url_canon", "html", "etag", "last_modified"), pages)
    rows = twice.collect()
    assert {r["refetch_status"] for r in rows} <= {"unchanged", "gone"}
    a = {r["url_canon"]: bytes(r["html"]) for r in once.collect()}
    b = {r["url_canon"]: bytes(r["html"]) for r in rows}
    assert a == b


def test_revisit_over_crawled_mirror(spark):
    """End-to-end: mutate the synthetic web, revisit the saved set —
    only genuinely-changed pages get new bytes."""
    from datagen import webgen
    from track0_spark.sources.pages import pages_from_rows

    rows = webgen.gen_pages(webgen.SF_UNIT)
    pages = pages_from_rows(spark, rows)
    saved = with_save_metadata(
        pages.select(F.col("url").alias("url_canon"), "html", "warc_ts")
        .orderBy("url_canon")
        .limit(50)
    )
    # mutate: every 5th page gets new bytes + newer ts; every 7th only ts
    mut = []
    for i, r in enumerate(rows):
        html, ts = r["html"], r["warc_ts"]
        if i % 5 == 0:
            html, ts = html + b"<!-- v2 -->", ts + 10**6
        elif i % 7 == 0:
            ts = ts + 10**6
        mut.append({**r, "html": html, "warc_ts": ts})
    out = revisit_merge(saved, pages_from_rows(spark, mut)).collect()
    assert len(out) == 50
    by_status = {}
    for r in out:
        by_status.setdefault(r["refetch_status"], []).append(r)
    assert by_status.get("modified") and by_status.get("unchanged")
    assert by_status.get("validated")  # ts-only mutation validates by etag
    for r in by_status.get("modified", []):
        assert bytes(r["html"]).endswith(b"<!-- v2 -->")
    for r in by_status.get("unchanged", []) + by_status.get("validated", []):
        assert not bytes(r["html"]).endswith(b"<!-- v2 -->")


def test_revisit_duplicate_pages_rows(spark):
    """Regression (r2 review): a pages snapshot with several fetches of
    one url must yield exactly one output row per saved url — the
    LATEST fetch wins (Iceberg MERGE cardinality semantics)."""
    from pyspark.sql import functions as F

    from track0_spark.operators.revisit import revisit_merge, with_save_metadata

    saved = with_save_metadata(
        spark.createDataFrame(
            [("u://1", bytearray(b"old"), 100)],
            "url_canon string, html binary, warc_ts long",
        )
    )
    pages = spark.createDataFrame(
        [
            ("u://1", bytearray(b"mid"), 150),
            ("u://1", bytearray(b"new"), 200),  # latest fetch wins
            ("u://1", bytearray(b"new"), 200),  # exact duplicate row
        ],
        "url string, html binary, warc_ts long",
    )
    out = revisit_merge(saved, pages).collect()
    assert len(out) == 1
    r = out[0]
    assert r["refetch_status"] == "modified"
    assert bytes(r["html"]) == b"new"
    assert r["last_modified"] == 200


def test_revisit_keys_are_canon_fixpoints(spark):
    """Guard for the failure mode VERDICT r2 #1 protects against: revisit
    keys on url_canon, so every canonical URL in the fixture MUST survive
    re-canonicalization unchanged (canonicalize is a fixpoint on its own
    output). A non-fixpoint canonical form would make a revisited page key
    drift between rounds and silently fork the saved set."""
    from datagen import webgen
    from track0s.canon import canonicalize

    rows = webgen.gen_pages(webgen.SF_UNIT)
    for r in rows:
        c = canonicalize(r["url"])
        assert canonicalize(c) == c, r["url"]
    # and the adversarial delimiter-drop family specifically
    for u in ["0 ?", "0 #", "0 ?#", "http://h.test/a ?", "  x y ? "]:
        c = canonicalize(u)
        assert canonicalize(c) == c, u


def test_recrawl_schedule_matches_python_twin(spark):
    """Engine-tier estimator == a direct Python evaluation of the same
    Cho & Garcia-Molina formula on a 3-regime history (frequent /
    rare / never changer)."""
    import datetime as dt
    import math

    from track0_spark.operators.revisit import due_urls, recrawl_schedule

    t0 = dt.datetime(2024, 1, 1)
    hist = []
    # fast: etag changes every observation (hourly)
    for i in range(6):
        hist.append(("u_fast", t0 + dt.timedelta(hours=i), f"e{i}"))
    # slow: one change across 6 daily observations
    for i in range(6):
        hist.append(("u_slow", t0 + dt.timedelta(days=i), "a" if i < 4 else "b"))
    # never: same etag, weekly
    for i in range(4):
        hist.append(("u_never", t0 + dt.timedelta(weeks=i), "same"))
    # too short: filtered out
    hist.append(("u_short", t0, "x"))
    hist.append(("u_short", t0 + dt.timedelta(days=1), "y"))
    df = spark.createDataFrame(
        hist, "url_canon string, fetch_ts timestamp, etag string"
    )
    got = {r["url_canon"]: r for r in recrawl_schedule(df).collect()}
    assert set(got) == {"u_fast", "u_slow", "u_never"}

    def twin(n, x, span_s):
        gap = span_s / (n - 1)
        r = -math.log((n - 1 - x + 0.5) / (n - 1 + 0.5))
        return gap, r

    # fast: n=6, x=5 changes, span 5h
    gap, r = twin(6, 5, 5 * 3600)
    assert got["u_fast"]["n_changes"] == 5
    assert abs(got["u_fast"]["change_rate_per_day"] - round(r / gap * 86400, 8)) < 1e-6
    exp_due = t0 + dt.timedelta(hours=5) + dt.timedelta(seconds=gap / r)
    assert abs((got["u_fast"]["due_at"] - exp_due).total_seconds()) < 0.01
    # slow: n=6, x=1
    gap_s_, r_s = twin(6, 1, 5 * 86400)
    assert got["u_slow"]["n_changes"] == 1
    # never: rate 0, due NULL
    assert got["u_never"]["n_changes"] == 0
    assert got["u_never"]["change_rate_per_day"] == 0.0
    assert got["u_never"]["due_at"] is None
    # ordering: the fast changer is due before the slow one
    assert got["u_fast"]["due_at"] < got["u_slow"]["due_at"]

    # due_urls: as_of just after the fast due date selects only u_fast
    sched = recrawl_schedule(df)
    sel = due_urls(sched, exp_due + dt.timedelta(seconds=1)).collect()
    assert [r["url_canon"] for r in sel] == ["u_fast"]
