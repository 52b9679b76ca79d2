"""The core acceptance tests: Spark engine == oracle, exactly.

Crawl-order + URL-seen-set exact match under the same seed list and
politeness budget (BASELINE.json:2,:14), byte-identical text extraction
(BASELINE.json:15), kill/resume reproducibility, and salted-top-k
equivalence (SURVEY.md §5.2).
"""

import pytest

from datagen import webgen
from reference_impl.spider import OracleSpider
from track0s.config import CrawlConfig
from track0s.robots import RobotsTable
from track0_spark.plans.loop import CrawlLoop
from track0_spark.sources.pages import pages_from_rows

FOLLOW = "+original-domain -depth>3 +requisite"

LOG_COLS = [
    "round",
    "fetch_seq",
    "url_canon",
    "host",
    "depth",
    "domain_depth",
    "status",
    "saved",
    "is_requisite",
]


def make_cfg():
    robots = RobotsTable.from_rows(webgen.gen_robots_rows(webgen.SF_UNIT))
    return CrawlConfig.from_specs(
        webgen.SEEDS, follow=FOLLOW, robots=robots, max_rounds=40
    )


@pytest.fixture(scope="module")
def web_rows():
    return webgen.gen_pages(webgen.SF_UNIT)


@pytest.fixture(scope="module")
def oracle_log(web_rows):
    sp = OracleSpider(make_cfg(), webgen.store_from_rows(web_rows))
    log = sp.run()
    return log, sp.seen


def spark_log_rows(loop):
    df = loop.crawl_log()
    rows = df.orderBy("round", "fetch_seq").collect()
    return [tuple(r[c] for c in LOG_COLS) for r in rows]


def oracle_log_rows(log):
    return [tuple(r[c] for c in LOG_COLS) for r in log]


def test_spark_matches_oracle_exactly(spark, web_rows, oracle_log, tmp_path):
    """THE acceptance bar: full crawl_log sequence + seen set match."""
    olog, oseen = oracle_log
    pages = pages_from_rows(spark, web_rows)
    loop = CrawlLoop(spark, make_cfg(), pages, str(tmp_path / "ckpt"))
    summary = loop.run()
    assert summary.fetched == len(olog)
    got = spark_log_rows(loop)
    exp = oracle_log_rows(olog)
    assert got == exp  # exact crawl order, statuses, save decisions
    seen_rows = loop.store.load_seen(summary.rounds)
    got_seen = {r["url_canon"] for r in seen_rows.collect()}
    assert got_seen == oseen
    assert summary.frontier_pending == 0


def test_resume_reproduces_identical_log(spark, web_rows, oracle_log, tmp_path):
    """Kill after 3 rounds -> resume -> identical full crawl_log."""
    olog, _ = oracle_log
    pages = pages_from_rows(spark, web_rows)
    root = str(tmp_path / "ckpt2")
    loop1 = CrawlLoop(spark, make_cfg(), pages, root)
    loop1.run(max_rounds=3)  # "killed" mid-crawl at a round boundary
    loop2 = CrawlLoop(spark, make_cfg(), pages, root)  # fresh loop, same store
    loop2.run()
    assert spark_log_rows(loop2) == oracle_log_rows(olog)


def test_salted_topk_identical_output(spark, web_rows, oracle_log, tmp_path):
    """P4 skew salting must not change ANY output row (SURVEY.md §5.2.3)."""
    olog, _ = oracle_log
    pages = pages_from_rows(spark, web_rows)
    loop = CrawlLoop(spark, make_cfg(), pages, str(tmp_path / "ckpt3"), salt=5)
    loop.run(max_rounds=6)
    got = spark_log_rows(loop)
    exp = [t for t in oracle_log_rows(olog) if t[0] < 6]
    assert got == exp


def test_bloom_gate_off_identical_output(spark, web_rows, oracle_log, tmp_path):
    """D3 acceptance (SURVEY.md §7 M5): gate on/off -> identical output.

    The main oracle test runs WITH the gate (default); this one disables
    it and must produce the same crawl_log prefix."""
    olog, _ = oracle_log
    pages = pages_from_rows(spark, web_rows)
    loop = CrawlLoop(
        spark, make_cfg(), pages, str(tmp_path / "ckpt4"), bloom=False
    )
    loop.run(max_rounds=5)
    got = spark_log_rows(loop)
    exp = [t for t in oracle_log_rows(olog) if t[0] < 5]
    assert got == exp


def test_text_extraction_byte_identical(spark, web_rows):
    """UDF text == pages.text for every url (BASELINE.json:15)."""
    from track0_spark.functions.udfs import extract_text_batches

    pages = pages_from_rows(spark, web_rows)
    out = pages.select("url", "html").mapInPandas(
        extract_text_batches, "url string, text string"
    )
    got = {r["url"]: r["text"] for r in out.collect()}
    for row in web_rows:
        assert got[row["url"]] == row["text"], row["url"]


def test_compaction_preserves_crawl_and_resume(spark, web_rows, oracle_log, tmp_path):
    """S5 seen compaction is a pure optimization: a crawl that compacts
    every 2 rounds (and a resume from a compacted store) reproduces the
    exact oracle crawl_log + seen set."""
    olog, oseen = oracle_log
    pages = pages_from_rows(spark, web_rows)
    root = str(tmp_path / "ckpt-compact")
    loop1 = CrawlLoop(spark, make_cfg(), pages, root, compact_every=2)
    loop1.run(max_rounds=5)
    assert loop1.store.latest_compact(5) == 4  # compaction actually ran
    # resume over the compacted base, keep compacting
    loop2 = CrawlLoop(spark, make_cfg(), pages, root, compact_every=2)
    summary = loop2.run()
    assert spark_log_rows(loop2) == oracle_log_rows(olog)
    got_seen = {
        r["url_canon"]
        for r in loop2.store.load_seen(summary.rounds).collect()
    }
    assert got_seen == oseen
    # load_seen from the compacted store == pure delta union
    import os

    base = loop2.store.latest_compact(summary.rounds)
    assert base is not None
    n_compacted = loop2.store.load_seen(summary.rounds).count()
    assert n_compacted == len(oseen)


def test_cuckoo_gate_identical_output(spark, web_rows, oracle_log, tmp_path):
    """gate="cuckoo" (deletable seen-gate variant) must not change any
    output row — same exactness contract as the Bloom gate."""
    olog, _ = oracle_log
    pages = pages_from_rows(spark, web_rows)
    loop = CrawlLoop(
        spark, make_cfg(), pages, str(tmp_path / "ckpt5"), gate="cuckoo"
    )
    loop.run(max_rounds=5)
    got = spark_log_rows(loop)
    exp = [t for t in oracle_log_rows(olog) if t[0] < 5]
    assert got == exp


def test_crawl_delay_budget_spark_matches_oracle(spark, web_rows, tmp_path):
    """Robots Crawl-delay actually binds when round_period_s is set:
    h0 declares Crawl-delay: 2.5 -> with a 10s nominal round only
    floor(10/2.5)=4 of its pending urls fetch per round; the crawl
    still matches the oracle exactly (same shared budget math)."""
    rows = [
        ("h0.example.test", ["/p/1"], 2.5, None, ["/p/10"]),
        ("h1.example.test", [], 0.0, 3),
    ]
    robots = RobotsTable.from_rows(rows)
    cfg = CrawlConfig.from_specs(
        webgen.SEEDS, follow=FOLLOW, robots=robots, max_rounds=40,
        round_period_s=10.0,
    )
    assert robots.budget("h0.example.test", 10.0) == 4
    assert robots.budget("h0.example.test") == robots.default_budget
    assert robots.budget("h1.example.test", 10.0) == 3  # no delay: unchanged
    # pathological delay degrades to 1/round, never 0
    assert RobotsTable.from_rows([("x", [], 99.0, None)]).budget("x", 10.0) == 1

    sp = OracleSpider(cfg, webgen.store_from_rows(web_rows))
    olog = sp.run()
    from collections import Counter

    per = Counter((r["round"], r["host"]) for r in olog)
    h0 = [n for (rr, h), n in per.items() if h == "h0.example.test"]
    assert max(h0) == 4 and len(h0) > 3  # the cap binds, repeatedly

    pages = pages_from_rows(spark, web_rows)
    loop = CrawlLoop(spark, cfg, pages, str(tmp_path / "ckpt_cd"))
    loop.run()
    assert spark_log_rows(loop) == oracle_log_rows(olog)


def _retry_web():
    """Tiny hand-built web exercising the transient-failure tier: the
    seed links to a page that recovers on attempt 2 (and itself links
    onward — content reachable ONLY through a successful retry), one
    that never recovers within retry_max, and one ordinary page."""
    def page(url, body):
        return {
            "url": url, "warc_ts": 1_700_000_000, "lang": "en",
            "html": body.encode(), "text": "",
        }

    h = "http://h9.example.test"
    return [
        page(f"{h}/p/0",
             f'<html><body><a href="/flaky">f</a><a href="/dead">d</a>'
             f'<a href="/ok">o</a></body></html>'),
        page(f"{h}/flaky",
             '<html><head><meta http-equiv="retry-after" content="2">'
             '</head><body><a href="/behind-flaky">b</a></body></html>'),
        page(f"{h}/dead",
             '<html><head><meta http-equiv="retry-after" content="99">'
             '</head><body>never</body></html>'),
        page(f"{h}/ok", "<html><body>fine</body></html>"),
        page(f"{h}/behind-flaky", "<html><body>prize</body></html>"),
    ]


def test_retry_transient_spark_matches_oracle(spark, tmp_path):
    rows = _retry_web()
    cfg = CrawlConfig.from_specs(
        ["http://h9.example.test/p/0"], follow="+original-domain",
        max_rounds=40, retry_max=3,
    )
    sp = OracleSpider(cfg, webgen.store_from_rows(rows))
    olog = sp.run()
    by_url = {}
    for r in olog:
        by_url.setdefault(r["url_canon"].rsplit("/", 1)[-1], []).append(
            r["status"]
        )
    # flaky: 503, 503, then recovers -> its child gets crawled
    assert by_url["flaky"] == [503, 503, 200]
    assert by_url["behind-flaky"] == [200]
    # dead: retried up to retry_max additional attempts, then dropped
    assert by_url["dead"] == [503, 503, 503, 503]
    assert by_url["ok"] == [200]

    pages = pages_from_rows(spark, rows)
    loop = CrawlLoop(spark, cfg, pages, str(tmp_path / "ckpt_rt"))
    loop.run()
    assert spark_log_rows(loop) == oracle_log_rows(olog)


def test_retry_resume_mid_retry_reproduces_log(spark, tmp_path):
    """Kill while retries are pending -> resume -> identical log (the
    attempts column survives the frontier checkpoint round-trip)."""
    rows = _retry_web()
    cfg = CrawlConfig.from_specs(
        ["http://h9.example.test/p/0"], follow="+original-domain",
        max_rounds=40, retry_max=3,
    )
    olog = OracleSpider(cfg, webgen.store_from_rows(rows)).run()
    pages = pages_from_rows(spark, rows)
    root = str(tmp_path / "ckpt_rt2")
    CrawlLoop(spark, cfg, pages, root).run(max_rounds=2)  # mid-retry kill
    loop2 = CrawlLoop(spark, cfg, pages, root)
    loop2.run()
    assert spark_log_rows(loop2) == oracle_log_rows(olog)


def test_retry_tier_off_ignores_marker(spark, tmp_path):
    """Default config (retry_max=None): marker pages fetch as plain 200
    content — the pre-round-5 behavior, knob-gated."""
    rows = _retry_web()
    cfg = CrawlConfig.from_specs(
        ["http://h9.example.test/p/0"], follow="+original-domain",
        max_rounds=40,
    )
    olog = OracleSpider(cfg, webgen.store_from_rows(rows)).run()
    statuses = {r["url_canon"].rsplit("/", 1)[-1]: r["status"] for r in olog}
    assert statuses["flaky"] == 200 and statuses["dead"] == 200
    pages = pages_from_rows(spark, rows)
    loop = CrawlLoop(spark, cfg, pages, str(tmp_path / "ckpt_rt3"))
    loop.run()
    assert spark_log_rows(loop) == oracle_log_rows(olog)
