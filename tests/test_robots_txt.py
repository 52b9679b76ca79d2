"""robots.txt text parsing + archive ingestion (RFC 9309 subset;
track0s/robots.py parse_robots_txt, sources/robots_txt.py)."""

import datetime as dt

import pytest

from track0s.robots import (
    RobotsTable,
    parse_robots_txt,
    robots_table_from_texts,
)

BODY = """\
# global rules
User-agent: *
Disallow: /private/
Allow: /private/ok/
Crawl-delay: 2

User-agent: track0s
User-agent: otherbot
Disallow: /only-for-track0s/
Crawl-delay: 0.5

User-agent: greedy
Disallow: /
"""


def test_parse_star_group():
    allow, dis, delay = parse_robots_txt(BODY, agent="randombot")
    assert dis == ("/private/",)
    assert allow == ("/private/ok/",)
    assert delay == 2.0


def test_parse_specific_group_overrides_star():
    # RFC 9309 §2.2.1: the most specific matching group applies ALONE
    allow, dis, delay = parse_robots_txt(BODY, agent="track0s/0.4")
    assert dis == ("/only-for-track0s/",)
    assert allow == ()
    assert delay == 0.5


def test_parse_shared_agent_lines():
    _, dis, _ = parse_robots_txt(BODY, agent="otherbot")
    assert dis == ("/only-for-track0s/",)


def test_parse_edge_cases():
    # empty disallow = allow all; comments; case-insensitive keys;
    # unparseable crawl-delay ignored; unknown directives skipped
    body = (
        "User-Agent: *\n"
        "DISALLOW:\n"
        "disallow: /x/  # trailing comment\n"
        "Crawl-delay: soon\n"
        "Sitemap: http://h/sitemap.xml\n"
    )
    allow, dis, delay = parse_robots_txt(body)
    assert dis == ("/x/",)
    assert allow == ()
    assert delay == 0.0
    assert parse_robots_txt("") == ((), (), 0.0)


def test_robots_table_from_texts_semantics():
    t = robots_table_from_texts(
        [("h.test", BODY)], agent="randombot", default_budget=7
    )
    assert not t.allowed("h.test", "/private/secret")
    assert t.allowed("h.test", "/private/ok/page")  # longest-match Allow
    assert t.allowed("h.test", "/public")
    assert t.allowed("unknown.test", "/anything")
    assert t.budget("h.test") == 7


@pytest.fixture(scope="module")
def robots_pages(spark):
    from track0_spark.schemas import PAGES

    ts = dt.datetime(2024, 3, 1)
    rows = [
        ("http://a.example.test/robots.txt", ts, BODY.encode(), None, None),
        # later capture of the same host wins (revisit convention)
        (
            "http://b.example.test/robots.txt",
            ts,
            b"User-agent: *\nDisallow: /old/\n",
            None,
            None,
        ),
        (
            "http://b.example.test/robots.txt",
            ts + dt.timedelta(days=1),
            b"User-agent: *\nDisallow: /new/\n",
            None,
            None,
        ),
        # not robots documents
        ("http://a.example.test/robots.txt.bak", ts, b"x", None, None),
        ("http://a.example.test/p/robots.txt", ts, b"x", None, None),
        ("http://c.example.test/page", ts, b"<html></html>", None, None),
    ]
    return spark.createDataFrame(rows, schema=PAGES)


def test_spark_rows_match_shared_parser(spark, robots_pages):
    from track0_spark.sources.robots_txt import robots_table_rows

    rows = sorted(robots_table_rows(robots_pages), key=lambda r: r[0])
    assert [r[0] for r in rows] == ["a.example.test", "b.example.test"]
    a = rows[0]
    exp_allow, exp_dis, exp_delay = parse_robots_txt(BODY)
    assert tuple(a[1]) == exp_dis and tuple(a[4]) == exp_allow
    assert a[2] == exp_delay and a[3] is None
    # latest capture won for host b
    assert rows[1][1] == ["/new/"]


def test_archive_robots_drive_both_engines_identically(
    spark, robots_pages, tmp_path
):
    """A crawl whose politeness comes from the archive's robots.txt:
    the disallow actually blocks, and spark == oracle exactly (same
    RobotsTable rows on both sides)."""
    from datagen import webgen
    from reference_impl.spider import OracleSpider
    from track0s.config import CrawlConfig
    from track0_spark.plans.loop import CrawlLoop
    from track0_spark.sources.pages import pages_from_rows
    from track0_spark.sources.robots_txt import robots_table_rows

    web_rows = webgen.gen_pages(webgen.SF_UNIT)
    robots_body = b"User-agent: *\nDisallow: /static/\n"
    ts = dt.datetime(2024, 3, 1)
    aug = list(web_rows) + [
        {
            "url": f"http://h{i}.example.test/robots.txt",
            "warc_ts": 1_700_000_000,
            "html": robots_body,
            "text": None,
            "lang": None,
        }
        for i in range(3)
    ]
    pages = pages_from_rows(spark, aug)
    rows = robots_table_rows(pages)
    assert all(r[1] == ["/static/"] for r in rows)
    robots = RobotsTable.from_rows(rows, default_budget=100)
    cfg = CrawlConfig.from_specs(
        webgen.SEEDS,
        follow="+original-domain -depth>3 +requisite",
        robots=robots,
        max_rounds=6,
    )
    olog = OracleSpider(cfg, webgen.store_from_rows(aug)).run()
    assert olog, "oracle crawl empty"
    assert not any("/static/" in r["url_canon"] for r in olog)
    loop = CrawlLoop(spark, cfg, pages, str(tmp_path / "ckpt"))
    loop.run()
    cols = ["round", "fetch_seq", "url_canon", "status"]
    srows = [
        tuple(r[c] for c in cols)
        for r in loop.crawl_log().orderBy("round", "fetch_seq").collect()
    ]
    assert srows == [tuple(r[c] for c in cols) for r in olog]
