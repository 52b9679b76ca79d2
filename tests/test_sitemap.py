"""Sitemap seed expansion (operators/sitemap.py; sitemaps.org spec)."""

import datetime as dt

import pytest

from track0_spark.operators.sitemap import sitemap_seeds
from track0_spark.schemas import PAGES

TS = dt.datetime(2024, 5, 1)


def _page(url, body):
    return (url, TS, body.encode("utf-8"), None, None)


def _pages(spark, rows):
    return spark.createDataFrame(rows, schema=PAGES)


URLSET_A = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>http://a.example.test/p/1</loc><lastmod>2024-01-01</lastmod></url>
  <url><loc>
      http://a.example.test/p/2?x=1&amp;y=2
  </loc></url>
</urlset>"""

INDEX_B = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>http://b.example.test/maps/part-1.xml</loc></sitemap>
  <sitemap><loc>http://b.example.test/maps/part-missing.xml</loc></sitemap>
</sitemapindex>"""

URLSET_B1 = """<urlset>
  <url><loc>http://b.example.test/q/1</loc></url>
  <url><loc>http://b.example.test/q/1</loc></url>
</urlset>"""


@pytest.fixture(scope="module")
def pages(spark):
    return _pages(
        spark,
        [
            _page("http://a.example.test/sitemap.xml", URLSET_A),
            _page("http://b.example.test/sitemap.xml", INDEX_B),
            _page("http://b.example.test/maps/part-1.xml", URLSET_B1),
            _page("http://a.example.test/p/1", "<html>not a sitemap</html>"),
        ],
    )


def test_urlset_seeds_extracted_and_unescaped(spark, pages):
    seeds = {
        (r["seed_url"], r["src_sitemap"])
        for r in sitemap_seeds(pages).collect()
    }
    assert ("http://a.example.test/p/1", "http://a.example.test/sitemap.xml") in seeds
    # whitespace trimmed, &amp; unescaped
    assert (
        "http://a.example.test/p/2?x=1&y=2",
        "http://a.example.test/sitemap.xml",
    ) in seeds


def test_index_recursion_one_hop(spark, pages):
    seeds = {r["seed_url"]: r["src_sitemap"] for r in sitemap_seeds(pages).collect()}
    # the index's child urlset was followed; seed attributed to the CHILD
    assert seeds["http://b.example.test/q/1"] == "http://b.example.test/maps/part-1.xml"
    # index <loc> entries are sitemap pointers, never seeds
    assert "http://b.example.test/maps/part-1.xml" not in seeds
    # missing child sitemap (not archived) contributes nothing, no error
    assert not any(u.endswith("part-missing.xml") for u in seeds)


def test_hop_limit(spark, pages):
    seeds = {r["seed_url"] for r in sitemap_seeds(pages, max_hops=1).collect()}
    # with recursion off, only direct urlset sitemaps contribute
    assert "http://b.example.test/q/1" not in seeds
    assert "http://a.example.test/p/1" in seeds


def test_dedup_and_non_sitemap_pages_ignored(spark, pages):
    rows = sitemap_seeds(pages).collect()
    assert len(rows) == len({(r["seed_url"], r["src_sitemap"]) for r in rows})
    assert len([r for r in rows if r["seed_url"] == "http://b.example.test/q/1"]) == 1


def test_seeds_drive_a_crawl(spark, tmp_path):
    """Expanded seeds feed the engine's normal seed path: a crawl
    seeded from sitemap_seeds fetches exactly the sitemap's URLs plus
    what follows from them."""
    from datagen import webgen
    from track0s.config import CrawlConfig
    from track0s.robots import RobotsTable
    from track0_spark.plans.loop import CrawlLoop
    from track0_spark.sources.pages import pages_from_rows

    web_rows = webgen.gen_pages(webgen.SF_UNIT)
    pages = pages_from_rows(spark, web_rows)
    sm_body = (
        "<urlset>"
        + "".join(f"<url><loc>{u}</loc></url>" for u in webgen.SEEDS)
        + "</urlset>"
    )
    with_sm = pages.unionByName(
        _pages(spark, [_page("http://h0.example.test/sitemap.xml", sm_body)])
    )
    seeds = sorted(
        r["seed_url"] for r in sitemap_seeds(with_sm).collect()
    )
    assert seeds == sorted(webgen.SEEDS)
    robots = RobotsTable.from_rows(webgen.gen_robots_rows(webgen.SF_UNIT))
    cfg = CrawlConfig.from_specs(
        seeds,
        follow="+original-domain -depth>3 +requisite",
        robots=robots,
        max_rounds=3,
    )
    loop = CrawlLoop(spark, cfg, pages, str(tmp_path / "ckpt"))
    loop.run()
    assert loop.crawl_log().count() > 0


def test_sitemap_lastmod_freshest_per_url(spark):
    """<lastmod> parsing: date-only and full ISO both parse, malformed
    and missing values drop, the freshest declaration per url wins."""
    from track0_spark.operators.sitemap import sitemap_lastmod

    body = """<?xml version="1.0"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>http://x.test/p/1</loc><lastmod>2024-03-01</lastmod></url>
  <url>
    <loc>http://x.test/p/1</loc>
    <lastmod>2024-04-02T10:30:00Z</lastmod>
  </url>
  <url><loc>http://x.test/p/2</loc><lastmod>not-a-date</lastmod></url>
  <url><loc>http://x.test/p/3</loc></url>
  <url><loc>http://x.test/a&amp;b</loc><lastmod>2024-01-05</lastmod></url>
</urlset>"""
    pages = _pages(
        spark,
        [
            _page("http://x.test/sitemap.xml", body),
            _page("http://x.test/p/1", "<html>not a sitemap</html>"),
        ],
    )
    got = {r["url"]: r["lastmod"] for r in sitemap_lastmod(pages).collect()}
    assert set(got) == {"http://x.test/p/1", "http://x.test/a&b"}
    assert got["http://x.test/p/1"] == dt.datetime(2024, 4, 2, 10, 30)
    assert got["http://x.test/a&b"] == dt.datetime(2024, 1, 5)
