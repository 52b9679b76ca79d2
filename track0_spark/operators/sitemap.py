"""Sitemap ingestion: seed expansion from sitemap.xml archives.

track0 takes its seeds from the CLI (SURVEY §2.1 S1); real crawls at
Common-Crawl scale bootstrap their frontier from the sitemaps protocol
(sitemaps.org, public spec): ``/sitemap.xml`` documents listing
``<loc>`` URLs, optionally nested one level through ``<sitemapindex>``
files that list further sitemaps.  This operator turns every sitemap
already present in a pages archive into frontier seed rows — the
"seed ingestion at archive scale" complement to the CLI seed list.

Spark shape (all native, zero Python in the hot path):

* the sitemap scan is a pushable ``url rlike`` filter over the pages
  table — at 10^10 pages the scan prunes to the ~1-per-host sitemap
  rows before the fat ``html`` column is ever decoded;
* ``<loc>`` extraction is ``regexp_extract_all`` over the decoded
  body — codegen'd, no UDF;
* sitemap-index recursion is a driver loop of at most ``max_hops``
  semi-joins: the *discovered sitemap URL set* (tiny — bounded by
  host count) joins back against the pages table's url key, so each
  hop is a broadcast semi-join against a pruned scan, never a
  re-scan of decoded bodies.

The XML handling is deliberately the subset the sitemaps spec
requires (``<loc>`` inside ``<url>``/``<sitemap>``, the five
predefined XML entities) — a full XML parser would put a per-row
Python UDF on an archive-wide scan for no added fidelity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Default pattern identifying sitemap documents by URL.
SITEMAP_URL_RE = r"/sitemap[^/]*\.xml$"

_LOC_RE = r"<loc>\s*([^<]+?)\s*</loc>"


def _xml_unescape(c: Column) -> Column:
    """The five predefined XML entities (sitemaps.org requires URLs in
    <loc> to be entity-escaped); &amp; last so it can't re-expand."""
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&apos;", "'"),
        ("&amp;", "&"),
    ):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def _locs(pages: DataFrame) -> DataFrame:
    """(sitemap_url, loc, is_index) — one row per <loc> entry."""
    body = F.decode(F.col("html"), "UTF-8")
    return (
        pages.select(
            F.col("url").alias("sitemap_url"),
            F.explode(F.regexp_extract_all(body, F.lit(_LOC_RE), F.lit(1))).alias(
                "loc"
            ),
            body.contains("<sitemapindex").alias("is_index"),
        )
        .select(
            "sitemap_url",
            _xml_unescape(F.col("loc")).alias("loc"),
            "is_index",
        )
    )


_URL_BLOCK_RE = r"(?s)<url>(.*?)</url>"
_LASTMOD_RE = r"<lastmod>\s*([^<]+?)\s*</lastmod>"


def sitemap_lastmod(
    pages: DataFrame, url_pattern: str = SITEMAP_URL_RE
) -> DataFrame:
    """``(url, lastmod)`` — the freshest ``<lastmod>`` the archive's
    sitemaps declare per listed URL. This is the sitemaps protocol's
    OTHER half: beyond seeding the frontier, ``<lastmod>`` tells an
    update sweep what changed without refetching anything — the signal
    ``--update --due-from-sitemaps`` keys on (the revisit tier's
    zero-cost complement to the Cho & Garcia-Molina history estimator,
    which needs >= 3 observed fetches before it can schedule).

    Native end to end: pushable url prune, ``(?s)<url>…</url>`` block
    explode via regexp_extract_all, per-block loc/lastmod regexps,
    entity unescape as a replace chain, a lenient timestamp cast
    (W3C datetime: date-only and full ISO-8601 both parse; malformed
    values null out and drop), and one max() hash agg per url."""
    body = F.decode(F.col("html"), "UTF-8")
    blocks = (
        pages.filter(F.col("url").rlike(url_pattern))
        .select(
            F.explode(
                F.regexp_extract_all(body, F.lit(_URL_BLOCK_RE), F.lit(1))
            ).alias("block")
        )
    )
    rows = blocks.select(
        _xml_unescape(
            F.regexp_extract(F.col("block"), _LOC_RE, 1)
        ).alias("url"),
        # try_to_timestamp, not cast: real-web <lastmod> values are
        # dirty and a malformed one must drop, not kill the sweep
        F.try_to_timestamp(
            F.regexp_extract(F.col("block"), _LASTMOD_RE, 1)
        ).alias("lastmod"),
    ).filter((F.col("url") != "") & F.col("lastmod").isNotNull())
    return rows.groupBy("url").agg(F.max("lastmod").alias("lastmod"))


def sitemap_seeds(
    pages: DataFrame,
    url_pattern: str = SITEMAP_URL_RE,
    max_hops: int = 2,
) -> DataFrame:
    """Distinct ``(seed_url, src_sitemap)`` rows from every sitemap in
    the archive, following ``<sitemapindex>`` references through
    archived child sitemaps up to ``max_hops`` levels.

    ``<loc>`` entries of an *index* sitemap name further sitemaps and
    are never themselves seeds (sitemaps.org semantics); entries of a
    plain ``<urlset>`` sitemap are the seeds.
    """
    roots = pages.filter(F.col("url").rlike(url_pattern))
    locs = _locs(roots)
    seeds = locs.filter(~F.col("is_index")).select(
        F.col("loc").alias("seed_url"), F.col("sitemap_url").alias("src_sitemap")
    )
    child_urls = locs.filter(F.col("is_index")).select(F.col("loc").alias("url"))
    for _ in range(max_hops - 1):
        # archived child sitemaps referenced by an index: tiny URL set,
        # broadcast semi-join against the pages url key
        children = pages.join(F.broadcast(child_urls.distinct()), "url", "left_semi")
        clocs = _locs(children)
        seeds = seeds.unionByName(
            clocs.filter(~F.col("is_index")).select(
                F.col("loc").alias("seed_url"),
                F.col("sitemap_url").alias("src_sitemap"),
            )
        )
        child_urls = clocs.filter(F.col("is_index")).select(
            F.col("loc").alias("url")
        )
    return seeds.distinct()
