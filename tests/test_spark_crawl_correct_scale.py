"""Oracle equivalence at sf-correct scale (20k pages, 20 hosts):
partition-dependent nondeterminism that a 200-page web can hide —
shuffle-order effects in the dedup aggregate, anti-join, and salted
top-k — has 100x more chances to surface here (SURVEY.md §5.2.1)."""

from datagen import webgen
from reference_impl.spider import OracleSpider
from track0s.config import CrawlConfig
from track0s.robots import RobotsTable
from track0_spark.plans.loop import CrawlLoop
from track0_spark.sources.pages import pages_from_rows
from tests.test_spark_crawl import LOG_COLS, oracle_log_rows, spark_log_rows

ROUNDS = 4


def make_cfg():
    robots = RobotsTable.from_rows(
        webgen.gen_robots_rows(webgen.SF_CORRECT), default_budget=400
    )
    seeds = [webgen.page_url(i, 0) for i in range(webgen.SF_CORRECT.hosts)]
    return CrawlConfig.from_specs(
        seeds,
        follow="+domain=*.example.test -depth>6 +requisite",
        robots=robots,
        default_budget=400,
        max_rounds=ROUNDS,
    )


def test_sf_correct_prefix_matches_oracle(spark, tmp_path):
    rows = webgen.gen_pages(webgen.SF_CORRECT)
    sp = OracleSpider(make_cfg(), webgen.store_from_rows(rows))
    olog = sp.run()
    exp = [t for t in oracle_log_rows(olog) if t[0] < ROUNDS]

    pages = pages_from_rows(spark, rows)
    loop = CrawlLoop(
        spark, make_cfg(), pages, str(tmp_path / "ck"), salt=3
    )  # salted AND bloom on: the full production path
    loop.run(max_rounds=ROUNDS)
    got = spark_log_rows(loop)
    assert len(got) > 2000  # non-trivial volume
    assert got == exp
