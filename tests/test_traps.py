"""Crawler-trap defense end to end (rules path-loop / path-depth /
query-params; SURVEY §2.3 trap addendum).

A synthetic trap web: a self-deepening symlink-style loop
(/t/a, /t/a/a, /t/a/a/a, …) and an unbounded faceted-search space
(?p1&p2&…) — each page links one level deeper, so an undefended crawl
never converges.  The trap rules must (a) cut both chains at the
configured bound, (b) leave the healthy branch untouched, and
(c) produce the EXACT same crawl_log from the Spark engine and the
sequential oracle — the standard acceptance bar, here under rules the
round plan compiles to native HOF folds.
"""

import pytest

from datagen import webgen
from reference_impl.spider import OracleSpider
from track0s.config import CrawlConfig
from track0s.robots import RobotsTable
from track0_spark.plans.loop import CrawlLoop
from track0_spark.sources.pages import pages_from_rows

HOST = "trap.example.test"
SEED = f"http://{HOST}/start"

FOLLOW = "+original-domain -path-loop>3 -query-params>2"


def _row(url, links):
    html = "<html><body>" + "".join(
        f'<a href="{u}">x</a>' for u in links
    ) + "</body></html>"
    return {
        "url": url,
        "warc_ts": 1_700_000_000,
        "html": html.encode(),
        "text": "t",
        "lang": "en",
    }


@pytest.fixture(scope="module")
def trap_rows():
    rows = [
        _row(
            SEED,
            [f"http://{HOST}/t/a", f"http://{HOST}/f", f"http://{HOST}/ok/1"],
        )
    ]
    # symlink loop: each level links one deeper (depth rule alone would
    # allow 40 hops; path-loop>3 must cut at /t + 4 segments)
    for depth in range(1, 10):
        path = "/t/" + "/".join(["a"] * depth)
        rows.append(_row(f"http://{HOST}{path}", [f"http://{HOST}{path}/a"]))
    # faceted-search trap: each page adds a query param
    for n in range(1, 8):
        q = "&".join(f"p{i}=1" for i in range(1, n + 1))
        nxt = "&".join(f"p{i}=1" for i in range(1, n + 2))
        rows.append(
            _row(f"http://{HOST}/f?{q}", [f"http://{HOST}/f?{nxt}"])
        )
    rows.append(_row(f"http://{HOST}/f", [f"http://{HOST}/f?p1=1"]))
    # healthy branch, untouched by the trap rules
    for i in range(1, 4):
        rows.append(_row(f"http://{HOST}/ok/{i}", [f"http://{HOST}/ok/{i + 1}"]))
    return rows


def _cfg():
    return CrawlConfig.from_specs(
        [SEED],
        follow=FOLLOW,
        robots=RobotsTable(default_budget=100),
        max_rounds=20,
    )


def test_oracle_cuts_traps(trap_rows):
    sp = OracleSpider(_cfg(), webgen.store_from_rows(trap_rows))
    log = sp.run()
    fetched = {r["url_canon"] for r in log}
    # loop cut: /t/a/a/a (path-loop 3) fetched, 4-deep never admitted
    assert f"http://{HOST}/t/a/a/a" in fetched
    assert f"http://{HOST}/t/a/a/a/a" not in fetched
    # query trap cut: 2 params fetched, 3 never admitted
    assert f"http://{HOST}/f?p1=1&p2=1" in fetched
    assert f"http://{HOST}/f?p1=1&p2=1&p3=1" not in fetched
    # healthy branch fully crawled (404 for /ok/4 is still a fetch)
    assert f"http://{HOST}/ok/3" in fetched


def test_spark_matches_oracle_on_trap_web(spark, trap_rows, tmp_path):
    sp = OracleSpider(_cfg(), webgen.store_from_rows(trap_rows))
    olog = sp.run()
    loop = CrawlLoop(
        spark, _cfg(), pages_from_rows(spark, trap_rows), str(tmp_path / "ckpt")
    )
    loop.run()
    cols = ["round", "fetch_seq", "url_canon", "status"]
    srows = [
        tuple(r[c] for c in cols)
        for r in loop.crawl_log().orderBy("round", "fetch_seq").collect()
    ]
    orows = [tuple(r[c] for c in cols) for r in olog]
    assert srows == orows
