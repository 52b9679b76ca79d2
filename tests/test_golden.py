"""Golden-fixture pin: the oracle must reproduce the committed crawl log
byte-for-byte (FIXTURES.md §5). Catches accidental semantic drift in
track0s/ (canon, rules, extract, ordering) without starting Spark.
Regenerate intentionally with tools/make_golden.py.
"""

import json
import pathlib

from tools.make_golden import FOLLOW
from datagen import webgen
from reference_impl.spider import OracleSpider
from track0s.config import CrawlConfig
from track0s.robots import RobotsTable

GOLDEN = pathlib.Path(__file__).parent / "golden" / "crawl_sf_unit.jsonl"


def test_oracle_matches_golden():
    rows = webgen.gen_pages(webgen.SF_UNIT)
    robots = RobotsTable.from_rows(webgen.gen_robots_rows(webgen.SF_UNIT))
    cfg = CrawlConfig.from_specs(
        webgen.SEEDS, follow=FOLLOW, robots=robots, max_rounds=40
    )
    log = OracleSpider(cfg, webgen.store_from_rows(rows)).run()
    golden = [json.loads(line) for line in GOLDEN.read_text().splitlines()]
    assert [json.loads(json.dumps(r, sort_keys=True)) for r in log] == golden
