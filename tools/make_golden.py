"""Regenerate the golden crawl fixture (FIXTURES.md §5).

The ORACLE is the source of truth; the golden file just pins its output
so accidental semantic drift in track0s/ is caught without running
Spark. Run explicitly after an intentional semantics change:

    python tools/make_golden.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datagen import webgen  # noqa: E402
from reference_impl.spider import OracleSpider  # noqa: E402
from track0s.config import CrawlConfig  # noqa: E402
from track0s.robots import RobotsTable  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "golden",
    "crawl_sf_unit.jsonl",
)

FOLLOW = "+original-domain -depth>3 +requisite"


def main() -> int:
    rows = webgen.gen_pages(webgen.SF_UNIT)
    robots = RobotsTable.from_rows(webgen.gen_robots_rows(webgen.SF_UNIT))
    cfg = CrawlConfig.from_specs(
        webgen.SEEDS, follow=FOLLOW, robots=robots, max_rounds=40
    )
    log = OracleSpider(cfg, webgen.store_from_rows(rows)).run()
    with open(OUT, "w") as f:
        for r in log:
            f.write(json.dumps(r, sort_keys=True) + "\n")
    print(f"{OUT}: {len(log)} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
