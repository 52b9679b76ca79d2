"""Selective seen-set FORGET (sources/snapshot.py forget_seen): the
staleness/recrawl primitive. Forgotten URLs leave the seen state (new
compacted base), become re-admittable on their next link discovery,
and the crawl's exactness is gate-independent: approximate gates may
still carry the forgotten fingerprints (false positives — one wasted
exact probe each), while the deletable cuckoo-colocated gate restores
precision via a distributed fingerprint delete, no rebuild."""

import json
import os
import subprocess
import sys
from collections import Counter

import pytest

from datagen import webgen
from track0s.config import CrawlConfig
from track0s.robots import RobotsTable
from track0s.rules import parse_pipeline
from track0_spark.functions.rules_compile import compile_rules
from track0_spark.plans.loop import CrawlLoop
from track0_spark.sources.pages import pages_from_rows

FOLLOW = "+original-domain -depth>3 +requisite"
FORGET_SPEC = "+url=*/static/site.css"


def make_cfg():
    robots = RobotsTable.from_rows(webgen.gen_robots_rows(webgen.SF_UNIT))
    return CrawlConfig.from_specs(
        webgen.SEEDS, follow=FOLLOW, robots=robots, max_rounds=40
    )


@pytest.fixture(scope="module")
def web_rows():
    return webgen.gen_pages(webgen.SF_UNIT)


def _forget_match():
    return compile_rules(parse_pipeline(FORGET_SPEC), False, [], [])


def _run_forget_flow(spark, web_rows, root, gate):
    """Crawl 4 rounds -> forget the per-host stylesheets -> (cuckoo:
    delete fingerprints) -> resume to completion. Returns (gone,
    ordered full log rows)."""
    pages = pages_from_rows(spark, web_rows)
    loop = CrawlLoop(spark, make_cfg(), pages, root, gate=gate)
    loop.run(max_rounds=4)
    store = loop.store
    latest = store.latest_round()
    before = store.load_seen(latest).count()
    meta = store.forget_seen(latest, _forget_match())
    assert meta["forgotten"] >= 1
    assert meta["rows"] + meta["forgotten"] == before
    gone = {r["url_canon"] for r in store.load_forgotten(latest).collect()}
    assert all(u.endswith("/static/site.css") for u in gone)
    left = {r["url_canon"] for r in store.load_seen(latest).collect()}
    assert not (left & gone)
    if gate == "cuckoo-colocated":
        from track0_spark.operators.cuckoo_colocated import ColocatedCuckooGate

        g = ColocatedCuckooGate(spark, root)
        g.ensure(latest)
        removed = g.delete_distributed(store.load_forgotten(latest), upto=latest)
        assert removed == len(gone)
    loop2 = CrawlLoop(spark, make_cfg(), pages, root, gate=gate)
    loop2.run()
    rows = [
        (r["round"], r["fetch_seq"], r["url_canon"], r["status"])
        for r in loop2.crawl_log().orderBy("round", "fetch_seq").collect()
    ]
    return gone, rows


def test_forget_makes_urls_readmittable(spark, web_rows, tmp_path):
    """Forgotten stylesheets are RE-FETCHED once any later page links
    them again; every non-forgotten url is still fetched exactly once."""
    gone, rows = _run_forget_flow(spark, web_rows, str(tmp_path / "f1"), "bloom")
    cnt = Counter(u for _r, _s, u, _st in rows)
    refetched = {u for u in gone if cnt[u] >= 2}
    assert refetched, "no forgotten url was re-discovered and re-fetched"
    bad = {u: c for u, c in cnt.items() if u not in gone and c != 1}
    assert not bad, f"non-forgotten urls fetched != once: {bad}"


def test_forget_output_is_gate_invariant(spark, web_rows, tmp_path):
    """The post-forget crawl is EXACTLY the same under the default
    driver bloom (stale fingerprints = harmless false positives) and
    under the cuckoo-colocated gate with real fingerprint deletion —
    exactness never depends on the gate's precision."""
    gone_a, rows_a = _run_forget_flow(
        spark, web_rows, str(tmp_path / "fa"), "bloom"
    )
    gone_b, rows_b = _run_forget_flow(
        spark, web_rows, str(tmp_path / "fb"), "cuckoo-colocated"
    )
    assert gone_a == gone_b
    assert rows_a == rows_b


def test_forget_cli(tmp_path):
    """jobs/crawl.py --forget: crawl 4 rounds, forget via rule spec,
    resume — one seen-store, three CLI invocations."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt = str(tmp_path / "ck")

    def run(*extra):
        out = subprocess.run(
            [sys.executable, os.path.join(repo, "jobs", "crawl.py"), *extra],
            capture_output=True, text=True, cwd=repo, timeout=420,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][0]
        return json.loads(line)

    first = run(
        "--profile", "sf-unit", "--rounds", "4", "--ckpt", ckpt,
        "--cores", "4", "--head", "0",
    )
    assert first["rounds"] == 4
    forgot = run(
        "--forget", FORGET_SPEC, "--ckpt", ckpt, "--cores", "4",
        "--profile", "sf-unit",
    )
    assert forgot["forget"]["forgotten"] >= 1
    resumed = run(
        "--profile", "sf-unit", "--rounds", "40", "--ckpt", ckpt,
        "--cores", "4", "--head", "0",
    )
    # the resumed crawl re-fetched the forgotten stylesheets: total
    # fetches exceed a never-forgotten full crawl's (136 on sf-unit)
    assert resumed["fetched"] + first["fetched"] > 136
    assert resumed["frontier_pending"] == 0
