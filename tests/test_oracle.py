"""Oracle spider behavioral tests on hand-written micro-webs + sf-unit."""

from datagen import webgen
from reference_impl.spider import OracleSpider, PageRecord
from track0s.config import CrawlConfig
from track0s.robots import RobotsTable


def page(url, html):
    return PageRecord(url, html.encode("utf-8"), "", "en", 0)


def mini_store(pages: dict[str, str]):
    return {u: page(u, h) for u, h in pages.items()}


def run(store, seeds, follow="+original-domain", **kw):
    cfg = CrawlConfig.from_specs(seeds, follow=follow, **kw)
    sp = OracleSpider(cfg, store)
    log = sp.run()
    return log, sp.seen


def test_linear_chain_depth_rounds():
    store = mini_store(
        {
            "http://a.test/0": '<a href="/1">n</a>',
            "http://a.test/1": '<a href="/2">n</a>',
            "http://a.test/2": "",
        }
    )
    log, seen = run(store, ["http://a.test/0"])
    assert [(r["round"], r["url_canon"], r["depth"]) for r in log] == [
        (0, "http://a.test/0", 0),
        (1, "http://a.test/1", 1),
        (2, "http://a.test/2", 2),
    ]
    assert seen == {"http://a.test/0", "http://a.test/1", "http://a.test/2"}


def test_seen_set_no_refetch_on_cycle():
    store = mini_store(
        {
            "http://a.test/0": '<a href="/1">n</a>',
            "http://a.test/1": '<a href="/0">back</a>',
        }
    )
    log, _ = run(store, ["http://a.test/0"])
    assert len(log) == 2  # cycle broken


def test_canonicalization_dedups_fragment_variant():
    store = mini_store(
        {
            "http://a.test/0": '<a href="/1">x</a><a href="/1#frag">y</a>'
            '<a href="/x/../1">z</a>',
            "http://a.test/1": "",
        }
    )
    log, _ = run(store, ["http://a.test/0"])
    assert [r["url_canon"] for r in log] == ["http://a.test/0", "http://a.test/1"]


def test_politeness_budget_defers_not_drops():
    store = mini_store(
        {"http://a.test/0": "".join(f'<a href="/{i}">x</a>' for i in range(1, 6))}
    )
    robots = RobotsTable.from_rows([("a.test", [], 0.0, 2)])
    log, _ = run(store, ["http://a.test/0"], robots=robots)
    rounds = {}
    for r in log:
        rounds.setdefault(r["round"], []).append(r["url_canon"])
    assert len(rounds[0]) == 1  # seed only
    assert all(len(v) <= 2 for v in rounds.values())
    fetched = [u for v in rounds.values() for u in v]
    assert len(fetched) == 6  # every URL eventually fetched


def test_robots_disallow_prefix():
    store = mini_store(
        {"http://a.test/0": '<a href="/p/1">x</a><a href="/q/2">y</a>'}
    )
    robots = RobotsTable.from_rows([("a.test", ["/p/"], 0.0, None)])
    log, _ = run(store, ["http://a.test/0"], robots=robots)
    assert [r["url_canon"] for r in log] == ["http://a.test/0", "http://a.test/q/2"]


def test_robots_longest_match_allow():
    """RFC 9309 longest-match: Allow re-admits inside a Disallow range;
    a longer Disallow still wins; equal lengths resolve to Allow."""
    pages = {
        "http://a.test/0": (
            '<a href="/p/1">a</a><a href="/p/10">b</a>'
            '<a href="/p/105">c</a><a href="/p/11">d</a>'
            '<a href="/p/10/deep/x">e</a><a href="/tie">f</a>'
        )
    }
    store = mini_store(pages)
    robots = RobotsTable.from_rows(
        [("a.test", ["/p/1", "/p/10/deep", "/tie"], 0.0, None,
          ["/p/10", "/tie"])]
    )
    log, _ = run(store, ["http://a.test/0"], robots=robots)
    got = sorted(r["url_canon"] for r in log)
    # /p/1 blocked (disallow /p/1 only match); /p/10 + /p/105 allowed
    # (allow /p/10 longer than disallow /p/1); /p/11 blocked;
    # /p/10/deep/x blocked (disallow /p/10/deep longest); /tie allowed
    # (equal length -> Allow wins)
    assert got == sorted(
        ["http://a.test/0", "http://a.test/p/10", "http://a.test/p/105",
         "http://a.test/tie"]
    )


def test_robots_pure_semantics():
    t = RobotsTable.from_rows(
        [("h.test", ["/a"], 0.0, None, ["/a/b"])]
    )
    assert not t.allowed("h.test", "/a/x")
    assert t.allowed("h.test", "/a/b/x")
    assert t.allowed("h.test", "/c")
    assert t.allowed("other.test", "/a/x")  # absent host allows all


def test_depth_rule_stops_descent():
    store = mini_store(
        {
            "http://a.test/0": '<a href="/1">n</a>',
            "http://a.test/1": '<a href="/2">n</a>',
            "http://a.test/2": '<a href="/3">n</a>',
        }
    )
    log, _ = run(store, ["http://a.test/0"], follow="+original-domain -depth>1")
    assert [r["url_canon"] for r in log] == ["http://a.test/0", "http://a.test/1"]


def test_requisite_priority_first_in_host_order():
    store = mini_store(
        {
            "http://a.test/0": '<a href="/a">x</a><img src="/z.png">',
        }
    )
    log, _ = run(store, ["http://a.test/0"], follow="+original-domain +requisite")
    r1 = [r for r in log if r["round"] == 1]
    # requisite (priority 0) before /a despite 'z' > 'a' lexicographically
    assert [r["url_canon"] for r in r1] == ["http://a.test/z.png", "http://a.test/a"]
    assert r1[0]["status"] == 404  # fetch-miss path


def test_save_rules_and_stop_rules():
    store = mini_store(
        {
            "http://a.test/0": '<a href="/big">n</a>',
            "http://a.test/big": '<a href="/deeper">n</a>' + "x" * 5000,
        }
    )
    log, _ = run(
        store,
        ["http://a.test/0"],
        follow="+original-domain",
        save="-size>1000",
        stop="+url=*big*",
    )
    by_url = {r["url_canon"]: r for r in log}
    assert by_url["http://a.test/0"]["saved"] is True
    assert by_url["http://a.test/big"]["saved"] is False  # size rule
    assert "http://a.test/deeper" not in by_url  # stop rule blocked descent


def test_domain_depth_resets_on_cross():
    store = mini_store(
        {
            "http://a.test/0": '<a href="http://b.test/0">x</a>',
            "http://b.test/0": '<a href="/1">y</a>',
            "http://b.test/1": "",
        }
    )
    log, _ = run(store, ["http://a.test/0"], follow="+domain=*.test -domain-depth>1")
    by_url = {r["url_canon"]: r for r in log}
    assert by_url["http://b.test/0"]["domain_depth"] == 0
    assert by_url["http://b.test/1"]["domain_depth"] == 1


def test_sf_unit_crawl_is_deterministic_and_nontrivial():
    rows = webgen.gen_pages(webgen.SF_UNIT)
    store = webgen.store_from_rows(rows)
    robots = RobotsTable.from_rows(webgen.gen_robots_rows(webgen.SF_UNIT))
    cfg = dict(follow="+original-domain -depth>3 +requisite", robots=robots)
    log1, seen1 = run(store, webgen.SEEDS, **cfg)
    robots2 = RobotsTable.from_rows(webgen.gen_robots_rows(webgen.SF_UNIT))
    log2, seen2 = run(store, webgen.SEEDS, follow=cfg["follow"], robots=robots2)
    assert log1 == log2
    assert seen1 == seen2
    assert len(log1) > 20
    statuses = {r["status"] for r in log1}
    # requisite misses AND meta-refresh redirects exercised (fixture v2)
    assert statuses == {200, 404, 301}
    redirected = [r for r in log1 if r["status"] == 301]
    assert all(not r["saved"] for r in redirected)
    # a redirect target was admitted at the SAME depth as its source
    by_via = {r["via_url"]: r for r in log1 if r["via_url"]}
    for r in redirected:
        child = next(
            (c for c in log1 if c["via_url"] == r["url_canon"]), None
        )
        if child is not None:
            assert child["depth"] == r["depth"]


def test_redirect_to_off_policy_scheme_dropped():
    """A meta-refresh to mailto:/javascript: logs 301 but admits no
    candidate (same filtering as <a href> links; r2 review)."""
    store = mini_store(
        {
            "http://a.test/0": (
                '<meta http-equiv="refresh" '
                'content="0; url=mailto:x@y.test">'
            ),
        }
    )
    log, seen = run(store, ["http://a.test/0"])
    assert [(r["url_canon"], r["status"]) for r in log] == [
        ("http://a.test/0", 301)
    ]
    assert seen == {"http://a.test/0"}
