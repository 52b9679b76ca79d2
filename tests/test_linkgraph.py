"""Webgraph-from-crawl tier (operators/linkgraph.py): the edge list a
separate pass derives from (crawl_log ⋈ pages) must be EXACTLY the
links the crawl itself saw — same parser, same canonicalization, same
redirect/content-type semantics — verified against a sequential oracle
that mirrors reference_impl/spider.py's extraction loop (but, like the
operator, ignores @follow/@stop: the corpus graph records every link
on every fetched page, not the crawl's admission decisions)."""

import json
import os
import subprocess
import sys
from collections import Counter

import pytest

from datagen import webgen
from reference_impl.spider import OracleSpider
from track0s import canon, mime
from track0s.extract import decode_html, parse_css, parse_html
from track0s.http import header_content_type, redirect_target, resolve_redirect
from track0_spark.operators.linkgraph import (
    domain_graph,
    extract_edges,
    host_components,
    host_graph,
    host_rank,
)
from track0_spark.operators.graphrank import pagerank
from track0_spark.sources.pages import pages_from_rows

from .test_spark_crawl import make_cfg

EDGE_COLS = ["src_url", "dst_url", "src_host", "dst_host", "src_tag", "is_requisite"]


def oracle_edges(log_rows, store):
    """Sequential twin of extract_edges: one (src,dst) per link
    occurrence on a fetched page, document order ignored (the graph is
    a multiset of edges). 301 parents contribute their single resolved
    meta-refresh target; 404s (no body in the store) contribute none."""
    edges = []
    for r in log_rows:
        page = store.get(r["url_canon"])
        if page is None:
            continue
        redir = redirect_target(page.html)
        if redir:
            u = resolve_redirect(r["url_canon"], redir)
            if u is not None:
                edges.append(
                    (r["url_canon"], u, r["host"], canon.host_of(u), "meta", False)
                )
            continue
        ctype = header_content_type(page.html) or mime.content_type_for(
            canon.path_of(r["url_canon"])
        )
        if mime.is_html(ctype):
            links, _text = parse_html(r["url_canon"], decode_html(page.html))
        elif mime.is_css(ctype):
            links = parse_css(r["url_canon"], decode_html(page.html))
        else:
            continue
        for link in links:
            u = canon.canonicalize(link.url)
            edges.append(
                (
                    r["url_canon"],
                    u,
                    r["host"],
                    canon.host_of(u),
                    link.tag,
                    link.is_requisite,
                )
            )
    return edges


@pytest.fixture(scope="module")
def web_rows():
    return webgen.gen_pages(webgen.SF_UNIT)


@pytest.fixture(scope="module")
def oracle_run(web_rows):
    sp = OracleSpider(make_cfg(), webgen.store_from_rows(web_rows))
    log = sp.run()
    return log, webgen.store_from_rows(web_rows)


def test_edges_match_sequential_oracle(spark, web_rows, oracle_run):
    """Every link occurrence the crawl saw, as a multiset — byte-level
    url/host/tag parity between the Arrow pass and the oracle loop."""
    olog, store = oracle_run
    log_df = spark.createDataFrame(olog)
    pages = pages_from_rows(spark, web_rows)
    got = Counter(
        tuple(r[c] for c in EDGE_COLS)
        for r in extract_edges(log_df, pages).collect()
    )
    exp = Counter(oracle_edges(olog, store))
    assert got == exp
    assert sum(exp.values()) > 100  # the fixture web is non-trivial


def test_postfilter_variant_identical(spark, web_rows, oracle_run):
    """prefilter='none' (parse-all + narrow src join — the full-archive
    plan where html never enters a join) emits the SAME edge multiset
    as the broadcast-prefilter plan."""
    olog, _store = oracle_run
    log_df = spark.createDataFrame(olog)
    pages = pages_from_rows(spark, web_rows)
    a = Counter(
        tuple(r[c] for c in EDGE_COLS)
        for r in extract_edges(log_df, pages, prefilter="broadcast").collect()
    )
    b = Counter(
        tuple(r[c] for c in EDGE_COLS)
        for r in extract_edges(log_df, pages, prefilter="none").collect()
    )
    assert a == b
    with pytest.raises(ValueError):
        extract_edges(log_df, pages, prefilter="bogus")


def oracle_anchors(log_rows, store):
    """Sequential twin of anchor_texts: (src, canonical dst, text) per
    <a href> on every fetched 200 html page; redirect pages and css
    contribute nothing (anchors are an html-body signal)."""
    from track0s.extract import parse_anchors

    out = Counter()
    for r in log_rows:
        page = store.get(r["url_canon"])
        if page is None:
            continue
        if redirect_target(page.html):
            continue
        ctype = header_content_type(page.html) or mime.content_type_for(
            canon.path_of(r["url_canon"])
        )
        if not mime.is_html(ctype):
            continue
        for u, text in parse_anchors(r["url_canon"], decode_html(page.html)):
            out[(r["url_canon"], canon.canonicalize(u), text)] += 1
    return out


def test_anchor_texts_match_sequential_oracle(spark, web_rows, oracle_run):
    """Anchor harvesting parity: same resolve_link admission, same
    decode chain, byte-level text equality as a multiset."""
    from track0_spark.operators.linkgraph import anchor_texts

    olog, store = oracle_run
    log_df = spark.createDataFrame(olog)
    pages = pages_from_rows(spark, web_rows)
    got = Counter(
        (r["src_url"], r["dst_url"], r["anchor"])
        for r in anchor_texts(log_df, pages).collect()
    )
    exp = oracle_anchors(olog, store)
    assert got == exp
    assert sum(exp.values()) > 100
    assert any(t for (_s, _d, t) in exp)  # fixture anchors carry text


def test_anchor_postfilter_variant_identical(spark, web_rows, oracle_run):
    """prefilter='none' (parse-all + narrow src semi-join — the
    full-archive plan where neither html nor the fetched key set is
    broadcast) emits the SAME anchor multiset."""
    from track0_spark.operators.linkgraph import anchor_texts

    olog, _store = oracle_run
    log_df = spark.createDataFrame(olog)
    pages = pages_from_rows(spark, web_rows)
    a = Counter(
        (r["src_url"], r["dst_url"], r["anchor"])
        for r in anchor_texts(log_df, pages, prefilter="broadcast").collect()
    )
    b = Counter(
        (r["src_url"], r["dst_url"], r["anchor"])
        for r in anchor_texts(log_df, pages, prefilter="none").collect()
    )
    assert a == b
    with pytest.raises(ValueError):
        anchor_texts(log_df, pages, prefilter="bogus")


def test_anchor_summary_matches_python_twin(spark, web_rows, oracle_run):
    """Top-k anchor profile per target == the Counter-based twin
    (count desc, anchor asc; n_inlinks = total occurrences)."""
    from collections import defaultdict

    from track0_spark.operators.linkgraph import anchor_summary, anchor_texts

    olog, store = oracle_run
    log_df = spark.createDataFrame(olog)
    pages = pages_from_rows(spark, web_rows)
    anchors = anchor_texts(log_df, pages)
    got = {
        (r["dst_url"], r["anchor"], r["n"], r["rk"], r["n_inlinks"])
        for r in anchor_summary(anchors, k=3).collect()
    }
    per_dst = defaultdict(Counter)
    for (src, dst, text), c in oracle_anchors(olog, store).items():
        per_dst[dst][text] += c
    exp = set()
    for dst, cnt in per_dst.items():
        total = sum(cnt.values())
        top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        for rk, (text, n) in enumerate(top, start=1):
            exp.add((dst, text, n, rk, total))
    assert got == exp


def test_domain_graph_matches_python_twin(spark):
    """Registered-domain projection == track0s.canon.registered_domain
    applied row-wise, including a two-level public suffix."""
    from track0s.canon import registered_domain

    hg = spark.createDataFrame(
        [
            ("a.shop.example.co.uk", "cdn.example.co.uk", 2.0),
            ("cdn.example.co.uk", "news.example.org", 1.0),
            ("news.example.org", "example.org", 3.0),
        ],
        "src_host string, dst_host string, w double",
    )
    got = {
        (r["src_domain"], r["dst_domain"]): r["w"]
        for r in domain_graph(hg).collect()
    }
    exp = Counter()
    for s, d, w in hg.collect():
        exp[(registered_domain(s), registered_domain(d))] += w
    assert got == dict(exp)
    # intra-domain host edges collapse onto the diagonal
    assert ("example.co.uk", "example.co.uk") in got


def test_host_graph_weights(spark, web_rows, oracle_run):
    olog, store = oracle_run
    log_df = spark.createDataFrame(olog)
    pages = pages_from_rows(spark, web_rows)
    hg = host_graph(extract_edges(log_df, pages))
    got = {(r["src_host"], r["dst_host"]): r["w"] for r in hg.collect()}
    exp = Counter((e[2], e[3]) for e in oracle_edges(olog, store))
    assert got == {k: float(v) for k, v in exp.items()}


def test_host_rank_symmetrizes_and_merges(spark):
    """host_rank == pagerank over the hand-built undirected multigraph:
    antiparallel weights merge (a→b 1.0 + b→a 2.0 = both-way 3.0)."""
    hg = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "a", 2.0), ("b", "c", 1.0)],
        "src_host string, dst_host string, w double",
    )
    sym = spark.createDataFrame(
        [("a", "b", 3.0), ("b", "a", 3.0), ("b", "c", 1.0), ("c", "b", 1.0)],
        "src string, dst string, w double",
    )
    got = {r["host"]: r["rank"] for r in host_rank(hg, iters=12).collect()}
    exp = {
        r["node"]: r["rank"]
        for r in pagerank(sym, "src", "dst", "w", iters=12).collect()
    }
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], abs=1e-12)
    # undirected chain with a heavy a-b edge: b (the hub) ranks first
    assert max(got, key=got.get) == "b"
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_host_components_islands(spark):
    hg = spark.createDataFrame(
        [("a", "b", 1.0), ("c", "d", 2.0), ("d", "c", 1.0)],
        "src_host string, dst_host string, w double",
    )
    rows = host_components(hg).collect()
    comp = {r["host"]: r["component"] for r in rows}
    assert set(comp) == {"a", "b", "c", "d"}
    assert comp["a"] == comp["b"]
    assert comp["c"] == comp["d"]
    assert comp["a"] != comp["c"]


_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(script, argv):
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, "jobs", script), *argv],
        capture_output=True,
        text=True,
        cwd=_REPO,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    return json.loads(proc.stdout.strip().splitlines()[-1])


def test_webgraph_cli_separate_pass(tmp_path, web_rows, oracle_run):
    """The Common-Crawl pattern end-to-end: crawl job writes the
    checkpoint, a SEPARATE webgraph job derives edges/rank/components
    from it. Subprocesses: each CLI owns (and stops) its session."""
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "graph")
    _run_cli(
        "crawl.py",
        ["--profile", "sf-unit", "--rounds", "40", "--cores", "4",
         "--head", "0", "--ckpt", ckpt],
    )
    summary = _run_cli(
        "webgraph.py",
        ["--ckpt", ckpt, "--profile", "sf-unit", "--out", out, "--cores", "4"],
    )
    olog, store = oracle_run
    exp = oracle_edges(olog, store)
    assert summary["n_edges"] == len(exp)
    assert summary["n_hosts"] == len(
        {e[2] for e in exp} | {e[3] for e in exp}
    )
    import pyarrow.parquet as pq

    assert pq.read_table(os.path.join(out, "edges")).num_rows == len(exp)
    ranks = pq.read_table(os.path.join(out, "host_rank")).to_pydict()
    assert sum(ranks["rank"]) == pytest.approx(1.0, abs=1e-6)
    comps = pq.read_table(os.path.join(out, "host_components")).to_pydict()
    assert len(comps["host"]) == summary["n_hosts"]
    dranks = pq.read_table(os.path.join(out, "domain_rank")).to_pydict()
    assert len(dranks["domain"]) == summary["n_domains"]
    assert sum(dranks["rank"]) == pytest.approx(1.0, abs=1e-6)
    anchors = pq.read_table(os.path.join(out, "anchors")).to_pydict()
    exp_anchor = oracle_anchors(olog, store)
    assert summary["n_anchor_targets"] == len({d for _s, d, _t in exp_anchor})
    assert set(anchors["dst_url"]) == {d for _s, d, _t in exp_anchor}
    assert max(anchors["rk"]) <= 3


def test_budgets_from_rank_quality_biased_crawl(spark, web_rows, tmp_path):
    """The webgraph feeds back into the scheduler: host_rank-derived
    politeness budgets bias page throughput toward hub hosts — and
    because the bias travels through the SHARED RobotsTable config,
    the Spark crawl stays an exact match of the oracle under it."""
    from track0s.config import CrawlConfig
    from track0s.robots import RobotsTable
    from track0_spark.operators.linkgraph import budgets_from_rank, host_graph
    from track0_spark.plans.loop import CrawlLoop

    # a fixed host graph with a clear hub (h0 referenced by all)
    hg = spark.createDataFrame(
        [
            ("h1.example.test", "h0.example.test", 8.0),
            ("h2.example.test", "h0.example.test", 8.0),
            ("h0.example.test", "h1.example.test", 1.0),
            ("h1.example.test", "h2.example.test", 1.0),
        ],
        "src_host string, dst_host string, w double",
    )
    rank = host_rank(hg, iters=5)
    bdf = budgets_from_rank(rank, base_budget=4, min_budget=1, max_budget=8)
    # storage artifact: the Spark crawl consumes the DataFrame/parquet
    # directly (never collected); the oracle reads the SAME file.
    bpath = str(tmp_path / "budgets.parquet")
    bdf.write.parquet(bpath)
    robots = RobotsTable.from_parquet(bpath, default_budget=4)
    budgets = {h: p.budget_per_round for h, p in robots.policies.items()}
    assert budgets["h0.example.test"] > budgets["h2.example.test"]
    assert min(budgets.values()) >= 1

    cfg = CrawlConfig.from_specs(
        webgen.SEEDS,
        follow="+original-domain -depth>3 +requisite",
        robots=robots,
        max_rounds=6,
    )
    sp = OracleSpider(cfg, webgen.store_from_rows(web_rows))
    olog = sp.run()
    loop = CrawlLoop(
        spark,
        cfg,
        pages_from_rows(spark, web_rows),
        str(tmp_path / "ckpt"),
        robots_df=spark.read.parquet(bpath),
    )
    loop.run()
    cols = ["round", "fetch_seq", "url_canon", "status"]
    srows = [
        tuple(r[c] for c in cols)
        for r in loop.crawl_log().orderBy("round", "fetch_seq").collect()
    ]
    orows = [tuple(r[c] for c in cols) for r in olog]
    assert srows == orows


def test_budgets_from_rank_never_materializes_on_driver(spark, tmp_path):
    """ADVICE r4 medium regression: at 10^5 synthetic hosts (the shape
    class where the old list-returning collect would already hurt, and
    a 10^8-host driver OOM at the design point), building the budgets
    DataFrame AND the round plan consuming it runs ZERO Spark jobs —
    the per-host rows exist only as a lazy plan until written/joined."""
    from pyspark.sql import functions as F

    from track0s.config import CrawlConfig
    from track0_spark.operators.linkgraph import budgets_from_rank
    from track0_spark.plans.round import RoundPlanner

    rank = spark.range(100_000).select(
        F.concat(F.lit("h"), F.col("id"), F.lit(".test")).alias("host"),
        ((F.col("id") % 97) + 1).cast("double").alias("rank"),
    )
    sc = spark.sparkContext
    sc.setJobGroup("budgets-lazy", "must stay lazy")
    try:
        bdf = budgets_from_rank(rank, base_budget=4, min_budget=1, max_budget=64)
        cfg = CrawlConfig.from_specs(["http://h0.test/"], max_rounds=1)
        pages = spark.createDataFrame(
            [("http://h0.test/", b"")], "url string, html binary"
        )
        RoundPlanner(spark, cfg, pages, robots_df=bdf)
        assert sc.statusTracker().getJobIdsForGroup("budgets-lazy") == []
    finally:
        sc.setJobGroup(None, None)

    # the artifact itself is correct at scale: clamp bounds hold, budget
    # is monotone in rank, every host present exactly once
    bpath = str(tmp_path / "budgets100k.parquet")
    bdf.write.parquet(bpath)
    chk = spark.read.parquet(bpath)
    agg = chk.agg(
        F.count("*").alias("n"),
        F.countDistinct("host").alias("nh"),
        F.min("budget_per_round").alias("lo"),
        F.max("budget_per_round").alias("hi"),
    ).collect()[0]
    assert agg["n"] == 100_000 and agg["nh"] == 100_000
    assert agg["lo"] >= 1 and agg["hi"] <= 64
    two = {
        r["rank"]: r["b"]
        for r in chk.join(rank, "host")
        .filter(F.col("rank").isin(1.0, 97.0))
        .select("rank", F.col("budget_per_round").alias("b"))
        .distinct()
        .collect()
    }
    assert two[97.0] > two[1.0]
