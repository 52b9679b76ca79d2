"""Web link graph derived from a finished crawl — the separate-job
webgraph pattern (Common Crawl publishes its host/domain webgraph from
a standalone pass over the archived fetches, not from inside the
crawler), feeding the graph tier (operators/graphrank.py PageRank,
operators/components.py connected components).

``extract_edges`` re-runs the round plan's OWN fused extract pass
(functions/udfs.py — same parser, same canonicalization, same
meta-refresh handling) over crawl_log ⋈ pages, so the edge list is
deterministically consistent with what the crawl saw. It deliberately
ignores @follow/@stop rules: the corpus link graph records every link
on every FETCHED page — crawl-decision filtering is a property of the
crawl, not of the web it observed.

Scale posture: one columnar pages pass (the broadcast/bucketed
semi-join keeps the fat html rows unshuffled, exactly like the round
plan's fetch join), one Arrow crossing for parsing, then narrow
aggregations on (src_host, dst_host). The host graph is orders of
magnitude smaller than the page graph — rank/CC run on it by default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.exprs import (
    content_type_expr,
    header_content_type_expr,
    is_html_expr,
    redirect_target_expr,
)
from ..functions.udfs import EXTRACT_INPUT_COLS, make_extract_candidates
from ..schemas import CANDIDATE


def _extractable_filter():
    """The UDF parses whatever it is handed (the round plan pre-filters,
    plans/round.py `_parent_filter`) — the same extractable gate, minus
    the @stop condition the module deliberately ignores: 200+html/css
    parse, 301 emits its one redirect edge, anything else is a leaf."""
    ok = is_html_expr(F.col("content_type")) | F.col(
        "content_type"
    ).startswith("text/css")
    return ((F.col("status") == 200) & ok) | (F.col("status") == 301)


def extract_edges(
    crawl_log: DataFrame, pages: DataFrame, prefilter: str = "broadcast"
) -> DataFrame:
    """One row per link occurrence on a fetched page:
    (src_url, dst_url, src_host, dst_host, src_tag, is_requisite).
    301 parents contribute their single resolved redirect target —
    alias edges are edges. 404s never reach the parser (no body row /
    inner src join). Precondition: one pages row per url (dedup a
    multi-fetch snapshot with operators/revisit.latest_unique_pages).

    Two physically different plans, same output (test-asserted equal):

    ``prefilter="broadcast"`` — semi-join pages against the fetched key
    set before parsing. Right when that key set broadcasts: a segment /
    incremental pass, or any crawl up to ~10^8 fetches. At the full
    10^10 archive the key set is tens of GB — don't broadcast it.

    ``prefilter="none"`` — the full-archive shape: parse EVERY
    extractable page straight off the scan (status + effective
    content-type derived natively from the page itself, exactly the
    round plan's exprs), then inner-join the NARROW edge rows against
    crawl_log on src_url. The fat html column never enters any join or
    exchange — only (url, edge-attrs) rows shuffle — and src_host is
    taken from the log, which also makes the join the authoritative
    fetched-set filter. Parse cost is the whole archive, so prefer
    "broadcast" when the fetched fraction is small and broadcastable;
    at Common-Crawl shape (the archive IS the fetched set, ~100%) the
    extra parse is ~zero and this wins outright. With storage-bucketed
    pages+crawl_log tables (sources/bucketed.py) the broadcast
    variant's joins are Exchange-free anyway — that is the preferred
    10^10 deployment when both tables share the url bucketing.
    """
    log = crawl_log.select("url_canon", "host")
    if prefilter == "broadcast":
        keys = F.broadcast(log.select(F.col("url_canon").alias("url")))
        bodies = (
            pages.join(keys, "url", "left_semi")
            .hint("SHUFFLE_HASH")
            .select(F.col("url").alias("url_canon"), "html")
        )
        fetched = crawl_log.select(
            "url_canon", "host", "depth", "domain_depth", "fetch_seq", "status"
        ).join(bodies, "url_canon")
    elif prefilter == "none":
        fetched = pages.select(
            F.col("url").alias("url_canon"),
            # via_host placeholder — src_host is joined from the log
            # below; dst_host is computed inside the UDF (host_of)
            F.lit("").alias("host"),
            F.lit(0).alias("depth"),
            F.lit(0).alias("domain_depth"),
            F.lit(0).cast("long").alias("fetch_seq"),
            F.when(F.col("html").isNull(), 404)
            .when(redirect_target_expr(F.col("html")).isNotNull(), 301)
            .otherwise(200)
            .alias("status"),
            "html",
        )
    else:
        raise ValueError(f"prefilter must be 'broadcast' or 'none': {prefilter!r}")
    # the same effective content-type the round computed: in-band
    # header declaration overrides the extension guess (track0s/http)
    fetched = fetched.select(
        "*",
        F.coalesce(
            header_content_type_expr(F.col("html")),
            content_type_expr(F.expr("parse_url(url_canon, 'PATH')")),
        ).alias("content_type"),
    ).filter(_extractable_filter())
    links = fetched.select(*EXTRACT_INPUT_COLS).mapInPandas(
        make_extract_candidates(None), CANDIDATE
    )
    if prefilter == "broadcast":
        return links.select(
            F.col("via_url").alias("src_url"),
            F.col("url_canon").alias("dst_url"),
            F.col("via_host").alias("src_host"),
            F.col("host").alias("dst_host"),
            "src_tag",
            "is_requisite",
        )
    narrow = links.select(
        F.col("via_url").alias("src_url"),
        F.col("url_canon").alias("dst_url"),
        F.col("host").alias("dst_host"),
        "src_tag",
        "is_requisite",
    )
    src = log.select(
        F.col("url_canon").alias("src_url"), F.col("host").alias("src_host")
    )
    return narrow.join(src.hint("SHUFFLE_HASH"), "src_url").select(
        "src_url", "dst_url", "src_host", "dst_host", "src_tag", "is_requisite"
    )


def anchor_texts(
    crawl_log: DataFrame, pages: DataFrame, prefilter: str = "broadcast"
) -> DataFrame:
    """One row per ``<a href>`` occurrence on a fetched 200 html page:
    (src_url, dst_url, anchor) with dst canonicalized — the classic IR
    signal (what OTHER pages call a url; anchor-text indexing is how
    public web search describes pages they never crawled). The parser
    is ``track0s.extract.parse_anchors`` — the same resolve_link
    admission policy and decode chain as the crawl's own extract pass,
    sequential-oracle-checked in test_linkgraph.

    Two physical shapes, the same split as extract_edges (test-asserted
    equal): ``prefilter="broadcast"`` semi-joins the pages scan against
    the fetched key set — right for segment passes where that set
    broadcasts; ``prefilter="none"`` is the full-archive shape — parse
    every 200-html page straight off the scan, then semi-join the
    NARROW anchor rows against crawl_log on src_url (the fat html
    column never enters any join; at 10^10 fetches the key set is tens
    of GB and must not broadcast). Either way the effective
    content-type is derived natively (in-band header beats extension
    guess) and there is one Arrow crossing. Anchors exist only in
    html — css and redirect parents contribute nothing by
    construction."""
    from collections.abc import Iterator

    import pandas as pd

    from track0s.canon import canonicalize
    from track0s.extract import decode_html, parse_anchors

    if prefilter == "broadcast":
        keys = F.broadcast(crawl_log.select(F.col("url_canon").alias("url")))
        bodies = (
            pages.join(keys, "url", "left_semi")
            .hint("SHUFFLE_HASH")
            .select("url", "html")
        )
    elif prefilter == "none":
        bodies = pages.select("url", "html")
    else:
        raise ValueError(
            f"prefilter must be 'broadcast' or 'none': {prefilter!r}"
        )
    ctype = F.coalesce(
        header_content_type_expr(F.col("html")),
        content_type_expr(F.expr("parse_url(url, 'PATH')")),
    )
    fetched = (
        bodies.withColumn("content_type", ctype)
        .filter(
            is_html_expr(F.col("content_type"))
            & redirect_target_expr(F.col("html")).isNull()
        )
        .select("url", "html")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # canonicalize is a pure function and link targets repeat
        # heavily within a batch (nav/footer links, shared targets) —
        # memoize per batch (r6; bounded by the batch's distinct-url
        # count, cleared each batch)
        for pdf in batches:
            src: list[str] = []
            dst: list[str] = []
            anc: list[str] = []
            memo: dict[str, str] = {}
            for u, h in zip(pdf["url"], pdf["html"]):
                for absu, text in parse_anchors(u, decode_html(bytes(h))):
                    c = memo.get(absu)
                    if c is None:
                        c = memo[absu] = canonicalize(absu)
                    src.append(u)
                    dst.append(c)
                    anc.append(text)
            yield pd.DataFrame(
                {"src_url": src, "dst_url": dst, "anchor": anc},
                dtype=object,
            )

    anchors = fetched.mapInPandas(
        run, "src_url string, dst_url string, anchor string"
    )
    if prefilter == "none":
        # the fetched-set filter, applied to the NARROW anchor rows
        # (three strings) instead of the fat bodies — the same
        # post-parse join authority as extract_edges' full-archive plan
        src = crawl_log.select(F.col("url_canon").alias("src_url"))
        anchors = anchors.join(src.hint("SHUFFLE_HASH"), "src_url", "left_semi")
    return anchors


def anchor_summary(anchors: DataFrame, k: int = 3) -> DataFrame:
    """Per-target anchor profile: (dst_url, anchor, n, rk, n_inlinks) —
    the top-k anchor texts by (count desc, anchor asc) plus the total
    inlink count. The top-k window runs over the AGGREGATED
    (dst_url, anchor) counts (|vocabulary| rows, not |edges| rows) and
    its ``rk <= k`` literal filter is WindowGroupLimit-prunable — the
    same bounded-sort shape as the per-host politeness queue."""
    counts = anchors.groupBy("dst_url", "anchor").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("dst_url").orderBy(F.desc("n"), F.asc("anchor"))
    tot = anchors.groupBy("dst_url").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_inlinks")
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .join(tot, "dst_url")
        .select("dst_url", "anchor", "n", "rk", "n_inlinks")
    )


def host_graph(edges: DataFrame) -> DataFrame:
    """Weighted host-level projection: (src_host, dst_host, w)."""
    return (
        edges.groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )


def domain_graph(hgraph: DataFrame, psl=None) -> DataFrame:
    """Registered-domain projection of the host graph — Common Crawl
    publishes BOTH a host-level and a domain-level webgraph; this is
    the second. (src_domain, dst_domain, w) with intra-domain host
    edges collapsing onto the diagonal. PSL semantics are exactly the
    rule tier's (R11): the frozen 22-suffix subset compiled natively by
    default, or a full parsed Public Suffix List via ``psl=`` — both
    pure Column expressions, zero Python in the projection."""
    from ..functions.rules_compile import reg_domain_col, reg_domain_col_psl

    def reg(col: str):
        if psl is None:
            return reg_domain_col(col)
        return reg_domain_col_psl(psl, col)

    return (
        hgraph.select(
            reg("src_host").alias("src_domain"),
            reg("dst_host").alias("dst_domain"),
            "w",
        )
        .groupBy("src_domain", "dst_domain")
        .agg(F.sum("w").alias("w"))
    )


def host_rank(
    hgraph: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    src: str = "src_host",
    dst: str = "dst_host",
) -> DataFrame:
    """(host, rank): weighted PageRank over the SYMMETRISED host graph
    (symmetrising gives every node an out-edge, so no dangling mass —
    the undirected-centrality convention of public host-rank lists).
    Pass src/dst to rank other projections (e.g. the domain graph)."""
    from .graphrank import pagerank

    sym = hgraph.select(src, dst, "w").union(
        hgraph.select(
            F.col(dst).alias(src), F.col(src).alias(dst), "w"
        )
    )
    merged = sym.groupBy(src, dst).agg(F.sum("w").alias("w"))
    return pagerank(
        merged, src, dst, "w", iters=iters, damping=damping
    ).withColumnRenamed("node", "host")


def host_components(
    hgraph: DataFrame, src: str = "src_host", dst: str = "dst_host"
) -> DataFrame:
    """(host, component): connected components of the host graph — the
    'crawl islands' view (which host families are reachable from one
    another regardless of direction). ``component`` is the island's
    MINIMUM host name, a deterministic representative.

    connected_components wants numeric node ids (its fixpoint checksum
    sums labels), so hosts get surrogate longs first. The assignment is
    intentionally arbitrary (monotonically_increasing_id, pinned with
    localCheckpoint so both edge-endpoint joins see the SAME ids — a
    post-shuffle re-evaluation does not replay identically): component
    membership is id-invariant, and the reported representative is
    recomputed as min(host) AFTER clustering, so the output is
    deterministic regardless of id placement. The id table is
    host-cardinality (~10^8 at the 10^10-page tier), orders below the
    page graph — materializing it is cheap."""
    from .components import connected_components

    hosts = (
        hgraph.select(F.col(src).alias("host"))
        .union(hgraph.select(F.col(dst).alias("host")))
        .distinct()
    )
    ids = hosts.select(
        "host", F.monotonically_increasing_id().alias("hid")
    ).localCheckpoint()
    # no broadcast hint: the id table is small vs the PAGE graph but can
    # still be multi-GB (10^8 hosts) — AQE picks broadcast when it fits
    e = (
        hgraph.join(ids.withColumnRenamed("host", src), src)
        .withColumnRenamed("hid", "sid")
        .join(ids.withColumnRenamed("host", dst), dst)
        .withColumnRenamed("hid", "did")
        .select("sid", "did")
    )
    cc = connected_components(e, "sid", "did")
    lab = cc.join(ids, cc["node"] == ids["hid"]).select("host", "cluster")
    rep = lab.groupBy("cluster").agg(F.min("host").alias("component"))
    return lab.join(rep, "cluster").select("host", "component")


def budgets_from_rank(
    rank: DataFrame,
    base_budget: int,
    min_budget: int = 1,
    max_budget: int | None = None,
) -> DataFrame:
    """Quality-biased politeness budgets from host centrality — the
    webgraph pass feeding BACK into the crawl scheduler (the public
    OPIC / focused-crawling idea expressed through the engine's
    existing politeness contract).

    Per host: ``budget = clamp(floor(base * rank / mean_rank), min,
    max)`` — a host of average centrality keeps ``base_budget``; hubs
    earn proportionally more page-fetches per round, fringe hosts
    fewer (never below ``min_budget``: politeness budgets defer, and a
    zero budget would starve a host forever).

    Returns a **DataFrame in the ROBOTS schema**, computed entirely
    with native Column arithmetic: the mean is one scalar agg joined
    back as a broadcast literal row, the clamp is greatest/least. No
    per-host row ever reaches the driver (ADVICE r4 medium: the old
    list-returning version collected the whole rank table — fine at
    200 hosts, a driver OOM at the 10^8-host design point). Write it
    out as a parquet artifact; the round plan broadcast-joins it via
    ``RoundPlanner(robots_df=...)`` and the sequential oracle reads the
    SAME parquet (``RobotsTable.from_parquet``), so quality-biased
    crawls keep exact oracle parity by construction — the bias lives in
    the shared storage artifact, not in either engine.
    """
    mean = F.broadcast(rank.agg(F.avg("rank").alias("_mean")))
    b = F.floor(F.lit(base_budget) * F.col("rank") / F.col("_mean")).cast("int")
    b = F.greatest(F.lit(min_budget), b)
    if max_budget is not None:
        b = F.least(F.lit(max_budget), b)
    empty = F.array().cast("array<string>")
    return (
        rank.crossJoin(mean)
        .filter(F.col("_mean") > 0)
        .select(
            F.col("host"),
            empty.alias("disallow_prefixes"),
            F.lit(0.0).alias("crawl_delay_s"),
            b.alias("budget_per_round"),
            empty.alias("allow_prefixes"),
        )
    )
