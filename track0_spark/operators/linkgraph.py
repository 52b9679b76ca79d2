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
)
from ..functions.udfs import EXTRACT_INPUT_COLS, make_extract_candidates
from ..schemas import CANDIDATE


def extract_edges(crawl_log: DataFrame, pages: DataFrame) -> DataFrame:
    """One row per link occurrence on a fetched page:
    (src_url, dst_url, src_host, dst_host, src_tag, is_requisite).
    301 parents contribute their single resolved redirect target —
    alias edges are edges. 404s drop out via the inner body join."""
    log = crawl_log.select(
        "url_canon", "host", "depth", "domain_depth", "fetch_seq", "status"
    )
    keys = F.broadcast(log.select(F.col("url_canon").alias("url")))
    bodies = (
        pages.join(keys, "url", "left_semi")
        .hint("SHUFFLE_HASH")
        .select(F.col("url").alias("url_canon"), "html")
    )
    fetched = log.join(bodies, "url_canon")
    # the same effective content-type the round computed: in-band
    # header declaration overrides the extension guess (track0s/http)
    fetched = fetched.select(
        "*",
        F.coalesce(
            header_content_type_expr(F.col("html")),
            content_type_expr(F.expr("parse_url(url_canon, 'PATH')")),
        ).alias("content_type"),
    )
    # the UDF parses whatever it is handed (the round plan pre-filters,
    # plans/round.py `_parent_filter`) — apply the same extractable
    # gate here, minus the @stop condition the module deliberately
    # ignores: 200+html/css parse, 301 emits its one redirect edge
    extractable = is_html_expr(F.col("content_type")) | F.col(
        "content_type"
    ).startswith("text/css")
    fetched = fetched.filter(
        ((F.col("status") == 200) & extractable) | (F.col("status") == 301)
    )
    links = fetched.select(*EXTRACT_INPUT_COLS).mapInPandas(
        make_extract_candidates(None), CANDIDATE
    )
    return links.select(
        F.col("via_url").alias("src_url"),
        F.col("url_canon").alias("dst_url"),
        F.col("via_host").alias("src_host"),
        F.col("host").alias("dst_host"),
        "src_tag",
        "is_requisite",
    )


def host_graph(edges: DataFrame) -> DataFrame:
    """Weighted host-level projection: (src_host, dst_host, w)."""
    return (
        edges.groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )


def host_rank(hgraph: DataFrame, iters: int = 5, damping: float = 0.85) -> DataFrame:
    """(host, rank): weighted PageRank over the SYMMETRISED host graph
    (symmetrising gives every node an out-edge, so no dangling mass —
    the undirected-centrality convention of public host-rank lists)."""
    from .graphrank import pagerank

    sym = hgraph.union(
        hgraph.select(
            F.col("dst_host").alias("src_host"),
            F.col("src_host").alias("dst_host"),
            "w",
        )
    )
    merged = sym.groupBy("src_host", "dst_host").agg(
        F.sum("w").alias("w")
    )
    return pagerank(
        merged, "src_host", "dst_host", "w", iters=iters, damping=damping
    ).withColumnRenamed("node", "host")


def host_components(hgraph: DataFrame) -> DataFrame:
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
        hgraph.select(F.col("src_host").alias("host"))
        .union(hgraph.select(F.col("dst_host").alias("host")))
        .distinct()
    )
    ids = hosts.select(
        "host", F.monotonically_increasing_id().alias("hid")
    ).localCheckpoint()
    # no broadcast hint: the id table is small vs the PAGE graph but can
    # still be multi-GB (10^8 hosts) — AQE picks broadcast when it fits
    e = (
        hgraph.join(ids.withColumnRenamed("host", "src_host"), "src_host")
        .withColumnRenamed("hid", "sid")
        .join(ids.withColumnRenamed("host", "dst_host"), "dst_host")
        .withColumnRenamed("hid", "did")
        .select("sid", "did")
    )
    cc = connected_components(e, "sid", "did")
    lab = cc.join(ids, cc["node"] == ids["hid"]).select("host", "cluster")
    rep = lab.groupBy("cluster").agg(F.min("host").alias("component"))
    return lab.join(rep, "cluster").select("host", "component")
