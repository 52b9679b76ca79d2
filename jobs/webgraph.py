"""spark-submit entry point for the webgraph pass — the separate-job
pattern Common Crawl uses for its host/domain webgraph: a standalone
sweep over an ARCHIVED crawl (checkpoint crawl_log ⋈ pages snapshot),
not logic inside the crawler (operators/linkgraph.py docstring).

    spark-submit --py-files dist/track0s.zip jobs/webgraph.py \
        --ckpt /data/ckpt --pages /data/pages_parquet --out /data/graph

Writes seven parquet datasets under --out:
    edges/            one row per link occurrence on a fetched page
    host_graph/       weighted (src_host, dst_host, w) projection
    host_rank/        weighted PageRank over the symmetrised host graph
    host_components/  crawl islands (undirected connected components)
    domain_graph/     registered-domain projection (PSL semantics)
    domain_rank/      PageRank over the symmetrised domain graph
    anchors/          per-target anchor-text profile (top-k texts by
                      count + inlink total — the IR signal of what
                      other pages call a url); --anchor-k (0 disables)
and prints a one-line JSON summary. ``--profile`` synthesises the
deterministic test web in-memory instead of reading parquet, mirroring
jobs/crawl.py so the two stages compose in tests (FIXTURES.md §2)."""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datagen import webgen  # noqa: E402

PROFILES = {"sf-unit": webgen.SF_UNIT, "sf-correct": webgen.SF_CORRECT}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True, help="crawl checkpoint root (crawl_log source)")
    ap.add_argument("--pages", help="pages parquet path (url,warc_ts,html,text,lang)")
    ap.add_argument("--profile", choices=sorted(PROFILES), help="synthetic web profile")
    ap.add_argument("--out", required=True, help="output dir for the graph datasets")
    ap.add_argument("--iters", type=int, default=5, help="PageRank power iterations")
    ap.add_argument("--damping", type=float, default=0.85)
    ap.add_argument(
        "--anchor-k", type=int, default=3,
        help="top-k anchor texts kept per target url (0 skips the pass)",
    )
    ap.add_argument(
        "--prefilter", choices=["broadcast", "none"], default="broadcast",
        help="edge/anchor extraction plan: 'broadcast' semi-joins the "
        "pages scan against the fetched key set (segment passes); "
        "'none' is the full-archive shape — parse every extractable "
        "page, filter the narrow rows post-parse (at 10^10 fetches the "
        "key set must not broadcast)",
    )
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args(argv)
    if bool(args.pages) == bool(args.profile):
        ap.error("exactly one of --pages / --profile is required")

    from track0_spark.operators.linkgraph import (
        anchor_summary,
        anchor_texts,
        domain_graph,
        extract_edges,
        host_components,
        host_graph,
        host_rank,
    )
    from track0_spark.session import build_spark
    from track0_spark.sources.pages import pages_from_rows, read_pages
    from track0_spark.sources.snapshot import SnapshotStore

    spark = build_spark(cores=args.cores, app_name="track0s-webgraph")
    try:
        log = SnapshotStore(spark, args.ckpt).full_crawl_log()
        if log is None:
            print(f"error: no crawl_log under checkpoint {args.ckpt}", file=sys.stderr)
            return 2
        if args.profile:
            pages = pages_from_rows(spark, webgen.gen_pages(PROFILES[args.profile]))
        else:
            pages = read_pages(spark, args.pages)

        out = os.path.abspath(args.out)
        edges = extract_edges(log, pages, prefilter=args.prefilter)
        edges.write.mode("overwrite").parquet(os.path.join(out, "edges"))
        # downstream passes re-read the materialised edges: the Arrow
        # parse runs ONCE; graph/rank/CC iterate on the narrow columnar
        # edge list (at 10^10 pages the parse dominates — never twice)
        edges = spark.read.parquet(os.path.join(out, "edges"))
        hg = host_graph(edges)
        hg.write.mode("overwrite").parquet(os.path.join(out, "host_graph"))
        hg = spark.read.parquet(os.path.join(out, "host_graph"))
        host_rank(hg, iters=args.iters, damping=args.damping).write.mode(
            "overwrite"
        ).parquet(os.path.join(out, "host_rank"))
        host_components(hg).write.mode("overwrite").parquet(
            os.path.join(out, "host_components")
        )
        dg = domain_graph(hg)
        dg.write.mode("overwrite").parquet(os.path.join(out, "domain_graph"))
        dg = spark.read.parquet(os.path.join(out, "domain_graph"))
        host_rank(
            dg, iters=args.iters, damping=args.damping,
            src="src_domain", dst="dst_domain",
        ).withColumnRenamed("host", "domain").write.mode("overwrite").parquet(
            os.path.join(out, "domain_rank")
        )

        n_anchor_targets = None
        if args.anchor_k > 0:
            # a second Arrow parse, but a much lighter one (anchors on
            # 200 html pages only) — and the anchor profile is optional
            anchor_summary(
                anchor_texts(log, pages, prefilter=args.prefilter),
                k=args.anchor_k,
            ).write.mode(
                "overwrite"
            ).parquet(os.path.join(out, "anchors"))
            n_anchor_targets = (
                spark.read.parquet(os.path.join(out, "anchors"))
                .select("dst_url")
                .distinct()
                .count()
            )

        n_edges = spark.read.parquet(os.path.join(out, "edges")).count()
        rank = spark.read.parquet(os.path.join(out, "host_rank"))
        n_hosts = rank.count()
        top = [
            {"host": r["host"], "rank": round(r["rank"], 6)}
            for r in rank.orderBy(rank["rank"].desc(), "host").take(5)
        ]
        comps = spark.read.parquet(os.path.join(out, "host_components"))
        n_components = comps.select("component").distinct().count()
        n_domains = (
            spark.read.parquet(os.path.join(out, "domain_rank")).count()
        )
        print(
            json.dumps(
                {
                    "n_edges": n_edges,
                    "n_hosts": n_hosts,
                    "n_components": n_components,
                    "n_domains": n_domains,
                    "n_anchor_targets": n_anchor_targets,
                    "top_hosts": top,
                    "out": out,
                }
            )
        )
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
