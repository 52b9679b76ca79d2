"""Dump ``.explain('formatted')`` of the engine's key plans to PLANS.md.

Plan-shape evidence for the scale claims (SURVEY.md §4): pushed
filters and pruned read schemas on the parquet scans, broadcast vs
shuffle join choices, WholeStageCodegen spans around the compiled rule
chains, and the single mapInPandas crossing in the round plan.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.01"


def grab(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    # q29-style plans inline 64-element hyperplane literals into every
    # expression — keep the plan structure readable by clipping lines
    out = []
    for line in buf.getvalue().splitlines():
        if len(line) > 400:
            line = line[:400] + " … [literal array elided]"
        out.append(line)
    return "\n".join(out)


def main() -> int:
    from datagen import webgen
    from track0_spark import contract
    from track0_spark.plans.round import RoundPlanner
    from track0_spark.session import build_crawl_spark
    from track0_spark.sources.pages import pages_from_rows
    from bench import bench_cfg

    spark = build_crawl_spark(cores=4, app_name="explain", driver_memory="4g")
    sections = []

    rows = webgen.gen_pages(webgen.SF_UNIT)
    pages = pages_from_rows(spark, rows)
    pl = RoundPlanner(spark, bench_cfg(webgen.SF_UNIT), pages)
    res = pl.run_round(0, pl.seed_frontier(), pl.seed_seen())
    sections.append(
        (
            "Crawl round: frontier' (politeness window -> semi-join fetch -> "
            "fused extract UDF -> compiled @follow CASE WHEN -> keyed dedup "
            "-> exact seen anti-join)",
            grab(res.frontier_next),
        )
    )
    sections.append(("Crawl round: crawl_log (fetch_seq offsets)", grab(res.crawl_log)))

    # Co-located gate round: the D3 probe is a bucket-grouped
    # FlatMapGroupsInPandas whose tasks read only their own bucket's
    # bitmap from storage — the plan must show NO broadcast of any
    # gate structure (VERDICT r2 "Next round" #2 done-criterion).
    import tempfile

    from track0_spark.operators.bloom_colocated import ColocatedBloomGate

    with tempfile.TemporaryDirectory() as gate_root:
        os.makedirs(os.path.join(gate_root, "round_00000"))
        gate = ColocatedBloomGate(spark, gate_root, expected_keys=100_000)
        gate.write_delta(
            0,
            pl.seed_seen().select("url_h64"),
        )
        res_co = pl.run_round(
            0, pl.seed_frontier(), pl.seed_seen(), gate_probe=gate.make_probe(0)
        )
        sections.append(
            (
                "Crawl round with CO-LOCATED bloom gate: frontier' (the gate "
                "verdict is a bucket-grouped FlatMapGroupsInPandas reading "
                "per-bucket bitmaps from storage — zero gate broadcast)",
                grab(res_co.frontier_next),
            )
        )
        for df in res_co.persisted:
            df.unpersist()

    # AT-SCALE BENCH CONFIG (VERDICT r3 #2 done-criterion): the round
    # plan exactly as bench.py's atscale run builds it — pages from a
    # Hive-BUCKETED table ('Bucketed: true' scan) AND the co-located
    # bloom gate (bucket-grouped FlatMapGroupsInPandas verdict). One
    # plan showing both 10^10 storage properties together: no gate
    # broadcast, fetch side served from bucketed storage.
    from track0_spark.sources.bucketed import write_bucketed

    with tempfile.TemporaryDirectory() as atdir:
        nb = int(spark.conf.get("spark.sql.shuffle.partitions"))
        write_bucketed(
            pages, "plans_pages_bucketed", f"{atdir}/pages", "url", nb
        )
        pages_b = spark.table("plans_pages_bucketed")
        pl_at = RoundPlanner(spark, bench_cfg(webgen.SF_UNIT), pages_b)
        os.makedirs(os.path.join(atdir, "round_00000"))
        gate_at = ColocatedBloomGate(
            spark, atdir, expected_keys=100_000
        )
        gate_at.write_delta(0, pl_at.seed_seen().select("url_h64"))
        res_at = pl_at.run_round(
            0, pl_at.seed_frontier(), pl_at.seed_seen(),
            gate_probe=gate_at.make_probe(0),
        )
        sections.append(
            (
                "AT-SCALE bench config round: frontier' (bucketed pages "
                "table + co-located bloom gate — the exact configuration "
                "bench.py's atscale_config measures; check: 'Bucketed: "
                "true' on the pages scan, FlatMapGroupsInPandas gate "
                "verdict, zero gate broadcast)",
                grab(res_at.frontier_next),
            )
        )
        for df in res_at.persisted:
            df.unpersist()
        spark.sql("DROP TABLE plans_pages_bucketed")

    # Bucketed-storage joins (sources/bucketed.py, VERDICT r2 #4): the
    # Hive-bucketing demonstration of the Iceberg bucket(url) production
    # notes — seen anti-join with the bucketed side Exchange-free, fetch
    # join with ZERO Exchange on either side.
    import tempfile as _tf

    from track0_spark.sources.bucketed import (
        fetch_join_bucketed,
        seen_anti_join_bucketed,
        write_bucketed,
    )

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    nb = int(spark.conf.get("spark.sql.shuffle.partitions"))
    with _tf.TemporaryDirectory() as bdir:
        seen_df = spark.createDataFrame(
            [(f"http://h{i % 5}.test/p/{i}", i) for i in range(400)],
            "url_canon string, first_round int",
        )
        cand_df = spark.createDataFrame(
            [(f"http://h{i % 5}.test/p/{i}", 1000 + i) for i in range(200, 600)],
            "url_canon string, _ord long",
        )
        write_bucketed(seen_df, "pl_seen_b", f"{bdir}/seen", "url_canon", nb)
        sections.append(
            (
                "Bucketed seen anti-join (bucketBy(url_canon) seen table: "
                "'Bucketed: true' scan, NO Exchange above it — the probe "
                "side's dedup exchanges are the only ones left)",
                grab(seen_anti_join_bucketed(spark, cand_df, "pl_seen_b")),
            )
        )
        fr_df = spark.createDataFrame(
            [(f"http://h.test/p/{i}", i % 7) for i in range(300)],
            "url_canon string, depth int",
        )
        pg_df = spark.createDataFrame(
            [
                (f"http://h.test/p/{i}", f"<html>{i}</html>".encode())
                for i in range(0, 600, 2)
            ],
            "url string, html binary",
        )
        write_bucketed(fr_df, "pl_frontier_b", f"{bdir}/fr", "url_canon", nb)
        write_bucketed(pg_df, "pl_pages_b", f"{bdir}/pg", "url", nb)
        sections.append(
            (
                "Bucketed fetch join (frontier + pages co-bucketed on url: "
                "ZERO Exchange in the whole plan — the html side is neither "
                "shuffled nor broadcast-filtered)",
                grab(fetch_join_bucketed(spark, "pl_frontier_b", "pl_pages_b")),
            )
        )
        for t in ("pl_seen_b", "pl_frontier_b", "pl_pages_b"):
            spark.sql(f"DROP TABLE {t}")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    # Sitemap seed expansion: the url rlike prune sits on the scan, the
    # <loc> extraction is native regexp (no UDF anywhere), and the
    # index recursion's semi-joins are broadcast.
    from track0_spark.operators.sitemap import sitemap_seeds

    sections.append(
        (
            "Sitemap seed expansion (pushable url-pattern prune, native "
            "regexp_extract_all <loc> extraction, sitemapindex recursion "
            "as broadcast semi-joins; zero Python UDFs)",
            grab(sitemap_seeds(pages)),
        )
    )

    for name in (
        "q01_agg_metrics",
        "q13_multi_join",
        "q06_glob_filter",
        "q21_ann_cosine",
        "q29_cosine_near_dup",
        "q24_minhash_lsh_pairs",
        "q33_top_terms_per_lang",
        "q36_repetition_quality",
        "q37_decontaminate_ngrams",
        "q41_importance_weights",
        "q42_sessionize",
        "q43_substring_dup",
        "q44_recrawl_schedule",
        "q45_domain_cap",
        "q46_funnel_steps",
        "q47_retention_cohorts",
        "q48_anchor_topk",
        "q50_paragraph_dedup",
        "q51_gopher_rules",
        "q52_soft404_templates",
    ):
        fn = contract.queries()[name]
        sections.append((f"Contract {name}", grab(fn(spark, SF))))

    # q39/q40 run their loops eagerly and return a checkpointed RDD
    # scan, so explain their per-ITERATION body instead — the claim to
    # verify: the p-co-partitioned edge table enters its join with NO
    # Exchange (only the small label/rank side moves per round)
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.shuffle.partitions", "4")
    edges = spark.range(0, 1000).select(
        (F.col("id") % 97).alias("_src"),
        (F.col("id") % 89).alias("_dst"),
        F.lit(1.0).alias("_w"),
        F.lit(2.0).alias("_tot"),
    )
    e = edges.repartition(4, F.col("_src")).persist()
    e.count()
    ranks = (
        e.select(F.col("_src").alias("node")).distinct()
        .select("node", F.lit(0.01).alias("rank"))
        .localCheckpoint()
    )
    contrib = (
        e.join(ranks, e["_src"] == ranks["node"])
        .groupBy("_dst")
        .agg(F.sum(F.col("rank") * F.col("_w") / F.col("_tot")).alias("_c"))
    )
    sections.append(
        (
            "PageRank / CC iteration body (operators/graphrank.py, "
            "components.py): edge table pinned to the join key once — "
            "verify the persisted InMemoryTableScan side has NO Exchange "
            "above it; only the rank/label side shuffles per round",
            grab(contrib),
        )
    )
    # q49's dangling variant adds one 1-row aggregate broadcast per
    # round (the dangling mass) crossed into the same update — verify
    # BroadcastNestedLoopJoin/BroadcastExchange on a 1-row side and the
    # pinned edge side still Exchange-free
    sinks = (
        e.select(F.col("_dst").alias("node")).distinct()
        .join(e.select(F.col("_src").alias("node")).distinct(),
              "node", "left_anti")
        .localCheckpoint()
    )
    dm = F.broadcast(
        ranks.join(sinks, "node", "left_semi").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")
        )
    )
    nodes2 = e.select(F.col("_src").alias("node")).distinct()
    upd = (
        nodes2.join(contrib, nodes2["node"] == contrib["_dst"], "left")
        .crossJoin(dm)
        .select(
            "node",
            (F.lit(0.15 / 97)
             + F.lit(0.85) * (F.coalesce("_c", F.lit(0.0))
                              + F.col("_dm") / F.lit(97.0))).alias("rank"),
        )
    )
    sections.append(
        (
            "PageRank dangling-mass update (q49, dangling='redistribute'): "
            "per-round 1-row dangling-mass aggregate BROADCAST into the "
            "rank update — verify the dm side is a BroadcastExchange over "
            "a 1-row aggregate and no new Exchange appears on the edge "
            "side",
            grab(upd),
        )
    )
    e.unpersist()

    out = ["# PLANS.md — physical plans of the key operators", ""]
    out.append(
        "Generated by tools/explain_plans.py (crawl profile session: AQE "
        "off, shuffled-hash joins preferred). Things to check: ReadSchema "
        "pruning on every parquet scan, PushedFilters on filters, "
        "BroadcastHashJoin for dim joins, WholeStageCodegen around the "
        "compiled rule CASE WHEN chains, exactly one ArrowEvalPython / "
        "MapInPandas node per crawl round."
    )
    for title, text in sections:
        out += ["", f"## {title}", "", "```", text.rstrip(), "```"]
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out) + "\n")
    print("PLANS.md written")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
