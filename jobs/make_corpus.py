"""Archive → training-corpus pipeline CLI (the LLM-data tier composed
end to end).

    python jobs/make_corpus.py --documents /data/documents.parquet \
        --out /data/corpus --langs en de --min-tokens 5 \
        --near-dup-threshold 0.7 --val-permille 50

Chains the engine's training-data operators the way a production
cleaning job does, each stage an already-tested unit (contract
q15/q23/q17/q24/q39/q32 carry the oracle checks for the math):

  1. ingest    — documents parquet, or derive documents from a pages /
                 WARC archive (``--pages`` / ``--pages-warc``:
                 doc_id = xxhash64(url), text from the archive)
  2. length    — token-count band filter (textstats)
  3. language  — keep ``--langs`` (stored lang, or n-gram langid
                 prediction with ``--langid`` when the column is absent)
  4. exact     — fingerprint group-by dedup, min doc_id wins
  5. near-dup  — MinHash-LSH pairs ≥ threshold → connected components
                 → one keeper (min doc_id) per cluster
  6. decontam  — optional: drop docs sharing any hashed 13-gram with
                 ``--benchmark`` texts (q37's semi-join shape)
  7. split     — deterministic train/val assignment,
                 pmod(xxhash64(doc_id), 1000) < --val-permille
  8. write     — parquet partitioned by split, plus ONE JSON line of
                 per-stage row counts (the auditable funnel).

Every stage is hash-deterministic: re-running the CLI on the same
input yields byte-identical stage counts and the same keeper set —
the same reproducibility contract as the crawl (BASELINE.json:14).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--documents", help="documents parquet (doc_id,text,lang,...)")
    ap.add_argument("--pages", help="derive documents from a pages parquet")
    ap.add_argument("--pages-warc", help="derive documents from .warc.gz archives")
    ap.add_argument("--out", required=True)
    ap.add_argument("--langs", nargs="*", default=None)
    ap.add_argument(
        "--langid",
        action="store_true",
        help="predict language (n-gram stopword scorer) instead of using a "
        "stored lang column",
    )
    ap.add_argument("--min-tokens", type=int, default=5)
    ap.add_argument("--max-tokens", type=int, default=1_000_000)
    ap.add_argument("--near-dup-threshold", type=float, default=0.7)
    ap.add_argument(
        "--no-near-dup", action="store_true", help="skip the MinHash stage"
    )
    ap.add_argument("--benchmark", help="parquet of benchmark texts (column 'text')")
    ap.add_argument("--val-permille", type=int, default=50)
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from track0_spark.session import build_spark
    from track0_spark.operators.components import connected_components
    from track0_spark.operators.dedup import minhash_native_pairs
    from track0_spark.operators.textstats import (
        fingerprint_expr,
        langid_scores,
        token_count_expr,
    )

    cores = args.cores or min(8, os.cpu_count() or 8)
    spark = build_spark(
        cores=cores,
        shuffle_partitions=2 * cores,
        app_name="make-corpus",
        driver_memory="8g",
    )
    funnel: dict[str, int] = {}
    handles = []
    try:
        # 1. ingest
        if args.documents:
            docs = spark.read.parquet(args.documents)
        elif args.pages or args.pages_warc:
            if args.pages:
                from track0_spark.sources.pages import read_pages

                pages = read_pages(spark, args.pages)
            else:
                from track0_spark.sources.warc import read_warc

                pages = read_warc(spark, args.pages_warc)
            docs = pages.filter(F.col("text").isNotNull()).select(
                F.xxhash64("url").alias("doc_id"),
                "text",
                "lang",
                F.col("url").alias("source"),
            )
        else:
            ap.error("one of --documents / --pages / --pages-warc required")
        docs = docs.filter(F.col("text").isNotNull()).persist()
        handles.append(docs)
        funnel["ingested"] = docs.count()

        # 2. length band
        docs = docs.withColumn("n_tokens", token_count_expr("text")).filter(
            F.col("n_tokens").between(args.min_tokens, args.max_tokens)
        )
        funnel["after_length"] = docs.count()

        # 3. language
        if args.langs:
            if args.langid or "lang" not in docs.columns:
                docs = (
                    langid_scores(docs, "text")
                    .filter(F.col("lang_pred").isin(args.langs))
                )
            else:
                docs = docs.filter(F.col("lang").isin(args.langs))
            funnel["after_language"] = docs.count()

        # 4. exact dedup (min doc_id per fingerprint; hash agg, no sort)
        docs = docs.withColumn("_fp", fingerprint_expr("text"))
        keep = docs.groupBy("_fp").agg(F.min("doc_id").alias("doc_id"))
        docs = docs.join(keep, ["_fp", "doc_id"], "left_semi").drop("_fp")
        docs = docs.persist()
        handles.append(docs)
        funnel["after_exact_dedup"] = docs.count()

        # 5. near-dup clusters -> keeper per cluster
        if not args.no_near_dup:
            pairs = minhash_native_pairs(
                docs, "doc_id", "text",
                threshold=args.near_dup_threshold, handles=handles,
            )
            cc = connected_components(pairs, "id_a", "id_b")
            drop = cc.filter(F.col("node") != F.col("cluster")).select(
                F.col("node").alias("doc_id")
            )
            docs = docs.join(drop, "doc_id", "left_anti")
            funnel["after_near_dup"] = docs.count()

        # 6. decontamination (hashed 13-gram semi-join, q37 shape)
        if args.benchmark:
            bench = spark.read.parquet(args.benchmark)
            # hashed 13-grams; docs under 13 tokens carry none (the
            # when-guard mirrors contract q37's empty-array shape)
            gram = (
                "case when size(split(trim(lower(text)), '\\\\s+')) >= 13 "
                "then transform(sequence(1, size(split(trim(lower(text)), "
                "'\\\\s+')) - 12), "
                "i -> xxhash64(array_join(slice(split(trim(lower(text)), "
                "'\\\\s+'), i, 13), ' '))) "
                "else cast(array() as array<bigint>) end"
            )
            bgrams = (
                bench.select(F.explode(F.expr(gram)).alias("g")).distinct()
            )
            contaminated = (
                docs.select("doc_id", F.explode(F.expr(gram)).alias("g"))
                .join(F.broadcast(bgrams), "g", "left_semi")
                .select("doc_id")
                .distinct()
            )
            docs = docs.join(contaminated, "doc_id", "left_anti")
            funnel["after_decontamination"] = docs.count()

        # 7. deterministic split
        docs = docs.withColumn(
            "split",
            F.when(
                F.pmod(F.xxhash64(F.col("doc_id").cast("string")), F.lit(1000))
                < args.val_permille,
                F.lit("val"),
            ).otherwise(F.lit("train")),
        )

        # 8. write
        out = os.path.abspath(args.out)
        docs.write.mode("overwrite").partitionBy("split").parquet(out)
        final = spark.read.parquet(out)
        funnel["final"] = final.count()
        funnel["final_val"] = final.filter(F.col("split") == "val").count()
        print(json.dumps({"out": out, "funnel": funnel}))
        return 0
    finally:
        for h in handles:
            try:
                h.unpersist()
            except Exception:
                pass
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
