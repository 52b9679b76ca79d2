"""Archive → training-corpus pipeline CLI (the LLM-data tier composed
end to end), with an INCREMENTAL mode for continuous corpus growth.

    # one-shot
    python jobs/make_corpus.py --documents /data/documents.parquet \
        --out /data/corpus --langs en de --min-tokens 5 \
        --near-dup-threshold 0.7 --val-permille 50

    # continuous: each new crawl segment appends only what the corpus
    # has never seen (exactly + near-duplicate-wise)
    python jobs/make_corpus.py --documents /data/segment_k.parquet \
        --out /data/corpus --state /data/corpus_state ...

Chains the engine's training-data operators the way a production
cleaning job does, each stage an already-tested unit (contract
q15/q23/q17/q24/q39/q32 carry the oracle checks for the math):

  1. ingest      — documents parquet, or derive documents from a pages /
                   WARC archive (``--pages`` / ``--pages-warc``:
                   doc_id = xxhash64(url), text from the archive)
  2. length      — token-count band filter (textstats)
  3. language    — keep ``--langs`` (stored lang, or n-gram langid
                   prediction with ``--langid`` when the column is absent)
  4. exact       — fingerprint group-by dedup, min doc_id wins
  4b. prior exact— [--state] anti-join the batch's fingerprints against
                   the PRIOR corpus's fingerprint index: content the
                   corpus already holds never re-enters (the crawl
                   tier's seen-set discipline applied to documents)
  5. near-dup    — MinHash-LSH pairs ≥ threshold → connected components
                   → one keeper (min doc_id) per cluster
  5b. prior near — [--state] the keepers' signatures band-join the prior
                   corpus's MinHash index; a keeper near-duplicating ANY
                   prior doc drops (prior always wins — global
                   first-occurrence order across runs)
  6. decontam    — optional: drop docs sharing any hashed 13-gram with
                   ``--benchmark`` texts (q37's semi-join shape)
  7. split       — deterministic train/val assignment,
                   pmod(xxhash64(doc_id), 1000) < --val-permille
  8. write       — parquet partitioned by split (overwrite on a first /
                   stateless run, APPEND on an incremental run), plus
                   ONE JSON line of per-stage row counts (the funnel)
  9. state       — [--state] the surviving docs' (fingerprint, doc_id)
                   and (doc_id, sig) rows land in a NEW numbered run dir
                   (state/runs/NNNNNN/{fingerprints,signatures}) — an
                   LSM-style delta, O(new docs) per append, never a
                   rewrite of the whole index. A run dir missing its
                   _SUCCESS marker fails LOUDLY at the next read (the
                   seen-store torn-write discipline; delete the torn dir
                   to recover).

Determinism: a one-shot run is hash-deterministic end to end
(re-running yields byte-identical stage counts and the same keeper
set). An incremental re-run of the SAME batch against the same state
is a no-op by construction — every fingerprint is already in the
index, so appended == 0 and the state grows by nothing: content-level
exactly-once. The unavoidable window (a crash between the corpus
append and the state write re-appends those docs on retry) is the
same non-transactional gap the seen-store documents; state is written
LAST so a crash loses no content. doc_id is assumed stable per
content row (xxhash64(url) for archive ingest); the near-dup index
only stores banded signatures, so prior-side work per append is one
hash join on (band, key) — the 10^10-doc corpus index is never
broadcast, re-signed, or sorted.
"""

from __future__ import annotations

import argparse
import glob as _glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _state_run_dirs(state: str) -> list[str]:
    """Existing state run dirs, torn-write-checked (loud, like load_seen)."""
    runs = sorted(_glob.glob(os.path.join(state, "runs", "[0-9]*")))
    for r in runs:
        fp = os.path.join(r, "fingerprints")
        if not os.path.exists(os.path.join(fp, "_SUCCESS")):
            raise RuntimeError(
                f"corpus state run torn or incomplete (no _SUCCESS): {fp}; "
                "a previous append crashed mid-write — delete this run dir "
                "and re-run the batch that produced it"
            )
    return runs


def _next_run_dir(state: str, runs: list[str]) -> str:
    """Next run dir name: max existing number + 1 (NOT len(runs) —
    compaction replaces many runs with one high-numbered base, and a
    count-based name would eventually collide with it)."""
    n = max((int(os.path.basename(r)) for r in runs), default=-1) + 1
    return os.path.join(state, "runs", f"{n:06d}")


def _compact_state(spark, state: str) -> dict:
    """Merge every run's fingerprint/signature delta into ONE new base
    run, then delete the old runs — the LSM compaction bounding
    per-append read fan-in (the seen-store's compact_seen discipline).
    Crash-safe by ordering: the base commits (fingerprints _SUCCESS
    last) BEFORE any old dir is removed; a crash in between leaves
    old + base coexisting, which over-unions harmlessly (membership
    joins dedup) and the next compaction heals it."""
    import shutil

    from pyspark.sql import functions as F

    runs = _state_run_dirs(state)
    if not runs:
        raise RuntimeError(f"no state runs to compact under {state}")
    base = _next_run_dir(state, runs)
    sig_dirs = [
        d
        for d in (os.path.join(r, "signatures") for r in runs)
        if os.path.exists(os.path.join(d, "_SUCCESS"))
    ]
    if sig_dirs and len(sig_dirs) != len(runs):
        raise RuntimeError(
            "state mixes runs with and without signature indexes "
            f"({len(sig_dirs)}/{len(runs)} have one) — compacting would "
            "silently shrink near-dup protection; rebuild state "
            "consistently first"
        )
    n_sigs = 0
    if sig_dirs:
        sigs = spark.read.parquet(*sig_dirs).dropDuplicates(["id"])
        sigs.write.parquet(os.path.join(base, "signatures"))
        n_sigs = spark.read.parquet(os.path.join(base, "signatures")).count()
    fps = (
        spark.read.parquet(*[os.path.join(r, "fingerprints") for r in runs])
        .groupBy("_fp")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    fps.write.parquet(os.path.join(base, "fingerprints"))  # commit marker
    n_fps = spark.read.parquet(os.path.join(base, "fingerprints")).count()
    for r in runs:
        shutil.rmtree(r)
    return {
        "compacted_runs": len(runs),
        "base_run": base,
        "fingerprints": n_fps,
        "signatures": n_sigs,
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--documents", help="documents parquet (doc_id,text,lang,...)")
    ap.add_argument("--pages", help="derive documents from a pages parquet")
    ap.add_argument("--pages-warc", help="derive documents from .warc.gz archives")
    ap.add_argument("--out", required=True)
    ap.add_argument(
        "--state",
        help="corpus dedup-state dir; enables incremental mode: the batch "
        "dedups against every prior run's index and the output APPENDS",
    )
    ap.add_argument(
        "--compact-state",
        action="store_true",
        help="no ingest: merge every state run's fingerprint/signature "
        "delta into a single new base run and delete the old run dirs — "
        "the LSM compaction that bounds per-append read fan-in (same "
        "discipline as the crawl seen-store's compact_seen). Safe "
        "mid-crash: the new base commits (fingerprints _SUCCESS) before "
        "any old dir is removed",
    )
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
    from track0_spark.operators.dedup import (
        minhash_cross_pairs,
        minhash_native_pairs,
        minhash_native_signatures,
    )
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
    if args.compact_state:
        if not args.state:
            ap.error("--compact-state requires --state")
        try:
            out = _compact_state(spark, os.path.abspath(args.state))
        finally:
            spark.stop()
        print(json.dumps({"state": os.path.abspath(args.state), **out}))
        return 0
    funnel: dict[str, int] = {}
    handles = []
    prior_runs: list[str] = []
    if args.state:
        prior_runs = _state_run_dirs(os.path.abspath(args.state))
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

        # 4. exact dedup (min doc_id per fingerprint; hash agg, no sort);
        # _fp stays on the rows until the state write
        docs = docs.withColumn("_fp", fingerprint_expr("text"))
        keep = docs.groupBy("_fp").agg(F.min("doc_id").alias("doc_id"))
        docs = docs.join(keep, ["_fp", "doc_id"], "left_semi")

        # 4b. prior-corpus exact: content already held never re-enters
        if prior_runs:
            prior_fp = spark.read.parquet(
                *[os.path.join(r, "fingerprints") for r in prior_runs]
            ).select("_fp")
            docs = docs.join(prior_fp, "_fp", "left_anti")
        docs = docs.persist()
        handles.append(docs)
        funnel["after_exact_dedup"] = docs.count()

        # 5. near-dup clusters -> keeper per cluster; 5b. keepers that
        # near-duplicate any PRIOR doc drop (prior always wins)
        sig = None
        if not args.no_near_dup:
            sig = minhash_native_signatures(docs, "doc_id", "text").persist()
            handles.append(sig)
            pairs = minhash_native_pairs(
                docs, "doc_id", "text",
                threshold=args.near_dup_threshold, signatures=sig,
            )
            cc = connected_components(pairs, "id_a", "id_b")
            drop = cc.filter(F.col("node") != F.col("cluster")).select(
                F.col("node").alias("doc_id")
            )
            docs = docs.join(drop, "doc_id", "left_anti")
            funnel["after_near_dup"] = docs.count()
            if prior_runs:
                sig_dirs = [os.path.join(r, "signatures") for r in prior_runs]
                missing = [
                    d
                    for d in sig_dirs
                    if not os.path.exists(os.path.join(d, "_SUCCESS"))
                ]
                if missing:
                    raise RuntimeError(
                        "near-dup enabled but prior state runs lack a "
                        f"signature index: {missing}; those runs were made "
                        "with --no-near-dup — rebuild state or pass "
                        "--no-near-dup"
                    )
                prior_sig = spark.read.parquet(*sig_dirs)
                keeper_sig = sig.join(
                    docs.select(F.col("doc_id").alias("id")), "id", "left_semi"
                )
                hit = minhash_cross_pairs(
                    keeper_sig, prior_sig, threshold=args.near_dup_threshold
                ).select(F.col("id_new").alias("doc_id")).distinct()
                docs = docs.join(hit, "doc_id", "left_anti")
                funnel["after_prior_near_dup"] = docs.count()

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
        # the survivor set is read 3x from here (corpus write, state
        # fingerprints, state signatures) — pin it so the whole funnel
        # above runs once
        docs = docs.persist()
        handles.append(docs)
        funnel["appended" if prior_runs else "kept"] = docs.count()

        # 8. write (overwrite on first/stateless run, append after)
        out = os.path.abspath(args.out)
        mode = "append" if prior_runs else "overwrite"
        docs.drop("_fp").write.mode(mode).partitionBy("split").parquet(out)
        final = spark.read.parquet(out)
        funnel["final"] = final.count()
        funnel["final_val"] = final.filter(F.col("split") == "val").count()

        # 9. state delta (LAST: a crash before this point loses no
        # content, it only re-processes the batch on retry)
        state_run = None
        if args.state:
            state = os.path.abspath(args.state)
            state_run = _next_run_dir(state, prior_runs)
            # fingerprints last: its _SUCCESS is the run's commit marker
            # (_state_run_dirs checks it), so a crash anywhere in this
            # block leaves a run that fails loudly and is safe to delete
            if sig is not None:
                sig.join(
                    docs.select(F.col("doc_id").alias("id")), "id", "left_semi"
                ).write.parquet(os.path.join(state_run, "signatures"))
            docs.select("_fp", "doc_id").write.parquet(
                os.path.join(state_run, "fingerprints")
            )
        print(
            json.dumps(
                {"out": out, "funnel": funnel, "state_run": state_run}
            )
        )
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
