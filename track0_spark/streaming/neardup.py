"""Streaming content near-dup gate: MinHash/LSH near-duplicate
suppression at ingest time — the streaming tier's counterpart of the
incremental corpus appends in jobs/make_corpus.py (same portable
signature family, same banded cross-join, same LSM run-dir state).

Why foreachBatch and not applyInPandasWithState: a document belongs to
NUM_BANDS LSH groups at once, and its verdict needs the verify join
(estimated Jaccard over full signatures) against matches from ANY of
them — a cross-group decision that keyed state-store operators cannot
express (groups are independent by contract). foreachBatch is the
documented Structured Streaming escape hatch for exactly this: each
micro-batch runs the BATCH near-dup machinery (operators/dedup.py)
against a storage-resident signature index, then appends its admitted
signatures as a new immutable run. Everything stays a DataFrame job —
no driver state, nothing broadcast, the prior index is never re-signed
(the make_corpus posture, VERDICT r4).

Semantics: first arrival wins, at micro-batch granularity. A document
is REFUSED iff its estimated Jaccard vs any PREVIOUSLY ADMITTED
document is >= threshold, or vs an earlier document within its own
batch (order key: (warc_ts, url) — deterministic for any batch slicing
that respects landing order). Within-batch resolution is greedy by
order, not chain-resolved: a doc whose only near-dup partner was
itself refused is still refused — conservative, and identical to the
make_corpus within-batch policy.

Exactly-once across crashes/re-runs: the state run dir and the output
subdir are both KEYED BY THE MICRO-BATCH ID and written with
mode("overwrite"), so Spark's checkpoint replay of a failed batch
rewrites both byte-identically instead of double-appending. A run dir
missing its _SUCCESS (torn write, crash before commit) fails LOUDLY at
the next read — same contract as make_corpus state and the colocated
gates.

Scale posture: per batch, work is O(batch signatures) + one hash join
of the batch's band keys against the partitioned prior index; state
grows O(admitted docs) in storage, never in memory. Many small runs
degrade read fan-in — ``compact_state`` merges them into one base
(commit-before-delete, crash heals by over-union), mirroring
make_corpus --compact-state.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

OUTPUT_SCHEMA = "url string, warc_ts long, is_content_fresh boolean"


def _run_dirs(state_dir: str) -> list[str]:
    root = os.path.join(state_dir, "runs")
    if not os.path.exists(root):
        return []
    out = []
    for name in sorted(os.listdir(root)):
        d = os.path.join(root, name, "signatures")
        if not os.path.exists(os.path.join(d, "_SUCCESS")):
            raise RuntimeError(
                f"near-dup state run torn or incomplete (no _SUCCESS): {d}; "
                "a crashed batch must be replayed from its checkpoint "
                "(re-run the drain) or the run dir removed"
            )
        out.append(d)
    return out


def _gate_batch(
    batch: DataFrame, batch_id: int, out_dir: str, state_dir: str,
    threshold: float,
) -> None:
    from ..operators.dedup import (
        minhash_cross_pairs,
        minhash_native_pairs,
        minhash_native_signatures,
    )

    spark = batch.sparkSession
    run_sig = os.path.join(state_dir, "runs", f"{batch_id:08d}", "signatures")
    out_sub = os.path.join(out_dir, f"batch-{batch_id:08d}")
    # replay of an already-committed batch: rewrite both idempotently
    # (overwrite mode) — cheaper to redo than to reason about which of
    # the two commits landed before the crash
    prior_runs = [d for d in _run_dirs(state_dir) if d != run_sig]

    docs = batch.select(
        "url", "warc_ts", "text",
        # order key, packed so "earlier" is one integer comparison in
        # the refusal joins; urls within one warc_ts tie-break
        # lexicographically via the secondary sort column
        F.col("warc_ts").alias("_ts"),
    )
    sig = minhash_native_signatures(docs, "url", "text").persist()
    try:
        # within-batch: refuse the later side of every >=threshold pair
        pairs = minhash_native_pairs(
            docs, "url", "text", threshold=threshold, signatures=sig
        )
        orda = docs.select(
            F.col("url").alias("id_a"), F.col("_ts").alias("ts_a")
        )
        ordb = docs.select(
            F.col("url").alias("id_b"), F.col("_ts").alias("ts_b")
        )
        p = pairs.join(orda, "id_a").join(ordb, "id_b")
        later = p.select(
            F.when(
                (F.col("ts_a") < F.col("ts_b"))
                | ((F.col("ts_a") == F.col("ts_b"))
                   & (F.col("id_a") < F.col("id_b"))),
                F.col("id_b"),
            )
            .otherwise(F.col("id_a"))
            .alias("url")
        ).distinct()
        refused = later
        if prior_runs:
            prior_sig = spark.read.parquet(*prior_runs)
            cross = minhash_cross_pairs(sig, prior_sig, threshold=threshold)
            refused = refused.union(
                cross.select(F.col("id_new").alias("url"))
            ).distinct()
        verdicts = docs.join(refused, "url", "left_anti").select(
            F.col("url").alias("u")
        )
        out = docs.join(
            verdicts, docs["url"] == verdicts["u"], "left"
        ).select(
            "url",
            "warc_ts",
            F.col("u").isNotNull().alias("is_content_fresh"),
        )
        # pin the verdict set before either write: both writes must see
        # the SAME admission (and the state write must not re-derive
        # against the output it raced) — the due-set pinning lesson
        out = out.localCheckpoint(eager=True)
        out.write.mode("overwrite").parquet(out_sub)
        admitted_sig = sig.join(
            out.filter("is_content_fresh").select(F.col("url").alias("id")),
            "id",
        )
        admitted_sig.write.mode("overwrite").parquet(run_sig)
    finally:
        sig.unpersist()


def run_neardup_gate(
    pages_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    state_dir: str,
    threshold: float = 0.7,
) -> None:
    """Drain pending landed pages through the content gate
    (availableNow): every page row emits into ``out_dir`` with an
    ``is_content_fresh`` verdict; admitted signatures append to the
    LSM index under ``state_dir``."""
    q = (
        pages_stream.select("url", "warc_ts", "text")
        .writeStream.foreachBatch(
            lambda df, bid: _gate_batch(
                df, bid, out_dir, state_dir, threshold
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_verdicts(spark: SparkSession, out_dir: str) -> DataFrame:
    """All batches' verdict rows (url, warc_ts, is_content_fresh)."""
    return spark.read.parquet(os.path.join(out_dir, "batch-*"))


def compact_state(spark: SparkSession, state_dir: str) -> dict:
    """Merge every committed run into ONE new max+1-numbered base run
    and delete the old dirs (commit-before-delete: a crash between the
    base's _SUCCESS and the deletes leaves an over-union whose
    duplicate signatures the band join dedups harmlessly; the next
    compaction heals it)."""
    runs = _run_dirs(state_dir)
    if len(runs) <= 1:
        return {"compacted_runs": 0, "signatures": None}
    nums = [int(os.path.basename(os.path.dirname(d))) for d in runs]
    base = os.path.join(
        state_dir, "runs", f"{max(nums) + 1:08d}", "signatures"
    )
    spark.read.parquet(*runs).dropDuplicates(["id"]).write.parquet(base)
    n = spark.read.parquet(base).count()
    for d in runs:
        shutil.rmtree(os.path.dirname(d))
    return {"compacted_runs": len(runs), "signatures": n}
