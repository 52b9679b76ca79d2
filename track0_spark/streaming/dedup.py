"""Custom stateful streaming operator: exact cross-batch URL dedup
(``applyInPandasWithState``) — the streaming analog of the batch
engine's D2 seen anti-join.

A continuously-arriving candidate feed (ingest.py link extraction →
this → politeness.py admission) needs first-occurrence-wins dedup
WITHOUT a round barrier: a URL seen in any earlier micro-batch must
not re-emit as fresh. No built-in streaming op expresses "emit with a
verdict that depends on all previous batches' keys", so, like the
politeness budget, it is a keyed custom stateful operator:
``groupBy(pmod(xxhash64(url), n_groups)).applyInPandasWithState``.

State per group is the set of seen url_canon strings as an LSM-style
list of CHUNKS (VERDICT r3 #3): each chunk is the sorted
newline-joined utf-8 blob of the keys FIRST ADMITTED in one
micro-batch. Per batch the operator serializes ONLY the new keys'
chunk and appends it; a batch that admits nothing for a group skips
``state.update`` entirely, so the state store writes ZERO bytes for
that group (the previous design re-serialized and rewrote the full
sorted set for every group touched by a batch — O(total seen) I/O per
batch forever, quadratic over the stream's life in the steady
re-landing regime where most batches repeat known URLs). When a
group's chunk list exceeds ``COMPACT_CHUNKS`` the chunks are merged
into one on a batch that writes anyway — amortized O(1) rewrites,
bounding deserialize cost. Membership stays EXACT on the full key
strings — a hash collision here would silently drop a never-crawled
URL (the batch engine keeps the same contract: bloom/cuckoo gates
only pre-filter, the anti-join is exact).

Scale posture: state is O(total seen)/n_groups per group in the state
store; per-batch WRITE I/O is O(new keys) (plus amortized
compactions), per-batch read is the touched groups' chunk lists.
``max_keys_per_group`` fails LOUDLY when a group outgrows the
documented tier (10^6-10^8 urls across groups) instead of degrading
silently — the 10^10 design point remains the batch-BSP snapshot
anti-join (SURVEY §3.4); this operator exists for the
continuous-ingest tier in front of it. Within a micro-batch, rows
process in fetch_seq order, so admission is deterministic for any
batch slicing that respects that order (the file source provides it;
jobs/stream_ingest.py derives fetch_seq from landing order).

CHECKPOINT COMPATIBILITY: the state schema changed from a single
``seen binary`` blob to ``chunks array<binary>`` — checkpoints
written by the pre-chunk operator cannot resume against this schema
(Spark's state-store schema checker rejects it JVM-side); discard
them and re-land, exactly as documented for politeness.STATE_SCHEMA.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "url_canon string, fetch_seq bigint, is_first boolean"
)
STATE_SCHEMA = "chunks array<binary>"
#: merge a group's chunk list into one blob once it exceeds this many
#: chunks (on a batch that updates state anyway) — bounds the
#: per-batch deserialize fan-in at ~COMPACT_CHUNKS blobs while keeping
#: steady-state writes O(new keys)
COMPACT_CHUNKS = 32
#: default loud-failure bound on one group's seen-set size; at
#: n_groups=64 this caps the operator at ~64M urls — the documented
#: continuous-ingest tier
DEFAULT_MAX_KEYS_PER_GROUP = 1_000_000


def _encode(keys) -> bytes:
    return "\n".join(sorted(keys)).encode("utf-8")


def _decode_chunks(chunks) -> set:
    seen: set = set()
    for blob in chunks:
        if blob:
            seen.update(bytes(blob).decode("utf-8").split("\n"))
    return seen


def _dedup_fn(max_keys_per_group: int):
    def dedup(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        chunks = list(state.get[0]) if state.exists else []
        seen = _decode_chunks(chunks)
        batch = pd.concat(list(pdfs), ignore_index=True).sort_values(
            "fetch_seq", kind="mergesort"
        )
        firsts = []
        new_keys = []
        for u in batch["url_canon"]:
            ok = u not in seen
            if ok:
                seen.add(u)
                new_keys.append(u)
            firsts.append(ok)
        if new_keys:
            if len(seen) > max_keys_per_group:
                raise ValueError(
                    f"streaming dedup group {key[0]} exceeds "
                    f"max_keys_per_group={max_keys_per_group} "
                    f"({len(seen)} keys): this feed has outgrown the "
                    "continuous-ingest tier — raise the cap/n_groups or "
                    "move to the batch snapshot anti-join (SURVEY §3.4)"
                )
            if len(chunks) + 1 > COMPACT_CHUNKS:
                chunks = [_encode(seen)]  # amortized compaction
            else:
                chunks = chunks + [_encode(new_keys)]
            state.update((chunks,))
        # else: nothing admitted -> NO state write for this group
        yield pd.DataFrame(
            {
                "url_canon": batch["url_canon"].to_numpy(),
                "fetch_seq": batch["fetch_seq"].to_numpy(),
                "is_first": firsts,
            }
        )

    return dedup


def dedup_stream(
    candidates: DataFrame,
    n_groups: int = 64,
    max_keys_per_group: int = DEFAULT_MAX_KEYS_PER_GROUP,
) -> DataFrame:
    """Every candidate row emits with its first-occurrence verdict;
    downstream filters ``is_first`` to admit exactly one row per
    url_canon over the stream's lifetime. The group key is a hash
    BUCKET (url routing only — membership stays exact on the string),
    so state shards evenly across n_groups regardless of key skew."""
    return (
        candidates.withColumn(
            "_grp",
            F.pmod(F.xxhash64("url_canon"), F.lit(n_groups)).cast("int"),
        )
        .groupBy("_grp")
        .applyInPandasWithState(
            _dedup_fn(max_keys_per_group),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_dedup(
    candidates: DataFrame, out_dir: str, checkpoint_dir: str,
    n_groups: int = 64,
    max_keys_per_group: int = DEFAULT_MAX_KEYS_PER_GROUP,
) -> None:
    """Drain pending candidates through the dedup operator into a
    parquet sink, then stop (availableNow). Re-running with the same
    checkpoint resumes the seen sets exactly."""
    q = (
        dedup_stream(
            candidates, n_groups=n_groups,
            max_keys_per_group=max_keys_per_group,
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
