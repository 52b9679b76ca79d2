"""Partitioned cuckoo-filter URL-seen gate — the "cuckoo" half of
BASELINE.json:14's "partitioned Bloom/cuckoo URL-seen filter".

Same contract as operators/bloom.py: the exact ``seen`` anti-join (D2)
remains the source of truth; the gate only shrinks its input, so false
positives cost one extra exact check and false negatives must be
impossible. The cuckoo filter adds what a Bloom cannot: O(1) DELETION
(partial-key cuckoo hashing, Fan et al., CoNEXT'14 — public
algorithm), which the revisit/expiry path needs when seen entries are
retired (a Bloom would have to rebuild).

Layout: ``n_buckets`` independent bucket tables routed by
``key % n_buckets`` (identical routing to the Bloom gate, so the same
storage-bucket co-location argument from SURVEY.md §4 applies). Each
bucket table is ``n_rows x slots`` uint16 fingerprints; a key probes
row ``i1 = h & mask`` and its partner ``i2 = i1 ^ perm(fp)``, where
``perm`` mixes the fingerprint — membership is a fully vectorized
numpy compare over the two candidate rows.

No-false-negative guarantee under eviction pressure: if an insert's
eviction walk exceeds MAX_KICKS, the whole bucket is marked SATURATED
and every probe into it answers "maybe seen" — that bucket degrades to
the plain exact anti-join, the rest of the filter keeps pruning.
Exactness is therefore preserved by construction in every state
(asserted by tests: gate-on == gate-off crawl output).

Deletion caveat (standard for cuckoo filters): ``delete_many`` is only
sound for keys that were actually inserted — deleting a never-inserted
key may evict another key sharing its fingerprint+rows. The
revisit/expiry caller satisfies this by construction (it only retires
keys read from the seen store).

Eviction is deterministic (an LCG on the fingerprint picks the victim
slot), so the same insertion sequence always yields the same table.
"""

from __future__ import annotations

import numpy as np

MAX_KICKS = 500
_PERM_MUL = np.uint64(0x5BD1E995)  # fp -> partner-row mix (MurmurHash2 M)


class PartitionedCuckoo:
    def __init__(
        self,
        expected_keys: int = 2_000_000,
        n_buckets: int = 64,
        slots: int = 4,
    ):
        self.n_buckets = n_buckets
        self.slots = slots
        per_bucket = max(1024, expected_keys // n_buckets)
        # 95% max load factor for 4-slot tables; power-of-two rows
        rows = int(np.ceil(per_bucket / slots / 0.95))
        self.n_rows = 1 << int(np.ceil(np.log2(rows)))
        self.table = np.zeros(
            (n_buckets, self.n_rows, slots), dtype=np.uint16
        )
        self.saturated = np.zeros(n_buckets, dtype=bool)
        self.n_keys = 0

    # ---------------- key -> (bucket, fp, i1, i2) ----------------

    def _parts(self, keys: np.ndarray):
        k = np.asarray(keys, dtype=np.int64).astype(np.uint64)
        bucket = (k % np.uint64(self.n_buckets)).astype(np.int64)
        fp = ((k >> np.uint64(40)) & np.uint64(0xFFFF)).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)  # 0 means empty slot
        mask = np.uint64(self.n_rows - 1)
        i1 = (k & mask).astype(np.int64)
        i2 = self._partner(i1, fp)
        return bucket, fp, i1, i2

    def _partner(self, row: np.ndarray, fp: np.ndarray) -> np.ndarray:
        mix = (fp.astype(np.uint64) * _PERM_MUL) & np.uint64(self.n_rows - 1)
        return (row.astype(np.uint64) ^ mix).astype(np.int64)

    # ---------------------- mutation ----------------------------

    def add_many(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        bucket, fp, i1, i2 = self._parts(keys)
        for b, f, r1, r2 in zip(bucket, fp, i1, i2):
            self._insert_one(int(b), np.uint16(f), int(r1), int(r2))
        self.n_keys += len(keys)

    def _insert_one(self, b: int, f: np.uint16, r1: int, r2: int) -> None:
        if self.saturated[b]:
            return  # bucket already answers "maybe" for everything
        t = self.table[b]
        for r in (r1, r2):
            if f in t[r]:
                return  # already present — idempotent add
        for r in (r1, r2):
            empty = np.nonzero(t[r] == 0)[0]
            if len(empty):
                t[r, empty[0]] = f
                return
        # eviction walk: deterministic victim choice (LCG on fp)
        r, state = r1, int(f)
        for _ in range(MAX_KICKS):
            state = (state * 1103515245 + 12345) & 0x7FFFFFFF
            s = state % self.slots
            f, t[r, s] = t[r, s], f
            r = int(self._partner(np.asarray([r]), np.asarray([f], np.uint16))[0])
            empty = np.nonzero(t[r] == 0)[0]
            if len(empty):
                t[r, empty[0]] = f
                return
        self.saturated[b] = True  # degrade THIS bucket to exact-only

    def delete_many(self, keys: np.ndarray) -> int:
        """Remove one stored fingerprint per key; returns #removed.
        Only sound for keys previously inserted (module docstring)."""
        if len(keys) == 0:
            return 0
        bucket, fp, i1, i2 = self._parts(keys)
        removed = 0
        for b, f, r1, r2 in zip(bucket, fp, i1, i2):
            t = self.table[int(b)]
            for r in (int(r1), int(r2)):
                hit = np.nonzero(t[r] == f)[0]
                if len(hit):
                    t[r, hit[0]] = 0
                    removed += 1
                    break
        self.n_keys -= removed
        return removed

    # ----------------------- probe ------------------------------

    def might_contain_many(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        bucket, fp, i1, i2 = self._parts(keys)
        row1 = self.table[bucket, i1]  # [n, slots]
        row2 = self.table[bucket, i2]
        hit = (row1 == fp[:, None]).any(axis=1) | (
            row2 == fp[:, None]
        ).any(axis=1)
        return hit | self.saturated[bucket]

    def fill_ratio(self) -> float:
        return float((self.table != 0).mean())


def build_cuckoo_distributed(
    seen_df,
    expected_keys: int = 2_000_000,
    n_buckets: int = 64,
    slots: int = 4,
) -> PartitionedCuckoo:
    """One Spark job over the seen table: each bucket's cuckoo table is
    filled executor-side by an ``applyInPandas`` task over that bucket's
    keys (sorted first — canonical layout for a given key set); the
    driver assembles the finished uint16 tables. Same no-driver-read
    resume shape as operators/bloom.py build_bloom_distributed.

    Unlike the Bloom (pure OR, so incremental == distributed
    bit-for-bit), a cuckoo table's LAYOUT depends on insertion order;
    only the membership semantics (no false negatives) is
    order-invariant — which is what the crawl's exactness needs, and
    what tests assert (gate-on == gate-off, either build path).
    """
    import pandas as pd
    from pyspark.sql import functions as F

    proto = PartitionedCuckoo(expected_keys, n_buckets, slots)
    n_rows = proto.n_rows

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        b = int(pdf["bucket"].iloc[0])
        one = PartitionedCuckoo(expected_keys, n_buckets, slots)
        keys = np.sort(pdf["url_h64"].to_numpy(dtype=np.int64))
        one.add_many(keys)
        return pd.DataFrame(
            {
                "bucket": [b],
                "n_keys": [len(keys)],
                "saturated": [bool(one.saturated[b])],
                "tbl": [one.table[b].tobytes()],
            }
        )

    rows = (
        seen_df.select(
            (F.col("url_h64") % F.lit(n_buckets)).cast("int").alias("bucket"),
            "url_h64",
        )
        .groupBy("bucket")
        .applyInPandas(build, "bucket int, n_keys long, saturated boolean, tbl binary")
        .collect()
    )
    for r in rows:
        proto.table[r["bucket"]] = np.frombuffer(
            bytes(r["tbl"]), dtype=np.uint16
        ).reshape(n_rows, slots)
        proto.saturated[r["bucket"]] = r["saturated"]
        proto.n_keys += r["n_keys"]
    return proto
