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
_MIX_MUL = np.uint64(0x9E3779B97F4A7C15)  # key -> primary-row mix (2^64/phi)


def key_parts(keys: np.ndarray, n_buckets: int, n_rows: int):
    """(bucket, fp, i1, i2) for signed-int64 keys — the one routing
    function, shared by the filter object and the distributed builder."""
    k = np.asarray(keys, dtype=np.int64).astype(np.uint64)
    bucket = (k % np.uint64(n_buckets)).astype(np.int64)
    fp = ((k >> np.uint64(40)) & np.uint64(0xFFFF)).astype(np.uint16)
    fp = np.where(fp == 0, np.uint16(1), fp)  # 0 means empty slot
    mask = np.uint64(n_rows - 1)
    # primary row from a multiplicative mix of the WHOLE key — must be
    # independent of the low bits that route the bucket (k % n_buckets):
    # taking i1 = k & mask would leave only n_rows/n_buckets reachable
    # rows per bucket and saturate the filter wholesale at a fraction of
    # its design load.
    i1 = ((k * _MIX_MUL) >> np.uint64(24) & mask).astype(np.int64)
    mix = (fp.astype(np.uint64) * _PERM_MUL) & mask
    i2 = (i1.astype(np.uint64) ^ mix).astype(np.int64)
    return bucket, fp, i1, i2


def _partner_row(row: int, fp: int, n_rows: int) -> int:
    """Partner row for (row, fp) — partial-key cuckoo displacement."""
    mix = int((np.uint64(fp) * _PERM_MUL) & np.uint64(n_rows - 1))
    return row ^ mix


def _insert_into(
    tbl: np.ndarray, f: int, r1: int, r2: int, n_rows: int, slots: int
) -> int:
    """Store one fingerprint copy into a single bucket table (shared by
    the incremental path and the distributed builder). Returns 1 if
    stored, 0 if the eviction walk exceeded MAX_KICKS (caller marks the
    bucket saturated). Deterministic victim choice (LCG on fp)."""
    for r in (r1, r2):
        empty = np.nonzero(tbl[r] == 0)[0]
        if len(empty):
            tbl[r, empty[0]] = f
            return 1
    r, state = r1, int(f)
    for _ in range(MAX_KICKS):
        state = (state * 1103515245 + 12345) & 0x7FFFFFFF
        s = state % slots
        f, tbl[r, s] = int(tbl[r, s]), f
        r = _partner_row(r, f, n_rows)
        empty = np.nonzero(tbl[r] == 0)[0]
        if len(empty):
            tbl[r, empty[0]] = f
            return 1
    return 0


class PartitionedCuckoo:
    def __init__(
        self,
        expected_keys: int = 2_000_000,
        n_buckets: int = 64,
        slots: int = 4,
    ):
        # Power-of-two bucket counts ONLY: key_parts routes with an
        # unsigned-64 mod while the distributed builder's Spark-side
        # bucket expression uses pmod on the signed key; the two agree
        # exactly when 2^64 % n_buckets == 0, i.e. n_buckets is a power
        # of two. For any other count, probes would read the wrong
        # bucket table for negative keys -> FALSE NEGATIVES (ADVICE r2).
        if n_buckets & (n_buckets - 1) or n_buckets <= 0:
            raise ValueError(f"n_buckets must be a power of two, got {n_buckets}")
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
        return key_parts(keys, self.n_buckets, self.n_rows)

    # ---------------------- mutation ----------------------------

    def add_many(self, keys: np.ndarray) -> None:
        """Insert keys. NON-idempotent by design (standard cuckoo
        filter): distinct keys colliding on (bucket, fp, rows) each
        store their own fingerprint copy, which is exactly what makes
        ``delete_many`` sound — removing one key's copy never erases
        another's. ``n_keys`` counts fingerprints actually stored."""
        if len(keys) == 0:
            return
        bucket, fp, i1, i2 = self._parts(keys)
        for b, f, r1, r2 in zip(bucket, fp, i1, i2):
            self.n_keys += self._insert_one(int(b), np.uint16(f), int(r1), int(r2))

    def _insert_one(self, b: int, f: np.uint16, r1: int, r2: int) -> int:
        """Returns 1 if a fingerprint copy was stored, 0 if the bucket
        is (or just became) saturated and answers 'maybe' regardless."""
        if self.saturated[b]:
            return 0  # bucket already answers "maybe" for everything
        stored = _insert_into(
            self.table[b], int(f), r1, r2, self.n_rows, self.slots
        )
        if not stored:
            self.saturated[b] = True  # degrade THIS bucket to exact-only
        return stored

    def delete_many(self, keys: np.ndarray) -> int:
        """Remove one stored fingerprint per key; returns #removed.
        Only sound for keys previously inserted (module docstring)."""
        if len(keys) == 0:
            return 0
        bucket, fp, i1, i2 = self._parts(keys)
        removed = 0
        for b, f, r1, r2 in zip(bucket, fp, i1, i2):
            if self.saturated[int(b)]:
                # Keys routed here after saturation were never stored
                # (_insert_one early-returns), so a fingerprint match now
                # could be a DIFFERENT key's copy; deleting it would make
                # n_keys drift and erase another key's membership record.
                # The saturated flag keeps membership correct regardless.
                continue
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
        keys = np.sort(pdf["url_h64"].to_numpy(dtype=np.int64))
        # allocate ONLY this bucket's table (not the full filter) and
        # drive the same shared per-key insert kernel
        tbl = np.zeros((n_rows, slots), dtype=np.uint16)
        _bk, fp, i1, i2 = key_parts(keys, n_buckets, n_rows)
        stored, sat = 0, False
        for f, r1, r2 in zip(fp, i1, i2):
            if sat:
                break
            ok = _insert_into(tbl, int(f), int(r1), int(r2), n_rows, slots)
            stored += ok
            sat = not ok
        return pd.DataFrame(
            {
                "bucket": [b],
                "n_keys": [stored],
                "saturated": [sat],
                "tbl": [tbl.tobytes()],
            }
        )

    rows = (
        seen_df.select(
            # pmod (non-negative) matches key_parts' uint64 mod exactly
            # for power-of-two n_buckets (asserted in __init__ above);
            # plain signed % would route negative keys to a bucket index
            # that only wraps correctly by numpy accident.
            F.pmod(F.col("url_h64"), F.lit(n_buckets)).cast("int").alias("bucket"),
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
