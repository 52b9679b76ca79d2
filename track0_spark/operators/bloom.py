"""Partitioned Bloom URL-seen gate (SURVEY.md §2.4 D3).

The exact ``seen`` anti-join (D2) is always the source of truth; this
gate only shrinks its input. Candidates whose hash is definitely NOT in
the bloom are admitted without touching the anti-join; maybe-seen ones
(true hits + false positives) go through the exact join. False
positives therefore cost one extra exact check; false negatives are
impossible because every admitted URL (seeds included) is added before
the next round — so exactness is preserved by construction, and pytest
asserts gate-on == gate-off output.

Layout: NB bucket bitmaps indexed by ``hash % NB`` — the partitioned
structure of BASELINE.json:14. The full structure is built
DISTRIBUTED: ``build_bloom_distributed`` groups the seen table by
bucket and computes each bucket's bitmap in an ``applyInPandas`` task
(bit-identical to the incremental driver path — pytest asserts it);
the driver only assembles the finished ~KB-sized bitmaps. Per-round
maintenance stays incremental (O(round delta), never O(total seen)).
At the 10^10 design point the same per-bucket tasks write their
bitmaps next to their url_hash storage bucket so probe and join stay
co-located instead of broadcasting (SURVEY.md §4 bloom-gating row).

Keys are ``track0s.hashing.h64`` values (pure Python, computable inside
the fused extract UDF) — deliberately NOT Spark's xxhash64, which is
used for partitioning only. Double hashing g_i = h1 + i*h2 gives K
probe positions from one 64-bit key (Kirsch-Mitzenmacher).
"""

from __future__ import annotations

import numpy as np

#: mask to keep driver/UDF hash values in signed-int64 range for Arrow
H64_MASK = 0x7FFF_FFFF_FFFF_FFFF


def bucket_bitmap(keys: np.ndarray, bucket_bits: int, n_hashes: int) -> np.ndarray:
    """One bucket's bitmap for the given keys (uint8 bytes).

    The single shared kernel: ``PartitionedBloom.add_many`` and the
    distributed ``applyInPandas`` builder both OR these exact bytes, so
    incremental and distributed builds are bit-identical by construction.
    Bit positions depend only on the key (Kirsch-Mitzenmacher double
    hashing), never on which bucket the key routes to.
    """
    out = np.zeros(bucket_bits // 8, dtype=np.uint8)
    if len(keys) == 0:
        return out
    k = np.asarray(keys, dtype=np.int64).astype(np.uint64)
    h1 = (k >> np.uint64(32)) & np.uint64(0xFFFFFFFF)
    h2 = (k & np.uint64(0xFFFFFFFF)) | np.uint64(1)  # odd -> full period
    mask = np.uint64(bucket_bits - 1)
    for i in range(n_hashes):
        pos = (h1 + np.uint64(i) * h2) & mask
        byte_idx = (pos >> np.uint64(3)).astype(np.int64)
        bit = np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)
        np.bitwise_or.at(out, byte_idx, bit)
    return out


def probe_bitmap(
    keys: np.ndarray, bits: np.ndarray, bucket_bits: int, n_hashes: int
) -> np.ndarray:
    """Membership verdicts for keys against ONE bucket's bitmap — the
    single-bucket twin of ``PartitionedBloom.might_contain_many``, used
    by the co-located gate whose tasks each hold only their own
    bucket's bytes (operators/bloom_colocated.py). Same
    Kirsch-Mitzenmacher positions as ``bucket_bitmap``, so anything
    that kernel set, this one finds."""
    if len(keys) == 0:
        return np.zeros(0, dtype=bool)
    k = np.asarray(keys, dtype=np.int64).astype(np.uint64)
    h1 = (k >> np.uint64(32)) & np.uint64(0xFFFFFFFF)
    h2 = (k & np.uint64(0xFFFFFFFF)) | np.uint64(1)
    mask = np.uint64(bucket_bits - 1)
    out = np.ones(len(k), dtype=bool)
    for i in range(n_hashes):
        pos = (h1 + np.uint64(i) * h2) & mask
        byte_idx = (pos >> np.uint64(3)).astype(np.int64)
        bit = np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)
        out &= (bits[byte_idx] & bit) != 0
    return out


class PartitionedBloom:
    def __init__(
        self,
        expected_keys: int = 2_000_000,
        bits_per_key: int = 12,
        n_buckets: int = 64,
        n_hashes: int = 7,
    ):
        self.n_buckets = n_buckets
        self.n_hashes = n_hashes
        bucket_bits = max(1024, (expected_keys * bits_per_key) // n_buckets)
        # power-of-two bits per bucket -> mask instead of mod
        self.bucket_bits = 1 << int(np.ceil(np.log2(bucket_bits)))
        self.bits = np.zeros((n_buckets, self.bucket_bits // 8), dtype=np.uint8)
        self.n_keys = 0

    def _positions(self, keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(bucket ids, [K x n] bit positions) for signed-int64 keys."""
        k = keys.astype(np.uint64)
        buckets = (k % np.uint64(self.n_buckets)).astype(np.int64)
        h1 = (k >> np.uint64(32)) & np.uint64(0xFFFFFFFF)
        h2 = (k & np.uint64(0xFFFFFFFF)) | np.uint64(1)  # odd -> full period
        mask = np.uint64(self.bucket_bits - 1)
        pos = np.empty((self.n_hashes, len(k)), dtype=np.uint64)
        for i in range(self.n_hashes):
            pos[i] = (h1 + np.uint64(i) * h2) & mask
        return buckets, pos

    def add_many(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        keys = np.asarray(keys, dtype=np.int64)
        buckets = (keys.astype(np.uint64) % np.uint64(self.n_buckets)).astype(
            np.int64
        )
        # route through the shared bucket_bitmap kernel (≤ n_buckets
        # iterations) so incremental adds == distributed builds, bit for bit
        for b in np.unique(buckets):
            self.bits[b] |= bucket_bitmap(
                keys[buckets == b], self.bucket_bits, self.n_hashes
            )
        self.n_keys += len(keys)

    def might_contain_many(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        buckets, pos = self._positions(np.asarray(keys, dtype=np.int64))
        out = np.ones(len(keys), dtype=bool)
        for i in range(self.n_hashes):
            byte_idx = (pos[i] >> np.uint64(3)).astype(np.int64)
            bit = (np.uint8(1) << (pos[i] & np.uint64(7)).astype(np.uint8))
            out &= (self.bits[buckets, byte_idx] & bit) != 0
        return out

    def fill_ratio(self) -> float:
        return float(np.unpackbits(self.bits).mean())


def build_bloom_distributed(
    seen_df,
    expected_keys: int = 2_000_000,
    bits_per_key: int = 12,
    n_buckets: int = 64,
    n_hashes: int = 7,
) -> PartitionedBloom:
    """Build the PartitionedBloom with one Spark job over the seen table.

    Each bucket's bitmap is computed executor-side by an
    ``applyInPandas`` task over that bucket's keys (``url_h64 % NB`` —
    the same routing ``add_many`` uses); the driver receives only the
    finished bitmaps (n_buckets rows of bucket_bits/8 bytes, a few MB
    total) plus per-bucket key counts. No full-seen driver read: the
    keys never leave the executors. Resume therefore costs one
    distributed pass over the seen snapshot instead of a driver-side
    pyarrow read of every delta (VERDICT.md round 1, "What's wrong" #4).
    """
    import pandas as pd
    from pyspark.sql import functions as F

    proto = PartitionedBloom(expected_keys, bits_per_key, n_buckets, n_hashes)
    bucket_bits, nh = proto.bucket_bits, n_hashes

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = pdf["url_h64"].to_numpy(dtype=np.int64)
        bits = bucket_bitmap(keys, bucket_bits, nh)
        return pd.DataFrame(
            {
                "bucket": [int(pdf["bucket"].iloc[0])],
                "n_keys": [len(keys)],
                "bits": [bits.tobytes()],
            }
        )

    rows = (
        seen_df.select(
            (F.col("url_h64") % F.lit(n_buckets)).cast("int").alias("bucket"),
            "url_h64",
        )
        .groupBy("bucket")
        .applyInPandas(build, "bucket int, n_keys long, bits binary")
        .collect()
    )
    for r in rows:
        proto.bits[r["bucket"]] = np.frombuffer(bytes(r["bits"]), dtype=np.uint8)
        proto.n_keys += r["n_keys"]
    return proto
