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
structure of BASELINE.json:14. In the sandbox the buckets live in one
driver-held numpy array broadcast to executors (frontier ≤ 10^6); at
the 10^10 design point each bucket is built per seen-partition with
``applyInPandas`` and co-located with its url_hash bucket so probe and
join never shuffle (SURVEY.md §4 bloom-gating row).

Keys are ``track0s.hashing.h64`` values (pure Python, computable inside
the fused extract UDF) — deliberately NOT Spark's xxhash64, which is
used for partitioning only. Double hashing g_i = h1 + i*h2 gives K
probe positions from one 64-bit key (Kirsch-Mitzenmacher).
"""

from __future__ import annotations

import numpy as np

#: mask to keep driver/UDF hash values in signed-int64 range for Arrow
H64_MASK = 0x7FFF_FFFF_FFFF_FFFF


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
        buckets, pos = self._positions(np.asarray(keys, dtype=np.int64))
        for i in range(self.n_hashes):
            byte_idx = (pos[i] >> np.uint64(3)).astype(np.int64)
            bit = (np.uint8(1) << (pos[i] & np.uint64(7)).astype(np.uint8))
            # np.bitwise_or.at handles duplicate (bucket, byte) indices
            np.bitwise_or.at(self.bits, (buckets, byte_idx), bit)
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
