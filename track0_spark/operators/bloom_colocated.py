"""Co-located partitioned Bloom seen-gate (VERDICT r2 "Next round" #2).

The driver-held gate (operators/bloom.py + CrawlLoop gate="bloom")
assembles every bucket's bitmap in driver memory and re-broadcasts the
WHOLE structure each round; at the 10^10-URL design point that is a
~15 GB broadcast per round plus O(delta) driver-side pyarrow reads for
maintenance. This module is the shape that survives that scale:

- **State lives in storage, partitioned by bucket, never assembled.**
  Each committed round writes a ``bloom_delta`` parquet dir next to its
  ``seen_delta`` (the "bitmap stored next to its url_hash storage
  bucket" layout, SURVEY.md §4 bloom row), Hive-partitioned by
  ``bucket`` so a task can open exactly its own bucket's files.
- **Maintenance is a distributed O(delta) job.** The round's seen_delta
  is grouped by bucket and each task emits that bucket's delta bitmap
  via the shared ``bucket_bitmap`` kernel — the same bytes the driver
  path ORs, so the two gates are bit-equivalent by construction. The
  driver never touches a key (no ``read_delta_column`` pyarrow read).
- **Probe is bucket-aligned, not broadcast.** Candidates group by
  ``pmod(url_h64, n_buckets)``; each ``applyInPandas`` task reads ONLY
  its bucket's bitmap bytes (OR of that bucket's per-round delta files)
  and probes with ``probe_bitmap``. Peak per-task memory is one
  bucket's bitmap (bucket_bits/8 bytes), independent of total gate
  size; network per round is one copy of the structure *spread across
  tasks*, not one copy *per executor*.

Exactness contract (same as the driver gate): false positives cost one
extra exact anti-join probe; false negatives are impossible because
every admitted URL's bucket delta is written before the next round —
missing delta dirs are REBUILT from their round's seen_delta (the loud
torn-store check in load_seen guards the source of truth), so a crash
between commit and gate-write self-heals instead of silently
re-admitting seen URLs.

The per-bucket delta files form a tiny LSM: probe cost grows with
committed rounds until ``compact`` ORs all deltas ≤ round r into one
file per bucket (mirrors SnapshotStore.compact_seen; wired to the same
``compact_every`` cadence by CrawlLoop).

Keys are ``h64 & H64_MASK`` (non-negative), so Spark's pmod, signed
mod, and numpy's uint64 mod all agree for ANY bucket count — no
power-of-two constraint on n_buckets here (bucket_bits stays a power
of two for the positional bit mask).
"""

from __future__ import annotations

import glob as _glob
import os
from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .bloom import bucket_bitmap, probe_bitmap

DELTA_DIRNAME = "bloom_delta"
COMPACT_DIRNAME = "bloom"
_BITMAP_SCHEMA = "bucket int, bits binary"
_VERDICT_SCHEMA = "url_canon string, maybe_seen boolean"


def _read_bucket_bits(
    dirs: list[str], bucket: int, bucket_bits: int
) -> np.ndarray:
    """OR of one bucket's bitmap bytes across delta dirs — executor-side
    pyarrow read of ONLY ``bucket=<b>`` files (Hive partition pruning by
    path, no Spark job)."""
    import pyarrow.parquet as pq

    bits = np.zeros(bucket_bits // 8, dtype=np.uint8)
    for d in dirs:
        # Loud torn-store check (r3 ADVICE): a dir handed to a probe or
        # compact task that is missing or _SUCCESS-less means gate state
        # was lost AFTER ensure() validated it — silently treating it as
        # all-zero would manufacture bloom false negatives (re-admitting
        # seen URLs), the one failure the gate contract forbids. Raise
        # exactly like load_seen's torn-store error instead. A bucket
        # with no file inside a complete dir is fine (no keys hashed
        # there that round — partitionBy writes no empty partitions).
        if not os.path.exists(os.path.join(d, "_SUCCESS")):
            raise RuntimeError(
                f"bloom gate dir torn or missing (no _SUCCESS): {d}; "
                "state lost after ensure() — rebuild via ensure()/resume "
                "instead of probing a hole"
            )
        for f in _glob.glob(os.path.join(d, f"bucket={bucket}", "*.parquet")):
            col = pq.read_table(f, columns=["bits"])["bits"]
            for v in col.to_pylist():
                bits |= np.frombuffer(v, dtype=np.uint8)
    return bits


class ColocatedBloomGate:
    def __init__(
        self,
        spark,
        store_root: str,
        expected_keys: int = 2_000_000,
        bits_per_key: int = 12,
        n_buckets: int = 64,
        n_hashes: int = 7,
    ):
        self.spark = spark
        self.root = store_root
        self.n_buckets = n_buckets
        self.n_hashes = n_hashes
        bucket_bits = max(1024, (expected_keys * bits_per_key) // n_buckets)
        self.bucket_bits = 1 << int(np.ceil(np.log2(bucket_bits)))

    # ------------------------- paths ----------------------------

    def _round_dir(self, rnd: int) -> str:
        return os.path.join(self.root, f"round_{rnd:05d}")

    def delta_dir(self, rnd: int) -> str:
        return os.path.join(self._round_dir(rnd), DELTA_DIRNAME)

    def _compact_dir(self, rnd: int) -> str:
        return os.path.join(self.root, f"compact_{rnd:05d}", COMPACT_DIRNAME)

    def _latest_compact(self, upto: int) -> int | None:
        best = None
        for r in range(upto + 1):
            if os.path.exists(
                os.path.join(self._compact_dir(r), "_SUCCESS")
            ):
                best = r
        return best

    def _bit_dirs(self, upto: int) -> list[str]:
        """Dirs whose union covers the seen set through round ``upto``:
        newest complete compact base + every later round's delta."""
        base = self._latest_compact(upto)
        dirs = [] if base is None else [self._compact_dir(base)]
        start = 0 if base is None else base + 1
        dirs += [self.delta_dir(r) for r in range(start, upto + 1)]
        return dirs

    # ------------------------- build ----------------------------

    def _write_bitmaps(self, keys_df: DataFrame, out_dir: str) -> None:
        """One distributed pass: keys -> per-bucket bitmaps ->
        Hive-partitioned parquet. Bitmap bytes come from the SAME
        ``bucket_bitmap`` kernel as the driver gate, so the structures
        are bit-identical for the same key set."""
        bucket_bits, nh = self.bucket_bits, self.n_hashes

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            keys = pdf["url_h64"].to_numpy(dtype=np.int64)
            return pd.DataFrame(
                {
                    "bucket": [int(pdf["bucket"].iloc[0])],
                    "bits": [bucket_bitmap(keys, bucket_bits, nh).tobytes()],
                }
            )

        (
            keys_df.select(
                F.pmod(F.col("url_h64"), F.lit(self.n_buckets))
                .cast("int")
                .alias("bucket"),
                "url_h64",
            )
            .groupBy("bucket")
            .applyInPandas(build, _BITMAP_SCHEMA)
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(out_dir)
        )

    def write_delta(self, rnd: int, seen_delta_df: DataFrame) -> None:
        """Round maintenance: write round ``rnd``'s bucket delta
        bitmaps from its seen_delta (O(delta) executor work, zero
        driver key reads)."""
        self._write_bitmaps(seen_delta_df.select("url_h64"), self.delta_dir(rnd))

    def ensure(self, upto: int) -> int:
        """Make the gate state complete through round ``upto``: rebuild
        any missing round's bloom_delta from that round's seen_delta
        (covers resume of a store crawled with the gate off, and the
        crash window between a round commit and its gate write).
        Returns the number of rounds rebuilt."""
        rebuilt = 0
        base = self._latest_compact(upto)
        start = 0 if base is None else base + 1
        for r in range(start, upto + 1):
            d = self.delta_dir(r)
            if not os.path.exists(os.path.join(d, "_SUCCESS")):
                delta = self.spark.read.parquet(
                    os.path.join(self._round_dir(r), "seen_delta")
                )
                self._write_bitmaps(delta.select("url_h64"), d)
                rebuilt += 1
        return rebuilt

    def compact(self, rnd: int) -> dict:
        """OR all bucket deltas ≤ ``rnd`` into one file per bucket.
        Executor-side per bucket (each task reads only its own bucket's
        files); subsequent probes read the compact base + later deltas.
        Old delta dirs stay in place (same non-destructive discipline
        as SnapshotStore.compact_seen — the compact marker redirects
        readers)."""
        dirs = self._bit_dirs(rnd)
        bucket_bits = self.bucket_bits
        out = self._compact_dir(rnd)

        def orbits(pdf: pd.DataFrame) -> pd.DataFrame:
            b = int(pdf["bucket"].iloc[0])
            return pd.DataFrame(
                {
                    "bucket": [b],
                    "bits": [
                        _read_bucket_bits(dirs, b, bucket_bits).tobytes()
                    ],
                }
            )

        (
            self.spark.range(self.n_buckets)
            .select(F.col("id").cast("int").alias("bucket"))
            .groupBy("bucket")
            .applyInPandas(orbits, _BITMAP_SCHEMA)
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(out)
        )
        return {"base": rnd, "dirs_merged": len(dirs)}

    # ------------------------- probe ----------------------------

    def probe(self, cand: DataFrame, upto: int) -> DataFrame:
        """Replace ``maybe_seen`` with the gate verdict: group the
        (url_canon, url_h64) projection by bucket, each task reads its
        own bucket's bitmap and probes locally, and the narrow verdict
        joins back on url_canon (cand is unique per url_canon here —
        probe runs after D1 dedup). Bloom-negative rows then skip the
        exact anti-join exactly as with the broadcast gate."""
        dirs = self._bit_dirs(upto)
        bucket_bits, nh = self.bucket_bits, self.n_hashes

        def verdict(pdf: pd.DataFrame) -> pd.DataFrame:
            b = int(pdf["bucket"].iloc[0])
            bits = _read_bucket_bits(dirs, b, bucket_bits)
            keys = pdf["url_h64"].to_numpy(dtype=np.int64)
            return pd.DataFrame(
                {
                    "url_canon": pdf["url_canon"].to_numpy(),
                    "maybe_seen": probe_bitmap(keys, bits, bucket_bits, nh),
                }
            )

        verdicts = (
            cand.select(
                "url_canon",
                "url_h64",
                F.pmod(F.col("url_h64"), F.lit(self.n_buckets))
                .cast("int")
                .alias("bucket"),
            )
            .groupBy("bucket")
            .applyInPandas(verdict, _VERDICT_SCHEMA)
        )
        # SHUFFLE_HASH: the verdict side has the SAME cardinality as the
        # deduped candidate set — broadcasting it would ship the whole
        # round's candidates to every executor at scale; hash-joining on
        # the url_canon partitioning the dedup agg already established
        # is the plan that survives 100x.
        return cand.drop("maybe_seen").join(
            verdicts.hint("SHUFFLE_HASH"), "url_canon"
        )

    def make_probe(self, upto: int) -> Callable[[DataFrame], DataFrame]:
        return lambda cand: self.probe(cand, upto)
