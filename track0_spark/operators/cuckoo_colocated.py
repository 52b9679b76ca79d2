"""Co-located partitioned cuckoo-filter seen-gate (VERDICT r3 #6) —
the deletable twin of operators/bloom_colocated.py.

The driver-held cuckoo (operators/cuckoo.py, gate="cuckoo") assembles
every bucket's uint16 table in driver memory and re-broadcasts the
whole structure each round. This module gives the DELETABLE gate the
same 10^10 storage shape the bloom got in round 3:

- **State lives in storage, partitioned by bucket, never assembled.**
  Each committed round writes a ``cuckoo_delta`` parquet dir next to
  its ``seen_delta``, Hive-partitioned by ``bucket``; a task opens
  exactly its own bucket's files.
- **A bloom delta ORs; a cuckoo delta CANNOT** (table layout depends
  on insertion order). So the LSM unit is a whole per-round per-bucket
  cuckoo table: round r's delta holds ONLY round r's keys, inserted
  sorted (canonical layout for the key set — rebuildable
  deterministically from seen_delta on self-heal). **Probe ORs the
  MEMBERSHIP verdicts across delta tables**, not the bytes: present in
  any delta → maybe seen. No false negatives: every admitted key's
  fingerprint copy is in its round's table (or that (round, bucket) is
  saturated → answers "maybe" wholesale).
- **Maintenance is a distributed O(delta) job** (write_delta — one
  applyInPandas over the round's seen_delta). **Deletion is a
  distributed job too** (delete_distributed): keys group by bucket,
  each task loads its bucket's tables, removes ONE stored fingerprint
  copy per key (scanning deltas newest-first) and rewrites only the
  touched (dir, bucket) files. Copy-count soundness holds ACROSS
  tables: two colliding keys own one copy each (possibly in different
  deltas); a delete removes exactly one copy and the probe's OR still
  sees the other — same invariant as the single-table filter, same
  caveat (deleting never-inserted keys is unsound; the revisit/expiry
  caller only retires keys read from the seen store).
- **Compaction rebuilds, not merges** (fingerprints cannot be merged
  without their keys): ``compact`` re-inserts the STORE's actual keys
  (load_seen ≤ r) into one table per bucket, executor-side per
  bucket — the same "state is a pure function of the exact seen
  store" argument the whole gate family rests on.

Exactness contract: identical to every other gate — false positives
cost one exact anti-join probe; false negatives are impossible;
missing delta dirs are rebuilt from seen_delta (ensure), and a torn
dir raises loudly (_read_bucket_tables) instead of probing a hole.
"""

from __future__ import annotations

import glob as _glob
import os
from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .cuckoo import PartitionedCuckoo, _insert_into, key_parts

DELTA_DIRNAME = "cuckoo_delta"
COMPACT_DIRNAME = "cuckoo"
_TABLE_SCHEMA = "bucket int, n_keys long, saturated boolean, tbl binary"
_VERDICT_SCHEMA = "url_canon string, maybe_seen boolean"
_DELETE_SCHEMA = "bucket int, removed long"


def _build_bucket_table(
    keys: np.ndarray, n_buckets: int, n_rows: int, slots: int
) -> tuple[np.ndarray, int, bool]:
    """One bucket's cuckoo table for a key set, inserted in sorted
    order — the canonical layout shared by write_delta, ensure and
    compact, so a rebuilt delta is byte-identical to the original."""
    tbl = np.zeros((n_rows, slots), dtype=np.uint16)
    _b, fp, i1, i2 = key_parts(np.sort(keys), n_buckets, n_rows)
    stored, sat = 0, False
    for f, r1, r2 in zip(fp, i1, i2):
        if sat:
            break
        ok = _insert_into(tbl, int(f), int(r1), int(r2), n_rows, slots)
        stored += ok
        sat = not ok
    return tbl, stored, sat


def _read_bucket_tables(
    dirs: list[str], bucket: int, n_rows: int, slots: int
) -> list[tuple[str, np.ndarray, bool]]:
    """This bucket's (path, table, saturated) across delta dirs —
    executor-side pyarrow read of ONLY ``bucket=<b>`` files. Loud
    torn-store check, same contract as bloom_colocated."""
    import pyarrow.parquet as pq

    out = []
    for d in dirs:
        if not os.path.exists(os.path.join(d, "_SUCCESS")):
            raise RuntimeError(
                f"cuckoo gate dir torn or missing (no _SUCCESS): {d}; "
                "state lost after ensure() — rebuild via ensure()/resume"
            )
        for f in sorted(
            _glob.glob(os.path.join(d, f"bucket={bucket}", "*.parquet"))
        ):
            t = pq.read_table(f, columns=["tbl", "saturated"])
            for blob, sat in zip(
                t["tbl"].to_pylist(), t["saturated"].to_pylist()
            ):
                out.append(
                    (
                        f,
                        np.frombuffer(blob, dtype=np.uint16)
                        .reshape(n_rows, slots)
                        .copy(),
                        bool(sat),
                    )
                )
    return out


class ColocatedCuckooGate:
    """Same public surface as ColocatedBloomGate (ensure / write_delta
    / compact / make_probe) plus ``delete_distributed``."""

    def __init__(
        self,
        spark,
        store_root: str,
        expected_keys: int = 2_000_000,
        n_buckets: int = 64,
        slots: int = 4,
    ):
        self.spark = spark
        self.root = store_root
        proto = PartitionedCuckoo(expected_keys, n_buckets, slots)
        self.n_buckets = n_buckets
        self.slots = slots
        #: per-round delta tables hold only that round's keys, so size
        #: them for a round's admissions, not the whole crawl — but
        #: keep the FULL-size row count: key_parts' row mix depends on
        #: n_rows, and compact() rebuilds full-size tables; sharing
        #: n_rows keeps one routing function for every table the gate
        #: ever writes.
        self.n_rows = proto.n_rows

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
            if os.path.exists(os.path.join(self._compact_dir(r), "_SUCCESS")):
                best = r
        return best

    def _table_dirs(self, upto: int) -> list[str]:
        base = self._latest_compact(upto)
        dirs = [] if base is None else [self._compact_dir(base)]
        start = 0 if base is None else base + 1
        dirs += [self.delta_dir(r) for r in range(start, upto + 1)]
        return dirs

    # ------------------------- build ----------------------------

    def _write_tables(self, keys_df: DataFrame, out_dir: str) -> None:
        n_buckets, n_rows, slots = self.n_buckets, self.n_rows, self.slots

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            b = int(pdf["bucket"].iloc[0])
            keys = pdf["url_h64"].to_numpy(dtype=np.int64)
            tbl, stored, sat = _build_bucket_table(
                keys, n_buckets, n_rows, slots
            )
            return pd.DataFrame(
                {
                    "bucket": [b],
                    "n_keys": [stored],
                    "saturated": [sat],
                    "tbl": [tbl.tobytes()],
                }
            )

        (
            keys_df.select(
                F.pmod(F.col("url_h64"), F.lit(n_buckets))
                .cast("int")
                .alias("bucket"),
                "url_h64",
            )
            .groupBy("bucket")
            .applyInPandas(build, _TABLE_SCHEMA)
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(out_dir)
        )

    def write_delta(self, rnd: int, seen_delta_df: DataFrame) -> None:
        self._write_tables(seen_delta_df.select("url_h64"), self.delta_dir(rnd))

    def ensure(self, upto: int) -> int:
        """Rebuild any missing round's cuckoo_delta from its seen_delta
        (deterministic: sorted insertion order). Returns #rebuilt."""
        rebuilt = 0
        base = self._latest_compact(upto)
        start = 0 if base is None else base + 1
        for r in range(start, upto + 1):
            d = self.delta_dir(r)
            if not os.path.exists(os.path.join(d, "_SUCCESS")):
                delta = self.spark.read.parquet(
                    os.path.join(self._round_dir(r), "seen_delta")
                )
                self._write_tables(delta.select("url_h64"), d)
                rebuilt += 1
        return rebuilt

    def compact(self, rnd: int, seen_df: DataFrame) -> dict:
        """One full-size table per bucket, rebuilt from the exact seen
        KEYS ≤ rnd (fingerprint tables cannot be merged key-free).
        Costs one pass over the seen store — the same pass the seen
        compaction itself makes, and CrawlLoop runs them together."""
        dirs = len(self._table_dirs(rnd))
        self._write_tables(seen_df.select("url_h64"), self._compact_dir(rnd))
        return {"base": rnd, "dirs_replaced": dirs}

    # ------------------------- probe ----------------------------

    def probe(self, cand: DataFrame, upto: int) -> DataFrame:
        """maybe_seen = fingerprint present in ANY delta/base table of
        the key's bucket (or any of them saturated). Bucket-aligned
        applyInPandas; the narrow verdict SHUFFLE_HASH-joins back on
        url_canon exactly like the colocated bloom."""
        dirs = self._table_dirs(upto)
        n_buckets, n_rows, slots = self.n_buckets, self.n_rows, self.slots

        def verdict(pdf: pd.DataFrame) -> pd.DataFrame:
            b = int(pdf["bucket"].iloc[0])
            tables = _read_bucket_tables(dirs, b, n_rows, slots)
            keys = pdf["url_h64"].to_numpy(dtype=np.int64)
            _bk, fp, i1, i2 = key_parts(keys, n_buckets, n_rows)
            hit = np.zeros(len(keys), dtype=bool)
            for _path, tbl, sat in tables:
                if sat:
                    hit[:] = True
                    break
                hit |= (tbl[i1] == fp[:, None]).any(axis=1)
                hit |= (tbl[i2] == fp[:, None]).any(axis=1)
            return pd.DataFrame(
                {"url_canon": pdf["url_canon"].to_numpy(), "maybe_seen": hit}
            )

        verdicts = (
            cand.select(
                "url_canon",
                "url_h64",
                F.pmod(F.col("url_h64"), F.lit(n_buckets))
                .cast("int")
                .alias("bucket"),
            )
            .groupBy("bucket")
            .applyInPandas(verdict, _VERDICT_SCHEMA)
        )
        return cand.drop("maybe_seen").join(
            verdicts.hint("SHUFFLE_HASH"), "url_canon"
        )

    def make_probe(self, upto: int) -> Callable[[DataFrame], DataFrame]:
        return lambda cand: self.probe(cand, upto)

    # ------------------------- delete ---------------------------

    def delete_distributed(self, keys_df: DataFrame, upto: int) -> int:
        """Distributed revisit/expiry deletion: remove ONE stored
        fingerprint copy per key, rewriting only the touched
        (dir, bucket) parquet files in place (one writer per bucket —
        tasks never collide). Buckets with a saturated table are
        skipped wholesale (the flag keeps membership correct; deleting
        under saturation could erase another key's only copy, exactly
        as in the driver filter). Returns #copies removed."""
        dirs = self._table_dirs(upto)
        n_buckets, n_rows, slots = self.n_buckets, self.n_rows, self.slots

        def drop(pdf: pd.DataFrame) -> pd.DataFrame:
            import pyarrow as pa
            import pyarrow.parquet as pq

            b = int(pdf["bucket"].iloc[0])
            tables = _read_bucket_tables(dirs, b, n_rows, slots)
            if any(sat for _p, _t, sat in tables):
                return pd.DataFrame({"bucket": [b], "removed": [0]})
            keys = pdf["url_h64"].to_numpy(dtype=np.int64)
            _bk, fp, i1, i2 = key_parts(keys, n_buckets, n_rows)
            touched: set[int] = set()
            removed = 0
            for f, r1, r2 in zip(fp, i1, i2):
                # newest table first: a key usually lives in the round
                # it was admitted; scanning order only affects WHICH
                # copy goes, not soundness (module docstring)
                for ti in range(len(tables) - 1, -1, -1):
                    tbl = tables[ti][1]
                    done = False
                    for r in (int(r1), int(r2)):
                        hit = np.nonzero(tbl[r] == f)[0]
                        if len(hit):
                            tbl[r, hit[0]] = 0
                            touched.add(ti)
                            removed += 1
                            done = True
                            break
                    if done:
                        break
            for ti in touched:
                path, tbl, sat = tables[ti]
                t = pq.read_table(path)
                idx = t.schema.get_field_index("tbl")
                # one row per file by construction (_write_tables emits
                # one row per bucket; partitionBy → one bucket per file)
                t = t.set_column(
                    idx, "tbl", pa.array([tbl.tobytes()], pa.binary())
                )
                # atomic swap (ADVICE r4 low): a crash mid-write must
                # not leave a torn file under a dir whose _SUCCESS
                # marker still validates — write beside, rename over
                tmp = path + ".inprogress"
                pq.write_table(t, tmp)
                os.replace(tmp, path)
            return pd.DataFrame({"bucket": [b], "removed": [removed]})

        rows = (
            keys_df.select(
                F.pmod(F.col("url_h64"), F.lit(n_buckets))
                .cast("int")
                .alias("bucket"),
                "url_h64",
            )
            .groupBy("bucket")
            .applyInPandas(drop, _DELETE_SCHEMA)
            .collect()
        )
        return int(sum(r["removed"] for r in rows))
