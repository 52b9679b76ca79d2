"""Atomic per-round snapshot store — the Iceberg-shaped sandbox fallback.

Production target is Iceberg tables with ``bucket(url_hash)`` partition
transforms and snapshot-per-round commits (SURVEY.md §7 M3); the
sandbox has no Iceberg jars and no network, so this module provides the
same commit semantics on plain parquet:

    root/round_00007/
        frontier/  seen_delta/  crawl_log/   (parquet dirs, Spark-written)
        MANIFEST.json                        (counts, metrics)

A snapshot is written entirely under ``root/.tmp-<round>/`` and then
``os.rename``d into place — atomic on POSIX, so a killed job leaves
either the complete previous round or the complete next round, never a
torn state. ``latest_round`` trusts only directories whose MANIFEST
exists (the manifest is written last inside the tmp dir). Resume =
load the newest complete snapshot and continue (BASELINE.json:14).

Append-only design: ``seen_delta`` holds only the URLs admitted that
round; the seen *state* at round r is the union of deltas 0..r — each
commit writes O(admitted) rows, not O(total), exactly how the Iceberg
production variant would append. ``crawl_log`` is likewise per-round.
Row counts come from parquet footers (driver-side metadata read, no
Spark job).
"""

from __future__ import annotations

import glob as _glob
import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..schemas import CRAWL_LOG, FRONTIER, SEEN

FORMAT_VERSION = 2


def _pq_count(path: str) -> int:
    import pyarrow.parquet as pq

    return sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in _glob.glob(os.path.join(path, "*.parquet"))
    )


class SnapshotStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, rnd: int) -> str:
        return os.path.join(self.root, f"round_{rnd:05d}")

    def latest_round(self) -> int | None:
        best = None
        for name in os.listdir(self.root):
            if not name.startswith("round_"):
                continue
            d = os.path.join(self.root, name)
            if os.path.exists(os.path.join(d, "MANIFEST.json")):
                r = int(name.split("_")[1])
                best = r if best is None or r > best else best
        return best

    def commit(
        self,
        rnd: int,
        frontier: DataFrame,
        seen_delta: DataFrame,
        crawl_log: DataFrame | None,
        extra_meta: dict | None = None,
    ) -> dict:
        """Write state-after-round ``rnd`` (+ that round's log) atomically."""
        tmp = os.path.join(self.root, f".tmp-{rnd:05d}")
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        t0 = time.time()
        # seen_delta reads the DEEPEST persisted chain (admitted ->
        # fetched -> ranked): writing it FIRST materializes every cache
        # level with full parallelism; the remaining writes are then
        # cache-read-only and run concurrently. (Racing all three from
        # the start serializes on cache-block locks — measured as
        # local[32] running slower than local[8].)
        from concurrent.futures import ThreadPoolExecutor

        seen_delta.write.mode("overwrite").parquet(os.path.join(tmp, "seen_delta"))
        writes = [(frontier, "frontier")]
        if crawl_log is not None:
            writes.append((crawl_log, "crawl_log"))
        with ThreadPoolExecutor(len(writes)) as ex:
            futs = [
                ex.submit(
                    lambda df, name: df.write.mode("overwrite").parquet(
                        os.path.join(tmp, name)
                    ),
                    df,
                    name,
                )
                for df, name in writes
            ]
            for f in futs:
                f.result()
        prev_seen = (
            self.manifest(rnd - 1)["counts"]["seen"] if rnd > 0 else 0
        )
        delta_rows = _pq_count(os.path.join(tmp, "seen_delta"))
        counts = {
            "frontier": _pq_count(os.path.join(tmp, "frontier")),
            "seen_delta": delta_rows,
            "seen": prev_seen + delta_rows,
            "crawl_log": (
                _pq_count(os.path.join(tmp, "crawl_log"))
                if crawl_log is not None
                else 0
            ),
        }
        manifest = {
            "format_version": FORMAT_VERSION,
            "round": rnd,
            "counts": counts,
            "wall_s": round(time.time() - t0, 3),
            **(extra_meta or {}),
        }
        with open(os.path.join(tmp, "MANIFEST.json"), "w") as f:
            json.dump(manifest, f, indent=1)
        final = self._dir(rnd)
        if os.path.exists(final):
            shutil.rmtree(final)  # re-commit after partial resume: replace
        os.rename(tmp, final)
        return manifest

    def load_frontier(self, rnd: int) -> DataFrame:
        # explicit schema: skips the per-round parquet footer schema
        # inference (driver fixed cost — VERDICT r2 next #3).
        # attempts: pre-round-5 checkpoints lack the column (parquet
        # fills null under an explicit schema) — legacy-tolerated as 0,
        # the politeness STATE_SCHEMA discipline
        df = self.spark.read.schema(FRONTIER).parquet(
            os.path.join(self._dir(rnd), "frontier")
        )
        return df.withColumn(
            "attempts", F.coalesce(F.col("attempts"), F.lit(0))
        )

    def _compact_dir(self, rnd: int) -> str:
        return os.path.join(self.root, f"compact_{rnd:05d}")

    def latest_compact(self, upto: int) -> int | None:
        """Newest compacted-seen snapshot covering rounds 0..c, c<=upto."""
        best = None
        for name in os.listdir(self.root):
            if not name.startswith("compact_"):
                continue
            if not os.path.exists(
                os.path.join(self.root, name, "COMPACT.json")
            ):
                continue
            c = int(name.split("_")[1])
            if c <= upto and (best is None or c > best):
                best = c
        return best

    def compact_seen(self, rnd: int) -> dict:
        """Rewrite seen state 0..rnd as ONE parquet dir (S5 compaction).

        Over 100s of rounds the seen state fragments into one small
        delta dir per round; resume (and the distributed bloom build)
        then pays a per-round listing + many tiny parquet reads. A
        compacted snapshot caps that at one big read plus the deltas
        SINCE the compaction. Same atomic tmp-dir + rename commit as
        rounds; the per-round delta dirs stay untouched (crawl_log
        shares them), so compaction is pure optimization — load_seen
        output is identical with or without it (pytest-asserted).
        Equivalent to Iceberg snapshot expiration + data compaction."""
        tmp = os.path.join(self.root, f".tmp-compact-{rnd:05d}")
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        t0 = time.time()
        self.load_seen(rnd).repartition(
            max(self.spark.sparkContext.defaultParallelism, 8)
        ).write.mode("overwrite").parquet(os.path.join(tmp, "seen"))
        meta = {
            "round": rnd,
            "rows": _pq_count(os.path.join(tmp, "seen")),
            "wall_s": round(time.time() - t0, 3),
        }
        with open(os.path.join(tmp, "COMPACT.json"), "w") as f:
            json.dump(meta, f, indent=1)
        final = self._compact_dir(rnd)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
        # drop superseded compacts (the deltas they were built from are
        # still in the round dirs — nothing is lost)
        for name in os.listdir(self.root):
            if name.startswith("compact_") and name != f"compact_{rnd:05d}":
                shutil.rmtree(os.path.join(self.root, name), ignore_errors=True)
        return meta

    def forget_seen(self, rnd: int, match_col) -> dict:
        """Selective FORGET: rewrite the seen state at ``rnd`` as a new
        compacted base EXCLUDING every key where ``match_col`` (a
        boolean Column over url_canon / host / path / protocol /
        first_round) is true — the S4 staleness companion: a forgotten
        URL becomes re-admittable the next time any fetched page links
        to it, without touching crawl history or the pending frontier.

        Correctness with the approximate gates is free by construction:
        a gate still containing forgotten fingerprints only produces
        FALSE POSITIVES (one wasted exact probe each) — the exact
        anti-join now runs against the rewritten seen state, so
        re-admission works under every gate with ZERO gate maintenance.
        Restoring gate PRECISION is where the deletable cuckoo earns
        its keep: ``ColocatedCuckooGate.delete_distributed`` removes
        the forgotten fingerprints as a distributed per-bucket job (the
        bloom's only precision-restoring move is a full rebuild).

        The removed keys are stashed under the new base dir
        (``forgotten/``: url_canon, url_h64) exactly for that gate
        deletion job. Same tmp-dir + rename commit discipline as
        ``compact_seen``; superseded compacts are dropped the same way
        (per-round deltas stay untouched — crawl_log shares them)."""
        from pyspark.sql import functions as F

        tmp = os.path.join(self.root, f".tmp-forget-{rnd:05d}")
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        t0 = time.time()
        enriched = self.load_seen(rnd).select(
            "*",
            F.expr("parse_url(url_canon, 'HOST')").alias("host"),
            F.expr("parse_url(url_canon, 'PATH')").alias("path"),
            F.element_at(F.split("url_canon", "://"), 1).alias("protocol"),
        )
        seen_cols = [f.name for f in SEEN.fields]
        # compile_rules Columns are CASE chains ending in a literal
        # default — never NULL — so match/~match partition exactly
        enriched.filter(match_col).select(
            "url_canon", "url_h64"
        ).write.mode("overwrite").parquet(os.path.join(tmp, "forgotten"))
        enriched.filter(~match_col).select(*seen_cols).repartition(
            max(self.spark.sparkContext.defaultParallelism, 8)
        ).write.mode("overwrite").parquet(os.path.join(tmp, "seen"))
        removed = _pq_count(os.path.join(tmp, "forgotten"))
        kept = _pq_count(os.path.join(tmp, "seen"))
        meta = {
            "round": rnd,
            "rows": kept,
            "forgotten": removed,
            "wall_s": round(time.time() - t0, 3),
        }
        with open(os.path.join(tmp, "COMPACT.json"), "w") as f:
            json.dump(meta, f, indent=1)
        final = self._compact_dir(rnd)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
        for name in os.listdir(self.root):
            if name.startswith("compact_") and name != f"compact_{rnd:05d}":
                shutil.rmtree(os.path.join(self.root, name), ignore_errors=True)
        return meta

    def load_forgotten(self, rnd: int) -> DataFrame:
        """The keys removed by ``forget_seen`` at round ``rnd`` —
        the input to a gate deletion job."""
        path = os.path.join(self._compact_dir(rnd), "forgotten")
        return self.spark.read.schema("url_canon string, url_h64 long").parquet(
            path
        )

    def load_seen(self, rnd: int) -> DataFrame:
        """Seen state at round rnd = newest compacted base (if any) +
        deltas since it.

        Every committed round writes a seen_delta dir (possibly empty of
        rows, never absent) — a missing dir means a hole in the store
        (manual deletion, partial copy) and silently skipping it would
        shrink the seen set and re-admit crawled URLs, so FAIL LOUDLY."""
        base = self.latest_compact(rnd)
        paths = []
        if base is not None:
            paths.append(os.path.join(self._compact_dir(base), "seen"))
        start = 0 if base is None else base + 1
        delta_paths = [
            os.path.join(self._dir(r), "seen_delta")
            for r in range(start, rnd + 1)
        ]
        missing = [p for p in delta_paths if not os.path.exists(p)]
        if missing:
            raise FileNotFoundError(
                f"seen store is torn: missing delta dirs {missing[:3]}"
                f"{' …' if len(missing) > 3 else ''} for rounds <= {rnd}"
            )
        return self.spark.read.schema(SEEN).parquet(*(paths + delta_paths))

    def load_seen_delta(self, rnd: int) -> DataFrame:
        """One round's seen_delta as a DataFrame (feeds the co-located
        gate's distributed O(delta) maintenance — the executor-side
        twin of ``read_delta_column``). Same torn-store contract."""
        path = os.path.join(self._dir(rnd), "seen_delta")
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"seen store is torn: round {rnd} has no seen_delta dir"
            )
        return self.spark.read.schema(SEEN).parquet(path)

    def read_delta_column(self, rnd: int, column: str):
        """One seen_delta column of round ``rnd`` as a numpy array, read
        driver-side via pyarrow (no Spark job) — feeds the bloom gate."""
        import numpy as np
        import pyarrow.parquet as pq

        path = os.path.join(self._dir(rnd), "seen_delta")
        if not os.path.exists(path):
            # same torn-store contract as load_seen: committed rounds
            # always have the dir (an empty delta still writes one)
            raise FileNotFoundError(
                f"seen store is torn: round {rnd} has no seen_delta dir"
            )
        files = _glob.glob(os.path.join(path, "*.parquet"))
        if not files:
            return np.zeros(0, dtype=np.int64)
        arrs = [pq.read_table(f, columns=[column])[column] for f in files]
        import pyarrow as pa

        return pa.concat_arrays(
            [a.combine_chunks() for a in arrs]
        ).to_numpy(zero_copy_only=False)

    def manifest(self, rnd: int) -> dict:
        with open(os.path.join(self._dir(rnd), "MANIFEST.json")) as f:
            return json.load(f)

    def full_crawl_log(self) -> DataFrame | None:
        """Union of all committed rounds' logs (ORDER BY round, fetch_seq
        is the comparison artifact — BASELINE.json:2)."""
        latest = self.latest_round()
        paths = [
            os.path.join(self._dir(r), "crawl_log")
            for r in range((latest or 0) + 1)
            if os.path.exists(os.path.join(self._dir(r), "crawl_log"))
        ]
        if not paths:
            return None
        return self.spark.read.schema(CRAWL_LOG).parquet(*paths)
