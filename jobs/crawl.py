"""spark-submit entry point for the distributed crawl.

    spark-submit --py-files dist/track0s.zip jobs/crawl.py \
        --pages /data/pages_parquet --ckpt /data/ckpt \
        --seeds http://h0.example.test/p/0 http://h1.example.test/p/0 \
        --follow "+original-domain -depth>3 +requisite" --rounds 50

Also runnable as plain ``python jobs/crawl.py`` (builds a local
SparkSession) with ``--profile sf-unit|sf-correct`` to generate the
deterministic synthetic web in-memory instead of reading parquet
(FIXTURES.md §2). Prints a JSON summary line plus the head of the
crawl_log — the comparison artifact (BASELINE.json:2).

Mirror workflow (track0's primary use, SURVEY §2.1 S3/S4):

    # crawl once, keep the durable saved set + materialize files
    python jobs/crawl.py --profile sf-unit --save '+content-type=text/*' \
        --saved-out /data/mirror.parquet --mirror-out /data/mirror/
    # later: conditional refetch against a fresh pages snapshot
    python jobs/crawl.py --pages /data/pages_new --update \
        --saved-out /data/mirror.parquet --mirror-out /data/mirror/
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datagen import webgen  # noqa: E402
from track0s.config import CrawlConfig  # noqa: E402
from track0s.robots import RobotsTable  # noqa: E402


PROFILES = {"sf-unit": webgen.SF_UNIT, "sf-correct": webgen.SF_CORRECT}


def _recover_parquet(path: str) -> bool:
    """Heal a torn _write_parquet_recoverable swap (ADVICE r2): a kill
    between ``os.replace(path, bak)`` and ``os.replace(tmp, path)``
    leaves the saved set only at ``path.bak`` (old, complete) and/or
    ``path.tmp`` (new, complete iff Spark's _SUCCESS marker exists).
    Prefer the NEW set when it finished, else fall back to the backup.
    Returns True if a recovery rename was performed."""
    if os.path.exists(path):
        return False
    tmp, bak = path + ".tmp", path + ".bak"
    if os.path.isdir(tmp) and os.path.exists(os.path.join(tmp, "_SUCCESS")):
        os.replace(tmp, path)
        print(f"[crawl] recovered saved set from interrupted write: {tmp}")
        return True
    if os.path.isdir(bak):
        os.replace(bak, path)
        print(f"[crawl] recovered saved set from backup: {bak}")
        return True
    return False


def _write_parquet_recoverable(df, path: str) -> None:
    """Write to path+'.tmp', back up the old set to path+'.bak', then
    swap. Directory swaps cannot be truly atomic on POSIX, but every
    kill window leaves a COMPLETE copy on disk: the old set at
    ``path`` or ``path.bak``, and/or the new one at ``path.tmp`` —
    never only a half-written directory (same torn-commit discipline
    as the checkpoint store, sources/snapshot.py; r2 review replaced
    an rmtree-then-rename sequence whose kill window left nothing)."""
    import shutil

    tmp, bak = path + ".tmp", path + ".bak"
    df.write.mode("overwrite").parquet(tmp)
    if os.path.exists(bak):
        shutil.rmtree(bak)
    if os.path.exists(path):
        os.replace(path, bak)
    os.replace(tmp, path)
    if os.path.exists(bak):
        shutil.rmtree(bak)


def _saved_set(loop, pages):
    """Durable mirror state: (url_canon, html, etag, last_modified) for
    every @save-admitted url, EXACTLY one row per url.

    Deliberately INNER-joins bodies (a mirror artifact cannot carry a
    page without bytes — ``CrawlLoop.saved_pages(pages)``'s LEFT join
    serves the log-inspection use instead) and dedups a multi-fetch
    pages snapshot to its latest row first, so the one-row-per-url
    MERGE precondition of later --update runs holds by construction."""
    from pyspark.sql import functions as F

    from track0_spark.operators.revisit import (
        latest_unique_pages,
        with_save_metadata,
    )

    log = loop.saved_pages()
    if log is None:
        return None
    saved = log.select("url_canon").join(
        latest_unique_pages(pages), "url_canon"
    )
    return with_save_metadata(saved)


def _materialize_files(
    spark, saved_df, out_dir: str, distributed: bool = False
) -> int:
    """Write the rewritten mirror as files under ``out_dir``.

    Default (driver) mode streams via toLocalIterator — one partition
    in memory at a time, never a full collect; right for local runs
    where only the driver sees the target filesystem. With
    ``distributed=True`` each PARTITION writes its own files
    executor-side (mapPartitions over a shared filesystem — the
    cluster-scale path, VERDICT r2 next #8): local_path is unique per
    url, so concurrent tasks never collide, and only per-partition
    counts return to the driver."""
    from track0_spark.operators.mirror import materialize_mirror

    handles: list = []
    mir = materialize_mirror(spark, saved_df, handles=handles)
    # Resolve the mirror root ON THE DRIVER and capture only the absolute
    # path in the closure (r3 ADVICE): executors re-resolving a relative
    # --mirror-out against their own cwd would scatter files into
    # executor-local dirs (or trip the escape check) on a real cluster.
    out_dir = os.path.abspath(out_dir)
    root = os.path.realpath(out_dir)

    def write_rows(rows) -> int:
        import os as _os

        n = 0
        for row in rows:
            p = _os.path.realpath(_os.path.join(out_dir, row["local_path"]))
            # belt-and-braces with mirror._safe_seg: never write outside
            # the mirror root, whatever a hostile URL decoded to
            if not p.startswith(root + _os.sep):
                raise ValueError(
                    f"mirror path escapes {out_dir!r}: {row['local_path']!r}"
                )
            _os.makedirs(_os.path.dirname(p), exist_ok=True)
            with open(p, "wb") as f:
                f.write(bytes(row["html"]))
            n += 1
        return n

    if distributed:
        n = (
            mir.select("local_path", "html")
            .rdd.mapPartitions(lambda rows: [write_rows(rows)])
            .sum()
        )
    else:
        n = write_rows(mir.toLocalIterator())
    for h in handles:
        h.unpersist()
    return n


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pages", help="pages parquet path (url,warc_ts,html,text,lang)")
    ap.add_argument(
        "--pages-warc",
        help="read the pages table from .warc.gz archives instead of "
        "parquet (dir / glob / file; sources/warc.py — the Common-Crawl "
        "interchange shape)",
    )
    ap.add_argument("--profile", choices=sorted(PROFILES), help="synthetic web profile")
    ap.add_argument("--seeds", nargs="*", default=None)
    ap.add_argument(
        "--robots-from-pages",
        action="store_true",
        help="build the robots table from /robots.txt documents archived "
        "in the pages table (RFC 9309 subset; sources/robots_txt.py)",
    )
    ap.add_argument(
        "--robots-agent",
        default="*",
        help="User-agent token for --robots-from-pages group selection",
    )
    ap.add_argument(
        "--seeds-from-sitemaps",
        action="store_true",
        help="expand seeds from sitemap.xml documents found in the pages "
        "archive (operators/sitemap.py), appended to any --seeds",
    )
    ap.add_argument("--follow", default="+original-domain -depth>3 +requisite")
    ap.add_argument("--save", default="")
    ap.add_argument("--stop", default="")
    ap.add_argument("--rounds", type=int, default=50)
    ap.add_argument("--budget", type=int, default=100)
    ap.add_argument(
        "--round-period", type=float, default=None,
        help="nominal seconds per BSP round: robots Crawl-delay caps a "
        "host's per-round budget at max(1, floor(period/delay))",
    )
    ap.add_argument(
        "--retry-max", type=int, default=None,
        help="transient-failure retries: pages answering the in-band "
        "503/Retry-After analog re-queue with attempts+1, up to this "
        "many additional attempts (default: retry tier off)",
    )
    ap.add_argument("--ckpt", default=None, help="checkpoint root (default: temp dir)")
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--salt", type=int, default=0, help="host-skew salt buckets (0=off)")
    ap.add_argument("--no-bloom", action="store_true", help="disable the bloom seen-gate")
    ap.add_argument(
        "--gate",
        choices=["bloom", "cuckoo", "bloom-colocated", "cuckoo-colocated"],
        default="bloom",
        help="approximate seen-gate structure: bloom (driver-held, "
        "fastest at local scale), cuckoo (deletable), bloom-colocated "
        "(bucket-partitioned storage gate, no whole-structure "
        "broadcast — the 100 TB shape), cuckoo-colocated (same "
        "storage shape, deletable)",
    )
    ap.add_argument(
        "--compact-every",
        type=int,
        default=0,
        help="compact the seen deltas every K rounds (0=off)",
    )
    ap.add_argument(
        "--partition-metrics",
        action="store_true",
        help="record per-partition frontier row counts in each round manifest",
    )
    ap.add_argument("--robots-parquet", default=None)
    ap.add_argument(
        "--psl",
        default=None,
        help="Public Suffix List file (publicsuffix.org dat format) for "
        "original-reg-domain; default: built-in frozen subset",
    )
    ap.add_argument("--head", type=int, default=10, help="crawl_log rows to print")
    ap.add_argument(
        "--saved-out",
        default=None,
        help="write the saved set (url_canon, html, etag, last_modified) as "
        "parquet — the durable mirror STATE the --update workflow merges "
        "into (track0 '--update' analog, SURVEY §2.1 S4)",
    )
    ap.add_argument(
        "--update",
        action="store_true",
        help="revisit mode: skip the crawl; conditional-refetch the existing "
        "--saved-out parquet against the current pages table (etag/"
        "last-modified MERGE, one row per url) and atomically replace it",
    )
    ap.add_argument(
        "--history",
        default=None,
        help="with --update: parquet dir accumulating one (url_canon, "
        "fetch_ts, etag) observation per checked url per run — the raw "
        "material the Cho & Garcia-Molina change-rate estimator "
        "(operators/revisit.recrawl_schedule) learns refetch intervals "
        "from",
    )
    ap.add_argument(
        "--due-only",
        action="store_true",
        help="with --update --history: conditional-refetch ONLY the urls "
        "whose estimated next change is due (due_at <= --as-of); "
        "everything else passes through untouched as refetch_status="
        "'deferred'. Never-changed and under-observed (<3 runs) urls are "
        "deferred too — they belong to the plain --update policy-floor "
        "sweep, never to a fabricated rate",
    )
    ap.add_argument(
        "--as-of",
        default=None,
        help="ISO timestamp for --due-only (default: the pages snapshot's "
        "max warc_ts — 'due as of the data I am holding')",
    )
    ap.add_argument(
        "--due-from-sitemaps",
        action="store_true",
        help="with --update: also refetch every saved url whose freshest "
        "sitemap <lastmod> in the pages snapshot is newer than its saved "
        "last_modified — the sitemaps protocol's change signal, usable "
        "from the first sweep (no history needed); everything not due by "
        "any enabled signal passes through as refetch_status='deferred'. "
        "Composes with --due-only (union of both due sets)",
    )
    ap.add_argument(
        "--forget",
        default=None,
        metavar="RULESPEC",
        help="selective seen-set FORGET mode (no crawl): remove every "
        "seen URL matched by this rule pipeline (e.g. "
        "'+domain=h1.example.test', '+url=*/static/*') from the "
        "checkpoint's seen state, so future link discoveries re-admit "
        "them — the staleness/recrawl primitive. Requires --ckpt. With "
        "--gate cuckoo-colocated the forgotten fingerprints are also "
        "deleted from the storage gate (distributed job, no rebuild); "
        "other gates keep them as harmless false positives until their "
        "next rebuild. Seed-relative tests (original-domain, down, ...) "
        "match nothing here.",
    )
    ap.add_argument(
        "--mirror-distributed",
        action="store_true",
        help="write mirror files executor-side (mapPartitions over a "
        "shared filesystem) instead of streaming through the driver",
    )
    ap.add_argument(
        "--mirror-out",
        default=None,
        help="materialize the mirror as local files under this directory "
        "(collision-free paths, links rewritten relative; streamed, never "
        "collected — local/shared-FS deployments; cluster jobs keep the "
        "--saved-out parquet as the artifact)",
    )
    args = ap.parse_args(argv)

    from track0_spark.session import build_spark
    from track0_spark.plans.loop import CrawlLoop
    from track0_spark.sources.pages import pages_from_rows, read_pages

    spark = build_spark(cores=args.cores, app_name="track0s-crawl")
    try:
        if args.forget is not None:
            # FORGET mode: no crawl — rewrite the seen state minus the
            # matched keys (snapshot.forget_seen docstring for the full
            # semantics + gate story)
            from track0s.rules import parse_pipeline
            from track0_spark.functions.rules_compile import compile_rules
            from track0_spark.sources.snapshot import SnapshotStore

            if not args.ckpt:
                ap.error("--forget requires --ckpt")
            store = SnapshotStore(spark, args.ckpt)
            latest = store.latest_round()
            if latest is None:
                ap.error(f"--forget: no committed rounds under {args.ckpt}")
            match = compile_rules(
                parse_pipeline(args.forget), False, [], []
            )
            meta = store.forget_seen(latest, match)
            out = {"forget": meta, "round": latest, "ckpt": args.ckpt}
            if args.gate == "cuckoo-colocated" and meta["forgotten"]:
                from track0_spark.operators.cuckoo_colocated import (
                    ColocatedCuckooGate,
                )

                gate = ColocatedCuckooGate(spark, args.ckpt)
                gate.ensure(latest)
                out["gate_fingerprints_deleted"] = gate.delete_distributed(
                    store.load_forgotten(latest), upto=latest
                )
            print(json.dumps(out))
            return 0
        robots = RobotsTable(default_budget=args.budget)
        if args.profile:
            prof = PROFILES[args.profile]
            pages = pages_from_rows(spark, webgen.gen_pages(prof))
            seeds = args.seeds or webgen.SEEDS
            if args.robots_parquet is None:
                robots = RobotsTable.from_rows(
                    webgen.gen_robots_rows(prof), default_budget=args.budget
                )
        elif args.pages or args.pages_warc:
            if args.pages:
                pages = read_pages(spark, args.pages)
            else:
                from track0_spark.sources.warc import read_warc

                pages = read_warc(spark, args.pages_warc)
            if not args.seeds and not args.update and not args.seeds_from_sitemaps:
                ap.error(
                    "--seeds or --seeds-from-sitemaps required with "
                    "--pages / --pages-warc"
                )
            seeds = args.seeds
        else:
            ap.error("one of --pages / --pages-warc / --profile required")
        if args.seeds_from_sitemaps:
            from track0_spark.operators.sitemap import sitemap_seeds

            seeds = sorted(
                r["seed_url"]
                for r in sitemap_seeds(pages).select("seed_url").collect()
            ) + list(seeds or [])
            if not seeds and not args.update:
                ap.error("no sitemap seeds found in the pages archive")
            print(f"[crawl] {len(seeds)} seeds (incl. sitemap expansion)")
        # politeness artifacts stay STORAGE-RESIDENT (ADVICE r4 medium):
        # the per-host rows are handed to the round plan as a DataFrame
        # and never collected — at the 10^8-host design point a driver
        # dict would OOM. The sequential oracle (tests) reads the same
        # parquet via RobotsTable.from_parquet, so parity holds by
        # construction.
        robots_df = None
        if args.robots_parquet:
            robots_df = spark.read.parquet(args.robots_parquet)
        elif args.robots_from_pages:
            from track0_spark.sources.robots_txt import robots_rows_from_pages

            robots_path = os.path.join(
                args.ckpt or tempfile.mkdtemp(prefix="track0s-robots-"),
                "robots_from_pages.parquet",
            )
            robots_rows_from_pages(pages, agent=args.robots_agent).write.mode(
                "overwrite"
            ).parquet(robots_path)
            robots_df = spark.read.parquet(robots_path)
            print(
                "[crawl] robots table from archive: "
                f"{robots_df.count()} hosts -> {robots_path}"
            )

        if args.update:
            # S4 revisit: no crawl — conditional-refetch MERGE of the
            # existing saved set against the current pages snapshot
            from pyspark.sql import functions as F

            from track0_spark.operators.revisit import revisit_merge

            if args.saved_out:
                _recover_parquet(args.saved_out)
            if not args.saved_out or not os.path.exists(args.saved_out):
                ap.error(
                    "--update requires an existing --saved-out parquet "
                    "(auto-recovery from .tmp/.bak found nothing)"
                )
            prev = spark.read.parquet(args.saved_out)
            hist_dir = os.path.abspath(args.history) if args.history else None
            checked = prev
            deferred = None
            due_parts = []
            if args.due_only:
                # Cho & Garcia-Molina scheduling: refetch only what the
                # accumulated history says is due; defer the rest
                import datetime as _dt

                from track0_spark.operators.revisit import (
                    due_urls,
                    recrawl_schedule,
                )

                if not hist_dir or not os.path.exists(hist_dir):
                    ap.error("--due-only requires an existing --history dir")
                history = spark.read.parquet(hist_dir)
                if args.as_of:
                    as_of = _dt.datetime.fromisoformat(args.as_of)
                else:
                    as_of = pages.agg(
                        F.max(F.col("warc_ts").cast("timestamp"))
                    ).collect()[0][0]
                due_parts.append(
                    due_urls(recrawl_schedule(history), as_of)
                    .select("url_canon")
                )
            if args.due_from_sitemaps:
                # the sitemaps protocol's change signal: a listed url
                # whose freshest <lastmod> postdates the saved copy.
                # <loc> values are raw; the saved set is canonical —
                # canonicalize through the engine's own Arrow stage
                # (tiny table: one row per sitemap-listed url) or the
                # join silently misses every non-fixpoint loc
                from track0_spark.functions.udfs import canon_batches
                from track0_spark.operators.sitemap import sitemap_lastmod

                lm = sitemap_lastmod(pages)
                lm = (
                    lm.mapInPandas(
                        canon_batches, "url string, url_canon string"
                    ).join(lm, "url")
                    .groupBy("url_canon")
                    .agg(F.max("lastmod").alias("lastmod"))
                )
                due_parts.append(
                    prev.select("url_canon", "last_modified")
                    .join(lm, "url_canon")
                    .filter(
                        F.col("lastmod")
                        > F.col("last_modified").cast("timestamp")
                    )
                    .select("url_canon")
                )
            if due_parts:
                due = due_parts[0]
                for p in due_parts[1:]:
                    due = due.unionByName(p)
                due = (
                    due.distinct()
                    # PIN the due set (cut lineage to hist_dir): this
                    # run appends its own observations to the history
                    # below, and Spark recaches/recomputes any plan
                    # reading a path that was written to — without the
                    # checkpoint the saved-set write would re-derive
                    # `due` AGAINST THE NEW OBSERVATIONS and silently
                    # write the pre-merge bytes back (caught by
                    # test_cli_recrawl). Semantically the pin is
                    # required anyway: a sweep's refetch decision must
                    # be a pure function of the history it STARTED with.
                    .localCheckpoint()
                )
                # no broadcast: at 10^10 urls the due set is itself a
                # big table — shuffle-hash both membership joins
                due = due.hint("SHUFFLE_HASH")
                checked = prev.join(due, "url_canon", "left_semi")
                deferred = prev.join(
                    due, "url_canon", "left_anti"
                ).withColumn("refetch_status", F.lit("deferred"))
            # persist: the counts collect and the parquet write would
            # otherwise each execute the full merge (md5 over every
            # body, latest-pick aggregates, join)
            merged = revisit_merge(checked, pages)
            if deferred is not None:
                merged = merged.unionByName(deferred)
            merged = merged.persist()
            counts = {
                r["refetch_status"]: r["n"]
                for r in merged.groupBy("refetch_status")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            if hist_dir:
                # one observation per CHECKED url (deferred urls were
                # not looked at — recording them would teach the
                # estimator a change rate from data it never saw).
                # MUST run before the saved-out swap below: `checked`
                # lazily reads the files the swap replaces. Crash
                # window (history appended, swap failed, run retried):
                # one duplicated (url, ts, etag) observation — the lag
                # detector reads it as a zero-gap non-change, which
                # only dampens the estimated rate, never fabricates a
                # change.
                from track0_spark.operators.revisit import history_delta

                history_delta(checked, pages).write.mode("append").parquet(
                    hist_dir
                )
            _write_parquet_recoverable(
                merged.select("url_canon", "html", "etag", "last_modified"),
                args.saved_out,
            )
            merged.unpersist()
            out = {"update": counts, "saved_out": args.saved_out}
            if hist_dir:
                out["history"] = hist_dir
            if args.mirror_out:
                out["mirror_files"] = _materialize_files(
                    spark,
                    spark.read.parquet(args.saved_out),
                    args.mirror_out,
                    distributed=args.mirror_distributed,
                )
                out["mirror_out"] = args.mirror_out
            print(json.dumps(out))
            return 0

        cfg = CrawlConfig.from_specs(
            seeds,
            follow=args.follow,
            save=args.save,
            stop=args.stop,
            robots=robots,
            default_budget=args.budget,
            max_rounds=args.rounds,
            psl_path=args.psl,
            round_period_s=args.round_period,
            retry_max=args.retry_max,
        )
        ckpt = args.ckpt or tempfile.mkdtemp(prefix="track0s-ckpt-")
        loop = CrawlLoop(
            spark,
            cfg,
            pages,
            ckpt,
            salt=args.salt,
            bloom=not args.no_bloom,
            gate=args.gate,
            partition_metrics=args.partition_metrics,
            compact_every=args.compact_every,
            robots_df=robots_df,
        )
        summary = loop.run()
        out = {
            "rounds": summary.rounds,
            "fetched": summary.fetched,
            "seen": summary.seen,
            "frontier_pending": summary.frontier_pending,
            "wall_s": summary.wall_s,
            "ckpt": ckpt,
        }
        if args.saved_out or args.mirror_out:
            saved = _saved_set(loop, pages)
            if saved is not None:
                if args.saved_out:
                    _write_parquet_recoverable(saved, args.saved_out)
                    out["saved_out"] = args.saved_out
                    # materialize from the just-written parquet — the
                    # saved-set plan (crawl-log join + md5) runs once
                    saved = spark.read.parquet(args.saved_out)
                if args.mirror_out:
                    out["mirror_files"] = _materialize_files(
                        spark, saved, args.mirror_out,
                        distributed=args.mirror_distributed,
                    )
                    out["mirror_out"] = args.mirror_out
        print(json.dumps(out))
        log = loop.crawl_log()
        if log is not None and args.head:
            for row in log.orderBy("round", "fetch_seq").limit(args.head).collect():
                print(
                    f"  r{row['round']:>3} seq{row['fetch_seq']:>5} "
                    f"{row['status']} d{row['depth']} {row['url_canon']}"
                )
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
