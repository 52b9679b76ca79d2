"""Instrumented probe for the local[32] round-1 wall anomaly
(VERDICT r4 "Next round" #6; BENCH/BASELINE.md: 12.1/8.0/7.0/12.2 s at
8/16/24/32 threads, swinging to 27 s across runs).

Runs the SAME bench round-1 (warm JVM: 1 warm-up round first, exactly
as bench.py does) at several executor-thread counts, several trials
each, with the Spark event log enabled, then decomposes the timed
round's wall into:

- ``run``     sum of executorRunTime (real work, all tasks)
- ``gc``      sum of jvmGCTime inside that
- ``sched``   sum of per-task scheduler delay
              ((finish-launch) - run - deserialize - resultSer)
- ``driver``  wall not covered by any running task = driver/py4j/plan
              time (computed from the union of task [launch, finish]
              intervals vs the round wall)
- ``tasks``   task count (round-1 runs MANY small jobs; the anomaly
              hypothesis space is GC vs scheduling vs driver
              starvation)

Usage: python tools/profile_round1.py [threads ...] (default 24 30 32),
``PROFILE_TRIALS`` env for trials per level (default 3),
``PROFILE_QUICK=1`` to use the 4k-page quick web (smoke only — the
anomaly needs the 3M-page sf-bench web).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datagen import webgen  # noqa: E402
import bench  # noqa: E402


def parse_eventlog(d: str, min_launch_ms: float = 0.0) -> dict:
    """Aggregate task metrics from every event-log file in ``d``,
    keeping only tasks launched at/after ``min_launch_ms`` (epoch ms) —
    the log is finalized at spark.stop(), so the warm-up round is
    excluded by timestamp, not by truncation."""
    run = gc = sched = deser = 0.0
    tasks = 0
    intervals: list[tuple[float, float]] = []
    paths = []
    for root, _dirs, files in os.walk(d):
        paths += [
            os.path.join(root, f)
            for f in files
            if not f.startswith("appstatus")
        ]
    for path in paths:
        with open(path) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") != "SparkListenerTaskEnd":
                    continue
                ti = ev.get("Task Info") or {}
                tm = ev.get("Task Metrics") or {}
                if not tm or ti.get("Failed"):
                    continue
                launch, finish = ti["Launch Time"], ti["Finish Time"]
                if launch < min_launch_ms:
                    continue
                r = tm.get("Executor Run Time", 0)
                de = tm.get("Executor Deserialize Time", 0)
                rs = tm.get("Result Serialization Time", 0)
                run += r
                gc += tm.get("JVM GC Time", 0)
                deser += de
                sched += max(0, (finish - launch) - r - de - rs)
                tasks += 1
                intervals.append((launch / 1000.0, finish / 1000.0))
    # wall time covered by >=1 running task (union of intervals)
    covered = 0.0
    for s, e in sorted(intervals):
        if not covered:
            cs, ce, covered = s, e, e - s
            continue
        if s > ce:
            covered += e - s
            cs, ce = s, e
        elif e > ce:
            covered += e - ce
            ce = e
    return {
        "tasks": tasks,
        "run_s": round(run / 1000, 2),
        "gc_s": round(gc / 1000, 2),
        "deser_s": round(deser / 1000, 2),
        "sched_delay_s": round(sched / 1000, 2),
        "covered_s": round(covered, 2),
    }


def one_trial(threads: int, pages_path: str, profile) -> dict:
    from track0_spark.plans.loop import CrawlLoop
    from track0_spark.session import build_crawl_spark
    from track0_spark.sources.pages import read_pages

    evdir = tempfile.mkdtemp(prefix=f"prof-ev-{threads}-")
    spark = build_crawl_spark(
        cores=threads,
        app_name=f"profile-r1-{threads}",
        driver_memory="48g",
        extra={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
            "spark.eventLog.compress": "false",
        },
    )
    try:
        pages = read_pages(spark, pages_path)
        warm = tempfile.mkdtemp(prefix="prof-warm-")
        CrawlLoop(spark, bench.bench_cfg(profile), pages, warm).run(
            max_rounds=1
        )
        shutil.rmtree(warm, ignore_errors=True)
        t_mark_ms = time.time() * 1000  # timed round starts after this
        ckpt = tempfile.mkdtemp(prefix="prof-ckpt-")
        st0, tt0 = bench.read_steal()
        t0 = time.time()
        CrawlLoop(spark, bench.bench_cfg(profile), pages, ckpt).run(
            max_rounds=1
        )
        wall = time.time() - t0
        st1, tt1 = bench.read_steal()
        shutil.rmtree(ckpt, ignore_errors=True)
    finally:
        spark.stop()
    m = parse_eventlog(evdir, min_launch_ms=t_mark_ms)
    shutil.rmtree(evdir, ignore_errors=True)
    m.update(
        threads=threads,
        wall_s=round(wall, 2),
        driver_gap_s=round(wall - m.pop("covered_s"), 2),
        steal_pct=round(100.0 * (st1 - st0) / max(tt1 - tt0, 1), 2),
        cpu_s_avail=round(wall * threads, 1),
    )
    return m


def main() -> int:
    quick = os.environ.get("PROFILE_QUICK") == "1"
    profile = (
        webgen.WebProfile("sf-bench-quick", 20, 4000, n_words=40, max_links=6)
        if quick
        else webgen.SF_BENCH
    )
    from datagen.webgen import FIXTURE_VERSION

    pages_path = os.path.join(
        "data", f"web_{profile.name}_v{FIXTURE_VERSION}_{profile.pages}.parquet"
    )
    if not os.path.exists(os.path.join(pages_path, "_SUCCESS")):
        raise SystemExit(f"bench web not cached at {pages_path}; run bench.py")
    levels = [int(a) for a in sys.argv[1:]] or [24, 30, 32]
    trials = int(os.environ.get("PROFILE_TRIALS", "3"))
    out = []
    for t in range(trials):
        for lvl in levels:  # interleaved, like the bench pairs
            m = one_trial(lvl, pages_path, profile)
            m["trial"] = t
            out.append(m)
            print(json.dumps(m), flush=True)
    print(json.dumps({"profile_round1": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
