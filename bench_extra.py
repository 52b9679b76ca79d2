"""Round-6 optimization measurement harness (bench.py is FROZEN for the
driver; this file holds the extra instrumentation the optimization
round needs — guide §1: noop-sink isolation, min-of-N warm trials,
plan capture).

Usage:
  python bench_extra.py [q29_cosine_near_dup ...]    # time queries
  python bench_extra.py --explain [tag] [queries...] # dump plans/r06/<q>_<tag>.txt
  python bench_extra.py --noop [queries...]          # noop sink instead of count

Env:
  SPARK_GRAFT_SF_DIR  (default /root/testdata/sf1.0 — the driver's r5 sf)
  SPARK_GRAFT_CPUS    (default 32)
  BENCH_EXTRA_TRIALS  warm trials per query (default 3)

Timing method matches the frozen bench (run_queries): fn(spark, sf).count()
— except under --noop, which forces every column (guide §1.4).
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def grab_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    out = []
    for line in buf.getvalue().splitlines():
        if len(line) > 400:
            line = line[:400] + " … [literal array elided]"
        out.append(line)
    return "\n".join(out)


def main() -> int:
    from track0_spark import contract
    from track0_spark.session import build_spark

    args = sys.argv[1:]
    explain = False
    noop = False
    tag = "before"
    if args and args[0] == "--explain":
        explain = True
        args = args[1:]
        if args and args[0] in ("before", "after"):
            tag = args[0]
            args = args[1:]
    elif args and args[0] == "--noop":
        noop = True
        args = args[1:]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    trials = int(os.environ.get("BENCH_EXTRA_TRIALS", "3"))
    qs = contract.queries()
    names = args if args else list(qs)
    for n in names:
        if n not in qs:
            print(f"unknown query {n}", file=sys.stderr)
            return 2

    spark = build_spark(cores=cores, app_name="bench-extra", driver_memory="24g")
    try:
        if explain:
            os.makedirs("plans/r06", exist_ok=True)
            for name in names:
                df = qs[name](spark, sf_dir)
                path = f"plans/r06/{name}_{tag}.txt"
                with open(path, "w") as f:
                    f.write(grab_plan(df))
                print(f"wrote {path}")
            return 0
        out = {}
        for name in names:
            spark.sparkContext.setJobDescription(name)
            times = []
            for t in range(trials + 1):  # +1 cold
                t0 = time.time()
                if noop:
                    qs[name](spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                else:
                    qs[name](spark, sf_dir).count()
                times.append(round(time.time() - t0, 3))
            out[name] = {
                "cold": times[0],
                "warm_min": min(times[1:]),
                "all": times,
            }
            print(name, json.dumps(out[name]), flush=True)
        print(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "cores": cores,
                    "trials": trials,
                    "mode": "noop" if noop else "count",
                    "queries": {k: v["warm_min"] for k, v in out.items()},
                }
            )
        )
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
