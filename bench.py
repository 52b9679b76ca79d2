"""Benchmark harness — prints ONE JSON line for the driver.

Two parts:
  1. **Crawl bench** (the headline): run the distributed crawl on the
     deterministic sf-bench synthetic web at TWO parallelism levels —
     local[N_LOW] and local[N_HIGH] (default 8 and 32) — same input,
     same rounds, and report URLs fetched+deduped/sec at each plus the
     scaling efficiency (thr_high/thr_low)/(high/low). This is the
     sandbox evidence for the two-cluster-size criterion
     (BASELINE.json north_rule; no real cluster here — BASELINE.md).
  2. **Contract queries** at $SPARK_GRAFT_SF_DIR (default
     /root/testdata/sf0.1): per-query wall seconds.

Writes BENCH/BASELINE.md as a side effect. Env knobs:
  SPARK_GRAFT_SF_DIR   contract-query scale dir     (default sf0.1)
  SPARK_GRAFT_CPUS     high parallelism level       (default 32)
  SPARK_GRAFT_BENCH_QUICK=1  tiny web + 1 level     (smoke mode)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datagen import webgen  # noqa: E402
from track0s.config import CrawlConfig  # noqa: E402
from track0s.robots import RobotsTable  # noqa: E402

BENCH_ROUNDS = 5
BENCH_BUDGET = 3000
BENCH_SEEDS_PER_HOST = 3


def bench_cfg(profile: webgen.WebProfile) -> CrawlConfig:
    sizes = webgen.host_sizes(profile)
    seeds = [
        webgen.page_url(i, j)
        for i in range(profile.hosts)
        for j in range(min(BENCH_SEEDS_PER_HOST, sizes[i]))
    ]
    return CrawlConfig.from_specs(
        seeds,
        follow="+domain=*.example.test -depth>12",
        robots=RobotsTable(default_budget=BENCH_BUDGET),
        default_budget=BENCH_BUDGET,
        max_rounds=BENCH_ROUNDS,
    )


def run_crawl(cores: int, pages_path: str, profile: webgen.WebProfile, salt: int):
    from track0_spark.session import build_spark
    from track0_spark.plans.loop import CrawlLoop
    from track0_spark.sources.pages import read_pages

    spark = build_spark(
        cores=cores, app_name=f"bench-crawl-{cores}", driver_memory="24g"
    )
    ckpt = tempfile.mkdtemp(prefix=f"bench-ckpt-{cores}-")
    try:
        pages = read_pages(spark, pages_path)
        loop = CrawlLoop(
            spark, bench_cfg(profile), pages, ckpt, salt=salt, partition_metrics=False
        )
        t0 = time.time()
        summary = loop.run(max_rounds=BENCH_ROUNDS)
        wall = time.time() - t0
        return {
            "cores": cores,
            "fetched": summary.fetched,
            "seen": summary.seen,
            "rounds": summary.rounds,
            "wall_s": round(wall, 2),
            "urls_per_sec": round(summary.fetched / wall, 1),
            "urls_per_sec_per_core": round(summary.fetched / wall / cores, 2),
        }
    finally:
        spark.stop()
        shutil.rmtree(ckpt, ignore_errors=True)


def run_queries(sf_dir: str, cores: int) -> dict:
    from track0_spark.session import build_spark
    from track0_spark import contract

    spark = build_spark(cores=cores, app_name="bench-queries", driver_memory="24g")
    try:
        out = {}
        for name, fn in contract.queries().items():
            t0 = time.time()
            df = fn(spark, sf_dir)
            n = df.count()
            out[name] = round(time.time() - t0, 3)
            _ = n
        return out
    finally:
        spark.stop()


def write_baseline_md(crawl_results: list[dict], eff: float | None, profile) -> None:
    os.makedirs("BENCH", exist_ok=True)
    lines = [
        "# BENCH/BASELINE.md — measured numbers (same job, same input, two parallelism levels)",
        "",
        f"Input: deterministic synthetic web `{profile.name}` — "
        f"{profile.pages} pages / {profile.hosts} zipf-skewed hosts "
        f"(datagen/webgen.py, seed=42, fixture v{webgen.FIXTURE_VERSION}); "
        f"budget {BENCH_BUDGET}/host/round, {BENCH_ROUNDS} rounds.",
        "",
        "| cores | rounds | URLs fetched | wall s | URLs/s | URLs/s/core |",
        "|---|---|---|---|---|---|",
    ]
    for r in crawl_results:
        lines.append(
            f"| local[{r['cores']}] | {r['rounds']} | {r['fetched']} | "
            f"{r['wall_s']} | {r['urls_per_sec']} | {r['urls_per_sec_per_core']} |"
        )
    if eff is not None:
        lo, hi = crawl_results[0], crawl_results[-1]
        lines += [
            "",
            f"**Scaling efficiency** (north_rule two-cluster-size criterion, "
            f"sandbox form): (thr[{hi['cores']}]/thr[{lo['cores']}]) / "
            f"({hi['cores']}/{lo['cores']}) = **{eff:.3f}** (target ≥ 0.8).",
        ]
    with open("BENCH/BASELINE.md", "w") as f:
        f.write("\n".join(lines) + "\n")


def main() -> int:
    quick = os.environ.get("SPARK_GRAFT_BENCH_QUICK") == "1"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    hi = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    lo = int(os.environ.get("SPARK_GRAFT_CPUS_LOW", "8"))
    profile = (
        webgen.WebProfile("sf-bench-quick", 20, 4000, n_words=40, max_links=6)
        if quick
        else webgen.SF_BENCH
    )
    t_total = time.time()

    # generate (cached) the bench web with a throwaway big session
    from track0_spark.session import build_spark
    from track0_spark.sources.webgen_spark import ensure_bench_web

    spark = build_spark(cores=hi, app_name="bench-gen", driver_memory="24g")
    try:
        pages_path = ensure_bench_web(spark, profile)
    finally:
        spark.stop()

    levels = [hi] if quick else [lo, hi]
    crawl_results = [run_crawl(c, pages_path, profile, salt=0) for c in levels]
    eff = None
    if len(crawl_results) == 2:
        r_lo, r_hi = crawl_results
        eff = round(
            (r_hi["urls_per_sec"] / r_lo["urls_per_sec"]) / (r_hi["cores"] / r_lo["cores"]),
            3,
        )
    write_baseline_md(crawl_results, eff, profile)

    queries = run_queries(sf_dir, hi)

    result = {
        "metric": "crawl_urls_per_sec",
        "value": crawl_results[-1]["urls_per_sec"],
        "unit": "sec",
        "queries": queries,
        "sf": float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else None,
        "crawl": {
            "levels": crawl_results,
            "scaling_efficiency": eff,
            "pages": profile.pages,
            "hosts": profile.hosts,
        },
        "total_wall_s": round(time.time() - t_total, 1),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
