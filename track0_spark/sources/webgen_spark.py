"""Distributed synthetic-web generation (bench scale) via mapInPandas.

Same per-page pure function as ``datagen.webgen`` (seed-42, zero RNG
state), fanned out over executors: page ids -> Arrow batches -> rows.
At the 10^6-page bench profile this is seconds instead of CPU-minutes;
the same job shape generates the 10^10-URL production design point on a
real cluster. Output parquet is cached keyed by (fixture version,
profile) — see ``ensure_bench_web``.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd

from datagen import webgen

from ..schemas import PAGES


def _gen_factory(profile: webgen.WebProfile, sizes: list[int]):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                webgen.page_row(int(hi), int(pj), sizes, profile)
                for hi, pj in zip(pdf["host_idx"], pdf["page_idx"])
            ]
            out = pd.DataFrame(rows)
            out["warc_ts"] = pd.to_datetime(out["warc_ts"], unit="s")
            yield out[["url", "warc_ts", "html", "text", "lang"]]

    return gen


def write_web_parquet(
    spark, profile: webgen.WebProfile, out_path: str, partitions: int = 64
) -> None:
    sizes = webgen.host_sizes(profile)
    ids = list(webgen.iter_page_ids(profile))
    df = spark.createDataFrame(ids, "host_idx int, page_idx int").repartition(
        partitions
    )
    pages = df.mapInPandas(_gen_factory(profile, sizes), PAGES)
    pages.write.mode("overwrite").parquet(out_path)


def ensure_bench_web(
    spark, profile: webgen.WebProfile, cache_root: str = "data"
) -> str:
    """Generate-once cache: data/web_<name>_v<ver>_<pages>.parquet"""
    path = os.path.join(
        cache_root,
        f"web_{profile.name}_v{webgen.FIXTURE_VERSION}_{profile.pages}.parquet",
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        write_web_parquet(spark, profile, path)
    return path
