"""pages table source helpers (Common-Crawl-shaped; BASELINE.json:15).

Production: an Iceberg table bucketed by ``pmod(xxhash64(url), P)`` so
the fetch join and seen anti-join are storage-partitioned (SURVEY.md
§4). Sandbox: plain parquet; AQE + runtime Bloom filters stand in.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession

from ..schemas import PAGES


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(PAGES).parquet(path)


def pages_from_rows(spark: SparkSession, rows: list[dict]) -> DataFrame:
    """In-memory pages DF from datagen.webgen row dicts (tests/sf-unit)."""
    data = [
        (
            r["url"],
            dt.datetime.fromtimestamp(r["warc_ts"], dt.timezone.utc).replace(
                tzinfo=None
            ),
            r["html"],
            r["text"],
            r["lang"],
        )
        for r in rows
    ]
    return spark.createDataFrame(data, schema=PAGES)
