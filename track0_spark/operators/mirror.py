"""Distributed mirror materialization: saved pages -> (local_path,
rewritten html) rows, links between saved pages rewritten to relative
mirror paths (SURVEY.md §2.5 E4, §2.1 S3).

The url->path index of the whole mirror is broadcast (paths are tiny:
~60 B/url; a 10^7-page mirror is ~600 MB — beyond that the rewrite
becomes a join of exploded links against the index with a regroup,
same semantics). The rewrite itself is the shared pure function in
``track0s/mirror.py``, run in one Arrow pass.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from track0s.mirror import local_path_for, rewrite_links


def mirror_index(saved: DataFrame) -> DataFrame:
    """(url_canon) -> (url_canon, local_path) via a tiny pandas UDF-free
    pass: path mapping is pure string work but needs Python (urlsplit);
    one vectorized crossing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "url_canon": pdf["url_canon"],
                    "local_path": [local_path_for(u) for u in pdf["url_canon"]],
                }
            )

    return saved.select("url_canon").mapInPandas(
        run, "url_canon string, local_path string"
    )


def materialize_mirror(spark, saved_pages: DataFrame) -> DataFrame:
    """saved_pages (url_canon, html) -> (url_canon, local_path, html
    rewritten). Deterministic: same mirror set -> same bytes."""
    index_rows = mirror_index(saved_pages).collect()
    paths = {r["url_canon"]: r["local_path"] for r in index_rows}
    bc = spark.sparkContext.broadcast(paths)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mp = bc.value
        for pdf in batches:
            out_html = [
                rewrite_links(u, bytes(h), mp)
                for u, h in zip(pdf["url_canon"], pdf["html"])
            ]
            yield pd.DataFrame(
                {
                    "url_canon": pdf["url_canon"],
                    "local_path": [mp[u] for u in pdf["url_canon"]],
                    "html": out_html,
                }
            )

    return saved_pages.select("url_canon", "html").mapInPandas(
        run, "url_canon string, local_path string, html binary"
    )
