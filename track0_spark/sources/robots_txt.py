"""Robots ingestion from the pages archive (SURVEY §2.6 P3 source
side): a real crawler bootstraps politeness from the ``/robots.txt``
documents it fetched, not from hand-written config.  This source
turns every archived robots.txt into the engine's robots-table rows —
the same ``(host, disallow_prefixes, crawl_delay_s, budget_per_round,
allow_prefixes)`` schema ``--robots-parquet`` reads, parsed by the
SHARED ``track0s.robots.parse_robots_txt`` (RFC 9309 subset), so the
oracle spider and the Spark plan see byte-identical policy.

Scale shape: the ``url rlike`` filter prunes the archive scan to ~1
row per host before ``html`` is decoded; parsing is an Arrow-batched
mapInPandas over that host-cardinality slice.  The resulting table is
host-sized (tiny next to the frontier) — it broadcasts into the
politeness join exactly like every other robots source.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F

ROBOTS_URL_RE = r"^[a-z][a-z0-9+.-]*://[^/?#]+/robots\.txt$"

ROWS_SCHEMA = (
    "host string, disallow_prefixes array<string>, crawl_delay_s double, "
    "budget_per_round int, allow_prefixes array<string>"
)


def robots_rows_from_pages(
    pages: DataFrame, agent: str = "*"
) -> DataFrame:
    """Archived ``/robots.txt`` documents -> robots-table rows.

    ``budget_per_round`` is left NULL (the crawl config's default
    applies); ``crawl_delay_s`` carries the parsed Crawl-delay for the
    caller's budget mapping.  Duplicate captures of one host's
    robots.txt dedup to the latest ``warc_ts`` (the conditional-
    refetch convention, operators/revisit.py).
    """
    from pyspark.sql import Window

    cand = pages.filter(F.col("url").rlike(ROBOTS_URL_RE))
    # deterministic even when two captures share a timestamp: body
    # hash breaks the tie (same discipline as every ordering in the
    # engine — no nondeterministic row wins anywhere)
    w = Window.partitionBy("url").orderBy(
        F.col("warc_ts").desc(), F.xxhash64("html").asc()
    )
    cand = (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("url", "html")
    )

    def _parse(batches) -> Iterator:
        import pandas as pd

        from track0s.canon import host_of
        from track0s.robots import parse_robots_txt

        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                host = host_of(url)
                if not host:
                    continue
                body = (bytes(html) if html is not None else b"").decode(
                    "utf-8", "replace"
                )
                allow, dis, delay = parse_robots_txt(body, agent)
                rows.append((host, list(dis), float(delay), None, list(allow)))
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "host",
                        "disallow_prefixes",
                        "crawl_delay_s",
                        "budget_per_round",
                        "allow_prefixes",
                    ],
                )

    return cand.mapInPandas(_parse, schema=ROWS_SCHEMA)


def robots_table_rows(pages: DataFrame, agent: str = "*") -> list[tuple]:
    """Collected ``RobotsTable.from_rows`` rows — ORACLE/TEST TIER ONLY
    (ADVICE r4 medium): the single-process reference spider needs the
    table in memory by definition, so tests use this to hand it the
    same rows the engine sees. The Spark engine itself must NOT call
    this — the crawl CLI writes ``robots_rows_from_pages`` to parquet
    and passes the DataFrame straight to ``RoundPlanner(robots_df=...)``
    (never collected; 10^8-host safe)."""
    return [
        (
            r["host"],
            list(r["disallow_prefixes"] or []),
            r["crawl_delay_s"],
            r["budget_per_round"],
            list(r["allow_prefixes"] or []),
        )
        for r in robots_rows_from_pages(pages, agent).collect()
    ]
