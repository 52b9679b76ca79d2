"""Template-page / soft-404 detection over the crawl archive.

A "soft 404" is an error or placeholder page served with HTTP 200:
thousands of distinct URLs on one host answering with byte-identical
"not found" / "login required" / parked-domain boilerplate. They
poison both the frontier (every one is a fresh "successful" fetch
whose links are usually navigation loops) and the training corpus
(massive exact-duplicate mass concentrated per host). The standard
archive-side detector — used here — is per-host content-fingerprint
clustering: any text fingerprint shared by >= ``min_urls`` DISTINCT
URLs of the same host marks all of those URLs as template pages
(Bar-Yossef et al., "Sic transit gloria telae", WWW 2004 — the
'soft-404 by duplicate content' observation).

Scale shape: one projection of (url, host, xxhash64(text)) — the text
itself never shuffles — then a single hash-partition on (host, fp)
where a window count produces the cluster size; no join, no second
scan, no broadcast, no driver state. Host-level skew is bounded: the
window key includes the fingerprint, so even a host with 10^7 pages
splits across its distinct fingerprints; the pathological case (one
fingerprint on 10^7 URLs) is exactly the cluster the detector exists
to find, and AQE skew handling covers it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def soft404_candidates(
    pages: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    min_urls: int = 3,
) -> DataFrame:
    """Flag URLs whose extracted text is shared by >= ``min_urls``
    distinct URLs on the same host.

    Returns (url, host, n_urls_same_text) for flagged URLs only.
    Assumes one row per URL (a deduplicated archive snapshot — the
    shape every engine source here produces); revisit logs must be
    reduced to latest-per-URL first, or equal-text revisits of one
    URL would count as a cluster.
    """
    d = pages.select(
        F.col(url_col).alias("url"),
        F.expr(f"parse_url({url_col}, 'HOST')").alias("host"),
        F.xxhash64(text_col).alias("fp"),
    )
    w = Window.partitionBy("host", "fp")
    return (
        d.withColumn(
            "n_urls_same_text", F.count(F.lit(1)).over(w).cast("bigint")
        )
        .filter(F.col("n_urls_same_text") >= min_urls)
        .select("url", "host", "n_urls_same_text")
    )
