"""Structured Streaming ingest tests: incremental, checkpointed,
byte-identical to the batch parser (SURVEY.md §3.4 companion)."""

import os

from datagen import webgen
from track0_spark.sources.pages import pages_from_rows
from track0_spark.streaming import ingest


def write_batch(spark, rows, landing, name):
    pages_from_rows(spark, rows).coalesce(1).write.mode("append").parquet(landing)


def test_incremental_text_extraction(spark, tmp_path):
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    rows = webgen.gen_pages(webgen.SF_UNIT)

    # batch 1 lands -> drain
    write_batch(spark, rows[:120], landing, "b1")
    stream = ingest.text_extraction_stream(ingest.stream_pages(spark, landing))
    ingest.run_available_now(stream, out, ckpt)
    n1 = spark.read.parquet(out).count()
    assert n1 == 120

    # batch 2 lands -> drain again: ONLY the new files are processed
    write_batch(spark, rows[120:], landing, "b2")
    stream = ingest.text_extraction_stream(ingest.stream_pages(spark, landing))
    ingest.run_available_now(stream, out, ckpt)
    got = {r["url"]: r["text"] for r in spark.read.parquet(out).collect()}
    assert len(got) == len(rows)
    for row in rows:  # byte-identical to generator ground truth
        assert got[row["url"]] == row["text"]


def test_link_extraction_stream(spark, tmp_path):
    landing = str(tmp_path / "landing2")
    out = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")
    rows = webgen.gen_pages(webgen.SF_UNIT)[:50]
    write_batch(spark, rows, landing, "b1")
    stream = ingest.link_extraction_stream(ingest.stream_pages(spark, landing))
    ingest.run_available_now(stream, out, ckpt)
    links = spark.read.parquet(out)
    assert links.count() > 100
    cols = set(links.columns)
    assert {"url_canon", "host", "src_tag", "is_requisite", "via_url"} <= cols
    # canonical URLs only (no fragments survive canonicalization)
    assert links.filter(links.url_canon.contains("#")).count() == 0
