"""WARC source/sink round-trip (sources/warc.py; SURVEY §2.1).

The pages table IS the Common-Crawl shape (BASELINE.json:15), and WARC
is that corpus's interchange format — so the bar here is exact
round-trip fidelity: pages → .warc.gz files → pages with every column
byte-identical, plus the format-level invariants Common Crawl tooling
relies on (member-per-record gzip framing, warcinfo head record,
conversion records carrying text + language).
"""

import gzip
import os
import zlib

import pytest

from datagen import webgen
from track0_spark.sources.pages import pages_from_rows
from track0_spark.sources.warc import read_warc, write_warc

PAGES_COLS = ["url", "warc_ts", "html", "text", "lang"]


@pytest.fixture(scope="module")
def web_rows():
    return webgen.gen_pages(webgen.SF_UNIT)


def _rowset(df):
    return sorted(
        (r["url"], r["warc_ts"], bytes(r["html"] or b""), r["text"], r["lang"])
        for r in df.select(*PAGES_COLS).collect()
    )


def test_warc_round_trip_exact(spark, web_rows, tmp_path):
    pages = pages_from_rows(spark, web_rows).repartition(4)
    out = str(tmp_path / "warc")
    summary = write_warc(pages, out)
    assert sum(s["n_pages"] for s in summary) == len(web_rows)
    assert all(os.path.exists(s["path"]) for s in summary)
    back = read_warc(spark, out)
    assert _rowset(back) == _rowset(pages)


def test_warc_file_per_partition_and_glob(spark, web_rows, tmp_path):
    pages = pages_from_rows(spark, web_rows).repartition(3)
    out = str(tmp_path / "warc3")
    summary = write_warc(pages, out)
    assert len(summary) == 3  # one file per non-empty partition
    # glob and single-file forms read too
    one = read_warc(spark, summary[0]["path"])
    assert one.count() == summary[0]["n_pages"]
    allf = read_warc(spark, os.path.join(out, "*.warc.gz"))
    assert allf.count() == len(web_rows)


def test_warc_member_per_record_framing(spark, web_rows, tmp_path):
    """Each record is an independent gzip member (the CC random-access
    contract): member count == 1 warcinfo + 2 per page, and the
    decompressed stream is parseable record-by-record."""
    pages = pages_from_rows(spark, web_rows).coalesce(1)
    out = str(tmp_path / "warc1")
    (s,) = write_warc(pages, out)
    raw = open(s["path"], "rb").read()
    members = 0
    pos = 0
    while pos < len(raw):
        d = zlib.decompressobj(wbits=31)
        d.decompress(raw[pos:])
        members += 1
        pos = len(raw) - len(d.unused_data)
    assert members == 1 + 2 * s["n_pages"]
    text = gzip.decompress(raw)
    assert text.startswith(b"WARC/1.1\r\nWARC-Type: warcinfo\r\n")
    assert text.count(b"WARC-Type: response") == s["n_pages"]
    assert text.count(b"WARC-Type: conversion") == s["n_pages"]


def test_warc_response_only_archive(spark, tmp_path):
    """A raw archive with no WET sidecar (response records only) still
    reads: html intact, text/lang null."""
    import datetime as dt

    from track0_spark.sources.warc import (
        _gz_member,
        _page_records,
        _warcinfo,
    )

    p = tmp_path / "raw.warc.gz"
    ts = dt.datetime(2024, 5, 1, 12, 0, 0)
    with open(p, "wb") as f:
        f.write(_gz_member(_warcinfo("raw.warc.gz")))
        for i in range(5):
            for rec in _page_records(
                f"http://h.example.test/p/{i}", ts, b"<html>%d</html>" % i,
                None, None,
            ):
                f.write(_gz_member(rec))
    rows = read_warc(spark, str(p)).collect()
    assert len(rows) == 5
    assert all(r["text"] is None and r["lang"] is None for r in rows)
    assert sorted(bytes(r["html"]) for r in rows) == sorted(
        b"<html>%d</html>" % i for i in range(5)
    )


def test_warc_deterministic_bytes(spark, web_rows, tmp_path):
    """Same partition → byte-identical file across runs (gzip mtime
    pinned, deterministic record ids) — the engine's reproducibility
    discipline (BASELINE.json:14) extends to exported artifacts."""
    pages = pages_from_rows(spark, web_rows).coalesce(1)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    (sa,) = write_warc(pages, a)
    (sb,) = write_warc(pages, b)
    assert open(sa["path"], "rb").read() == open(sb["path"], "rb").read()


def test_warc_crawl_source_equivalence(spark, web_rows, tmp_path):
    """Crawling over a WARC-read pages table produces the exact same
    crawl_log as the in-memory pages table — the source is a drop-in
    (SURVEY §2.1 S2's fetch join is source-agnostic)."""
    from track0s.config import CrawlConfig
    from track0s.robots import RobotsTable
    from track0_spark.plans.loop import CrawlLoop

    out = str(tmp_path / "warc")
    write_warc(pages_from_rows(spark, web_rows).repartition(4), out)

    def cfg():
        robots = RobotsTable.from_rows(webgen.gen_robots_rows(webgen.SF_UNIT))
        return CrawlConfig.from_specs(
            webgen.SEEDS,
            follow="+original-domain -depth>3 +requisite",
            robots=robots,
            max_rounds=6,
        )

    cols = ["round", "fetch_seq", "url_canon", "status"]

    def log_rows(pages_df, ckpt):
        loop = CrawlLoop(spark, cfg(), pages_df, ckpt)
        loop.run()
        return [
            tuple(r[c] for c in cols)
            for r in loop.crawl_log().orderBy("round", "fetch_seq").collect()
        ]

    mem = log_rows(pages_from_rows(spark, web_rows), str(tmp_path / "c1"))
    warc = log_rows(read_warc(spark, out), str(tmp_path / "c2"))
    assert mem == warc


def test_warc_cdx_index_and_point_fetch(spark, web_rows, tmp_path):
    """The CDX sidecar frames every record's gzip member: a point
    lookup reads ONE member by (offset, length) and reproduces the
    page exactly — no archive scan."""
    from track0_spark.sources.warc import (
        fetch_warc_records,
        read_warc_index,
    )

    pages = pages_from_rows(spark, web_rows).repartition(4)
    out = str(tmp_path / "warc")
    write_warc(pages, out)
    idx = read_warc_index(spark, out)
    assert idx.count() == 2 * len(web_rows)  # response + conversion each

    want = sorted(r["url"] for r in pages.select("url").collect())[:7]
    got = fetch_warc_records(
        spark, idx.filter(idx["url"].isin(want))
    )
    exp = pages.filter(pages["url"].isin(want))
    assert _rowset(got) == _rowset(exp)


def test_warc_index_offsets_frame_valid_members(spark, web_rows, tmp_path):
    """Raw seek/read at every indexed (offset, length) yields a
    standalone gzip member containing exactly one WARC record."""
    from track0_spark.sources.warc import read_warc_index

    pages = pages_from_rows(spark, web_rows).coalesce(1)
    out = str(tmp_path / "warc")
    write_warc(pages, out)
    rows = read_warc_index(spark, out).orderBy("offset").collect()[:20]
    with open(rows[0]["path"], "rb") as f:
        for r in rows:
            f.seek(r["offset"])
            data = gzip.decompress(f.read(r["length"]))
            assert data.startswith(b"WARC/1.1\r\n")
            assert f"WARC-Target-URI: {r['url']}".encode() in data


def test_warc_response_only_point_fetch(spark, web_rows, tmp_path):
    """Fetching just the response member yields html with null
    text/lang — the raw-archive (no-WET) lookup."""
    from track0_spark.sources.warc import (
        fetch_warc_records,
        read_warc_index,
    )

    pages = pages_from_rows(spark, web_rows).repartition(2)
    out = str(tmp_path / "warc")
    write_warc(pages, out)
    idx = read_warc_index(spark, out)
    one_url = pages.select("url").collect()[0]["url"]
    got = fetch_warc_records(
        spark,
        idx.filter((idx["url"] == one_url) & (idx["kind"] == "response")),
    ).collect()
    assert len(got) == 1
    assert got[0]["text"] is None and got[0]["lang"] is None
    exp = pages.filter(pages["url"] == one_url).collect()[0]
    assert bytes(got[0]["html"]) == bytes(exp["html"])


def test_warc_rewrite_clears_stale_parts(spark, web_rows, tmp_path):
    """Re-exporting into the same directory with fewer partitions must
    not leave stale archives or index rows behind."""
    from track0_spark.sources.warc import read_warc_index

    out = str(tmp_path / "warc")
    pages = pages_from_rows(spark, web_rows)
    write_warc(pages.repartition(4), out)
    assert len(os.listdir(out)) == 5  # 4 parts + index/
    (s,) = write_warc(pages.coalesce(1), out)
    parts = [f for f in os.listdir(out) if f.endswith(".warc.gz")]
    assert parts == ["part-00000.warc.gz"]
    assert read_warc(spark, out).count() == len(web_rows)
    assert read_warc_index(spark, out).count() == 2 * len(web_rows)
