"""WARC source/sink for the pages table (ISO 28500; WARC/1.1).

The ``input_hint`` (BASELINE.json:15) fixes the pages table to the
Common-Crawl shape ``(url, warc_ts, html, text, lang)`` — and Common
Crawl's on-the-wire interchange format for exactly that data is WARC:
``response`` records carry the HTTP capture (our ``html``), sibling
``conversion`` records carry the extracted text (the WET sidecar),
``WARC-Identified-Content-Language`` carries ``lang``.  This module
round-trips the pages table through that format so the engine can
(a) ingest real-world crawl archives and (b) export its synthetic /
mirrored corpus in the shape every downstream archive tool expects.

Layout conventions (Common Crawl's, all public):

* one ``.warc.gz`` file per Spark partition, ``part-NNNNN.warc.gz``;
* **every record is its own gzip member** — concatenated members are
  a valid gzip stream, and member-per-record is what makes CC archives
  random-accessible at (offset, length) grain from the CDX index;
* file head carries a ``warcinfo`` record; each page contributes an
  adjacent (``response``, ``conversion``) pair, the conversion linked
  by ``WARC-Refers-To``.

Scale posture (10^10 pages / ~100 TB): the READ grain is *one archive
file per task* — Common Crawl ships ~100k files of ~1 GB per crawl, so
a full-archive read is ~100k well-sized tasks with zero shuffle.  The
parser streams records through ``gzip.GzipFile`` (multi-member decode
is transparent) and yields bounded Arrow batches, so task memory is
O(largest record + one batch), never O(file) — unlike
``spark.read.format("binaryFile")``, which materialises whole files as
single rows and caps out at 2 GB.  The WRITE side is mapInPandas over
the pages DataFrame: each task streams its partition into its own
file on a shared filesystem, so output parallelism == partition count
and the fat ``html`` column never moves through a shuffle.

No WARC library ships in this sandbox (warcio etc. absent) and none is
needed — the record framing is ~40 lines of public spec.
"""

from __future__ import annotations

import datetime as dt
import glob as _glob
import gzip
import io
import os
import uuid
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

from ..schemas import PAGES

#: WARC-Date with microseconds (WARC/1.1 allows fractional seconds);
#: the reader also accepts the whole-second WARC/1.0 form.
_TS_FMT = "%Y-%m-%dT%H:%M:%S.%fZ"

_SOFTWARE = "track0s-spark/0.4 (pages-table WARC sink)"


def _record_id(url: str, ts: dt.datetime, kind: str) -> str:
    """Deterministic ``urn:uuid`` record id (uuid5 over url+ts+type).

    Determinism matters for the engine's reproducibility contract
    (BASELINE.json:14: same inputs → same artifacts, byte-stable
    re-runs); real archives use random uuid4, which the reader of
    course also accepts — it only ever *matches* ids, never assumes
    their derivation.
    """
    name = f"{url}#{ts.strftime(_TS_FMT)}#{kind}"
    return f"<urn:uuid:{uuid.uuid5(uuid.NAMESPACE_URL, name)}>"


def _record(headers: list[tuple[str, str]], payload: bytes) -> bytes:
    head = "".join(f"{k}: {v}\r\n" for k, v in headers)
    return (
        f"WARC/1.1\r\n{head}Content-Length: {len(payload)}\r\n\r\n".encode()
        + payload
        + b"\r\n\r\n"
    )


def _gz_member(raw: bytes) -> bytes:
    """Compress one record as an independent gzip member (mtime pinned
    to 0 so output bytes are deterministic run-to-run)."""
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(raw)
    return buf.getvalue()


def _warcinfo(filename: str) -> bytes:
    body = (
        f"software: {_SOFTWARE}\r\nformat: WARC File Format 1.1\r\n".encode()
    )
    return _record(
        [
            ("WARC-Type", "warcinfo"),
            ("WARC-Date", "1970-01-01T00:00:00.000000Z"),
            ("WARC-Filename", filename),
            ("WARC-Record-ID", _record_id(filename, dt.datetime(1970, 1, 1), "info")),
            ("Content-Type", "application/warc-fields"),
        ],
        body,
    )


def _page_records(
    url: str, ts: dt.datetime, html: bytes, text: str, lang: str
) -> list[bytes]:
    """(response, conversion) records for one page — returned
    separately so the writer frames each as its own gzip member."""
    wdate = ts.strftime(_TS_FMT)
    resp_id = _record_id(url, ts, "response")
    html = html if html is not None else b""
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        + f"Content-Length: {len(html)}\r\n\r\n".encode()
        + html
    )
    out = [
        _record(
            [
                ("WARC-Type", "response"),
                ("WARC-Record-ID", resp_id),
                ("WARC-Date", wdate),
                ("WARC-Target-URI", url),
                ("Content-Type", "application/http; msgtype=response"),
            ],
            http,
        )
    ]
    if text is not None:
        conv_headers = [
            ("WARC-Type", "conversion"),
            ("WARC-Record-ID", _record_id(url, ts, "conversion")),
            ("WARC-Refers-To", resp_id),
            ("WARC-Date", wdate),
            ("WARC-Target-URI", url),
            ("Content-Type", "text/plain"),
        ]
        if lang:
            # Common Crawl's WET language field (CLD2 slot there).
            conv_headers.insert(
                5, ("WARC-Identified-Content-Language", lang)
            )
        out.append(_record(conv_headers, text.encode("utf-8")))
    return out


def write_warc(
    pages: DataFrame, out_dir: str, index: bool = True
) -> list[dict]:
    """Export a pages-shaped DataFrame as ``part-NNNNN.warc.gz`` files.

    Executor-side streaming write (one file per partition, member per
    record) onto a shared filesystem; returns one summary dict per
    file written: ``{"path", "n_pages", "bytes"}``.  ``out_dir`` is
    resolved to an absolute path on the DRIVER before the closure is
    built — executors must not re-resolve a relative path against
    their own cwd (ADVICE r3, jobs/crawl.py lesson).

    With ``index=True`` each task also writes a CDX-style record index
    under ``out_dir/index/`` — one parquet row per record:
    ``(url, warc_ts, kind, path, offset, length)`` where offset/length
    frame the record's own gzip member.  This is the Common-Crawl
    access pattern (their CDXJ index serves exactly these fields) and
    what makes a 100 TB archive point-addressable: a lookup reads ONE
    gzip member by byte range instead of scanning archives — see
    ``fetch_warc_records``.
    """
    out_dir = os.path.abspath(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    idx_dir = os.path.join(out_dir, "index")
    if index:
        os.makedirs(idx_dir, exist_ok=True)
    # overwrite semantics: a re-export with FEWER partitions must not
    # leave stale higher-numbered parts (or index rows pointing at
    # replaced archives) behind — clear prior output on the driver
    for old in _glob.glob(os.path.join(out_dir, "part-*.warc.gz*")):
        os.remove(old)
    for old in _glob.glob(os.path.join(idx_dir, "part-*.parquet*")):
        os.remove(old)

    def _write(batches) -> Iterator:
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        fname = f"part-{pid:05d}.warc.gz"
        path = os.path.join(out_dir, fname)
        n = 0
        f = None
        idx: list[tuple] = []  # (url, ts, kind, offset, length)
        for pdf in batches:
            if f is None:
                f = open(path + ".tmp", "wb")
                f.write(_gz_member(_warcinfo(fname)))
            for url, ts, html, text, lang in zip(
                pdf["url"], pdf["warc_ts"], pdf["html"], pdf["text"], pdf["lang"]
            ):
                pyts = ts.to_pydatetime()
                for kind, rec in zip(
                    ("response", "conversion"),
                    _page_records(url, pyts, html, text, lang),
                ):
                    off = f.tell()
                    f.write(_gz_member(rec))
                    idx.append((url, pyts, kind, off, f.tell() - off))
                n += 1
        if f is None:  # empty partition: no file
            return
        f.close()
        os.replace(path + ".tmp", path)  # no torn .warc.gz visible
        if index:
            import pyarrow as pa
            import pyarrow.parquet as pq

            ipath = os.path.join(idx_dir, f"part-{pid:05d}.parquet")
            tbl = pa.table(
                {
                    "url": [r[0] for r in idx],
                    "warc_ts": pa.array(
                        [r[1] for r in idx], type=pa.timestamp("us")
                    ),
                    "kind": [r[2] for r in idx],
                    "path": [path] * len(idx),
                    "offset": pa.array([r[3] for r in idx], type=pa.int64()),
                    "length": pa.array([r[4] for r in idx], type=pa.int64()),
                }
            )
            pq.write_table(tbl, ipath + ".tmp")
            os.replace(ipath + ".tmp", ipath)
        yield pd.DataFrame(
            {"path": [path], "n_pages": [n], "bytes": [os.path.getsize(path)]}
        )

    summary = pages.mapInPandas(
        _write, schema="path string, n_pages bigint, bytes bigint"
    )
    return [r.asDict() for r in summary.collect()]


def _parse_ts(s: str) -> dt.datetime:
    for fmt in (_TS_FMT, "%Y-%m-%dT%H:%M:%SZ"):
        try:
            return dt.datetime.strptime(s, fmt)
        except ValueError:
            continue
    raise ValueError(f"unparseable WARC-Date: {s!r}")


def _iter_records(stream) -> Iterator[tuple[dict, bytes]]:
    """Stream (headers, payload) off a decompressed WARC byte stream.

    Reads exactly Content-Length payload bytes per record, so payloads
    may contain anything (including blank lines / 'WARC/1.1').  Memory
    is O(one record).
    """
    while True:
        line = stream.readline()
        if not line:
            return
        if line in (b"\r\n", b"\n"):
            continue
        if not line.startswith(b"WARC/"):
            raise ValueError(f"expected WARC version line, got {line[:40]!r}")
        headers: dict[str, str] = {}
        while True:
            ln = stream.readline()
            if ln in (b"\r\n", b"\n", b""):
                break
            k, _, v = ln.decode("utf-8", "replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers.get("content-length", "0"))
        payload = stream.read(length)
        if len(payload) != length:
            raise ValueError(
                f"truncated WARC record: wanted {length} payload bytes, "
                f"got {len(payload)}"
            )
        yield headers, payload


def _http_body(payload: bytes) -> bytes:
    sep = payload.find(b"\r\n\r\n")
    return payload[sep + 4 :] if sep >= 0 else payload


def _parse_file(path: str, batch_rows: int) -> Iterator[list[tuple]]:
    """One WARC file → batches of pages-schema tuples.

    Pairs each ``conversion`` with its ``response`` via
    ``WARC-Refers-To``.  Writers (ours included) emit the pair
    adjacently, so the pending buffer normally holds one entry; a
    response is flushed without text the moment a NON-matching record
    arrives after it — bounded memory even on response-only archives
    (a raw crawl with no WET sidecar), where every page yields
    ``text=None, lang=None``.
    """
    pending: dict[str, tuple] = {}  # resp_id -> (url, ts, html)
    order: list[str] = []
    batch: list[tuple] = []

    def _flush_upto(keep: int) -> Iterator[tuple]:
        while len(order) > keep:
            rid = order.pop(0)
            url, ts, html = pending.pop(rid)
            yield (url, ts, html, None, None)

    with gzip.open(path, "rb") as stream:
        for headers, payload in _iter_records(stream):
            rtype = headers.get("warc-type")
            if rtype == "response":
                for row in _flush_upto(0):
                    batch.append(row)
                rid = headers.get("warc-record-id", "")
                pending[rid] = (
                    headers.get("warc-target-uri", ""),
                    _parse_ts(headers["warc-date"]),
                    _http_body(payload),
                )
                order.append(rid)
            elif rtype == "conversion":
                ref = headers.get("warc-refers-to", "")
                if ref in pending:
                    order.remove(ref)
                    url, ts, html = pending.pop(ref)
                    batch.append(
                        (
                            url,
                            ts,
                            html,
                            payload.decode("utf-8"),
                            headers.get("warc-identified-content-language"),
                        )
                    )
            # warcinfo / request / metadata records: skipped
            if len(batch) >= batch_rows:
                yield batch
                batch = []
    for row in _flush_upto(0):
        batch.append(row)
    if batch:
        yield batch


def read_warc(
    spark: SparkSession,
    path_or_glob: str,
    parallelism: int | None = None,
    batch_rows: int = 256,
) -> DataFrame:
    """Read ``.warc.gz`` archives into the pages schema.

    ``path_or_glob``: a directory (reads ``*.warc.gz`` under it), a
    glob, or a single file.  The driver lists paths (one cheap listing
    — ~100k entries for a full Common Crawl snapshot) and distributes
    *paths*, one archive file per task; each task streams its file
    (see module docstring for why not ``binaryFile``).
    """
    if os.path.isdir(path_or_glob):
        paths = sorted(_glob.glob(os.path.join(path_or_glob, "*.warc.gz")))
    else:
        paths = sorted(_glob.glob(path_or_glob))
    if not paths:
        raise FileNotFoundError(f"no .warc.gz files match {path_or_glob!r}")
    paths = [os.path.abspath(p) for p in paths]
    par = parallelism or len(paths)

    def _read(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            for p in pdf["path"]:
                for rows in _parse_file(p, batch_rows):
                    yield pd.DataFrame(
                        rows, columns=["url", "warc_ts", "html", "text", "lang"]
                    )

    files = spark.createDataFrame(
        [(p,) for p in paths], schema="path string"
    ).repartition(min(par, len(paths)))
    return files.mapInPandas(_read, schema=PAGES)


def read_warc_index(spark: SparkSession, out_dir: str) -> DataFrame:
    """The CDX-style record index written by ``write_warc(index=True)``:
    one row per record, ``(url, warc_ts, kind, path, offset, length)``.
    Plain parquet — filters on ``url`` push down to the scan, so
    selecting a handful of URLs never reads the full index either."""
    return spark.read.parquet(os.path.join(os.path.abspath(out_dir), "index"))


def fetch_warc_records(spark: SparkSession, index_rows: DataFrame) -> DataFrame:
    """Point-read pages out of WARC archives via index rows — the
    random-access path: each task seeks to ``offset``, reads ``length``
    bytes, and decompresses exactly one gzip member (the CC byte-range
    access pattern; possible only because the writer frames every
    record as its own member).

    ``index_rows`` is any subset of ``read_warc_index`` rows (typically
    the result of a join or an IN filter on url).  Rows are grouped by
    archive file and read in offset order, so a task issues sequential
    ranged reads per file.  Response and conversion members of the
    same capture re-combine into one pages row; selections containing
    only the response yield ``text/lang`` null.  Output schema: pages.
    """
    from pyspark.sql import functions as F

    def _fetch(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for path, g in pdf.groupby("path", sort=True):
                with open(path, "rb") as f:
                    for _, r in g.sort_values("offset").iterrows():
                        f.seek(int(r["offset"]))
                        member = f.read(int(r["length"]))
                        data = gzip.decompress(member)
                        (headers, payload), = list(
                            _iter_records(io.BytesIO(data))
                        )
                        kind = headers.get("warc-type")
                        rows.append(
                            (
                                headers.get("warc-target-uri", ""),
                                _parse_ts(headers["warc-date"]),
                                _http_body(payload) if kind == "response" else None,
                                payload.decode("utf-8")
                                if kind == "conversion"
                                else None,
                                headers.get("warc-identified-content-language")
                                if kind == "conversion"
                                else None,
                            )
                        )
            if rows:
                yield pd.DataFrame(
                    rows, columns=["url", "warc_ts", "html", "text", "lang"]
                )

    parts = index_rows.select(
        "url", "warc_ts", "kind", "path", "offset", "length"
    ).repartition("path")
    raw = parts.mapInPandas(_fetch, schema=PAGES)
    return raw.groupBy("url", "warc_ts").agg(
        F.first("html", ignorenulls=True).alias("html"),
        F.first("text", ignorenulls=True).alias("text"),
        F.first("lang", ignorenulls=True).alias("lang"),
    ).select("url", "warc_ts", "html", "text", "lang")
