"""Mirror path mapping + link rewriting tests (E4/S3)."""

import posixpath

import pytest

from track0s.mirror import (
    assign_paths,
    disambiguated_path,
    link_targets,
    local_path_for,
    rewrite_links,
)


def test_local_paths():
    assert local_path_for("http://h0.example.test/p/7") == "h0.example.test/p/7.html"
    assert local_path_for("http://h0.example.test/") == "h0.example.test/index.html"
    assert local_path_for("http://h0.example.test/a/b.css") == "h0.example.test/a/b.css"
    assert (
        local_path_for("http://h0.example.test/p/7?x=1&y=2")
        == "h0.example.test/p/7.html_x_1_y_2"
    )


def test_assign_paths_resolves_collisions():
    """'/p/7' vs '/p/7.html' and '/d/' vs '/d/index.html' must not
    clobber each other (ADVICE r1 #1)."""
    urls = [
        "http://h.test/p/7",
        "http://h.test/p/7.html",
        "http://h.test/d/",
        "http://h.test/d/index.html",
        "http://h.test/unique",
    ]
    paths = assign_paths(urls)
    assert len(set(paths.values())) == len(urls)  # injective
    assert paths["http://h.test/unique"] == "h.test/unique.html"  # pretty
    # colliding group: every member disambiguated, deterministically
    assert paths["http://h.test/p/7"] == disambiguated_path(
        "http://h.test/p/7", "h.test/p/7.html"
    )
    assert paths["http://h.test/p/7"].endswith(".html")  # keeps extension
    assert assign_paths(urls) == paths  # deterministic


def test_attr_regex_anchored():
    """data-src and attribute lookalikes must NOT be rewritten (ADVICE r1 #2)."""
    page = "http://h.test/a"
    html = b'<img data-src="/p/1"><img src="/p/1"><p>data-src must survive</p>'
    paths = {"http://h.test/p/1": "h.test/p/1.html"}
    out = rewrite_links(page, html, paths).decode()
    assert 'data-src="/p/1"' in out
    assert 'img src="p/1.html"' in out


def test_unmodified_page_byte_identical():
    """No rewritten link -> original bytes pass through, even non-UTF-8
    (ADVICE r1 #3)."""
    page = "http://h.test/a"
    html = '<meta charset="iso-8859-1"><p>caf\xe9</p>'.encode("latin-1")
    assert rewrite_links(page, html, {}) == html


def test_transcoded_page_updates_meta_charset():
    page = "http://h.test/a"
    html = (
        b'<meta charset="iso-8859-1"><a href="/p/1">x</a><p>caf\xe9</p>'
    )
    paths = {"http://h.test/p/1": "h.test/p/1.html"}
    out = rewrite_links(page, html, paths)
    assert b'charset="utf-8"' in out
    assert "café".encode() in out  # latin-1 é re-encoded as UTF-8
    assert b'href="p/1.html"' in out


def test_link_targets_matches_rewrite_lookups():
    page = "http://h.test/p/0"
    html = (
        b'<a href="/p/1">a</a><img src="x.png">'
        b'<a href="http://other.test/q#f">b</a><img data-src="/skip">'
    )
    assert link_targets(page, html) == {
        "http://h.test/p/1",
        "http://h.test/p/x.png",
        "http://other.test/q",
    }


def test_rewrite_intra_mirror_links():
    page = "http://h0.example.test/p/0"
    html = (
        b'<html><body><a href="/p/1">one</a>'
        b'<a href="http://h1.example.test/p/2">cross</a>'
        b'<a href="/p/404">missing</a>'
        b'<img src="/static/x.png"></body></html>'
    )
    paths = {
        "http://h0.example.test/p/0": local_path_for("http://h0.example.test/p/0"),
        "http://h0.example.test/p/1": local_path_for("http://h0.example.test/p/1"),
        "http://h1.example.test/p/2": local_path_for("http://h1.example.test/p/2"),
        "http://h0.example.test/static/x.png": "h0.example.test/static/x.png",
    }
    out = rewrite_links(page, html, paths).decode()
    assert 'href="1.html"' in out  # same dir -> sibling relative path
    assert 'href="../../h1.example.test/p/2.html"' in out  # cross-host relative
    assert 'href="/p/404"' in out  # unsaved -> untouched
    assert 'src="../static/x.png"' in out  # requisite rewritten too
    # relative targets resolve to real mirror paths
    page_dir = posixpath.dirname(local_path_for(page))
    assert posixpath.normpath(posixpath.join(page_dir, "1.html")) == paths[
        "http://h0.example.test/p/1"
    ]


def test_rewrite_is_deterministic_and_minimal():
    page = "http://h0.example.test/p/0"
    html = b'<p>keep &amp; bytes</p><a href="/p/1#frag">x</a>'
    paths = {"http://h0.example.test/p/1": "h0.example.test/p/1.html"}
    o1 = rewrite_links(page, html, paths)
    o2 = rewrite_links(page, html, paths)
    assert o1 == o2
    assert b"keep &amp; bytes" in o1  # non-link bytes untouched
    assert b'href="1.html"' in o1  # fragment variant canonicalizes to target


def test_spark_index_matches_pure_assignment(spark):
    """Distributed mirror_index == pure assign_paths on a colliding set."""
    from track0_spark.operators.mirror import mirror_index

    urls = [
        "http://h.test/p/7",
        "http://h.test/p/7.html",
        "http://h.test/d/",
        "http://h.test/d/index.html",
        "http://h.test/unique",
        "http://other.test/p/7",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url_canon string")
    got = {r["url_canon"]: r["local_path"] for r in mirror_index(df).collect()}
    assert got == assign_paths(urls)


def test_spark_mirror_rewrite_uses_resolved_paths(spark):
    """Links to a disambiguated page must point at its FINAL path."""
    from pyspark.sql import functions as F

    from track0_spark.operators.mirror import materialize_mirror

    rows = [
        ("http://h.test/p/7", b'<a href="/p/7.html">sib</a>'),
        ("http://h.test/p/7.html", b'<a href="/p/7">other</a>'),
    ]
    df = spark.createDataFrame(rows, "url_canon string, html binary")
    out = {r["url_canon"]: r for r in materialize_mirror(spark, df).collect()}
    assert len({r["local_path"] for r in out.values()}) == 2
    paths = assign_paths([u for u, _ in rows])
    for u, r in out.items():
        assert r["local_path"] == paths[u]
    # each page's link targets the OTHER page's disambiguated file name
    a, b = rows[0][0], rows[1][0]
    assert posixpath.basename(paths[b]).encode() in bytes(out[a]["html"])
    assert posixpath.basename(paths[a]).encode() in bytes(out[b]["html"])


def test_spark_mirror_scale_no_collect(spark, tmp_path):
    """>=10^5 saved pages through the join-based path (VERDICT r1 next
    #5): write-out only, no url->path index on the driver."""
    from pyspark.sql import functions as F

    n = 100_000
    pages = spark.range(n).select(
        F.concat(
            F.lit("http://h"), (F.col("id") % 50).cast("string"),
            F.lit(".test/p/"), F.col("id").cast("string"),
        ).alias("url_canon"),
        F.concat(
            # (id+50) % 2000 shares id's host (mod 50) and always exists
            F.lit('<html><a href="/p/'),
            ((F.col("id") + 50) % 2000).cast("string"),
            F.lit('">n</a><img src="/static/'),
            (F.col("id") % 7).cast("string"),
            F.lit('.png"></html>'),
        ).cast("binary").alias("html"),
    )
    from track0_spark.operators.mirror import materialize_mirror

    handles: list = []
    out = materialize_mirror(spark, pages, handles=handles)
    dest = str(tmp_path / "mirror")
    out.write.mode("overwrite").parquet(dest)
    for h in handles:
        h.unpersist()
    back = spark.read.parquet(dest)
    assert back.count() == n
    assert back.select("local_path").distinct().count() == n
    # intra-host link rewritten to a relative sibling (same dir)
    one = back.filter(F.col("url_canon") == "http://h1.test/p/1").collect()[0]
    assert b'href="51.html"' in bytes(one["html"])


def test_spark_mirror_materialize(spark):
    from datagen import webgen
    from track0_spark.operators.mirror import materialize_mirror
    from track0_spark.sources.pages import pages_from_rows
    from pyspark.sql import functions as F

    rows = webgen.gen_pages(webgen.SF_UNIT)[:40]
    pages = pages_from_rows(spark, rows).select(
        F.col("url").alias("url_canon"), "html"
    )
    out = materialize_mirror(spark, pages).collect()
    assert len(out) == 40
    saved = {r["url_canon"] for r in out}
    by_url = {r["url_canon"]: r for r in out}
    for r in out:
        if r["url_canon"].endswith(".css"):  # fixture v3 host stylesheets
            assert r["local_path"].endswith(".css")
            continue
        assert r["local_path"].endswith(".html")
        assert b"<html>" in bytes(r["html"])
    # deterministic across runs
    out2 = materialize_mirror(spark, pages).collect()
    assert {(r["url_canon"], bytes(r["html"])) for r in out} == {
        (r["url_canon"], bytes(r["html"])) for r in out2
    }


def test_local_path_never_escapes_root():
    """Regression (r2 review): canonicalize pct-decodes AFTER
    dot-segment removal, so '/%2e%2e/...' canonicalizes with literal
    '..' segments; written as-is under a mirror root that is a
    path-traversal write OUTSIDE the root. _safe_seg neutralizes
    '.'/'..' segments deterministically on both twins."""
    import os

    from track0s.canon import canonicalize
    from track0s.mirror import local_path_for

    hostile = [
        "http://h.example.test/%2e%2e/%2e%2e/%2e%2e/tmp/pwned",
        "http://h.example.test/a/%2e/b",
        "http://h.example.test/..%2f../x",
        "http://h.example.test/%2e%2e",
    ]
    for u in hostile:
        lp = local_path_for(canonicalize(u))
        assert ".." not in lp.split("/"), (u, lp)
        assert "." not in lp.split("/")[:-1], (u, lp)
        joined = os.path.normpath(os.path.join("/mirror/root", lp))
        assert joined.startswith("/mirror/root/"), (u, lp, joined)


def test_materialize_distributed_matches_driver(spark, tmp_path):
    """jobs/crawl._materialize_files distributed=True (executor-side
    mapPartitions writes, VERDICT r2 next #8) produces the EXACT file
    set and bytes of the default driver-streamed mode."""
    import os

    from jobs.crawl import _materialize_files

    rows = [
        (
            f"http://h{i % 3}.test/p/{i}",
            f'<a href="http://h{(i + 1) % 3}.test/p/{i + 1}">x</a>'.encode(),
        )
        for i in range(60)
    ]
    saved = spark.createDataFrame(rows, "url_canon string, html binary")
    d_drv = str(tmp_path / "drv")
    d_dist = str(tmp_path / "dist")
    n1 = _materialize_files(spark, saved, d_drv)
    n2 = _materialize_files(spark, saved, d_dist, distributed=True)
    assert n1 == n2 == 60

    def snap(root):
        out = {}
        for r, _, fs in os.walk(root):
            for f in fs:
                p = os.path.join(r, f)
                with open(p, "rb") as fh:
                    out[os.path.relpath(p, root)] = fh.read()
        return out

    a, b = snap(d_drv), snap(d_dist)
    assert a.keys() == b.keys()
    assert a == b
