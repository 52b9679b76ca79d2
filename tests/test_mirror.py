"""Mirror path mapping + link rewriting tests (E4/S3)."""

import posixpath

from track0s.mirror import local_path_for, rewrite_links


def test_local_paths():
    assert local_path_for("http://h0.example.test/p/7") == "h0.example.test/p/7.html"
    assert local_path_for("http://h0.example.test/") == "h0.example.test/index.html"
    assert local_path_for("http://h0.example.test/a/b.css") == "h0.example.test/a/b.css"
    assert (
        local_path_for("http://h0.example.test/p/7?x=1&y=2")
        == "h0.example.test/p/7.html_x_1_y_2"
    )


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
        assert r["local_path"].endswith(".html")
        assert b"<html>" in bytes(r["html"])
    # deterministic across runs
    out2 = materialize_mirror(spark, pages).collect()
    assert {(r["url_canon"], bytes(r["html"])) for r in out} == {
        (r["url_canon"], bytes(r["html"])) for r in out2
    }
