"""In-band HTTP analogs (redirects, header content-type): pure fns,
native-expr equivalence, and end-to-end redirect semantics."""

from pyspark.sql import functions as F

from track0s.http import header_content_type, redirect_target


def test_redirect_target_pure():
    html = (
        b'<html><head><meta http-equiv="refresh" '
        b'content="0; url=/p/7"></head><body>moved</body></html>'
    )
    assert redirect_target(html) == "/p/7"
    assert redirect_target(b"<html><body>hi</body></html>") is None
    # absolute target, single quotes, case-insensitive
    assert (
        redirect_target(
            b"<META HTTP-EQUIV='Refresh' CONTENT='5; url=http://x.test/a'>"
        )
        == "http://x.test/a"
    )


def test_header_content_type_pure():
    assert (
        header_content_type(
            b'<meta http-equiv="content-type" content="text/plain">'
        )
        == "text/plain"
    )
    assert header_content_type(b'<meta charset="utf-8">') is None
    assert (
        header_content_type(
            b'<meta http-equiv="Content-Type" content="TEXT/HTML; charset=x">'
        )
        == "text/html"
    )


def test_native_exprs_match_pure(spark):
    """The Spark regexp twins agree with track0s.http on the whole
    fixture corpus (every sf-unit page, redirect and content pages)."""
    from datagen import webgen
    from track0_spark.functions.exprs import (
        header_content_type_expr,
        redirect_target_expr,
    )

    rows = webgen.gen_pages(webgen.SF_UNIT)
    df = spark.createDataFrame(
        [(r["url"], r["html"]) for r in rows], "url string, html binary"
    )
    got = {
        r["url"]: (r["redir"], r["ct"])
        for r in df.select(
            "url",
            redirect_target_expr(F.col("html")).alias("redir"),
            header_content_type_expr(F.col("html")).alias("ct"),
        ).collect()
    }
    n_redir = 0
    for r in rows:
        exp = (redirect_target(r["html"]), header_content_type(r["html"]))
        assert got[r["url"]] == exp, r["url"]
        n_redir += exp[0] is not None
    assert n_redir > 0  # fixture v2 actually contains redirects
    assert any(ct == "text/plain" for _, ct in got.values())


def test_header_overrides_extension_in_save(spark):
    """R8 header semantics: a page whose in-band type disagrees with its
    extension is saved by its HEADER type (oracle + engine agree via the
    crawl-equivalence suite; here: the mime attr the rules see)."""
    from track0s import mime
    from datagen import webgen

    rows = webgen.gen_pages(webgen.SF_UNIT)
    overridden = [
        r
        for r in rows
        if header_content_type(r["html"]) == "text/plain"
    ]
    assert overridden, "fixture must contain disagreeing pages"
    for r in overridden:
        # extension says text/html, header says text/plain
        from track0s.canon import path_of

        assert mime.content_type_for(path_of(r["url"])) == "text/html"


def test_resolve_redirect_policy():
    """Regression (r2 review): redirect targets get the SAME scheme
    filtering as extracted links — no off-policy escape hatch."""
    from track0s.http import resolve_redirect

    base = "http://a.test/x"
    assert resolve_redirect(base, "/y") == "http://a.test/y"
    assert resolve_redirect(base, "HTTP://B.test/z") == "http://b.test/z"
    for bad in ("mailto:x@y.test", "javascript:alert(1)", "data:text/html,hi",
                "#frag", "", "  ", "ftp://a.test/f"):
        assert resolve_redirect(base, bad) is None, bad


def test_sniff_total_on_malformed_heads(spark):
    """Regression (r2 review): the head sniff must be TOTAL — non-UTF-8
    pages and a multibyte char split exactly at the window edge crashed
    Spark's UTF-8 decode; latin-1 never fails and both twins agree."""
    from track0s.http import SNIFF_BYTES, header_content_type, redirect_target
    from track0_spark.functions.exprs import (
        header_content_type_expr,
        redirect_target_expr,
    )

    redirect = b'<meta http-equiv="refresh" content="0; url=/next">'
    pages = [
        b"\xff\xfe garbage " + redirect,                      # not UTF-8
        b"x" * (SNIFF_BYTES - 1) + "é".encode("utf-8"),       # split char
        "caf\xe9 ".encode("latin-1") + redirect,              # latin-1 page
    ]
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(pages)], "i int, html binary"
    )
    rows = (
        df.select(
            "i",
            redirect_target_expr(F.col("html")).alias("r"),
            header_content_type_expr(F.col("html")).alias("c"),
        )
        .orderBy("i")
        .collect()
    )  # must not raise
    for row, page in zip(rows, pages):
        assert row["r"] == redirect_target(page)
        assert row["c"] == header_content_type(page)
    assert rows[0]["r"] == "/next" and rows[2]["r"] == "/next"


def test_sniff_ascii_semantics_twin_agreement(spark):
    """Regression (r2 review): the sniff regexes are compiled re.ASCII
    because Java \\s and \\d are ASCII-only. Before the fix, Python's
    Unicode \\s accepted NBSP (0xA0 -> U+00A0 under the latin-1 sniff
    decode) and NEL (0x85) as the <meta>-attribute separator, so the
    oracle followed a redirect the Spark twin ignored — diverging
    crawl_log, seen set, and frontier. Both twins must agree these are
    NOT separators, and that ASCII whitespace still is."""
    from track0s.http import header_content_type, redirect_target
    from track0_spark.functions.exprs import (
        header_content_type_expr,
        redirect_target_expr,
    )

    redirect_sep = [
        (b"<meta\xa0http-equiv=\"refresh\" content=\"0; url=/next\">", None),
        (b"<meta\x85http-equiv=\"refresh\" content=\"0; url=/next\">", None),
        (b"<meta\thttp-equiv=\"refresh\" content=\"0; url=/next\">", "/next"),
        (b"<meta\x0bhttp-equiv=\"refresh\" content=\"0; url=/next\">", "/next"),
    ]
    for page, want in redirect_sep:
        assert redirect_target(page) == want, page
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, (p, _) in enumerate(redirect_sep)],
        "i int, html binary",
    )
    rows = (
        df.select(
            "i",
            redirect_target_expr(F.col("html")).alias("r"),
            header_content_type_expr(F.col("html")).alias("c"),
        )
        .orderBy("i")
        .collect()
    )
    for row, (page, want) in zip(rows, redirect_sep):
        assert row["r"] == want == redirect_target(page), page
        assert row["c"] == header_content_type(page)
