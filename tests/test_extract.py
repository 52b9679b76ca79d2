"""Link-extraction + text-extraction unit tests (SURVEY.md §5.1b-style)."""

from track0s.extract import (
    ExtractedLink,
    decode_html,
    extract_links,
    extract_text,
    parse_html,
    sniff_charset,
)

BASE = "http://h0.example.test/p/0"


def links(html: str):
    return extract_links(BASE, html.encode("utf-8"))


def test_basic_anchor():
    ls = links('<a href="/p/1">x</a>')
    assert ls == [ExtractedLink("http://h0.example.test/p/1", "a", "href", False)]


def test_absolute_and_relative():
    ls = links('<a href="http://h1.example.test/q">x</a><a href="sub/page">y</a>')
    assert [l.url for l in ls] == [
        "http://h1.example.test/q",
        "http://h0.example.test/p/sub/page",
    ]


def test_document_order_and_requisites():
    ls = links(
        '<img src="/i.png"><a href="/a">a</a><script src="/s.js"></script>'
        '<link href="/c.css" rel="stylesheet"><iframe src="/f"></iframe>'
    )
    assert [(l.tag, l.is_requisite) for l in ls] == [
        ("img", True),
        ("a", False),
        ("script", True),
        ("link", True),
        ("iframe", False),
    ]


def test_skip_schemes_fragments_empty():
    ls = links(
        '<a href="javascript:void(0)">j</a><a href="mailto:a@b">m</a>'
        '<a href="#top">f</a><a href="">e</a><a href="data:text/plain,x">d</a>'
        '<a href="tel:+1">t</a>'
    )
    assert ls == []


def test_css_url_in_style_attr():
    ls = links('<div style="background:url(/bg.png)">x</div>')
    assert ls == [ExtractedLink("http://h0.example.test/bg.png", "div", "style", True)]


def test_form_action_and_startend():
    ls = links('<form action="/submit"></form><img src="/x.png"/>')
    assert [(l.tag, l.attr) for l in ls] == [("form", "action"), ("img", "src")]


def test_text_skips_script_style():
    text = extract_text(
        BASE,
        b"<html><body><p>Hello  world</p><script>var x=1;</script>"
        b"<style>.a{}</style><p>Bye</p></body></html>",
    )
    assert text == "Hello  world\nBye"


def test_text_entities():
    assert extract_text(BASE, b"<p>a &amp; b &lt;c&gt;</p>") == "a & b <c>"


def test_charset_sniff_and_decode():
    raw = '<html><head><meta charset="latin-1"></head><body>caf\xe9</body></html>'.encode(
        "latin-1"
    )
    assert sniff_charset(raw) == "latin-1"
    assert "café" in decode_html(raw)


def test_decode_utf8_fallback():
    raw = "<p>héllo</p>".encode("utf-8")
    assert extract_text(BASE, raw) == "héllo"


def test_decode_bad_bytes_deterministic():
    raw = b"<p>a\xff\xfeb</p>"
    t1 = extract_text(BASE, raw)
    t2 = extract_text(BASE, raw)
    assert t1 == t2  # replacement chars, but stable


def test_one_pass_links_and_text():
    ls, text = parse_html(BASE, '<p>hi</p><a href="/a">go</a>')
    assert text == "hi\ngo"
    assert len(ls) == 1


def test_parse_css_links():
    from track0s.extract import parse_css

    css = (
        "body { background: url(/static/bg7.png); }\n"
        ".a { background: url('http://x.test/i.png'); }\n"
        ".b { background: url(\"rel/i2.png\"); }\n"
        ".c { background: url(data:image/png;base64,AAAA); }\n"
        ".d { background: url(#frag); }\n"
    )
    links = parse_css("http://h.test/static/site.css", css)
    assert [(l.url, l.tag, l.attr, l.is_requisite) for l in links] == [
        ("http://h.test/static/bg7.png", "css", "url", True),
        ("http://x.test/i.png", "css", "url", True),
        ("http://h.test/static/rel/i2.png", "css", "url", True),
    ]


def test_parse_anchors_basic_and_nested_markup():
    from track0s.extract import parse_anchors

    got = parse_anchors(
        BASE,
        '<a href="/x">one <b>two</b> three</a>'
        '<a href="#frag">skipped target</a>'
        '<a href="/y"><img src="/i.png"></a>'
        '<a href="/z">first</a><a href="/w">implicit close</a>',
    )
    assert got == [
        ("http://h0.example.test/x", "one two three"),
        ("http://h0.example.test/y", ""),  # image-only anchor
        ("http://h0.example.test/z", "first"),
        ("http://h0.example.test/w", "implicit close"),
    ]


def test_parse_anchors_script_text_skipped():
    from track0s.extract import parse_anchors

    got = parse_anchors(
        BASE, '<a href="/x">ok<script>var a = "no";</script> yes</a>'
    )
    assert got == [("http://h0.example.test/x", "ok yes")]


def test_parse_anchors_unclosed_anchor_capped():
    """An unclosed <a> must not swallow the whole document: text is
    hard-capped at ANCHOR_TEXT_CAP chars (shared constant, so the
    Spark pass and the oracle truncate identically)."""
    from track0s.extract import ANCHOR_TEXT_CAP, parse_anchors

    html = '<a href="/x">' + ("word " * 10000)
    (pair,) = parse_anchors(BASE, html)
    assert pair[0] == "http://h0.example.test/x"
    assert len(pair[1]) == ANCHOR_TEXT_CAP


def test_parse_anchors_targets_subset_of_links():
    """Invariant across the whole fixture web: every anchor target
    parse_anchors admits is exactly the set of <a href> links the
    crawl's own parser admits (same resolve_link policy — the two
    passes cannot drift)."""
    from datagen import webgen
    from track0s.extract import parse_anchors

    checked = 0
    for r in webgen.gen_pages(webgen.SF_UNIT):
        html = decode_html(r["html"])
        anchors = [u for u, _t in parse_anchors(r["url"], html)]
        a_links = [
            l.url
            for l in parse_html(r["url"], html)[0]
            if l.tag == "a" and l.attr == "href"
        ]
        assert anchors == a_links
        checked += 1
    assert checked > 100
