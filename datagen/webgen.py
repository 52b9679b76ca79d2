"""Deterministic synthetic web generator — the ``pages`` table.

Generates the Common-Crawl-shaped input table of BASELINE.json:15
(``url:string, warc_ts:timestamp, html:binary, text:string,
lang:string``) as a pure function of ``(seed=42, url)`` per the frozen
contract of FIXTURES.md §2: no RNG state, no wall clock; re-runs are
byte-identical. The ``text`` column is computed by
``track0s.extract`` at generation time, which is what makes the
byte-identical-extraction invariant testable end-to-end by construction.

Link-graph rule (FIXTURES.md §2): zipf-skewed host sizes (exercises P4
salting), ~20% cross-host links, one relative link, one fragment and one
dot-segment variant of existing URLs (exercise canonicalization U1), a
requisite image with no pages row every 7th page (exercises the
fetch-miss path S2).

Two writers share the same per-page pure function:
  * :func:`gen_pages` — in-process list of rows (unit/correctness scales)
  * ``track0_spark.sources.webgen_spark`` — distributed ``mapInPandas``
    generation for bench scale (the 10^6-page profile).
"""

from __future__ import annotations

from dataclasses import dataclass

from track0s.extract import extract_text
from track0s.hashing import h64

EPOCH_2024 = 1704067200  # 2024-01-01T00:00:00Z
LANGS = ("en", "de", "fr", "es", "it", "pt", "nl", "sv")
VOCAB = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor "
    "whiskey xray yankee zulu data spark crawl frontier page link"
).split()

FIXTURE_VERSION = 3  # bump when the html template or graph rule changes
# v3: every host serves a real stylesheet at /static/site.css
# (page_idx = CSS_PAGE_IDX sentinel) whose url(...) references exercise
# the linked-CSS requisite pass (track0s/extract.py parse_css); the
# referenced background images have no pages rows (fetch-miss 404s).
# v2: ~9% of pages (h64(url,'redir') % 11 == 3) are meta-refresh redirect
# pages (one target, same-host relative or cross-host absolute, never a
# redirect chain longer than the graph allows); ~6% of content pages
# (h64(url,'ctype') % 17 == 5) declare an in-band content-type of
# text/plain that DISAGREES with their extension-derived text/html —
# exercising header-over-extension @save semantics (track0s/http.py).


@dataclass(frozen=True)
class WebProfile:
    name: str
    hosts: int
    pages: int
    n_words: int = 12  # body words per page
    max_links: int = 5  # same-host outlinks drawn per page (1..max)


SF_UNIT = WebProfile("sf-unit", 3, 200)
SF_CORRECT = WebProfile("sf-correct", 20, 20000)
# bench pages are deliberately heavier (~2.5 KB html, up to 12 links) so
# extraction compute — not per-round scheduling overhead — dominates the
# scaling measurement (BASELINE.md scaling-efficiency row)
SF_BENCH = WebProfile("sf-bench", 200, 3000000, n_words=250, max_links=12)


def host_name(i: int) -> str:
    return f"h{i}.example.test"


#: sentinel page_idx for the host stylesheet (v3)
CSS_PAGE_IDX = -1


def page_url(host_idx: int, page_idx: int) -> str:
    if page_idx == CSS_PAGE_IDX:
        return f"http://{host_name(host_idx)}/static/site.css"
    return f"http://{host_name(host_idx)}/p/{page_idx}"


def css_content(host_idx: int) -> bytes:
    """Deterministic per-host stylesheet with url(...) requisites
    (targets have no pages rows -> 404 fetch misses)."""
    url = page_url(host_idx, CSS_PAGE_IDX)
    bg = h64(url, "bg") % 1000
    return (
        f"body {{ background: url(/static/bg{bg}.png); }}\n"
        f".logo {{ background: url('/static/logo.png'); }}\n"
        f"h1 {{ color: #333; }}\n"
    ).encode("utf-8")


def host_sizes(profile: WebProfile) -> list[int]:
    """Zipf(s=1.2) host sizes summing exactly to profile.pages."""
    h, n = profile.hosts, profile.pages
    w = [(i + 1) ** -1.2 for i in range(h)]
    tot = sum(w)
    sizes = [max(1, int(n * wi / tot)) for wi in w]
    # deterministic largest-host adjustment to hit the exact total
    sizes[0] += n - sum(sizes)
    return sizes


def _words(url: str, k: int = 12) -> str:
    return " ".join(VOCAB[h64(url, f"w{n}") % len(VOCAB)] for n in range(k))


def is_redirect_page(url: str) -> bool:
    return h64(url, "redir") % 11 == 3


def redirect_target_of(
    url: str, host_idx: int, sizes: list[int]
) -> str:
    """Deterministic meta-refresh target: ~25% cross-host absolute,
    else same-host (relative half the time)."""
    hsize = sizes[host_idx]
    nhosts = len(sizes)
    if nhosts > 1 and h64(url, "rx") % 4 == 0:
        ti = h64(url, "rth") % nhosts
        return page_url(ti, h64(url, "rtp") % sizes[ti])
    tj = h64(url, "rt") % hsize
    if h64(url, "rrel") % 2 == 0:
        return f"/p/{tj}"  # relative target (resolved at fetch)
    return page_url(host_idx, tj)


def page_html(
    host_idx: int, page_idx: int, sizes: list[int], profile: WebProfile
) -> bytes:
    """Frozen html template (FIXTURES.md §2, v3). Pure function of the URL."""
    url = page_url(host_idx, page_idx)
    if page_idx == CSS_PAGE_IDX:
        return css_content(host_idx)
    if is_redirect_page(url):
        target = redirect_target_of(url, host_idx, sizes)
        html = (
            '<html><head><meta http-equiv="refresh" '
            f'content="0; url={target}"></head>'
            "<body>moved</body></html>"
        )
        return html.encode("utf-8")
    hsize = sizes[host_idx]
    nhosts = len(sizes)
    tags: list[str] = []
    k = 1 + h64(url, "k") % profile.max_links
    for n in range(k):
        if h64(url, f"x{n}") % 5 == 0 and nhosts > 1:  # ~20% cross-host
            ti = h64(url, f"xh{n}") % nhosts
            tj = h64(url, f"xp{n}") % sizes[ti]
            tags.append(f'<a href="{page_url(ti, tj)}">c{n}</a>')
        else:
            tj = h64(url, f"l{n}") % hsize
            tags.append(f'<a href="{page_url(host_idx, tj)}">s{n}</a>')
    rel = h64(url, "rel") % hsize
    tags.append(f'<a href="/p/{rel}">rel</a>')
    frag = h64(url, "frag") % hsize
    tags.append(f'<a href="/p/{frag}#sec">frag</a>')
    dots = h64(url, "dots") % hsize
    tags.append(f'<a href="/p/../p/{dots}">dots</a>')
    if page_idx % 7 == 0:
        tags.append(f'<img src="/static/{h64(url, "img") % 1000}.png">')
        tags.append('<link href="/static/site.css" rel="stylesheet">')
    body = f"<p>{_words(url, profile.n_words)}</p>" + "".join(tags)
    ctype_meta = (
        '<meta http-equiv="content-type" content="text/plain">'
        if h64(url, "ctype") % 17 == 5
        else ""
    )
    html = (
        f'<html><head><meta charset="utf-8">{ctype_meta}'
        f'<title>T{h64(url, "t") % 10**8}'
        f"</title></head><body>{body}</body></html>"
    )
    return html.encode("utf-8")


def page_row(
    host_idx: int, page_idx: int, sizes: list[int], profile: WebProfile
) -> dict:
    url = page_url(host_idx, page_idx)
    html = page_html(host_idx, page_idx, sizes, profile)
    return {
        "url": url,
        "warc_ts": EPOCH_2024 + h64(url, "ts") % 31536000,
        "html": html,
        "text": extract_text(url, html),
        "lang": LANGS[h64(url, "lang") % len(LANGS)],
    }


def iter_page_ids(profile: WebProfile):
    sizes = host_sizes(profile)
    for hi in range(profile.hosts):
        yield hi, CSS_PAGE_IDX  # the host stylesheet (v3)
        for pj in range(sizes[hi]):
            yield hi, pj


def gen_pages(profile: WebProfile) -> list[dict]:
    sizes = host_sizes(profile)
    return [page_row(hi, pj, sizes, profile) for hi, pj in iter_page_ids(profile)]


def gen_robots_rows(profile: WebProfile) -> list[tuple]:
    """(host, disallow_prefixes, crawl_delay_s, budget, allow) rows.

    h0 disallows the /p/1 prefix range (so /p/1, /p/10.., /p/100.. are
    off-limits) BUT allows /p/10 back in (longest-match: /p/10,
    /p/100..109 re-admitted; /p/1, /p/11..19, /p/110.. stay blocked) —
    exercising RFC 9309 longest-match resolution in every crawl test;
    h1 gets a tight budget of 3/round so politeness ordering is visible
    in the crawl order (FIXTURES.md §2).
    """
    rows = [
        (host_name(0), ["/p/1"], 0.0, None, ["/p/10"]),
        (host_name(1), [], 0.0, 3),
    ]
    return [r for r in rows if int(r[0].split(".")[0][1:]) < profile.hosts]


SEEDS = ["http://h0.example.test/p/0", "http://h1.example.test/p/0"]


def store_from_rows(rows):
    """pages rows -> oracle page store (canonical url -> PageRecord)."""
    from track0s.canon import canonicalize
    from reference_impl.spider import PageRecord

    return {
        canonicalize(r["url"]): PageRecord(
            canonicalize(r["url"]), r["html"], r["text"], r["lang"], r["warc_ts"]
        )
        for r in rows
    }


def write_parquet(rows: list[dict], path: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array(
                [r["warc_ts"] * 1_000_000 for r in rows], pa.timestamp("us")
            ),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, path)
