"""HTML link extraction + visible-text extraction. Pure stdlib.

This module is the **single parser** shared by (a) the synthetic-web
generator (ground-truth ``text`` column), (b) the single-process oracle
spider, and (c) the Spark ``mapInPandas`` Arrow UDF — so "byte-identical
extracted text per url" (BASELINE.json:15 input_hint) holds by
construction, not by luck (SURVEY.md §0, §2.5 E1–E3).

Reference parity: models the tag→URL-attribute walk of a track0-style
parser (reference locus ``track/parser.py`` [PK-med]; /root/reference is
an empty mount this session — SURVEY.md §0). The tag map below is the
frozen normative map of FIXTURES.md §3.

Determinism contract (frozen; any change is a fixture-version bump):
  * charset: declared/meta charset if it names a known codec, decoded
    with errors='replace'; else utf-8 errors='replace'
  * links: document order, urljoin()-resolved against the page URL,
    javascript:/mailto:/data:/tel: and empty hrefs skipped
  * text: character data outside <script>/<style>/<template>, each chunk
    .strip()ed, empties dropped, joined with '\\n'
"""

from __future__ import annotations

import codecs
import re
from dataclasses import dataclass
from html.parser import HTMLParser
from urllib.parse import urljoin

#: tag -> (attr, is_requisite). Frozen normative map (FIXTURES.md §3).
TAG_ATTRS: dict[str, tuple[str, bool]] = {
    "a": ("href", False),
    "frame": ("src", False),
    "iframe": ("src", False),
    "form": ("action", False),
    "img": ("src", True),
    "script": ("src", True),
    "link": ("href", True),
    "source": ("src", True),
    "embed": ("src", True),
    "audio": ("src", True),
    "video": ("src", True),
}

_SKIP_SCHEMES = ("javascript:", "mailto:", "data:", "tel:", "about:")
_SKIP_TEXT_TAGS = frozenset({"script", "style", "template"})

_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]+)""", re.IGNORECASE
)
_CSS_URL_RE = re.compile(r"""url\(\s*['"]?([^'")]+)['"]?\s*\)""")


def sniff_charset(raw: bytes) -> str | None:
    """Charset from a <meta charset=...> in the first 1024 bytes."""
    m = _META_CHARSET_RE.search(raw[:1024])
    if not m:
        return None
    name = m.group(1).decode("ascii", "replace")
    try:
        codecs.lookup(name)
    except LookupError:
        return None
    return name


def decode_html(raw: bytes, declared: str | None = None) -> str:
    """bytes -> str with the frozen fallback chain (E3)."""
    for cs in (declared, sniff_charset(raw)):
        if cs:
            try:
                codecs.lookup(cs)
            except LookupError:
                continue
            return raw.decode(cs, errors="replace")
    return raw.decode("utf-8", errors="replace")


@dataclass(frozen=True)
class ExtractedLink:
    url: str  # absolute, urljoin-resolved (NOT canonicalized)
    tag: str
    attr: str
    is_requisite: bool


def resolve_link(base_url: str, value: str) -> str | None:
    """THE link-admission policy, in one place: strip, drop fragments
    and skip-scheme values, resolve against the base, require an
    http(s) result. Shared by the HTML parser (_emit), the linked-CSS
    pass (_css_link), and meta-refresh redirect resolution
    (track0s.http.resolve_redirect) so the three paths cannot drift
    (r2 review: they were three hand-copies)."""
    v = value.strip()
    if not v or v.startswith("#"):
        return None
    low = v.lower()
    if any(low.startswith(s) for s in _SKIP_SCHEMES):
        return None
    try:
        absu = urljoin(base_url, v)
    except ValueError:
        return None
    if not absu.lower().startswith(("http://", "https://")):
        return None
    return absu


class _Parser(HTMLParser):
    def __init__(self, base_url: str):
        super().__init__(convert_charrefs=True)
        self.base = base_url
        self.links: list[ExtractedLink] = []
        self.chunks: list[str] = []
        self._skip_depth = 0

    def _emit(self, tag: str, attr: str, value: str, requisite: bool) -> None:
        absu = resolve_link(self.base, value)
        if absu is not None:
            self.links.append(ExtractedLink(absu, tag, attr, requisite))

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TEXT_TAGS:
            self._skip_depth += 1
        ad = dict(attrs)
        spec = TAG_ATTRS.get(tag)
        if spec is not None:
            attr, req = spec
            val = ad.get(attr)
            if val is not None:
                self._emit(tag, attr, val, req)
        style = ad.get("style")
        if style:
            for m in _CSS_URL_RE.finditer(style):
                self._emit(tag, "style", m.group(1), True)

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)
        if tag in _SKIP_TEXT_TAGS:
            self._skip_depth -= 1

    def handle_endtag(self, tag):
        if tag in _SKIP_TEXT_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data):
        if self._skip_depth == 0:
            s = data.strip()
            if s:
                self.chunks.append(s)


def parse_html(base_url: str, html: str) -> tuple[list[ExtractedLink], str]:
    """(links in document order, visible text) — one pass."""
    p = _Parser(base_url)
    p.feed(html)
    p.close()
    return p.links, "\n".join(p.chunks)


#: per-anchor visible-text cap. A malformed page with an unclosed
#: ``<a>`` would otherwise accumulate the REST OF THE DOCUMENT as one
#: anchor's text (fat rows through the whole anchor pipeline); real
#: anchor texts are tens of chars. The cap lives in the SHARED parser,
#: so the Spark pass and the sequential oracle truncate identically.
ANCHOR_TEXT_CAP = 512


class _AnchorParser(_Parser):
    """_Parser plus per-``<a>`` visible-text capture. Kept as a
    SEPARATE pass so the byte-identical links/text contract of
    ``parse_html`` (BASELINE.json per-row invariant) is untouched:
    anchor harvesting is a corpus-analysis signal, not a crawl-loop
    input. Nested ``<a>`` is invalid HTML — like browsers, a new
    ``<a>`` implicitly closes the previous one."""

    def __init__(self, base_url: str):
        super().__init__(base_url)
        self.anchors: list[tuple[str, list[str]]] = []
        self._open: int | None = None
        self._open_len = 0

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            self._open = None
            href = dict(attrs).get("href")
            if href is not None:
                absu = resolve_link(self.base, href)
                if absu is not None:
                    self.anchors.append((absu, []))
                    self._open = len(self.anchors) - 1
                    self._open_len = 0
        super().handle_starttag(tag, attrs)

    def handle_endtag(self, tag):
        if tag == "a":
            self._open = None
        super().handle_endtag(tag)

    def handle_data(self, data):
        if (
            self._open is not None
            and self._skip_depth == 0
            and self._open_len < ANCHOR_TEXT_CAP
        ):
            s = data.strip()
            if s:
                self.anchors[self._open][1].append(s)
                self._open_len += len(s) + 1
        super().handle_data(data)


def parse_anchors(base_url: str, html: str) -> list[tuple[str, str]]:
    """(absolute target url, visible anchor text) per ``<a href>`` in
    document order — the classic IR relevance signal (what OTHER pages
    call a url). Target admission is ``resolve_link``, the same policy
    as every other link path; text chunks join with single spaces
    (empty string for image-only / empty anchors), hard-capped at
    ``ANCHOR_TEXT_CAP`` chars (unclosed-``<a>`` pages must not turn
    the whole document into one anchor row)."""
    p = _AnchorParser(base_url)
    p.feed(html)
    p.close()
    return [
        (u, " ".join(chunks)[:ANCHOR_TEXT_CAP]) for u, chunks in p.anchors
    ]


def _css_link(base_url: str, value: str) -> ExtractedLink | None:
    """One css url(...) reference -> requisite link (same filtering as
    the HTML parser's _emit, via the shared resolve_link policy)."""
    absu = resolve_link(base_url, value)
    if absu is None:
        return None
    return ExtractedLink(absu, "css", "url", True)


def parse_css(base_url: str, css: str) -> list[ExtractedLink]:
    """``url(...)`` references of a LINKED stylesheet, document order —
    all requisites (a mirror needs them to render saved pages). This is
    the track0-style css-file requisite pass (reference locus
    ``track/parser.py`` [PK-med]; VERDICT r1 "What's missing" #4 —
    inline ``style=`` attrs were already handled by the HTML parser).
    Frozen scope: ``url(...)`` tokens only; ``@import "x.css"`` without
    url() is out of fixture scope and documented."""
    out = []
    for m in _CSS_URL_RE.finditer(css):
        link = _css_link(base_url, m.group(1))
        if link is not None:
            out.append(link)
    return out


def extract_links(base_url: str, raw: bytes, declared_charset: str | None = None):
    links, _ = parse_html(base_url, decode_html(raw, declared_charset))
    return links


def extract_text(base_url: str, raw: bytes, declared_charset: str | None = None) -> str:
    _, text = parse_html(base_url, decode_html(raw, declared_charset))
    return text
