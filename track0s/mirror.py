"""Mirror-store path mapping + intra-mirror link rewriting (E4).

Models the mirror layer of a track0-style spider (reference locus
``track/mirror.py`` [PK-med]; /root/reference is an empty mount —
SURVEY.md §0): saved pages land at deterministic local paths and their
links to OTHER saved pages are rewritten to relative paths so the
mirror browses offline; links to unsaved pages keep their absolute
URLs. Pure Python — shared by tests and the Spark operator
(track0_spark/operators/mirror.py).

Path-collision policy (ADVICE r1 #1): ``local_path_for`` alone is NOT
injective ('/p/7' and '/p/7.html' both map to 'p/7.html'; '/d/' and
'/d/index.html' both map to 'd/index.html'). ``assign_paths`` resolves
a whole mirror set: URLs whose naive paths collide get a deterministic
``.~<h64 hex>`` infix before the extension, so the final index is
unique (residual risk: a disambiguated name colliding with another
URL's naive path needs a blake2b-64 collision AND matching directory —
materialize_mirror still asserts global uniqueness and fails loudly).

Charset policy (ADVICE r1 #3): pages with zero rewritten links pass
through BYTE-IDENTICAL. Rewritten pages are re-encoded UTF-8 with any
``<meta charset=…>`` / ``http-equiv Content-Type charset=…``
declaration updated to utf-8, so non-UTF-8 mirrored pages render
correctly offline.
"""

from __future__ import annotations

import posixpath
import re
from urllib.parse import urljoin, urlsplit

from .canon import canonicalize
from .extract import TAG_ATTRS, decode_html
from .hashing import h64

#: every attribute name that can carry a URL (from the frozen tag map)
URL_ATTRS = sorted({attr for attr, _req in TAG_ATTRS.values()})


def _safe_seg(seg: str) -> str:
    """Neutralize filesystem-special path segments. canonicalize()
    percent-DECODES after dot-segment removal, so a URL like
    '/%2e%2e/%2e%2e/tmp/x' canonicalizes with literal '..' segments —
    written as-is under a mirror root, that is a path-traversal write
    OUTSIDE the root (r2 review). '.'/'..' become their percent forms
    (no dot characters, so the filesystem cannot re-interpret them);
    deterministic, shared by the oracle and the Spark index."""
    return {".": "%2E", "..": "%2E%2E"}.get(seg, seg)


def local_path_for(url_canon: str) -> str:
    """Deterministic NAIVE mirror path: host/path, directories get
    index.html, query strings become a filesystem-safe suffix. Not
    injective on its own — see ``assign_paths``."""
    parts = urlsplit(url_canon)
    host = _safe_seg((parts.hostname or "unknown").lower())
    path = parts.path or "/"
    if path.endswith("/"):
        path += "index.html"
    segs = [_safe_seg(s) for s in path.split("/") if s]
    if not segs:
        segs = ["index.html"]
    if "." not in segs[-1]:
        segs[-1] += ".html"
    if parts.query:
        safe_q = re.sub(r"[^A-Za-z0-9_.-]", "_", parts.query)
        segs[-1] += f"_{safe_q}"
    return "/".join([host] + segs)


def disambiguated_path(url_canon: str, naive_path: str) -> str:
    """Collision-free variant: ``p/7.html`` -> ``p/7.~<hex16>.html``.
    Pure function of the URL — two colliding URLs get distinct suffixes
    (unless their 64-bit blake2b hashes collide)."""
    stem, dot, ext = naive_path.rpartition(".")
    tag = f"~{h64(url_canon) & 0x7FFF_FFFF_FFFF_FFFF:016x}"
    if not dot:  # no extension — just append
        return f"{naive_path}.{tag}"
    return f"{stem}.{tag}.{ext}"


def assign_paths(urls) -> dict[str, str]:
    """url_canon -> unique local path for a whole mirror set.

    Naive paths that are unique stay naive (pretty); colliding groups
    all switch to the disambiguated form. Deterministic function of the
    set. The Spark operator (track0_spark/operators/mirror.py) computes
    the same assignment distributed; equality is pytest-asserted."""
    naive = {u: local_path_for(u) for u in urls}
    counts: dict[str, int] = {}
    for p in naive.values():
        counts[p] = counts.get(p, 0) + 1
    return {
        u: (p if counts[p] == 1 else disambiguated_path(u, p))
        for u, p in naive.items()
    }


_ATTR_RE_CACHE: dict[str, re.Pattern] = {}


def _attr_pattern(attr: str) -> re.Pattern:
    """Quoted URL-attribute matcher. ``(?<![\\w-])`` anchors the
    attribute name so ``src=`` does not match inside ``data-src=``
    (ADVICE r1 #2)."""
    pat = _ATTR_RE_CACHE.get(attr)
    if pat is None:
        pat = re.compile(
            rf"""(?<![\w-])({attr}\s*=\s*)(["'])([^"']+)(\2)""", re.IGNORECASE
        )
        _ATTR_RE_CACHE[attr] = pat
    return pat


_META_CHARSET_RE = re.compile(
    r"""(<meta[^>]{0,200}?charset\s*=\s*["']?)([A-Za-z0-9_.:-]+)""",
    re.IGNORECASE,
)


def link_targets(page_url_canon: str, html: bytes) -> set[str]:
    """Canonical URLs this page's URL attributes point at — exactly the
    candidate set ``rewrite_links`` would look up, so a join against the
    mirror index using these targets resolves every rewrite."""
    text = decode_html(html)
    out: set[str] = set()
    for attr in URL_ATTRS:
        for m in _attr_pattern(attr).finditer(text):
            try:
                out.add(canonicalize(urljoin(page_url_canon, m.group(3))))
            except ValueError:
                continue
    return out


def rewrite_links(
    page_url_canon: str,
    html: bytes,
    mirror_paths: dict[str, str],
    page_local_path: str | None = None,
) -> bytes:
    """Rewrite URL-attribute values whose canonical target is in
    ``mirror_paths`` to paths relative to this page's mirror location.

    Pages with no rewritten link return the ORIGINAL bytes unchanged
    (no silent transcoding). Rewritten pages re-encode UTF-8 with their
    meta charset declaration updated to match. Deterministic; pure.

    ``page_local_path`` is this page's own (possibly disambiguated)
    mirror path; defaults to the naive mapping for callers without a
    collision-resolved index."""
    text = decode_html(html)
    own = page_local_path or local_path_for(page_url_canon)
    page_dir = posixpath.dirname(own)
    n_subs = 0

    def sub(m: re.Match) -> str:
        nonlocal n_subs
        raw = m.group(3)
        try:
            target = canonicalize(urljoin(page_url_canon, raw))
        except ValueError:
            return m.group(0)
        local = mirror_paths.get(target)
        if local is None:
            return m.group(0)
        rel = posixpath.relpath(local, page_dir) if page_dir else local
        if rel == raw:
            return m.group(0)
        n_subs += 1
        return f"{m.group(1)}{m.group(2)}{rel}{m.group(4)}"

    for attr in URL_ATTRS:
        text = _attr_pattern(attr).sub(sub, text)
    if n_subs == 0:
        return html  # byte-identical pass-through, no transcode
    text = _META_CHARSET_RE.sub(lambda m: m.group(1) + "utf-8", text)
    return text.encode("utf-8")
