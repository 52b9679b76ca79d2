"""Mirror-store path mapping + intra-mirror link rewriting (E4).

Models the mirror layer of a track0-style spider (reference locus
``track/mirror.py`` [PK-med]; /root/reference is an empty mount —
SURVEY.md §0): saved pages land at deterministic local paths and their
links to OTHER saved pages are rewritten to relative paths so the
mirror browses offline; links to unsaved pages keep their absolute
URLs. Pure Python — shared by tests and the Spark operator
(track0_spark/operators/mirror.py).
"""

from __future__ import annotations

import posixpath
import re
from urllib.parse import urljoin, urlsplit

from .canon import canonicalize
from .extract import TAG_ATTRS, decode_html

#: every attribute name that can carry a URL (from the frozen tag map)
URL_ATTRS = sorted({attr for attr, _req in TAG_ATTRS.values()})


def local_path_for(url_canon: str) -> str:
    """Deterministic mirror path: host/path, directories get index.html,
    query strings become a filesystem-safe suffix."""
    parts = urlsplit(url_canon)
    host = (parts.hostname or "unknown").lower()
    path = parts.path or "/"
    if path.endswith("/"):
        path += "index.html"
    segs = [s for s in path.split("/") if s]
    if not segs:
        segs = ["index.html"]
    if "." not in segs[-1]:
        segs[-1] += ".html"
    if parts.query:
        safe_q = re.sub(r"[^A-Za-z0-9_.-]", "_", parts.query)
        segs[-1] += f"_{safe_q}"
    return "/".join([host] + segs)


_ATTR_RE_CACHE: dict[str, re.Pattern] = {}


def _attr_pattern(attr: str) -> re.Pattern:
    pat = _ATTR_RE_CACHE.get(attr)
    if pat is None:
        pat = re.compile(rf"""({attr}\s*=\s*)(["'])([^"']+)(\2)""", re.IGNORECASE)
        _ATTR_RE_CACHE[attr] = pat
    return pat


def rewrite_links(
    page_url_canon: str, html: bytes, mirror_paths: dict[str, str]
) -> bytes:
    """Rewrite URL-attribute values whose canonical target is in
    ``mirror_paths`` to paths relative to this page's mirror location;
    all other bytes pass through untouched. Deterministic; pure."""
    text = decode_html(html)
    page_dir = posixpath.dirname(local_path_for(page_url_canon))

    def sub(m: re.Match) -> str:
        raw = m.group(3)
        try:
            target = canonicalize(urljoin(page_url_canon, raw))
        except ValueError:
            return m.group(0)
        local = mirror_paths.get(target)
        if local is None:
            return m.group(0)
        rel = posixpath.relpath(local, page_dir) if page_dir else local
        return f"{m.group(1)}{m.group(2)}{rel}{m.group(4)}"

    for attr in URL_ATTRS:
        text = _attr_pattern(attr).sub(sub, text)
    return text.encode("utf-8")
