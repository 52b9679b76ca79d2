"""URL-extension -> content-type map for the ``content-type`` rule test.

The pages store (Common-Crawl-style table, BASELINE.json:15) carries no
HTTP headers, so content-type is derived deterministically from the
canonical URL's extension — frozen normative mapping, same table used by
the oracle and the Spark plan (SURVEY.md §2.3 R8).
"""

from __future__ import annotations

EXT_MIME = {
    "html": "text/html",
    "htm": "text/html",
    "css": "text/css",
    "js": "application/javascript",
    "json": "application/json",
    "png": "image/png",
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "gif": "image/gif",
    "svg": "image/svg+xml",
    "ico": "image/x-icon",
    "pdf": "application/pdf",
    "xml": "application/xml",
    "txt": "text/plain",
    "mp4": "video/mp4",
    "mp3": "audio/mpeg",
    "woff": "font/woff",
    "woff2": "font/woff2",
}

DEFAULT_MIME = "text/html"


def ext_of_path(path: str) -> str:
    """Lowercased extension of the last path segment ('' if none)."""
    seg = path.rsplit("/", 1)[-1]
    if "." not in seg:
        return ""
    return seg.rsplit(".", 1)[-1].lower()


def content_type_for(path: str) -> str:
    return EXT_MIME.get(ext_of_path(path), DEFAULT_MIME)


def is_html(content_type: str) -> bool:
    return content_type.startswith("text/html")


def is_css(content_type: str) -> bool:
    return content_type.startswith("text/css")
