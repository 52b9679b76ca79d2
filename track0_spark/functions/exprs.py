"""Native Column expressions shared by the round plan (no UDFs).

``content_type_expr`` mirrors ``track0s.mime.content_type_for`` exactly
(same frozen EXT_MIME table, same last-segment extension regexp);
``redirect_target_expr`` / ``header_content_type_expr`` mirror
``track0s.http`` (same SNIFF_BYTES window, same patterns) so redirect
detection and the content-type override agree between the oracle and
the compiled Column pipeline.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, functions as F

from track0s.http import (
    CONTENT_TYPE_PATTERN,
    REDIRECT_PATTERN,
    RETRY_AFTER_PATTERN,
    SNIFF_BYTES,
)
from track0s.mime import DEFAULT_MIME, EXT_MIME

#: extension of the last path segment — matches mime.ext_of_path
_EXT_RE = r"\.([^./]+)$"


def ext_expr(path_col: Column) -> Column:
    return F.lower(F.regexp_extract(path_col, _EXT_RE, 1))


def content_type_expr(path_col: Column) -> Column:
    mime_map = F.create_map(
        *[F.lit(x) for x in chain.from_iterable(EXT_MIME.items())]
    )
    return F.coalesce(mime_map[ext_expr(path_col)], F.lit(DEFAULT_MIME))


def is_html_expr(content_type_col: Column) -> Column:
    return content_type_col.startswith("text/html")


def url_hash_expr(url_canon_col: Column) -> Column:
    """Bucketing/salting hash (never an ordering key — SURVEY.md §4)."""
    return F.xxhash64(url_canon_col)


def _head_expr(html_col: Column) -> Column:
    """First SNIFF_BYTES of the body decoded ISO-8859-1 — the same
    window + charset as ``track0s.http._head``. Latin-1 because the
    sniff must be TOTAL and twin-bit-identical: Spark's UTF-8 decode
    throws MALFORMED_CHARACTER_CODING on any non-UTF-8 head (or a
    multibyte char split at the window edge) and would abort the whole
    round on one bad page, and Java/Python UTF-8 'replace' emit
    different U+FFFD counts; latin-1 never fails and maps bytes 1:1
    identically in both runtimes (the sniff regexes are ASCII)."""
    return F.decode(F.substring(html_col, 1, SNIFF_BYTES), "ISO-8859-1")


def redirect_target_expr(html_col: Column) -> Column:
    """Raw meta-refresh target; NULL when not a redirect (or body NULL).
    Native twin of ``track0s.http.redirect_target``."""
    t = F.regexp_extract(_head_expr(html_col), REDIRECT_PATTERN, 1)
    return F.when(html_col.isNotNull() & (t != ""), t)


def retry_after_expr(html_col: Column) -> Column:
    """In-band 503/Retry-After declaration as INT; NULL when absent.
    Native twin of ``track0s.http.retry_after``."""
    t = F.regexp_extract(_head_expr(html_col), RETRY_AFTER_PATTERN, 1)
    return F.when(html_col.isNotNull() & (t != ""), t.cast("int"))


def header_content_type_expr(html_col: Column) -> Column:
    """In-band declared content-type (lowercased); NULL when absent.
    Native twin of ``track0s.http.header_content_type``."""
    t = F.regexp_extract(_head_expr(html_col), CONTENT_TYPE_PATTERN, 1)
    return F.when(html_col.isNotNull() & (t != ""), F.lower(t))
