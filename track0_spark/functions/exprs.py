"""Native Column expressions shared by the round plan (no UDFs).

``content_type_expr`` mirrors ``track0s.mime.content_type_for`` exactly
(same frozen EXT_MIME table, same last-segment extension regexp) so the
``content-type`` rule test agrees between the oracle and the compiled
Column pipeline.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, functions as F

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
