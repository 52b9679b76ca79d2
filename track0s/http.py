"""In-band HTTP-semantics analogs over stored page bytes (E-2 fetch).

The input table is the fixed Common-Crawl-style 5-column shape
(BASELINE.json:15) — there is no headers column — so the two header
behaviors a real spider needs are modeled IN-BAND, the way an archived
crawl preserves them:

* **Redirects** (VERDICT r1 "What's missing" #2): a page whose head
  carries ``<meta http-equiv="refresh" content="0; url=TARGET">`` is a
  redirect analog. The engine logs it with status 301, skips save/
  extract, and admits the (resolved, canonicalized) target into the
  frontier at the SAME depth (a redirect is not a hop; domain_depth
  resets to 0 on host change, per U6). Targets pass the normal @follow
  rules + robots gates — a redirect may not drag the crawl off-policy.

* **Header content-type** (VERDICT r1 "What's missing" #3): a
  ``<meta http-equiv="content-type" content="MIME">`` declaration
  overrides the URL-extension guess for fetched pages (R8 @save rules
  and the extract-eligibility check); the extension mapping stays the
  fallback, and the only guess available pre-fetch.

NORMATIVE + FROZEN: detection reads the first ``SNIFF_BYTES`` bytes
decoded ISO-8859-1 (total + twin-bit-identical; see ``_head``) and
applies the regexes below. The Spark plan evaluates the same window/
patterns natively (``F.regexp_extract(F.decode(F.substring(html, 1,
SNIFF_BYTES), 'ISO-8859-1')…)`` — track0_spark/functions/exprs.py), so
oracle and engine agree byte-for-byte on ANY input; pages whose
declaration straddles the window boundary are out of fixture scope
(FIXTURES.md §2, fixture version 2).
"""

from __future__ import annotations

import re

SNIFF_BYTES = 2048

#: group 1 = raw redirect target (may be relative; caller resolves)
REDIRECT_PATTERN = (
    r"""(?i)<meta\s[^>]*http-equiv\s*=\s*["']?refresh["']?"""
    r"""[^>]*content\s*=\s*["']?\s*\d+\s*;\s*url\s*=\s*([^"'> ]+)"""
)

#: group 1 = declared mime type
CONTENT_TYPE_PATTERN = (
    r"""(?i)<meta\s[^>]*http-equiv\s*=\s*["']?content-type["']?"""
    r"""[^>]*content\s*=\s*["']?([a-z0-9/+.-]+)"""
)

#: group 1 = attempt index from which the fetch succeeds (the in-band
#: analog of a 503 + Retry-After header: the page is transiently
#: unavailable until the crawler's Nth retry — see retry_after())
RETRY_AFTER_PATTERN = (
    r"""(?i)<meta\s[^>]*http-equiv\s*=\s*["']?retry-after["']?"""
    r"""[^>]*content\s*=\s*["']?(\d+)"""
)

# re.ASCII: Java regex \s and \d are ASCII-only; Python's default str
# semantics are Unicode, so after the latin-1 decode a NBSP (0xA0 ->
# U+00A0) would satisfy Python \s but not the Spark twin's. The
# patterns themselves are pure ASCII, so ASCII mode changes nothing
# else — it makes \s == [ \t\n\x0B\f\r] and \d == [0-9] on both sides.
_REDIRECT_RE = re.compile(REDIRECT_PATTERN, re.ASCII)
_CONTENT_TYPE_RE = re.compile(CONTENT_TYPE_PATTERN, re.ASCII)
_RETRY_AFTER_RE = re.compile(RETRY_AFTER_PATTERN, re.ASCII)


def _head(html: bytes) -> str:
    # latin-1: total (never fails) and byte-identical across Python and
    # the JVM — UTF-8-with-replacement is neither (Spark's decode throws
    # on malformed heads; Java and Python emit different U+FFFD counts).
    # The sniff regexes are ASCII, so matching is unaffected for valid
    # pages; non-ASCII bytes inside a captured URL map 1:1 in both twins.
    return html[:SNIFF_BYTES].decode("iso-8859-1")


def redirect_target(html: bytes) -> str | None:
    """Raw meta-refresh target ('' never returned; None = not a redirect)."""
    m = _REDIRECT_RE.search(_head(html))
    return m.group(1) if m else None


def header_content_type(html: bytes) -> str | None:
    """Declared in-band content-type (lowercased), or None."""
    m = _CONTENT_TYPE_RE.search(_head(html))
    return m.group(1).lower() if m else None


def retry_after(html: bytes) -> int | None:
    """In-band 503/Retry-After analog (round 5): a page declaring
    ``<meta http-equiv="retry-after" content="N">`` answers 503 on
    attempts 0..N-1 and serves its content from attempt N on — how an
    archived crawl preserves "this URL was transiently down and
    recovered after N retries". Returns N, or None when the page
    carries no declaration. Only consulted when the retry tier is
    enabled (CrawlConfig.retry_max is not None), so crawls without the
    knob never change behavior."""
    m = _RETRY_AFTER_RE.search(_head(html))
    return int(m.group(1)) if m else None


def resolve_redirect(base_url: str, target: str) -> str | None:
    """Canonicalized redirect destination, or None if the target fails
    the SAME filtering every extracted link gets (fragment-only, skip
    schemes like mailto:/javascript:/data:, non-http(s) result) — a
    redirect may not drag the crawl off-policy through a gap the <a>
    path does not have. Delegates to extract.resolve_link, the single
    shared admission policy (r2 review: this was a third hand-copy),
    so the oracle spider, the Spark extract UDF, and both link paths
    cannot drift."""
    from .canon import canonicalize
    from .extract import resolve_link

    absu = resolve_link(base_url, target)
    return canonicalize(absu) if absu is not None else None
