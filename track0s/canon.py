"""URL canonicalization — the gate in front of the URL-seen set.

Pure Python, zero Spark imports: this module is imported verbatim by the
single-process oracle (``reference_impl/spider.py``) and by the Spark
Arrow UDFs (``track0_spark/functions/udfs.py``), so canonical forms are
identical on both sides **by construction** (SURVEY.md §0, §7 M0).

Reference parity: mirrors the canonicalization a track0-style spider
performs before its URL-seen check (reference locus ``track/spider.py``
[PK-med], unverifiable this session — /root/reference is an empty mount,
see SURVEY.md §0). The exact normalization steps below are therefore
*normative for this repo* and frozen; changing any of them is a
fixture-version bump (FIXTURES.md §2).

Normalization steps (RFC 3986 §6 syntax-based):
  1. scheme and host lowercased
  2. fragment stripped
  3. default ports stripped (http:80, https:443)
  4. dot-segments (``.`` / ``..``) resolved in the path
  5. percent-encodings: hex digits uppercased; unreserved characters
     (ALPHA / DIGIT / ``-._~``) decoded
  6. empty path -> "/"
  7. query preserved (order kept), same %-normalization applied
"""

from __future__ import annotations

from urllib.parse import urlsplit, urlunsplit

_DEFAULT_PORTS = {"http": "80", "https": "443"}

_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_HEX = set("0123456789abcdefABCDEF")


def _norm_pct(s: str) -> str:
    """Uppercase %XX hex; decode %XX that encode unreserved chars.

    Malformed escapes (``%`` not followed by two hex digits) are kept
    verbatim — deterministic, never raises.
    """
    if "%" not in s:
        return s
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "%" and i + 2 <= n - 1 and s[i + 1] in _HEX and s[i + 2] in _HEX:
            code = int(s[i + 1 : i + 3], 16)
            ch = chr(code)
            if ch in _UNRESERVED:
                out.append(ch)
            else:
                out.append("%" + s[i + 1 : i + 3].upper())
            i += 3
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments."""
    if not path:
        return path
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out and out[-1] != "":
                out.pop()
                if not out:
                    out = [""]
            continue
        out.append(seg)
    # preserve trailing slash produced by '.'/'..' final segments
    if path.endswith(("/.", "/..")) and (not out or out[-1] != ""):
        out.append("")
    res = "/".join(out)
    if path.startswith("/") and not res.startswith("/"):
        res = "/" + res
    return res


def canonicalize(url: str) -> str:
    """Canonical form of an absolute URL. Pure, total, deterministic.

    Idempotent *by construction*: the returned string is stripped, so the
    output can never carry leading/trailing whitespace that a second pass
    would remove. This kills the whole bug CLASS, not single instances:
    v1 failed on ``'0 #'`` (fragment shielded the trim), v2 fixed that by
    dropping the fragment before trimming but failed on ``'0 ?'`` —
    ``urlsplit`` parses an *empty* query there, ``urlunsplit`` drops the
    bare ``'?'``, and the path's trailing space resurfaces in the output.
    Any such delimiter-drop variant is now harmless because a canonical
    form that ends (or starts) with whitespace is never emitted: whatever
    the inner transform produces, the final ``.strip()`` makes the result
    a fixpoint of the leading/trailing-whitespace dimension, and every
    other transform (lowercase, dot-segment removal, pct-normalization,
    default-port drop) is individually idempotent. The ValueError path
    returns the same pre-processed (already stripped, fragment-free)
    string, so it is a fixpoint too.
    """
    s = url.strip()
    i = s.find("#")
    if i != -1:
        s = s[:i].strip()
    try:
        parts = urlsplit(s)
        # .hostname/.port parse lazily and can themselves raise (e.g.
        # 'http://h:99999/' out-of-range port, 'http://h:8x/') — they
        # must be inside the total-function guard, not after it
        scheme = parts.scheme.lower()
        host = (parts.hostname or "").lower()
        port = parts.port
    except ValueError:
        return s
    if ":" in host:
        host = f"[{host}]"  # IPv6: .hostname strips brackets; restore
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"
    path = _norm_pct(_remove_dot_segments(parts.path))
    if netloc and not path:
        path = "/"
    query = _norm_pct(parts.query)
    return urlunsplit((scheme, netloc, path, query, "")).strip()


#: Frozen PSL-lite: second-level public suffixes under which the
#: registered domain takes THREE labels (www.x.co.uk -> x.co.uk). A
#: deliberately small, frozen subset of the Public Suffix List — enough
#: for the ``original-reg-domain`` rule to behave sanely on the common
#: ccTLD patterns without shipping the full PSL; production swaps in
#: the real list behind the same function (VERDICT r1 missing #6).
_TWO_LEVEL_SUFFIXES = frozenset(
    {
        "co.uk", "org.uk", "net.uk", "ac.uk", "gov.uk",
        "com.au", "net.au", "org.au", "co.jp", "or.jp", "ne.jp",
        "com.br", "com.cn", "com.mx", "co.in", "co.nz", "co.za",
        "com.sg", "com.tr", "com.ar", "co.kr", "com.tw", "com.hk",
    }
)


def registered_domain(host: str, psl=None) -> str:
    """Registrable domain. With ``psl`` (a ``track0s.psl.
    PublicSuffixList``) the full publicsuffix.org algorithm applies —
    wildcards, exceptions, 3+-level suffixes (VERDICT r2 #5). Without
    one, the frozen PSL-lite subset: last two labels, or last three
    when the last two form a known second-level public suffix.
    Single-label hosts (and IPs treated as labels) return unchanged."""
    if psl is not None:
        return psl.registered_domain(host)
    labels = host.split(".")
    if len(labels) < 2:
        return host
    last2 = ".".join(labels[-2:])
    if len(labels) >= 3 and last2 in _TWO_LEVEL_SUFFIXES:
        return ".".join(labels[-3:])
    return last2


def host_of(url: str) -> str:
    """Lowercased hostname of a URL ('' if unparseable)."""
    try:
        return (urlsplit(url).hostname or "").lower()
    except ValueError:
        return ""


def path_of(url: str) -> str:
    try:
        p = urlsplit(url).path
    except ValueError:
        return ""
    return p or "/"


def scheme_of(url: str) -> str:
    try:
        return urlsplit(url).scheme.lower()
    except ValueError:
        return ""
