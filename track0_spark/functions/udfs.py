"""Vectorized Arrow UDF stages — the ONLY JVM->Python crossings.

One fused ``mapInPandas`` pass per round does HTML link extraction +
relative-URL resolution + canonicalization (SURVEY.md §2.5 E1–E3 fused
with §2.2 U1/U2: one Python round-trip, not three). The parsing itself
is ``track0s.extract`` / ``track0s.canon`` — the exact functions the
single-process oracle runs, so per-URL output is byte-identical by
construction (BASELINE.json:15).

Rows come back **pre-exploded** (one output row per link) rather than
as ArrayType + ``F.explode`` — cheaper through Arrow and keeps the
child-row schema flat. No per-row Python UDFs anywhere (input_hint).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from track0s.canon import canonicalize, host_of, path_of, scheme_of
from track0s.extract import decode_html, parse_css, parse_html

#: input columns the extract pass needs (column-pruned before the UDF).
#: ``fetch_seq`` is the parent's global fetch order (a per-host-offset
#: broadcast join, operators/topk.py) — one BIGINT that totally orders
#: parents, so in-round dedup can hash-aggregate over a packed primitive
#: key instead of sort-aggregating over a (via_host, rank, idx) struct.
EXTRACT_INPUT_COLS = [
    "url_canon",
    "host",
    "depth",
    "domain_depth",
    "fetch_seq",
    "status",
    "content_type",
    "html",
]

#: link_idx bits in the packed dedup order key (plans/round.py D1):
#: _ord = parent_seq << LINK_IDX_BITS | link_idx. The extractor asserts
#: pages stay under 2^28 links so the pack is collision-free — a bound
#: no physical page reaches (2^28 anchors is >1 GB of markup; r2 review
#: widened it from 2^20, which a pathological page could hit and wedge
#: the crawl). parent_seq keeps 63-28 = 35 bits = 3.4e10 fetches, 3.4x
#: the 10^10 design point. Truncating instead of raising is NOT an
#: option: the oracle spider admits every link, so a silent cap would
#: diverge the seen set on exactly the adversarial input that trips it.
LINK_IDX_BITS = 28


def make_extract_candidates(bloom=None):
    """Factory for the fused extract pass, optionally closing over a
    broadcast PartitionedBloom. The bloom probe rides the SAME Python
    crossing as extraction (zero extra JVM<->Python round-trips —
    SURVEY.md §4 bloom row): each candidate gets its h64 bloom key and
    a ``maybe_seen`` verdict; definitely-new rows later skip the exact
    anti-join entirely. With no bloom every row is ``maybe_seen`` and
    the plan degenerates to the plain exact anti-join."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from track0s.hashing import h64

        blm = bloom.value if bloom is not None else None
        for pdf in _extract_candidates_batches(batches):
            keys = np.fromiter(
                (h64(u) & 0x7FFF_FFFF_FFFF_FFFF for u in pdf["url_canon"]),
                dtype=np.int64,
                count=len(pdf),
            )
            pdf["url_h64"] = keys
            if blm is None:
                pdf["maybe_seen"] = np.ones(len(pdf), dtype=bool)
            else:
                pdf["maybe_seen"] = blm.might_contain_many(keys)
            yield pdf

    return extract


def _extract_candidates_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """(parent page rows) -> (one row per extracted link), document order.

    Parents with status 301 (decided NATIVELY by redirect_target_expr —
    this pass only reads the verdict) emit exactly ONE candidate: the
    urljoin-resolved meta-refresh target, tagged is_redirect so depth
    propagation skips the +1 (a redirect is not a hop; track0s/http.py).
    """
    from urllib.parse import urljoin

    from track0s.http import redirect_target, resolve_redirect

    dtypes = {
        "url_canon": object,
        "host": object,
        "path": object,
        "protocol": object,
        "src_tag": object,
        "src_attr": object,
        "is_requisite": bool,
        "parent_seq": "int64",
        "link_idx": "int32",
        "via_url": object,
        "via_host": object,
        "parent_depth": "int32",
        "parent_domain_depth": "int32",
        "is_redirect": bool,
    }
    cols = list(dtypes)
    for pdf in batches:
        out: dict[str, list] = {c: [] for c in cols}

        def emit(uc, tag, attr, req, seq, idx, url, host, depth, dd, redir):
            out["url_canon"].append(uc)
            out["host"].append(host_of(uc))
            out["path"].append(path_of(uc))
            out["protocol"].append(scheme_of(uc))
            out["src_tag"].append(tag)
            out["src_attr"].append(attr)
            out["is_requisite"].append(req)
            out["parent_seq"].append(int(seq))
            out["link_idx"].append(idx)
            out["via_url"].append(url)
            out["via_host"].append(host)
            out["parent_depth"].append(int(depth))
            out["parent_domain_depth"].append(int(dd))
            out["is_redirect"].append(redir)

        for url, host, depth, dd, seq, status, ctype, html in zip(
            pdf["url_canon"],
            pdf["host"],
            pdf["depth"],
            pdf["domain_depth"],
            pdf["fetch_seq"],
            pdf["status"],
            pdf["content_type"],
            pdf["html"],
        ):
            if status == 301:
                target = redirect_target(bytes(html))
                uc = (
                    resolve_redirect(url, target) if target is not None else None
                )
                if uc is not None:  # off-policy targets emit nothing
                    emit(uc, "meta", "refresh", False, seq, 0,
                         url, host, depth, dd, True)
                continue
            if ctype is not None and ctype.startswith("text/css"):
                links = parse_css(url, decode_html(bytes(html)))
            else:
                links, _ = parse_html(url, decode_html(bytes(html)))
            if len(links) >= (1 << LINK_IDX_BITS):  # keep _ord pack unique
                raise ValueError(
                    f"{url}: {len(links)} links exceeds the 2^{LINK_IDX_BITS}"
                    " packed-dedup-key bound (plans/round.py D1)"
                )
            for idx, link in enumerate(links):
                uc = canonicalize(link.url)
                emit(uc, link.tag, link.attr, link.is_requisite, seq, idx,
                     url, host, depth, dd, False)
        yield pd.DataFrame(
            {c: pd.Series(out[c], dtype=dtypes[c]) for c in cols}
        )


def extract_text_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """(url, html) -> (url, text) — byte-identical to the oracle parser."""
    for pdf in batches:
        texts = [
            parse_html(u, decode_html(bytes(h)))[1]
            for u, h in zip(pdf["url"], pdf["html"])
        ]
        yield pd.DataFrame({"url": pdf["url"], "text": texts})


def canon_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """url -> url_canon (standalone U1 stage; round plan uses the fused pass)."""
    for pdf in batches:
        yield pd.DataFrame(
            {"url": pdf["url"], "url_canon": [canonicalize(u) for u in pdf["url"]]}
        )
