"""Single-process reference spider — the correctness oracle.

A sequential implementation of the exact BSP crawl semantics frozen in
``track0s/config.py``, importing the SAME ``track0s`` pure functions
(canon / rules / extract / robots / mime) as the Spark engine's UDFs and
compiled Columns. The Spark engine must reproduce this oracle's
``crawl_log`` ordering and URL-seen set exactly (BASELINE.json:2,:14);
pytest enforces it (SURVEY.md §5.2.1).

Reference parity note: this plays the role of track0's in-process
spider loop (reference locus ``track/spider.py`` [PK-med]; the
/root/reference mount is empty this session — SURVEY.md §0), restated as
deterministic politeness-budgeted rounds so that a distributed engine
can match it bit-for-bit.

Frozen decision order per fetched page: fetch -> save? -> stop? ->
extract -> per-link (follow? -> robots?) -> in-round dedup -> seen
anti-join -> admit. Seeds are admitted unconditionally (explicit user
intent bypasses robots); all discovered candidates pass robots.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

from urllib.parse import urljoin

from track0s import canon, mime
from track0s.config import CrawlConfig, priority_of
from track0s.extract import decode_html, parse_css, parse_html
from track0s.http import (
    header_content_type,
    redirect_target,
    resolve_redirect,
    retry_after,
)
from track0s.rules import evaluate


@dataclass(frozen=True)
class PageRecord:
    url: str  # canonical URL (store key)
    html: bytes
    text: str
    lang: str
    warc_ts: int  # epoch seconds


@dataclass
class LinkState:
    url_canon: str
    host: str
    depth: int
    domain_depth: int
    via_url: str | None
    via_host: str | None
    src_tag: str | None
    src_attr: str | None
    is_requisite: bool
    discovered_round: int
    attempts: int = 0

    @property
    def priority(self) -> int:
        return priority_of(self.is_requisite)

    def order_key(self):
        # FROZEN per-host order (track0s/config.py docstring)
        return (self.priority, self.depth, self.discovered_round, self.url_canon)


def link_attrs(
    ls: LinkState,
    cfg: CrawlConfig,
    size: int | None = None,
    content_type: str | None = None,
) -> dict:
    path = canon.path_of(ls.url_canon)
    return {
        "url_canon": ls.url_canon,
        "host": ls.host,
        "path": path,
        "protocol": canon.scheme_of(ls.url_canon),
        "depth": ls.depth,
        "domain_depth": ls.domain_depth,
        "via_host": ls.via_host,
        "is_requisite": ls.is_requisite,
        "src_tag": ls.src_tag,
        # post-fetch the in-band header declaration (track0s/http.py)
        # overrides the pre-fetch extension guess — R8 header semantics
        "content_type": content_type or mime.content_type_for(path),
        "size": size,
        "seed_hosts": cfg.seed_hosts,
        "seed_prefixes": cfg.seed_prefixes,
        "psl": cfg.psl,
    }


class OracleSpider:
    def __init__(self, cfg: CrawlConfig, store: dict[str, PageRecord]):
        self.cfg = cfg
        self.store = store
        self.frontier: dict[str, LinkState] = {}
        self.seen: set[str] = set()
        self.crawl_log: list[dict] = []

    def _admit_seed(self, url: str) -> None:
        u = canon.canonicalize(url)
        if u in self.seen:
            return
        self.seen.add(u)
        self.frontier[u] = LinkState(
            u, canon.host_of(u), 0, 0, None, None, None, None, False, 0
        )

    def run(self) -> list[dict]:
        for s in self.cfg.seeds:
            self._admit_seed(s)
        r = 0
        while self.frontier and r < self.cfg.max_rounds:
            self._round(r)
            r += 1
        return self.crawl_log

    def _select_batch(self, r: int) -> list[LinkState]:
        """Per-host ordered budget cut, hosts in lexicographic order."""
        by_host: dict[str, list[LinkState]] = {}
        for ls in self.frontier.values():
            by_host.setdefault(ls.host, []).append(ls)
        batch: list[LinkState] = []
        for host in sorted(by_host):
            pend = sorted(by_host[host], key=LinkState.order_key)
            batch.extend(
                pend[
                    : self.cfg.robots.budget(
                        host, self.cfg.round_period_s
                    )
                ]
            )
        return batch  # already in (host, rank) == fetch_seq order

    def _round(self, r: int) -> None:
        cfg = self.cfg
        batch = self._select_batch(r)
        new_cands: dict[str, LinkState] = {}  # in-round dedup: first wins
        for seq, ls in enumerate(batch):
            del self.frontier[ls.url_canon]
            page = self.store.get(ls.url_canon)
            if page is None:
                status, redir, ctype = 404, None, None
            else:
                # in-band HTTP analogs (track0s/http.py): meta-refresh
                # -> 301; meta content-type overrides the extension guess
                redir = redirect_target(page.html)
                status = 301 if redir else 200
                ctype = header_content_type(page.html)
                # transient-failure tier (in-band 503/Retry-After
                # analog): unavailable until the declared attempt index
                if cfg.retry_max is not None:
                    ra = retry_after(page.html)
                    if ra is not None and ls.attempts < ra:
                        status, redir, ctype = 503, None, None
            size = len(page.html) if page else None
            attrs = link_attrs(ls, cfg, size, content_type=ctype)
            saved = status == 200 and evaluate(cfg.save, attrs, True)
            stop = evaluate(cfg.stop, attrs, False)
            self.crawl_log.append(
                {
                    "round": r,
                    "fetch_seq": seq,
                    "url_canon": ls.url_canon,
                    "host": ls.host,
                    "depth": ls.depth,
                    "domain_depth": ls.domain_depth,
                    "status": status,
                    "saved": saved,
                    "is_requisite": ls.is_requisite,
                    "via_url": ls.via_url,
                }
            )
            if status == 503:
                # politeness defers, retry re-queues: same link state,
                # bumped attempt count, ORIGINAL discovery order key —
                # up to retry_max additional attempts, then dropped
                if ls.attempts + 1 <= cfg.retry_max:
                    self.frontier[ls.url_canon] = replace(
                        ls, attempts=ls.attempts + 1
                    )
                continue
            if stop or page is None:
                continue
            if status == 301:
                # redirect resolution: ONE candidate at the SAME depth
                # (a redirect is not a hop); passes the normal follow +
                # robots + dedup gates like any discovered link
                u = resolve_redirect(ls.url_canon, redir)
                if u is None:
                    continue  # off-policy target (mailto:/js:/fragment)
                h = canon.host_of(u)
                child = LinkState(
                    url_canon=u,
                    host=h,
                    depth=ls.depth,
                    domain_depth=(ls.domain_depth if h == ls.host else 0),
                    via_url=ls.url_canon,
                    via_host=ls.host,
                    src_tag="meta",
                    src_attr="refresh",
                    is_requisite=False,
                    discovered_round=r + 1,
                )
                self._gate_and_admit(child, new_cands)
                continue
            # link extraction per effective content-type: html -> full
            # parse; css -> url(...) requisites; anything else -> leaf
            if mime.is_html(attrs["content_type"]):
                links, _text = parse_html(ls.url_canon, decode_html(page.html))
            elif mime.is_css(attrs["content_type"]):
                links = parse_css(ls.url_canon, decode_html(page.html))
            else:
                continue
            for link in links:
                u = canon.canonicalize(link.url)
                child = LinkState(
                    url_canon=u,
                    host=canon.host_of(u),
                    depth=ls.depth + 1,
                    domain_depth=(
                        ls.domain_depth + 1 if canon.host_of(u) == ls.host else 0
                    ),
                    via_url=ls.url_canon,
                    via_host=ls.host,
                    src_tag=link.tag,
                    src_attr=link.attr,
                    is_requisite=link.is_requisite,
                    discovered_round=r + 1,
                )
                self._gate_and_admit(child, new_cands)
        for u, child in new_cands.items():
            self.seen.add(u)
            self.frontier[u] = child

    def _gate_and_admit(
        self, child: LinkState, new_cands: dict[str, LinkState]
    ) -> None:
        """seen anti-join + in-round first-wins dedup + follow + robots."""
        u = child.url_canon
        if u in self.seen or u in new_cands:
            return
        cattrs = link_attrs(child, self.cfg)
        if not evaluate(self.cfg.follow, cattrs, False):
            return
        if not self.cfg.robots.allowed(child.host, cattrs["path"]):
            return
        new_cands[u] = child
