"""robots.txt politeness semantics — longest-match Allow/Disallow.

Normative semantics (SURVEY.md §2.6 P3, upgraded round 2 from the v1
prefix-Disallow-only rule): for a URL's canonical path, find the
longest matching prefix among the host's ``allow_prefixes`` and
``disallow_prefixes``; the URL is allowed iff the longest match is an
Allow, or nothing matches. Equal lengths resolve to Allow — the
Google REP tie-break (public spec, RFC 9309 §2.2.2). Hosts absent
from the table allow everything.

``crawl_delay_s`` maps to the per-round ``budget_per_round`` politeness
budget in the BSP model (there is no wall-clock inside a deterministic
batch round; BASELINE.json:14's "politeness budget" is the knob the
acceptance bar fixes).

Shared verbatim by the oracle and by the Spark plan, where the same
longest-match is expressed natively: per list,
``coalesce(array_max(transform(filter(prefixes, p ->
startswith(path, p)), p -> length(p))), -1)`` — allowed iff
best_allow >= best_disallow (plans/round.py P3).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

DEFAULT_BUDGET = 100


@dataclass(frozen=True)
class HostPolicy:
    host: str
    disallow_prefixes: tuple[str, ...] = ()
    crawl_delay_s: float = 0.0
    budget_per_round: int = DEFAULT_BUDGET
    allow_prefixes: tuple[str, ...] = ()


def _best_match(path: str, prefixes: tuple[str, ...]) -> int:
    """Length of the longest prefix matching ``path`` (-1 if none)."""
    best = -1
    for p in prefixes:
        if path.startswith(p) and len(p) > best:
            best = len(p)
    return best


@dataclass
class RobotsTable:
    policies: dict[str, HostPolicy] = field(default_factory=dict)
    default_budget: int = DEFAULT_BUDGET

    def policy(self, host: str) -> HostPolicy:
        return self.policies.get(host) or HostPolicy(host, (), 0.0, self.default_budget)

    def allowed(self, host: str, path: str) -> bool:
        pol = self.policy(host)
        return _best_match(path, pol.allow_prefixes) >= _best_match(
            path, pol.disallow_prefixes
        )

    def budget(self, host: str, round_period_s: float | None = None) -> int:
        """Per-round politeness budget, optionally Crawl-delay-capped.

        With ``round_period_s`` set (the BSP round's nominal wall — the
        config knob that maps wall-clock politeness onto deterministic
        rounds), a host declaring ``Crawl-delay: d`` is capped at
        ``max(1, floor(period / d))`` fetches per round — the number of
        d-spaced requests that fit in one round — never below 1 so a
        pathological delay degrades to one fetch per round instead of
        starving the host forever. Without the knob (the default),
        Crawl-delay is carried but budget_per_round alone applies
        (pre-round-5 behavior, golden-pinned). The Spark plan computes
        the identical least/greatest/floor in native Columns
        (operators/topk.py _with_budget); both sides share IEEE double
        division, so parity is exact."""
        pol = self.policy(host)
        b = pol.budget_per_round
        if round_period_s is not None and pol.crawl_delay_s > 0:
            b = min(b, max(1, math.floor(round_period_s / pol.crawl_delay_s)))
        return b

    @staticmethod
    def from_parquet(path: str, default_budget: int = DEFAULT_BUDGET) -> "RobotsTable":
        """Load a ROBOTS-schema parquet artifact (budgets_from_rank /
        robots_rows_from_pages output) into the SINGLE-PROCESS oracle's
        table. This is the oracle/test-tier mirror of the storage
        artifact: the Spark engine never materializes these rows on the
        driver (it passes the DataFrame straight to RoundPlanner via
        ``robots_df=``); the sequential reference spider is by
        definition one process, so holding the table in memory here is
        its contract, not a scale bug. Both engines reading the same
        file is what keeps quality-biased crawls parity-by-construction.
        """
        import pyarrow.parquet as pq

        tbl = pq.read_table(path)
        names = tbl.column_names
        cols = {n: tbl.column(n).to_pylist() for n in names}
        rows = [
            (
                cols["host"][i],
                cols["disallow_prefixes"][i] or (),
                cols["crawl_delay_s"][i] or 0.0,
                cols["budget_per_round"][i],
                (cols.get("allow_prefixes") or [None] * tbl.num_rows)[i] or (),
            )
            for i in range(tbl.num_rows)
        ]
        return RobotsTable.from_rows(rows, default_budget=default_budget)

    @staticmethod
    def from_rows(rows, default_budget: int = DEFAULT_BUDGET) -> "RobotsTable":
        """rows: (host, disallow_prefixes, crawl_delay_s, budget) or the
        5-field form with a trailing allow_prefixes list."""
        t = RobotsTable(default_budget=default_budget)
        for row in rows:
            host, prefixes, delay, budget = row[:4]
            allow = tuple(row[4]) if len(row) > 4 and row[4] else ()
            t.policies[host] = HostPolicy(
                host,
                tuple(prefixes or ()),
                float(delay or 0.0),
                int(budget) if budget is not None else default_budget,
                allow,
            )
        return t


def parse_robots_txt(
    text: str, agent: str = "*"
) -> tuple[tuple[str, ...], tuple[str, ...], float]:
    """Parse robots.txt body text (RFC 9309 subset) for one agent ->
    ``(allow_prefixes, disallow_prefixes, crawl_delay_s)``.

    Group model per the RFC: consecutive ``User-agent`` lines open a
    group sharing the rules that follow; a ``User-agent`` after rules
    starts a new group.  Agent selection: if any group names a token
    contained in ``agent`` (case-insensitive), ONLY those groups
    apply; otherwise the ``*`` groups do (RFC 9309 §2.2.1 — specific
    beats wildcard, no merging across specificity levels).  An empty
    ``Disallow:`` means allow-everything and contributes no prefix.
    ``Crawl-delay`` is the de-facto extension (not in the RFC, honored
    by most engines); unparseable values are ignored.  Comments (#)
    and unknown directives are skipped — parsers must be lenient.
    """
    groups: list[tuple[list[str], list[tuple[str, str]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, str]] = []
    in_rules = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        k, v = line.split(":", 1)
        k, v = k.strip().lower(), v.strip()
        if k == "user-agent":
            if in_rules:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules, in_rules = [], [], False
            cur_agents.append(v.lower())
        elif k in ("allow", "disallow", "crawl-delay"):
            in_rules = True
            if cur_agents:
                cur_rules.append((k, v))
    if cur_agents:
        groups.append((cur_agents, cur_rules))

    def collect(pred):
        allow: list[str] = []
        dis: list[str] = []
        delay = 0.0
        found = False
        for agents, rules in groups:
            if not any(pred(a) for a in agents):
                continue
            found = True
            for k, v in rules:
                if k == "allow" and v:
                    allow.append(v)
                elif k == "disallow" and v:
                    dis.append(v)
                elif k == "crawl-delay":
                    try:
                        delay = float(v)
                    except ValueError:
                        pass
        return found, tuple(allow), tuple(dis), delay

    a = agent.lower()
    found, allow, dis, delay = collect(lambda g: g != "*" and g and g in a)
    if not found:
        _, allow, dis, delay = collect(lambda g: g == "*")
    return allow, dis, delay


def robots_table_from_texts(
    items, agent: str = "*", default_budget: int = DEFAULT_BUDGET
) -> "RobotsTable":
    """(host, robots.txt body) pairs -> RobotsTable, via
    :func:`parse_robots_txt`.  The same table object drives the oracle
    spider and (as rows) the Spark plan, so archive-derived politeness
    keeps exact engine parity by construction."""
    t = RobotsTable(default_budget=default_budget)
    for host, body in items:
        allow, dis, delay = parse_robots_txt(body or "", agent)
        t.policies[host] = HostPolicy(host, dis, delay, default_budget, allow)
    return t
