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

    def budget(self, host: str) -> int:
        return self.policy(host).budget_per_round

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
