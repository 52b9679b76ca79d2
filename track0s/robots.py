"""robots.txt politeness semantics — v1: prefix-Disallow only.

Normative v1 semantics (SURVEY.md §2.6 P3): a URL is disallowed for a
host iff its canonical path starts with any of that host's
``disallow_prefixes``. Longest-match Allow/Disallow resolution is a
documented post-v1 extension. ``crawl_delay_s`` maps to the per-round
``budget_per_round`` politeness budget in the BSP model (there is no
wall-clock inside a deterministic batch round; BASELINE.json:14's
"politeness budget" is the knob the acceptance bar fixes).

Shared verbatim by the oracle and by the Spark plan, where the same
predicate is expressed natively as
``F.exists(disallow_prefixes, lambda p: path.startswith(p))``.
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


@dataclass
class RobotsTable:
    policies: dict[str, HostPolicy] = field(default_factory=dict)
    default_budget: int = DEFAULT_BUDGET

    def policy(self, host: str) -> HostPolicy:
        return self.policies.get(host) or HostPolicy(host, (), 0.0, self.default_budget)

    def allowed(self, host: str, path: str) -> bool:
        return not any(path.startswith(p) for p in self.policy(host).disallow_prefixes)

    def budget(self, host: str) -> int:
        return self.policy(host).budget_per_round

    @staticmethod
    def from_rows(rows, default_budget: int = DEFAULT_BUDGET) -> "RobotsTable":
        """rows: iterable of (host, disallow_prefixes, crawl_delay_s, budget)."""
        t = RobotsTable(default_budget=default_budget)
        for host, prefixes, delay, budget in rows:
            t.policies[host] = HostPolicy(
                host,
                tuple(prefixes or ()),
                float(delay or 0.0),
                int(budget) if budget is not None else default_budget,
            )
        return t
