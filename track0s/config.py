"""CrawlConfig — the full, serializable crawl policy.

One config object drives BOTH backends: the single-process oracle
(``reference_impl/spider.py``) and the distributed Spark loop
(``track0_spark/plans/loop.py``). "Same seed list + politeness budget"
(BASELINE.json:2,:14) means: same CrawlConfig.

FROZEN ORDERING SEMANTICS (normative — the reproducibility contract;
SURVEY.md §2.6, §4 determinism row). Both backends implement exactly:

  * The crawl is a deterministic BSP round loop. Round r fetches a batch
    selected from the pending frontier; leftovers stay pending.
  * Per-host order of pending URLs:
        (priority, depth, discovered_round, url_canon)  ascending
    where priority = 0 for requisites else 1. Every key is a pure
    function of the link — no sequence numbers, no hashes, no partition
    ids — so any implementation that sorts agrees.
  * Per-host budget: first ``budget_per_round(host)`` in that order are
    fetched this round (politeness).
  * Global fetch order within a round (``fetch_seq``): batch rows sorted
    by (host, per-host rank) — i.e. hosts in lexicographic order, each
    host's slice in per-host order.
  * In-round duplicate discoveries of one URL keep the first by
    (parent fetch_seq, link position in parent document); its depth /
    via / tag attributes are the ones that persist.
  * Cross-round: a URL ever admitted to the frontier (seeds included)
    is in the seen set and is never admitted again.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from . import canon
from .robots import DEFAULT_BUDGET, RobotsTable
from .rules import DEFAULTS, Rule, parse_pipeline

REQUISITE_PRIORITY = 0
NORMAL_PRIORITY = 1


def priority_of(is_requisite: bool) -> int:
    return REQUISITE_PRIORITY if is_requisite else NORMAL_PRIORITY


@dataclass
class CrawlConfig:
    seeds: list[str]
    follow: list[Rule] = field(default_factory=list)
    save: list[Rule] = field(default_factory=list)
    stop: list[Rule] = field(default_factory=list)
    robots: RobotsTable = field(default_factory=RobotsTable)
    default_budget: int = DEFAULT_BUDGET
    max_rounds: int = 100
    #: nominal wall-clock of one BSP round; when set, robots Crawl-delay
    #: caps each host's budget at max(1, floor(period/delay)) on BOTH
    #: engines (track0s/robots.py budget / operators/topk.py)
    round_period_s: float | None = None
    #: transient-failure retry tier: when set, a fetch answering the
    #: in-band 503 analog (track0s/http.py retry_after) re-enters the
    #: frontier with attempts+1, up to retry_max ADDITIONAL attempts
    #: (retry_max+1 fetches total); None (default) disables the tier
    #: entirely — the 503 sniff is never evaluated
    retry_max: int | None = None
    #: optional Public Suffix List for original-reg-domain (track0s/psl.py);
    #: None -> the frozen PSL-lite subset in canon.registered_domain
    psl: object = None

    # derived (filled in __post_init__)
    seed_canon: list[str] = field(default_factory=list)
    seed_hosts: frozenset = frozenset()
    seed_prefixes: tuple = ()

    def __post_init__(self):
        self.seed_canon = [canon.canonicalize(s) for s in self.seeds]
        self.seed_hosts = frozenset(canon.host_of(s) for s in self.seed_canon)
        # 'down' test: at-or-below each seed URL's directory
        prefixes = []
        for s in self.seed_canon:
            prefixes.append(s.rsplit("/", 1)[0] + "/")
        self.seed_prefixes = tuple(sorted(set(prefixes)))
        self.robots.default_budget = self.default_budget

    @staticmethod
    def from_specs(
        seeds,
        follow: str = "+original-domain",
        save: str = "",
        stop: str = "",
        robots: RobotsTable | None = None,
        default_budget: int = DEFAULT_BUDGET,
        max_rounds: int = 100,
        psl_path: str | None = None,
        round_period_s: float | None = None,
        retry_max: int | None = None,
    ) -> "CrawlConfig":
        psl = None
        if psl_path is not None:
            from .psl import PublicSuffixList

            psl = PublicSuffixList.from_file(psl_path)
        return CrawlConfig(
            seeds=list(seeds),
            follow=parse_pipeline(follow),
            save=parse_pipeline(save),
            stop=parse_pipeline(stop),
            robots=robots or RobotsTable(default_budget=default_budget),
            default_budget=default_budget,
            max_rounds=max_rounds,
            psl=psl,
            round_period_s=round_period_s,
            retry_max=retry_max,
        )

    def rule_defaults(self) -> dict:
        return dict(DEFAULTS)
