"""track0-style rule pipelines: parser + AST + single-process evaluator.

A crawl policy is three ordered rule pipelines — ``@follow`` (fetch this
URL?), ``@save`` (persist the body?), ``@stop`` (fetch/save but do not
descend into its links) — each a list of ``+test`` (allow) / ``-test``
(deny) entries evaluated in order with **last matching rule's sign
winning** (normative choice per SURVEY.md §2.3; the real track0's match
policy is unverifiable this session — /root/reference is empty, SURVEY.md
§0). Defaults when no rule matches: follow=deny, save=allow, stop=deny.

Rule syntax (one token per rule):
    [+-]TEST              boolean test            e.g. ``+original-domain``
    [+-]TEST<op>NUMBER    numeric comparison      e.g. ``-depth>3``
    [+-]TEST=GLOB         glob match (* and ?)    e.g. ``-url=*forum*``

Numeric ops: ``<= >= < > =``.  Boolean tests: ``original-domain``,
``original-reg-domain`` (PSL-lite registrable domain, so
``www.x.com`` matches a seed at ``x.com``), ``same-domain``, ``down``,
``requisite``.  Numeric tests: ``depth``,
``domain-depth``, ``size``.  String/glob tests: ``url`` ``path``
``domain`` ``protocol`` ``tag`` ``content-type``.

The AST (list of :class:`Rule`) has exactly two interpreters:
  * :func:`evaluate` here (pure Python — used by the oracle and pytest),
  * ``track0_spark.functions.rules_compile.compile_rules`` (the same AST
    folded into one native ``CASE WHEN`` Column chain — no UDF, fully
    codegen'd; SURVEY.md §2.3 R12).
One parser, two backends: decisions agree by construction.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from functools import lru_cache

BOOL_TESTS = frozenset(
    {
        "original-domain",  # exact hostname ∈ seed hostnames
        "original-reg-domain",  # PSL-lite registrable domain ∈ seed reg-domains
        "same-domain",
        "down",
        "requisite",
    }
)
NUM_TESTS = frozenset(
    {
        "depth",
        "domain-depth",
        "size",
        # crawler-trap defenses (derived numeric signals; public
        # heuristics every production crawler ships — infinite
        # calendar/session-id/symlink-loop spaces):
        "path-loop",  # longest run of CONSECUTIVE equal path segments
        "path-depth",  # number of path segments
        "query-params",  # number of non-empty query parameters
    }
)
STR_TESTS = frozenset({"url", "path", "domain", "protocol", "tag", "content-type"})

NUM_OPS = ("<=", ">=", "<", ">", "=")

#: Link attributes a rule test reads, by test name. The same names are
#: column names in the Spark ``frontier``/``fetched`` DataFrames.
TEST_ATTR = {
    "depth": "depth",
    "domain-depth": "domain_depth",
    "size": "size",
    "url": "url_canon",
    "path": "path",
    "domain": "host",
    "protocol": "protocol",
    "tag": "src_tag",
    "content-type": "content_type",
    "requisite": "is_requisite",
    "path-loop": "path",
    "path-depth": "path",
    "query-params": "url_canon",
}

#: Defaults per decision point when no rule matches (normative, §2.3).
DEFAULTS = {"follow": False, "save": True, "stop": False}


@dataclass(frozen=True)
class Rule:
    sign: bool  # True for '+', False for '-'
    test: str  # e.g. 'depth', 'original-domain'
    op: str | None  # numeric op, or None for bool/glob tests
    value: object  # int for numeric, str glob for string, None for bool


class RuleSyntaxError(ValueError):
    pass


_TOKEN_RE = re.compile(r"^([+-])([a-z][a-z-]*)(?:(<=|>=|<|>|=)(.*))?$")


def glob_to_regex(glob: str) -> str:
    """Translate a ``*``/``?`` glob to an anchored regex string.

    The output is valid in BOTH Python ``re`` and Java ``j.u.regex`` —
    the single translation shared by :func:`evaluate` and the Spark
    ``rlike`` compiler, so glob semantics cannot drift between backends.
    """
    out = []
    for ch in glob:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        elif ch.isalnum() or ch == "_":
            out.append(ch)
        else:
            out.append("\\" + ch)
    return r"\A(?s:" + "".join(out) + r")\Z"


def parse_rule(token: str) -> Rule:
    m = _TOKEN_RE.match(token.strip())
    if not m:
        raise RuleSyntaxError(f"bad rule token: {token!r}")
    sign_s, test, op, value = m.groups()
    sign = sign_s == "+"
    if test in BOOL_TESTS:
        if op is not None:
            raise RuleSyntaxError(f"boolean test {test!r} takes no operator: {token!r}")
        return Rule(sign, test, None, None)
    if test in NUM_TESTS:
        if op is None:
            raise RuleSyntaxError(f"numeric test {test!r} needs an operator: {token!r}")
        try:
            num = int(value)
        except (TypeError, ValueError):
            raise RuleSyntaxError(f"numeric test {test!r} needs an int value: {token!r}")
        return Rule(sign, test, op, num)
    if test in STR_TESTS:
        if op != "=":
            raise RuleSyntaxError(f"string test {test!r} needs '=GLOB': {token!r}")
        return Rule(sign, test, "=", value)
    raise RuleSyntaxError(f"unknown test {test!r} in {token!r}")


def parse_pipeline(spec: str | list[str]) -> list[Rule]:
    """Parse a whitespace-separated rule string (or token list) to an AST."""
    tokens = spec.split() if isinstance(spec, str) else list(spec)
    return [parse_rule(t) for t in tokens]


def path_segments(path: str | None) -> list[str]:
    return [s for s in (path or "").split("/") if s]


def path_loop(path: str | None) -> int:
    """Longest run of consecutive equal path segments — the symlink /
    relative-link trap signal (``/a/a/a/b`` → 3; non-consecutive
    repeats don't count: ``/a/b/a`` → 1; empty path → 0)."""
    best = run = 0
    prev = None
    for s in path_segments(path):
        run = run + 1 if s == prev else 1
        prev = s
        if run > best:
            best = run
    return best


def path_depth(path: str | None) -> int:
    """Number of path segments (``/a/b/c`` → 3)."""
    return len(path_segments(path))


def query_params(url: str | None) -> int:
    """Number of non-empty ``&``-separated parameters after the FIRST
    ``?`` (0 when there is no query) — the calendar/faceted-search
    trap signal."""
    if url is None or "?" not in url:
        return 0
    q = url.split("?", 1)[1]
    return len([p for p in q.split("&") if p])


def _num_cmp(lhs: int, op: str, rhs: int) -> bool:
    if op == "<=":
        return lhs <= rhs
    if op == ">=":
        return lhs >= rhs
    if op == "<":
        return lhs < rhs
    if op == ">":
        return lhs > rhs
    return lhs == rhs


@lru_cache(maxsize=64)
def _seed_reg_domains(seed_hosts: frozenset) -> frozenset:
    """Registered domains of the seed hosts — cached per seed set so the
    oracle's per-link hot loop doesn't rebuild it every evaluation (the
    Spark twin precomputes the same set at rule-compile time)."""
    from .canon import registered_domain

    return frozenset(registered_domain(s) for s in seed_hosts)


def rule_matches(rule: Rule, attrs: dict) -> bool:
    """Does one rule's test match a link's attributes?

    ``attrs`` keys follow :data:`TEST_ATTR` plus ``via_host`` and the
    config-derived ``seed_hosts`` (set) / ``seed_prefixes`` (list).
    Missing/None attributes never match (e.g. ``size`` pre-fetch).
    """
    t = rule.test
    if t == "original-domain":
        return attrs.get("host") in attrs.get("seed_hosts", ())
    if t == "original-reg-domain":
        from .canon import registered_domain

        h = attrs.get("host")
        if h is None:
            return False
        psl = attrs.get("psl")
        if psl is not None:
            # full-PSL path: tiny seed set, no caching needed
            seed_regs = {
                registered_domain(s, psl)
                for s in attrs.get("seed_hosts", ())
            }
            return registered_domain(h, psl) in seed_regs
        return registered_domain(h) in _seed_reg_domains(
            frozenset(attrs.get("seed_hosts", ()))
        )
    if t == "same-domain":
        via = attrs.get("via_host")
        return via is not None and attrs.get("host") == via
    if t == "down":
        u = attrs.get("url_canon")
        return u is not None and any(
            u.startswith(p) for p in attrs.get("seed_prefixes", ())
        )
    if t == "requisite":
        return bool(attrs.get("is_requisite"))
    if t in ("path-loop", "path-depth"):
        p = attrs.get("path")
        if p is None:
            return False
        fn = path_loop if t == "path-loop" else path_depth
        return _num_cmp(fn(p), rule.op, rule.value)
    if t == "query-params":
        u = attrs.get("url_canon")
        return u is not None and _num_cmp(query_params(u), rule.op, rule.value)
    val = attrs.get(TEST_ATTR[t])
    if val is None:
        return False
    if t in NUM_TESTS:
        return _num_cmp(int(val), rule.op, rule.value)
    return re.match(glob_to_regex(rule.value), str(val)) is not None


def evaluate(rules: list[Rule], attrs: dict, default: bool) -> bool:
    """Ordered evaluation, last matching rule's sign wins."""
    decision = default
    for r in rules:
        if rule_matches(r, attrs):
            decision = r.sign
    return decision
