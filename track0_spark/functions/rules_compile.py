"""Rule AST -> native Spark Column compiler (SURVEY.md §2.3 R12).

The second backend of the single rule parser in ``track0s/rules.py``:
the ordered pipeline folds into one ``CASE WHEN`` chain of built-in
Column expressions — **no UDF**, fully inside whole-stage codegen, so
Catalyst can push rule predicates down to the parquet scan. Later rules
are wrapped outermost, which is exactly last-match-wins.

Null semantics match the Python evaluator's "missing attribute never
matches" for free: a NULL comparison is NULL, and ``F.when`` treats
NULL as no-match, falling through to earlier rules / the default.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from track0s.canon import _TWO_LEVEL_SUFFIXES, registered_domain
from track0s.rules import NUM_TESTS, Rule, TEST_ATTR, glob_to_regex


def reg_domain_col(host_col: str = "host") -> Column:
    """Native twin of ``track0s.canon.registered_domain`` — CASE-guarded
    so element_at(-3) never evaluates for short hosts (ANSI-safe)."""
    parts = F.split(F.col(host_col), r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.concat_ws(
        ".",
        F.element_at(parts, -3),
        F.element_at(parts, -2),
        F.element_at(parts, -1),
    )
    return (
        F.when(n < 2, F.col(host_col))
        .when((n >= 3) & last2.isin(sorted(_TWO_LEVEL_SUFFIXES)), last3)
        .otherwise(last2)
    )


def _num_pred(col: Column, op: str, value: int) -> Column:
    if op == "<=":
        return col <= value
    if op == ">=":
        return col >= value
    if op == "<":
        return col < value
    if op == ">":
        return col > value
    return col == value


def rule_predicate(rule: Rule, seed_hosts: list[str], seed_prefixes: list[str]) -> Column:
    t = rule.test
    if t == "original-domain":
        return F.col("host").isin(list(seed_hosts)) if seed_hosts else F.lit(False)
    if t == "original-reg-domain":
        seed_regs = sorted({registered_domain(h) for h in seed_hosts})
        return (
            reg_domain_col().isin(seed_regs) if seed_regs else F.lit(False)
        )
    if t == "same-domain":
        return F.col("via_host").isNotNull() & (F.col("host") == F.col("via_host"))
    if t == "down":
        if not seed_prefixes:
            return F.lit(False)
        pred = F.col("url_canon").startswith(seed_prefixes[0])
        for p in seed_prefixes[1:]:
            pred = pred | F.col("url_canon").startswith(p)
        return pred
    if t == "requisite":
        return F.coalesce(F.col("is_requisite"), F.lit(False))
    attr = TEST_ATTR[t]
    if t in NUM_TESTS:
        return _num_pred(F.col(attr), rule.op, rule.value)
    return F.col(attr).rlike(glob_to_regex(rule.value))


def compile_rules(
    rules: list[Rule],
    default: bool,
    seed_hosts: list[str],
    seed_prefixes: list[str],
) -> Column:
    """Ordered pipeline -> one boolean Column; last matching rule wins."""
    decision = F.lit(bool(default))
    for r in rules:
        pred = rule_predicate(r, seed_hosts, seed_prefixes)
        decision = F.when(pred, F.lit(r.sign)).otherwise(decision)
    return decision
