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


def reg_domain_col_psl(psl, host_col: str = "host") -> Column:
    """Native compilation of a parsed Public Suffix List
    (track0s/psl.py): per-level membership predicates over the host's
    trailing labels, exceptions first (absolute priority), then
    longest-match. ``F.get`` (null-safe, 0-based) instead of
    ``element_at`` so short hosts never trip ANSI index errors;
    ``concat_ws`` skips the resulting NULLs and a dotted level-k rule
    can never equal an under-length join, so the ``n >= k`` guards are
    semantic, not safety. Rule lists land as literal IN-sets (hash
    lookups in codegen) — the full ~9k-entry PSL compiles the same way,
    just with bigger sets."""
    parts = F.split(F.col(host_col), r"\.")
    n = F.size(parts)

    def lastk(k: int) -> Column:
        return F.concat_ws(
            ".", *[F.get(parts, n - i) for i in range(k, 0, -1)]
        )

    conds: list[tuple[Column, int]] = []
    for k in sorted(psl.exception, reverse=True):
        conds.append(
            (
                (n >= k) & lastk(k).isin(sorted(psl.exception[k])),
                k - 1,
            )
        )
    ks = sorted(
        set(list(psl.exact) + [pk + 1 for pk in psl.wildcard]), reverse=True
    )
    for k in ks:
        cond = F.lit(False)
        if k in psl.exact:
            cond = cond | ((n >= k) & lastk(k).isin(sorted(psl.exact[k])))
        if (k - 1) in psl.wildcard:
            cond = cond | (
                (n >= k) & lastk(k - 1).isin(sorted(psl.wildcard[k - 1]))
            )
        conds.append((cond, k))
    suffix_k: Column = F.lit(1)
    if conds:
        case = F.when(conds[0][0], F.lit(conds[0][1]))
        for cond, k in conds[1:]:
            case = case.when(cond, F.lit(k))
        suffix_k = case.otherwise(F.lit(1))
    return F.when(n <= suffix_k, F.col(host_col)).otherwise(
        F.concat_ws(".", F.slice(parts, n - suffix_k, suffix_k + F.lit(1)))
    )


def _segs(col: Column) -> Column:
    return F.filter(F.split(col, "/"), lambda x: x != "")


def path_loop_col(path: Column) -> Column:
    """Longest consecutive-equal-segment run, as one native HOF fold
    (JVM-side, no UDF) — the Column twin of ``track0s.rules.path_loop``;
    null path folds to null, which a rule ``when`` treats as no-match,
    matching the Python backend's missing-attr rule."""
    step = lambda acc, x: F.struct(  # noqa: E731
        x.alias("prev"),
        F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
        F.greatest(
            acc["best"],
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
        ).alias("best"),
    )
    return F.aggregate(
        _segs(path),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        step,
        lambda acc: acc["best"],
    )


def path_depth_col(path: Column) -> Column:
    return F.size(_segs(path))


def query_params_col(url: Column) -> Column:
    """Non-empty params after the FIRST '?' (0 without a query) —
    Column twin of ``track0s.rules.query_params``.  Uses a positional
    substr (not substring_index) so a second '?' inside the query
    stays part of it, exactly like the Python ``split('?', 1)``."""
    q = url.substr(
        F.instr(url, "?") + F.lit(1), F.length(url)
    )
    return (
        F.when(url.isNull(), F.lit(None).cast("int"))  # missing attr: no match
        .when(url.contains("?"), F.size(F.filter(F.split(q, "&"), lambda x: x != "")))
        .otherwise(F.lit(0))
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


def rule_predicate(
    rule: Rule,
    seed_hosts: list[str],
    seed_prefixes: list[str],
    psl=None,
) -> Column:
    t = rule.test
    if t == "original-domain":
        return F.col("host").isin(list(seed_hosts)) if seed_hosts else F.lit(False)
    if t == "original-reg-domain":
        seed_regs = sorted({registered_domain(h, psl) for h in seed_hosts})
        if not seed_regs:
            return F.lit(False)
        col = reg_domain_col() if psl is None else reg_domain_col_psl(psl)
        return col.isin(seed_regs)
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
    if t == "path-loop":
        return _num_pred(path_loop_col(F.col("path")), rule.op, rule.value)
    if t == "path-depth":
        return _num_pred(path_depth_col(F.col("path")), rule.op, rule.value)
    if t == "query-params":
        return _num_pred(
            query_params_col(F.col("url_canon")), rule.op, rule.value
        )
    attr = TEST_ATTR[t]
    if t in NUM_TESTS:
        return _num_pred(F.col(attr), rule.op, rule.value)
    return F.col(attr).rlike(glob_to_regex(rule.value))


def compile_rules(
    rules: list[Rule],
    default: bool,
    seed_hosts: list[str],
    seed_prefixes: list[str],
    psl=None,
) -> Column:
    """Ordered pipeline -> one boolean Column; last matching rule wins."""
    decision = F.lit(bool(default))
    for r in rules:
        pred = rule_predicate(r, seed_hosts, seed_prefixes, psl=psl)
        decision = F.when(pred, F.lit(r.sign)).otherwise(decision)
    return decision
