"""Mechanical plan-shape audit across the WHOLE contract surface.

PLANS.md documents hand-picked plans; this test enforces the two
scale disciplines that must hold for EVERY contract query, so a new
query can't silently regress them (SURVEY.md §4):

1. No row-at-a-time Python anywhere — ``BatchEvalPython`` (a per-row
   Python UDF) must never appear in a physical plan. The only
   permitted JVM->Python crossings are Arrow-vectorized
   (``MapInPandas``/``FlatMapGroupsInPandas``), and only in the
   queries documented to need Python at all.
2. Parquet scans are column-pruned — no contract query may scan the
   fat ``text``/``html``/``embedding`` payloads unless the query
   actually consumes them (ReadSchema is the physical proof Catalyst
   pruned the projection down to what the plan needs).

q39/q40 run their iterative loops eagerly on construction (their
per-iteration bodies are audited in PLANS.md instead) — they are
skipped here to keep this a plan-only test, as is q31's KMeans
variant (static centroids by default, still checked).
"""

import re

import pytest

from track0_spark import contract

SF = "/root/testdata/sf0.01"

#: queries whose construction runs jobs (iterative loops); their
#: iteration bodies are plan-audited by tools/explain_plans.py
EAGER = {"q39_dup_clusters", "q40_graph_rank", "q49_graph_rank_dangling"}

#: the only queries allowed an Arrow (vectorized pandas) crossing:
#: q34 decodes opaque media bytes — the one task built-in Columns
#: genuinely cannot express
#: ... and q48 runs the crawl's real HTML anchor parser (the same
#: single documented Arrow pass as the round plan's extract stage)
#: ... and since r6 the similarity/minhash/simhash signature+score
#: kernels (q24/q25/q29): their pure-Column folds are CodegenFallback
#: (interpreted per array element) and the vectorized numpy kernels
#: compute bit-identical results 5-20x faster (guide §4.2; equality
#: pinned in tests/test_training_ops.py; the expr path remains under
#: impl="expr" as the DuckDB-twin verification form)
ARROW_OK = {
    "q34_media_features",
    "q48_anchor_topk",
    "q24_minhash_lsh_pairs",
    "q25_simhash_near_pairs",
    "q27_ann_lsh",
    "q29_cosine_near_dup",
    "q30_clean_pipeline",
    "q31_ann_ivf",
    "q41_importance_weights",
}

#: queries that legitimately read a fat payload column (as a filter
#: predicate, a rule-pipeline attribute, a merge payload, or the
#: analyzed content itself)
FAT_OK = {
    "text": {
        "q06_glob_filter", "q07_rule_pipeline", "q15_dedup_exact",
        "q16_token_count", "q17_text_quality",
        "q18_lang_stats", "q19_shingles", "q20_jaccard_pairs",
        "q23_langid", "q24_minhash_lsh_pairs", "q25_simhash_near_pairs",
        "q26_fingerprint", "q28_revisit_merge", "q30_clean_pipeline",
        "q33_top_terms_per_lang", "q34_media_features",
        "q36_repetition_quality", "q37_decontaminate_ngrams",
        "q38_packing_estimate", "q41_importance_weights",
        "q43_substring_dup", "q48_anchor_topk", "q50_paragraph_dedup",
        "q51_gopher_rules", "q52_soft404_templates",
    },
    "embedding": {
        "q21_ann_cosine", "q22_embedding_norms", "q27_ann_lsh",
        "q29_cosine_near_dup", "q31_ann_ivf",
    },
    "media_bytes": {"q34_media_features"},
}


def _plans(spark):
    import io
    from contextlib import redirect_stdout

    out = {}
    for name, fn in contract.queries().items():
        if name in EAGER:
            continue
        df = fn(spark, SF)
        # formatted mode: the compact executedPlan().toString() TRUNCATES
        # scan fields at ~100 chars, silently hiding pushed filters
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        out[name] = buf.getvalue()
    return out


@pytest.fixture(scope="module")
def plans(spark):
    return _plans(spark)


def test_no_row_python_udf_anywhere(plans):
    offenders = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert not offenders, f"row-at-a-time Python UDF in: {offenders}"


def test_arrow_crossings_only_where_documented(plans):
    offenders = [
        n
        for n, p in plans.items()
        if n not in ARROW_OK
        and ("MapInPandas" in p or "FlatMapGroupsInPandas" in p
             or "ArrowEvalPython" in p)
    ]
    assert not offenders, f"undocumented Arrow crossing in: {offenders}"


def test_fat_columns_pruned_from_scans(plans):
    """A query that doesn't consume text/html/embedding must not read
    it: every ReadSchema in its plan must exclude the fat columns."""
    offenders = []
    for name, p in plans.items():
        for schema in re.findall(r"ReadSchema: struct<([^>]*)>", p):
            cols = {c.split(":")[0] for c in schema.split(",") if c}
            for fat, allowed in FAT_OK.items():
                if fat in cols and name not in allowed:
                    offenders.append((name, fat))
    assert not offenders, f"unpruned fat column reads: {offenders}"


#: named plan-shape expectations: the physical strategy each query's
#: docstring PROMISES must actually appear in its plan
EXPECTED_MARKERS = {
    "q05_broadcast_join_rev": ["BroadcastHashJoin"],  # dim join broadcasts
    "q45_domain_cap": ["BroadcastHashJoin"],  # per-lang cap table broadcasts
    "q02_topk_per_key": ["WindowGroupLimit"],  # rk<=k prunes the sort
}


def test_expected_plan_markers(plans):
    missing = [
        (name, m)
        for name, markers in EXPECTED_MARKERS.items()
        for m in markers
        if m not in plans[name]
    ]
    assert not missing, f"promised plan shapes missing: {missing}"


def test_date_filter_reaches_the_scan(plans):
    """q14's quarter filter must be IN the parquet scan's PushedFilters
    (not just a post-scan Filter node) — the claim 'pushdown' makes."""
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plans["q14_date_pushdown"])
    assert any(
        "o_orderdate" in s and ("GreaterThanOrEqual" in s or "LessThan" in s)
        for s in pushed
    ), f"o_orderdate range not pushed: {pushed}"


def test_every_query_has_a_parquet_scan(plans):
    """Sanity on the audit itself: the regexes above only mean
    something if the plans actually contain parquet scans."""
    missing = [n for n, p in plans.items() if "Scan parquet" not in p]
    assert not missing, f"no parquet scan found in: {missing}"
