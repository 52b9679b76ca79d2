"""Registration pin (VERDICT r5 next-round #1): the driver's
correctness artifact covered only 50/52 queries in r5 because the last
two landed late — this test makes any registration drift (a dropped or
renamed query, a missing oracle twin) fail the suite loudly, so the
checked set can never silently shrink."""

from track0_spark import contract

EXPECTED = [
    "q01_agg_metrics", "q02_topk_per_key", "q03_anti_join_seen",
    "q04_left_join_miss", "q05_broadcast_join_rev", "q06_glob_filter",
    "q07_rule_pipeline", "q08_url_parse", "q09_json_scalar",
    "q10_union_distinct", "q11_first_per_type", "q12_distinct_cardinality",
    "q13_multi_join", "q14_date_pushdown", "q15_dedup_exact",
    "q16_token_count", "q17_text_quality", "q18_lang_stats",
    "q19_shingles", "q20_jaccard_pairs", "q21_ann_cosine",
    "q22_embedding_norms", "q23_langid", "q24_minhash_lsh_pairs",
    "q25_simhash_near_pairs", "q26_fingerprint", "q27_ann_lsh",
    "q28_revisit_merge", "q29_cosine_near_dup", "q30_clean_pipeline",
    "q31_ann_ivf", "q32_stratified_split", "q33_top_terms_per_lang",
    "q34_media_features", "q35_length_percentiles",
    "q36_repetition_quality", "q37_decontaminate_ngrams",
    "q38_packing_estimate", "q39_dup_clusters", "q40_graph_rank",
    "q41_importance_weights", "q42_sessionize", "q43_substring_dup",
    "q44_recrawl_schedule", "q45_domain_cap", "q46_funnel_steps",
    "q47_retention_cohorts", "q48_anchor_topk",
    "q49_graph_rank_dangling", "q50_paragraph_dedup",
    "q51_gopher_rules", "q52_soft404_templates",
]


def test_registry_is_exactly_52_queries_with_twins():
    qs = contract.queries()
    sqls = contract.oracle_sql()
    assert list(qs) == EXPECTED
    assert list(sqls) == EXPECTED
    assert len(qs) == len(sqls) == 52
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and s for s in sqls.values())
