"""Repo-wide physical-plan lint: every registered query's plan is
checked for the scale anti-patterns PLANS.md promises are absent —
so a future edit can't quietly reintroduce one (the per-query version
of the targeted plan pins in test_statemachine / test_extraction).
"""

import pytest

import __spark_entry__ as entry_mod

# Iterative queries run eagerly at plan-build time (localCheckpoint
# loop); their components are linted via their own tests instead.
_EAGER = {
    "td_dedup_clusters", "td_dedup_canonical", "td_split_leakage_safe",
    "td_curation_funnel",
    # localCheckpoint at plan-build (single materialized scoring scan)
    "td_token_budget_select",
}

# BroadcastNestedLoopJoin is only acceptable when one side is a
# provably tiny relation (a single-row aggregate or a fixed candidate
# list crossed in deliberately).
_BNLJ_OK = {
    "cp_admin_add_engine",   # 1-row max-id aggregates crossed into inserts
    "td_sim_ivf_topk",       # centroid seed rows crossed for assignment
    "td_sim_ivfpq_search",   # same centroid cross (cell assignment)
    "td_dedup_semantic",     # same 8-centroid assignment cross (SemDeDup)
    "td_sim_bruteforce_topk",  # fixed 5-row query set vs corpus (baseline op)
    "td_sim_hard_negatives",   # same fixed query set crossed for mining
    "td_sim_kmeans_step",    # 8 seed centroids crossed for assignment
    "td_curation_dsir",      # 1-row feature-total aggregate crossed in
    "td_profile_key_skew",   # 1-row global-stats aggregate crossed in
    "td_event_cooccurrence", # 1-row n_users aggregate crossed in
    "td_text_idf",           # 1-row corpus-size aggregate crossed in
    "td_text_unigram_ce",    # 1-row corpus-size aggregate crossed in
    "td_text_bigram_ce",     # 1-row vocab-size aggregate crossed into
                             # the |vocab|-row history table (not the
                             # per-bigram stream)
    "td_lang_rebalance",     # 1-row waterfill-scale aggregate crossed in
    "td_sketch_quantiles",   # 3-row quantile estimate crossed for rank_err
    "td_text_bm25",          # 1-row corpus-stats aggregate crossed in
    # partsupp derivation: part × a fixed 4-row VALUES list (the
    # deterministic in-SQL stand-in for the absent partsupp table)
    "cp_sql_tpch_q2_min_cost", "cp_sql_tpch_q9_profit",
    "cp_sql_tpch_q11_stock", "cp_sql_tpch_q16_supp_count",
    "cp_sql_tpch_q20_excess_stock",
}

_QUERIES = [
    (n, fn) for n, fn in entry_mod.queries().items() if n not in _EAGER
]


@pytest.mark.parametrize("name,fn", _QUERIES, ids=[q[0] for q in _QUERIES])
def test_plan_has_no_scale_antipatterns(spark, sf_smoke, name, fn):
    plan = fn(spark, sf_smoke)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    # BatchEvalPython = row-at-a-time (non-Arrow) Python UDF
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    if name not in _BNLJ_OK:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: nested-loop join outside the tiny-relation whitelist"
        )
