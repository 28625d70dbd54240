"""Spot-check representative queries at sf0.001 (the entry() scale) —
insurance that nothing is vacuously correct only at sf0.01."""

from __future__ import annotations

import pytest

from parallel_monte_carlo_simulations_spark.registry import load_all_queries

from ._compare import compare

SF_DIR = "/root/testdata/sf0.001"
SPECS = load_all_queries()

REPRESENTATIVE = [
    "q01_pricing_summary",
    "q05_revenue_by_nation",
    "q_join_asof",
    "q_window_topk_per_group",
    "q_dedup_minhash_lsh",
    "q_text_quality_score",
    "q_stream_session_10m",
    "q_pipeline_llm_curation",
    "q09_product_profit",
    "q13_customer_distribution",
    "q_sessionize_batch",
    "q_funnel_stages",
    "q_doc_chunking",
    "q_cogroup_apply_in_pandas",
    "q_dedup_levenshtein",
    "q02_min_cost_supplier",
    "q18_large_volume_customer",
    "q_graph_pagerank",
    "q_multimodal_wav_decode",
    "q_multimodal_gif_frames",
    "q_sim_lsh_topk",
    "q_graph_triangles",
    "q_dataset_split",
    "q_contamination_check",
    # round-5 families
    "q_geo_grid_proximity_join",
    "q_survival_kaplan_meier",
    "q_ml_logistic_irls",
    "q_pipeline_pretraining_shards",
    "q_interval_concurrency",
    "q_skyline_pareto_front",
    "q_graph_kcore",
    "q_bitemporal_asof",
    # round-10 additions
    "q_search_mmr",
    "q_dedup_segment_lines",
    "q_causal_propensity_strata",
    "q_ts_cross_correlation",
    "q_ml_kmeans_lloyd",
    "q_multimodal_audio_bands",
    "q_graph_adamic_adar",
    "q_text_gopher_rules",
    "q_graph_modularity",
    "q_dedup_cdc_chunks",
    "q_ts_sax_words",
    "q_feat_target_encoding_kfold",
    "q_ml_knn_eval",
    "q_stat_runs_test",
    "q_pr_auc",
    "q_stat_mcnemar",
    "q_ml_lift_deciles",
    # round-11: global-ranked-window family converted to the
    # range-bucketed kernel — same oracles, tiny-sf equivalence here
    "q_ks_two_sample",
    "q_mann_whitney_u",
    "q_wasserstein_two_sample",
    "q_psi_drift",
    "q_bootstrap_ci_mean",
    "q_customer_rfm",
    "q_window_cume_dist",
    "q_abc_pareto",
    # round-11 registrations
    "q_stat_cochran_armitage",
    "q_feat_hashing_text",
    "q_graph_label_propagation",
    "q_stat_cohens_kappa",
    "q_stat_partial_corr",
    # round-12: prefix-fingerprint dup matrix must be non-vacuous at
    # EVERY sf (the r11 evidence gap was a 0-row-vs-0-row pass)
    "q_curation_dup_flow_matrix",
    "q_bpe_encode",
]


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_small_sf_oracle(spark, name):
    spec = SPECS[name]
    report = compare(spec.fn(spark, SF_DIR), spec.oracle, SF_DIR)
    assert report["ok"], f"{name}: {report}"
    assert report["spark_rows"] > 0, f"{name} vacuous at sf0.001"
