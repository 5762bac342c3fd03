#!/usr/bin/env python
"""Write PLANS.md: the formatted physical plan of every headline
query at sf0.1, so the scale claims (pushed filters, pruned
ReadSchema, broadcasts, WindowGroupLimit, whole-stage codegen) are
inspectable without running anything. Regenerate after plan-shaping
changes; tests/test_plans.py is the enforcement, this file is the
evidence."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = [
    "q01_pricing_summary",
    "q05_join_inner",
    "q13_join_asof",
    "q14_agg_stats",
    "q21_window_rank",
    "q25_topk_per_group",
    "q50_dedup_exact",
    "q52_minhash_lsh",
    "q54_similarity_topk",
    "q58_tfidf",
    "q83_local_supplier_volume",
    "q81_event_funnel",
    # statistics / quality tranche: the plan claims worth inspecting
    "q97_regression",
    "q98_decile_stats",
    "q100_mad_outliers",
    "q104_quality_report",
    # round-2 bench additions (worst 10x ratios)
    "q70_decontaminate",
    "q84_priority_exists",
    "q74_ann_ivf_cell",
    "q107_unigram_logprob",
    "q108_gap_fill",
    "q109_token_budget_pack",
    "q110_asof_tolerance",
    # round-3 additions: plan claims worth inspecting (CC rounds,
    # blocked fuzzy equi-join, KS single-window, PMI broadcast df,
    # spectra map-side combine)
    "q43_fuzzy_match",
    "q116_dedup_clusters",
    "q117_ks_drift",
    "q118_pmi_cooccur",
    "q121_power_iteration",
    "q122_retention_funnel",
    "q125_gini_tokens",
    "q140_dataset_diff",
    # round-4 additions: Benford 9-group spine join, planted-PII
    # single-scan regex aggregate (q146 is driver-side bisection —
    # its plan is a loop of count aggregates, nothing to snapshot)
    "q145_benford",
    "q147_pii_scrub",
    "q142_chi_square",
    # round-4 mining tranche: position-hash dedup (two shuffles, one
    # key), zero-shuffle scorer/PQ scans, MG candidate + broadcast
    # verify, within-cell pair join
    "q153_dup_ngram_spans",
    "q154_quality_classifier",
    "q155_heavy_hitters",
    "q156_semantic_dedup",
    "q158_pq_encode",
    "q159_weighted_jaccard",
    "q161_cms_estimates",
    # round-5 additions: two-phase prefix sum (hash-bucket exchange,
    # CASE-tree pid, broadcast offsets), capped weighted Jaccard
    # (prefix window + capped postings + map verify), cluster-rep
    # argmax, zero-shuffle readability scan, per-stratum split
    # window, source-diversity double aggregate
    "q150_prefix_sum",
    "q163_wjaccard_capped",
    "q164_cluster_representatives",
    "q165_readability",
    "q166_exact_stratified_split",
    "q167_source_diversity",
    # round-5 session-2: TPC-H shapes (pushdown/broadcast/anti-join
    # claims), aHash band pipeline, pandas-UDF normalize scan,
    # 5-iteration fixed-point PageRank chain, shared window sort
    "q168_returned_item_revenue",
    "q171_small_quantity_revenue",
    "q172_large_volume_orders",
    "q174_idle_rich_customers",
    "q175_image_ahash",
    "q176_image_neardup",
    "q177_unicode_normalize",
    "q178_pagerank_transitions",
    "q180_rolling_features",
    # round-5 session-2 additions: zero-shuffle merge-fold chain,
    # overlapping-block ER join, two-join triangle enumeration
    "q181_bpe_tokenize",
    "q182_record_linkage",
    "q183_neardup_triangles",
    "q184_image_dhash",
    "q185_cdc_apply",
    "q186_cdc_chunking",
    # round 6: TPC-H completion, LM scoring, governance EMD, skyline,
    # sketch contract, running median
    "q187_volume_shipping",
    "q188_market_share",
    "q189_product_profit",
    "q190_customer_distribution",
    "q191_bigram_lm_score",
    "q192_gopher_rules",
    "q193_t_closeness",
    "q194_pareto_frontier",
    "q195_kll_error_contract",
    "q196_running_median",
    "q197_jsd_sources",
    "q198_heaps_law",
    "q199_good_turing",
    "q200_weighted_percentile",
    "q201_concurrency_sweep",
    "q202_clamped_balance",
    # round-6 tranche 7: the six TPC-H shape adaptations
    "q203_min_cost_supplier",
    "q204_important_stock",
    "q205_late_ship_priority",
    "q206_supplier_part_counts",
    "q207_excess_stock_suppliers",
    "q208_sole_late_supplier",
    # round-6 tranche 8: sequence analytics + corpus mining
    "q209_activity_streaks",
    "q210_daily_acf",
    "q211_cusum_changepoint",
    "q212_dunning_keywords",
    "q213_clustering_coefficient",
    "q214_ngram_novelty",
    # round-6 tranche 9: inference statistics + curation planning
    "q215_mann_whitney",
    "q216_wilson_source_rank",
    "q217_source_overlap",
    "q218_kaplan_meier",
    "q219_cluster_size_histogram",
    "q220_session_dwell",
    # round-6 tranche 10: robust statistics + dataset management
    "q221_theil_sen",
    "q222_spearman",
    "q223_kruskal_wallis",
    "q224_corpus_fingerprint",
    "q225_source_hhi",
    "q226_degree_powerlaw",
    # round-6 tranche 11: sequence mining + stylometry
    "q227_markov_entropy",
    "q228_burrows_delta",
    "q229_transition_lift",
    "q230_session_basket",
    "q231_stopword_discovery",
    # round-6 tranche 12: embedding-space evaluation
    "q232_centroid_confusion",
    "q233_silhouette",
    "q234_embedding_health",
    # round-6 tranche 13: clustering/graph evaluation
    "q235_cluster_purity",
    "q236_degree_assortativity",
    # round-6 tranche 14: forecasting + population estimation
    "q237_holt_smoothing",
    "q238_forecast_error",
    "q239_rfm_segments",
    "q240_capture_recapture",
    # round-6 tranche 15: dedup planning + label QA
    "q241_threshold_sweep",
    "q242_lang_confusion",
    # round-6 tranche 16: distribution-shape diagnostics
    "q243_hill_tail_index",
    "q244_qq_deciles",
    # round-6 tranche 17: dedup economics + agreement/drift
    "q245_effective_tokens",
    "q246_lang_kappa",
    "q247_daily_tvd",
    # round-6 tranche 18: corpus hygiene profiles
    "q248_charclass_profile",
    "q249_length_histogram",
    # round-6 tranche 19: budget concentration + robust location
    "q250_token_lorenz",
    "q251_script_consistency",
    "q252_trimmed_mean",
    # round-6 tranche 20: collocation mining
    "q253_skipgram_pmi",
    # round-6 tranche 21: exposure league + integrity audit
    "q254_source_dup_exposure",
    "q255_referential_integrity",
]


def main() -> None:
    from file_appender_spark.queries import QUERIES
    from file_appender_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="snapshot_plans")
    out = ["# PLANS — headline physical plans at sf0.1 (generated by scripts/snapshot_plans.py)\n"]
    for name in HEADLINE:
        import contextlib
        import io

        from file_appender_spark.queries.registry import build_fresh

        df = build_fresh(spark, sf_dir, name)  # never-executed plan, not the memoized one
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        out.append(f"\n## {name}\n\n```\n{plan.strip()}\n```\n")
    path = os.path.join(os.path.dirname(__file__), "..", "PLANS.md")
    with open(path, "w") as f:
        f.write("".join(out))
    print(f"wrote {os.path.abspath(path)} ({len(HEADLINE)} plans)")


if __name__ == "__main__":
    main()
