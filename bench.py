"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized with a noop-format write: full computation on
executors, zero driver-transfer cost — the honest way to time a distributed
plan (collect() would time Arrow serialization of the result instead).
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

import pandas as pd  # module-level: pandas_udf type hints resolve here


HEADLINE = [
    # reference surface
    "clf_daily_summary",
    "clf_requests_per_user",
    "clf_parse_roundtrip",
    # relational core
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q4_priority_count",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_revenue_delta",
    "tpch_q12_priority_by_flag",
    "tpch_q14_promo_revenue",
    "tpch_q2_min_cost_supplier",
    "tpch_q9_product_profit",
    "tpch_q13_customer_distribution",
    "tpch_q17_small_qty_revenue",
    "tpch_q21_waiting_suppliers",
    "star_revenue_by_nation",
    "orders_lineitem_revenue",
    "topk_orders_by_price",
    "window_top_order_per_customer",
    "lateral_top2_orders",
    "order_chains_recursive_sql",
    "cube_orders_status_priority",
    "lineitem_measures_unpivot",
    "daily_revenue_interpolated",
    # event-stream ops
    "sessionize_gap",
    "funnel_conversion",
    "retention_cohorts",
    "rolling_wau",
    "hourly_event_counts",
    "session_window_counts_batch",
    "json_props_extract",
    "variant_props_extract",
    "events_value_trend",
    "events_value_percentiles",
    "asof_join_last_order",
    "range_join_click_purchase",
    "overlapping_orders_per_customer",
    # text / dedup
    "token_stats_by_lang",
    "text_quality_scores",
    "pack_token_offsets",
    "pack_sequences_greedy",
    "benchmark_decontaminate",
    "doc_distinctive_tokens",
    "dedup_exact_docs",
    "minhash_lsh_neardup",
    "simhash_neardup",
    "ngram_jaccard_pairs",
    "dedup_cluster_canonical",
    "span_dedup_rebuild",
    "quality_filter_gate",
    "pii_scrub",
    "fuzzy_part_name_pairs",
    "token_commonness_scores",
    # similarity
    "cosine_topk_bruteforce",
    "ann_ivf_topk",
    "embedding_centroid_by_label",
    "embedding_medoid_by_label",
    # sketches / skew / CDC / sampling (round-3 additions — families the
    # headline set didn't yet time)
    "hll_user_rollup",
    "cms_user_frequency",
    "kll_quantile_rollup",
    "char_trigram_noise",
    "skyline_customers_spend_orders",
    "randomized_response_purchase_share",
    "heavy_hitter_ngrams",
    "semdedup_prune",
    "semdedup_invariant_audit",
    "embedding_cosine_neardup",
    "embedding_neardup_audit",
    # the basket family runs adjacently so the shared persisted frames
    # (distinct baskets incidence; the holdout test/recs frames of the
    # two CF metrics) are served from the scoped LRU instead of being
    # rebuilt (same rule as the bfs/graph adjacency note below)
    "frequent_part_triples",
    "item_item_cosine_topk",
    "itemcf_holdout_precision",
    "itemcf_holdout_ndcg",
    "kcore_part_graph",
    "kcore_invariant_audit",
    "greedy_coverage_audit",
    "join_size_estimate_cms",
    "cdc_chunk_docs",
    "ann_pq_topk",
    "monthly_revenue_holt",
    "order_backlog_curve",
    "retention_survival_km",
    "did_value_uplift",
    "link_prediction_jaccard",
    "markov_attribution_removal",
    "jl_project_embeddings",
    "seasonal_index_monthly",
    "hits_purchase_graph",
    "mannwhitney_value_by_cohort",
    "winnow_doc_fingerprints",
    "error_burst_viterbi",
    "hybrid_rrf_retrieval",
    "doc_containment_pairs",
    "corpus_coverage_estimates",
    "cuped_adjusted_uplift",
    "isotonic_conversion_by_activity",
    "poisson_bootstrap_value_ci",
    "mmr_diverse_retrieval",
    "conformal_value_intervals",
    "label_noise_audit",
    "events_column_profile",
    "ols_value_regression",
    "seq_pattern_pairs",
    "doc_tf_cosine_pairs",
    "weighted_sssp_part_graph",
    "error_purchase_xcorr_lags",
    "ppr_part_graph",
    "hourly_count_anomaly_ewma",
    "type_dow_cramers_v",
    "daily_revenue_sax",
    "value_ks_drift",
    "token_bigram_lm",
    "daily_revenue_holt_winters",
    "langid_confusion_matrix",
    "embedding_standardize",
    "dp_type_histogram",
    "token_first_seen_curve",
    "customer_order_span_union",
    "hub_closeness_centrality",
    "part_name_deletion_pairs",
    "value_anova_by_type",
    "embedding_top_eigenvector",
    "hourly_error_rate_wilson",
    "spearman_qty_price_corr",
    "kendall_tau_qty_discount",
    "value_kruskal_wallis",
    "feature_hash_collision_audit",
    "value_decile_calibration",
    "apdex_by_type",
    "conformal_value_interval",
    "doc_bigram_surprisal",
    "doc_length_quantile_normalize",
    "degree_assortativity_part_graph",
    "active_users_7d_sliding",
    "target_encode_mktsegment",
    "t_closeness_audit",
    "bloom_blocklist_probe",
    "link_prediction_resource_alloc",
    "daily_revenue_runs_test",
    "corpus_datasheet_card",
    "welch_ttest_purchase_view",
    "best_split_value_for_purchase",
    "cmh_conversion_by_hour_band",
    "unigram_sampling_table",
    "temporal_split_leakage_audit",
    "value_auc_for_purchase",
    "business_day_ship_lag",
    "ktruss_part_graph",
    "interpurchase_burstiness",
    "daily_count_dispersion",
    "discount_qty_slope_by_brand",
    "epoch_shard_assignment",
    "doc_length_log2_histogram",
    "mixture_epoch_plan",
    "neyman_allocation_by_type",
    "dup_cluster_size_histogram",
    "cross_source_duplication",
    "nearest_centroid_confusion",
    "duplicate_charge_candidates",
    "event_type_mix_drift",
    "position_based_attribution",
    "markov_baseline_accuracy",
    "daily_revenue_mase_baselines",
    "acquisition_channel_conversion",
    "priority_sla_attainment",
    "basket_size_wedge_budget",
    "inactivity_churn_rates",
    "supplier_ontime_wilson_ranking",
    "type_freshness_staleness",
    "lang_source_association",
    "part_supplier_hhi_bands",
    "theta_user_set_ops",
    "skew_salted_user_revenue",
    "temperature_mixture_sample",
    "merge_upsert_customers",
    "scd2_user_event_history",
    "asof_join_next_order",
    "tpch_q8_market_share",
    "tpch_q22_sales_opportunity",
    # RAG chunking / tokenizer-training / log enrichment (round-3)
    "doc_chunk_sliding",
    "bpe_merge_candidates",
    "ip_range_enrich_traffic",
    "user_burst_rates",
    "pagerank_part_graph",
    "triangle_count_part_graph",
    # bfs runs adjacent to the other graph queries so the shared
    # persisted edge relation is still in the scoped LRU cache (measured
    # 5.4 s -> edge-cache-warm when 7 unrelated queries sat in between)
    "bfs_reach_part_graph",
    "lpa_communities_part_graph",
    "orders_snapshot_diff",
    "stratified_sample_events",
    "embedding_quantize_int8",
    "events_value_mad_outliers",
    "event_transition_matrix",
    "user_activity_decay",
    "session_path_topk",
    "equidepth_price_histogram",
    # adjacent: shares the _global_ranks scoped-persisted ranked frame
    "price_quartiles_disc",
    "inverted_index_postings",
    "bm25_doc_ranking",
    "token_cooccurrence_lift",
    "weighted_sample_events",
    "dedup_events_debounce",
    "user_daily_value_locf",
    "benford_value_audit",
    "user_favorite_event_type",
    "props_key_histogram",
    "nation_revenue_share_in_region",
    "purchase_attribution_last_touch",
    "orders_month_over_month",
    "referential_integrity_audit",
    "embedding_dimension_stats",
    "session_bounce_rate",
    "time_to_first_purchase",
    "user_novelty_curve",
    "view_to_purchase_within_hour",
    "transition_matrix_incremental",
    "top3_orders_per_segment_with_ties",
    "brand_qty_weighted_avg_price",
    "bmp_feature_extract",
    "wav_feature_extract",
    "y4m_frame_sample",
    "daily_rollup_incremental",
    # robust / time-series stats + vector prep (round-4 additions)
    "customer_rolling_30d_revenue",
    "winsorized_value_stats",
    "dow_seasonal_anomalies",
    "events_cusum_changepoint",
    "customer_spend_cume_dist",
    "embedding_covariance_topk",
    "hard_negative_pairs",
    "join_view_incremental",
    "custkey_orders_except_all",
    "doc_oov_rate",
    "k_anonymity_audit",
    "user_time_weighted_value",
    "cdc_apply_with_deletes",
    "bpe_train_merges",
    # growth / concentration / experimentation (round-3 continuation)
    "user_growth_accounting",
    "user_longest_streak",
    "journey_pattern_counts",
    "peak_decline_by_type",
    "pareto_abc_brands",
    "region_revenue_concentration",
    "user_activity_gini",
    "ab_conversion_ztest",
    "daily_counts_autocorr",
    "supplier_weighted_median_price",
    "doc_simpson_diversity",
    "brand_revenue_top5_other",
    "key_skew_audit",
    "whale_revenue_share",
    "brand_rank_delta_month",
    "slo_burn_rate",
    "cohort_ltv_curve",
    "rolling_purchase_error_corr",
    "event_gap_log_histogram",
    "order_ship_lag_stats",
    "segment_migration_matrix",
    "funnel_chain_within_deadlines",
    "resource_canonical_traffic",
    "token_distribution_drift",
    "dq_expectations_events",
    "growth_accounting_incremental",
    "theil_sen_daily_trend",
    "capped_sessions_per_user",
    "bot_suspect_users",
    "type_hour_association",
    # table-stats / layout / attribution / robust-location (round-4
    # continuation)
    "events_value_ohlc_hourly",
    "shapley_attribution",
    "hodges_lehmann_value",
    "zonemap_prune_audit",
    "orders_ndv_profile",
    "daily_revenue_haar",
    "mv_monthly_revenue_rewrite",
    "supplier_ontime_eb_shrunk",
    "event_feature_psi",
    "daily_revenue_bollinger",
    "orders_fd_audit",
    "replay_watermark_audit",
    "rake_keyphrases",
    "kanon_generalization_plan",
    "snm_part_name_pairs",
    "ip_longest_prefix_route",
    "ab_sequential_obf",
    "greedy_coverage_select",
    "conversion_logrank_test",
    "dedup_savings_report",
    "join_skew_report",
    "wav_frame_features",
]


#: Machine-day calibration anchor. The calibration workload below is
#: CODE-FROZEN (never tune it with the engine); `_CALIB_ANCHOR_SEC` is
#: its measured wall on the round-10 reference machine-day, recorded in
#: the same session that produced the round-10 same-day A/B numbers.
#: Interpreting any BENCH_r*.json across days:
#:     machine_day_factor = calib_sec / calib_anchor_sec
#:     normalized_total   = value / machine_day_factor
#: (Memory: machine-days differ ~1.1-1.7x uniformly; the probe makes the
#: driver's number interpretable without re-running old code.)
_CALIB_ANCHOR_SEC = 0.65
#: Same-day A/B baseline: the ROUND-9 code (commit 604c103), run in a
#: worktree on the round-10 reference machine-day over the identical
#: 281-query r9 headline set. BENCH_r09.json recorded 169.1 s for the
#: same set on ITS machine-day.
_SAME_DAY_BASELINE = {
    "r9_commit": "604c103",
    "r9_total_sec_same_day": 163.409,  # r9 code, r10 machine-day
    "r9_total_sec_own_day": 169.116,  # BENCH_r09.json, r9 machine-day
    "r9_n_queries": 281,
    "measured_on": "2026-08-16",
}


def _calibration(spark) -> float:
    """Fixed reference workload (JVM compute + one shuffle), min-of-3:
    the machine-day probe. Sized so whole-stage-codegen compute
    (~0.65 s on the reference box) dominates the scheduling floor — a
    probe that finishes in one scheduler wave measures task-launch
    jitter, not the machine (the first, smaller probe swung 0.36-0.65 s
    WITHIN one day; this one repeats at ±5%)."""
    from pyspark.sql import functions as F

    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(600_000_000).select(
            F.sum((F.col("id") * 2654435761) % 1000000007)
        ).collect()
        spark.range(20_000_000).groupBy(
            (F.col("id") % 4096).alias("k")
        ).count().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    # Optional comma-separated subset (scaling probes re-time a handful
    # of queries at big fixtures without paying the full headline set).
    only = os.environ.get("SPARK_GRAFT_ONLY")
    headline = (
        [n for n in HEADLINE if n in set(only.split(","))]
        if only
        else HEADLINE
    )

    from tdk_apache_log_etl_spark.operators import QUERIES
    from tdk_apache_log_etl_spark.session import get_spark

    spark = get_spark("tdk-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM warm-up (codegen, parquet footer caches) — not timed.
    QUERIES["clf_user_count"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # Python-worker warm-up: the first Pandas UDF pays the worker-pool
    # startup (~2 s for 32 workers); warm it so UDF-bearing queries are
    # timed on their own work.
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(10_000).select(_warm(col("id"))).write.format("noop").mode(
        "overwrite"
    ).save()

    # Two timed runs per query, keep the min: single-shot numbers on a
    # shared host mix scheduler noise into the signal (observed 4×
    # run-to-run swings on an otherwise idle box); min-of-2 reports the
    # computation, not the co-tenant.
    per_query: dict[str, float] = {}
    for name in headline:
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        per_query[name] = round(best, 3)

    total = round(sum(per_query.values()), 3)
    calib = _calibration(spark)
    # The headline set GROWS round over round (29 → 50+ queries), so the
    # raw total is not comparable across rounds — n_queries and the
    # per-query median are the stable figures of merit.
    median = statistics.median(per_query.values())
    # Per-query map as a FILE next to this script: the driver captures
    # only a bounded stdout tail (~2000 chars ≈ the last ~47 entries),
    # so round-over-round per-query comparison (PERF's geomean) lost the
    # map whenever it was stdout-only (PERF_r10: per_query == {}).  The
    # file is the durable channel; the stdout lines below stay for
    # tail-scraping compatibility.
    per_query_payload = {
        "metric": "per_query_sec",
        "unit": "sec",
        "queries": per_query,
        "n_queries": len(per_query),
        "calib_sec": calib,
        "sf": sf,
        # Adjacency amortization caveat: bench order groups persist-
        # sharing families (graph pack incl. bfs; basket/CF pack;
        # price-rank pair) so scoped_persist serves shared frames from
        # cache. Per-query numbers WITHIN those families are amortized
        # (warm-cache) costs — the family's first member pays the cold
        # build; read family sums, not members, across harness changes.
        "adjacency_amortized_families": [
            ["frequent_part_triples", "item_item_cosine_topk",
             "itemcf_holdout_precision", "itemcf_holdout_ndcg"],
            ["pagerank_part_graph", "triangle_count_part_graph",
             "bfs_reach_part_graph", "lpa_communities_part_graph"],
            ["equidepth_price_histogram", "price_quartiles_disc"],
        ],
    }
    try:
        out_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "bench_per_query.json",
        )
        with open(out_path, "w") as fh:
            json.dump(per_query_payload, fh)
            fh.write("\n")
    except OSError:
        pass  # read-only checkout: stdout below still carries the map
    # The big per-query map FIRST, summary scalars LAST: the driver
    # captures a bounded TAIL (suffix) of stdout — BENCH_r03.json's tail
    # ends with "... n_queries: 150, sec_per_query_median: 0.467, sf:
    # 0.1}" (summary-last survived), while BENCH_r04.json's tail is all
    # per-query entries and lost the summary because r4 moved the
    # scalars to the front. Headline figures must sit at the END of the
    # one emitted JSON line to survive a prefix cut.
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "unit": "sec",
                "queries": per_query,
                "n_queries": len(per_query),
                "sec_per_query_median": round(median, 3),
                "calib_sec": calib,
                "calib_anchor_sec": _CALIB_ANCHOR_SEC,
                "same_day_baseline": _SAME_DAY_BASELINE,
                "value": total,
                "sf": sf,
            }
        )
    )
    # PENULTIMATE line: the per-query map alone (no summary fields), so
    # a bounded stdout tail holds per-query entries as close to the end
    # as possible — a tail big enough for this line parses the whole
    # map; a 2000-char tail still scrapes the last ~60 entries plus the
    # intact final summary line.
    print(json.dumps(per_query_payload))
    # LAST, TINY summary-only line: the big lines above can exceed the
    # driver's bounded tail capture (BENCH_r05 'parsed' was null because
    # the JSON head was truncated); this one always fits whole, so the
    # driver's JSON parse of the last line succeeds even when the
    # per-query map does not survive.
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "unit": "sec",
                "n_queries": len(per_query),
                "sec_per_query_median": round(median, 3),
                "calib_sec": calib,
                "calib_anchor_sec": _CALIB_ANCHOR_SEC,
                "value": total,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
