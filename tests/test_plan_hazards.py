"""Fleet-wide plan-hazard sweep: every registered query's physical plan
is checked for the classic 100 TB killers — cartesian products,
row-at-a-time Python UDFs, and unbounded global windows.  Exceptions are
an explicit allowlist with the boundedness argument stated next to each
name; a new query that introduces a hazard fails here until it is either
re-planned or justified."""

from __future__ import annotations

import re

import pytest

from pyspark.sql import types as T

from tdk_apache_log_etl_spark.operators import ORACLES, QUERIES

from .conftest import SF_DIR_SMOKE

#: BroadcastNestedLoopJoin is acceptable ONLY when one side is bounded at
#: any scale factor:
BNLJ_OK = {
    "cosine_topk_bruteforce",  # query set is TOPK_N_QUERIES rows by contract
    "ann_lsh_topk",            # same bounded query set
    "ann_ivf_topk",            # same bounded query set
    "ann_recall_eval",         # composes the two waived queries above
    "minhash_lsh_recall_floor",  # truth side is the bounded n-gram
                                 # Jaccard pair set (quality companion)
    "ann_lsh_recall_floor",    # composes the waived bounded top-k pair
    "ann_ivf_recall_floor",    # same bounded TOPK_N_QUERIES broadcast
    "ann_pq_recall_floor",     # same bounded TOPK_N_QUERIES broadcast
    "tpch_q11_important_parts",   # 1-row global-total crossJoin
    "tpch_q22_sales_opportunity",  # 1-row average-balance crossJoin
    "tpch_q15_top_supplier",   # 1-row max-revenue crossJoin
    "rolling_wau",             # 1-row day-bounds crossJoin
    "doc_distinctive_tokens",  # 1-row corpus-count crossJoin
    "token_commonness_scores",  # 1-row corpus-total crossJoin
    "temperature_mixture_sample",  # 1-row min-source-count crossJoin
    "triangle_count_part_graph",  # two 1-row aggregates crossJoined
    "equidepth_price_histogram",  # 1-row decile-bounds crossJoin
    "price_quartiles_disc",      # 1-row n_total crossJoin (target ranks)
    "bm25_doc_ranking",          # 1-row corpus-stats crossJoin
    "token_cooccurrence_lift",   # 1-row doc-count crossJoin
    "user_daily_value_locf",     # 1-row day-bounds crossJoin (spine)
    "benford_value_audit",       # 1-row total over the 9-row digit frame
    "hard_negative_pairs",       # bounded TOPK_N_QUERIES query set broadcast
    "user_activity_gini",        # 1-row n_total crossJoin (rank formula)
    "key_skew_audit",            # two 1-row frames (quantiles, stats)
    "whale_revenue_share",       # 1-row n_total crossJoin (rank cut)
    "token_distribution_drift",  # 1-row slice-totals crossJoin
    "theta_user_set_ops",        # deliberate 1-row x 1-row scalar combine
                                 # (exact counts x sketch pair)
    "char_trigram_noise",        # 1-row n_docs crossJoin (head threshold)
    "heavy_hitter_ngrams",       # 1-row n_total crossJoin (threshold)
    "retention_survival_km",     # 1-row corpus-end crossJoin
    "seasonal_index_monthly",    # ±6-row band join on the calendar-
                                 # bounded monthly frame (both sides
                                 # ≤ |months| rows)
    "hits_purchase_graph",       # per-round 1-row MAX crossJoin
                                 # (max-normalization scalar)
    "hybrid_rrf_retrieval",      # 1-row query-vector crossJoin
    "cuped_adjusted_uplift",     # 1-row calendar-midpoint crossJoin
    "isotonic_conversion_by_activity",  # band joins on the <= ISO_CAP+1
                                        # -row activity grid (minimax)
    "poisson_bootstrap_value_ci",  # two 1-row CI-bound crossJoins
    "mmr_diverse_retrieval",     # 1-row query-vector crossJoin + the
                                 # 20x20 shortlist sim self-join
    "label_noise_audit",         # bounded NOISE_PROBES probe broadcast
    "seq_pattern_pairs",         # 1-row total-users crossJoin
    "doc_tf_cosine_pairs",       # 1-row n_docs crossJoin (df cap)
    "error_purchase_xcorr_lags",  # 7-row lag frame x calendar-bounded
                                  # daily frame (both volume-independent)
    "ppr_part_graph",            # 1-row source-node crossJoin per round
    "hourly_count_anomaly_ewma",  # |types| x calendar-hours zero-fill
                                  # grid (both volume-independent)
    "type_dow_cramers_v",        # 1-row (n, nr, nc) totals crossJoin
    "daily_revenue_sax",         # 1-row global-moment crossJoin
    "value_ks_drift",            # 1-row totals + 1-row max-gap crossJoins
    "token_bigram_lm",           # 1-row vocabulary-size crossJoin
    "daily_revenue_holt_winters",  # 1-row calendar-bounds crossJoin
                                   # (zero-fill spine)
    "itemcf_holdout_precision",  # 1-row cold-item-count crossJoin
    "ols_value_regression",      # (defensive; currently single aggregate)
    "value_anova_by_type",       # (defensive; currently single aggregate)
    "hub_closeness_centrality",  # 1-row n_nodes crossJoin
    "customer_order_span_union",  # (defensive; keyed joins only)
    "t_closeness_audit",         # 1-row n_total crossJoin
    "daily_revenue_runs_test",   # 1-row total crossJoin over the
                                 # one-row-per-day frame
    "bloom_blocklist_probe",     # 1-row broadcast Bloom word-map
    "welch_ttest_purchase_view",  # two 1-row moment frames crossJoined
    "unigram_sampling_table",    # 1-row (Z, T) normalizer crossJoin
    "mixture_epoch_plan",        # 1-row inventory-total crossJoin
    "neyman_allocation_by_type",  # 1-row normalizer crossJoin over the
                                  # |types| frame
    "event_type_mix_drift",      # bounded |types| x 2-halves grid
                                 # rebuild + 1-row totals crossJoins
    "inactivity_churn_rates",    # 1-row corpus-end + 3-row literal
                                 # window-ladder crossJoins
    "type_freshness_staleness",  # 1-row corpus high-water crossJoin
    "lang_source_association",   # bounded |langs| x |sources| grid
                                 # rebuild + 1-row totals crossJoins
    "part_supplier_hhi_bands",   # 1-row part-count total crossJoin
    "temporal_split_leakage_audit",  # 1-row calendar-midpoint crossJoin
    "corpus_datasheet_card",     # two 1-row summary frames crossJoined
    "best_split_value_for_purchase",  # 1-row totals + 1-row argmin
                                      # broadcasts
    "target_encode_mktsegment",  # 1-row global-moment crossJoin over the
                                 # 25-row (segment x fold) frame
    "kendall_tau_qty_discount",  # <=550-row domain-grid self-join + three
                                 # 1-row marginal/total crossJoins
    "value_kruskal_wallis",      # 1-row tie-cube crossJoin
    "conformal_value_interval",  # 1-row calib-moment / quantile / test-
                                 # coverage crossJoins
    "itemcf_holdout_ndcg",       # 1-row cold-count-free final aggregate
                                 # (defensive; keyed joins only)
    "doc_bigram_surprisal",      # 1-row vocabulary-size crossJoin
                                 # (the E157 smoothing denominator)
    "doc_length_quantile_normalize",  # 1-row pooled-total crossJoin over
                                      # the DOMAIN-bounded cell frame
    "hodges_lehmann_value",      # value-DOMAIN cell grid self-join
                                 # (<=~600^2, volume-independent) + 1-row
                                 # N / n_rows crossJoins
    "zonemap_prune_audit",       # 6-row literal probe frame broadcast
                                 # against the zones/base overlap joins
    "supplier_ontime_eb_shrunk",  # 1-row prior-moment crossJoin
    "event_feature_psi",         # 1-row calendar-midpoint crossJoin
    "replay_watermark_audit",    # 1-row quantile-array crossJoin +
                                 # the _distributed_quantiles target
                                 # broadcasts
    "kanon_generalization_plan",  # 1-row lattice-winner crossJoin
    "ab_sequential_obf",         # 1-row calendar-bounds + 1-row
                                 # first-crossing crossJoins
    "conversion_logrank_test",   # 1-row corpus-end crossJoin
    "join_skew_report",          # 1-row totals crossJoin over the
                                 # per-key COUNT frame
}

#: empty-partition (global) windows acceptable ONLY over provably bounded
#: frames (the docstrings carry the argument):
GLOBAL_WINDOW_OK = {
    "moving_avg_daily_revenue",  # pre-aggregated to one row per day
    "daily_revenue_interpolated",  # same one-row-per-day spine frame
    "ntile_customer_quartiles",  # pre-aggregated per-customer, then 4-tile
    "pack_token_offsets",        # N_GROUPS-row group-offset frame
    "pack_sequences_greedy",     # oracle-side only; Spark side has none
    "equidepth_price_histogram",  # prefix-sum over the P-row (32) per-
                                  # range-partition count frame
    "price_quartiles_disc",      # same _global_ranks P-row prefix-sum
    "orders_month_over_month",   # lag over the one-row-per-month frame
    "pareto_abc_brands",         # cumulative window over the |brands|
                                 # frame (bounded vocabulary, 25 rows)
    "brand_revenue_top5_other",  # rank window over the same |brands| frame
    "user_activity_gini",        # same _global_ranks P-row prefix-sum
                                 # as price_quartiles_disc
    "key_skew_audit",            # _distributed_quantiles P-row prefix-sum
    "whale_revenue_share",       # _global_ranks P-row prefix-sum
    "slo_burn_rate",             # 6h RANGE frame over the one-row-per-hour
                                 # frame (grows with calendar, not volume)
    "rolling_purchase_error_corr",  # 7d RANGE frame over the
                                    # one-row-per-day frame
    "type_hour_association",     # grand-total window over the bounded
                                 # |types|x24 contingency grid
    "skyline_customers_spend_orders",  # phase-2 dominance pass over the
                                       # union of 32 LOCAL skylines —
                                       # ~buckets·log n rows, not n
    "monthly_revenue_holt",      # month-indexing window over the
                                 # one-row-per-month frame (calendar)
    "order_backlog_curve",       # prefix sum over the one-row-per-day
                                 # delta frame (calendar)
    "retention_survival_km",     # at-risk suffix count over the
                                 # duration grid (bounded by calendar)
    "seasonal_index_monthly",    # month-index + count windows over the
                                 # one-row-per-month frame (calendar)
    "mannwhitney_value_by_cohort",  # rank prefix-sum over the value-
                                    # collapsed frame, bounded by the
                                    # 2-dp value DOMAIN not event volume
    "error_burst_viterbi",       # hour-indexing window over the
                                 # one-row-per-hour spine (calendar)
    "hybrid_rrf_retrieval",      # rank windows over the two LIMIT-ed
                                 # RRF_DEPTH-row ranker outputs
    "isotonic_conversion_by_activity",  # prefix sums over the bounded
                                        # activity grid
    "poisson_bootstrap_value_ci",  # rank window over the BOOT_B-row
                                   # replicate-mean frame
    "value_ks_drift",            # two-phase prefix sum: the only global
                                 # window is over the 32-row pid-offset
                                 # frame (the _global_ranks shape)
    "token_first_seen_curve",    # same 32-row pid-offset window
    "error_purchase_xcorr_lags",  # (defensive; windows none — lag join
                                  # on the calendar-bounded daily frame)
    "daily_revenue_sax",         # segment frame is |days|/8 (calendar)
    "hourly_count_anomaly_ewma",  # applyInPandas walk over the
                                  # calendar-bounded hourly grid
    "daily_revenue_holt_winters",  # same calendar-bounded daily walk
    "spearman_qty_price_corr",   # two-phase prefix sum: the only global
                                 # window is the 32-row pid-offset frame
    "active_users_7d_sliding",   # prefix sum over the one-row-per-day
                                 # delta frame (calendar)
    "daily_revenue_runs_test",   # lag over the one-row-per-day frame
                                 # (calendar)
    "daily_revenue_mase_baselines",  # lags over the one-row-per-day
                                     # frame (calendar)
    "best_split_value_for_purchase",  # two-phase prefix sum: only the
                                      # 32-row pid-offset frame
    "value_auc_for_purchase",    # rank prefix-sum over the value-
                                 # collapsed frame, bounded by the 2-dp
                                 # value DOMAIN (the E134 argument)
    "basket_size_wedge_budget",  # grand-total window over the
                                 # ≤|max basket size| histogram frame
    "value_kruskal_wallis",      # rank prefix-sum over the value-
                                 # collapsed frame (2-dp value DOMAIN)
    "value_decile_calibration",  # prefix/total windows over the value-
                                 # collapsed frame (2-dp value DOMAIN)
    "conformal_value_interval",  # prefix sum over the residual-DOMAIN
                                 # frame (bounded by the 2-dp value
                                 # domain; one residual per value)
    "doc_length_quantile_normalize",  # pooled-CDF prefix sum + as-of
                                      # carry over the length-DOMAIN
                                      # frames (equidepth waiver)
    "daily_revenue_bollinger",   # constant 20-day RANGE frame over the
                                 # one-row-per-day frame (calendar)
    "replay_watermark_audit",    # 32-row pid-offset prefix max + the
                                 # _global_ranks pid-offset window
    "snm_part_name_pairs",       # _global_ranks 32-row pid-offset
                                 # window (vocabulary ranking)
    "conversion_logrank_test",   # at-risk suffix counts over the
                                 # duration grid (calendar-bounded,
                                 # same shape as retention_survival_km)
    "hodges_lehmann_value",      # prefix sum over the <=2|u|-row
                                 # Walsh-sum DOMAIN frame
    "zonemap_prune_audit",       # cumulative count over the one-row-
                                 # per-date frame (calendar-bounded)
}


def _has_decimal(t: T.DataType) -> bool:
    """True if a DecimalType lurks anywhere in the (possibly nested) type."""
    if isinstance(t, T.DecimalType):
        return True
    if isinstance(t, T.ArrayType):
        return _has_decimal(t.elementType)
    if isinstance(t, T.MapType):
        return _has_decimal(t.keyType) or _has_decimal(t.valueType)
    if isinstance(t, T.StructType):
        return any(_has_decimal(f.dataType) for f in t.fields)
    return False


def _global_window_key(plan: str) -> str | None:
    for line in plan.splitlines():
        m = re.search(r"windowspecdefinition\(([^)]*)\)", line)
        # a partitioned window lists partition cols first (no ASC/DESC on
        # the first argument); a global one starts with the ORDER BY col
        if m and re.match(r"\s*\w+#\d+\w* (ASC|DESC)", m.group(1)):
            return m.group(1).split("#")[0].strip()
    return None


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_scale_hazards_in_plan(spark, name):
    df = QUERIES[name](spark, SF_DIR_SMOKE)
    # Registry lint (round-4 driver ERR class): an oracle-backed query
    # must not emit Array/Map/Struct columns — the correctness gate's
    # pandas canonicalizer cannot hash complex-typed cells, so the
    # driver ERRs before comparing even when the values are right.
    # Serialize such outputs (concat_ws/to_json) on BOTH sides instead.
    if name in ORACLES:
        complex_cols = [
            f.name
            for f in df.schema.fields
            if isinstance(
                f.dataType, (T.ArrayType, T.MapType, T.StructType)
            )
        ]
        assert not complex_cols, (
            f"{name}: oracle-backed query emits complex-typed columns "
            f"{complex_cols}; serialize them to strings on both sides"
        )
    # Registry lint (round-8 driver FAIL class, ab_sequential_obf): a
    # DecimalType output column hash-mismatches at the driver even when
    # every value is identical — DuckDB decimals reach the driver as
    # float64 while Spark decimals stay Decimal objects.  Bare decimal
    # literals (e.g. CASE ... THEN 4.1628) are the usual source; CAST
    # the expression to DOUBLE on both sides.  Applied to ALL registered
    # queries (rows-only ones included) so the class stays extinct.
    decimal_cols = [
        f.name for f in df.schema.fields if _has_decimal(f.dataType)
    ]
    assert not decimal_cols, (
        f"{name}: query emits DecimalType columns {decimal_cols}; "
        f"CAST to DOUBLE on both the Spark and oracle sides"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF (use Arrow/pandas form)"
    )
    if "BroadcastNestedLoopJoin" in plan:
        assert name in BNLJ_OK, (
            f"{name}: BroadcastNestedLoopJoin without a boundedness waiver"
        )
    key = _global_window_key(plan)
    if key is not None:
        assert name in GLOBAL_WINDOW_OK, (
            f"{name}: global window over '{key}' without a waiver"
        )


def test_no_decimal_in_oracle_outputs():
    """Oracle-side companion to the DecimalType lint: a DECIMAL column in
    the DuckDB oracle output reaches the driver as float64 via a silent
    decimal->double conversion, which can drift from Spark's DOUBLE
    arithmetic (e.g. SUM over DECIMAL vs SUM over DOUBLE).  Keep both
    sides DOUBLE at the SQL level.  DESCRIBE is planning-only, so this
    sweeps all oracles in seconds."""
    from .parity import oracle_connection

    con = oracle_connection(SF_DIR_SMOKE)
    try:
        offenders = {}
        for name, sql in sorted(ORACLES.items()):
            cols = con.execute(f"DESCRIBE {sql}").fetchall()
            # HUGEINT is the same hazard class (round-1 shipped four
            # uncast SUM(bigint) oracles): INT128 exceeds pandas int64,
            # surfaces as float64/object at the driver, and
            # hash-mismatches Spark BIGINT.
            bad = [
                f"{c}:{ctype}"
                for c, ctype, *_ in cols
                if "DECIMAL" in ctype.upper() or "HUGEINT" in ctype.upper()
            ]
            if bad:
                offenders[name] = bad
    finally:
        con.close()
    assert not offenders, (
        f"oracles emit DECIMAL/HUGEINT columns (lossy at the driver): "
        f"{offenders}; CAST to DOUBLE/BIGINT in the oracle SQL"
    )


def test_decimal_lint_catches_planted_offender(spark):
    """The lint must actually fire on the round-8 failure shape: a bare
    decimal literal in a CASE (pre-fix ab_sequential_obf) produces a
    DecimalType output column."""
    df = spark.sql(
        "SELECT CASE WHEN 1 = 1 THEN 4.1628 ELSE 20.8141 END AS z2_boundary"
    )
    assert _has_decimal(df.schema["z2_boundary"].dataType)
    # nested variants must be caught too
    nested = spark.sql("SELECT array(1.5) AS a, struct(2.5 AS x) AS s")
    assert _has_decimal(nested.schema["a"].dataType)
    assert _has_decimal(nested.schema["s"].dataType)


def test_parity_reproduces_driver_decimal_mismatch(spark):
    """Round-8 driver-blindness regression: a query whose Spark output is
    DECIMAL while the oracle's identical values arrive as float64 must
    FAIL local parity (the driver hash-mismatches this shape).  Before
    the round-9 run_oracle change, both sides canonicalized as Decimal
    and this passed locally while failing remotely."""
    from .conftest import SF_DIR_SMOKE
    from .parity import compare

    def planted(spark, sf_dir):
        return spark.sql(
            "SELECT 1 AS look, CASE WHEN 1 = 1 THEN 4.1628 END AS z2b"
        )

    ok, detail = compare(
        spark,
        "planted_decimal",
        planted,
        "SELECT 1 AS look, CASE WHEN 1 = 1 THEN 4.1628 END AS z2b",
        SF_DIR_SMOKE,
    )
    assert not ok, "decimal output must mismatch like the driver does"
    assert "dec" in detail, detail


# ---------------------------------------------------------------------------
# Self-checking waivers (round-7): every GLOBAL_WINDOW_OK entry claims its
# frame is BOUNDED (calendar / domain / constant, not data volume).  The
# static comment is now enforced at runtime: each waived query executes at
# sf0.1, the executed plan's global-partition Window nodes are located, and
# the row count actually flowing through each frame (the first descendant
# row metric) is asserted against the documented bound.  A future edit that
# turns a bounded frame volume-linear fails HERE with numbers, instead of
# warning 'No Partition Defined' in the driver log.
# ---------------------------------------------------------------------------

SF_DIR_WINDOW = "/root/testdata/sf0.1"


@pytest.fixture(scope="session")
def window_bound_probes(spark):
    from pyspark.sql import functions as F

    from tdk_apache_log_etl_spark.sources.tables import load_table

    orders = load_table(spark, SF_DIR_WINDOW, "orders")
    events = load_table(spark, SF_DIR_WINDOW, "events")
    docs = load_table(spark, SF_DIR_WINDOW, "documents")
    o = orders.agg(
        F.countDistinct("o_orderdate").alias("days"),
        (F.datediff(F.max("o_orderdate"), F.min("o_orderdate")) + 1).alias(
            "span_days"
        ),
        F.countDistinct(F.date_trunc("month", "o_orderdate")).alias(
            "months"
        ),
    ).collect()[0]
    e = events.agg(
        (
            F.datediff(F.max("ts"), F.min("ts")) + 1
        ).alias("span_days"),
        F.countDistinct(F.date_trunc("hour", "ts")).alias("hours"),
        F.countDistinct("event_type").alias("types"),
        F.countDistinct(F.round("value", 2)).alias("value_domain"),
    ).collect()[0]
    n_customers = load_table(spark, SF_DIR_WINDOW, "customer").count()
    doc_lengths = docs.select("n_chars").distinct().count()
    doc_len_cells = docs.select("source", "n_chars").distinct().count()
    li = load_table(spark, SF_DIR_WINDOW, "lineitem")
    ship_span = (
        orders.agg(F.min("o_orderdate").alias("lo"))
        .crossJoin(li.agg(F.max("l_shipdate").alias("hi")))
        .select((F.datediff("hi", "lo") + 2).alias("s"))
        .collect()[0]
        .s
    )
    return {
        "days_orders": int(o.days),
        "span_days_orders": int(o.span_days),
        "months_orders": int(o.months),
        "span_days_events": int(e.span_days),
        "hours_events": int(e.hours),
        "types_events": int(e.types),
        "value_domain": int(e.value_domain),
        "n_customers": int(n_customers),
        "doc_length_domain": int(doc_lengths),
        "doc_length_cells": int(doc_len_cells),
        "order_ship_span_days": int(ship_span),
    }


#: name -> bound expression over the probes (None = the waiver claims the
#: Spark plan has NO global window at all; assert exactly that).  Bounds
#: carry 2x-ish slack — the point is catching volume-linear frames
#: (>=60k rows at sf0.1), not exact row accounting.
GLOBAL_WINDOW_BOUNDS = {
    "moving_avg_daily_revenue": lambda p: p["span_days_orders"] + 2,
    "daily_revenue_interpolated": lambda p: p["span_days_orders"] + 2,
    "ntile_customer_quartiles": lambda p: p["n_customers"],
    "pack_token_offsets": lambda p: 33,  # N_GROUPS=32 offset frame
    "pack_sequences_greedy": None,  # oracle-side only
    "equidepth_price_histogram": lambda p: 33,  # pid-offset frame
    "price_quartiles_disc": lambda p: 33,
    "user_activity_gini": lambda p: 33,
    "key_skew_audit": lambda p: 33,
    "whale_revenue_share": lambda p: 33,
    "value_ks_drift": lambda p: 33,
    "token_first_seen_curve": lambda p: 33,
    "spearman_qty_price_corr": lambda p: 33,
    "best_split_value_for_purchase": lambda p: 33,
    "replay_watermark_audit": lambda p: 33,
    "snm_part_name_pairs": lambda p: 33,
    "orders_month_over_month": lambda p: p["months_orders"] + 1,
    "pareto_abc_brands": lambda p: 26,
    "brand_revenue_top5_other": lambda p: 26,
    "slo_burn_rate": lambda p: p["hours_events"] + 2,
    "rolling_purchase_error_corr": lambda p: p["span_days_events"] + 2,
    "type_hour_association": lambda p: p["types_events"] * 24,
    "skyline_customers_spend_orders": lambda p: 5000,  # buckets*log n
    "monthly_revenue_holt": lambda p: p["months_orders"] + 1,
    # delta frame spans placement through last shipment + 1
    "order_backlog_curve": lambda p: p["order_ship_span_days"] + 2,
    "retention_survival_km": lambda p: p["span_days_events"] + 2,
    "seasonal_index_monthly": lambda p: p["months_orders"] + 1,
    "mannwhitney_value_by_cohort": lambda p: p["value_domain"] + 2,
    "error_burst_viterbi": lambda p: p["hours_events"] + 2,
    "hybrid_rrf_retrieval": lambda p: 2 * 20 + 2,  # 2x RRF_DEPTH
    "isotonic_conversion_by_activity": lambda p: 2 * (20 + 1),  # ISO_CAP
    "poisson_bootstrap_value_ci": None,  # single-pass agg since r7
    "error_purchase_xcorr_lags": None,  # lag join, no window
    "daily_revenue_sax": lambda p: p["span_days_orders"] + 2,
    "hourly_count_anomaly_ewma": None,  # applyInPandas walk, no window
    "daily_revenue_holt_winters": None,  # applyInPandas walk, no window
    "active_users_7d_sliding": lambda p: p["span_days_events"] + 2,
    "daily_revenue_runs_test": lambda p: p["span_days_orders"] + 2,
    "daily_revenue_mase_baselines": lambda p: p["span_days_orders"] + 2,
    "value_auc_for_purchase": lambda p: p["value_domain"] + 2,
    "basket_size_wedge_budget": lambda p: 100,  # max basket-size grid
    "value_kruskal_wallis": lambda p: p["value_domain"] + 2,
    "value_decile_calibration": lambda p: p["value_domain"] + 2,
    "conformal_value_interval": lambda p: 2 * p["value_domain"] + 2,
    # as-of union frame: |source x n_chars| cells + |n_chars| pooled rows
    "doc_length_quantile_normalize": lambda p: p["doc_length_cells"]
    + p["doc_length_domain"]
    + 2,
    "daily_revenue_bollinger": lambda p: p["span_days_orders"] + 2,
    "conversion_logrank_test": lambda p: p["span_days_events"] + 2,
    "hodges_lehmann_value": lambda p: 2 * p["value_domain"] + 3,
    "zonemap_prune_audit": lambda p: p["span_days_orders"] + 2,
}


def _walk_exec(node, out):
    out.append(node)
    name = node.nodeName()
    if name == "AdaptiveSparkPlan":
        _walk_exec(node.executedPlan(), out)
        return
    for i in range(node.children().size()):
        _walk_exec(node.children().apply(i), out)
    if "QueryStage" in name:
        try:
            _walk_exec(node.plan(), out)
        except Exception:
            pass


def _frame_rows(window_node):
    """Rows flowing through a Window node: the first descendant exposing
    a row metric (Window itself only reports spillSize)."""
    sub = []
    for i in range(window_node.children().size()):
        _walk_exec(window_node.children().apply(i), sub)
    for n in sub:
        mets = n.metrics()
        for key in ("numOutputRows", "shuffleRecordsWritten", "recordsRead"):
            if mets.contains(key):
                v = mets.apply(key).value()
                if v is not None and v >= 0:
                    return int(v)
    return None


def test_waiver_table_covers_every_global_window_waiver():
    missing = GLOBAL_WINDOW_OK - set(GLOBAL_WINDOW_BOUNDS)
    assert not missing, (
        f"waived queries without a runtime bound entry: {sorted(missing)}"
    )


@pytest.mark.parametrize("name", sorted(GLOBAL_WINDOW_BOUNDS))
def test_waived_global_window_frames_are_bounded(
    spark, name, window_bound_probes
):
    bound_fn = GLOBAL_WINDOW_BOUNDS[name]
    df = QUERIES[name](spark, SF_DIR_WINDOW)
    df.collect()
    nodes = []
    _walk_exec(df._jdf.queryExecution().executedPlan(), nodes)
    global_windows = []
    for n in nodes:
        if "Window" not in n.nodeName():
            continue
        try:
            if n.partitionSpec().isEmpty():
                global_windows.append(n)
        except Exception:
            continue
    if bound_fn is None:
        assert not global_windows, (
            f"{name}: waiver claims NO global window, found "
            f"{[n.nodeName() for n in global_windows]}"
        )
        return
    bound = bound_fn(window_bound_probes)
    for w in global_windows:
        rows = _frame_rows(w)
        assert rows is not None, f"{name}: no row metric under Window"
        assert rows <= bound, (
            f"{name}: global window frame has {rows} rows at sf0.1, "
            f"documented bound is {bound} — the waiver's boundedness "
            "argument no longer holds"
        )


# ---------------------------------------------------------------------------
# Spark-Connect safety lint (round-10 gate)
# ---------------------------------------------------------------------------

#: Files allowed to touch classic-only driver APIs, with why.
_CONNECT_WAIVERS = {
    # Driver-side JDBC DELETE for the exactly-once streaming sink: the
    # py4j DriverManager bridge is inherently classic; under Connect the
    # foreachBatch callback would need a python JDBC client instead.
    "streaming/jdbc_stream.py": {"_jvm"},
    # The Connect-safe fallbacks themselves live here (try classic API,
    # degrade to server-side confs / conservative None).
    "session.py": {"sparkContext", ".rdd"},
}

_CONNECT_FATAL = ("._jvm", "._jsc", "._jdf", "sparkContext", ".rdd")


def test_connect_safety_lint():
    """Classic-only driver APIs (_jvm/_jsc/sparkContext/DataFrame.rdd)
    are forbidden in the package outside the documented waiver table —
    everything else goes through session.default_parallelism /
    session.input_partitions so a Spark Connect client degrades
    gracefully instead of dying on SparkContext access. (A live Connect
    smoke needs grpcio, which this container doesn't ship — the lint is
    the enforceable half; the fallback paths are unit-tested below.)"""
    import os

    pkg = os.path.join(os.path.dirname(__file__), "..",
                       "tdk_apache_log_etl_spark")
    offenders = []
    for root, _, files in os.walk(pkg):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(root, fname)
            rel = os.path.relpath(path, pkg).replace(os.sep, "/")
            allowed = _CONNECT_WAIVERS.get(rel, set())
            for i, line in enumerate(open(path), start=1):
                code = line.split("#", 1)[0]
                if '"""' in line or "'''" in line or code.strip().startswith(('"', "'")):
                    continue  # docstring/comment mentions are fine
                for tok in _CONNECT_FATAL:
                    if tok in code and not any(a in tok or tok.lstrip(".") == a.lstrip(".")
                                               for a in allowed):
                        if tok == ".rdd" and ".rdd" in code and "input_partitions" in code:
                            continue
                        offenders.append(f"{rel}:{i} uses {tok}")
    assert not offenders, "Connect-unsafe API outside waivers:\n" + "\n".join(offenders)


def test_connect_fallback_helpers(spark):
    """The Connect-degradation helpers return sane values on a classic
    session (the only kind this container can start) and their fallback
    arms produce ints, not exceptions, when the classic API is absent."""
    from tdk_apache_log_etl_spark.session import (
        default_parallelism,
        input_partitions,
    )

    p = default_parallelism(spark)
    assert isinstance(p, int) and p >= 1
    df = spark.range(10)
    np_ = input_partitions(df)
    assert np_ is None or (isinstance(np_, int) and np_ >= 1)

    class _FakeConf:
        def get(self, key):
            if key == "spark.sql.shuffle.partitions":
                return "17"
            raise Exception("no such conf")

    class _FakeConnectSession:
        conf = _FakeConf()

        @property
        def sparkContext(self):
            raise Exception("SparkContext is not supported in Connect")

    assert default_parallelism(_FakeConnectSession()) == 17

    class _FakeConnectDF:
        @property
        def rdd(self):
            raise Exception("rdd is not supported in Connect")

    assert input_partitions(_FakeConnectDF()) is None
