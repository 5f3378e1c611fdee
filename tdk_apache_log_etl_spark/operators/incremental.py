"""Incremental aggregate maintenance: keep a daily rollup current by
merging a delta batch's aggregates — O(delta), never a rescan of history.

The reference recomputes its three metrics from the full table nightly
(sree-etl-tdk-glue-job.py:52-68); at 100 TB a full-history re-aggregation
per day is the canonical scale failure. The incremental contract:

    rollup(facts ∪ delta) == merge(rollup(facts), rollup(delta))

which holds exactly for DECOMPOSABLE aggregates — counts and sums merge
by addition (on exact scaled integers here, so merge order is
irrelevant), min/max by min/max. Distinct counts are NOT decomposable in
this form; they ride as mergeable HLL sketches (operators/sketches.py,
maintained from a live stream in streaming/sketch_rollup.py).

The merge is one union of two rollup-sized frames plus a re-aggregate on
the day key — the fact tables are never touched. Day keys absent from
the delta pass through unchanged; brand-new days appear; overlapping
days combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Fixed-point scale for exact value sums (matches operators/numeric.py).
_SCALE = 10**4


def daily_rollup(events: DataFrame) -> DataFrame:
    """Aggregate an events frame to the rollup grain: one row per day
    with additive/extremal metrics only (n_events, scaled value sum,
    min/max value in scaled integers — exact, order-independent)."""
    return (
        events.select(
            F.to_date("ts").alias("day"),
            F.floor(F.col("value") * _SCALE + F.lit(0.5)).alias("v_scaled"),
        )
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("v_scaled").alias("sum_v_scaled"),
            F.min("v_scaled").alias("min_v_scaled"),
            F.max("v_scaled").alias("max_v_scaled"),
        )
    )


def merge_daily_rollup(existing: DataFrame, delta: DataFrame) -> DataFrame:
    """Merge a delta-batch rollup into an existing rollup.

    Both inputs are rollup-grain frames (from daily_rollup). One
    unionByName + one hash aggregate on day — cost is O(|existing
    rollup| + |delta days|), independent of fact-table size. Counts and
    sums add; min/max fold; every metric is an exact integer, so the
    merged rollup is bit-identical to a from-scratch recompute (asserted
    in tests/test_incremental.py)."""
    return (
        existing.unionByName(delta)
        .groupBy("day")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_v_scaled").alias("sum_v_scaled"),
            F.min("min_v_scaled").alias("min_v_scaled"),
            F.max("max_v_scaled").alias("max_v_scaled"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental SEQUENCE aggregate: transition-matrix maintenance.
#
# Unlike the additive rollup above, next-event transition counts
# (operators/logmetrics.py event_transition_matrix) are NOT decomposable
# by simple addition: concatenating two batches creates one extra
# transition per user at the seam (their last event of batch 1 -> their
# first event of batch 2). The exact incremental form therefore carries
# per-user BOUNDARY state (first/last event type) alongside the counts:
#
#   trans(A ++ B) == trans(A) + trans(B) + seam_pairs(state(A), state(B))
#
# Contract: batches are time-ordered and append-only (every event in the
# delta is later than every event of the same user in the existing state)
# — the same contract micro-batch streaming provides. Cost of a merge is
# O(|type vocabulary|^2 + |active users|), never a fact rescan.
# ---------------------------------------------------------------------------


def transition_state(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Compute (transition_counts, per-user boundary state) for a batch.

    counts: (from_type, to_type, n) — within-batch transitions only.
    state:  (user_id, first_type, last_type) by (ts, event_id) order."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = events.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    order_key = F.struct("ts", "event_id")
    state = events.groupBy("user_id").agg(
        F.min_by("event_type", order_key).alias("first_type"),
        F.max_by("event_type", order_key).alias("last_type"),
    )
    return counts, state


def merge_transition_state(
    old_counts: DataFrame,
    old_state: DataFrame,
    delta_counts: DataFrame,
    delta_state: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """Merge a later batch's (counts, state) into the maintained pair.

    The seam join touches only users present in BOTH sides (inner join
    on the user-sized state frames); counts union at vocabulary² size.
    Result is bit-identical to recomputing over the concatenated facts
    (asserted in tests/test_incremental.py)."""
    seam = (
        old_state.alias("o")
        .join(delta_state.alias("d"), "user_id")
        .groupBy(
            F.col("o.last_type").alias("from_type"),
            F.col("d.first_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    counts = (
        old_counts.unionByName(delta_counts)
        .unionByName(seam)
        .groupBy("from_type", "to_type")
        .agg(F.sum("n").alias("n"))
    )
    state = (
        old_state.alias("o")
        .join(delta_state.alias("d"), "user_id", "full_outer")
        .select(
            "user_id",
            F.coalesce(F.col("o.first_type"), F.col("d.first_type")).alias(
                "first_type"
            ),
            F.coalesce(F.col("d.last_type"), F.col("o.last_type")).alias(
                "last_type"
            ),
        )
    )
    return counts, state


def _register() -> None:
    """Driver-checked query: maintain the transition matrix over a
    mid-month seam split and return the merged counts. The DuckDB oracle
    computes the DIRECT full recompute — so the driver's hash comparison
    IS the merge==recompute equivalence proof, independently verified."""
    from ..sources.tables import load_table
    from .registry import query

    @query(
        "transition_matrix_incremental",
        oracle="""
            WITH pairs AS (
              SELECT event_type AS from_type,
                     lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                     ) AS to_type
              FROM events
            )
            SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM pairs WHERE to_type IS NOT NULL GROUP BY 1, 2
        """,
    )
    def transition_matrix_incremental(spark, sf_dir):
        events = load_table(spark, sf_dir, "events")
        cut = F.lit("2024-01-15").cast("timestamp_ntz")
        a = events.where(F.col("ts") < cut)
        b = events.where(F.col("ts") >= cut)
        ca, sa = transition_state(a)
        cb, sb = transition_state(b)
        counts, _state = merge_transition_state(ca, sa, cb, sb)
        return counts

    _ = transition_matrix_incremental  # registered via decorator


_register()


def _register_daily() -> None:
    """Driver-checked query for the ADDITIVE rollup: maintain the daily
    rollup across a mid-month seam via merge_daily_rollup; the oracle is
    the direct full aggregation, so the hash gate proves
    merge == recompute for the decomposable-aggregate path too."""
    from ..sources.tables import load_table
    from .registry import query

    @query(
        "daily_rollup_incremental",
        oracle=f"""
            SELECT CAST(ts AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CAST(FLOOR(value * {_SCALE} + 0.5) AS BIGINT))
                        AS BIGINT) AS sum_v_scaled,
                   CAST(MIN(CAST(FLOOR(value * {_SCALE} + 0.5) AS BIGINT))
                        AS BIGINT) AS min_v_scaled,
                   CAST(MAX(CAST(FLOOR(value * {_SCALE} + 0.5) AS BIGINT))
                        AS BIGINT) AS max_v_scaled
            FROM events GROUP BY 1
        """,
    )
    def daily_rollup_incremental(spark, sf_dir):
        events = load_table(spark, sf_dir, "events")
        cut = F.lit("2024-01-15").cast("timestamp_ntz")
        existing = daily_rollup(events.where(F.col("ts") < cut))
        delta = daily_rollup(events.where(F.col("ts") >= cut))
        return merge_daily_rollup(existing, delta)

    _ = daily_rollup_incremental


_register_daily()


# ---------------------------------------------------------------------------
# Incremental JOIN-VIEW maintenance (two-sided deltas).
#
# The rollup above maintains a single-table aggregate; real marts maintain
# aggregates over JOINS (revenue by nation = orders ⋈ customer). The naive
# incremental form  ΔV = agg(ΔA ⋈ B) + agg(A ⋈ ΔB)  still rescans the fact
# table A when a dimension row arrives late. The classic fix (deferred-view
# maintenance with auxiliary aggregates) is to maintain, alongside the view,
# the per-join-key partial aggregate of the facts:
#
#   R       : o_custkey -> (n_orders, sum_scaled)      (fact partials)
#   V       : nationkey -> (n_orders, sum_scaled)      (the join view)
#
#   on ΔA (new orders):     V += agg(ΔA ⋈ B_new);  R += partials(ΔA)
#   on ΔB (late customers): V += R ⋈ ΔB            (NO fact rescan)
#
# Correctness quadrants: A_old⋈B_old is V_old; ΔA⋈(B_old ∪ ΔB) is the first
# term; A_old⋈ΔB is the second (R rows for B_old keys join nothing because
# dimension keys arrive exactly once — append-only dimension contract).
# Every metric is an exact integer, so merge order is irrelevant and the
# maintained view is bit-identical to a full recompute — which is exactly
# what the registered query's DuckDB oracle verifies.
# ---------------------------------------------------------------------------


def revenue_by_nation(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Direct (non-incremental) form of the join view: revenue and order
    count per customer nation. Used to seed state and as the recompute
    baseline in tests."""
    return (
        orders.select(
            "o_custkey",
            F.floor(F.col("o_totalprice") * _SCALE + F.lit(0.5))
            .cast("long")
            .alias("sc"),
        )
        .join(
            customer.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("sc").alias("sum_scaled"),
        )
    )


def orders_by_customer(orders: DataFrame) -> DataFrame:
    """The auxiliary fact partials R: per-custkey order count and exact
    scaled revenue. |customers|-sized, join-key-partitioned — this is what
    makes late-dimension merges fact-rescan-free."""
    return (
        orders.select(
            "o_custkey",
            F.floor(F.col("o_totalprice") * _SCALE + F.lit(0.5))
            .cast("long")
            .alias("sc"),
        )
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("sc").alias("sum_scaled"),
        )
    )


def merge_join_view(
    view_old: DataFrame,
    orders_agg_old: DataFrame,
    delta_orders: DataFrame,
    customer_new: DataFrame,
    delta_customer: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """Fold an order delta AND a late-arriving customer delta into the
    maintained (view, fact-partials) pair.

    Cost: agg(ΔA) ⋈ dimension + R ⋈ ΔB + a view-sized re-aggregate. The
    historical fact table never appears in the plan (asserted in
    tests/test_incremental.py); the returned pair is bit-identical to
    rebuilding from the concatenated inputs."""
    delta_partials = orders_by_customer(delta_orders)
    dv_orders = (
        delta_partials.join(
            customer_new.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("sum_scaled").alias("sum_scaled"),
        )
    )
    dv_customers = (
        # no broadcast hint: a dimension backfill can be arbitrarily large
        # (it grows with SF); AQE picks broadcast when the delta is small
        orders_agg_old.join(
            delta_customer.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("sum_scaled").alias("sum_scaled"),
        )
    )
    view_new = (
        view_old.unionByName(dv_orders)
        .unionByName(dv_customers)
        .groupBy("nationkey")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("sum_scaled").alias("sum_scaled"),
        )
    )
    orders_agg_new = (
        orders_agg_old.unionByName(delta_partials)
        .groupBy("o_custkey")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("sum_scaled").alias("sum_scaled"),
        )
    )
    return view_new, orders_agg_new


def _register_join_view() -> None:
    """Driver-checked query: maintain revenue-by-nation across BOTH an
    order seam (orders from 1996 on arrive as the delta) and a
    late-arriving dimension slice (every 10th customer key is absent when
    the view is seeded). The oracle recomputes the join view directly
    from the full tables — the hash gate is the merge==recompute proof."""
    from ..sources.tables import load_table
    from .registry import query

    @query(
        "join_view_incremental",
        oracle=f"""
            SELECT c.c_nationkey AS nationkey,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(CAST(FLOOR(o.o_totalprice * {_SCALE} + 0.5)
                                 AS BIGINT)) AS DOUBLE) / {_SCALE} AS revenue
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_nationkey
        """,
    )
    def join_view_incremental(spark, sf_dir):
        orders = load_table(spark, sf_dir, "orders")
        customer = load_table(spark, sf_dir, "customer")
        seam = F.lit("1996-01-01").cast(
            orders.schema["o_orderdate"].dataType
        )
        a_old = orders.where(F.col("o_orderdate") < seam)
        da = orders.where(F.col("o_orderdate") >= seam)
        b_old = customer.where(F.col("c_custkey") % 10 != 0)
        db = customer.where(F.col("c_custkey") % 10 == 0)
        v_old = revenue_by_nation(a_old, b_old)
        r_old = orders_by_customer(a_old)
        v_new, _r_new = merge_join_view(v_old, r_old, da, customer, db)
        return v_new.select(
            "nationkey",
            "n_orders",
            (F.col("sum_scaled").cast("double") / _SCALE).alias("revenue"),
        )

    _ = join_view_incremental


_register_join_view()
