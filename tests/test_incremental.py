"""Incremental rollup maintenance: merge(rollup(A), rollup(B)) must be
bit-identical to rollup(A ∪ B) — the contract that makes per-day
maintenance O(delta) instead of a history rescan."""

from __future__ import annotations

import pyspark.sql.functions as F

from tdk_apache_log_etl_spark.operators.incremental import (
    daily_rollup,
    merge_daily_rollup,
)
from tdk_apache_log_etl_spark.sources.tables import load_table

from .conftest import SF_DIR_CORRECT


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_incremental_merge_equals_full_recompute(spark):
    events = load_table(spark, SF_DIR_CORRECT, "events")
    # split into "history" and an overlapping "delta" batch: the delta
    # includes a day boundary's worth of late/duplicate-day events, the
    # realistic shape (a delta is rarely day-aligned)
    history = events.where(F.col("event_id") % 10 != 0)
    delta = events.where(F.col("event_id") % 10 == 0)

    merged = merge_daily_rollup(daily_rollup(history), daily_rollup(delta))
    full = daily_rollup(events)
    assert _rows(merged) == _rows(full)


def test_merge_passes_untouched_days_through(spark):
    events = load_table(spark, SF_DIR_CORRECT, "events")
    first_day = events.agg(F.min(F.to_date("ts"))).collect()[0][0]
    history = daily_rollup(events)
    delta_events = events.where(F.to_date("ts") == first_day)
    merged = merge_daily_rollup(history, daily_rollup(delta_events))

    # only the delta's day changed; every other day's row is identical
    m = {r.day: tuple(r) for r in merged.collect()}
    h = {r.day: tuple(r) for r in history.collect()}
    assert set(m) == set(h)
    changed = [d for d in m if m[d] != h[d]]
    assert changed == [first_day]
    # and the changed day doubled its counts (delta == that day's facts)
    assert m[first_day][1] == 2 * h[first_day][1]


def test_merge_cost_is_rollup_sized(spark):
    # Scale proof at the plan level: the merge plan must not reference
    # the events fact table at all — only the two rollup inputs.
    events = load_table(spark, SF_DIR_CORRECT, "events")
    r1 = daily_rollup(events).localCheckpoint()  # materialized rollup table
    r2 = daily_rollup(events.limit(0)).localCheckpoint()
    plan = (
        merge_daily_rollup(r1, r2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "parquet" not in plan.lower()


def test_transition_merge_equals_direct_recompute(spark):
    # Split the fixture's events at a mid-month seam; maintaining the
    # transition matrix incrementally (batch counts + per-user boundary
    # seam pairs) must reproduce the direct full recompute EXACTLY.
    from pyspark.sql import functions as F

    from tdk_apache_log_etl_spark.operators.incremental import (
        merge_transition_state,
        transition_state,
    )
    from tdk_apache_log_etl_spark.sources.tables import load_table

    from .conftest import SF_DIR_SMOKE

    events = load_table(spark, SF_DIR_SMOKE, "events")
    cut = "2024-01-15"
    a = events.where(F.col("ts") < F.lit(cut).cast("timestamp_ntz"))
    b = events.where(F.col("ts") >= F.lit(cut).cast("timestamp_ntz"))
    assert a.count() > 0 and b.count() > 0

    ca, sa = transition_state(a)
    cb, sb = transition_state(b)
    merged_counts, merged_state = merge_transition_state(ca, sa, cb, sb)

    direct_counts, direct_state = transition_state(events)
    got = {
        (r.from_type, r.to_type): r.n for r in merged_counts.collect()
    }
    want = {
        (r.from_type, r.to_type): r.n for r in direct_counts.collect()
    }
    assert got == want
    got_state = {
        r.user_id: (r.first_type, r.last_type)
        for r in merged_state.collect()
    }
    want_state = {
        r.user_id: (r.first_type, r.last_type)
        for r in direct_state.collect()
    }
    assert got_state == want_state


def test_transition_merge_plan_never_rescans_facts(spark):
    from pyspark.sql import functions as F

    from tdk_apache_log_etl_spark.operators.incremental import (
        merge_transition_state,
        transition_state,
    )
    from tdk_apache_log_etl_spark.sources.tables import load_table

    from .conftest import SF_DIR_SMOKE

    events = load_table(spark, SF_DIR_SMOKE, "events")
    c, s = transition_state(events)
    # materialize the maintained pair (the stored rollup tables)
    c = spark.createDataFrame(c.collect(), c.schema)
    s = spark.createDataFrame(s.collect(), s.schema)
    delta = events.limit(0)
    dc, ds = transition_state(delta)
    dc = spark.createDataFrame(dc.collect(), dc.schema)
    ds = spark.createDataFrame(ds.collect(), ds.schema)
    mc, ms = merge_transition_state(c, s, dc, ds)
    for df in (mc, ms):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "parquet" not in plan.lower()  # no fact-table scan


def test_join_view_merge_equals_full_recompute(spark):
    from pyspark.sql import functions as F

    from tdk_apache_log_etl_spark.operators.incremental import (
        merge_join_view,
        orders_by_customer,
        revenue_by_nation,
    )
    from tdk_apache_log_etl_spark.sources.tables import load_table

    orders = load_table(spark, SF_DIR_CORRECT, "orders")
    customer = load_table(spark, SF_DIR_CORRECT, "customer")
    seam = F.lit("1996-01-01").cast(orders.schema["o_orderdate"].dataType)
    a_old = orders.where(F.col("o_orderdate") < seam)
    da = orders.where(F.col("o_orderdate") >= seam)
    b_old = customer.where(F.col("c_custkey") % 10 != 0)
    db = customer.where(F.col("c_custkey") % 10 == 0)
    assert da.count() > 0 and db.count() > 0

    v_new, r_new = merge_join_view(
        revenue_by_nation(a_old, b_old),
        orders_by_customer(a_old),
        da,
        customer,
        db,
    )
    assert _rows(v_new) == _rows(revenue_by_nation(orders, customer))
    # the maintained fact partials must also equal a from-scratch rebuild
    assert _rows(r_new) == _rows(orders_by_customer(orders))


def test_join_view_merge_never_rescans_old_facts(spark, tmp_path):
    # Scale proof: with state materialized and the delta arriving as its
    # own batch, the merge plan may scan the DELTA batch and the customer
    # dimension — but never the historical orders fact table.
    from pyspark.sql import functions as F

    from tdk_apache_log_etl_spark.operators.incremental import (
        merge_join_view,
        orders_by_customer,
        revenue_by_nation,
    )
    from tdk_apache_log_etl_spark.sources.tables import load_table

    orders = load_table(spark, SF_DIR_CORRECT, "orders")
    customer = load_table(spark, SF_DIR_CORRECT, "customer")
    seam = F.lit("1996-01-01").cast(orders.schema["o_orderdate"].dataType)
    a_old = orders.where(F.col("o_orderdate") < seam)
    delta_path = str(tmp_path / "delta_orders.parquet")
    orders.where(F.col("o_orderdate") >= seam).write.parquet(delta_path)
    da = spark.read.parquet(delta_path)
    db = customer.where(F.col("c_custkey") % 10 == 0)

    v_old = revenue_by_nation(
        a_old, customer.where(F.col("c_custkey") % 10 != 0)
    ).localCheckpoint()
    r_old = orders_by_customer(a_old).localCheckpoint()
    v_new, _ = merge_join_view(v_old, r_old, da, customer, db)
    plan = v_new._jdf.queryExecution().executedPlan().toString()
    scanned = [ln for ln in plan.splitlines() if "orders.parquet" in ln]
    assert not any(
        "testdata" in ln for ln in scanned
    ), f"merge rescanned historical facts: {scanned}"
    # the delta batch and the dimension ARE scanned (paths are truncated
    # in the rendered plan, so count scans rather than match full paths)
    assert plan.count("Scan parquet") >= 2
