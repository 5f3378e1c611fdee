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
