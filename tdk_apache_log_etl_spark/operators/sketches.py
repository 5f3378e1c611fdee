"""Mergeable-sketch operators: HLL distinct-count rollups.

The 100 TB pattern for distinct counts is NOT ``COUNT(DISTINCT ...)``
over raw facts at query time — it is: build tiny MERGEABLE binary
sketches at the finest grain once, persist them as a sketch table
(kilobytes per cell), and answer every coarser question by merging
sketches, never rescanning the fact table. This is the hypertable /
materialized-rollup design: a day×type sketch table answers per-day,
per-type, and grand-total distinct-user questions with a union that
touches only the sketch rows. ``COUNT(DISTINCT)`` does not compose this
way (distinct counts are not additive across groups); sketches do.

Spark 4 ships Apache DataSketches HLL natively (`hll_sketch_agg`,
`hll_union_agg`, `hll_sketch_estimate` — JVM-side, codegen-friendly
aggregates), so the whole operator stays in whole-stage codegen with no
UDF. Count-min-sketch exists too (`F.count_min_sketch`) but Spark
exposes no SQL-side probe of the binary, so frequency questions here go
through exact top-k (operators/relational.py) instead — noted, not
stubbed.

Scale notes:

  * The fine-grain sketch build is ONE shuffle keyed on the grain
    (map-side partial sketches merge before the exchange — sketches are
    commutative monoids, so Spark's partial-aggregation machinery
    applies exactly as it does to SUM).
  * Every rollup level reads the persisted sketch table (rows = number
    of grain cells, not number of facts). At petabyte scale the sketch
    table is what you'd write to the lake nightly; here scoped_persist
    keeps it materialized across the three rollup branches.
  * Estimates are deterministic functions of the observed value SET
    (order- and partitioning-independent), so results are stable across
    cluster layouts — asserted by tests/test_sketches.py, which also
    checks union-of-parts equals sketch-of-whole (mergeability) and
    accuracy vs exact distinct counts.

No DuckDB oracle: DuckDB's approx_count_distinct is a different
algorithm with different estimates, and the exact answer is
intentionally not what this operator computes. The registry entry is
rows-only; the accuracy contract lives in the test suite.

Reference parity: the reference counts distinct users per day with
pandas ``nunique`` (sree-etl-tdk-glue-job.py:55-63); this is that same
question asked the way a 1000-executor cluster can afford to answer it
repeatedly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query, scoped_persist

#: DataSketches lgConfigK: 2^12 registers ≈ 1.6% relative standard error,
#: 4 KB per sketch — the standard accuracy/size trade for rollup tables.
HLL_LGK = 12

ALL = "ALL"  # rollup marker for merged-out dimensions


def build_hll_sketches(
    df: DataFrame, dims: list[str], key: str, lgk: int = HLL_LGK
) -> DataFrame:
    """Fine-grain sketch table: one row per grain cell, one binary HLL
    sketch of ``key`` per row. This is the only pass over the facts."""
    return df.groupBy(*dims).agg(
        F.hll_sketch_agg(F.col(key), F.lit(lgk)).alias("hll")
    )


def merge_hll_sketches(sketches: DataFrame, dims: list[str]) -> DataFrame:
    """Roll the sketch table up to ``dims`` by unioning sketches —
    touches sketch rows only, never the facts."""
    agg = F.hll_union_agg(F.col("hll"), F.lit(False)).alias("hll")
    if dims:
        return sketches.groupBy(*dims).agg(agg)
    return sketches.agg(agg)


@query("hll_user_rollup")
def hll_user_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-level distinct-user rollup from ONE (event_type, day) sketch
    table: detail cells, per-type totals, grand total — the per-type and
    grand rows are sketch unions, not rescans. Columns use the ALL
    marker for merged-out dimensions (grouping-sets shape)."""
    events = load_table(spark, sf_dir, "events")
    facts = events.filter(F.col("user_id").isNotNull()).select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        "user_id",
    )
    sk = scoped_persist(build_hll_sketches(facts, ["event_type", "day"], "user_id"))
    est = F.hll_sketch_estimate(F.col("hll")).alias("est_users")
    detail = sk.select("event_type", "day", est)
    by_type = merge_hll_sketches(sk, ["event_type"]).select(
        "event_type", F.lit(ALL).alias("day"), est
    )
    total = merge_hll_sketches(sk, []).select(
        F.lit(ALL).alias("event_type"), F.lit(ALL).alias("day"), est
    )
    return detail.unionByName(by_type).unionByName(total)
