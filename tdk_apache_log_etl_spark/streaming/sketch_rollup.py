"""Streaming sketch-rollup: an incrementally-maintained HLL distinct-count
table — the streaming face of ``operators/sketches.py``.

The 100 TB pattern: the nightly "how many distinct users per (type, day)"
question should never rescan the day's facts. Each micro-batch builds
per-grain HLL sketches of JUST ITS OWN rows (one map-side-combinable
aggregate over the batch) and MERGES them into a persisted sketch table
via ``foreachBatch``; any coarser rollup then reads kilobytes of
sketches, not terabytes of facts (see sketches.merge_hll_sketches).

Why this is replay-safe without batch-id bookkeeping: HLL union is
idempotent (register-wise max — merging the same sketch twice is a
no-op), so an at-least-once replay of a micro-batch leaves the table
EXACTLY as a single delivery would. Contrast jdbc_stream.py, where the
additive counts need delete-then-insert keyed by batch id to survive
replay. Idempotent-by-algebra beats idempotent-by-protocol when the
aggregate allows it; tests/test_streaming_sketch.py replays a batch and
asserts bit-identical sketches.

Merge cost: the rewrite touches one sketch table of |grain| rows
(day×type — thousands, not billions) per micro-batch. At higher grain
cardinality you'd partition the sketch table and rewrite only the
partitions the batch touched (same dynamic-overwrite pattern as
sinks/staging.py); the fixture grain is small enough that a full
rewrite is the honest simple form.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter

from ..operators.sketches import HLL_LGK

from .state_swap import recover_state, swap_write


def _merge_batch_sketches(
    batch_df: DataFrame,
    table_path: str,
    dims: list[str],
    key: str,
    lgk: int = HLL_LGK,
) -> None:
    """One micro-batch → per-grain sketches → union-merge into the table.

    The read-modify-write is a driver-coordinated swap (write to a tmp
    dir, then atomic-ish rename) so a crash mid-rewrite leaves the old
    table intact; the checkpoint replays the batch and the idempotent
    union converges to the same table either way.
    """
    spark = batch_df.sparkSession
    fresh = batch_df.groupBy(*dims).agg(
        F.hll_sketch_agg(F.col(key), F.lit(lgk)).alias("hll")
    )
    # heal a crash inside a previous swap window before reading state
    recover_state(table_path)
    if os.path.exists(table_path):
        # the swap protocol guarantees table_path is absent or complete,
        # so a plain (non-declared-schema) read can't see a half-write
        existing = spark.read.parquet(table_path)
        merged = (
            existing.unionByName(fresh)
            .groupBy(*dims)
            .agg(F.hll_union_agg(F.col("hll"), F.lit(False)).alias("hll"))
        )
    else:
        merged = fresh
    swap_write(merged, table_path)


def write_sketch_rollup_stream(
    parsed: DataFrame,
    table_path: str,
    checkpoint_path: str,
    dims: list[str] | None = None,
    key: str = "user_id",
) -> DataStreamWriter:
    """Continuously maintain the (event_type, day)-grain distinct-``key``
    sketch table from a parsed CLF stream. Caller ``.start()``s."""
    dims = dims or ["status_code", "date"]

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        _merge_batch_sketches(
            batch_df.filter(F.col(key).isNotNull()), table_path, dims, key
        )

    return (
        parsed.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
    )


def read_sketch_estimates(
    spark: SparkSession, table_path: str, dims: list[str]
) -> DataFrame:
    """Rollup read: estimate distinct keys at any grain ≤ the stored one
    by sketch union — never touching the facts."""
    sk = spark.read.parquet(table_path)
    est = F.hll_sketch_estimate(F.col("hll")).alias("est_distinct")
    if set(dims) == set(sk.columns) - {"hll"}:
        return sk.select(*dims, est)
    return (
        sk.groupBy(*dims)
        .agg(F.hll_union_agg(F.col("hll"), F.lit(False)).alias("hll"))
        .select(*dims, est)
    )
