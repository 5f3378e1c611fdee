"""Streaming SLO burn-rate maintenance: the E94 multi-window
error-budget alarm (operators/logmetrics.slo_burn_rate) kept current by
a ``foreachBatch`` loop — the on-call alert table for exactly the
reference's log shape, updated as micro-batches land instead of
recomputed nightly.

Design split: the ALERT computation (RANGE-framed 6h window over hourly
counts) is not incrementally maintainable row-by-row, but it doesn't
need to be — it reads the tiny hourly-count table, and THAT table is
additive. So each micro-batch aggregates its own rows to
(hour, n_events, n_errors) partials (logmetrics.hourly_error_counts —
the same function the batch query uses), merges them into the persisted
hourly state by summation, and ``read_current_alerts`` applies the
shared ``burn_from_hourly`` over the state. Batch and stream cannot
drift: they are the same code.

Exactly-once: additive merges are NOT replay-idempotent (a replayed
batch would double-count), so state lives under the E77 protocol —
per-batch directories, a write counts only with its _SUCCESS marker,
batch ids skip when already committed (streaming/view_maintenance.py
documents the protocol; contrast sketch_rollup.py where HLL union is
idempotent by algebra and needs none of this).

Scale: per-batch cost is one aggregate over the batch plus a merge of
two |hours|-sized frames — hours grow with calendar time, not volume.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.logmetrics import burn_from_hourly, hourly_error_counts

_HOURLY_SCHEMA = T.StructType(
    [
        T.StructField("hour", T.TimestampNTZType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_errors", T.LongType()),
    ]
)


def _committed_batches(state_dir: str) -> list[int]:
    if not os.path.isdir(state_dir):
        return []
    out = []
    for name in os.listdir(state_dir):
        if name.startswith("batch=") and os.path.exists(
            os.path.join(state_dir, name, "hourly", "_SUCCESS")
        ):
            out.append(int(name.split("=", 1)[1]))
    return sorted(out)


def _load_state(spark: SparkSession, state_dir: str) -> DataFrame:
    committed = _committed_batches(state_dir)
    if not committed:
        return spark.createDataFrame([], _HOURLY_SCHEMA)
    return spark.read.schema(_HOURLY_SCHEMA).parquet(
        os.path.join(state_dir, f"batch={committed[-1]}", "hourly")
    )


def apply_slo_batch(
    spark: SparkSession, state_dir: str, batch_df: DataFrame, batch_id: int
) -> None:
    """Fold one micro-batch's hourly partials into the state — the
    foreachBatch body, exposed for direct replay testing."""
    if batch_id in set(_committed_batches(state_dir)):
        return  # additive merge → replay must be a no-op by protocol
    partial = hourly_error_counts(batch_df)
    merged = (
        _load_state(spark, state_dir)
        .unionByName(partial)
        .groupBy("hour")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("n_errors").alias("n_errors"),
        )
    )
    merged.write.mode("overwrite").parquet(
        os.path.join(state_dir, f"batch={batch_id}", "hourly")
    )


def maintain_slo_stream(
    spark: SparkSession,
    events_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
):
    """Wire the hourly merge into a writeStream; ``.start()`` to run.
    Required stream columns: ts, event_type."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        apply_slo_batch(spark, state_dir, batch_df, batch_id)

    return (
        events_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def read_current_alerts(spark: SparkSession, state_dir: str) -> DataFrame:
    """Burn rates + alert flags over the maintained hourly table — the
    IDENTICAL computation as the batch slo_burn_rate query."""
    return burn_from_hourly(_load_state(spark, state_dir))
