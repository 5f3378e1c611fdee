"""Streaming EWMA anomaly maintenance: the E153 hourly spike detector
(operators/logmetrics.hourly_count_anomaly_ewma) kept current by a
``foreachBatch`` loop — the live "is this hour weird" table for the
reference's log shape, updated as micro-batches land.

Design split (same as slo_stream.py): the EWMA walk is a sequential
recurrence and not incrementally maintainable row-by-row, but it reads
only the tiny (type, hour, n_events) table — and THAT table is additive.
Each micro-batch aggregates its own rows to per-(type, hour) partials
(logmetrics.hourly_type_counts — the same function the batch query
uses), merges them into persisted state by summation, and
``read_current_anomalies`` applies the shared
``ewma_anomalies_from_hourly`` walk. Batch and stream cannot drift: they
are the same code.

Exactly-once: additive merges are NOT replay-idempotent, so state lives
under the E77 batch-id protocol — per-batch directories, a write counts
only with its _SUCCESS marker, committed batch ids replay as no-ops
(streaming/view_maintenance.py documents the protocol).

Scale: per-batch cost is one aggregate over the batch plus a merge of
two |types|x|hours| frames — state grows with calendar time, not event
volume.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.logmetrics import (
    ewma_anomalies_from_hourly,
    hourly_type_counts,
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("hour", T.TimestampNTZType()),
        T.StructField("n_events", T.LongType()),
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
        return spark.createDataFrame([], _STATE_SCHEMA)
    return spark.read.schema(_STATE_SCHEMA).parquet(
        os.path.join(state_dir, f"batch={committed[-1]}", "hourly")
    )


def apply_anomaly_batch(
    spark: SparkSession, state_dir: str, batch_df: DataFrame, batch_id: int
) -> None:
    """Fold one micro-batch's (type, hour) partials into the state —
    the foreachBatch body, exposed for direct replay testing."""
    if batch_id in set(_committed_batches(state_dir)):
        return  # additive merge → replay must be a no-op by protocol
    partial = hourly_type_counts(batch_df)
    merged = (
        _load_state(spark, state_dir)
        .unionByName(partial)
        .groupBy("event_type", "hour")
        .agg(F.sum("n_events").alias("n_events"))
    )
    merged.write.mode("overwrite").parquet(
        os.path.join(state_dir, f"batch={batch_id}", "hourly")
    )


def maintain_anomaly_stream(
    spark: SparkSession,
    events_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
):
    """Wire the hourly merge into a writeStream; ``.start()`` to run.
    Required stream columns: ts, event_type."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        apply_anomaly_batch(spark, state_dir, batch_df, batch_id)

    return (
        events_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def read_current_anomalies(spark: SparkSession, state_dir: str) -> DataFrame:
    """EWMA baselines + spike flags over the maintained hourly table —
    the IDENTICAL walk as the batch hourly_count_anomaly_ewma query."""
    return ewma_anomalies_from_hourly(_load_state(spark, state_dir))
