"""Streaming drift monitor: live feature-bin counts maintained per
micro-batch, PSI against a FROZEN baseline computed on read.

This is the deployed shape of E233 (`concentration.event_feature_psi`):
at training/launch time the input distribution is frozen as a baseline
count table; in production each micro-batch adds its (feature, bin)
counts to the live table, and the read side scores the live distribution
against the baseline with the same quarter-bit-lattice PSI — so the
monitor never rescans history AND never evaluates a libm log.

Counts are ADDITIVE, not idempotent, so replay safety uses the batch-id
exactly-once protocol shared with mv_stream.py / view_maintenance.py:
per-batch swap directories committed by their _SUCCESS marker;
already-committed ids are skipped on redelivery.  Each committed dir
holds the FULL merged count table, so retention prunes everything older
than the commit's predecessor — without it state grows
O(batches x state size) on a long-running stream.

Scale: each batch collapses map-side to its ≤(|types| + ~10 magnitude
buckets) cell frame before touching the state; the PSI read joins two
cell frames of that same bounded size.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import DataStreamWriter

from ..operators.concentration import _PSI_FEATURES_SPARK, psi_from_cells
from .state_swap import prune_batch_dirs

_COUNT_SCHEMA = T.StructType(
    [
        T.StructField("feature", T.StringType()),
        T.StructField("bin", T.StringType()),
        T.StructField("cnt", T.LongType()),
    ]
)


def _feature_bin_counts(df: DataFrame) -> DataFrame:
    """(feature, bin, cnt) for one slice of events — the same feature
    stack E233 uses (event-type mix + value-magnitude buckets)."""
    return (
        df.select(F.expr(_PSI_FEATURES_SPARK))
        .filter(F.col("bin").isNotNull())
        .groupBy("feature", "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def freeze_baseline(events: DataFrame, path: str) -> None:
    """Snapshot the reference distribution (training-time input) the
    live stream will be scored against."""
    _feature_bin_counts(events).write.mode("overwrite").parquet(path)


def _committed_batches(state_dir: str) -> list[int]:
    if not os.path.isdir(state_dir):
        return []
    out = []
    for name in os.listdir(state_dir):
        if name.startswith("batch=") and os.path.exists(
            os.path.join(state_dir, name, "counts", "_SUCCESS")
        ):
            out.append(int(name.split("=", 1)[1]))
    return sorted(out)


def _state_path(state_dir: str, batch_id: int) -> str:
    return os.path.join(state_dir, f"batch={batch_id}", "counts")


def apply_drift_batch(
    batch_df: DataFrame, state_dir: str, batch_id: int
) -> None:
    committed = _committed_batches(state_dir)
    if batch_id in committed:
        return
    spark = batch_df.sparkSession
    delta = _feature_bin_counts(batch_df)
    if committed:
        prev = spark.read.schema(_COUNT_SCHEMA).parquet(
            _state_path(state_dir, committed[-1])
        )
        delta = (
            prev.unionByName(delta)
            .groupBy("feature", "bin")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
        )
    delta.write.mode("overwrite").parquet(_state_path(state_dir, batch_id))
    # retention: each committed dir holds the FULL merged table, so only
    # this commit and its predecessor (read-side race) stay live
    prune_batch_dirs(
        state_dir,
        {batch_id} | ({committed[-1]} if committed else set()),
    )


def maintain_drift_stream(
    events: DataFrame, state_dir: str, checkpoint_path: str
) -> DataStreamWriter:
    """Continuously maintain the live count table. Caller ``.start()``s."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        apply_drift_batch(batch_df, state_dir, batch_id)

    return (
        events.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
    )


def read_live_counts(spark: SparkSession, state_dir: str) -> DataFrame:
    # Snapshot-lifetime note: the keep-2 retention in apply_drift_batch
    # guarantees the dir resolved here survives exactly ONE further
    # commit.  Materialize (or re-read) promptly; a reader that sits on
    # this lazy frame across two commits loses its snapshot (see
    # state_swap.prune_batch_dirs).
    committed = _committed_batches(state_dir)
    if not committed:
        return spark.createDataFrame([], _COUNT_SCHEMA)
    return spark.read.schema(_COUNT_SCHEMA).parquet(
        _state_path(state_dir, committed[-1])
    )


def read_psi_vs_baseline(
    spark: SparkSession, state_dir: str, baseline_path: str
) -> DataFrame:
    """Per-feature PSI of the LIVE distribution against the frozen
    baseline — full-outer on (feature, bin) so bins seen on only one
    side still count (Laplace +1 keeps them defined), then the shared
    E233 lattice scorer."""
    base = (
        spark.read.schema(_COUNT_SCHEMA)
        .parquet(baseline_path)
        .withColumnRenamed("cnt", "base_cnt")
    )
    live = read_live_counts(spark, state_dir).withColumnRenamed(
        "cnt", "live_cnt"
    )
    cells = (
        base.join(live, ["feature", "bin"], "full_outer")
        .select(
            "feature",
            "bin",
            (F.coalesce("base_cnt", F.lit(0)) + 1)
            .cast("long")
            .alias("la"),
            (F.coalesce("live_cnt", F.lit(0)) + 1)
            .cast("long")
            .alias("lb"),
        )
    )
    return psi_from_cells(cells)
