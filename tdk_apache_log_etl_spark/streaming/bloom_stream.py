"""Streaming Bloom-filter maintenance: an incrementally-maintained
blocklist membership filter — the streaming face of
``operators/sketches.bloom_blocklist_probe`` (E178).

The 100 TB pattern: the blocklist (suspended users, revoked keys) grows
continuously; the scan-side pruning filter must follow it WITHOUT
rebuilding from the full history. A Bloom filter's word table is an
OR-monoid: each micro-batch builds the word table of JUST ITS OWN new
keys (k salted xxhash64 positions → 64-bit words) and bit_or-merges it
into the persisted table via ``foreachBatch``.

Why this is replay-safe without batch-id bookkeeping: OR is idempotent
(setting an already-set bit is a no-op), so an at-least-once replay of a
micro-batch leaves the table EXACTLY as a single delivery would — the
same idempotent-by-algebra argument as the HLL rollup
(streaming/sketch_rollup.py), and the same contrast with jdbc_stream.py
where additive counts need the delete-then-insert protocol. Bloom
deletions don't exist (that would need a counting filter); a shrinking
blocklist is a periodic rebuild, which is the batch operator.

The swap-write protocol (tmp → rename) is shared with sketch_rollup:
a crash mid-rewrite leaves the old table intact and the checkpoint
replay converges.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter

from ..operators.sketches import (
    bloom_dense_row,
    bloom_hit_sql,
    bloom_word_table,
)
from .state_swap import recover_state, swap_write


def merge_batch_bloom(
    batch_df: DataFrame, table_path: str, key_expr: str
) -> None:
    """One micro-batch of keys → word table → bit_or-merge into the
    persisted filter. ``key_expr`` is a SQL expression producing the
    key; xxhash64 is TYPE-sensitive, so build and probe must use the
    same expression (both default to a BIGINT cast here and in
    ``probe_bloom_table``)."""
    spark = batch_df.sparkSession
    fresh = bloom_word_table(
        batch_df.select(F.expr(key_expr).alias("k")).where(
            F.col("k").isNotNull()
        ),
        "k",
    )
    # heal a crash inside a previous swap window before reading state
    recover_state(table_path)
    if os.path.exists(table_path):
        existing = spark.read.parquet(table_path)
        merged = (
            existing.unionByName(fresh)
            .groupBy("widx")
            .agg(F.expr("bit_or(word)").alias("word"))
        )
    else:
        merged = fresh
    swap_write(merged, table_path)


def write_bloom_stream(
    keys: DataFrame,
    table_path: str,
    checkpoint_path: str,
    key_expr: str = "CAST(user_id AS BIGINT)",
) -> DataStreamWriter:
    """Continuously maintain the blocklist Bloom word table from a
    stream of blocked keys. Caller ``.start()``s."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        merge_batch_bloom(batch_df, table_path, key_expr)

    return (
        keys.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
    )


def probe_bloom_table(
    probe: DataFrame,
    spark: SparkSession,
    table_path: str,
    key_expr: str = "CAST(user_id AS BIGINT)",
) -> DataFrame:
    """Probe any frame against the maintained filter: the word table is
    collapsed to ONE broadcast map row and each probe row gets a
    ``bloom_hit`` column from k codegen bit tests — the fact side never
    shuffles. No false negatives for every key ever merged (asserted
    end-to-end in tests/test_streaming_bloom.py)."""
    words = spark.read.parquet(table_path)
    bloom = bloom_dense_row(words)
    return probe.withColumn("__k", F.expr(key_expr)).crossJoin(
        F.broadcast(bloom)
    ).withColumn("bloom_hit", F.expr(bloom_hit_sql("__k"))).drop(
        "__k", "bf"
    )
