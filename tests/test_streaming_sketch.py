"""Streaming HLL sketch-rollup: incremental distinct-count maintenance
whose replay-safety comes from union idempotence, not batch bookkeeping.
Plus: the same bounded-state dedup stream on the RocksDB state store —
the provider a 100 TB deployment runs (state spills to disk instead of
living on the executor heap)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tdk_apache_log_etl_spark.streaming.log_stream import read_log_stream
from tdk_apache_log_etl_spark.streaming.sketch_rollup import (
    _merge_batch_sketches,
    read_sketch_estimates,
    write_sketch_rollup_stream,
)

from .test_streaming import LINES

EXTRA_LINES = [
    '10.0.0.9 - 7 [14/Aug/2026:09:00:00 +0000] "GET /z HTTP/1.1" 200 5 "-" "ua"',
    '10.0.0.9 - 8 [14/Aug/2026:09:00:01 +0000] "GET /z HTTP/1.1" 200 5 "-" "ua"',
]


def test_sketch_rollup_stream_matches_exact(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    (src / "a-2026-08-13.log").write_text("\n".join(LINES) + "\n")
    (src / "b-2026-08-14.log").write_text("\n".join(EXTRA_LINES) + "\n")
    table = str(tmp_path / "sketches")
    ckpt = str(tmp_path / "ckpt")

    # maxFilesPerTrigger=1 → two real micro-batches exercise the union path
    parsed = read_log_stream(spark, str(src), max_files_per_trigger=1)
    q = write_sketch_rollup_stream(parsed, table, ckpt).start()
    q.awaitTermination(120)

    # grain estimates == exact distinct counts (sparse-mode HLL is exact
    # at fixture cardinalities), across BOTH batches
    est = {
        (r.status_code, r.date): r.est_distinct
        for r in read_sketch_estimates(
            spark, table, ["status_code", "date"]
        ).collect()
    }
    from tdk_apache_log_etl_spark.sources.apache_log import parse_clf_lines

    all_lines = spark.createDataFrame(
        [(x,) for x in LINES + EXTRA_LINES], "value string"
    )
    exact = {
        (r.status_code, r.date): r.n
        for r in parse_clf_lines(all_lines)
        .filter(F.col("user_id").isNotNull())
        .groupBy("status_code", "date")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert est == exact

    # rollup to coarser grain (status_code only) still matches exact
    coarse = {
        r.status_code: r.est_distinct
        for r in read_sketch_estimates(spark, table, ["status_code"]).collect()
    }
    exact_coarse = {
        r.status_code: r.n
        for r in parse_clf_lines(all_lines)
        .filter(F.col("user_id").isNotNull())
        .groupBy("status_code")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert coarse == exact_coarse


def test_sketch_merge_is_replay_idempotent(spark, tmp_path):
    # merging the SAME batch twice must leave the table bit-identical —
    # the algebraic idempotence that makes at-least-once delivery safe
    # with zero batch-id bookkeeping (contrast jdbc_stream.py).
    from tdk_apache_log_etl_spark.sources.apache_log import parse_clf_lines

    batch = parse_clf_lines(
        spark.createDataFrame([(x,) for x in LINES], "value string")
    ).filter(F.col("user_id").isNotNull())
    table = str(tmp_path / "sk")

    _merge_batch_sketches(batch, table, ["status_code", "date"], "user_id")
    first = {
        (r.status_code, r.date): bytes(r.hll)
        for r in spark.read.parquet(table).collect()
    }
    _merge_batch_sketches(batch, table, ["status_code", "date"], "user_id")
    second = {
        (r.status_code, r.date): bytes(r.hll)
        for r in spark.read.parquet(table).collect()
    }
    assert first == second


def test_cli_sketch_rollup(spark, tmp_path, capsys):
    from tdk_apache_log_etl_spark.__main__ import main

    src = tmp_path / "cli_in"
    src.mkdir()
    (src / "2026-08-13.log").write_text("\n".join(LINES) + "\n")
    rc = main(
        [
            "sketch-rollup",
            str(src),
            str(tmp_path / "cli_sketches"),
            str(tmp_path / "cli_ckpt"),
        ]
    )
    assert rc == 0
    # LINES: status 200 (users 1..1) and 404 (user 2) on one date → 2 cells
    assert "sketch_cells=2" in capsys.readouterr().out


def test_dedup_stream_on_rocksdb_state_store(spark, tmp_path):
    # Same bounded-state dedup, but with state in RocksDB (disk-backed,
    # the at-scale provider) instead of the default in-memory HDFS-backed
    # store. The provider is a per-query conf resolved at stream start.
    from tdk_apache_log_etl_spark.streaming.log_stream import dedup_stream

    src = tmp_path / "in"
    src.mkdir()
    # ten identical /a requests from user 1 + one /b from user 2 → 2 rows
    (src / "2026-08-13.log").write_text("\n".join(LINES) + "\n")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        parsed = read_log_stream(spark, str(src))
        q = (
            dedup_stream(parsed)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 2  # ten duplicate /a lines collapsed to one
