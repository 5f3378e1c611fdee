"""Streaming Bloom blocklist maintenance: stream==batch word-table
bit-identity, replay idempotence (OR algebra, zero bookkeeping), and the
no-false-negative probe contract end-to-end."""

from __future__ import annotations

from pyspark.sql import functions as F

from tdk_apache_log_etl_spark.operators.sketches import bloom_word_table
from tdk_apache_log_etl_spark.streaming.bloom_stream import (
    merge_batch_bloom,
    probe_bloom_table,
    write_bloom_stream,
)
from tdk_apache_log_etl_spark.streaming.log_stream import read_log_stream

from .test_streaming import LINES

EXTRA_LINES = [
    '10.0.0.9 - 70 [14/Aug/2026:09:00:00 +0000] "GET /z HTTP/1.1" 200 5 "-" "ua"',
    '10.0.0.9 - 84 [14/Aug/2026:09:00:01 +0000] "GET /z HTTP/1.1" 200 5 "-" "ua"',
]


def _words(spark, path):
    return {
        (r.widx, r.word)
        for r in spark.read.parquet(path).collect()
    }


def test_bloom_stream_matches_batch_and_replays(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    (src / "a-2026-08-13.log").write_text("\n".join(LINES) + "\n")
    (src / "b-2026-08-14.log").write_text("\n".join(EXTRA_LINES) + "\n")
    table = str(tmp_path / "bloom")
    ckpt = str(tmp_path / "ckpt")

    # two real micro-batches exercise the merge path
    parsed = read_log_stream(spark, str(src), max_files_per_trigger=1)
    q = write_bloom_stream(parsed, table, ckpt).start()
    q.awaitTermination(120)

    # stream result == one-shot batch build over ALL lines (OR-merge is
    # associative: batch order cannot matter)
    from tdk_apache_log_etl_spark.sources.apache_log import parse_clf_lines

    all_df = parse_clf_lines(
        spark.createDataFrame(
            [(x,) for x in LINES + EXTRA_LINES], "value string"
        )
    )
    expected = {
        (r.widx, r.word)
        for r in bloom_word_table(
            all_df.select(
                F.expr("CAST(user_id AS BIGINT)").alias("k")
            ).where(F.col("k").isNotNull()),
            "k",
        ).collect()
    }
    got = _words(spark, table)
    assert got == expected

    # at-least-once replay: merging a batch AGAIN is a bit-level no-op
    merge_batch_bloom(all_df, table, "CAST(user_id AS BIGINT)")
    assert _words(spark, table) == expected

    # no false negatives: every ingested key hits
    probed = probe_bloom_table(all_df, spark, table).where(
        F.col("user_id").isNotNull()
    )
    assert probed.where(~F.col("bloom_hit")).count() == 0
