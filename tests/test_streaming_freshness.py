"""Streaming watermark maintenance: stream==batch high-water marks,
replay keeps watermarks bit-identical (MAX idempotence), late events
never lower a mark."""

from __future__ import annotations

from pyspark.sql import functions as F

from tdk_apache_log_etl_spark.streaming.freshness_stream import (
    merge_batch_watermarks,
    read_staleness,
    write_freshness_stream,
)
from tdk_apache_log_etl_spark.streaming.log_stream import read_log_stream

from .test_streaming import LINES

OLD_LINES = [
    # an OLD record arriving in a later micro-batch must not lower marks
    '10.0.0.9 - 7 [01/Aug/2026:09:00:00 +0000] "GET /z HTTP/1.1" 200 5 "-" "ua"',
    '10.0.0.9 - 9 [14/Aug/2026:09:00:01 +0000] "GET /z HTTP/1.1" 500 5 "-" "ua"',
]


def test_freshness_stream_watermarks_and_replay(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.log").write_text("\n".join(LINES) + "\n")
    (src / "b.log").write_text("\n".join(OLD_LINES) + "\n")
    table = str(tmp_path / "marks")
    ckpt = str(tmp_path / "ckpt")

    parsed = read_log_stream(spark, str(src), max_files_per_trigger=1)
    q = write_freshness_stream(
        parsed, table, ckpt, type_col="status_code", ts_col="time"
    ).start()
    q.awaitTermination(120)

    from tdk_apache_log_etl_spark.sources.apache_log import parse_clf_lines

    all_df = parse_clf_lines(
        spark.createDataFrame(
            [(x,) for x in LINES + OLD_LINES], "value string"
        )
    )
    expected = {
        r.status_code: r.last_ts
        for r in all_df.groupBy("status_code")
        .agg(F.max("time").alias("last_ts"))
        .collect()
    }
    got = {
        r.event_type: r.last_ts
        for r in spark.read.parquet(table).collect()
    }
    assert got == expected

    # replay: re-merging everything leaves the watermarks bit-identical
    before = got
    merge_batch_watermarks(
        all_df, table, type_col="status_code", ts_col="time"
    )
    after = {
        r.event_type: r.last_ts
        for r in spark.read.parquet(table).collect()
    }
    assert after == before

    # staleness read: the freshest type is 0 seconds stale
    stale = {
        r.event_type: r.staleness_secs
        for r in read_staleness(spark, table).collect()
    }
    assert min(stale.values()) == 0
    assert all(v >= 0 for v in stale.values())
