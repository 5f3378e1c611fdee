"""Streaming exact sliding-distinct maintenance: stream==batch window
counts, replay no-op (set-union idempotence), and late-arrival repair
without watermarks."""

from __future__ import annotations

from pyspark.sql import functions as F

from tdk_apache_log_etl_spark.operators.logmetrics import (
    sliding_active_counts,
)
from tdk_apache_log_etl_spark.streaming.active_users_stream import (
    merge_batch_user_days,
    read_sliding_active_users,
    write_active_users_stream,
)
from tdk_apache_log_etl_spark.streaming.log_stream import read_log_stream

from .test_streaming import LINES

LATE_LINES = [
    # an EARLIER day arriving in a LATER micro-batch (out of order)
    '10.0.0.9 - 7 [10/Aug/2026:09:00:00 +0000] "GET /z HTTP/1.1" 200 5 "-" "ua"',
    '10.0.0.9 - 9 [14/Aug/2026:09:00:01 +0000] "GET /z HTTP/1.1" 200 5 "-" "ua"',
]


def _counts(df):
    return {r.win_end.isoformat(): r.n_active_users for r in df.collect()}


def test_active_users_stream_matches_batch_and_replays(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    (src / "a-2026-08-13.log").write_text("\n".join(LINES) + "\n")
    (src / "b-late.log").write_text("\n".join(LATE_LINES) + "\n")
    table = str(tmp_path / "user_days")
    ckpt = str(tmp_path / "ckpt")

    parsed = read_log_stream(spark, str(src), max_files_per_trigger=1)
    q = write_active_users_stream(
        parsed, table, ckpt, ts_col="time"
    ).start()
    q.awaitTermination(120)

    # stream-maintained table == batch pipeline over ALL lines,
    # including the out-of-order early day (no watermark dropped it)
    from tdk_apache_log_etl_spark.sources.apache_log import parse_clf_lines

    all_df = parse_clf_lines(
        spark.createDataFrame(
            [(x,) for x in LINES + LATE_LINES], "value string"
        )
    )
    ud = (
        all_df.where(F.col("user_id").isNotNull())
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("time").cast("date").alias("d"),
        )
        .distinct()
    )
    expected = _counts(sliding_active_counts(ud))
    got = _counts(read_sliding_active_users(spark, table))
    assert got == expected
    # the late Aug 10 day produced windows before Aug 13
    assert "2026-08-10" in got

    # at-least-once replay: merging the whole input AGAIN is a no-op
    merge_batch_user_days(all_df, table, ts_col="time")
    assert _counts(read_sliding_active_users(spark, table)) == expected
