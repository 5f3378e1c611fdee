"""Streaming → JDBC exactly-once: the foreachBatch delete-then-insert
upsert into embedded Derby, including a simulated batch replay (the
at-least-once case the idempotence exists for)."""

from __future__ import annotations

from tdk_apache_log_etl_spark.streaming.jdbc_stream import (
    upsert_user_counts_batch,
    write_jdbc_summary_stream,
)
from tdk_apache_log_etl_spark.streaming.log_stream import read_log_stream

from .test_streaming import LINES

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _read(spark, url, table):
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", DERBY_DRIVER)
        .load()
    )


def test_streaming_jdbc_upsert_exactly_once(spark, tmp_path):
    d = tmp_path / "derby"
    spark._jvm.System.setProperty(
        "derby.stream.error.file", str(d / "derby.log")
    )
    url = f"jdbc:derby:{d}/streamdb;create=true"
    props = {"driver": DERBY_DRIVER}

    src = tmp_path / "in"
    src.mkdir()
    (src / "2026-08-13.log").write_text("\n".join(LINES) + "\n")
    ckpt = str(tmp_path / "ckpt-jdbc")

    parsed = read_log_stream(spark, str(src))
    q = write_jdbc_summary_stream(
        parsed, url, "stream_user_requests", ckpt, properties=props
    ).start()
    q.awaitTermination(120)

    got = {
        (r.user_id, r.requests_count)
        for r in _read(spark, url, "stream_user_requests").collect()
    }
    # user 1: ten /a requests; user 2: one /b request
    assert got == {(1, 10), (2, 1)}

    # Simulated replay: re-run batch 0's writer with the same batch id —
    # the delete-then-insert must leave totals unchanged (no double count)
    batch_df = spark.createDataFrame(
        [(1,)] * 10 + [(2,)], ["user_id"]
    )
    upsert_user_counts_batch(
        batch_df, 0, url, "stream_user_requests", properties=props
    )
    again = {
        (r.user_id, r.requests_count)
        for r in _read(spark, url, "stream_user_requests").collect()
    }
    assert again == got
