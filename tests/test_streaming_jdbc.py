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


def test_streaming_jdbc_crash_between_delete_and_insert(spark, tmp_path):
    # The real at-least-once scenario, not a simulation: the first run's
    # batch writer performs the DELETE, lands a PARTIAL insert (as if the
    # parallel JDBC writer died mid-batch), and crashes the query. A
    # restart from the same checkpoint must replay batch 0 through the
    # delete-then-insert path and converge to exactly-once totals.
    from pyspark.sql import functions as F
    from pyspark.errors import StreamingQueryException

    from tdk_apache_log_etl_spark.sinks.jdbc import write_jdbc
    from tdk_apache_log_etl_spark.streaming.jdbc_stream import (
        _delete_batch_rows,
        upsert_user_counts_batch,
    )

    d = tmp_path / "derby-crash"
    spark._jvm.System.setProperty(
        "derby.stream.error.file", str(d / "derby.log")
    )
    url = f"jdbc:derby:{d}/crashdb;create=true"
    props = {"driver": DERBY_DRIVER}
    table = "crash_user_requests"

    src = tmp_path / "in-crash"
    src.mkdir()
    (src / "2026-08-13.log").write_text("\n".join(LINES) + "\n")
    ckpt = str(tmp_path / "ckpt-crash")

    def crashing_write(batch_df, batch_id):
        _delete_batch_rows(spark, url, table, batch_id, props)
        partial = (
            batch_df.filter(F.col("user_id").isNotNull())
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("requests_count"))
            .withColumn("batch_id", F.lit(int(batch_id)))
            .limit(1)  # only part of the batch reaches the table...
        )
        write_jdbc(partial, url, table, mode="append", properties=props)
        raise RuntimeError("simulated crash between DELETE and INSERT")

    parsed = read_log_stream(spark, str(src))
    q = (
        parsed.writeStream.foreachBatch(crashing_write)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    except StreamingQueryException:
        pass
    assert q.exception() is not None  # the crash really aborted batch 0
    # the partial insert is visible — this is the corrupt state a naive
    # append-only sink would keep forever
    assert len(_read(spark, url, table).collect()) == 1

    def good_write(batch_df, batch_id):
        upsert_user_counts_batch(batch_df, batch_id, url, table, props)

    q2 = (
        parsed.writeStream.foreachBatch(good_write)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    got = {
        (r.user_id, r.requests_count)
        for r in _read(spark, url, table).collect()
    }
    assert got == {(1, 10), (2, 1)}  # exactly-once despite the replay
