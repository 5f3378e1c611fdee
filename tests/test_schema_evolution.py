"""Staging-schema evolution: additive columns must be readable across
partition generations (old partitions yield NULL), and file-level
corruption handling must be an explicit, opt-in decision."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from py4j.protocol import Py4JJavaError

from tdk_apache_log_etl_spark.sinks.staging import (
    STAGING_SCHEMA,
    read_staging,
    write_staging,
)


def _day_frame(spark, date, with_trace=False):
    df = spark.range(10).select(
        F.concat(F.lit("10.0.0."), F.col("id").cast("string")).alias(
            "ip_address"
        ),
        F.lit(None).cast("double").alias("rfc_1413_identity"),
        F.col("id").alias("user_id"),
        F.lit("2026-08-14T00:00:00").cast("timestamp_ntz").alias("time"),
        F.lit(200).cast("long").alias("status_code"),
        (F.col("id") * 10).alias("size"),
        F.lit(None).cast("string").alias("referer"),
        F.lit("ua").alias("user_agent"),
        F.lit("GET").alias("request_method"),
        F.lit("/r").alias("request_resource"),
        F.lit("HTTP/1.1").alias("request_protocol"),
        F.lit(date).alias("date"),
    )
    if with_trace:
        df = df.withColumn(
            "trace_id", F.concat(F.lit("t-"), F.col("user_id").cast("string"))
        )
    return df


def test_additive_column_reads_null_over_old_partitions(spark, tmp_path):
    # Day 1 written by the v1 pipeline (no trace_id), day 2 by v2 (with
    # it). Parquet resolves columns BY NAME against the declared schema,
    # so the evolved read needs no rewrite of old partitions: v1 rows
    # surface trace_id as NULL, v2 rows carry their values, and partition
    # pruning still works on both generations.
    path = str(tmp_path / "staging")
    write_staging(_day_frame(spark, "2026-08-13"), path)
    write_staging(_day_frame(spark, "2026-08-14", with_trace=True), path)

    evolved = STAGING_SCHEMA + ", trace_id string"
    df = spark.read.schema(evolved).parquet(path)
    assert df.count() == 20
    old = df.where(F.col("date") == "2026-08-13")
    new = df.where(F.col("date") == "2026-08-14")
    assert old.where(F.col("trace_id").isNull()).count() == 10
    assert new.where(F.col("trace_id").isNotNull()).count() == 10
    # the v1 declared read still works untouched over the mixed table
    assert read_staging(spark, path).count() == 20
    plan = (
        df.where(F.col("date") == "2026-08-14")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "2026-08-14" in plan


def test_corrupt_file_strict_by_default_opt_in_skip(spark, tmp_path):
    # A truncated/garbage parquet file inside a partition must FAIL the
    # read by default (silent data loss is worse than a failed job); the
    # recovery path is the explicit ignoreCorruptFiles session flag.
    path = str(tmp_path / "staging")
    write_staging(_day_frame(spark, "2026-08-13"), path)
    bad = tmp_path / "staging" / "date=2026-08-13" / "part-corrupt.parquet"
    bad.write_bytes(b"PAR1 this is not a parquet file")

    with pytest.raises(Py4JJavaError):
        read_staging(spark, path).count()

    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try:
        assert read_staging(spark, path).count() == 10
    finally:
        spark.conf.unset("spark.sql.files.ignoreCorruptFiles")
