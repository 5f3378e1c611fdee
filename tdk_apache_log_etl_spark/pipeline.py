"""End-to-end pipeline entry points mirroring the reference's two jobs.

A user of the reference runs two scheduled scripts; these are their
drop-in equivalents, Spark-native:

  * ``ingest``  ≙ the Lambda (sree-etl-tdk-lambda.py:145-218): discover
    ``*.log`` files → parse CLF → write date-partitioned Snappy-Parquet
    staging (K1/K2 collapsed into ONE write) → archive processed files.
  * ``daily_analytics`` ≙ the Glue job (sree-etl-tdk-glue-job.py:13-100):
    partition-pruned read of one day → the three metrics in one scan →
    per-user counts + a one-row summary, handed to any sink (JDBC via
    sinks.jdbc, or parquet for offline use).

Differences from the reference, all deliberate (SURVEY.md §7):
  * one distributed parse instead of single-process pandas;
  * malformed lines quarantined in ``_corrupt``, not file-fatal;
  * one staging write, not two;
  * three metrics share one scan instead of three;
  * ``run_date`` is a parameter, not wall-clock ``datetime.now()``;
  * NULL user_id (the CLF ``-`` placeholder) is excluded from BOTH
    outputs: ``requests_per_user`` filters the NULL group the reference's
    ``groupBy('user_id')`` would emit, and ``user_count`` uses
    ``countDistinct`` (NULL-excluding) where the reference's
    ``.distinct().count()`` counts NULL as one extra "user". Anonymous
    traffic is not a user; the un-dropped totals remain available via
    ``total_requests`` in the staging queries.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sinks.staging import read_staging, write_quarantine, write_staging
from .sources.apache_log import read_apache_log


def ingest(
    spark: SparkSession,
    log_dir: str,
    staging_path: str,
    archive_dir: str | None = None,
    run_date: str | None = None,
) -> DataFrame:
    """Batch ingest: ``*.log`` under ``log_dir`` → partitioned staging.

    Returns the corrupt-line audit frame (empty when every line parsed),
    read back from a quarantine parquet written during ingest — it stays
    valid after the source files are archived away (a frame lazily bound
    to the moved files would fail on first use). Archiving moves processed
    files driver-side — the batch equivalent of the streaming source's
    ``cleanSource=archive`` (K5); at S3 scale this is a manifest-driven
    batch copy, never per-row work.
    """
    parsed = read_apache_log(spark, log_dir, run_date=run_date)
    write_staging(parsed.drop("_corrupt"), staging_path)
    quarantine = write_quarantine(parsed, staging_path, run_date)
    # Explicit schema: on a fully-clean day the quarantine write leaves
    # an EMPTY partitioned directory (no files to infer from), and a
    # schema-inferring read would fail the whole ingest — the worst
    # possible reward for a corruption-free input.
    corrupt = spark.read.schema("_corrupt STRING, date STRING").parquet(
        quarantine
    )
    if archive_dir is not None:
        os.makedirs(archive_dir, exist_ok=True)
        for name in sorted(os.listdir(log_dir)):
            if name.endswith(".log"):
                shutil.move(
                    os.path.join(log_dir, name), os.path.join(archive_dir, name)
                )
    return corrupt


def daily_analytics(
    spark: SparkSession, staging_path: str, run_date: str
) -> tuple[DataFrame, DataFrame]:
    """The Glue job's analytical output for one day.

    Returns ``(requests_per_user, daily_summary)``:
      * requests_per_user: (user_id, requests_count) — K3's payload;
      * daily_summary: one row (current_date, user_count,
        total_successful_requests) — K4's payload, with the reference's
        schema-literal bug fixed (proper typed columns).
    ONE partition-pruned scan feeds both (the reference scans three times).
    """
    day = read_staging(spark, staging_path, date=run_date)
    per_user = (
        day.filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("requests_count"))
    )
    summary = day.agg(
        F.lit(run_date).alias("current_date"),
        F.countDistinct("user_id").cast("int").alias("user_count"),
        F.count(F.when(F.col("status_code") == 200, 1))
        .cast("int")
        .alias("total_successful_requests"),
    )
    return per_user, summary
