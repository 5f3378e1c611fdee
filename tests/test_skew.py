"""Skew stress: plant a heavy-hitter key (one user owning half the fact
rows) and show the salted join actually bounds per-reducer load — the
partition-row-count proof behind operators/skew.py's 100 TB claim."""

from __future__ import annotations

from pyspark.sql import functions as F

from tdk_apache_log_etl_spark.operators.skew import N_SALTS, salted_join


def _max_partition_rows(df, n_parts, *keys):
    counts = (
        df.repartition(n_parts, *[F.col(k) for k in keys])
        .withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .count()
        .collect()
    )
    return max(r["count"] for r in counts)


def test_salted_join_bounds_hot_key_partition(spark):
    # 50% of events belong to user 7 — the shape that strands one reducer.
    n = 20_000
    hot = spark.range(n // 2).select(
        F.col("id").alias("event_id"), F.lit(7).alias("user_id")
    )
    cold = spark.range(n // 2, n).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 1000 + 100).alias("user_id"),
    )
    events = hot.unionAll(cold)
    dims = spark.range(2000).select(
        F.col("id").alias("user_id"), (F.col("id") * 10.0).alias("ltv")
    )

    n_parts = 32
    # Unsalted: hash-partitioning on user_id puts ALL hot rows in one
    # partition → max partition holds >= the hot key's 10k rows.
    unsalted_max = _max_partition_rows(events, n_parts, "user_id")
    assert unsalted_max >= n // 2

    # Salted: the hot key spreads across N_SALTS reducers; the biggest
    # partition must drop by nearly the salt fan-out (allow 2× slack for
    # hash collisions between (key, salt) buckets).
    salted = events.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("event_id")), F.lit(N_SALTS))
    )
    salted_max = _max_partition_rows(salted, n_parts, "user_id", "_salt")
    assert salted_max <= 2 * (n // 2) / N_SALTS + (n // 2) / 10

    # And salting never changes the answer: salted join == plain join.
    got = sorted(
        salted_join(events, dims, "user_id", "event_id")
        .select("event_id", "user_id", "ltv")
        .collect()
    )
    want = sorted(events.join(dims, "user_id").select(
        "event_id", "user_id", "ltv"
    ).collect())
    assert got == want
