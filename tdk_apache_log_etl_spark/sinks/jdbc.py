"""JDBC result sinks — the reference's K3 (overwrite, per-user counts →
tdk_user_requests_table, sree-etl-tdk-glue-job.py:72-77) and K4 (append,
daily summary → tdk_total_requests_table, :89-94), generalized.

Fixes over the reference, per SURVEY.md §7.4.5:
  * a real ``jdbc:`` URL is required (the reference's ``:22`` lacks the
    ``jdbc:oracle:thin:@//host:port/svc`` prefix);
  * overwrite uses ``truncate=true`` so the target table's DDL (grants,
    indexes) survives the daily replace;
  * writes are parallelized (``numPartitions``) and batched
    (``batchsize``) — the reference writes with Spark defaults, which at
    scale means one executor trickling single-row inserts.

The full write path — including the terminal ``.save()``, table
auto-create, truncate-preserving overwrite, and append — is exercised
end-to-end in tests/test_jdbc.py against embedded Derby (the in-JVM
database Spark already bundles for its Hive metastore), standing in for
the reference's Oracle target.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.readwriter import DataFrameWriter


def jdbc_writer(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    properties: dict[str, str] | None = None,
    num_partitions: int = 8,
    batchsize: int = 10_000,
    truncate: bool = True,
) -> DataFrameWriter:
    """Build (but do not execute) a configured JDBC writer."""
    if not url.startswith("jdbc:"):
        raise ValueError(
            f"JDBC url must start with 'jdbc:' (got {url!r}); e.g. "
            "jdbc:oracle:thin:@//host:1521/service"
        )
    writer = (
        df.coalesce(num_partitions)
        .write.format("jdbc")
        .mode(mode)
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .option("isolationLevel", "READ_COMMITTED")
    )
    if mode == "overwrite" and truncate:
        writer = writer.option("truncate", "true")
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    return writer


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    properties: dict[str, str] | None = None,
    **kwargs,
) -> None:
    """K3/K4: execute the configured JDBC write."""
    jdbc_writer(df, url, table, mode=mode, properties=properties, **kwargs).save()
