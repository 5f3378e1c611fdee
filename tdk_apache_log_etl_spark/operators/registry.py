"""Query/oracle registry backing ``__spark_entry__.queries()`` /
``oracle_sql()``.

Each registered query is a callable ``(spark, sf_dir) -> DataFrame``; the
optional oracle is the equivalent ANSI SQL that DuckDB runs on the same
parquet tables. Column names AND values are designed to match exactly
(see operators/numeric.py for the determinism rules).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
