"""Query/oracle registry backing ``__spark_entry__.queries()`` /
``oracle_sql()``.

Each registered query is a callable ``(spark, sf_dir) -> DataFrame``; the
optional oracle is the equivalent ANSI SQL that DuckDB runs on the same
parquet tables. Column names AND values are designed to match exactly
(see operators/numeric.py for the determinism rules).
"""

from __future__ import annotations

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

#: Persisted frames created while building the CURRENT query, drained at
#: the next query invocation. Several operators persist() intermediates
#: that multiple plan branches reuse (shingle frames, LSH bands, the Q15
#: revenue view); the cache must outlive the query function (the caller
#: runs the action), so it can't be try/finally-scoped inside — but
#: without cleanup a long-lived session accumulates cached blocks across
#: queries until executor storage fills. One-query lifetime is the
#: contract: reuse happens within a query's plan, never across queries.
_SCOPED_CACHES: list[DataFrame] = []


def scoped_persist(df: DataFrame) -> DataFrame:
    """persist() with one-query lifetime: evicted when the NEXT registered
    query starts building (or via release_scoped_caches)."""
    _SCOPED_CACHES.append(df.persist())
    return df


def release_scoped_caches() -> None:
    while _SCOPED_CACHES:
        _SCOPED_CACHES.pop().unpersist()


def query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            release_scoped_caches()
            return fn(spark, sf_dir)

        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco
