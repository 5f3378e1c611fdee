"""The main correctness gate rehearsal: every registered query with an
oracle must match DuckDB exactly at sf0.01 (same check the driver runs)."""

from __future__ import annotations

import pytest

from tdk_apache_log_etl_spark.operators import ORACLES, QUERIES

from .conftest import SF_DIR_CORRECT
from .parity import compare


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, name):
    ok, detail = compare(
        spark, name, QUERIES[name], ORACLES[name], SF_DIR_CORRECT
    )
    assert ok, f"{name}: {detail}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR_CORRECT)
    n = df.count()
    assert n >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert rows[0]["total_requests"] > 0
    assert set(e.oracle_sql()) <= set(e.queries())
