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


def test_trend_degenerate_groups_null_slope(spark, tmp_path):
    # den = n·Σx² − (Σx)² is 0 for a single-event group and for a group
    # whose events all land on one day; both engines must agree on NULL
    # slope/intercept there instead of ANSI divide-by-zero (Spark) vs
    # ±inf (DuckDB) — round-2 ADVICE hazard, now a planted fixture.
    import datetime

    import pandas as pd

    rows = [
        # one event total → n=1, den=0
        (1, datetime.datetime(2026, 8, 1, 10), 1, "solo", 5.0, "{}"),
        # three events, all on the same day → den=0
        (2, datetime.datetime(2026, 8, 2, 9), 1, "oneday", 1.0, "{}"),
        (3, datetime.datetime(2026, 8, 2, 10), 2, "oneday", 2.0, "{}"),
        (4, datetime.datetime(2026, 8, 2, 11), 3, "oneday", 3.0, "{}"),
        # a healthy two-day group → real slope
        (5, datetime.datetime(2026, 8, 1, 9), 1, "ok", 1.0, "{}"),
        (6, datetime.datetime(2026, 8, 2, 9), 1, "ok", 3.0, "{}"),
    ]
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    ok, detail = compare(
        spark,
        "events_value_trend",
        QUERIES["events_value_trend"],
        ORACLES["events_value_trend"],
        str(tmp_path),
    )
    assert ok, detail
    got = {
        r.event_type: (r.slope_per_day, r.intercept)
        for r in QUERIES["events_value_trend"](spark, str(tmp_path)).collect()
    }
    assert got["solo"] == (None, None)
    assert got["oneday"] == (None, None)
    assert got["ok"][0] == pytest.approx(2.0)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert rows[0]["total_requests"] > 0
    assert set(e.oracle_sql()) <= set(e.queries())
