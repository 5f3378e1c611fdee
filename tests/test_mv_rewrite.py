"""Materialized-view rewrite (planning/mv_rewrite.py): rollup queries
must be answered FROM THE MV (no base-table scan in the plan), match
direct computation exactly, decompose avg into stored sum/count, skip
re-aggregation at the exact MV grain, and fall back to base when no MV
subsumes the query."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from tdk_apache_log_etl_spark.planning import (
    AggQuery,
    MaterializedView,
    answer,
    build_mv,
    try_rewrite,
)

#: cents-fixed revenue so sums are exact integers (order-insensitive)
REV = "cast(floor(o_totalprice * 100 + 0.5) as bigint)"

MV_SPEC = AggQuery(
    table="orders",
    keys={
        "day": "date_trunc('day', o_orderdate)",
        "status": "o_orderstatus",
    },
    measures={
        "rev_cents": ("sum", REV),
        "n_orders": ("count", "*"),
        # avg rewrites need COUNT(expr) of the same expr (COUNT(*)
        # over-counts when the measure is nullable)
        "n_vals": ("count", REV),
        "max_cents": ("max", REV),
        "min_cents": ("min", REV),
    },
)


def _orders(tmp_path):
    rows = []
    k = 0
    for month in (1, 2):
        for day in (1, 2):
            for status, price in (("O", 10.25), ("F", 20.50)):
                for _ in range(3):
                    k += 1
                    rows.append(
                        (k, 7, status, price * k, dt.datetime(1995, month, day))
                    )
    df = pd.DataFrame(
        rows,
        columns=[
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
        ],
    )
    df["o_orderdate"] = df["o_orderdate"].astype("datetime64[ms]")
    path = tmp_path / "orders.parquet"
    df.to_parquet(path)
    return str(path)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_monthly_rollup_scans_only_the_mv(spark, tmp_path):
    base = spark.read.parquet(_orders(tmp_path))
    mv = MaterializedView("daily_rev", MV_SPEC, str(tmp_path / "mv"))
    build_mv(base, mv)

    monthly = AggQuery(
        table="orders",
        keys={
            "month": "date_trunc('month', o_orderdate)",
            "status": "o_orderstatus",
        },
        measures={
            "rev_cents": ("sum", REV),
            "n_orders": ("count", "*"),
            "max_cents": ("max", REV),
            "min_cents": ("min", REV),
            "avg_cents": ("avg", REV),
        },
    )
    got = try_rewrite(spark, monthly, mv)
    assert got is not None
    # plan provenance: every input file comes from the MV, none from base
    files = got.inputFiles()
    assert files and all("/mv/" in f for f in files)
    assert not any("orders.parquet" in f for f in files)

    direct, used = answer(spark, monthly, [], base)
    assert used is None
    assert _rows(got) == _rows(direct)
    # integer exactness spot check: month-1 'O' revenue = sum over k of
    # 1025*k for the 6 'O' orders in month 1
    by_key = {(r.month, r.status): r for r in got.collect()}
    m1o = by_key[(dt.datetime(1995, 1, 1), "O")]
    assert m1o.n_orders == 6
    assert m1o.avg_cents == m1o.rev_cents / 6


def test_exact_grain_is_a_pure_projection(spark, tmp_path):
    base = spark.read.parquet(_orders(tmp_path))
    mv = MaterializedView("daily_rev", MV_SPEC, str(tmp_path / "mv"))
    build_mv(base, mv)
    q = AggQuery(
        table="orders",
        keys=dict(MV_SPEC.keys),
        measures={"rev_cents": ("sum", REV), "n_orders": ("count", "*")},
    )
    got = try_rewrite(spark, q, mv)
    assert got is not None
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Aggregate" not in plan  # projection only — no re-agg
    direct, _ = answer(spark, q, [], base)
    assert _rows(got) == _rows(direct)


def test_unmatched_key_falls_back_to_base(spark, tmp_path):
    base = spark.read.parquet(_orders(tmp_path))
    mv = MaterializedView("daily_rev", MV_SPEC, str(tmp_path / "mv"))
    build_mv(base, mv)
    q = AggQuery(
        table="orders",
        keys={"cust": "o_custkey"},  # not derivable from (day, status)
        measures={"rev_cents": ("sum", REV)},
    )
    assert try_rewrite(spark, q, mv) is None
    df, used = answer(spark, q, [mv], base)
    assert used is None
    assert _rows(df) == _rows(
        spark.read.parquet(_orders(tmp_path))
        .selectExpr("o_custkey as cust", f"{REV} as r")
        .groupBy("cust")
        .sum("r")
        .withColumnRenamed("sum(r)", "rev_cents")
    )


def test_week_never_rolls_up_from_month(spark, tmp_path):
    base = spark.read.parquet(_orders(tmp_path))
    monthly_mv = MaterializedView(
        "monthly",
        AggQuery(
            table="orders",
            keys={"month": "date_trunc('month', o_orderdate)"},
            measures={"n_orders": ("count", "*")},
        ),
        str(tmp_path / "mv_month"),
    )
    build_mv(base, monthly_mv)
    weekly = AggQuery(
        table="orders",
        keys={"week": "date_trunc('week', o_orderdate)"},
        measures={"n_orders": ("count", "*")},
    )
    # weeks straddle month boundaries — the lattice must refuse
    assert try_rewrite(spark, weekly, monthly_mv) is None
    # but year DOES roll up from month
    yearly = AggQuery(
        table="orders",
        keys={"year": "date_trunc('year', o_orderdate)"},
        measures={"n_orders": ("count", "*")},
    )
    got = try_rewrite(spark, yearly, monthly_mv)
    assert got is not None
    assert _rows(got) == [(dt.datetime(1995, 1, 1), 24)]


def test_avg_requires_stored_sum_and_count(spark, tmp_path):
    base = spark.read.parquet(_orders(tmp_path))
    sum_only = MaterializedView(
        "sum_only",
        AggQuery(
            table="orders",
            keys={"status": "o_orderstatus"},
            measures={"rev_cents": ("sum", REV)},
        ),
        str(tmp_path / "mv_sum"),
    )
    build_mv(base, sum_only)
    q = AggQuery(
        table="orders",
        keys={"status": "o_orderstatus"},
        measures={"avg_cents": ("avg", REV)},
    )
    assert try_rewrite(spark, q, sum_only) is None  # no count stored
