"""Planted-fixture pins for the ML-prep / privacy-audit / sliding-window
round-4 additions (target encoding, t-closeness, delta-encoded sliding
distinct)."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from tdk_apache_log_etl_spark.operators import ORACLES, QUERIES

from .parity import compare


def test_target_encoding_leaves_out_own_fold(spark, tmp_path):
    pd.DataFrame(
        [(1, "A"), (2, "B")], columns=["c_custkey", "c_mktsegment"]
    ).to_parquet(tmp_path / "customer.parquet")
    # folds = o_orderkey % 5; seg A rows in folds 0/1/2, seg B only fold 0
    pd.DataFrame(
        [
            (0, 1, 10.0),
            (1, 1, 20.0),
            (2, 1, 30.0),
            (5, 2, 100.0),
        ],
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    ).to_parquet(tmp_path / "orders.parquet")
    rows = {
        (r.segment, r.fold): r
        for r in QUERIES["target_encode_mktsegment"](
            spark, str(tmp_path)
        ).collect()
    }
    # (A, fold 0): own row (price 10) excluded -> mean(20, 30) = 25
    assert rows[("A", 0)].enc_oof == 25.0
    # prior for fold 0 excludes fold 0 across ALL segments -> mean(20,30)=25
    # smoothed = (50 + 20*25) / (2 + 20) = 25 exactly
    assert rows[("A", 0)].enc_smoothed == 25.0
    # segment B lives entirely in fold 0 -> OOF undefined -> NULL
    assert rows[("B", 0)].enc_oof is None
    ok, detail = compare(
        spark,
        "target_encode_mktsegment",
        QUERIES["target_encode_mktsegment"],
        ORACLES["target_encode_mktsegment"],
        str(tmp_path),
    )
    assert ok, detail


def test_t_closeness_planted_extremes(spark, tmp_path):
    # One nation, three segments over two balance bands (global 50/50
    # once C is included): A all band-0, B all band-1 (each TVD = 0.5),
    # C mirrors the global marginal exactly (TVD = 0).
    rows = [
        (1, 0, "A", 500.0),
        (2, 0, "A", 600.0),
        (3, 0, "B", 1500.0),
        (4, 0, "B", 1600.0),
        (5, 0, "C", 700.0),
        (6, 0, "C", 1700.0),
    ]
    pd.DataFrame(
        rows,
        columns=["c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal"],
    ).to_parquet(tmp_path / "customer.parquet")
    out = {
        r.segment: r
        for r in QUERIES["t_closeness_audit"](spark, str(tmp_path)).collect()
    }
    assert out["A"].t_closeness == 0.5
    assert out["B"].t_closeness == 0.5
    assert out["C"].t_closeness == 0.0
    assert out["A"].group_size == 2
    ok, detail = compare(
        spark,
        "t_closeness_audit",
        QUERIES["t_closeness_audit"],
        ORACLES["t_closeness_audit"],
        str(tmp_path),
    )
    assert ok, detail


def test_sliding_distinct_delta_identity(spark, tmp_path):
    # user 1 active Jan 1 and Jan 10, user 2 active Jan 1 only, one
    # NULL-user event (excluded). Trailing-7-day windows:
    #   e in Jan 1..7  -> Jan 1 visible to both users -> 2
    #   e = Jan 8, 9   -> Jan 1 aged out, Jan 10 not yet -> 0
    #   e = Jan 10     -> user 1 via Jan 10 -> 1
    rows = [
        (1, dt.datetime(2026, 1, 1, 9), 1, "view", 1.0, "{}"),
        (2, dt.datetime(2026, 1, 10, 9), 1, "view", 1.0, "{}"),
        (3, dt.datetime(2026, 1, 1, 12), 2, "view", 1.0, "{}"),
        (4, dt.datetime(2026, 1, 5, 12), None, "view", 1.0, "{}"),
    ]
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    out = QUERIES["active_users_7d_sliding"](spark, str(tmp_path)).collect()
    got = {r.win_end.isoformat(): r.n_active_users for r in out}
    assert len(got) == 10
    for d in range(1, 8):
        assert got[f"2026-01-0{d}"] == 2
    assert got["2026-01-08"] == 0
    assert got["2026-01-09"] == 0
    assert got["2026-01-10"] == 1
    ok, detail = compare(
        spark,
        "active_users_7d_sliding",
        QUERIES["active_users_7d_sliding"],
        ORACLES["active_users_7d_sliding"],
        str(tmp_path),
    )
    assert ok, detail


def test_runs_test_alternating_series(spark, tmp_path):
    # 6 days alternating high/low around the mean: n_above=3, n_below=3,
    # n_runs=6; z = (6 - (1 + 2*3*3/6)) / sqrt((18*12)/(36*5))
    #           = 2 / sqrt(1.2) = 1.8257418583505536...
    rows = []
    for i in range(6):
        price = 100.0 if i % 2 == 0 else 10.0
        rows.append((i, dt.date(2026, 1, 1 + i), price))
    pd.DataFrame(
        rows, columns=["o_orderkey", "o_orderdate", "o_totalprice"]
    ).to_parquet(tmp_path / "orders.parquet")
    [r] = QUERIES["daily_revenue_runs_test"](spark, str(tmp_path)).collect()
    assert (r.n_days, r.n_above, r.n_below, r.n_runs) == (6, 3, 3, 6)
    assert abs(r.z - 1.8257418583505536) < 1e-12
    ok, detail = compare(
        spark,
        "daily_revenue_runs_test",
        QUERIES["daily_revenue_runs_test"],
        ORACLES["daily_revenue_runs_test"],
        str(tmp_path),
    )
    assert ok, detail
