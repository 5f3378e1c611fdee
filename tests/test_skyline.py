"""E114 skyline planted fixtures: known frontier with ties/duplicates,
and the anti-correlated worst case where EVERY point is on the frontier
(the shape that degrades the two-phase reduction) — both with full
cross-engine parity plus exact membership asserts."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from tdk_apache_log_etl_spark.operators import ORACLES, QUERIES

from .parity import compare

_NAME = "skyline_customers_spend_orders"


def _orders_for_profiles(profiles: dict[int, tuple[float, int]]):
    """custkey -> (total_spend, n_orders); built as one order of
    S-(C-1) plus C-1 orders of 1.0 so the floor-scaled sum is exact."""
    rows = []
    k = 0
    for custkey, (spend, n) in profiles.items():
        prices = [spend - (n - 1)] + [1.0] * (n - 1)
        for p in prices:
            rows.append(
                (k, custkey, "O", float(p), dt.datetime(2026, 1, 1),
                 "1-URGENT")
            )
            k += 1
    df = pd.DataFrame(
        rows,
        columns=[
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority",
        ],
    )
    df["o_orderdate"] = df["o_orderdate"].astype("datetime64[ms]")
    return df


def test_skyline_planted_frontier_with_ties(spark, tmp_path):
    # Frontier: A(100,1), G(100,1) duplicate profile, B(50,3), C(50,3)
    # duplicate profile, E(10,5). Dominated: D(40,2) by B, F(50,2) by B
    # (equal spend, fewer orders), H(5,5) by E.
    profiles = {
        1: (100.0, 1),   # A
        2: (50.0, 3),    # B
        3: (50.0, 3),    # C (duplicate of B — both survive: no strict)
        4: (40.0, 2),    # D dominated
        5: (10.0, 5),    # E
        6: (50.0, 2),    # F dominated (tie on spend, strict on count)
        7: (100.0, 1),   # G (duplicate of A)
        8: (5.0, 5),     # H dominated
    }
    _orders_for_profiles(profiles).to_parquet(tmp_path / "orders.parquet")
    got = {
        r.custkey for r in QUERIES[_NAME](spark, str(tmp_path)).collect()
    }
    assert got == {1, 2, 3, 5, 7}
    ok, detail = compare(
        spark, _NAME, QUERIES[_NAME], ORACLES[_NAME], str(tmp_path)
    )
    assert ok, detail


def test_skyline_anticorrelated_all_points_survive(spark, tmp_path):
    # spend rises while order count falls: nothing dominates anything,
    # the frontier IS the whole set — the two-phase plan must not drop
    # rows when the local-skyline reduction buys nothing.
    profiles = {i: ((i + 1) * 10.0, 20 - i) for i in range(20)}
    _orders_for_profiles(profiles).to_parquet(tmp_path / "orders.parquet")
    assert QUERIES[_NAME](spark, str(tmp_path)).count() == 20
    ok, detail = compare(
        spark, _NAME, QUERIES[_NAME], ORACLES[_NAME], str(tmp_path)
    )
    assert ok, detail
