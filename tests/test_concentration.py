"""Planted-fixture pins for the weighted-median convention, the
top-N+OTHER regroup, and Simpson diversity (operators/robuststats.py,
concentration.py, text.py round-3 additions)."""

from __future__ import annotations

import pandas as pd
import pytest

from tdk_apache_log_etl_spark.operators import ORACLES, QUERIES

from .parity import compare


def _lineitem(tmp_path, rows):
    pd.DataFrame(
        rows,
        columns=[
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        ],
    ).to_parquet(tmp_path / "lineitem.parquet")


def test_weighted_median_weight_dominance(spark, tmp_path):
    # Supplier 1: prices 10/20/30 with weights 1/1/10 — the heavy lot
    # drags the weighted median to 30 (an unweighted median says 20).
    # Supplier 2: four equal-weight prices — 2·cum ≥ tot first holds at
    # the LOWER middle (price 2), pinning the even-count convention.
    rows = [
        (1, 1, 1, 1, 1.0, 10.0, 0.0),
        (1, 1, 1, 2, 1.0, 20.0, 0.0),
        (1, 1, 1, 3, 10.0, 30.0, 0.0),
        (2, 1, 2, 1, 1.0, 1.0, 0.0),
        (2, 1, 2, 2, 1.0, 2.0, 0.0),
        (2, 1, 2, 3, 1.0, 3.0, 0.0),
        (2, 1, 2, 4, 1.0, 4.0, 0.0),
    ]
    _lineitem(tmp_path, rows)
    out = {
        r.l_suppkey: r
        for r in QUERIES["supplier_weighted_median_price"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out[1].weighted_median_price == 30.0
    assert out[1].total_quantity == 12.0
    assert out[2].weighted_median_price == 2.0
    ok, detail = compare(
        spark,
        "supplier_weighted_median_price",
        QUERIES["supplier_weighted_median_price"],
        ORACLES["supplier_weighted_median_price"],
        str(tmp_path),
    )
    assert ok, detail


def test_top5_other_regroups_tail(spark, tmp_path):
    # 7 brands with strictly decreasing revenue: top 5 stay named, the
    # two tail brands collapse into ONE 'OTHER' row whose revenue is
    # their SUM (not dropped — the difference from a plain top-k).
    rows = []
    for i in range(7):
        rows.append((i, i, 1, 1, 1.0, float(700 - 100 * i), 0.0))
    _lineitem(tmp_path, rows)
    pd.DataFrame(
        {"p_partkey": list(range(7)), "p_brand": [f"B{i}" for i in range(7)]}
    ).to_parquet(tmp_path / "part.parquet")
    out = {
        r.brand_group: r
        for r in QUERIES["brand_revenue_top5_other"](
            spark, str(tmp_path)
        ).collect()
    }
    assert len(out) == 6
    assert out["OTHER"].n_brands == 2
    assert out["OTHER"].revenue == pytest.approx(200.0 + 100.0)
    assert out["OTHER"].best_rank == 6
    assert out["B0"].revenue == pytest.approx(700.0)
    ok, detail = compare(
        spark,
        "brand_revenue_top5_other",
        QUERIES["brand_revenue_top5_other"],
        ORACLES["brand_revenue_top5_other"],
        str(tmp_path),
    )
    assert ok, detail


def test_simpson_diversity_closed_form(spark, tmp_path):
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["a a b", "a", "a b c"],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    out = {
        r.doc_id: r
        for r in QUERIES["doc_simpson_diversity"](
            spark, str(tmp_path)
        ).collect()
    }
    # "a a b": 1 - 2/(3*2) = 2/3; single token -> NULL; all-distinct -> 1.
    assert out[1].simpson_diversity == pytest.approx(2 / 3)
    assert out[2].simpson_diversity is None
    assert out[3].simpson_diversity == pytest.approx(1.0)
    assert (out[1].n_tokens, out[1].n_distinct) == (3, 2)
    ok, detail = compare(
        spark,
        "doc_simpson_diversity",
        QUERIES["doc_simpson_diversity"],
        ORACLES["doc_simpson_diversity"],
        str(tmp_path),
    )
    assert ok, detail


def test_key_skew_audit_closed_form(spark, tmp_path):
    # Counts [1,1,1,7]: p50=1, p90=1+0.7*6=5.2, p99=1+0.97*6=6.82,
    # imbalance = 7*4/10 = 2.8.
    import datetime as dt

    rows = []
    eid = 0
    for u, cnt in [(1, 1), (2, 1), (3, 1), (4, 7)]:
        for _ in range(cnt):
            eid += 1
            rows.append(
                (eid, dt.datetime(2026, 8, 3, 9 + eid % 8), u, "view",
                 1.0, "{}")
            )
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    [r] = QUERIES["key_skew_audit"](spark, str(tmp_path)).collect()
    assert (r.n_keys, r.total_rows, r.max_rows) == (4, 10, 7)
    assert r.p50 == pytest.approx(1.0)
    assert r.p90 == pytest.approx(5.2)
    assert r.p99 == pytest.approx(6.82)
    assert r.imbalance == pytest.approx(2.8)
    ok, detail = compare(
        spark,
        "key_skew_audit",
        QUERIES["key_skew_audit"],
        ORACLES["key_skew_audit"],
        str(tmp_path),
    )
    assert ok, detail


def test_whale_share_single_dominant_customer(spark, tmp_path):
    # 99 customers spend 100 each, one whale spends 10,000:
    # k = ceil(100/100) = 1 and the whale carries 10000/19900 of revenue.
    import datetime as dt

    rows = [
        (i, i, "O", 100.0, dt.datetime(2026, 1, 1), "1-URGENT")
        for i in range(99)
    ]
    rows.append((99, 99, "O", 10000.0, dt.datetime(2026, 1, 1), "1-URGENT"))
    pd.DataFrame(
        rows,
        columns=[
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ],
    ).to_parquet(tmp_path / "orders.parquet")
    [r] = QUERIES["whale_revenue_share"](spark, str(tmp_path)).collect()
    assert (r.n_customers, r.top1pct_n) == (100, 1)
    assert r.total_revenue == pytest.approx(19900.0)
    assert r.top1pct_share == pytest.approx(10000 / 19900)
    ok, detail = compare(
        spark,
        "whale_revenue_share",
        QUERIES["whale_revenue_share"],
        ORACLES["whale_revenue_share"],
        str(tmp_path),
    )
    assert ok, detail


def test_brand_rank_delta_swap(spark, tmp_path):
    # Two brands swap ranks between two months: A 1→2 (delta −1),
    # B 2→1 (delta +1); first month has NULL prev_rank/delta.
    import datetime as dt

    li_rows = [
        # (orderkey, partkey, suppkey, linenumber, qty, price, discount, shipdate)
        (1, 0, 1, 1, 1.0, 700.0, 0.0, dt.datetime(2026, 1, 5)),
        (2, 1, 1, 1, 1.0, 300.0, 0.0, dt.datetime(2026, 1, 6)),
        (3, 0, 1, 1, 1.0, 300.0, 0.0, dt.datetime(2026, 2, 5)),
        (4, 1, 1, 1, 1.0, 700.0, 0.0, dt.datetime(2026, 2, 6)),
    ]
    li = pd.DataFrame(
        li_rows,
        columns=[
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
    )
    # match the fixture's ms precision (a ns column would read as BIGINT
    # under the session-wide nanosAsLong conf the events loader sets)
    li["l_shipdate"] = li["l_shipdate"].astype("datetime64[ms]")
    li.to_parquet(tmp_path / "lineitem.parquet")
    pd.DataFrame(
        {"p_partkey": [0, 1], "p_brand": ["A", "B"]}
    ).to_parquet(tmp_path / "part.parquet")
    out = {
        (r.p_brand, r.month.isoformat()): r
        for r in QUERIES["brand_rank_delta_month"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out[("A", "2026-01-01")].rnk == 1
    assert out[("A", "2026-01-01")].prev_rank is None
    assert out[("A", "2026-02-01")].rank_delta == -1
    assert out[("B", "2026-02-01")].rank_delta == 1
    ok, detail = compare(
        spark,
        "brand_rank_delta_month",
        QUERIES["brand_rank_delta_month"],
        ORACLES["brand_rank_delta_month"],
        str(tmp_path),
    )
    assert ok, detail


def test_order_ship_lag_counting_percentiles(spark, tmp_path):
    # One priority, lags [1,2,3,10] (first-ship = earliest lineitem):
    # p50 = 2 (2*cum >= n first holds there), p95 = 10, avg = 4.0.
    import datetime as dt

    base = dt.datetime(2026, 1, 1)
    orders = pd.DataFrame(
        [(k, k, "O", 10.0, base, "1-URGENT") for k in range(4)],
        columns=[
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ],
    )
    orders["o_orderdate"] = orders["o_orderdate"].astype("datetime64[ms]")
    orders.to_parquet(tmp_path / "orders.parquet")
    li_rows = []
    for k, lag in zip(range(4), [1, 2, 3, 10]):
        # two lineitems per order; the LATER one must not define the lag
        li_rows.append((k, 1, 1, 1, 1.0, 10.0, 0.0,
                        base + dt.timedelta(days=lag)))
        li_rows.append((k, 1, 1, 2, 1.0, 10.0, 0.0,
                        base + dt.timedelta(days=lag + 30)))
    li = pd.DataFrame(
        li_rows,
        columns=[
            "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
            "l_quantity", "l_extendedprice", "l_discount", "l_shipdate",
        ],
    )
    li["l_shipdate"] = li["l_shipdate"].astype("datetime64[ms]")
    li.to_parquet(tmp_path / "lineitem.parquet")
    [r] = QUERIES["order_ship_lag_stats"](spark, str(tmp_path)).collect()
    assert (r.n_orders, r.p50_lag, r.p95_lag) == (4, 2, 10)
    assert r.avg_lag_days == pytest.approx(4.0)
    ok, detail = compare(
        spark,
        "order_ship_lag_stats",
        QUERIES["order_ship_lag_stats"],
        ORACLES["order_ship_lag_stats"],
        str(tmp_path),
    )
    assert ok, detail


def test_segment_migration_moves_and_none(spark, tmp_path):
    # Period 1: customers 1-4 with ascending spend -> tiles T1..T4.
    # Period 2: customer 4 crashes to the bottom, customer 1 disappears,
    # customer 5 appears. Expect T4->T1, T1->none, none->T4 (cust 5 is
    # p2's top spender among {2,3,4,5}? spends: c4=10, c2=200, c3=300,
    # c5=400 -> tiles c4=T1, c2=T2, c3=T3, c5=T4).
    import datetime as dt

    p1d = dt.datetime(1997, 1, 1)
    p2d = dt.datetime(1999, 1, 1)
    rows = []
    ok_ = 0
    for c, spend in [(1, 100.0), (2, 200.0), (3, 300.0), (4, 400.0)]:
        ok_ += 1
        rows.append((ok_, c, "O", spend, p1d, "1-URGENT"))
    for c, spend in [(4, 10.0), (2, 200.0), (3, 300.0), (5, 400.0)]:
        ok_ += 1
        rows.append((ok_, c, "O", spend, p2d, "1-URGENT"))
    orders = pd.DataFrame(
        rows,
        columns=[
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority",
        ],
    )
    orders["o_orderdate"] = orders["o_orderdate"].astype("datetime64[ms]")
    orders.to_parquet(tmp_path / "orders.parquet")
    out = {
        (r.seg_from, r.seg_to): r.n_customers
        for r in QUERIES["segment_migration_matrix"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out[("T4", "T1")] == 1      # customer 4 crashed
    assert out[("T1", "none")] == 1    # customer 1 left
    assert out[("none", "T4")] == 1    # customer 5 arrived on top
    assert out[("T2", "T2")] == 1 and out[("T3", "T3")] == 1
    ok, detail = compare(
        spark,
        "segment_migration_matrix",
        QUERIES["segment_migration_matrix"],
        ORACLES["segment_migration_matrix"],
        str(tmp_path),
    )
    assert ok, detail


def test_token_drift_closed_form(spark, tmp_path):
    # Slice A (even doc ids): "a a b"; slice B (odd): "a b b".
    # p = (2/3, 1/3), q = (1/3, 2/3) -> TVD = 1/3. A token present in
    # only one slice must contribute its full mass (doc 2 adds "c").
    pd.DataFrame(
        {"doc_id": [0, 1], "text": ["a a b", "a b b"]}
    ).to_parquet(tmp_path / "documents.parquet")
    [r] = QUERIES["token_distribution_drift"](spark, str(tmp_path)).collect()
    assert (r.n_tokens_a, r.n_tokens_b, r.vocab_union) == (3, 3, 2)
    assert r.tvd == pytest.approx(1 / 3)
    ok, detail = compare(
        spark,
        "token_distribution_drift",
        QUERIES["token_distribution_drift"],
        ORACLES["token_distribution_drift"],
        str(tmp_path),
    )
    assert ok, detail
    # one-sided vocabulary: add doc 2 (even) with a new token "c c c"
    pd.DataFrame(
        {"doc_id": [0, 1, 2], "text": ["a a b", "a b b", "c c c"]}
    ).to_parquet(tmp_path / "documents.parquet")
    [r2] = QUERIES["token_distribution_drift"](spark, str(tmp_path)).collect()
    # p = (2/6, 1/6, 3/6), q = (1/3, 2/3, 0) -> TVD = (0 + 1/2 + 1/2)/2... 
    # exact: 0.5*(|1/3-1/3| + |1/6-2/3| + |1/2-0|) = 0.5*(0 + 1/2 + 1/2) = 1/2
    assert r2.vocab_union == 3
    assert r2.tvd == pytest.approx(0.5)


def test_did_cancels_level_and_time_shock(spark, tmp_path):
    # control (odd uid): pre mean 1, post mean 2 (common time shock +1);
    # treated (even uid): pre mean 3 (level offset), post mean 7.
    # DiD = (7−3) − (2−1) = 3 — the naive post-only diff would say 5.
    import datetime as dt

    from tdk_apache_log_etl_spark.operators.concentration import DID_PIVOT

    pivot = dt.datetime.fromisoformat(DID_PIVOT)
    pre, post = pivot - dt.timedelta(days=5), pivot + dt.timedelta(days=5)
    rows, eid = [], 0

    def ev(uid, ts, v):
        nonlocal eid
        eid += 1
        rows.append((eid, ts, uid, "view", float(v), "{}"))

    for uid in (1, 3):       # control
        ev(uid, pre, 1.0)
        ev(uid, post, 2.0)
    for uid in (2, 4):       # treated
        ev(uid, pre, 3.0)
        ev(uid, post, 7.0)
    df = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value",
                 "props"],
    )
    df["ts"] = df["ts"].astype("datetime64[ms]")
    df.to_parquet(tmp_path / "events.parquet")
    [r] = QUERIES["did_value_uplift"](spark, str(tmp_path)).collect()
    assert (r.mean_treat_pre, r.mean_treat_post) == (3.0, 7.0)
    assert (r.mean_ctrl_pre, r.mean_ctrl_post) == (1.0, 2.0)
    assert r.did == 3.0
    ok, detail = compare(
        spark,
        "did_value_uplift",
        QUERIES["did_value_uplift"],
        ORACLES["did_value_uplift"],
        str(tmp_path),
    )
    assert ok, detail


def test_mannwhitney_hand_computed(spark, tmp_path):
    # A = {1, 2} (even user), B = {2, 3} (odd user). Tie groups by value:
    # 1 -> rank 1; {2, 2} -> avg rank 2.5; 3 -> rank 4.  R_A = 3.5 so
    # rank_sum_a_x2 = 7, U_A = R_A - n_a(n_a+1)/2 = 0.5 (u_a_x2 = 1),
    # tie term = 2^3 - 2 = 6, Var = (4/12)(5 - 6/12) = 1.5,
    # z = (0.5 - 2)/sqrt(1.5) = -1.5/sqrt(1.5).
    import datetime as dt
    import math

    rows = [
        (1, dt.datetime(2026, 8, 3, 9), 0, "view", 1.0, "{}"),
        (2, dt.datetime(2026, 8, 3, 10), 0, "view", 2.0, "{}"),
        (3, dt.datetime(2026, 8, 3, 11), 1, "view", 2.0, "{}"),
        (4, dt.datetime(2026, 8, 3, 12), 1, "view", 3.0, "{}"),
    ]
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    [r] = QUERIES["mannwhitney_value_by_cohort"](spark, str(tmp_path)).collect()
    assert (r.n_a, r.n_b, r.rank_sum_a_x2, r.tie_term, r.u_a_x2) == (
        2, 2, 7, 6, 1,
    )
    assert r.z == -1.5 / math.sqrt(1.5)
    ok, detail = compare(
        spark,
        "mannwhitney_value_by_cohort",
        QUERIES["mannwhitney_value_by_cohort"],
        ORACLES["mannwhitney_value_by_cohort"],
        str(tmp_path),
    )
    assert ok, detail


def test_cuped_removes_preexisting_imbalance(spark, tmp_path):
    # Y = 2X exactly for every user, but cohort B happens to hold the
    # bigger spenders: raw post diff = -20 is pure pre-existing
    # imbalance. CUPED: theta = 2, rho2 = 1, adjusted diff = 0.
    import datetime as dt

    rows = []
    # (user, pre_value, post_value); evens -> cohort A
    for eid, (u, x, y) in enumerate(
        [(0, 10.0, 20.0), (2, 30.0, 60.0), (1, 20.0, 40.0), (3, 40.0, 80.0)]
    ):
        rows.append((2 * eid, dt.datetime(2026, 5, 1 + eid % 2, 9), u,
                     "view", x, "{}"))
        rows.append((2 * eid + 1, dt.datetime(2026, 5, 6 + eid % 4, 9), u,
                     "purchase", y, "{}"))
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    [r] = QUERIES["cuped_adjusted_uplift"](spark, str(tmp_path)).collect()
    assert (r.n_a, r.n_b) == (2, 2)
    assert r.theta == 2.0
    assert r.rho2 == 1.0
    assert r.raw_diff == -20.0
    assert r.adjusted_diff == 0.0
    ok, detail = compare(
        spark,
        "cuped_adjusted_uplift",
        QUERIES["cuped_adjusted_uplift"],
        ORACLES["cuped_adjusted_uplift"],
        str(tmp_path),
    )
    assert ok, detail


def test_poisson_bootstrap_ci_brackets_and_deterministic(spark, tmp_path):
    # 200 values of 10.0 and one 5000.0 whale: the CI must bracket the
    # point mean, have positive width (replicas that draw the whale 0/1/2
    # times differ), and be bit-identical across runs (hash coin, not RNG).
    import datetime as dt

    rows = [
        (i, dt.datetime(2026, 7, 1 + i % 20, 8), i % 9, "view",
         10.0 if i < 200 else 5000.0, "{}")
        for i in range(201)
    ]
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    [r1] = QUERIES["poisson_bootstrap_value_ci"](spark, str(tmp_path)).collect()
    [r2] = QUERIES["poisson_bootstrap_value_ci"](spark, str(tmp_path)).collect()
    assert (r1.boot_lo, r1.boot_hi) == (r2.boot_lo, r2.boot_hi)
    assert r1.n_events == 201 and r1.n_replicas == 64
    assert r1.point_mean == (200 * 10.0 * 100 + 500000) / (100.0 * 201)
    assert r1.boot_lo < r1.point_mean < r1.boot_hi
    assert r1.boot_lo >= 10.0 * 0.5  # sane lower bound
    ok, detail = compare(
        spark,
        "poisson_bootstrap_value_ci",
        QUERIES["poisson_bootstrap_value_ci"],
        ORACLES["poisson_bootstrap_value_ci"],
        str(tmp_path),
    )
    assert ok, detail


def test_cramers_v_extremes(spark, tmp_path):
    # Perfect association (each type owns one dow) -> V = 1 exactly;
    # the integer cell arithmetic must not lose a unit: chi2 = n.
    import datetime as dt

    rows = []
    # 2026-08-03 is a Monday, 2026-08-04 a Tuesday
    for i in range(10):
        rows.append((i, dt.datetime(2026, 8, 3, 9), i, "a", 1.0, "{}"))
        rows.append((100 + i, dt.datetime(2026, 8, 4, 9), i, "b", 1.0, "{}"))
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    [r] = QUERIES["type_dow_cramers_v"](spark, str(tmp_path)).collect()
    assert r.n_events == 20
    assert r.chi2 == 20.0
    assert r.cramers_v == 1.0
    ok, detail = compare(
        spark,
        "type_dow_cramers_v",
        QUERIES["type_dow_cramers_v"],
        ORACLES["type_dow_cramers_v"],
        str(tmp_path),
    )
    assert ok, detail


def test_cramers_v_independent_grid_zero(spark, tmp_path):
    # Uniform 2x2 grid: observed == expected in every cell -> chi2 = 0.
    import datetime as dt

    rows = []
    eid = 0
    for day in (3, 4):
        for t in ("a", "b"):
            for _ in range(5):
                rows.append(
                    (eid, dt.datetime(2026, 8, day, 9), eid, t, 1.0, "{}")
                )
                eid += 1
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    [r] = QUERIES["type_dow_cramers_v"](spark, str(tmp_path)).collect()
    assert (r.chi2, r.cramers_v) == (0.0, 0.0)


def test_ks_detects_planted_shift(spark, tmp_path):
    # First-half values {1,2,3,4}, second-half {3,4,5,6}: the CDF gap
    # peaks at 0.5, first reached at v=2 (ties break to the smallest).
    import datetime as dt

    rows = []
    for i, v in enumerate([1.0, 2.0, 3.0, 4.0]):
        rows.append((i, dt.datetime(2026, 5, 1, 9), i, "view", v, "{}"))
    for i, v in enumerate([3.0, 4.0, 5.0, 6.0]):
        rows.append((10 + i, dt.datetime(2026, 5, 3, 9), i, "view", v, "{}"))
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    [r] = QUERIES["value_ks_drift"](spark, str(tmp_path)).collect()
    assert (r.n1, r.n2) == (4, 4)
    assert r.ks_stat == 0.5
    assert r.ks_at == 2.0
    ok, detail = compare(
        spark,
        "value_ks_drift",
        QUERIES["value_ks_drift"],
        ORACLES["value_ks_drift"],
        str(tmp_path),
    )
    assert ok, detail


def test_ks_identical_halves_zero(spark, tmp_path):
    # Same distribution both halves -> D = 0 (and ks_at = the smallest
    # value, where the zero gap is first attained).
    import datetime as dt

    rows = []
    for day in (1, 3):
        for i, v in enumerate([1.0, 2.0, 3.0]):
            rows.append(
                (day * 10 + i, dt.datetime(2026, 5, day, 9), i, "view", v,
                 "{}")
            )
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    [r] = QUERIES["value_ks_drift"](spark, str(tmp_path)).collect()
    assert r.ks_stat == 0.0
    assert r.ks_at == 1.0


def test_anova_planted_separation(spark, tmp_path):
    # Groups a={1,2,3}, b={7,8,9}: means 2 vs 8, grand mean 5.
    # SSB = 3*(2-5)^2 + 3*(8-5)^2 = 54; SSW = 2+2 = 4.
    # F = (54/1) / (4/4) = 54 exactly.
    import datetime as dt

    rows = []
    for i, v in enumerate([1.0, 2.0, 3.0]):
        rows.append((i, dt.datetime(2026, 5, 1, 9), i, "a", v, "{}"))
    for i, v in enumerate([7.0, 8.0, 9.0]):
        rows.append((10 + i, dt.datetime(2026, 5, 1, 9), i, "b", v, "{}"))
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    [r] = QUERIES["value_anova_by_type"](spark, str(tmp_path)).collect()
    assert (r.n_groups, r.n_values) == (2, 6)
    assert r.ss_between == 54.0
    assert r.ss_within == 4.0
    assert r.f_stat == 54.0
    ok, detail = compare(
        spark,
        "value_anova_by_type",
        QUERIES["value_anova_by_type"],
        ORACLES["value_anova_by_type"],
        str(tmp_path),
    )
    assert ok, detail


def test_anova_constant_groups_null_f(spark, tmp_path):
    # Zero within-group variance -> SSW = 0 -> F must be NULL, not inf.
    import datetime as dt

    rows = [
        (0, dt.datetime(2026, 5, 1, 9), 0, "a", 2.0, "{}"),
        (1, dt.datetime(2026, 5, 1, 9), 1, "a", 2.0, "{}"),
        (2, dt.datetime(2026, 5, 1, 9), 2, "b", 5.0, "{}"),
        (3, dt.datetime(2026, 5, 1, 9), 3, "b", 5.0, "{}"),
    ]
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    [r] = QUERIES["value_anova_by_type"](spark, str(tmp_path)).collect()
    assert r.ss_within == 0.0
    assert r.f_stat is None


def _events(tmp_path, rows):
    import pandas as pd

    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")


def test_wilson_known_interval(spark, tmp_path):
    # n=100, k=10 at z=1.96 is the textbook Wilson example:
    # interval ≈ (0.05523, 0.17437) (Brown/Cai/DasGupta 2001, Table 5
    # ballpark; digits recomputed by hand from the closed form).
    import datetime as dt

    rows = []
    for i in range(100):
        rows.append(
            (
                i,
                dt.datetime(2026, 5, 1, 9, 0, i % 60),
                i,
                "error" if i < 10 else "view",
                1.0,
                "{}",
            )
        )
    _events(tmp_path, rows)
    [r] = QUERIES["hourly_error_rate_wilson"](spark, str(tmp_path)).collect()
    assert (r.hr, r.n_events, r.n_errors) == (9, 100, 10)
    assert r.p_hat == 0.1
    assert r.ci_lo == pytest.approx(0.05523, abs=1e-4)
    assert r.ci_hi == pytest.approx(0.17437, abs=1e-4)
    ok, detail = compare(
        spark,
        "hourly_error_rate_wilson",
        QUERIES["hourly_error_rate_wilson"],
        ORACLES["hourly_error_rate_wilson"],
        str(tmp_path),
    )
    assert ok, detail


def test_wilson_zero_errors_stays_in_unit_interval(spark, tmp_path):
    # k=0 — exactly where the Wald interval degenerates to width 0;
    # Wilson keeps a positive upper bound and a (numerically ~0) lower
    # bound inside [0, 1].
    import datetime as dt

    _events(
        tmp_path,
        [
            (i, dt.datetime(2026, 5, 1, 3, 0, i), i, "view", 1.0, "{}")
            for i in range(50)
        ],
    )
    [r] = QUERIES["hourly_error_rate_wilson"](spark, str(tmp_path)).collect()
    assert (r.hr, r.n_errors, r.p_hat) == (3, 0, 0.0)
    assert abs(r.ci_lo) < 1e-12
    assert 0.0 < r.ci_hi < 1.0
    assert r.ci_hi > 0.05  # n=50: upper bound ~0.071, not ~0


def test_spearman_perfect_monotone_is_one(spark, tmp_path):
    _lineitem(
        tmp_path,
        [
            (1, 1, 1, 1, 1.0, 10.0, 0.0),
            (2, 2, 2, 1, 2.0, 20.0, 0.0),
            (3, 3, 3, 1, 3.0, 30.0, 0.0),
            (4, 4, 4, 1, 4.0, 40.0, 0.0),
        ],
    )
    [r] = QUERIES["spearman_qty_price_corr"](spark, str(tmp_path)).collect()
    assert r.n_rows == 4
    assert r.rho == 1.0  # exact: dx == dy ⇒ sqrt of a perfect square
    # separate dir: scoped_persist keys on the semantic plan (same path
    # == same corpus), so an in-place rewrite would serve the cache
    anti = tmp_path / "anti"
    anti.mkdir()
    _lineitem(
        anti,
        [
            (1, 1, 1, 1, 1.0, 40.0, 0.0),
            (2, 2, 2, 1, 2.0, 30.0, 0.0),
            (3, 3, 3, 1, 3.0, 20.0, 0.0),
            (4, 4, 4, 1, 4.0, 10.0, 0.0),
        ],
    )
    [r] = QUERIES["spearman_qty_price_corr"](spark, str(anti)).collect()
    assert r.rho == -1.0
    # lock the negative-sign path of the 2^53-split double conversion
    # (div truncates in Spark, // floors in DuckDB — sign factored out)
    ok, detail = compare(
        spark,
        "spearman_qty_price_corr",
        QUERIES["spearman_qty_price_corr"],
        ORACLES["spearman_qty_price_corr"],
        str(anti),
    )
    assert ok, detail


def test_spearman_tied_ranks_average(spark, tmp_path):
    # qty [1,1,2,2] → avg ranks [1.5,1.5,3.5,3.5]; price [5,7,7,9] →
    # [1,2.5,2.5,4]. Hand algebra on doubled ranks gives ρ = 1/√2.
    _lineitem(
        tmp_path,
        [
            (1, 1, 1, 1, 1.0, 5.0, 0.0),
            (2, 2, 2, 1, 1.0, 7.0, 0.0),
            (3, 3, 3, 1, 2.0, 7.0, 0.0),
            (4, 4, 4, 1, 2.0, 9.0, 0.0),
        ],
    )
    [r] = QUERIES["spearman_qty_price_corr"](spark, str(tmp_path)).collect()
    assert r.rho == pytest.approx(0.7071067811865475, abs=1e-12)
    ok, detail = compare(
        spark,
        "spearman_qty_price_corr",
        QUERIES["spearman_qty_price_corr"],
        ORACLES["spearman_qty_price_corr"],
        str(tmp_path),
    )
    assert ok, detail


def test_kendall_mixed_ties_exact(spark, tmp_path):
    # cells: (1,.01)x2, (2,.02), (3,.01) -> n=4, n0=6
    # concordant: 2x(1,.01)->(2,.02) = 2; discordant: (2,.02)->(3,.01) = 1
    # tx (qty ties) = 1, ty (discount ties: three .01 rows) = 3
    # tau_b = (2-1)/sqrt((6-1)*(6-3)) = 1/sqrt(15)
    rows = [
        (1, 1, 1, 1, 1.0, 10.0, 0.01),
        (2, 2, 1, 1, 1.0, 10.0, 0.01),
        (3, 3, 1, 1, 2.0, 10.0, 0.02),
        (4, 4, 1, 1, 3.0, 10.0, 0.01),
    ]
    _lineitem(tmp_path, rows)
    [r] = QUERIES["kendall_tau_qty_discount"](spark, str(tmp_path)).collect()
    assert r.n_rows == 4
    assert r.concordant == 2.0
    assert r.discordant == 1.0
    assert r.tau_b == pytest.approx(1.0 / 15.0**0.5)
    ok, detail = compare(
        spark,
        "kendall_tau_qty_discount",
        QUERIES["kendall_tau_qty_discount"],
        ORACLES["kendall_tau_qty_discount"],
        str(tmp_path),
    )
    assert ok, detail


def test_kendall_perfect_concordance_is_one(spark, tmp_path):
    rows = [
        (1, 1, 1, 1, 1.0, 10.0, 0.01),
        (2, 2, 1, 1, 2.0, 10.0, 0.02),
        (3, 3, 1, 1, 3.0, 10.0, 0.03),
    ]
    _lineitem(tmp_path, rows)
    [r] = QUERIES["kendall_tau_qty_discount"](spark, str(tmp_path)).collect()
    assert r.tau_b == 1.0


def test_kruskal_wallis_planted_two_groups(spark, tmp_path):
    # a={1,2}, b={3,4}: doubled ranks 2,4 | 6,8 -> R2=6,14;
    # S = floor(36/2)+floor(196/2) = 116; H = 3*116/20 - 15 = 2.4;
    # no ties -> C=1; df=1, chi2_05(1)=3.84 -> not rejected.
    import datetime as dt

    rows = [
        (0, dt.datetime(2026, 5, 1, 9), 0, "a", 1.0, "{}"),
        (1, dt.datetime(2026, 5, 1, 9), 1, "a", 2.0, "{}"),
        (2, dt.datetime(2026, 5, 1, 9), 2, "b", 3.0, "{}"),
        (3, dt.datetime(2026, 5, 1, 9), 3, "b", 4.0, "{}"),
    ]
    _events(tmp_path, rows)
    [r] = QUERIES["value_kruskal_wallis"](spark, str(tmp_path)).collect()
    assert (r.n_groups, r.n_values, r.df) == (2, 4, 1)
    assert r.h_stat == pytest.approx(2.4)
    assert r.tie_correction == 1.0
    assert r.reject_at_05 is False
    ok, detail = compare(
        spark,
        "value_kruskal_wallis",
        QUERIES["value_kruskal_wallis"],
        ORACLES["value_kruskal_wallis"],
        str(tmp_path),
    )
    assert ok, detail


def test_kruskal_wallis_all_tied_null_hadj(spark, tmp_path):
    # Every value identical: tie cube spans all N -> C = 0 -> h_adj NULL
    # (and the uncorrected H collapses to exactly 0).
    import datetime as dt

    rows = [
        (i, dt.datetime(2026, 5, 1, 9), i, t, 7.0, "{}")
        for i, t in enumerate(["a", "a", "b", "b", "b"])
    ]
    _events(tmp_path, rows)
    [r] = QUERIES["value_kruskal_wallis"](spark, str(tmp_path)).collect()
    assert r.h_stat == 0.0
    assert r.tie_correction == 0.0
    assert r.h_adj is None


# --------------------------------------------------------------------------
# E233 population stability index (quarter-bit lattice PSI)
# --------------------------------------------------------------------------

_PSI_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def _psi_events(tmp_path, rows):
    import pandas as _pd

    df = _pd.DataFrame(rows, columns=_PSI_COLS)
    df["ts"] = df["ts"].astype("datetime64[ms]")
    df.to_parquet(tmp_path / "events.parquet")


def test_psi_identical_halves_is_exactly_zero(spark, tmp_path):
    import datetime as dt

    # days 0-3 -> mid = 2; days {0,1} mirror days {2,3} exactly, so
    # every p_i == q_i and the lattice difference is identically 0.
    rows = []
    eid = 0
    for day in (0, 1, 2, 3):
        for etype, val in (("click", 1.0), ("view", 8.0), ("click", 8.0)):
            eid += 1
            rows.append(
                (eid, dt.datetime(1992, 1, 1 + day), 1, etype, val, "{}")
            )
    _psi_events(tmp_path, rows)
    out = {r.feature: r for r in QUERIES["event_feature_psi"](
        spark, str(tmp_path)).collect()}
    assert out["event_type"].psi == 0.0
    assert out["value_log2"].psi == 0.0
    assert out["event_type"].n_bins == 2
    # values 1.0 and 8.0 -> BIN(2)='10' (len 2), BIN(9)='1001' (len 4)
    assert out["value_log2"].n_bins == 2
    ok, detail = compare(
        spark,
        "event_feature_psi",
        QUERIES["event_feature_psi"],
        ORACLES["event_feature_psi"],
        str(tmp_path),
    )
    assert ok, detail


def test_psi_hard_shift_crosses_refit_threshold_within_lattice_error(
    spark, tmp_path
):
    import datetime as dt
    import math

    # half A: 40x click; half B: 40x view — a total mix swap.
    rows = []
    eid = 0
    for day, etype in ((0, "click"), (2, "view")):
        for _ in range(40):
            eid += 1
            rows.append(
                (eid, dt.datetime(1992, 1, 1 + day), 1, etype, 1.0, "{}")
            )
    _psi_events(tmp_path, rows)
    out = {r.feature: r for r in QUERIES["event_feature_psi"](
        spark, str(tmp_path)).collect()}
    got = out["event_type"].psi
    # ground truth with real logs (Laplace +1, totals 42 each):
    # bins: click (41/42 vs 1/42), view (1/42 vs 41/42)
    p, q = 41 / 42, 1 / 42
    true_psi = 2 * (p - q) * math.log(p / q)
    # lattice error bound: per bin two chains at <1/4 bit each + mantissa
    # slack, times |p - q|, in nats
    bound = 2 * abs(p - q) * (0.5 * math.log(2)) + 1e-6
    assert abs(got - true_psi) <= bound
    assert got > 0.25  # the industry "re-fit" threshold
    ok, detail = compare(
        spark,
        "event_feature_psi",
        QUERIES["event_feature_psi"],
        ORACLES["event_feature_psi"],
        str(tmp_path),
    )
    assert ok, detail


# --------------------------------------------------------------------------
# E241 group-sequential O'Brien-Fleming monitoring
# --------------------------------------------------------------------------


def test_obf_extreme_effect_crosses_at_first_look(spark, tmp_path):
    import datetime as dt

    # 30 even-id users all convert on day 0, 30 odd-id users never do:
    # z^2 = 1 / (0.25 * (2/30)) = 60 >> 20.81, so the FIRST look already
    # crosses; later looks stay crossed but only look 1 is the stop.
    rows = []
    eid = 0
    for u in range(0, 60, 2):
        eid += 1
        rows.append((eid, dt.datetime(1992, 1, 1), u, "purchase", 1.0, "{}"))
    for u in range(1, 60, 2):
        eid += 1
        rows.append((eid, dt.datetime(1992, 1, 1), u, "view", 1.0, "{}"))
    eid += 1
    rows.append((eid, dt.datetime(1992, 1, 5), 1, "view", 1.0, "{}"))
    _psi_events(tmp_path, rows)
    out = {r.look: r for r in QUERIES["ab_sequential_obf"](
        spark, str(tmp_path)).collect()}
    assert len(out) == 5
    assert out[1].crossed and out[1].is_first_crossing
    assert out[2].crossed and not out[2].is_first_crossing
    assert (out[1].n_a, out[1].conv_a, out[1].n_b, out[1].conv_b) == (
        30, 30, 30, 0)
    assert abs(out[1].z2 - 60.0) < 1e-9
    ok, detail = compare(
        spark,
        "ab_sequential_obf",
        QUERIES["ab_sequential_obf"],
        ORACLES["ab_sequential_obf"],
        str(tmp_path),
    )
    assert ok, detail


def test_obf_degenerate_pool_never_crosses(spark, tmp_path):
    import datetime as dt

    # everyone converts -> pooled rate 1 -> z^2 NULL -> crossed FALSE
    rows = [
        (u + 1, dt.datetime(1992, 1, 1 + (u % 3)), u, "purchase", 1.0, "{}")
        for u in range(8)
    ]
    _psi_events(tmp_path, rows)
    out = QUERIES["ab_sequential_obf"](spark, str(tmp_path)).collect()
    assert all(not r.crossed and not r.is_first_crossing for r in out)
    assert all(r.z2 is None for r in out)
    ok, detail = compare(
        spark,
        "ab_sequential_obf",
        QUERIES["ab_sequential_obf"],
        ORACLES["ab_sequential_obf"],
        str(tmp_path),
    )
    assert ok, detail
