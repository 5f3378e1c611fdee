"""Planted-fixture pins for the round-4 table-stats / layout pack and
adjacent additions (E225-E231, E234 Bollinger, E236 replay watermark,
E240 LPM routing, E245 join skew).

Every test hand-computes the expected answer on a fixture small enough to
verify by eye, asserts it, and then runs the driver-predictive DuckDB
parity compare on the same fixture."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from tdk_apache_log_etl_spark.operators import ORACLES, QUERIES
from tdk_apache_log_etl_spark.operators.tablestats import ZONE_ROWS

from .parity import compare


def _write_events(tmp_path, rows):
    df = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    df["ts"] = df["ts"].astype("datetime64[ms]")
    df.to_parquet(tmp_path / "events.parquet")


def _parity(spark, name, tmp_path):
    ok, detail = compare(
        spark, name, QUERIES[name], ORACLES[name], str(tmp_path)
    )
    assert ok, detail


# --------------------------------------------------------------------------
# E228 zone-map pruning audit
# --------------------------------------------------------------------------


def test_zonemap_sorted_layout_prunes_unsorted_does_not(spark, tmp_path):
    # 3 * ZONE_ROWS orders; the year CYCLES with the orderkey, so every
    # as-stored zone contains all three years (no pruning possible),
    # while the date-sorted layout puts each year in exactly one zone.
    n = 3 * ZONE_ROWS
    rows = [
        (k, 7, dt.datetime(1995 + (k % 3), 1, 1))
        for k in range(n)
    ]
    df = pd.DataFrame(rows, columns=["o_orderkey", "o_custkey", "o_orderdate"])
    df["o_orderdate"] = df["o_orderdate"].astype("datetime64[ms]")
    df.to_parquet(tmp_path / "orders.parquet")
    out = {
        (r.layout, r.probe_year): r
        for r in QUERIES["zonemap_prune_audit"](spark, str(tmp_path)).collect()
    }
    # probes 1998-2000 match nothing -> dropped; 2 layouts x 3 years remain
    assert len(out) == 6
    for y in (1995, 1996, 1997):
        stored = out[("as_stored", y)]
        assert stored.zones_total == 3
        assert stored.zones_hit == 3            # every zone spans all years
        assert stored.rows_scanned == n
        assert stored.rows_matched == ZONE_ROWS
        assert stored.read_amplification == 3.0
        srt = out[("date_sorted", y)]
        assert srt.zones_total == 3
        assert srt.zones_hit == 1               # one year per zone
        assert srt.rows_scanned == ZONE_ROWS
        assert srt.read_amplification == 1.0
    _parity(spark, "zonemap_prune_audit", tmp_path)


# --------------------------------------------------------------------------
# E229 NDV / null / bounds column profile
# --------------------------------------------------------------------------


def test_ndv_profile_hand_computed(spark, tmp_path):
    df = pd.DataFrame(
        {
            "o_orderkey": pd.array([1, 2, 3, 4], dtype="Int64"),
            "o_custkey": pd.array([7, 7, None, 9], dtype="Int64"),
            "o_orderstatus": ["O", "F", "O", "O"],
            "o_totalprice": [10.5, 10.5, 20.0, None],
            "o_orderdate": pd.to_datetime(
                ["1995-01-01", "1995-01-01", "1996-01-01", None]
            ),
            "o_orderpriority": ["1-URGENT"] * 4,
        }
    )
    df["o_orderdate"] = df["o_orderdate"].astype("datetime64[ms]")
    df.to_parquet(tmp_path / "orders.parquet")
    out = {
        r.column_name: r
        for r in QUERIES["orders_ndv_profile"](spark, str(tmp_path)).collect()
    }
    assert len(out) == 6
    assert (out["o_orderkey"].ndv, out["o_orderkey"].n_nulls) == (4, 0)
    assert (out["o_orderkey"].min_num, out["o_orderkey"].max_num) == (1.0, 4.0)
    assert (out["o_custkey"].ndv, out["o_custkey"].n_nulls) == (2, 1)
    assert (out["o_custkey"].min_num, out["o_custkey"].max_num) == (7.0, 9.0)
    assert (out["o_orderstatus"].ndv, out["o_orderstatus"].n_nulls) == (2, 0)
    assert out["o_orderstatus"].min_num is None
    assert (out["o_totalprice"].ndv, out["o_totalprice"].n_nulls) == (2, 1)
    assert out["o_totalprice"].max_num == 20.0
    assert (out["o_orderdate"].ndv, out["o_orderdate"].n_nulls) == (2, 1)
    assert (out["o_orderpriority"].ndv, out["o_orderpriority"].n_nulls) == (
        1,
        0,
    )
    _parity(spark, "orders_ndv_profile", tmp_path)


# --------------------------------------------------------------------------
# E225 OHLC hourly bars
# --------------------------------------------------------------------------


def test_ohlc_open_close_ties_and_extrema(spark, tmp_path):
    h = dt.datetime(2024, 3, 1, 10, 0, 0)
    _write_events(
        tmp_path,
        [
            # same-ts open tie -> event_id 1 wins
            (1, h + dt.timedelta(seconds=5), 1, "view", 5.0, "{}"),
            (2, h + dt.timedelta(seconds=5), 1, "view", 9.0, "{}"),
            (3, h + dt.timedelta(minutes=59), 1, "view", 1.0, "{}"),
            # second hour, single event: open==close==high==low
            (4, h + dt.timedelta(hours=1), 2, "view", 4.0, "{}"),
            # other type shares hour 10 but is its own bar
            (5, h + dt.timedelta(seconds=1), 2, "click", 2.0, "{}"),
        ],
    )
    out = {
        (r.event_type, r.hour_ts): r
        for r in QUERIES["events_value_ohlc_hourly"](
            spark, str(tmp_path)
        ).collect()
    }
    bar = out[("view", h)]
    assert bar.open_value == 5.0
    assert bar.high_value == 9.0
    assert bar.low_value == 1.0
    assert bar.close_value == 1.0
    assert bar.n_events == 3
    one = out[("view", h + dt.timedelta(hours=1))]
    assert (
        one.open_value,
        one.high_value,
        one.low_value,
        one.close_value,
        one.n_events,
    ) == (4.0, 4.0, 4.0, 4.0, 1)
    assert out[("click", h)].open_value == 2.0
    _parity(spark, "events_value_ohlc_hourly", tmp_path)


# --------------------------------------------------------------------------
# E226 exact Shapley attribution
# --------------------------------------------------------------------------


def test_shapley_unanimity_closed_form(spark, tmp_path):
    t = dt.datetime(2024, 3, 1, 10, 0, 0)
    m = dt.timedelta(minutes=1)
    _write_events(
        tmp_path,
        [
            # user 1 touches {click, view} before purchase; the post-
            # purchase error must NOT earn credit
            (1, t, 1, "click", 1.0, "{}"),
            (2, t + m, 1, "view", 1.0, "{}"),
            (3, t + 2 * m, 1, "purchase", 1.0, "{}"),
            (4, t + 3 * m, 1, "error", 1.0, "{}"),
            # user 2 touches {view} only -> full credit to view
            (5, t, 2, "view", 1.0, "{}"),
            (6, t + m, 2, "purchase", 1.0, "{}"),
            # user 3 converts organically (no prior touches) -> no credit
            (7, t, 3, "purchase", 1.0, "{}"),
            # user 4 never converts -> no credit
            (8, t, 4, "click", 1.0, "{}"),
        ],
    )
    out = {
        r.channel: r
        for r in QUERIES["shapley_attribution"](spark, str(tmp_path)).collect()
    }
    assert set(out) == {"click", "view"}
    assert (out["click"].n_users, out["click"].credit_60ths) == (1, 30)
    assert out["click"].shapley_conversions == 0.5
    assert (out["view"].n_users, out["view"].credit_60ths) == (2, 90)
    assert out["view"].shapley_conversions == 1.5
    _parity(spark, "shapley_attribution", tmp_path)


# --------------------------------------------------------------------------
# E227 Hodges-Lehmann estimator
# --------------------------------------------------------------------------


def test_hodges_lehmann_hand_computed_even(spark, tmp_path):
    # values 1, 2, 9 -> Walsh averages {1, 1.5, 2, 5, 5.5, 9}; N = 6,
    # median = (2 + 5) / 2 = 3.5.  The classical estimator absorbs the
    # 9-outlier (mean would be 4.0, median 2.0).
    t = dt.datetime(2024, 3, 1)
    _write_events(
        tmp_path,
        [
            (1, t, 1, "view", 1.0, "{}"),
            (2, t, 1, "view", 2.0, "{}"),
            (3, t, 1, "view", 9.0, "{}"),
        ],
    )
    row = QUERIES["hodges_lehmann_value"](spark, str(tmp_path)).collect()[0]
    assert row.n_rows == 3
    assert row.n_walsh == 6.0
    assert row.hl_estimate == 3.5
    _parity(spark, "hodges_lehmann_value", tmp_path)


def test_hodges_lehmann_odd_and_duplicates(spark, tmp_path):
    # values 1, 1 -> Walsh multiset {1 (x3)}; N = n(n+1)/2 = 3, hl = 1.
    # duplicate cells exercise the diagonal c(c+1)/2 weight.
    t = dt.datetime(2024, 3, 1)
    _write_events(
        tmp_path,
        [
            (1, t, 1, "view", 1.0, "{}"),
            (2, t, 1, "view", 1.0, "{}"),
        ],
    )
    row = QUERIES["hodges_lehmann_value"](spark, str(tmp_path)).collect()[0]
    assert (row.n_rows, row.n_walsh, row.hl_estimate) == (2, 3.0, 1.0)
    _parity(spark, "hodges_lehmann_value", tmp_path)


# --------------------------------------------------------------------------
# E230 Haar multi-resolution decomposition
# --------------------------------------------------------------------------


def test_haar_hand_computed(spark, tmp_path):
    # revenue 1.00 / 3.00 / 5.00 on the first three days of the epoch:
    # L1: block0 total 400c detail -200c, block1 total 500c detail +500c
    # L2: block0 total 900c detail (100+300)-(500) = -100c
    # L3: block0 total 900c detail +900c (right half empty = zero-fill)
    rows = [
        (1, 7, 1.00, dt.datetime(1992, 1, 1)),
        (2, 7, 3.00, dt.datetime(1992, 1, 2)),
        (3, 7, 5.00, dt.datetime(1992, 1, 3)),
    ]
    df = pd.DataFrame(
        rows, columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]
    )
    df["o_orderdate"] = df["o_orderdate"].astype("datetime64[ms]")
    df.to_parquet(tmp_path / "orders.parquet")
    out = {
        (r.level, r.block): (r.total_cents, r.detail_cents)
        for r in QUERIES["daily_revenue_haar"](spark, str(tmp_path)).collect()
    }
    assert out == {
        (1, 0): (400, -200),
        (1, 1): (500, 500),
        (2, 0): (900, -100),
        (3, 0): (900, 900),
    }
    _parity(spark, "daily_revenue_haar", tmp_path)


# --------------------------------------------------------------------------
# E231 MV rewrite, driver-contract form
# --------------------------------------------------------------------------


def test_mv_rewrite_query_matches_direct(spark, tmp_path):
    rows = [
        (1, 7, "O", 10.25, dt.datetime(1995, 1, 3)),
        (2, 7, "O", 20.00, dt.datetime(1995, 1, 9)),
        (3, 7, "F", 30.00, dt.datetime(1995, 2, 3)),
    ]
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
    df.to_parquet(tmp_path / "orders.parquet")
    out = {
        (r.month, r.status): r
        for r in QUERIES["mv_monthly_revenue_rewrite"](
            spark, str(tmp_path)
        ).collect()
    }
    jan_o = out[(dt.datetime(1995, 1, 1), "O")]
    assert jan_o.rev_cents == 3025
    assert jan_o.n_orders == 2
    assert jan_o.avg_cents == 1512.5
    _parity(spark, "mv_monthly_revenue_rewrite", tmp_path)


# --------------------------------------------------------------------------
# E234 Bollinger bands
# --------------------------------------------------------------------------


def test_bollinger_breach_and_range_frame(spark, tmp_path):
    # five 10.00 days then a 100.00 spike: z = 75/33.54... = sqrt(5) > 2
    # -> breach. An order 30 days later sits OUTSIDE the 20-day RANGE
    # frame of everything before it (a ROWS frame would wrongly include
    # the history).
    rows = [(k, 7, 10.0, dt.datetime(1995, 1, 1 + k)) for k in range(5)]
    rows.append((5, 7, 100.0, dt.datetime(1995, 1, 6)))
    rows.append((6, 7, 50.0, dt.datetime(1995, 2, 20)))
    df = pd.DataFrame(
        rows, columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]
    )
    df["o_orderdate"] = df["o_orderdate"].astype("datetime64[ms]")
    df.to_parquet(tmp_path / "orders.parquet")
    out = {
        r.day.isoformat(): r
        for r in QUERIES["daily_revenue_bollinger"](
            spark, str(tmp_path)
        ).collect()
    }
    assert len(out) == 7
    d5 = out["1995-01-05"]
    assert (d5.n_window, d5.sma, d5.breach) == (5, 10.0, False)
    spike = out["1995-01-06"]
    assert spike.n_window == 6
    assert spike.sma == 25.0
    assert spike.breach  # z = sqrt(5) = 2.236 > 2
    assert spike.upper_band < 100.0
    gap = out["1995-02-20"]
    assert gap.n_window == 1  # RANGE frame: 45 days later, empty window
    assert gap.sma == 50.0 and not gap.breach
    _parity(spark, "daily_revenue_bollinger", tmp_path)


# --------------------------------------------------------------------------
# E235 functional-dependency audit
# --------------------------------------------------------------------------


def test_fd_audit_holds_and_refutes(spark, tmp_path):
    rows = [
        # custkey 1 violates custkey->status (O and F); custkey 2 clean;
        # both days carry two priorities -> date->priority violated twice
        (1, 1, "O", 10.0, dt.datetime(1995, 1, 1), "1-URGENT"),
        (2, 1, "F", 10.0, dt.datetime(1995, 1, 1), "2-HIGH"),
        (3, 2, "O", 10.0, dt.datetime(1995, 1, 2), "1-URGENT"),
        (4, 2, "O", 10.0, dt.datetime(1995, 1, 2), "2-HIGH"),
    ]
    df = pd.DataFrame(
        rows,
        columns=[
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ],
    )
    df["o_orderdate"] = df["o_orderdate"].astype("datetime64[ms]")
    df.to_parquet(tmp_path / "orders.parquet")
    out = {
        (r.lhs, r.rhs): r
        for r in QUERIES["orders_fd_audit"](spark, str(tmp_path)).collect()
    }
    pk = out[("o_orderkey", "o_custkey")]
    assert (pk.n_groups, pk.n_violating, pk.holds) == (4, 0, True)
    cs = out[("o_custkey", "o_orderstatus")]
    assert (cs.n_groups, cs.n_violating, cs.max_rhs_distinct, cs.holds) == (
        2,
        1,
        2,
        False,
    )
    dp = out[("o_orderdate", "o_orderpriority")]
    assert (dp.n_groups, dp.n_violating, dp.holds) == (2, 2, False)
    _parity(spark, "orders_fd_audit", tmp_path)


# --------------------------------------------------------------------------
# E236 replay watermark audit
# --------------------------------------------------------------------------


def test_replay_watermark_hand_computed(spark, tmp_path):
    # arrival order 1..5 with event days 3,1,2,5,4 -> running max
    # 3,3,3,5,5 -> lateness 0,2,1,0,1: n_late=3, sorted [0,0,1,1,2],
    # p50 = 1.0, p95 = 1.8 (pos 3.8), p99 = 1.96, max = 2.0
    days = [3, 1, 2, 5, 4]
    rows = [
        (k + 1, 7, 10.0, dt.datetime(1995, 1, d)) for k, d in enumerate(days)
    ]
    df = pd.DataFrame(
        rows, columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]
    )
    df["o_orderdate"] = df["o_orderdate"].astype("datetime64[ms]")
    df.to_parquet(tmp_path / "orders.parquet")
    r = QUERIES["replay_watermark_audit"](spark, str(tmp_path)).collect()[0]
    assert (r.n_rows, r.n_late) == (5, 3)
    assert r.p50_late_days == 1.0
    assert abs(r.p95_late_days - 1.8) < 1e-12
    assert abs(r.p99_late_days - 1.96) < 1e-12
    assert r.max_late_days == 2.0
    _parity(spark, "replay_watermark_audit", tmp_path)


def test_replay_watermark_sorted_table_is_zero(spark, tmp_path):
    # a perfectly date-clustered table needs no watermark at all
    rows = [
        (k, 7, 10.0, dt.datetime(1995, 1, 1 + k)) for k in range(6)
    ]
    df = pd.DataFrame(
        rows, columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]
    )
    df["o_orderdate"] = df["o_orderdate"].astype("datetime64[ms]")
    df.to_parquet(tmp_path / "orders.parquet")
    r = QUERIES["replay_watermark_audit"](spark, str(tmp_path)).collect()[0]
    assert (r.n_late, r.max_late_days) == (0, 0.0)
    _parity(spark, "replay_watermark_audit", tmp_path)


# --------------------------------------------------------------------------
# E240 longest-prefix-match routing
# --------------------------------------------------------------------------


def test_lpm_prefers_most_specific_route(spark, tmp_path):
    t = dt.datetime(2024, 3, 1, 10, 0, 0)
    _write_events(
        tmp_path,
        [
            # user 42 -> 10.0.42.x -> canary /24 beats /17? (42 < 128,
            # so /17 doesn't even match) and beats /16 and /8 by length
            (1, t, 42, "view", 1.0, "{}"),
            # user 200 -> 10.0.200.x -> dc-east-hi /17 beats /16
            (2, t, 200, "view", 1.0, "{}"),
            # user 5 -> 10.0.5.x -> only /16 and /8 match -> dc-east
            (3, t, 5, "view", 1.0, "{}"),
            (4, t, 5, "view", 1.0, "{}"),
        ],
    )
    out = {
        r.route: r
        for r in QUERIES["ip_longest_prefix_route"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(out) == {"canary", "dc-east-hi", "dc-east"}
    assert (out["canary"].prefix_len, out["canary"].n_requests) == (24, 1)
    assert (out["dc-east-hi"].prefix_len, out["dc-east-hi"].n_requests) == (
        17,
        1,
    )
    assert (out["dc-east"].prefix_len, out["dc-east"].n_ips,
            out["dc-east"].n_requests) == (16, 2, 2)
    _parity(spark, "ip_longest_prefix_route", tmp_path)


# --------------------------------------------------------------------------
# E245 join skew report
# --------------------------------------------------------------------------


def test_join_skew_flags_hot_key(spark, tmp_path):
    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3],
            "o_custkey": [7, 7, 7],
            "o_orderdate": pd.to_datetime(["1995-01-01"] * 3),
        }
    )
    orders["o_orderdate"] = orders["o_orderdate"].astype("datetime64[ms]")
    orders.to_parquet(tmp_path / "orders.parquet")
    pd.DataFrame(
        {
            "l_orderkey": [1] * 8 + [2, 3],
            "l_partkey": list(range(10)),
        }
    ).to_parquet(tmp_path / "lineitem.parquet")
    rows = QUERIES["join_skew_report"](spark, str(tmp_path)).collect()
    assert rows[0].join_key == 1
    assert (rows[0].left_rows, rows[0].right_rows, rows[0].out_rows) == (
        8, 1, 8)
    assert rows[0].output_share == 0.8
    assert abs(rows[0].skew_ratio - 2.4) < 1e-12  # 8 / (10/3)
    assert len(rows) == 3
    _parity(spark, "join_skew_report", tmp_path)
