"""As-of join and range join semantics on planted frames (oracle parity at
sf0.01 is covered by the driver gate; these pin the edge semantics)."""

from __future__ import annotations

import datetime as dt

from tdk_apache_log_etl_spark.operators.temporal import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [
            (1, 100, _ts("2024-01-10T12:00:00")),   # after both orders
            (2, 100, _ts("2024-01-05T00:00:00")),   # exactly at order 2 (tie → match)
            (3, 100, _ts("2024-01-01T00:00:00")),   # before all orders
            (4, 200, _ts("2024-01-10T00:00:00")),   # user with no orders
        ],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [
            (100, _ts("2024-01-03T00:00:00"), 31, 10.0),
            (100, _ts("2024-01-05T00:00:00"), 32, 20.0),
        ],
        ["user_id", "o_orderdate", "o_orderkey", "o_totalprice"],
    )
    out = asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="o_orderdate",
        right_cols=["o_orderkey", "o_totalprice"],
    )
    got = {r.event_id: (r.o_orderkey, r.o_totalprice) for r in out.collect()}
    assert got[1] == (32, 20.0)      # latest order before the event
    assert got[2] == (32, 20.0)      # <= semantics: same-instant order matches
    assert got[3] == (None, None)    # nothing at-or-before
    assert got[4] == (None, None)    # key absent on the right
    assert len(got) == 4             # every left row preserved


def test_asof_join_preserves_null_attribute_of_matched_row(spark):
    # The matched right row carries a legitimately-NULL attribute: the join
    # must return NULL for it, not smear the previous row's non-null value
    # (the failure mode of a per-column last(ignorenulls) carry).
    left = spark.createDataFrame(
        [(1, 100, _ts("2024-01-10T12:00:00"))], ["event_id", "user_id", "ts"]
    )
    right = spark.createDataFrame(
        [
            (100, _ts("2024-01-03T00:00:00"), 31, 10.0),
            (100, _ts("2024-01-05T00:00:00"), 32, None),  # latest match
        ],
        ["user_id", "o_orderdate", "o_orderkey", "o_totalprice"],
    )
    out = asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="o_orderdate",
        right_cols=["o_orderkey", "o_totalprice"],
    )
    r = out.collect()[0]
    assert r.o_orderkey == 32
    assert r.o_totalprice is None  # NOT 10.0 from the older row


def test_range_join_window_bounds(spark):
    import pyspark.sql.functions as F

    from tdk_apache_log_etl_spark.operators import QUERIES

    rows = QUERIES["range_join_click_purchase"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert all(0 < r.lag_seconds <= 1800 for r in rows)


def test_span_union_merges_overlaps_and_counts_islands(spark, tmp_path):
    # Customer 1: orders on day 0 and day 10 (windows overlap -> one
    # 40-day island), plus day 100 (separate 30-day island). Customer 2:
    # two orders the SAME day (full overlap -> one 30-day island).
    import datetime as dt

    import pandas as pd

    from tdk_apache_log_etl_spark.operators import ORACLES, QUERIES

    from .parity import compare

    rows = [
        (1, 1, dt.datetime(2026, 1, 1), 10.0),
        (2, 1, dt.datetime(2026, 1, 11), 10.0),
        (3, 1, dt.datetime(2026, 4, 11), 10.0),
        (4, 2, dt.datetime(2026, 2, 1), 10.0),
        (5, 2, dt.datetime(2026, 2, 1), 10.0),
    ]
    df = pd.DataFrame(
        rows,
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    df["o_orderdate"] = df["o_orderdate"].astype("datetime64[ms]")
    df.to_parquet(tmp_path / "orders.parquet")
    out = {
        r.custkey: r
        for r in QUERIES["customer_order_span_union"](
            spark, str(tmp_path)
        ).collect()
    }
    assert (out[1].n_intervals, out[1].n_islands, out[1].days_covered) == (
        3, 2, 70,
    )
    assert (out[2].n_intervals, out[2].n_islands, out[2].days_covered) == (
        2, 1, 30,
    )
    ok, detail = compare(
        spark,
        "customer_order_span_union",
        QUERIES["customer_order_span_union"],
        ORACLES["customer_order_span_union"],
        str(tmp_path),
    )
    assert ok, detail
