"""Partition retention expiry and row-level (GDPR) erasure: only affected
partitions may be touched, and full-partition erasure must leave no files
behind."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from tdk_apache_log_etl_spark.sinks.staging import (
    delete_user_rows,
    expire_partitions,
    read_staging,
    write_staging,
)


def _frame(spark, date, user_ids):
    return spark.createDataFrame(
        [(f"10.0.0.{u}", u) for u in user_ids], "ip_address string, user_id long"
    ).select(
        "ip_address",
        F.lit(None).cast("double").alias("rfc_1413_identity"),
        "user_id",
        F.lit("2026-08-14T00:00:00").cast("timestamp_ntz").alias("time"),
        F.lit(200).cast("long").alias("status_code"),
        F.lit(10).cast("long").alias("size"),
        F.lit(None).cast("string").alias("referer"),
        F.lit("ua").alias("user_agent"),
        F.lit("GET").alias("request_method"),
        F.lit("/r").alias("request_resource"),
        F.lit("HTTP/1.1").alias("request_protocol"),
        F.lit(date).alias("date"),
    )


def _mtimes(path):
    out = {}
    for entry in os.listdir(path):
        if entry.startswith("date="):
            d = os.path.join(path, entry)
            out[entry] = {
                f: os.path.getmtime(os.path.join(d, f))
                for f in os.listdir(d)
                if f.endswith(".parquet")
            }
    return out


def test_expire_partitions_drops_only_older(spark, tmp_path):
    path = str(tmp_path / "staging")
    for d in ["2026-08-10", "2026-08-11", "2026-08-12"]:
        write_staging(_frame(spark, d, [1, 2]), path)
    expired = expire_partitions(path, keep_after="2026-08-12")
    assert expired == ["2026-08-10", "2026-08-11"]
    assert sorted(
        e for e in os.listdir(path) if e.startswith("date=")
    ) == ["date=2026-08-12"]
    assert read_staging(spark, path).count() == 2


def test_delete_user_rows_rewrites_only_affected_partitions(spark, tmp_path):
    path = str(tmp_path / "staging")
    write_staging(_frame(spark, "2026-08-10", [1, 2, 3]), path)
    write_staging(_frame(spark, "2026-08-11", [4, 5]), path)
    write_staging(_frame(spark, "2026-08-12", [1, 6]), path)
    before = _mtimes(path)

    n = delete_user_rows(spark, path, [1])
    assert n == 2  # only the two partitions containing user 1

    after = _mtimes(path)
    # the untouched partition's files are byte-for-byte the same objects
    assert after["date=2026-08-11"] == before["date=2026-08-11"]
    assert after["date=2026-08-10"] != before["date=2026-08-10"]

    remaining = read_staging(spark, path)
    assert remaining.where(F.col("user_id") == 1).count() == 0
    assert remaining.count() == 5  # 2+2+1 rows survive


def test_delete_user_rows_removes_fully_erased_partition(spark, tmp_path):
    # date=2026-08-11 contains ONLY the target user: dynamic overwrite
    # writes nothing for it, so the directory must be removed explicitly
    # — lingering files would be silent erasure failure.
    path = str(tmp_path / "staging")
    write_staging(_frame(spark, "2026-08-10", [1, 2]), path)
    write_staging(_frame(spark, "2026-08-11", [7]), path)
    delete_user_rows(spark, path, [7])
    assert "date=2026-08-11" not in os.listdir(path)
    assert read_staging(spark, path).count() == 2


def test_delete_user_rows_noop_when_absent(spark, tmp_path):
    path = str(tmp_path / "staging")
    write_staging(_frame(spark, "2026-08-10", [1, 2]), path)
    before = _mtimes(path)
    assert delete_user_rows(spark, path, [999]) == 0
    assert delete_user_rows(spark, path, []) == 0
    assert _mtimes(path) == before


def test_holt_closed_form_planted(spark, tmp_path):
    # y = [2, 4, 6] with α=β=½: l=[2, 3, 4.75], b=[0, 0.5, 1.125];
    # forecasts 4.75 + h·1.125. One order per month plants the series.
    import datetime as dt

    import pandas as pd

    from tdk_apache_log_etl_spark.operators import ORACLES, QUERIES

    from .parity import compare

    rows = [
        (1, 1, "O", 2.0, dt.datetime(2026, 1, 15), "1-URGENT"),
        (2, 1, "O", 4.0, dt.datetime(2026, 2, 15), "1-URGENT"),
        (3, 1, "O", 6.0, dt.datetime(2026, 3, 15), "1-URGENT"),
    ]
    df = pd.DataFrame(
        rows,
        columns=["o_orderkey", "o_custkey", "o_orderstatus",
                 "o_totalprice", "o_orderdate", "o_orderpriority"],
    )
    df["o_orderdate"] = df["o_orderdate"].astype("datetime64[ms]")
    df.to_parquet(tmp_path / "orders.parquet")
    got = {
        r.month_index: r
        for r in QUERIES["monthly_revenue_holt"](
            spark, str(tmp_path)
        ).collect()
    }
    assert (got[1].level, got[1].trend) == (2.0, 0.0)
    assert (got[2].level, got[2].trend) == (3.0, 0.5)
    assert (got[3].level, got[3].trend) == (4.75, 1.125)
    for h in range(1, 8):
        f = got[3 + h]
        assert f.is_forecast and f.revenue is None
        assert f.level == 4.75 + h * 1.125 and f.trend == 1.125
    ok, detail = compare(
        spark,
        "monthly_revenue_holt",
        QUERIES["monthly_revenue_holt"],
        ORACLES["monthly_revenue_holt"],
        str(tmp_path),
    )
    assert ok, detail


def test_km_survival_planted_censoring(spark, tmp_path):
    # corpus end = day 30. u1 (t=2) and u4 (t=2) churn, u2 churns at
    # t=5, u3 and u5 right-censored at t=30. By hand:
    # S(2)=1·(1−2/5)=0.6, S(5)=0.6·(1−1/3)=0.4, S(30)=0.4·(1−0/2)=0.4.
    import datetime as dt

    import pandas as pd

    from tdk_apache_log_etl_spark.operators import ORACLES, QUERIES

    from .parity import compare

    base = dt.datetime(2026, 1, 1, 12)
    day = dt.timedelta(days=1)
    rows, eid = [], 0

    def ev(uid, d):
        nonlocal eid
        eid += 1
        rows.append((eid, base + d * day, uid, "view", 1.0, "{}"))

    for d in (0, 1, 2):
        ev(1, d)
    for d in (0, 3, 5):
        ev(2, d)
    for d in (0, 10, 25):
        ev(3, d)
    for d in (10, 12):
        ev(4, d)
    for d in (0, 15, 30):
        ev(5, d)  # anchors corpus end at day 30
    df = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value",
                 "props"],
    )
    df["ts"] = df["ts"].astype("datetime64[ms]")
    df.to_parquet(tmp_path / "events.parquet")
    got = {
        r.t: r
        for r in QUERIES["retention_survival_km"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(got) == {2, 5, 30}
    assert (got[2].n_at_risk, got[2].d_churned, got[2].c_censored) == (5, 2, 0)
    assert (got[5].n_at_risk, got[5].d_churned) == (3, 1)
    assert (got[30].n_at_risk, got[30].c_censored) == (2, 2)
    assert got[2].survival == 0.6
    assert abs(got[5].survival - 0.4) < 1e-15
    assert got[30].survival == got[5].survival  # censoring moves nothing
    ok, detail = compare(
        spark,
        "retention_survival_km",
        QUERIES["retention_survival_km"],
        ORACLES["retention_survival_km"],
        str(tmp_path),
    )
    assert ok, detail


def test_seasonal_index_planted_july_spike(spark, tmp_path):
    # three flat years at 120/month except July = 240: July's index must
    # be the highest and match the exact integer-arithmetic reference.
    import datetime as dt

    import pandas as pd

    from tdk_apache_log_etl_spark.operators import ORACLES, QUERIES

    from .parity import compare

    rows, k = [], 0
    series = []
    for y in (2024, 2025, 2026):
        for m in range(1, 13):
            v = 240.0 if m == 7 else 120.0
            series.append((m, v))
            k += 1
            rows.append((k, 1, "O", v, dt.datetime(y, m, 15), "1-URGENT"))
    df = pd.DataFrame(
        rows,
        columns=["o_orderkey", "o_custkey", "o_orderstatus",
                 "o_totalprice", "o_orderdate", "o_orderpriority"],
    )
    df["o_orderdate"] = df["o_orderdate"].astype("datetime64[ms]")
    df.to_parquet(tmp_path / "orders.parquet")
    # pure-python reference with the same scaled-int arithmetic
    sc = [int(v * 10000 + 0.5) for _, v in series]
    n = len(sc)
    num: dict[int, int] = {}
    den: dict[int, int] = {}
    for t in range(6, n - 6):
        cma24 = sc[t - 6] + sc[t + 6] + 2 * sum(sc[t - 5 : t + 6])
        moy = series[t][0]
        num[moy] = num.get(moy, 0) + 24 * sc[t]
        den[moy] = den.get(moy, 0) + cma24
    expect = {m: num[m] / den[m] for m in num}
    got = {
        r.month_of_year: r.seasonal_index
        for r in QUERIES["seasonal_index_monthly"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == expect
    assert max(got, key=got.get) == 7 and got[7] > 1.5
    assert all(v < 1.0 for m, v in got.items() if m != 7)
    ok, detail = compare(
        spark,
        "seasonal_index_monthly",
        QUERIES["seasonal_index_monthly"],
        ORACLES["seasonal_index_monthly"],
        str(tmp_path),
    )
    assert ok, detail


def test_burst_viterbi_hand_computed(spark, tmp_path):
    # Hourly error counts [1,1,9,9,1,1]: mu0=22//6=3, mu1=10, gamma=7.
    # Forward DP by hand: dp0=[2,4,10,16,15,17], dp1=[16,18,12,13,22,31];
    # backtrack marks exactly the two 9-count hours as the burst.
    import datetime as dt

    import pandas as pd

    from tdk_apache_log_etl_spark.operators import ORACLES, QUERIES

    from .parity import compare

    base = dt.datetime(2026, 3, 1, 0)
    rows, eid = [], 0
    for h, cnt in enumerate([1, 1, 9, 9, 1, 1]):
        for k in range(cnt):
            eid += 1
            rows.append(
                (eid, base + dt.timedelta(hours=h, minutes=k), 1,
                 "error", 1.0, "{}")
            )
    # non-error noise must be ignored by the series
    rows.append((999, base + dt.timedelta(hours=2), 2, "view", 1.0, "{}"))
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    out = sorted(
        QUERIES["error_burst_viterbi"](spark, str(tmp_path)).collect(),
        key=lambda r: r.hour_index,
    )
    assert [r.n_errors for r in out] == [1, 1, 9, 9, 1, 1]
    assert [r.dp0 for r in out] == [2, 4, 10, 16, 15, 17]
    assert [r.dp1 for r in out] == [16, 18, 12, 13, 22, 31]
    assert [r.in_burst for r in out] == [
        False, False, True, True, False, False,
    ]
    ok, detail = compare(
        spark,
        "error_burst_viterbi",
        QUERIES["error_burst_viterbi"],
        ORACLES["error_burst_viterbi"],
        str(tmp_path),
    )
    assert ok, detail


def test_isotonic_pools_violating_levels(spark, tmp_path):
    # Levels (events//5): u1,u2 at level 1 (5 events; u1 converts ->
    # rate 0.5), u3,u4 at level 2 (10 events, none convert -> rate 0.0),
    # u5 at level 3 (15 events, converts -> 1.0). The 0.5 -> 0.0 dip
    # violates monotonicity: PAVA pools levels 1-2 to 1/4; level 3
    # stays 1.0.
    import datetime as dt

    import pandas as pd

    from tdk_apache_log_etl_spark.operators import ORACLES, QUERIES

    from .parity import compare

    rows, eid = [], 0
    for u, n, conv in [(1, 5, True), (2, 5, False), (3, 10, False),
                       (4, 10, False), (5, 15, True)]:
        for k in range(n):
            eid += 1
            typ = "purchase" if (conv and k == 0) else "view"
            rows.append(
                (eid, dt.datetime(2026, 6, 1 + k % 7, 8), u, typ, 1.0, "{}")
            )
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    rows_out = QUERIES["isotonic_conversion_by_activity"](
        spark, str(tmp_path)
    ).collect()
    by_lvl = {r.activity_level: r for r in rows_out}
    assert set(by_lvl) == {1, 2, 3}
    assert by_lvl[1].raw_rate == 0.5 and by_lvl[2].raw_rate == 0.0
    assert by_lvl[1].iso_rate == 0.25 and by_lvl[2].iso_rate == 0.25
    assert by_lvl[3].iso_rate == 1.0
    # the fit is monotone non-decreasing
    fits = [by_lvl[k].iso_rate for k in sorted(by_lvl)]
    assert fits == sorted(fits)
    ok, detail = compare(
        spark,
        "isotonic_conversion_by_activity",
        QUERIES["isotonic_conversion_by_activity"],
        ORACLES["isotonic_conversion_by_activity"],
        str(tmp_path),
    )
    assert ok, detail


def test_conformal_intervals_cover_and_deterministic(spark):
    from .conftest import SF_DIR_SMOKE
    from tdk_apache_log_etl_spark.operators import QUERIES

    rows1 = QUERIES["conformal_value_intervals"](spark, SF_DIR_SMOKE).collect()
    rows2 = QUERIES["conformal_value_intervals"](spark, SF_DIR_SMOKE).collect()
    assert sorted(map(tuple, rows1)) == sorted(map(tuple, rows2))
    assert len(rows1) >= 3
    for r in rows1:
        assert r.q_hat >= 0 and r.n_cal > 0 and r.n_test > 0
        # marginal guarantee is >= 0.9 in expectation; allow small-n noise
        assert r.coverage >= 0.8, r


def test_ols_recovers_planted_plane(spark, tmp_path):
    # value = 2 + 3*hour + 5*dow exactly, with hour and dow varied
    # independently -> the normal equations are nonsingular and the
    # Cramer solution recovers the plane bit-exactly (integer dets,
    # exact double division).
    import datetime as dt

    import pandas as pd

    from tdk_apache_log_etl_spark.operators import ORACLES, QUERIES

    from .parity import compare

    rows = []
    eid = 0
    # 2026-05-03 is a Sunday (dow 0 in the DuckDB convention used)
    for day_off, dow in [(0, 0), (1, 1), (3, 3)]:
        for hour in [0, 2, 7, 11]:
            v = 2.0 + 3.0 * hour + 5.0 * dow
            rows.append(
                (eid, dt.datetime(2026, 5, 3 + day_off, hour), eid % 4,
                 "view", v, "{}")
            )
            eid += 1
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    [r] = QUERIES["ols_value_regression"](spark, str(tmp_path)).collect()
    assert r.n_rows == 12
    assert r.beta_intercept == 2.0
    assert r.beta_hour == 3.0
    assert r.beta_dow == 5.0
    ok, detail = compare(
        spark,
        "ols_value_regression",
        QUERIES["ols_value_regression"],
        ORACLES["ols_value_regression"],
        str(tmp_path),
    )
    assert ok, detail


def test_ols_degenerate_design_null_betas(spark, tmp_path):
    # Every event in the same hour AND same dow -> X'X is singular
    # (det = 0); both engines must agree on NULL coefficients rather
    # than a divide-by-zero.
    import datetime as dt

    import pandas as pd

    from tdk_apache_log_etl_spark.operators import ORACLES, QUERIES

    from .parity import compare

    rows = [
        (i, dt.datetime(2026, 5, 3, 9), i, "view", 10.0 + i, "{}")
        for i in range(4)
    ]
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    [r] = QUERIES["ols_value_regression"](spark, str(tmp_path)).collect()
    assert r.n_rows == 4
    assert r.beta_intercept is None
    assert r.beta_hour is None
    assert r.beta_dow is None
    ok, detail = compare(
        spark,
        "ols_value_regression",
        QUERIES["ols_value_regression"],
        ORACLES["ols_value_regression"],
        str(tmp_path),
    )
    assert ok, detail


def test_xcorr_detects_planted_lead(spark, tmp_path):
    # Purchases trail errors by exactly one day with identical counts:
    # r(+1) = 1.0 exactly; r(0) over the zero-filled calendar is < 1.
    import datetime as dt

    import pandas as pd

    from tdk_apache_log_etl_spark.operators import ORACLES, QUERIES

    from .parity import compare

    rows = []
    eid = 0
    for t in range(1, 6):  # May 1..5: t errors on day t
        for _ in range(t):
            rows.append((eid, dt.datetime(2026, 5, t, 8), eid % 7,
                         "error", 1.0, "{}"))
            eid += 1
    for t in range(1, 6):  # May 2..6: t purchases on day t+1
        for _ in range(t):
            rows.append((eid, dt.datetime(2026, 5, t + 1, 9), eid % 7,
                         "purchase", 1.0, "{}"))
            eid += 1
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    out = {
        r.lag: r
        for r in QUERIES["error_purchase_xcorr_lags"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(out) == set(range(-3, 4))
    assert out[1].xcorr == 1.0
    assert out[0].xcorr < 1.0
    assert out[1].n_days == 5
    ok, detail = compare(
        spark,
        "error_purchase_xcorr_lags",
        QUERIES["error_purchase_xcorr_lags"],
        ORACLES["error_purchase_xcorr_lags"],
        str(tmp_path),
    )
    assert ok, detail


def test_sax_symbolizes_step_series(spark, tmp_path):
    # 16 days: 10/day then 30/day. mean=20, std=10; PAA segments average
    # to 10 and 30 -> z = -1 / +1 -> symbols 'a' / 'd', exact paa means.
    import datetime as dt

    import pandas as pd

    from tdk_apache_log_etl_spark.operators import ORACLES, QUERIES

    from .parity import compare

    rows = []
    for d in range(16):
        rows.append(
            (d, dt.datetime(2026, 5, 1 + d), 10.0 if d < 8 else 30.0)
        )
    df = pd.DataFrame(
        rows, columns=["o_orderkey", "o_orderdate", "o_totalprice"]
    )
    df["o_orderdate"] = df["o_orderdate"].astype("datetime64[ms]")
    df.to_parquet(tmp_path / "orders.parquet")
    out = {
        r.segment: r
        for r in QUERIES["daily_revenue_sax"](spark, str(tmp_path)).collect()
    }
    assert set(out) == {0, 1}
    assert (out[0].paa_value, out[0].sax_symbol) == (10.0, "a")
    assert (out[1].paa_value, out[1].sax_symbol) == (30.0, "d")
    ok, detail = compare(
        spark,
        "daily_revenue_sax",
        QUERIES["daily_revenue_sax"],
        ORACLES["daily_revenue_sax"],
        str(tmp_path),
    )
    assert ok, detail


def test_sax_constant_series_null_symbols(spark, tmp_path):
    # std = 0: symbols must be NULL in both engines, not a div-by-zero.
    import datetime as dt

    import pandas as pd

    from tdk_apache_log_etl_spark.operators import ORACLES, QUERIES

    from .parity import compare

    rows = [(d, dt.datetime(2026, 5, 1 + d), 7.0) for d in range(8)]
    df = pd.DataFrame(
        rows, columns=["o_orderkey", "o_orderdate", "o_totalprice"]
    )
    df["o_orderdate"] = df["o_orderdate"].astype("datetime64[ms]")
    df.to_parquet(tmp_path / "orders.parquet")
    [r] = QUERIES["daily_revenue_sax"](spark, str(tmp_path)).collect()
    assert r.paa_value == 7.0
    assert r.sax_symbol is None
    ok, detail = compare(
        spark,
        "daily_revenue_sax",
        QUERIES["daily_revenue_sax"],
        ORACLES["daily_revenue_sax"],
        str(tmp_path),
    )
    assert ok, detail


def test_holt_winters_locks_onto_pure_weekly_pattern(spark, tmp_path):
    # y_t = 100 + pattern[(t-1) % 7] with a zero-sum pattern: the init
    # gives l0=100, s_i=pattern_i exactly, and the recurrence is at its
    # fixed point — level stays 100, trend 0, and the 14-day forecast
    # continues the weekly cycle bit-exactly.
    import datetime as dt

    import pandas as pd

    from tdk_apache_log_etl_spark.operators import ORACLES, QUERIES

    from .parity import compare

    pattern = [0.0, 7.0, 14.0, -7.0, -14.0, 3.5, -3.5]  # sums to 0
    rows = []
    for d in range(21):
        rows.append(
            (d, dt.datetime(2026, 5, 1 + d), 100.0 + pattern[d % 7])
        )
    df = pd.DataFrame(
        rows, columns=["o_orderkey", "o_orderdate", "o_totalprice"]
    )
    df["o_orderdate"] = df["o_orderdate"].astype("datetime64[ms]")
    df.to_parquet(tmp_path / "orders.parquet")
    out = {
        r.day_index: r
        for r in QUERIES["daily_revenue_holt_winters"](
            spark, str(tmp_path)
        ).collect()
    }
    assert len(out) == 21 + 14
    for idx in range(1, 22):
        assert out[idx].level == 100.0, idx
        assert out[idx].trend == 0.0
        assert out[idx].seasonal == pattern[(idx - 1) % 7]
        assert not out[idx].is_forecast
    for idx in range(22, 36):
        assert out[idx].is_forecast
        assert out[idx].revenue is None
        assert out[idx].level == 100.0 + pattern[(idx - 1) % 7], idx
    ok, detail = compare(
        spark,
        "daily_revenue_holt_winters",
        QUERIES["daily_revenue_holt_winters"],
        ORACLES["daily_revenue_holt_winters"],
        str(tmp_path),
    )
    assert ok, detail
