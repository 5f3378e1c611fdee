"""Planted-fixture semantics pins for the growth / journey pack
(operators/growth.py) and the concentration pack
(operators/concentration.py): tiny hand-built events tables where every
classification is known by construction, checked BOTH directly and
through the DuckDB oracle (so the fixture also exercises the parity
harness on edge shapes the synthetic corpus may not hit)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from tdk_apache_log_etl_spark.operators import ORACLES, QUERIES

from .parity import compare


def _write_events(tmp_path, rows):
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    return str(tmp_path)


def _t(day, hour=12):
    # Monday 2026-08-03 anchors week 1; day is an offset in days.
    return dt.datetime(2026, 8, 3, hour) + dt.timedelta(days=day)


def test_growth_accounting_classes_planted(spark, tmp_path):
    # u1: weeks 0 and 1  -> new@w0, retained@w1, churned@w2
    # u2: weeks 0 and 2  -> new@w0, churned@w1, resurrected@w2, churned@w3
    rows = [
        (1, _t(0), 1, "view", 1.0, "{}"),
        (2, _t(7), 1, "view", 1.0, "{}"),
        (3, _t(1), 2, "view", 1.0, "{}"),
        (4, _t(14), 2, "view", 1.0, "{}"),
    ]
    sf = _write_events(tmp_path, rows)
    out = {
        r["week"].isoformat(): r
        for r in (
            row.asDict()
            for row in QUERIES["user_growth_accounting"](spark, sf).collect()
        )
    }
    w0, w1, w2, w3 = (
        "2026-08-03",
        "2026-08-10",
        "2026-08-17",
        "2026-08-24",
    )
    assert out[w0]["n_new"] == 2 and out[w0]["n_churned"] == 0
    assert out[w1]["n_retained"] == 1 and out[w1]["n_churned"] == 1
    assert out[w2]["n_resurrected"] == 1 and out[w2]["n_churned"] == 1
    assert out[w3]["n_churned"] == 1  # u2's final churn, past corpus end
    ok, detail = compare(
        spark,
        "user_growth_accounting",
        QUERIES["user_growth_accounting"],
        ORACLES["user_growth_accounting"],
        sf,
    )
    assert ok, detail


def test_longest_streak_planted(spark, tmp_path):
    # u1 active days 0,1,2 and 4,5 -> longest 3, 5 active days, 2 streaks.
    # Two events on day 0 must not double-count the day.
    rows = [
        (1, _t(0, 9), 1, "view", 1.0, "{}"),
        (2, _t(0, 18), 1, "view", 1.0, "{}"),
        (3, _t(1), 1, "view", 1.0, "{}"),
        (4, _t(2), 1, "view", 1.0, "{}"),
        (5, _t(4), 1, "view", 1.0, "{}"),
        (6, _t(5), 1, "view", 1.0, "{}"),
    ]
    sf = _write_events(tmp_path, rows)
    [r] = QUERIES["user_longest_streak"](spark, sf).collect()
    assert (r.longest_streak, r.n_active_days, r.n_streaks) == (3, 5, 2)
    ok, detail = compare(
        spark,
        "user_longest_streak",
        QUERIES["user_longest_streak"],
        ORACLES["user_longest_streak"],
        sf,
    )
    assert ok, detail


def test_journey_patterns_planted(spark, tmp_path):
    # u1: signup>view>purchase -> signup_first + eventual (NOT direct:
    #     view and purchase are not adjacent? they are adjacent here ->
    #     direct too). Make u1 signup>view>click>purchase instead.
    # u2: view>purchase        -> direct + eventual
    # u3: error>error          -> repeated_error
    rows = [
        (1, _t(0, 9), 1, "signup", 1.0, "{}"),
        (2, _t(0, 10), 1, "view", 1.0, "{}"),
        (3, _t(0, 11), 1, "click", 1.0, "{}"),
        (4, _t(0, 12), 1, "purchase", 1.0, "{}"),
        (5, _t(0, 9), 2, "view", 1.0, "{}"),
        (6, _t(0, 10), 2, "purchase", 1.0, "{}"),
        (7, _t(0, 9), 3, "error", 1.0, "{}"),
        (8, _t(0, 10), 3, "error", 1.0, "{}"),
    ]
    sf = _write_events(tmp_path, rows)
    [r] = QUERIES["journey_pattern_counts"](spark, sf).collect()
    assert r.n_users == 3
    assert r.n_direct_conversion == 1  # u2 only
    assert r.n_eventual_conversion == 2  # u1 and u2
    assert r.n_signup_first == 1
    assert r.n_repeated_error == 1
    ok, detail = compare(
        spark,
        "journey_pattern_counts",
        QUERIES["journey_pattern_counts"],
        ORACLES["journey_pattern_counts"],
        sf,
    )
    assert ok, detail


def test_journey_tiebreak_same_timestamp(spark, tmp_path):
    # Two events with the IDENTICAL timestamp: order must come from
    # event_id (the deterministic tie-break), in both engines.
    ts = _t(0)
    rows = [
        (2, ts, 1, "purchase", 1.0, "{}"),
        (1, ts, 1, "view", 1.0, "{}"),
    ]
    sf = _write_events(tmp_path, rows)
    [r] = QUERIES["journey_pattern_counts"](spark, sf).collect()
    assert r.n_direct_conversion == 1  # view(id=1) precedes purchase(id=2)
    ok, detail = compare(
        spark,
        "journey_pattern_counts",
        QUERIES["journey_pattern_counts"],
        ORACLES["journey_pattern_counts"],
        sf,
    )
    assert ok, detail


def test_peak_decline_running_max_planted(spark, tmp_path):
    # Daily counts 3,1,5,2: the decline is measured against the RUNNING
    # peak — day1: 3-1=2, day3: 5-2=3 → max_decline 3 (never 5-1=4,
    # which would compare day1 against a peak that hadn't happened yet).
    rows = []
    eid = 0
    for day, cnt in [(0, 3), (1, 1), (2, 5), (3, 2)]:
        for _ in range(cnt):
            eid += 1
            rows.append((eid, _t(day, 9 + eid % 8), 1, "view", 1.0, "{}"))
    sf = _write_events(tmp_path, rows)
    [r] = QUERIES["peak_decline_by_type"](spark, sf).collect()
    assert (r.peak_daily, r.max_decline, r.n_days) == (5, 3, 4)
    ok, detail = compare(
        spark,
        "peak_decline_by_type",
        QUERIES["peak_decline_by_type"],
        ORACLES["peak_decline_by_type"],
        sf,
    )
    assert ok, detail


def test_autocorr_gap_days_break_pairs(spark, tmp_path):
    # Days 0,1,2 then 4,5 (day 3 missing): pairs are (0,1),(1,2),(4,5)
    # only — the gap must not pair day 2 with day 4.
    rows = []
    eid = 0
    for day, cnt in [(0, 1), (1, 2), (2, 3), (4, 5), (5, 6)]:
        for _ in range(cnt):
            eid += 1
            rows.append((eid, _t(day, 9 + eid % 8), 1, "view", 1.0, "{}"))
    sf = _write_events(tmp_path, rows)
    [r] = QUERIES["daily_counts_autocorr"](spark, sf).collect()
    assert r.n_pairs == 3
    # x=[1,2,5], y=[2,3,6]: exactly linear (y = x+1) → r² = 1.
    assert r.autocorr_r2 == pytest.approx(1.0)
    ok, detail = compare(
        spark,
        "daily_counts_autocorr",
        QUERIES["daily_counts_autocorr"],
        ORACLES["daily_counts_autocorr"],
        sf,
    )
    assert ok, detail


def test_autocorr_constant_series_null(spark, tmp_path):
    # A constant series has zero variance → NULL r², not a divide error.
    rows = []
    eid = 0
    for day in range(3):
        for _ in range(4):
            eid += 1
            rows.append((eid, _t(day, 9 + eid % 8), 1, "view", 1.0, "{}"))
    sf = _write_events(tmp_path, rows)
    [r] = QUERIES["daily_counts_autocorr"](spark, sf).collect()
    assert r.n_pairs == 2 and r.autocorr_r2 is None
    ok, detail = compare(
        spark,
        "daily_counts_autocorr",
        QUERIES["daily_counts_autocorr"],
        ORACLES["daily_counts_autocorr"],
        sf,
    )
    assert ok, detail


def test_gini_extremes_planted(spark, tmp_path):
    # Perfect equality (every user the same count) → gini = 0 exactly...
    rows = []
    eid = 0
    for u in range(4):
        for _ in range(3):
            eid += 1
            rows.append((eid, _t(0, 9 + eid % 8), u, "view", 1.0, "{}"))
    sf = _write_events(tmp_path, rows)
    [r] = QUERIES["user_activity_gini"](spark, sf).collect()
    assert (r.n_users, r.total_events) == (4, 12)
    assert r.gini == pytest.approx(0.0)
    # ...and a single dominant user pushes it toward (n-1)/n.
    rows += [
        (100 + i, _t(1, 9 + i % 8), 9, "view", 1.0, "{}") for i in range(88)
    ]
    sf2_dir = tmp_path / "skewed"
    sf2_dir.mkdir()
    sf2 = _write_events(sf2_dir, rows)
    [r2] = QUERIES["user_activity_gini"](spark, sf2).collect()
    assert r2.gini > 0.6
    ok, detail = compare(
        spark,
        "user_activity_gini",
        QUERIES["user_activity_gini"],
        ORACLES["user_activity_gini"],
        sf2,
    )
    assert ok, detail


def test_ab_ztest_known_counts(spark, tmp_path):
    # Cohort A (even ids): 2 users, 1 converts. Cohort B (odd): 2 users,
    # both convert. Verify the four exact counts and the closed-form z².
    rows = [
        (1, _t(0, 9), 0, "purchase", 1.0, "{}"),
        (2, _t(0, 9), 2, "view", 1.0, "{}"),
        (3, _t(0, 9), 1, "purchase", 1.0, "{}"),
        (4, _t(0, 9), 3, "purchase", 1.0, "{}"),
    ]
    sf = _write_events(tmp_path, rows)
    [r] = QUERIES["ab_conversion_ztest"](spark, sf).collect()
    assert (r.n_a, r.conv_a, r.n_b, r.conv_b) == (2, 1, 2, 2)
    p = 3 / 4
    expected = (0.5 - 1.0) ** 2 / (p * (1 - p) * (1 / 2 + 1 / 2))
    assert r.z2 == pytest.approx(expected)
    ok, detail = compare(
        spark,
        "ab_conversion_ztest",
        QUERIES["ab_conversion_ztest"],
        ORACLES["ab_conversion_ztest"],
        sf,
    )
    assert ok, detail


def test_slo_burn_rate_alert_planted(spark, tmp_path):
    # Hour 0: 100 events, 1 error  -> burn_1h = 1.0 (inside budget).
    # Hour 1: 100 events, 20 errors -> burn_1h = 20 > 14.4, and the 6h
    # window (21/200)/0.01 = 10.5 > 6 -> ALERT.
    # Hour 5 after a 3-hour silence: the RANGE frame must still include
    # hours 0-1 (5-5=0 .. 5), not stretch 6 ROWS across the gap.
    rows = []
    eid = 0

    def add(hour, n, n_err):
        nonlocal eid
        for i in range(n):
            eid += 1
            rows.append(
                (
                    eid,
                    dt.datetime(2026, 8, 3, hour, i % 60),
                    1,
                    "error" if i < n_err else "view",
                    1.0,
                    "{}",
                )
            )

    add(0, 100, 1)
    add(1, 100, 20)
    add(5, 100, 0)
    sf = _write_events(tmp_path, rows)
    out = {
        r["hour"].hour: r
        for r in (
            row.asDict()
            for row in QUERIES["slo_burn_rate"](spark, sf).collect()
        )
    }
    assert out[0]["burn_1h"] == pytest.approx(1.0)
    assert out[0]["alert"] is False
    assert out[1]["burn_1h"] == pytest.approx(20.0)
    assert out[1]["burn_6h"] == pytest.approx((21 / 200) / 0.01)
    assert out[1]["alert"] is True
    # hour 5's 6h RANGE window covers hours 0..5 -> 21 errors / 300
    assert out[5]["burn_6h"] == pytest.approx((21 / 300) / 0.01)
    assert out[5]["alert"] is False
    ok, detail = compare(
        spark,
        "slo_burn_rate",
        QUERIES["slo_burn_rate"],
        ORACLES["slo_burn_rate"],
        sf,
    )
    assert ok, detail


def test_cohort_ltv_planted(spark, tmp_path):
    # Cohort A (week 0): two users; purchases of 10 at offset 0 and 30
    # at offset 1 -> cum 10, 40; per-user 5, 20.
    # Cohort B (week 1): one user; purchase of 8 at its offset 0.
    # Non-purchase events must not contribute revenue.
    rows = [
        (1, _t(0, 9), 1, "purchase", 10.0, "{}"),
        (2, _t(0, 10), 2, "view", 999.0, "{}"),       # cohort A, no revenue
        (3, _t(8, 9), 1, "purchase", 30.0, "{}"),     # offset 1
        (4, _t(7, 9), 3, "signup", 1.0, "{}"),        # cohort B first-seen
        (5, _t(9, 9), 3, "purchase", 8.0, "{}"),      # cohort B offset 0
    ]
    sf = _write_events(tmp_path, rows)
    out = {
        (r.cohort_week.isoformat(), r.week_offset): r
        for r in QUERIES["cohort_ltv_curve"](spark, sf).collect()
    }
    a0 = out[("2026-08-03", 0)]
    a1 = out[("2026-08-03", 1)]
    b0 = out[("2026-08-10", 0)]
    assert a0.n_users == 2 and a0.cum_revenue == pytest.approx(10.0)
    assert a0.ltv_per_user == pytest.approx(5.0)
    assert a1.cum_revenue == pytest.approx(40.0)
    assert a1.ltv_per_user == pytest.approx(20.0)
    assert b0.n_users == 1 and b0.cum_revenue == pytest.approx(8.0)
    ok, detail = compare(
        spark,
        "cohort_ltv_curve",
        QUERIES["cohort_ltv_curve"],
        ORACLES["cohort_ltv_curve"],
        sf,
    )
    assert ok, detail


def test_rolling_corr_perfect_and_degenerate(spark, tmp_path):
    # Days 0-2: purchases 1,2,3 and errors 2,4,6 (errors = 2x purchases)
    # -> rolling_r = +1 by day 2. Days 10-12 (fresh window after the
    # gap): constant purchases, varying errors -> zero variance in x ->
    # NULL.
    rows = []
    eid = 0

    def add(day, n_purch, n_err):
        nonlocal eid
        for i in range(n_purch):
            eid += 1
            rows.append((eid, _t(day, 9 + i % 8), 1, "purchase", 1.0, "{}"))
        for i in range(n_err):
            eid += 1
            rows.append((eid, _t(day, 9 + i % 8), 1, "error", 1.0, "{}"))

    for day, (p, e) in zip([0, 1, 2], [(1, 2), (2, 4), (3, 6)]):
        add(day, p, e)
    for day, (p, e) in zip([10, 11, 12], [(2, 1), (2, 5), (2, 3)]):
        add(day, p, e)
    sf = _write_events(tmp_path, rows)
    out = {
        (r.day - dt.date(2026, 8, 3)).days: r
        for r in QUERIES["rolling_purchase_error_corr"](spark, sf).collect()
    }
    assert out[2].n_days == 3
    assert out[2].rolling_r == pytest.approx(1.0)
    assert out[12].n_days == 3  # 7-day RANGE window excludes days 0-2
    assert out[12].rolling_r is None  # constant purchase series
    ok, detail = compare(
        spark,
        "rolling_purchase_error_corr",
        QUERIES["rolling_purchase_error_corr"],
        ORACLES["rolling_purchase_error_corr"],
        sf,
    )
    assert ok, detail


def test_event_gap_log_buckets_planted(spark, tmp_path):
    # Gaps of 1s, 3s, 4s, 7s, 8s for one user ->
    # buckets 0:[1], 1:[3], 2:[4,7], 3:[8]. A 0-second gap (same
    # timestamp) and a sub-second wrap (0.9s elapsed across a second
    # boundary) are both excluded by the ELAPSED >= 1 s rule — pinning
    # timestampdiff (elapsed) over boundary-crossing semantics.
    base = dt.datetime(2026, 8, 3, 9, 0, 0)
    offs = [0.0, 1.0, 4.0, 8.0, 15.0, 23.0]  # gaps 1,3,4,7,8
    rows = [
        (i, base + dt.timedelta(seconds=o), 1, "view", 1.0, "{}")
        for i, o in enumerate(offs)
    ]
    # sub-second boundary wrap: 9:10:00.900 -> 9:10:01.100 (0.2s elapsed,
    # crosses the :01 boundary); must NOT appear as a 1s gap
    rows.append(
        (100, dt.datetime(2026, 8, 3, 9, 10, 0, 900000), 2, "view", 1.0, "{}")
    )
    rows.append(
        (101, dt.datetime(2026, 8, 3, 9, 10, 1, 100000), 2, "view", 1.0, "{}")
    )
    sf = _write_events(tmp_path, rows)
    out = {
        r.bucket: r
        for r in QUERIES["event_gap_log_histogram"](spark, sf).collect()
    }
    assert {b: out[b].n_gaps for b in sorted(out)} == {0: 1, 1: 1, 2: 2, 3: 1}
    assert (out[2].min_gap_s, out[2].max_gap_s) == (4, 7)
    ok, detail = compare(
        spark,
        "event_gap_log_histogram",
        QUERIES["event_gap_log_histogram"],
        ORACLES["event_gap_log_histogram"],
        sf,
    )
    assert ok, detail


def test_funnel_chain_deadlines_planted(spark, tmp_path):
    # u1: view@0 -> click@10min (fresh) -> purchase@40min (30min after
    #     click)                      => full chain.
    # u2: view@0 -> click@45min (view STALE, >30min) -> purchase@50min
    #                                 => no qualified chain at all.
    # u3: view@0 -> click@5min (fresh) -> purchase@5h (click too old)
    #                                 => chain exists, deadline missed.
    base = dt.datetime(2026, 8, 3, 9, 0, 0)

    def at(minutes):
        return base + dt.timedelta(minutes=minutes)

    rows = [
        (1, at(0), 1, "view", 1.0, "{}"),
        (2, at(10), 1, "click", 1.0, "{}"),
        (3, at(40), 1, "purchase", 1.0, "{}"),
        (4, at(0), 2, "view", 1.0, "{}"),
        (5, at(45), 2, "click", 1.0, "{}"),
        (6, at(50), 2, "purchase", 1.0, "{}"),
        (7, at(0), 3, "view", 1.0, "{}"),
        (8, at(5), 3, "click", 1.0, "{}"),
        (9, at(300), 3, "purchase", 1.0, "{}"),
    ]
    sf = _write_events(tmp_path, rows)
    [r] = QUERIES["funnel_chain_within_deadlines"](spark, sf).collect()
    assert (r.n_purchases, r.n_after_any_chain, r.n_full_chain) == (3, 2, 1)
    ok, detail = compare(
        spark,
        "funnel_chain_within_deadlines",
        QUERIES["funnel_chain_within_deadlines"],
        ORACLES["funnel_chain_within_deadlines"],
        sf,
    )
    assert ok, detail


def test_dq_expectations_planted_violations(spark, tmp_path):
    # 10 rows: one NULL ts, one unknown type, one negative value, one
    # broken JSON, six NULL values (60% > the 50% tolerance). Every rule
    # must report its exact violation count and verdict.
    base = dt.datetime(2026, 8, 3, 9)
    rows = [
        (1, None, 1, "view", 1.0, "{}"),              # ts NULL
        (2, base, 1, "teleport", 1.0, "{}"),          # unknown type
        (3, base, 1, "view", -5.0, "{}"),             # negative value
        (4, base, 1, "view", 1.0, "{not json"),       # broken JSON
    ] + [
        (5 + i, base, 1, "view", None, "{}") for i in range(6)  # NULL value
    ]
    sf = _write_events(tmp_path, rows)
    out = {
        r.rule_name: r
        for r in QUERIES["dq_expectations_events"](spark, sf).collect()
    }
    assert out["event_id_not_null"].n_violations == 0
    assert out["event_id_not_null"].passed is True
    assert out["ts_not_null"].n_violations == 1
    assert out["ts_not_null"].passed is False
    assert out["known_event_type"].n_violations == 1
    assert out["value_non_negative"].n_violations == 1
    assert out["props_parses_as_json"].n_violations == 1
    assert out["value_mostly_present"].n_violations == 6
    assert out["value_mostly_present"].passed is False  # 0.6 > 0.5
    ok, detail = compare(
        spark,
        "dq_expectations_events",
        QUERIES["dq_expectations_events"],
        ORACLES["dq_expectations_events"],
        sf,
    )
    assert ok, detail


def test_growth_incremental_merge_equals_recompute(spark, tmp_path):
    # The seam case that breaks additive merging: u1 is active in BOTH
    # halves, so the state (half A alone) books a churn at the seam that
    # the merge must RETRACT and replace with 'retained'. u2 exists only
    # in A (must pass through untouched), u3 only in B (new user).
    from tdk_apache_log_etl_spark.operators.growth import (
        classify_weeks,
        growth_weeks,
        merge_growth_state,
        weekly_class_counts,
    )

    a_rows = [
        (1, _t(0), 1, "view", 1.0, "{}"),
        (2, _t(1), 2, "view", 1.0, "{}"),
    ]
    b_rows = [
        (3, _t(7), 1, "view", 1.0, "{}"),
        (4, _t(8), 3, "view", 1.0, "{}"),
    ]
    all_dir = tmp_path / "all"
    all_dir.mkdir()
    _write_events(all_dir, a_rows + b_rows)
    a_dir = tmp_path / "a"
    a_dir.mkdir()
    _write_events(a_dir, a_rows)
    b_dir = tmp_path / "b"
    b_dir.mkdir()
    _write_events(b_dir, b_rows)

    from tdk_apache_log_etl_spark.sources.tables import load_table

    state_weeks = growth_weeks(load_table(spark, str(a_dir), "events"))
    state_rows = classify_weeks(state_weeks).localCheckpoint()
    state_weeks = state_weeks.localCheckpoint()
    delta = load_table(spark, str(b_dir), "events")
    _w, merged_rows = merge_growth_state(state_weeks, state_rows, delta)
    merged = weekly_class_counts(merged_rows)
    direct = QUERIES["user_growth_accounting"](spark, str(all_dir))
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    # u1's A-side churn@w1 was retracted (w1 has a retained, no churn
    # from u1; u2's churn@w1 remains)
    by_week = {r.week.isoformat(): r for r in merged.collect()}
    assert by_week["2026-08-10"].n_retained == 1
    assert by_week["2026-08-10"].n_churned == 1  # u2 only
    # structure: untouched users bypass the window via LeftAnti; only
    # affected users (LeftSemi) are re-classified
    plan = merged_rows._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan and "LeftSemi" in plan


def test_theil_sen_ignores_outlier_day(spark, tmp_path):
    # Daily counts 10,11,12,13,100: a perfect slope-1 trend with one
    # blown-out final day. The median pairwise slope stays 1.0 (6 of 10
    # pairs have slope exactly 1); least squares would report ~17.
    rows = []
    eid = 0
    for day, cnt in [(0, 10), (1, 11), (2, 12), (3, 13), (4, 100)]:
        for _ in range(cnt):
            eid += 1
            rows.append((eid, _t(day, 9 + eid % 8), 1, "view", 1.0, "{}"))
    sf = _write_events(tmp_path, rows)
    [r] = QUERIES["theil_sen_daily_trend"](spark, sf).collect()
    assert r.n_pairs == 10
    assert r.theil_sen_slope == pytest.approx(1.0)
    ok, detail = compare(
        spark,
        "theil_sen_daily_trend",
        QUERIES["theil_sen_daily_trend"],
        ORACLES["theil_sen_daily_trend"],
        sf,
    )
    assert ok, detail


def test_capped_sessions_gap_and_cap_splits(spark, tmp_path):
    # u1: two events 10 min apart, then a 45-min silence (gap split),
    # then an event every 20 min for 5+ hours: no gap ever fires again,
    # but the 4-hour duration cap must split the marathon session.
    base = dt.datetime(2026, 8, 3, 8, 0, 0)
    times = [0, 10, 55]                      # session 1: 0,10 | gap -> s2
    times += [55 + 20 * k for k in range(1, 16)]  # every 20 min to +355
    rows = [
        (i, base + dt.timedelta(minutes=m), 1, "view", 1.0, "{}")
        for i, m in enumerate(times)
    ]
    sf = _write_events(tmp_path, rows)
    [r] = QUERIES["capped_sessions_per_user"](spark, sf).collect()
    # session 2 starts at 55 min; first event past the 240-min cap is at
    # 55+260=315 min (260 > 240) -> cap split -> session 3
    assert (r.n_sessions, r.n_gap_splits, r.n_cap_splits) == (3, 1, 1)
    assert r.n_events == len(times)
    ok, detail = compare(
        spark,
        "capped_sessions_per_user",
        QUERIES["capped_sessions_per_user"],
        ORACLES["capped_sessions_per_user"],
        sf,
    )
    assert ok, detail


def test_capped_sessions_boundary_is_strict(spark, tmp_path):
    # Events every EXACTLY 30 min from 0 to 240 min: no gap ever
    # exceeds 30 min (strict >), and at the 240-min event the session
    # duration is exactly the cap — still ONE session. The next event
    # at 270 min (gap 30, duration 270 > 240) splits on the CAP, not
    # the gap.
    base = dt.datetime(2026, 8, 3, 8, 0, 0)
    times = list(range(0, 241, 30)) + [270]
    rows = [
        (i, base + dt.timedelta(minutes=m), 1, "view", 1.0, "{}")
        for i, m in enumerate(times)
    ]
    sf = _write_events(tmp_path, rows)
    [r] = QUERIES["capped_sessions_per_user"](spark, sf).collect()
    assert (r.n_sessions, r.n_gap_splits, r.n_cap_splits) == (2, 0, 1)
    ok, detail = compare(
        spark,
        "capped_sessions_per_user",
        QUERIES["capped_sessions_per_user"],
        ORACLES["capped_sessions_per_user"],
        sf,
    )
    assert ok, detail


def test_capped_sessions_mega_user_is_bounded(spark):
    # A planted bot hammering one user_id with 10^6 events (1/s) must not
    # serialize a partition: the walk processes only the first
    # EVENTS_PER_USER_CAP events and flags the user truncated, while a
    # normal user passes through untouched. One exchange total — the
    # row_number/count windows ride the same shuffle+sort the mapper needs.
    from tdk_apache_log_etl_spark.operators.temporal import (
        EVENTS_PER_USER_CAP,
        SESSION_CAP_S,
        capped_sessions,
    )

    mega = spark.range(1_000_000).selectExpr(
        "CAST(1 AS BIGINT) AS user_id",
        "timestamp'2026-08-03 00:00:00' + make_interval(0,0,0,0,0,0,id) AS ts",
        "id AS event_id",
    )
    normal = spark.range(10).selectExpr(
        "CAST(2 AS BIGINT) AS user_id",
        "timestamp'2026-08-03 00:00:00' + make_interval(0,0,0,0,0,0,id*60)"
        " AS ts",
        "id + 2000000 AS event_id",
    )
    res = capped_sessions(mega.unionByName(normal))

    plan = res._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1

    rows = {r.user_id: r for r in res.collect()}
    r1, r2 = rows[1], rows[2]
    assert r1.truncated and r1.n_events == EVENTS_PER_USER_CAP
    # events 1 s apart: no gap splits; cap splits every CAP_S+1 events
    assert r1.n_gap_splits == 0
    assert r1.n_cap_splits == (EVENTS_PER_USER_CAP - 1) // (SESSION_CAP_S + 1)
    assert not r2.truncated and r2.n_events == 10 and r2.n_sessions == 1


def test_bot_suspect_flags_planted(spark, tmp_path):
    # A: 15 events inside one minute  -> burst peak flags it.
    # B: 32 events across 8 minutes   -> duty cycle 4 > 3 flags it.
    # C: 5 events in 5 minutes        -> human-shaped, clean.
    base = dt.datetime(2026, 8, 3, 9, 0, 0)
    rows = []
    eid = 0
    for i in range(15):
        eid += 1
        rows.append((eid, base + dt.timedelta(seconds=2 * i), 1, "view",
                     1.0, "{}"))
    for m in range(8):
        for i in range(4):
            eid += 1
            rows.append((eid, base + dt.timedelta(minutes=10 + m,
                                                  seconds=10 * i),
                         2, "view", 1.0, "{}"))
    for m in range(5):
        eid += 1
        rows.append((eid, base + dt.timedelta(minutes=30 + 2 * m), 3,
                     "view", 1.0, "{}"))
    sf = _write_events(tmp_path, rows)
    out = {r.user_id: r
           for r in QUERIES["bot_suspect_users"](spark, sf).collect()}
    assert out[1].peak_rpm == 15 and out[1].is_suspect is True
    assert out[2].peak_rpm == 4 and out[2].is_suspect is True
    assert out[2].events_per_active_minute == pytest.approx(4.0)
    assert out[3].is_suspect is False
    ok, detail = compare(
        spark, "bot_suspect_users", QUERIES["bot_suspect_users"],
        ORACLES["bot_suspect_users"], sf,
    )
    assert ok, detail


def test_type_hour_association_extremes(spark, tmp_path):
    # Independent dense 2x2 grid (each type occurs equally in each hour)
    # -> dependence exactly 0.
    base = dt.datetime(2026, 8, 3, 0, 0, 0)
    rows = []
    eid = 0
    for etype in ("view", "click"):
        for hr in (0, 1):
            for i in range(5):
                eid += 1
                rows.append((eid, base + dt.timedelta(hours=hr, minutes=i),
                             1, etype, 1.0, "{}"))
    sf = _write_events(tmp_path, rows)
    [r] = QUERIES["type_hour_association"](spark, sf).collect()
    assert r.n_cells == 4
    assert r.tv_dependence == pytest.approx(0.0)
    ok, detail = compare(
        spark, "type_hour_association", QUERIES["type_hour_association"],
        ORACLES["type_hour_association"], sf,
    )
    assert ok, detail
    # Perfectly dependent diagonal (sparse grid): the present-cells
    # formula gives 0.25 (docstring documents the sparse-grid caveat);
    # both engines agree bit-for-bit.
    rows2 = []
    eid = 0
    for etype, hr in (("view", 0), ("click", 1)):
        for i in range(10):
            eid += 1
            rows2.append((eid, base + dt.timedelta(hours=hr, minutes=i),
                          1, etype, 1.0, "{}"))
    sf2_dir = tmp_path / "diag"
    sf2_dir.mkdir()
    sf2 = _write_events(sf2_dir, rows2)
    [r2] = QUERIES["type_hour_association"](spark, sf2).collect()
    assert r2.n_cells == 2
    assert r2.tv_dependence == pytest.approx(0.25)


def test_markov_removal_effect_planted_journeys(spark, tmp_path):
    # journeys: 2× START→view→CONV, 1× START→click→CONV,
    # 1× START→view→NULL. Exact integer value-iteration:
    # P(view)=⌊2e9/3⌋, P(click)=1e9,
    # P(START)=⌊(3·P(view)+P(click))/4⌋ = 0.749999999.
    # Removing view: START→NULL×3 ⇒ P=0.25 (effect = 2/3);
    # removing click: P=⌊3·P(view)/4⌋ ≈ 0.5 (effect ≈ 1/3);
    # signup/error never appear ⇒ effect 0.
    import datetime as dt

    import pandas as pd
    import pytest as _pytest

    from tdk_apache_log_etl_spark.operators import ORACLES, QUERIES

    from .parity import compare

    base = dt.datetime(2026, 2, 1, 9)
    rows = [
        (1, base, 1, "view", 1.0, "{}"),
        (2, base + dt.timedelta(minutes=5), 1, "purchase", 1.0, "{}"),
        (3, base, 2, "view", 1.0, "{}"),
        (4, base + dt.timedelta(minutes=5), 2, "purchase", 1.0, "{}"),
        (5, base, 3, "click", 1.0, "{}"),
        (6, base + dt.timedelta(minutes=5), 3, "purchase", 1.0, "{}"),
        (7, base, 4, "view", 1.0, "{}"),
    ]
    df = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value",
                 "props"],
    )
    df["ts"] = df["ts"].astype("datetime64[ms]")
    df.to_parquet(tmp_path / "events.parquet")
    got = {
        r.channel: r
        for r in QUERIES["markov_attribution_removal"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(got) == {"view", "click", "signup", "error"}
    assert got["view"].p_conv_full == _pytest.approx(0.75, abs=1e-8)
    assert got["view"].removal_effect == _pytest.approx(2 / 3, abs=1e-8)
    assert got["click"].removal_effect == _pytest.approx(1 / 3, abs=1e-8)
    assert got["signup"].removal_effect == 0.0
    assert got["error"].removal_effect == 0.0
    ok, detail = compare(
        spark,
        "markov_attribution_removal",
        QUERIES["markov_attribution_removal"],
        ORACLES["markov_attribution_removal"],
        str(tmp_path),
    )
    assert ok, detail


def test_column_profile_hand_computed(spark, tmp_path):
    # 4 rows: event_type [view,view,error,NULL], user_id [1,1,2,3],
    # value [1.0,1.0,2.0,NULL], props ['{}','{}',NULL,'{}'].
    rows = [
        (1, dt.datetime(2026, 8, 1, 9), 1, "view", 1.0, "{}"),
        (2, dt.datetime(2026, 8, 1, 10), 1, "view", 1.0, "{}"),
        (3, dt.datetime(2026, 8, 1, 11), 2, "error", 2.0, None),
        (4, dt.datetime(2026, 8, 1, 12), 3, None, None, "{}"),
    ]
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    prof = {
        r.col_name: r
        for r in QUERIES["events_column_profile"](spark, str(tmp_path)).collect()
    }
    et = prof["event_type"]
    assert (et.n_rows, et.n_nulls, et.n_distinct) == (4, 1, 2)
    assert (et.top_value, et.top_freq) == ("view", 2)
    assert et.simpson == 5.0 / 9
    uid = prof["user_id"]
    assert (uid.n_nulls, uid.n_distinct, uid.top_value, uid.top_freq) == (
        0, 3, "1", 2,
    )
    assert uid.simpson == 6.0 / 16
    vc = prof["value_c"]
    assert (vc.n_nulls, vc.n_distinct, vc.top_value) == (1, 2, "100")
    pr = prof["props"]
    assert (pr.n_nulls, pr.n_distinct, pr.simpson) == (1, 1, 1.0)
    ok, detail = compare(
        spark,
        "events_column_profile",
        QUERIES["events_column_profile"],
        ORACLES["events_column_profile"],
        str(tmp_path),
    )
    assert ok, detail


def test_seq_pattern_supports_gapped_order(spark, tmp_path):
    # user 1: a then (other) then b  -> supports a->b (gap allowed), not b->a
    # user 2: b then a               -> supports b->a only
    # user 3: only a                 -> supports nothing
    rows = [
        (0, dt.datetime(2026, 5, 1, 9), 1, "a", 1.0, "{}"),
        (1, dt.datetime(2026, 5, 1, 10), 1, "c", 1.0, "{}"),
        (2, dt.datetime(2026, 5, 1, 11), 1, "b", 1.0, "{}"),
        (3, dt.datetime(2026, 5, 2, 9), 2, "b", 1.0, "{}"),
        (4, dt.datetime(2026, 5, 2, 10), 2, "a", 1.0, "{}"),
        (5, dt.datetime(2026, 5, 3, 9), 3, "a", 1.0, "{}"),
    ]
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    out = {
        (r.type_a, r.type_b): (r.n_support, r.support_share)
        for r in QUERIES["seq_pattern_pairs"](spark, str(tmp_path)).collect()
    }
    assert out[("a", "b")] == (1, 1 / 3)
    assert out[("b", "a")] == (1, 1 / 3)
    assert out[("a", "c")] == (1, 1 / 3)  # user 1: a before c
    assert out[("c", "b")] == (1, 1 / 3)  # user 1: c before b
    assert ("b", "c") not in out  # c never follows a b anywhere
    from .parity import compare

    ok, detail = compare(
        spark,
        "seq_pattern_pairs",
        QUERIES["seq_pattern_pairs"],
        ORACLES["seq_pattern_pairs"],
        str(tmp_path),
    )
    assert ok, detail


# --------------------------------------------------------------------------
# E243 log-rank test (time-to-first-purchase)
# --------------------------------------------------------------------------


def test_logrank_detects_faster_converting_cohort(spark, tmp_path):
    import datetime as dt

    # 20 even-id users all convert on day 1; 20 odd-id users never do
    # (censored at corpus end, day 30). One event time (t=1):
    # O1=20, E1=10, V = 20*(1/2)*(1/2)*(20/39) = 100/39
    # -> z^2 = 100 / (100/39) = 39 exactly -> reject.
    rows = []
    eid = 0
    d0 = dt.datetime(1992, 1, 1)
    for u in range(0, 40, 2):
        eid += 1
        rows.append((eid, d0, u, "view", 1.0, "{}"))
        eid += 1
        rows.append((eid, d0 + dt.timedelta(days=1), u, "purchase", 1.0,
                     "{}"))
    for u in range(1, 40, 2):
        eid += 1
        rows.append((eid, d0, u, "view", 1.0, "{}"))
    eid += 1
    rows.append((eid, d0 + dt.timedelta(days=30), 1, "view", 1.0, "{}"))
    _write_events(tmp_path, rows)
    r = QUERIES["conversion_logrank_test"](spark, str(tmp_path)).collect()[0]
    assert r.n_event_times == 1
    assert r.observed_1 == 20
    assert abs(r.oe_sum - 10.0) < 1e-9
    assert abs(r.logrank_z2 - 39.0) < 1e-6
    assert r.reject_at_05
    ok, detail = compare(
        spark,
        "conversion_logrank_test",
        QUERIES["conversion_logrank_test"],
        ORACLES["conversion_logrank_test"],
        str(tmp_path),
    )
    assert ok, detail


def test_logrank_no_conversions_is_null_safe(spark, tmp_path):
    import datetime as dt

    rows = [
        (u + 1, dt.datetime(1992, 1, 1 + (u % 5)), u, "view", 1.0, "{}")
        for u in range(10)
    ]
    _write_events(tmp_path, rows)
    r = QUERIES["conversion_logrank_test"](spark, str(tmp_path)).collect()[0]
    assert (r.n_event_times, r.logrank_z2, r.reject_at_05) == (0, None, False)
    ok, detail = compare(
        spark,
        "conversion_logrank_test",
        QUERIES["conversion_logrank_test"],
        ORACLES["conversion_logrank_test"],
        str(tmp_path),
    )
    assert ok, detail
