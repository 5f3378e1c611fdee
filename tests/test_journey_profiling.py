"""Planted-fixture sanity for the round-3 journey/profiling/reporting
operators (E34–E62). Oracle parity at sf0.01 is already enforced by
test_oracle_parity.py; these tests pin the SEMANTICS on data where the
expected answer is hand-computable."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from tdk_apache_log_etl_spark.operators import QUERIES


def _events(tmp_path, rows):
    # rows: (event_id, ts, user_id, event_type, value)
    pd.DataFrame(
        [(eid, ts, uid, et, v, "{}") for eid, ts, uid, et, v in rows],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    return str(tmp_path)


def _lineitem_baskets(tmp_path, orders):
    rows = []
    for okey, basket in enumerate(orders):
        for i, part in enumerate(basket):
            rows.append((okey, part, 1, i + 1))
    pd.DataFrame(
        rows, columns=["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]
    ).to_parquet(tmp_path / "lineitem.parquet")
    return str(tmp_path)


def test_bfs_levels_on_planted_path(spark, tmp_path):
    # Path 0—10—20—30 (each pair co-ordered twice to clear MIN_COOCCUR);
    # 0 is the only seed (node % 50 == 0). Separate component {7,9} has
    # no seed and must be absent from the result.
    sf = _lineitem_baskets(
        tmp_path,
        [[0, 10], [0, 10], [10, 20], [10, 20], [20, 30], [20, 30],
         [7, 9], [7, 9]],
    )
    levels = {
        r.part_key: r.bfs_level
        for r in QUERIES["bfs_reach_part_graph"](spark, sf).collect()
    }
    assert levels == {0: 0, 10: 1, 20: 2, 30: 3}


def test_transition_matrix_planted(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 5, 10, 0, 0)
    m = dt.timedelta(minutes=1)
    sf = _events(
        tmp_path,
        [
            (1, t0, 1, "A", 1.0),
            (2, t0 + m, 1, "B", 1.0),
            (3, t0 + 2 * m, 1, "A", 1.0),
            (4, t0 + 3 * m, 1, "B", 1.0),
            (5, t0 + 4 * m, 1, "C", 1.0),
        ],
    )
    rows = {
        (r.from_type, r.to_type): (r.n_transitions, r.p_transition)
        for r in QUERIES["event_transition_matrix"](spark, sf).collect()
    }
    assert rows == {
        ("A", "B"): (2, 1.0),
        ("B", "A"): (1, 0.5),
        ("B", "C"): (1, 0.5),
    }


def test_transition_probabilities_sum_to_one(spark):
    from .conftest import SF_DIR_SMOKE

    df = QUERIES["event_transition_matrix"](spark, SF_DIR_SMOKE)
    sums = (
        df.groupBy("from_type").sum("p_transition").collect()
    )
    for r in sums:
        assert abs(r[1] - 1.0) < 1e-9, r


def test_decay_weights_are_exact_halvings(spark, tmp_path):
    # Reference date 2024-02-01: an event ON the reference date weighs 1,
    # one exactly 7 days earlier weighs exactly 0.5 (one binary exponent
    # shift, no libm) -> score 10 + 8*0.5 = 14.0 with no float slop.
    sf = _events(
        tmp_path,
        [
            (1, dt.datetime(2024, 2, 1, 0, 0, 0), 1, "x", 10.0),
            (2, dt.datetime(2024, 1, 25, 12, 0, 0), 1, "x", 8.0),
        ],
    )
    row = QUERIES["user_activity_decay"](spark, sf).collect()[0]
    assert row.decayed_score == 14.0
    assert row.n_events == 2
    assert row.last_seen == dt.date(2024, 2, 1)


def test_session_paths_prefix_and_split(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 5, 10, 0, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        (i, t0 + i * m, 1, ty, 1.0)
        for i, ty in enumerate(["a", "b", "c", "d", "e", "f"])
    ]
    # second session, > 30 min after the first ends
    rows += [
        (10, t0 + dt.timedelta(hours=2), 1, "a", 1.0),
        (11, t0 + dt.timedelta(hours=2) + m, 1, "b", 1.0),
    ]
    sf = _events(tmp_path, rows)
    paths = {
        r.path: r.n_sessions
        for r in QUERIES["session_path_topk"](spark, sf).collect()
    }
    # first session truncated to its first 5 events; 'f' never appears
    assert paths == {"a>b>c>d>e": 1, "a>b": 1}


def test_equidepth_buckets_uniform_on_planted_values(spark, tmp_path):
    # Values 1..100: every decile bucket holds exactly 10 rows and the
    # buckets partition the range in order.
    pd.DataFrame(
        {"l_extendedprice": [float(i) for i in range(1, 101)]}
    ).to_parquet(tmp_path / "lineitem.parquet")
    rows = sorted(
        QUERIES["equidepth_price_histogram"](spark, str(tmp_path)).collect(),
        key=lambda r: r.bucket,
    )
    assert [r.bucket for r in rows] == list(range(10))
    assert all(r.n_rows == 10 for r in rows)
    for lo, hi in zip(rows, rows[1:]):
        assert lo.max_price < hi.min_price


def test_distributed_quantiles_match_local_sort(spark, tmp_path):
    # expected uses the quantile_cont formula lo + (hi-lo)*frac — the
    # oracle's form (numpy's _lerp differs in the last ulp for t>=0.5)
    import math

    from tdk_apache_log_etl_spark.operators.relational import (
        _distributed_quantiles,
    )

    rng = [float(x) for x in range(17, 1217, 3)]  # 400 values
    pd.DataFrame({"l_extendedprice": rng}).to_parquet(
        tmp_path / "lineitem.parquet"
    )
    df = spark.read.parquet(str(tmp_path / "lineitem.parquet"))
    qs = [0.25, 0.5, 0.75]
    got = _distributed_quantiles(df, "l_extendedprice", qs).collect()[0][0]
    a = sorted(rng)
    expected = []
    for q in qs:
        pos = q * float(len(a) - 1)
        lo, hi = math.floor(pos), math.ceil(pos)
        expected.append(a[lo] + (a[hi] - a[lo]) * (pos - math.floor(pos)))
    assert got == expected


def test_inverted_index_postings_planted(spark, tmp_path):
    # 'zzz' appears in 6 docs (>= df threshold 5), twice in doc 5;
    # every other token is unique to its doc and must be filtered out.
    rows = [
        (i, f"zzz filler{i}", "en", "src0", 10) for i in range(5)
    ] + [(5, "zzz zzz filler5", "en", "src0", 14)]
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(tmp_path / "documents.parquet")
    rows = QUERIES["inverted_index_postings"](spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.token == "zzz"
    assert r.doc_freq == 6
    assert r.total_tf == 7
    assert r.sample_docs == "0,1,2"


def _documents(tmp_path, texts):
    pd.DataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


def test_bm25_ranks_matching_docs_only(spark, tmp_path):
    # Only docs containing query terms (join/hash/scan) are scored; the
    # doc with more matching terms outranks the single-term doc of the
    # same length.
    sf = _documents(
        tmp_path,
        [
            "join hash scan pad",   # 3 query terms
            "join pad pad pad",     # 1 query term
            "pad pad pad pad",      # 0 -> absent
        ] + ["filler word soup here"] * 5,
    )
    rows = QUERIES["bm25_doc_ranking"](spark, sf).collect()
    ids = [r.doc_id for r in rows]
    assert 2 not in ids and 3 not in ids
    scores = {r.doc_id: r.bm25_score for r in rows}
    assert scores[0] > scores[1] > 0


def test_cooccurrence_lift_planted(spark, tmp_path):
    # 'x' and 'y' always co-occur (df_a=df_b=df_ab=6): lift = N*6/36.
    # 'x' and 'z' never co-occur -> absent.
    sf = _documents(
        tmp_path,
        ["x y"] * 6 + ["z w"] * 6,
    )
    rows = {
        (r.token_a, r.token_b): (r.df_ab, r.lift)
        for r in QUERIES["token_cooccurrence_lift"](spark, sf).collect()
    }
    assert rows == {
        ("x", "y"): (6, 12 * 6 / 36.0),
        ("w", "z"): (6, 12 * 6 / 36.0),
    }


def test_weighted_sample_prefers_heavy_rows(spark, tmp_path):
    # One row's weight dwarfs the rest: it must always be sampled, and
    # the sample is exactly K rows per stratum (here fewer rows than K,
    # so all rows appear, heavy one ranked first).
    t0 = dt.datetime(2024, 1, 5, 10, 0, 0)
    rows = [(i, t0, 1, "t", 1.0) for i in range(10)]
    rows.append((99, t0, 1, "t", 1e9))
    sf = _events(tmp_path, rows)
    got = QUERIES["weighted_sample_events"](spark, sf).collect()
    assert len(got) == 11
    first = min(got, key=lambda r: r.sample_rank)
    assert first.event_id == 99 and first.sample_rank == 1


def test_locf_fills_gap_days_per_user(spark, tmp_path):
    sf = _events(
        tmp_path,
        [
            (1, dt.datetime(2024, 1, 1, 9), 1, "x", 5.0),
            (2, dt.datetime(2024, 1, 1, 18), 1, "x", 7.0),  # day's last
            (3, dt.datetime(2024, 1, 3, 9), 1, "x", 2.0),
            (4, dt.datetime(2024, 1, 4, 9), 2, "x", 9.0),   # sets d1 bound
        ],
    )
    rows = {
        (r.user_id, r.day.isoformat()): (r.value_filled, r.observed)
        for r in QUERIES["user_daily_value_locf"](spark, sf).collect()
    }
    assert rows[(1, "2024-01-01")] == (7.0, True)
    assert rows[(1, "2024-01-02")] == (7.0, False)   # gap inherits
    assert rows[(1, "2024-01-03")] == (2.0, True)
    assert rows[(1, "2024-01-04")] == (2.0, False)
    assert rows[(2, "2024-01-01")] == (None, False)  # before first obs
    assert rows[(2, "2024-01-04")] == (9.0, True)
    assert len(rows) == 8  # 2 users x 4 spine days


def test_benford_digit_counts_and_chi2(spark, tmp_path):
    from tdk_apache_log_etl_spark.operators.logmetrics import _BENFORD_P

    t0 = dt.datetime(2024, 1, 5, 10, 0, 0)
    vals = [1.5, 10.2, 0.19, 2.5]  # first digits 1, 1, 1, 2
    sf = _events(
        tmp_path, [(i, t0, 1, "x", v) for i, v in enumerate(vals)]
    )
    rows = {
        r.digit: r for r in QUERIES["benford_value_audit"](spark, sf).collect()
    }
    assert sorted(rows) == list(range(1, 10))
    assert rows[1].n_values == 3 and rows[2].n_values == 1
    assert all(rows[d].n_values == 0 for d in range(3, 10))
    n = 4
    for d in (1, 9):
        exp = _BENFORD_P[d] * n
        dev = rows[d].n_values - exp
        assert rows[d].chi2_term == dev * dev / exp


def test_favorite_type_tie_breaks_lexicographically(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 5, 10, 0, 0)
    # user 1: 2x "view", 2x "click" -> tie broken to "click";
    # user 2: clear winner "purchase"
    sf = _events(
        tmp_path,
        [
            (1, t0, 1, "view", 1.0),
            (2, t0, 1, "view", 1.0),
            (3, t0, 1, "click", 1.0),
            (4, t0, 1, "click", 1.0),
            (5, t0, 2, "purchase", 1.0),
            (6, t0, 2, "view", 1.0),
            (7, t0, 2, "purchase", 1.0),
        ],
    )
    rows = {
        r.user_id: (r.favorite_type, r.n_events)
        for r in QUERIES["user_favorite_event_type"](spark, sf).collect()
    }
    assert rows == {1: ("click", 2), 2: ("purchase", 2)}


def test_props_key_histogram_counts_keys(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 5, 10, 0, 0)
    rows = [
        (1, t0, 1, "x", 1.0),
        (2, t0, 1, "x", 1.0),
        (3, t0, 1, "x", 1.0),
    ]
    pd.DataFrame(
        [
            (1, t0, 1, "x", 1.0, '{"a": 1, "b": 2}'),
            (2, t0, 1, "x", 1.0, '{"a": 3}'),
            (3, t0, 1, "x", 1.0, "{}"),
        ],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    got = {
        r.prop_key: r.n_events
        for r in QUERIES["props_key_histogram"](spark, str(tmp_path)).collect()
    }
    assert got == {"a": 2, "b": 1}


def test_last_touch_attribution_planted(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 5, 10, 0, 0)
    m = dt.timedelta(minutes=1)
    sf = _events(
        tmp_path,
        [
            (1, t0, 1, "view", 1.0),
            (2, t0 + m, 1, "purchase", 1.0),        # -> view
            (3, t0 + 2 * m, 1, "purchase", 1.0),    # -> still view,
                                                    #    not the purchase
            (4, t0, 2, "purchase", 1.0),            # no prior -> (none)
            (5, t0 + m, 2, "click", 1.0),
            (6, t0 + 2 * m, 2, "purchase", 1.0),    # -> click
        ],
    )
    got = {
        r.touch_type: r.n_purchases
        for r in QUERIES["purchase_attribution_last_touch"](
            spark, sf
        ).collect()
    }
    assert got == {"view": 2, "(none)": 1, "click": 1}


def test_month_over_month_change(spark, tmp_path):
    rows = []
    # 10 orders in Jan, 15 in Feb, 12 in Mar
    oid = 0
    for month, n in ((1, 10), (2, 15), (3, 12)):
        for _ in range(n):
            rows.append(
                (oid, 1, "O", 10.0, dt.datetime(2024, month, 5), "1-URGENT")
            )
            oid += 1
    df = pd.DataFrame(
        rows,
        columns=[
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority",
        ],
    )
    # the driver fixture stores o_orderdate as timestamp[ms]; plain
    # pandas would write TIMESTAMP(NANOS), which Spark 4 rejects
    df["o_orderdate"] = df["o_orderdate"].astype("datetime64[ms]")
    df.to_parquet(tmp_path / "orders.parquet")
    got = {
        r.month.isoformat(): (r.n_orders, r.prev_orders, r.mom_change)
        for r in QUERIES["orders_month_over_month"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got["2024-01-01"] == (10, None, None)
    assert got["2024-02-01"] == (15, 10, 0.5)
    assert got["2024-03-01"] == (12, 15, (12 - 15) / 15)


def test_referential_integrity_flags_planted_violations(spark, tmp_path):
    orders = pd.DataFrame(
        [
            (1, 100, "O", 1.0, dt.datetime(2024, 1, 5), "x"),
            (1, 100, "O", 1.0, dt.datetime(2024, 1, 5), "x"),  # dup PK
            (2, 999, "O", 1.0, dt.datetime(2024, 1, 5), "x"),  # orphan cust
        ],
        columns=[
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority",
        ],
    )
    orders["o_orderdate"] = orders["o_orderdate"].astype("datetime64[ms]")
    orders.to_parquet(tmp_path / "orders.parquet")
    pd.DataFrame(
        [(100, "c", 0, 0.0, "SEG")],
        columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal",
                 "c_mktsegment"],
    ).to_parquet(tmp_path / "customer.parquet")
    pd.DataFrame(
        [(1, 10, 1, 1), (7, 10, 1, 1)],  # orderkey 7 is orphaned
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
    ).to_parquet(tmp_path / "lineitem.parquet")
    got = {
        r.check_name: r.n_violations
        for r in QUERIES["referential_integrity_audit"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {
        "dup_order_keys": 1,
        "orphan_lineitems": 1,
        "orphan_orders": 1,
        "null_order_keys": 0,
    }


def test_novelty_curve_planted(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 5, 10, 0, 0)
    m = dt.timedelta(minutes=1)
    sf = _events(
        tmp_path,
        [
            (1, t0, 1, "a", 1.0),          # new -> 1
            (2, t0 + m, 1, "a", 1.0),      # seen -> 1
            (3, t0 + 2 * m, 1, "b", 1.0),  # new -> 2
            (4, t0 + 3 * m, 1, "a", 1.0),  # seen -> 2
            (5, t0 + 4 * m, 1, "c", 1.0),  # new -> 3
        ],
    )
    got = {
        r.event_id: r.distinct_types_so_far
        for r in QUERIES["user_novelty_curve"](spark, sf).collect()
    }
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 3}


def test_disc_quartiles_are_actual_data_values(spark, tmp_path):
    # 1..100: quantile_disc picks order statistics (25, 50, 75), never
    # interpolated values
    pd.DataFrame(
        {"l_extendedprice": [float(i) for i in range(1, 101)]}
    ).to_parquet(tmp_path / "lineitem.parquet")
    got = {
        r.q: r.price
        for r in QUERIES["price_quartiles_disc"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {0.25: 25.0, 0.5: 50.0, 0.75: 75.0}
