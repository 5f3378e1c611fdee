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


def test_datasheet_card_planted(spark, tmp_path):
    long_text = " ".join(f"w{i}" for i in range(25))
    docs = [
        (1, "a b c", "en", "s1"),
        (2, "a b c", "en", "s1"),  # exact duplicate of doc 1
        (3, "a b", "fr", "s2"),
        (4, long_text, "en", "s2"),
    ]
    pd.DataFrame(
        docs, columns=["doc_id", "text", "lang", "source"]
    ).to_parquet(tmp_path / "documents.parquet")
    [r] = QUERIES["corpus_datasheet_card"](spark, str(tmp_path)).collect()
    assert (r.n_docs, r.n_unique_docs) == (4, 3)
    assert r.dup_rate == 0.25
    assert r.total_tokens == 33
    assert r.mean_doc_tokens == 8.25
    assert r.short_doc_share == 0.75
    assert r.n_langs == 2
    assert r.vocab_size == 28  # {a, b, c} + w0..w24
    ok, detail = compare(
        spark,
        "corpus_datasheet_card",
        QUERIES["corpus_datasheet_card"],
        ORACLES["corpus_datasheet_card"],
        str(tmp_path),
    )
    assert ok, detail


def test_welch_hand_computed(spark, tmp_path):
    # purchase [1,2,3] (mean 2, var 1) vs view [2,4,6] (mean 4, var 4):
    # t = -2 / sqrt(5/3), df = (25/9) / (17/18) = 50/17
    rows = []
    for i, v in enumerate([1.0, 2.0, 3.0]):
        rows.append((i, dt.datetime(2026, 5, 1, 9), i, "purchase", v, "{}"))
    for i, v in enumerate([2.0, 4.0, 6.0]):
        rows.append((10 + i, dt.datetime(2026, 5, 1, 9), i, "view", v, "{}"))
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    [r] = QUERIES["welch_ttest_purchase_view"](spark, str(tmp_path)).collect()
    assert (r.n_purchase, r.n_view) == (3, 3)
    assert (r.mean_purchase, r.mean_view, r.mean_diff) == (2.0, 4.0, -2.0)
    assert abs(r.t_stat - (-2.0 / (5.0 / 3.0) ** 0.5)) < 1e-12
    assert abs(r.welch_df - 50.0 / 17.0) < 1e-12
    ok, detail = compare(
        spark,
        "welch_ttest_purchase_view",
        QUERIES["welch_ttest_purchase_view"],
        ORACLES["welch_ttest_purchase_view"],
        str(tmp_path),
    )
    assert ok, detail


def test_best_split_perfect_separation(spark, tmp_path):
    # values 1,2 are non-purchase; 3,4 are purchase -> threshold <=2
    # separates perfectly (weighted gini 0), and beats the 0.333 of
    # the off-by-one splits.
    rows = [
        (1, dt.datetime(2026, 5, 1, 9), 1, "view", 1.0, "{}"),
        (2, dt.datetime(2026, 5, 1, 9), 2, "click", 2.0, "{}"),
        (3, dt.datetime(2026, 5, 1, 9), 3, "purchase", 3.0, "{}"),
        (4, dt.datetime(2026, 5, 1, 9), 4, "purchase", 4.0, "{}"),
    ]
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    [r] = QUERIES["best_split_value_for_purchase"](
        spark, str(tmp_path)
    ).collect()
    assert r.split_value == 2.0
    assert (r.n_left, r.n_right) == (2, 2)
    assert r.weighted_gini == 0.0
    ok, detail = compare(
        spark,
        "best_split_value_for_purchase",
        QUERIES["best_split_value_for_purchase"],
        ORACLES["best_split_value_for_purchase"],
        str(tmp_path),
    )
    assert ok, detail


def test_cmh_balanced_strata_chi2_zero(spark, tmp_path):
    # Within every hour band the two arms convert identically -> every
    # stratum's a_k equals its expectation -> chi2 = 0 exactly.
    rows = []
    eid = 0
    for hour in (0, 8, 16):
        for uid, etype in [
            (0, "purchase"),
            (0, "view"),
            (1, "purchase"),
            (1, "view"),
        ]:
            rows.append(
                (eid, dt.datetime(2026, 5, 1, hour), uid, etype, 1.0, "{}")
            )
            eid += 1
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    [r] = QUERIES["cmh_conversion_by_hour_band"](
        spark, str(tmp_path)
    ).collect()
    assert (r.a0, r.n1_0, r.m1_0, r.n_0) == (1, 2, 2, 4)
    assert r.cmh_chi2 == 0.0
    ok, detail = compare(
        spark,
        "cmh_conversion_by_hour_band",
        QUERIES["cmh_conversion_by_hour_band"],
        ORACLES["cmh_conversion_by_hour_band"],
        str(tmp_path),
    )
    assert ok, detail


def test_unigram_sampling_hand_computed(spark, tmp_path):
    # counts: a=4, b=1. w_int(a) = floor(4^0.75*100+0.5) = 283,
    # w_int(b) = 100, Z = 383; T=5, f_a=0.8, f_b=0.2.
    pd.DataFrame(
        [(1, "a a a a b", "en", "s1")],
        columns=["doc_id", "text", "lang", "source"],
    ).to_parquet(tmp_path / "documents.parquet")
    rows = {
        r.token: r
        for r in QUERIES["unigram_sampling_table"](
            spark, str(tmp_path)
        ).collect()
    }
    assert rows["a"].w_int == 283
    assert rows["b"].w_int == 100
    assert rows["a"].neg_sample_prob == 283.0 / 383.0
    t = 1e-4
    for tok, f in (("a", 0.8), ("b", 0.2)):
        expect = min(1.0, ((f / t) ** 0.5 + 1.0) * t / f)
        assert abs(rows[tok].keep_prob - expect) < 1e-12
    ok, detail = compare(
        spark,
        "unigram_sampling_table",
        QUERIES["unigram_sampling_table"],
        ORACLES["unigram_sampling_table"],
        str(tmp_path),
    )
    assert ok, detail


def test_temporal_leakage_planted_overlap(spark, tmp_path):
    # span Jan 1..Jan 10 -> midpoint Jan 5. user 1 active both halves,
    # user 2 train-only, user 3 val-only -> overlap 1 of 2 val users.
    rows = [
        (1, dt.datetime(2026, 1, 1, 9), 1, "view", 1.0, "{}"),
        (2, dt.datetime(2026, 1, 9, 9), 1, "view", 1.0, "{}"),
        (3, dt.datetime(2026, 1, 1, 12), 2, "view", 1.0, "{}"),
        (4, dt.datetime(2026, 1, 10, 12), 3, "view", 1.0, "{}"),
    ]
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    [r] = QUERIES["temporal_split_leakage_audit"](
        spark, str(tmp_path)
    ).collect()
    assert (r.n_train_users, r.n_val_users, r.n_overlap_users) == (2, 2, 1)
    assert r.overlap_share == 0.5
    ok, detail = compare(
        spark,
        "temporal_split_leakage_audit",
        QUERIES["temporal_split_leakage_audit"],
        ORACLES["temporal_split_leakage_audit"],
        str(tmp_path),
    )
    assert ok, detail


def test_auc_perfect_and_tied(spark, tmp_path):
    # perfect separation: purchases all score above non-purchases -> 1.0
    rows = [
        (1, dt.datetime(2026, 5, 1, 9), 1, "view", 1.0, "{}"),
        (2, dt.datetime(2026, 5, 1, 9), 2, "view", 2.0, "{}"),
        (3, dt.datetime(2026, 5, 1, 9), 3, "purchase", 3.0, "{}"),
        (4, dt.datetime(2026, 5, 1, 9), 4, "purchase", 4.0, "{}"),
    ]
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    [r] = QUERIES["value_auc_for_purchase"](spark, str(tmp_path)).collect()
    assert (r.n_pos, r.n_neg) == (2, 2)
    assert r.auc == 1.0
    assert r.gini_coef == 1.0
    # ties: pos [2], neg [1, 2] -> pairs (2>1)=1, (2=2)=0.5 -> AUC 0.75
    tied = tmp_path / "tied"
    tied.mkdir()
    rows = [
        (1, dt.datetime(2026, 5, 1, 9), 1, "purchase", 2.0, "{}"),
        (2, dt.datetime(2026, 5, 1, 9), 2, "view", 1.0, "{}"),
        (3, dt.datetime(2026, 5, 1, 9), 3, "view", 2.0, "{}"),
    ]
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tied / "events.parquet")
    [r] = QUERIES["value_auc_for_purchase"](spark, str(tied)).collect()
    assert r.auc == 0.75
    ok, detail = compare(
        spark,
        "value_auc_for_purchase",
        QUERIES["value_auc_for_purchase"],
        ORACLES["value_auc_for_purchase"],
        str(tied),
    )
    assert ok, detail


def test_business_day_lag_weekend_aware(spark, tmp_path):
    # 2026-01-02 is a Friday. Fri->Mon spans only 1 business day;
    # Mon->Fri spans 4; same-day is 0.
    pd.DataFrame(
        [
            (1, dt.date(2026, 1, 2), "1-URGENT"),   # Friday
            (2, dt.date(2026, 1, 5), "2-HIGH"),     # Monday
            (3, dt.date(2026, 1, 7), "3-MEDIUM"),   # Wednesday
        ],
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).to_parquet(tmp_path / "orders.parquet")
    pd.DataFrame(
        [
            (1, dt.datetime(2026, 1, 5, 8)),   # Fri -> Mon: 1
            (2, dt.datetime(2026, 1, 9, 8)),   # Mon -> Fri: 4
            (3, dt.datetime(2026, 1, 7, 8)),   # same day: 0
        ],
        columns=["l_orderkey", "l_shipdate"],
    ).to_parquet(
        tmp_path / "lineitem.parquet",
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )
    got = {
        r.priority: r
        for r in QUERIES["business_day_ship_lag"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got["1-URGENT"].mean_bd_lag == 1.0
    assert got["2-HIGH"].mean_bd_lag == 4.0
    assert got["3-MEDIUM"].mean_bd_lag == 0.0
    ok, detail = compare(
        spark,
        "business_day_ship_lag",
        QUERIES["business_day_ship_lag"],
        ORACLES["business_day_ship_lag"],
        str(tmp_path),
    )
    assert ok, detail


def test_ktruss_clique_survives_pendant_pruned(spark, tmp_path):
    # 4-clique {0,1,2,3}: every edge sits in 2 triangles -> survives the
    # 4-truss. Pendant edge (4,5): support 0 -> pruned round 1.
    rows = []
    okey = 0
    for basket in [[0, 1, 2, 3]] * 2 + [[4, 5]] * 2:
        for i, part in enumerate(basket):
            rows.append((okey, part, 1, i + 1))
        okey += 1
    pd.DataFrame(
        rows, columns=["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]
    ).to_parquet(tmp_path / "lineitem.parquet")
    rows = QUERIES["ktruss_part_graph"](spark, str(tmp_path)).collect()
    got = {(r.part_a, r.part_b): r.support for r in rows}
    expected_edges = {
        (a, b) for a in range(4) for b in range(4) if a < b
    }
    assert set(got) == expected_edges
    assert all(s == 2 for s in got.values())


def test_burstiness_planted_classes(spark, tmp_path):
    # user 1: constant 600 s gaps (CV=0, regular); user 2: gaps
    # [1, 1, 10000] s (CV~1.73, bursty); user 3: two zero gaps
    # (zero mean -> NULL CV -> degenerate).
    rows = []
    eid = 0
    base = dt.datetime(2026, 5, 1, 9, 0, 0)
    for k in range(4):  # user 1: purchases every 600 s
        rows.append(
            (eid, base + dt.timedelta(seconds=600 * k), 1, "purchase", 1.0, "{}")
        )
        eid += 1
    for secs in [0, 1, 2, 10002]:  # user 2: gaps 1, 1, 10000
        rows.append(
            (eid, base + dt.timedelta(seconds=secs), 2, "purchase", 1.0, "{}")
        )
        eid += 1
    for _ in range(3):  # user 3: three purchases same instant
        rows.append((eid, base, 3, "purchase", 1.0, "{}"))
        eid += 1
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    [r] = QUERIES["interpurchase_burstiness"](spark, str(tmp_path)).collect()
    assert r.n_users_scored == 3
    assert r.n_regular == 1
    assert r.n_bursty == 1
    assert r.n_degenerate == 1
    assert r.n_moderate == 0
    ok, detail = compare(
        spark,
        "interpurchase_burstiness",
        QUERIES["interpurchase_burstiness"],
        ORACLES["interpurchase_burstiness"],
        str(tmp_path),
    )
    assert ok, detail


def test_epoch_shards_conserve_and_mirror(spark, tmp_path):
    docs = [
        (i, " ".join(["w"] * (i + 1)), "en", "s1", 5 * (i + 1))
        for i in range(50)
    ]
    pd.DataFrame(
        docs, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(tmp_path / "documents.parquet")
    rows = QUERIES["epoch_shard_assignment"](spark, str(tmp_path)).collect()
    # conservation: every doc and token lands in exactly one shard
    assert sum(r.n_docs for r in rows) == 50
    assert sum(r.n_tokens for r in rows) == sum(i + 1 for i in range(50))
    # python mirror of the salted Knuth hash
    from tdk_apache_log_etl_spark.operators.mlprep import (
        _KNUTH_A,
        N_SHARDS,
        SHUFFLE_EPOCH,
    )

    expect = {}
    for i in range(50):
        s = (((i + SHUFFLE_EPOCH * 1000003) * _KNUTH_A) % 2**32) % N_SHARDS
        expect[s] = expect.get(s, 0) + 1
    assert {r.shard: r.n_docs for r in rows} == expect
    ok, detail = compare(
        spark,
        "epoch_shard_assignment",
        QUERIES["epoch_shard_assignment"],
        ORACLES["epoch_shard_assignment"],
        str(tmp_path),
    )
    assert ok, detail


def test_length_histogram_power_of_two_edges(spark, tmp_path):
    docs = [
        (1, " ".join(["w"] * 7), "en", "sA"),   # 7 tokens -> bucket 2
        (2, " ".join(["w"] * 8), "en", "sA"),   # 8 tokens -> bucket 3
        (3, "w", "en", "sB"),                   # 1 token  -> bucket 0
    ]
    pd.DataFrame(
        docs, columns=["doc_id", "text", "lang", "source"]
    ).to_parquet(tmp_path / "documents.parquet")
    rows = {
        (r.source, r.bucket): r.n_docs
        for r in QUERIES["doc_length_log2_histogram"](
            spark, str(tmp_path)
        ).collect()
    }
    assert rows == {("sA", 2): 1, ("sA", 3): 1, ("sB", 0): 1}


def test_mixture_epoch_plan_hand_computed(spark, tmp_path):
    # src0: 100 tokens, src1: 50 tokens; budget = 5*150 = 750.
    # weights 10/55 and 9/55 -> targets 136.36.., 122.72..;
    # epochs src1 = 122.72../50 = 2.45..; src0 = 1.36.. (neither flagged)
    docs = [
        (1, " ".join(["w"] * 100), "en", "src0"),
        (2, " ".join(["w"] * 50), "en", "src1"),
    ]
    pd.DataFrame(
        docs, columns=["doc_id", "text", "lang", "source"]
    ).to_parquet(tmp_path / "documents.parquet")
    got = {
        r.source: r
        for r in QUERIES["mixture_epoch_plan"](spark, str(tmp_path)).collect()
    }
    assert got["src0"].src_tokens == 100
    assert abs(got["src0"].target_tokens - 750 * 10 / 55) < 1e-9
    assert abs(got["src1"].epochs_needed - 750 * 9 / 55 / 50) < 1e-9
    assert not got["src0"].over_repetition_cap
    ok, detail = compare(
        spark,
        "mixture_epoch_plan",
        QUERIES["mixture_epoch_plan"],
        ORACLES["mixture_epoch_plan"],
        str(tmp_path),
    )
    assert ok, detail


def test_neyman_allocates_to_noisy_stratum(spark, tmp_path):
    # Two strata, equal size 4: type A constant value (SD 0), type B
    # spread (SD 2 over [1,3,5,7] -> sd=sqrt(20/3)=2.582). Neyman gives
    # ALL budget to B; proportional would have split 50/50.
    rows = []
    eid = 0
    for v in [5.0, 5.0, 5.0, 5.0]:
        rows.append((eid, dt.datetime(2026, 5, 1, 9), eid, "view", v, "{}"))
        eid += 1
    for v in [1.0, 3.0, 5.0, 7.0]:
        rows.append(
            (eid, dt.datetime(2026, 5, 1, 9), eid, "purchase", v, "{}")
        )
        eid += 1
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    got = {
        r.event_type: r
        for r in QUERIES["neyman_allocation_by_type"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got["view"].sd_value == 0.0
    assert got["view"].n_sampled == 0
    assert got["purchase"].alloc_share == 1.0
    assert got["purchase"].n_sampled == 10000
    assert abs(got["purchase"].sd_value - (20.0 / 3.0) ** 0.5) < 1e-9
    ok, detail = compare(
        spark,
        "neyman_allocation_by_type",
        QUERIES["neyman_allocation_by_type"],
        ORACLES["neyman_allocation_by_type"],
        str(tmp_path),
    )
    assert ok, detail


def test_cross_source_duplication_planted(spark, tmp_path):
    # srcA: {X, Y}; srcB: {X, Z}; srcC: {W}. Shared: (A,B) share X only.
    docs = [
        (1, "X X X", "en", "srcA"),
        (2, "Y Y", "en", "srcA"),
        (3, "X X X", "en", "srcB"),
        (4, "Z", "en", "srcB"),
        (5, "W", "en", "srcC"),
    ]
    pd.DataFrame(
        docs, columns=["doc_id", "text", "lang", "source"]
    ).to_parquet(tmp_path / "documents.parquet")
    rows = QUERIES["cross_source_duplication"](spark, str(tmp_path)).collect()
    assert len(rows) == 1
    [r] = rows
    assert (r.src_a, r.src_b, r.n_shared_hashes) == ("srcA", "srcB", 1)
    assert r.share_of_a == 0.5
    assert r.share_of_b == 0.5
    # cluster-size histogram on the same fixture: X appears twice
    hist = {
        r.cluster_size: r
        for r in QUERIES["dup_cluster_size_histogram"](
            spark, str(tmp_path)
        ).collect()
    }
    assert hist[2].n_clusters == 1 and hist[2].n_removable == 1
    assert hist[1].n_clusters == 3


def test_duplicate_charges_planted(spark, tmp_path):
    pd.DataFrame(
        [
            (1, 1, 100.0, dt.date(2026, 1, 10)),   # pair with 2 (+1 day)
            (2, 1, 100.0, dt.date(2026, 1, 11)),
            (3, 1, 100.0, dt.date(2026, 1, 20)),   # too far from 1/2
            (4, 1, 200.0, dt.date(2026, 1, 10)),   # different amount
            (5, 2, 100.0, dt.date(2026, 1, 10)),   # different customer
        ],
        columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"],
    ).to_parquet(tmp_path / "orders.parquet")
    rows = QUERIES["duplicate_charge_candidates"](
        spark, str(tmp_path)
    ).collect()
    assert len(rows) == 1
    [r] = rows
    assert (r.custkey, r.orderkey_a, r.orderkey_b, r.day_gap) == (1, 1, 2, 1)
    assert r.amount == 100.0
    ok, detail = compare(
        spark,
        "duplicate_charge_candidates",
        QUERIES["duplicate_charge_candidates"],
        ORACLES["duplicate_charge_candidates"],
        str(tmp_path),
    )
    assert ok, detail


def test_mix_drift_identical_halves_zero(spark, tmp_path):
    # same type mix in both calendar halves -> chi2 == 0 exactly
    rows = []
    eid = 0
    for day in (1, 20):  # first and second half
        for etype, cnt in [("view", 4), ("purchase", 2)]:
            for _ in range(cnt):
                rows.append(
                    (eid, dt.datetime(2026, 1, day, 9), eid, etype, 1.0, "{}")
                )
                eid += 1
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    [r] = QUERIES["event_type_mix_drift"](spark, str(tmp_path)).collect()
    assert (r.n_events, r.n_types, r.dof) == (12, 2, 1)
    assert r.chi2 == 0.0
    ok, detail = compare(
        spark,
        "event_type_mix_drift",
        QUERIES["event_type_mix_drift"],
        ORACLES["event_type_mix_drift"],
        str(tmp_path),
    )
    assert ok, detail


def test_position_attribution_u_shape(spark, tmp_path):
    # journey 1 (user 1): view,click,signup,view -> purchase
    #   k=4: first view 400000, last view 400000, click/signup 100000 each
    # journey 2 (user 2): click -> purchase: k=1 -> click 1000000
    # user 3: touches but NO purchase -> nothing credited
    rows = []
    eid = 0
    base = dt.datetime(2026, 5, 1, 9, 0, 0)
    for i, et in enumerate(["view", "click", "signup", "view", "purchase"]):
        rows.append((eid, base + dt.timedelta(minutes=i), 1, et, 1.0, "{}"))
        eid += 1
    for i, et in enumerate(["click", "purchase"]):
        rows.append((eid, base + dt.timedelta(minutes=i), 2, et, 1.0, "{}"))
        eid += 1
    rows.append((eid, base, 3, "view", 1.0, "{}"))
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    got = {
        r.touch_type: r.credit_scaled
        for r in QUERIES["position_based_attribution"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {"view": 800000, "click": 1100000, "signup": 100000}
    ok, detail = compare(
        spark,
        "position_based_attribution",
        QUERIES["position_based_attribution"],
        ORACLES["position_based_attribution"],
        str(tmp_path),
    )
    assert ok, detail


def test_markov_baseline_planted(spark, tmp_path):
    # user 1: view->click, view->click, view->signup (majority successor
    # of view = click, 2/3 correct); plus click->view, click->view... 
    # build: v c v c v s  => transitions: v->c, c->v, v->c, c->v, v->s
    # src v: {c:2, s:1} best 2 of 3; src c: {v:2} best 2 of 2
    # total 5 transitions, 4 majority-correct -> accuracy 0.8
    seq = ["view", "click", "view", "click", "view", "signup"]
    rows = [
        (i, dt.datetime(2026, 5, 1, 9, i), 1, et, 1.0, "{}")
        for i, et in enumerate(seq)
    ]
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    [r] = QUERIES["markov_baseline_accuracy"](spark, str(tmp_path)).collect()
    assert (r.n_transitions, r.n_correct_majority) == (5, 4)
    assert r.baseline_accuracy == 0.8
    ok, detail = compare(
        spark,
        "markov_baseline_accuracy",
        QUERIES["markov_baseline_accuracy"],
        ORACLES["markov_baseline_accuracy"],
        str(tmp_path),
    )
    assert ok, detail


def test_mase_baselines_planted(spark, tmp_path):
    # 9 days of revenue [10,20]*4 + [10]: naive AE = |±10| x 8 -> MAE 10;
    # seasonal-naive (lag 7) compares d8 vs d1 (20 vs 10 -> 10) and
    # d9 vs d2 (10 vs 20 -> 10) -> MAE 10; ratio 1.0
    rows = []
    for i in range(9):
        price = 10.0 if i % 2 == 0 else 20.0
        rows.append((i, dt.date(2026, 1, 1 + i), price))
    pd.DataFrame(
        rows, columns=["o_orderkey", "o_orderdate", "o_totalprice"]
    ).to_parquet(tmp_path / "orders.parquet")
    [r] = QUERIES["daily_revenue_mase_baselines"](
        spark, str(tmp_path)
    ).collect()
    assert (r.n_naive, r.n_seasonal) == (8, 2)
    assert r.mae_naive == 10.0
    assert r.mae_seasonal_naive == 10.0
    assert r.seasonal_vs_naive_ratio == 1.0
    ok, detail = compare(
        spark,
        "daily_revenue_mase_baselines",
        QUERIES["daily_revenue_mase_baselines"],
        ORACLES["daily_revenue_mase_baselines"],
        str(tmp_path),
    )
    assert ok, detail


def test_acquisition_conversion_planted(spark, tmp_path):
    # user 1: view first, purchases later -> converted view-cohort user
    # user 2: view first, never purchases -> unconverted
    # user 3: purchase FIRST -> purchase cohort, NOT converted-later
    rows = [
        (1, dt.datetime(2026, 1, 1, 9), 1, "view", 1.0, "{}"),
        (2, dt.datetime(2026, 1, 2, 9), 1, "purchase", 1.0, "{}"),
        (3, dt.datetime(2026, 1, 1, 9), 2, "view", 1.0, "{}"),
        (4, dt.datetime(2026, 1, 1, 9), 3, "purchase", 1.0, "{}"),
    ]
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    got = {
        r.acquisition_type: r
        for r in QUERIES["acquisition_channel_conversion"](
            spark, str(tmp_path)
        ).collect()
    }
    assert (got["view"].n_users, got["view"].n_converted_later) == (2, 1)
    assert got["view"].conversion_rate == 0.5
    assert (
        got["purchase"].n_users,
        got["purchase"].n_converted_later,
    ) == (1, 0)
    ok, detail = compare(
        spark,
        "acquisition_channel_conversion",
        QUERIES["acquisition_channel_conversion"],
        ORACLES["acquisition_channel_conversion"],
        str(tmp_path),
    )
    assert ok, detail


def test_sla_attainment_boundary(spark, tmp_path):
    # URGENT SLA = 3 business days. Mon 1/5 -> Thu 1/8 is exactly 3
    # (within); Mon -> Fri is 4 (breach). Attainment 0.5.
    pd.DataFrame(
        [
            (1, dt.date(2026, 1, 5), "1-URGENT"),
            (2, dt.date(2026, 1, 5), "1-URGENT"),
        ],
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).to_parquet(tmp_path / "orders.parquet")
    pd.DataFrame(
        [
            (1, dt.datetime(2026, 1, 8, 8)),
            (2, dt.datetime(2026, 1, 9, 8)),
        ],
        columns=["l_orderkey", "l_shipdate"],
    ).to_parquet(
        tmp_path / "lineitem.parquet",
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )
    [r] = QUERIES["priority_sla_attainment"](spark, str(tmp_path)).collect()
    assert (r.priority, r.sla_bdays, r.n_lines, r.n_within_sla) == (
        "1-URGENT",
        3,
        2,
        1,
    )
    assert r.attainment == 0.5
    ok, detail = compare(
        spark,
        "priority_sla_attainment",
        QUERIES["priority_sla_attainment"],
        ORACLES["priority_sla_attainment"],
        str(tmp_path),
    )
    assert ok, detail


def test_wedge_budget_hand_computed(spark, tmp_path):
    # two baskets of 3 and one of 1: pairs = 2*3*2 + 0 = 12
    rows = []
    for okey, k in [(1, 3), (2, 3), (3, 1)]:
        for i in range(k):
            rows.append((okey, 100 * okey + i, 1, i + 1))
    pd.DataFrame(
        rows, columns=["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]
    ).to_parquet(tmp_path / "lineitem.parquet")
    got = {
        r.basket_size: r
        for r in QUERIES["basket_size_wedge_budget"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got[3].n_orders == 2 and got[3].pair_budget == 12
    assert got[1].pair_budget == 0
    assert got[3].total_pair_budget == 12
    ok, detail = compare(
        spark,
        "basket_size_wedge_budget",
        QUERIES["basket_size_wedge_budget"],
        ORACLES["basket_size_wedge_budget"],
        str(tmp_path),
    )
    assert ok, detail


def test_churn_ladder_planted(spark, tmp_path):
    # corpus end = day 100. user1 last day 100 (never churned),
    # user2 last day 50 (inactive 50d: churned at 30, not at 60/90),
    # user3 last day 5 (churned at all three)
    rows = [
        (1, dt.datetime(2026, 1, 1, 9) + dt.timedelta(days=99), 1, "view", 1.0, "{}"),
        (2, dt.datetime(2026, 1, 1, 9) + dt.timedelta(days=49), 2, "view", 1.0, "{}"),
        (3, dt.datetime(2026, 1, 1, 9) + dt.timedelta(days=4), 3, "view", 1.0, "{}"),
    ]
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    got = {
        r.window_days: r
        for r in QUERIES["inactivity_churn_rates"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got[30].n_churned == 2
    assert got[60].n_churned == 1
    assert got[90].n_churned == 1
    assert got[30].churn_rate == 2.0 / 3.0
    ok, detail = compare(
        spark,
        "inactivity_churn_rates",
        QUERIES["inactivity_churn_rates"],
        ORACLES["inactivity_churn_rates"],
        str(tmp_path),
    )
    assert ok, detail


def test_wilson_ranking_penalizes_small_n(spark, tmp_path):
    # supplier 1: 2/2 on time (rate 1.0); supplier 2: 95/100 on time.
    # Raw rate ranks 1 first; the Wilson lower bound ranks 2 first.
    orders = [(i, dt.date(2026, 1, 5)) for i in range(1, 103)]
    pd.DataFrame(
        orders, columns=["o_orderkey", "o_orderdate"]
    ).to_parquet(tmp_path / "orders.parquet")
    lines = []
    # supplier 1: 2 on-time lines (same-day ship)
    for okey in (1, 2):
        lines.append((okey, 1, dt.datetime(2026, 1, 5, 8)))
    # supplier 2: 95 on-time + 5 late (30 days out)
    for i, okey in enumerate(range(3, 103)):
        ship = dt.datetime(2026, 1, 5, 8) if i < 95 else dt.datetime(
            2026, 2, 20, 8
        )
        lines.append((okey, 2, ship))
    pd.DataFrame(
        lines, columns=["l_orderkey", "l_suppkey", "l_shipdate"]
    ).to_parquet(
        tmp_path / "lineitem.parquet",
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )
    rows = QUERIES["supplier_ontime_wilson_ranking"](
        spark, str(tmp_path)
    ).collect()
    assert rows[0].suppkey == 2  # 95/100 beats 2/2 on the lower bound
    assert rows[1].suppkey == 1
    assert rows[1].rate == 1.0  # ...even though its raw rate is higher
    assert rows[0].wilson_lb > rows[1].wilson_lb
    ok, detail = compare(
        spark,
        "supplier_ontime_wilson_ranking",
        QUERIES["supplier_ontime_wilson_ranking"],
        ORACLES["supplier_ontime_wilson_ranking"],
        str(tmp_path),
    )
    assert ok, detail


def test_freshness_staleness_planted(spark, tmp_path):
    rows = [
        (1, dt.datetime(2026, 1, 10, 12, 0, 0), 1, "view", 1.0, "{}"),
        (2, dt.datetime(2026, 1, 8, 12, 0, 0), 2, "error", 1.0, "{}"),
    ]
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    got = {
        r.event_type: r
        for r in QUERIES["type_freshness_staleness"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got["view"].staleness_secs == 0
    assert not got["view"].stale_over_1d
    assert got["error"].staleness_secs == 2 * 86400
    assert got["error"].stale_over_1d
    ok, detail = compare(
        spark,
        "type_freshness_staleness",
        QUERIES["type_freshness_staleness"],
        ORACLES["type_freshness_staleness"],
        str(tmp_path),
    )
    assert ok, detail


def test_lang_source_association_extremes(spark, tmp_path):
    # perfectly separated: each source carries exactly one language ->
    # V = 1.0; the 2x2 grid is balanced so chi2 = n.
    docs = [
        (1, "a", "en", "sA"),
        (2, "b", "en", "sA"),
        (3, "c", "fr", "sB"),
        (4, "d", "fr", "sB"),
    ]
    pd.DataFrame(
        docs, columns=["doc_id", "text", "lang", "source"]
    ).to_parquet(tmp_path / "documents.parquet")
    [r] = QUERIES["lang_source_association"](spark, str(tmp_path)).collect()
    assert (r.n_docs, r.n_langs, r.n_sources) == (4, 2, 2)
    assert r.chi2 == 4.0
    assert r.cramers_v == 1.0
    ok, detail = compare(
        spark,
        "lang_source_association",
        QUERIES["lang_source_association"],
        ORACLES["lang_source_association"],
        str(tmp_path),
    )
    assert ok, detail


def test_hhi_bands_planted(spark, tmp_path):
    # part 1: one supplier -> single-sourced (HHI 1.0);
    # part 2: two equal suppliers -> HHI 0.5 -> highly-concentrated;
    # part 3: ten equal suppliers -> HHI 0.1 -> diversified
    rows = []
    rows.append((1, 1, 100, 1, 5.0))
    rows.append((2, 2, 200, 1, 5.0))
    rows.append((3, 2, 201, 1, 5.0))
    for s in range(10):
        rows.append((10 + s, 3, 300 + s, 1, 5.0))
    pd.DataFrame(
        rows,
        columns=[
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            "l_linenumber",
            "l_quantity",
        ],
    ).to_parquet(tmp_path / "lineitem.parquet")
    got = {
        r.band: r
        for r in QUERIES["part_supplier_hhi_bands"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got["single-sourced"].n_parts == 1
    assert got["highly-concentrated"].n_parts == 1
    assert got["diversified"].n_parts == 1
    assert got["diversified"].part_share == 1.0 / 3.0
    ok, detail = compare(
        spark,
        "part_supplier_hhi_bands",
        QUERIES["part_supplier_hhi_bands"],
        ORACLES["part_supplier_hhi_bands"],
        str(tmp_path),
    )
    assert ok, detail


def _fh_mirror(token: str) -> tuple[int, int]:
    # pure-Python mirror of the E218 portable token hash
    h = 0
    for ch in token:
        h = (h * 31 + ord(ch)) % 1_000_000_007
    bucket = ((h * 2_654_435_761) % 4294967296) % 64
    sign = 1 if ((h * 2_246_822_519) % 4294967296) % 2 == 0 else -1
    return bucket, sign


def test_feature_hash_python_mirror(spark, tmp_path):
    docs = [
        (1, "aa ab aa", "en", "s1"),
        (2, "ba aa", "en", "s1"),
    ]
    pd.DataFrame(
        docs, columns=["doc_id", "text", "lang", "source"]
    ).to_parquet(tmp_path / "documents.parquet")
    rows = QUERIES["feature_hash_collision_audit"](
        spark, str(tmp_path)
    ).collect()
    expected: dict[int, list[int]] = {}
    for tok, c in {"aa": 3, "ab": 1, "ba": 1}.items():
        b, s = _fh_mirror(tok)
        e = expected.setdefault(b, [0, 0, 0])
        e[0] += 1
        e[1] += c
        e[2] += s * c
    got = {
        r.bucket: [r.n_tokens, r.total_count, r.signed_count] for r in rows
    }
    assert got == expected
    # conservation: total mass survives hashing even under collisions
    assert sum(r.total_count for r in rows) == 5
    ok, detail = compare(
        spark,
        "feature_hash_collision_audit",
        QUERIES["feature_hash_collision_audit"],
        ORACLES["feature_hash_collision_audit"],
        str(tmp_path),
    )
    assert ok, detail


def test_calibration_planted_top_decile(spark, tmp_path):
    # 20 distinct values 1..20, purchases exactly at the top two values:
    # decile 9 = {19, 20} -> rate 1.0, captures 100% of purchases,
    # lift = (2*20)/(2*2) = 10.
    import datetime as dt

    rows = [
        (
            i,
            dt.datetime(2026, 5, 1, 9),
            i,
            "purchase" if i >= 19 else "view",
            float(i),
            "{}",
        )
        for i in range(1, 21)
    ]
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    rows_out = {
        r.decile: r
        for r in QUERIES["value_decile_calibration"](
            spark, str(tmp_path)
        ).collect()
    }
    assert sorted(rows_out) == list(range(10))
    top = rows_out[9]
    assert (top.n_events, top.n_purchases) == (2, 2)
    assert top.purchase_rate == 1.0
    assert top.cum_purchase_share == 1.0
    assert top.cum_event_share == 0.1
    assert top.lift == 10.0
    assert rows_out[0].n_purchases == 0
    ok, detail = compare(
        spark,
        "value_decile_calibration",
        QUERIES["value_decile_calibration"],
        ORACLES["value_decile_calibration"],
        str(tmp_path),
    )
    assert ok, detail


def test_calibration_all_tied_single_decile(spark, tmp_path):
    # One distinct value -> the whole cell lands in decile 0 (whole-cell
    # rule: no nondeterministic within-tie splitting).
    import datetime as dt

    rows = [
        (i, dt.datetime(2026, 5, 1, 9), i, "view", 5.0, "{}")
        for i in range(8)
    ]
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    rows_out = QUERIES["value_decile_calibration"](
        spark, str(tmp_path)
    ).collect()
    assert len(rows_out) == 1
    assert rows_out[0].decile == 0
    assert rows_out[0].n_events == 8


def test_apdex_hand_computed(spark, tmp_path):
    # satisfied 0.5, tolerating 2.0, frustrated 10.0 ->
    # apdex = (2*1 + 1) / (2*3) = 0.5
    import datetime as dt

    rows = [
        (0, dt.datetime(2026, 5, 1, 9), 0, "view", 0.5, "{}"),
        (1, dt.datetime(2026, 5, 1, 9), 1, "view", 2.0, "{}"),
        (2, dt.datetime(2026, 5, 1, 9), 2, "view", 10.0, "{}"),
    ]
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    [r] = QUERIES["apdex_by_type"](spark, str(tmp_path)).collect()
    assert (r.n_events, r.n_satisfied, r.n_tolerating) == (3, 1, 1)
    assert r.apdex == 0.5


def test_conformal_planted_interval(spark, tmp_path):
    # calib (even ids): values 1..19 -> mean 10; nonconformities are
    # 1900*|v-10|; q_idx = ceil(0.9*20) = 18 -> qhat = 1900*9 ->
    # halfwidth 9.0. test (odd ids): 1.0 (|1-10|<=9 in), 10.0 (in),
    # 25.0 (out) -> coverage 2/3.
    import datetime as dt

    rows = [
        (2 * i, dt.datetime(2026, 5, 1, 9), i, "view", float(i + 1), "{}")
        for i in range(19)
    ]
    rows += [
        (1, dt.datetime(2026, 5, 1, 9), 100, "view", 1.0, "{}"),
        (3, dt.datetime(2026, 5, 1, 9), 101, "view", 10.0, "{}"),
        (5, dt.datetime(2026, 5, 1, 9), 102, "view", 25.0, "{}"),
    ]
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    [r] = QUERIES["conformal_value_interval"](spark, str(tmp_path)).collect()
    assert (r.n_cal, r.n_test) == (19, 3)
    assert r.pred_mean == 10.0
    assert r.halfwidth == 9.0
    assert r.coverage == 2.0 / 3.0
    assert r.target_coverage == 0.9
    ok, detail = compare(
        spark,
        "conformal_value_interval",
        QUERIES["conformal_value_interval"],
        ORACLES["conformal_value_interval"],
        str(tmp_path),
    )
    assert ok, detail


def test_quantile_normalize_planted_mapping(spark, tmp_path):
    # s1 = {1,2,3,4}, s2 = {10,20}; pooled cum: 1->1,2->2,3->3,4->4,
    # 10->5, 20->6 (N=6).
    # s2: v=10 target ceil(1*6/2)=3 -> 3; v=20 target 6 -> 20.
    # s1: v=1 -> ceil(6/4)=2 -> 2; v=2 -> 3 -> 3; v=3 -> ceil(4.5)=5
    # -> 10; v=4 -> 6 -> 20.
    docs = [
        (1, "x", "en", "s1", 1),
        (2, "x", "en", "s1", 2),
        (3, "x", "en", "s1", 3),
        (4, "x", "en", "s1", 4),
        (5, "x", "en", "s2", 10),
        (6, "x", "en", "s2", 20),
    ]
    pd.DataFrame(
        docs, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(tmp_path / "documents.parquet")
    rows = QUERIES["doc_length_quantile_normalize"](
        spark, str(tmp_path)
    ).collect()
    got = {(r.source, r.length): r.normalized_length for r in rows}
    assert got == {
        ("s1", 1): 2,
        ("s1", 2): 3,
        ("s1", 3): 10,
        ("s1", 4): 20,
        ("s2", 10): 3,
        ("s2", 20): 20,
    }
    # normalization is monotone within each source
    for srcname in ("s1", "s2"):
        ms = [v for (s0, _k), v in sorted(got.items()) if s0 == srcname]
        assert ms == sorted(ms)
    ok, detail = compare(
        spark,
        "doc_length_quantile_normalize",
        QUERIES["doc_length_quantile_normalize"],
        ORACLES["doc_length_quantile_normalize"],
        str(tmp_path),
    )
    assert ok, detail


def test_eb_shrinkage_inverts_small_n_and_degenerates_safely(
    spark, tmp_path
):
    # suppliers: 1 -> 2/2, 2 -> 95/100, 3 -> 50/100.  Prior mean is
    # ~0.817, so the 2/2 supplier shrinks hard toward it and drops
    # BELOW the 95/100 supplier (the small-sample inversion), while
    # 50/100 barely moves.
    orders = [(i, dt.date(2026, 1, 5)) for i in range(1, 203)]
    pd.DataFrame(
        orders, columns=["o_orderkey", "o_orderdate"]
    ).to_parquet(tmp_path / "orders.parquet")
    lines = []
    for okey in (1, 2):
        lines.append((okey, 1, dt.datetime(2026, 1, 5, 8)))
    for i, okey in enumerate(range(3, 103)):
        ship = dt.datetime(2026, 1, 5, 8) if i < 95 else dt.datetime(
            2026, 2, 20, 8
        )
        lines.append((okey, 2, ship))
    for i, okey in enumerate(range(103, 203)):
        ship = dt.datetime(2026, 1, 5, 8) if i < 50 else dt.datetime(
            2026, 2, 20, 8
        )
        lines.append((okey, 3, ship))
    pd.DataFrame(
        lines, columns=["l_orderkey", "l_suppkey", "l_shipdate"]
    ).to_parquet(
        tmp_path / "lineitem.parquet",
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )
    rows = QUERIES["supplier_ontime_eb_shrunk"](
        spark, str(tmp_path)
    ).collect()
    assert [r.suppkey for r in rows] == [2, 1, 3]
    by = {r.suppkey: r for r in rows}
    assert by[1].rate == 1.0 and by[2].rate == 0.95
    assert by[2].shrunk_rate > by[1].shrunk_rate  # the inversion
    # hand-computed: c = mu(1-mu)/v - 1 = 0.1497222/0.0505555 - 1
    assert abs(by[1].prior_strength - 1.9615384615384617) < 1e-12
    # (2 + mu*c) / (2 + c) with mu = 2.45/3, c = 1.96153846...
    assert abs(by[1].shrunk_rate - 0.9092233009708736) < 1e-9
    ok, detail = compare(
        spark,
        "supplier_ontime_eb_shrunk",
        QUERIES["supplier_ontime_eb_shrunk"],
        ORACLES["supplier_ontime_eb_shrunk"],
        str(tmp_path),
    )
    assert ok, detail


def test_eb_shrinkage_degenerate_prior_returns_raw(spark, tmp_path):
    # both suppliers 1/1 -> zero rate variance -> prior undefined ->
    # shrunk == raw, prior_strength NULL
    pd.DataFrame(
        [(1, dt.date(2026, 1, 5)), (2, dt.date(2026, 1, 5))],
        columns=["o_orderkey", "o_orderdate"],
    ).to_parquet(tmp_path / "orders.parquet")
    pd.DataFrame(
        [
            (1, 1, dt.datetime(2026, 1, 5, 8)),
            (2, 2, dt.datetime(2026, 1, 5, 8)),
        ],
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    ).to_parquet(
        tmp_path / "lineitem.parquet",
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )
    rows = QUERIES["supplier_ontime_eb_shrunk"](
        spark, str(tmp_path)
    ).collect()
    assert all(r.shrunk_rate == r.rate == 1.0 for r in rows)
    assert all(r.prior_strength is None for r in rows)
    ok, detail = compare(
        spark,
        "supplier_ontime_eb_shrunk",
        QUERIES["supplier_ontime_eb_shrunk"],
        ORACLES["supplier_ontime_eb_shrunk"],
        str(tmp_path),
    )
    assert ok, detail
