"""E119 A-priori planted fixtures: known frequent triples, duplicate
lineitems collapsing to one basket membership, and the prune==naive
equivalence the downward-closure argument promises."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from tdk_apache_log_etl_spark.operators import ORACLES, QUERIES
from tdk_apache_log_etl_spark.sources.tables import load_table

from .conftest import SF_DIR_CORRECT
from .parity import compare

_NAME = "frequent_part_triples"


def _lineitem(baskets: dict[int, list[int]]):
    rows = []
    for okey, parts in baskets.items():
        for p in parts:
            rows.append((okey, p))
    return pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])


def test_frequent_triples_planted(spark, tmp_path):
    baskets = {
        1: [10, 20, 30, 40],
        2: [10, 20, 30],        # {10,20,30} in baskets 1,2,4 → support 3
        3: [10, 20, 99],        # pair {10,20} frequent, triple not
        4: [30, 10, 20, 20],    # duplicate lineitem: counts ONCE
        5: [50, 60, 70],        # one-off triple → below minsup
    }
    _lineitem(baskets).to_parquet(tmp_path / "lineitem.parquet")
    got = {
        (r.p1, r.p2, r.p3): r.support
        for r in QUERIES[_NAME](spark, str(tmp_path)).collect()
    }
    assert got == {(10, 20, 30): 3}
    ok, detail = compare(
        spark, _NAME, QUERIES[_NAME], ORACLES[_NAME], str(tmp_path)
    )
    assert ok, detail


def test_apriori_prune_equals_naive(spark):
    # the pruned plan must emit exactly the naive 3-way join's answer
    from tdk_apache_log_etl_spark.operators.basket import MINSUP

    got = {
        (r.p1, r.p2, r.p3, r.support)
        for r in QUERIES[_NAME](spark, SF_DIR_CORRECT).collect()
    }
    b = (
        load_table(spark, SF_DIR_CORRECT, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = b.selectExpr("l_orderkey okey", "l_partkey p1")
    c = b.selectExpr("l_orderkey okey", "l_partkey p2")
    d = b.selectExpr("l_orderkey okey", "l_partkey p3")
    naive = {
        (r.p1, r.p2, r.p3, r.support)
        for r in a.join(c, "okey")
        .filter(F.col("p1") < F.col("p2"))
        .join(d, "okey")
        .filter(F.col("p2") < F.col("p3"))
        .groupBy("p1", "p2", "p3")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= MINSUP)
        .collect()
    }
    assert got == naive and got  # non-degenerate at sf0.01


def test_backlog_curve_planted_and_invariants(spark, tmp_path):
    # order 1 open Jan 1..3 (ships 3rd), order 2 open Jan 2..2,
    # order 3 open Jan 2..4 → backlog by day: 1:1, 2:3, 3:2 (2 closed),
    # 4:1 (1 closed), 5:0 (3 closed).
    import datetime as dt

    orders = pd.DataFrame(
        [
            (1, 1, "O", 10.0, dt.datetime(2026, 1, 1), "1-URGENT"),
            (2, 1, "O", 10.0, dt.datetime(2026, 1, 2), "1-URGENT"),
            (3, 1, "O", 10.0, dt.datetime(2026, 1, 2), "1-URGENT"),
        ],
        columns=["o_orderkey", "o_custkey", "o_orderstatus",
                 "o_totalprice", "o_orderdate", "o_orderpriority"],
    )
    orders["o_orderdate"] = orders["o_orderdate"].astype("datetime64[ms]")
    orders.to_parquet(tmp_path / "orders.parquet")
    li = pd.DataFrame(
        [
            (1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
             dt.datetime(2026, 1, 2)),
            (1, 1, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O",
             dt.datetime(2026, 1, 3)),  # LAST shipment closes order 1
            (2, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
             dt.datetime(2026, 1, 2)),
            (3, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
             dt.datetime(2026, 1, 4)),
        ],
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                 "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag", "l_linestatus", "l_shipdate"],
    )
    li["l_shipdate"] = li["l_shipdate"].astype("datetime64[ms]")
    li.to_parquet(tmp_path / "lineitem.parquet")
    got = {
        r.day.isoformat(): r.n_open
        for r in QUERIES["order_backlog_curve"](spark, str(tmp_path)).collect()
    }
    # steps: Jan1 +1(o1)=1; Jan2 +2(o2,o3)=3; Jan3 −1(o2 shipped Jan2)=2;
    # Jan4 −1(o1 shipped Jan3)=1; Jan5 −1(o3 shipped Jan4)=0
    assert got == {
        "2026-01-01": 1, "2026-01-02": 3, "2026-01-03": 2,
        "2026-01-04": 1, "2026-01-05": 0,
    }
    ok, detail = compare(
        spark,
        "order_backlog_curve",
        QUERIES["order_backlog_curve"],
        ORACLES["order_backlog_curve"],
        str(tmp_path),
    )
    assert ok, detail


def test_backlog_curve_sf_invariants(spark):
    rows = QUERIES["order_backlog_curve"](spark, SF_DIR_CORRECT).collect()
    assert rows
    assert all(r.n_open >= 0 for r in rows)
    last = max(rows, key=lambda r: r.day)
    assert last.n_open == 0  # every order eventually ships


def test_itemcf_holdout_planted(spark, tmp_path):
    # Train: baskets {1,2} x3 and {1,3} x1 (odd okeys). Test basket
    # okey=10 holds {1,2}: item 1's rec list is [2 (c=3), 3 (c=1)], so
    # rec(1) hits item 2 -> hits=1; rec(2)=[1] hits item 1 -> hits=1.
    # Test basket okey=5? (5%5==0) holds the cold item 99 and item 1:
    # 99 has no train recs -> counted cold, not evaluated.
    import pandas as pd

    rows = []
    for ok_, basket in enumerate([[1, 2], [1, 2], [1, 2], [1, 3]], start=1):
        for i, item in enumerate(basket):
            rows.append((ok_, item, 1, i + 1))  # okeys 1-4 -> train
    for okey, basket in [(10, [1, 2]), (5, [99, 1])]:
        for i, item in enumerate(basket):
            rows.append((okey, item, 1, i + 1))
    pd.DataFrame(
        rows, columns=["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]
    ).to_parquet(tmp_path / "lineitem.parquet")
    [r] = QUERIES["itemcf_holdout_precision"](spark, str(tmp_path)).collect()
    # evaluated (okey,item) rows: (10,1), (10,2), (5,1) — all of which
    # have train recs; (5,99) is cold.
    assert r.n_eval == 3
    assert r.n_cold == 1
    # hits: (10,1)->{2} hit=1; (10,2)->{1} hit=1; (5,1)-> recs {2,3}
    # vs basket {99} -> 0. precision@5 = 2/15, hit_rate = 2/3.
    assert r.precision_at_k == 2 / 15
    assert r.hit_rate == 2 / 3
    from tdk_apache_log_etl_spark.operators import ORACLES

    from .parity import compare

    ok, detail = compare(
        spark,
        "itemcf_holdout_precision",
        QUERIES["itemcf_holdout_precision"],
        ORACLES["itemcf_holdout_precision"],
        str(tmp_path),
    )
    assert ok, detail


def test_ndcg_planted_baskets(spark, tmp_path):
    # train: {1,2} x2 and {1,3} -> recs: src1=[2,3], src2=[1], src3=[1]
    # test basket 5={1,2,4} (bs=3, m=2): item1 hits rank1 (dcg=1),
    # item2 hits rank1, item4 is cold (dropped). ndcg = 1/idcg(2) each.
    # test basket 10={3} (bs=1): m=0 -> degenerate, never averaged.
    baskets = {1: [1, 2], 2: [1, 2], 3: [1, 3], 5: [1, 2, 4], 10: [3]}
    _lineitem(baskets).to_parquet(tmp_path / "lineitem.parquet")
    [r] = QUERIES["itemcf_holdout_ndcg"](spark, str(tmp_path)).collect()
    assert (r.n_eval, r.n_degenerate) == (2, 1)
    import math

    ndcg = 1.0 / 1.6309297535714575
    q = math.floor(ndcg * 1e9 + 0.5)
    assert r.mean_ndcg == (2 * q) / 1e9 / 2
    ok, detail = compare(
        spark,
        "itemcf_holdout_ndcg",
        QUERIES["itemcf_holdout_ndcg"],
        ORACLES["itemcf_holdout_ndcg"],
        str(tmp_path),
    )
    assert ok, detail


def test_ndcg_rank_position_matters(spark, tmp_path):
    # Same single hit, rank 1 vs rank 2: train makes src1's rec list
    # [2, 3] (2 co-occurs twice, 3 once). A test basket holding {1,3}
    # hits at rank 2 -> per-row dcg = 0.6309..., lower than a rank-1 hit.
    baskets = {1: [1, 2], 2: [1, 2], 3: [1, 3], 5: [1, 3]}
    _lineitem(baskets).to_parquet(tmp_path / "lineitem.parquet")
    [r] = QUERIES["itemcf_holdout_ndcg"](spark, str(tmp_path)).collect()
    # eval rows: item1 (hit 3 at rank2, m=1 -> ndcg=0.6309...),
    # item3 (rec [1], hit at rank1, m=1 -> ndcg=1.0)
    import math

    q1 = math.floor(0.6309297535714575 * 1e9 + 0.5)
    q2 = math.floor(1.0 * 1e9 + 0.5)
    assert r.n_eval == 2
    assert r.mean_ndcg == (q1 + q2) / 1e9 / 2
