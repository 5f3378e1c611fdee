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
