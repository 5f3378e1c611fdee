"""Join-order advisor (planning/join_order.py): the max-NDV cardinality
estimate is pinned by hand, the exhaustive left-deep search must start a
star query from the dimension side (never fact-first), the greedy
fallback agrees on the star, disconnected graphs still return (forced
cross product), and stats collection reads real frames in one pass."""

from __future__ import annotations

import pandas as pd

from tdk_apache_log_etl_spark.planning import (
    JoinPred,
    TableStats,
    best_left_deep,
    collect_table_stats,
    greedy_order,
)

#: TPC-H-shaped star: fact orders -> customer -> nation
STAR_STATS = [
    TableStats("orders", 1_500_000, {"o_custkey": 100_000}),
    TableStats(
        "customer", 100_000, {"c_custkey": 100_000, "c_nationkey": 25}
    ),
    TableStats("nation", 25, {"n_nationkey": 25}),
]
STAR_PREDS = [
    JoinPred("orders", "o_custkey", "customer", "c_custkey"),
    JoinPred("customer", "c_nationkey", "nation", "n_nationkey"),
]


def test_two_table_estimate_is_the_max_ndv_rule():
    r = TableStats("r", 1000, {"a": 10})
    s = TableStats("s", 500, {"b": 50})
    order, costs, tot = best_left_deep(
        [r, s], [JoinPred("r", "a", "s", "b")]
    )
    assert costs == [1000 * 500 / 50]
    assert tot == 10_000.0


def test_star_schema_joins_dimensions_first():
    order, costs, tot = best_left_deep(STAR_STATS, STAR_PREDS)
    # dim-side first: customer x nation collapses to 100k, then the
    # fact join is the only big step (1.5M). Fact-first would pay 1.5M
    # TWICE (orders x customer = 1.5M, then x nation = 1.5M).
    assert order[-1] == "orders"
    assert tot == 100_000 + 1_500_000
    # NDV propagation: the fact step divides by max(100k, 100k)
    assert costs[-1] == 1_500_000.0


def test_greedy_agrees_on_the_star():
    g_order, _, g_tot = greedy_order(STAR_STATS, STAR_PREDS)
    _, _, best_tot = best_left_deep(STAR_STATS, STAR_PREDS)
    assert g_tot == best_tot
    assert g_order[-1] == "orders"


def test_disconnected_graph_forces_cross_product_but_returns():
    r = TableStats("r", 10, {"a": 10})
    s = TableStats("s", 20, {"b": 20})
    order, costs, tot = best_left_deep([r, s], [])
    assert sorted(order) == ["r", "s"]
    assert costs == [200.0]


def test_multi_predicate_pair_multiplies_selectivities():
    r = TableStats("r", 1000, {"a": 10, "c": 4})
    s = TableStats("s", 1000, {"b": 20, "d": 5})
    order, costs, tot = best_left_deep(
        [r, s],
        [JoinPred("r", "a", "s", "b"), JoinPred("r", "c", "s", "d")],
    )
    # 1000*1000 / max(10,20) / max(4,5)
    assert costs == [1000 * 1000 / 20 / 5]


def test_collect_table_stats_one_pass(spark, tmp_path):
    pd.DataFrame(
        {"k": [1, 1, 2, 3], "v": [10, 10, 10, 20]}
    ).to_parquet(tmp_path / "t.parquet")
    df = spark.read.parquet(str(tmp_path / "t.parquet"))
    ts = collect_table_stats(df, "t", ["k", "v"])
    assert ts.rows == 4
    assert ts.ndv == {"k": 3, "v": 2}


def test_strategy_annotation_broadcasts_dims_only():
    from tdk_apache_log_etl_spark.planning.join_order import (
        annotate_strategies,
    )

    order, _, _ = best_left_deep(STAR_STATS, STAR_PREDS)
    ann = annotate_strategies(
        order, STAR_STATS, {"nation": 32, "customer": 64, "orders": 64}
    )
    strategies = {name: s for name, s, _ in ann}
    assert strategies["orders"] == "shuffle"  # 1.5M x 64B >> 10MB
    # whichever dimension joins second is broadcast-sized
    dim = [n for n in order[1:] if n != "orders"][0]
    assert strategies[dim] == "broadcast"
