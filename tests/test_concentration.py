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
