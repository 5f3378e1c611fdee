"""Regression pins for the round-8 iteration-partitioning rule
(SCALE.md "Round-8 full-fleet scaling study"): persisted relations that
iterative loops re-scan every round, and per-round localCheckpoint
frames, are sized to the cluster's core count — never to the session's
shuffle-partition default.  A vanilla 200-partition session previously
dragged 200 near-empty partitions through every round (hits ~9x at sf1
in the round-7 sweep).

These tests assert PARTITION COUNTS, not results (oracle parity pins
results), so a future refactor that silently re-inherits the session
default fails here even at smoke scale where the wall-clock symptom is
invisible.
"""

from __future__ import annotations

import pandas as pd

from tdk_apache_log_etl_spark.operators import QUERIES
from tdk_apache_log_etl_spark.operators.graph import (
    _iter_parallelism,
    partitioned_edges,
    significant_pairs,
)

from .conftest import SF_DIR_SMOKE


def test_partitioned_edges_sized_to_parallelism(spark):
    # r10: sized by the relation's ROW COUNT (rows / ITER_ROWS_PER_TASK,
    # clamped to [4, cores]) — a tiny graph must not pay a full
    # core-count wave per round, a big one must cap at the core count.
    from tdk_apache_log_etl_spark.operators.graph import (
        _frame_rows,
        edge_parallelism,
    )

    pairs = significant_pairs(spark, SF_DIR_SMOKE)
    p = edge_parallelism(spark, pairs)
    assert 4 <= p <= _iter_parallelism(spark)
    assert partitioned_edges(spark, SF_DIR_SMOKE).rdd.getNumPartitions() == p
    assert (
        significant_pairs(spark, SF_DIR_SMOKE).rdd.getNumPartitions()
        <= _iter_parallelism(spark)
    )
    # the memoized count must agree with a fresh count
    assert _frame_rows(pairs) == pairs.count()


def test_iter_parallelism_floors_at_eight(spark):
    # the rule must hold on tiny executors too — never fewer than 8
    # without a row count, never fewer than 4 with one
    assert _iter_parallelism(spark) >= 8
    assert _iter_parallelism(spark) >= spark.sparkContext.defaultParallelism
    assert _iter_parallelism(spark, 0) == 4
    assert _iter_parallelism(spark, 10**12) == _iter_parallelism(spark)


def test_hits_edge_copies_partitioned_on_both_keys(spark, tmp_path):
    # the two persisted HITS edge copies carry p_iter partitions so the
    # per-round joins shuffle only the score frames; the query result is
    # pinned elsewhere — here we only run it and inspect the final frame
    pd.DataFrame(
        [(0, 1), (1, 1), (2, 1), (3, 2)],
        columns=["o_orderkey", "o_custkey"],
    ).to_parquet(tmp_path / "orders.parquet")
    pd.DataFrame(
        [(0, 10), (1, 11), (2, 12), (3, 10)],
        columns=["l_orderkey", "l_partkey"],
    ).to_parquet(tmp_path / "lineitem.parquet")
    out = QUERIES["hits_purchase_graph"](spark, str(tmp_path))
    p = _iter_parallelism(spark)
    # per-round checkpointed score frames were coalesced to <= p_iter,
    # and the final union inherits them
    assert out.rdd.getNumPartitions() <= 2 * p
    rows = out.collect()
    assert len(rows) == 5  # 2 customers + 3 parts — semantics unchanged


def test_connected_components_frames_bounded(spark):
    from pyspark.sql import functions as F

    from tdk_apache_log_etl_spark.operators.dedup import (
        connected_components,
    )

    p = _iter_parallelism(spark)
    nodes = spark.range(12).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6), (8, 9)], "doc_a long, doc_b long"
    )
    out = connected_components(nodes, pairs)
    assert out.rdd.getNumPartitions() <= 2 * p
    labels = {r.doc_id: r.canonical_id for r in out.collect()}
    assert labels[0] == labels[1] == labels[2] == 0
    assert labels[5] == labels[6] == 5
    assert labels[8] == labels[9] == 8
    assert labels[3] == 3  # singleton maps to itself
