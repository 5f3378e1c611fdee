"""Streaming MV maintenance (streaming/mv_stream.py): the maintained
rollup must answer the monthly query THROUGH the rewrite layer with
exactly the batch result, replays must not double-count (batch-id
protocol), and torn state writes must be ignored."""

from __future__ import annotations

import datetime as dt
import os

import pandas as pd

from tdk_apache_log_etl_spark.operators import QUERIES
from tdk_apache_log_etl_spark.streaming.mv_stream import (
    apply_mv_batch,
    maintain_mv_stream,
    monthly_from_stream,
    read_mv_state,
)

ORDER_DDL = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp_ntz"
)
COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate"]

# the (Jan, 'O') bar straddles both micro-batches
BATCH1 = [
    (1, 7, "O", 10.25, dt.datetime(1995, 1, 3)),
    (2, 7, "F", 30.00, dt.datetime(1995, 2, 3)),
]
BATCH2 = [
    (3, 7, "O", 20.00, dt.datetime(1995, 1, 9)),
    (4, 7, "O", 5.00, dt.datetime(1995, 2, 9)),
]


def _write(path, rows):
    df = pd.DataFrame(rows, columns=COLS)
    df["o_orderdate"] = df["o_orderdate"].astype("datetime64[ms]")
    df.to_parquet(path)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streamed_mv_answers_monthly_via_rewrite(spark, tmp_path):
    src = tmp_path / "orders"
    src.mkdir()
    _write(src / "d1.parquet", BATCH1)
    _write(src / "d2.parquet", BATCH2)
    state = str(tmp_path / "state")

    stream = (
        spark.readStream.schema(ORDER_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = maintain_mv_stream(stream, state, str(tmp_path / "ckpt")).start()
    assert q.awaitTermination(120)

    got = _rows(monthly_from_stream(spark, state))
    batch_dir = tmp_path / "batch"
    batch_dir.mkdir()
    _write(batch_dir / "orders.parquet", BATCH1 + BATCH2)
    expected = _rows(
        QUERIES["mv_monthly_revenue_rewrite"](spark, str(batch_dir))
    )
    assert got == expected
    jan_o = [r for r in got if r[1] == "O" and r[0].month == 1][0]
    assert jan_o[2] == 3025 and jan_o[3] == 2  # cross-batch merge


def test_replayed_batch_does_not_double_count(spark, tmp_path):
    state = str(tmp_path / "state")
    d1 = tmp_path / "d1.parquet"
    _write(d1, BATCH1)
    df = spark.read.parquet(str(d1))
    apply_mv_batch(df, state, 0)
    before = _rows(read_mv_state(spark, state))
    apply_mv_batch(df, state, 0)  # at-least-once redelivery
    assert _rows(read_mv_state(spark, state)) == before


def test_torn_state_write_is_ignored(spark, tmp_path):
    state = str(tmp_path / "state")
    d1 = tmp_path / "d1.parquet"
    _write(d1, BATCH1)
    apply_mv_batch(spark.read.parquet(str(d1)), state, 0)
    good = _rows(read_mv_state(spark, state))
    # a crashed batch=7 write: directory exists, no _SUCCESS marker
    torn = os.path.join(state, "batch=7", "mv")
    os.makedirs(torn)
    with open(os.path.join(torn, "part-garbage.parquet"), "w") as f:
        f.write("not parquet")
    assert _rows(read_mv_state(spark, state)) == good
