"""Streaming OHLC bar maintenance (streaming/ohlc_stream.py): the
maintained bar table must equal the batch events_value_ohlc_hourly over
the same events, keep O/H/L/C bit-identical under micro-batch replay
(struct-min/max idempotence), and let a LATE event win the open."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from tdk_apache_log_etl_spark.operators import QUERIES
from tdk_apache_log_etl_spark.streaming.ohlc_stream import (
    merge_batch_bars,
    read_bars,
    write_ohlc_stream,
)

EVENT_DDL = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)
COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]

H = dt.datetime(2026, 8, 3, 10, 0, 0)


def _write(path, rows):
    df = pd.DataFrame(rows, columns=COLS)
    df["ts"] = df["ts"].astype("datetime64[ms]")
    df.to_parquet(path)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# hour-10 "view" bar straddles BOTH micro-batches: batch 1 holds the
# open and the high, batch 2 holds the low and the close — only the
# merged state can assemble the full candle.
BATCH1 = [
    (1, H + dt.timedelta(seconds=10), 1, "view", 5.0, "{}"),
    (2, H + dt.timedelta(minutes=20), 1, "view", 9.0, "{}"),
    (3, H + dt.timedelta(minutes=5), 2, "click", 2.0, "{}"),
]
BATCH2 = [
    (4, H + dt.timedelta(minutes=40), 2, "view", 1.0, "{}"),
    (5, H + dt.timedelta(minutes=55), 1, "view", 4.0, "{}"),
    (6, H + dt.timedelta(hours=1, minutes=1), 1, "view", 7.0, "{}"),
]


def test_streamed_bars_equal_batch_query(spark, tmp_path):
    src = tmp_path / "ev"
    src.mkdir()
    _write(src / "d1.parquet", BATCH1)
    _write(src / "d2.parquet", BATCH2)
    table = str(tmp_path / "bars")

    stream = (
        spark.readStream.schema(EVENT_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = write_ohlc_stream(stream, table, str(tmp_path / "ckpt")).start()
    assert q.awaitTermination(120)

    streamed = _rows(read_bars(spark, table))
    batch_dir = tmp_path / "batch"
    batch_dir.mkdir()
    _write(batch_dir / "events.parquet", BATCH1 + BATCH2)
    expected = _rows(
        QUERIES["events_value_ohlc_hourly"](spark, str(batch_dir))
    )
    assert streamed == expected

    by_key = {(r[0], r[1]): r for r in streamed}
    view10 = by_key[("view", H)]
    # open=5 (batch 1), high=9 (batch 1), low=1 (batch 2), close=4
    # (batch 2, 10:55), volume 4
    assert view10[2:] == (5.0, 9.0, 1.0, 4.0, 4)


def test_replay_keeps_ohlc_bit_identical(spark, tmp_path):
    table = str(tmp_path / "bars")
    d1 = tmp_path / "d1.parquet"
    d2 = tmp_path / "d2.parquet"
    _write(d1, BATCH1)
    _write(d2, BATCH2)
    merge_batch_bars(spark.read.parquet(str(d1)), table)
    merge_batch_bars(spark.read.parquet(str(d2)), table)

    def contract(df):
        # O/H/L/C are the idempotent contract; n_events is additive-
        # advisory under replay (same stance as freshness_stream)
        return sorted(tuple(r)[:6] for r in df.collect())

    before = contract(read_bars(spark, table))
    merge_batch_bars(spark.read.parquet(str(d2)), table)  # replay
    assert contract(read_bars(spark, table)) == before


def test_late_event_wins_open(spark, tmp_path):
    table = str(tmp_path / "bars")
    d1 = tmp_path / "d1.parquet"
    late = tmp_path / "late.parquet"
    _write(d1, BATCH1)
    # arrives AFTER batch 1 but carries the earliest hour-10 timestamp
    _write(late, [(99, H + dt.timedelta(seconds=1), 3, "view", 0.5, "{}")])
    merge_batch_bars(spark.read.parquet(str(d1)), table)
    merge_batch_bars(spark.read.parquet(str(late)), table)
    bars = {
        (r.event_type, r.hour_ts): r for r in read_bars(spark, table).collect()
    }
    v = bars[("view", H)]
    assert v.open_value == 0.5   # the late event IS the open now
    assert v.low_value == 0.5
    assert v.high_value == 9.0
    assert v.n_events == 3


def test_swap_crash_window_is_recovered(spark, tmp_path):
    """A writer dying BETWEEN the two swap renames leaves no live table
    but a complete '._old' predecessor; the next merge must resume from
    the full accumulated state, not silently restart from one batch
    (round-4 advice on merge_batch_bars)."""
    import os

    table = str(tmp_path / "bars")
    d1 = tmp_path / "d1.parquet"
    d2 = tmp_path / "d2.parquet"
    _write(d1, BATCH1)
    _write(d2, BATCH2)
    merge_batch_bars(spark.read.parquet(str(d1)), table)
    # simulate the crash window: live table renamed away, tmp never
    # renamed into place
    os.rename(table, table + "._old")
    merge_batch_bars(spark.read.parquet(str(d2)), table)
    bars = {
        (r.event_type, r.hour_ts): r for r in read_bars(spark, table).collect()
    }
    v = bars[("view", H)]
    assert v.open_value == 5.0   # batch-1 open survived the crash
    assert v.high_value == 9.0   # batch-1 high survived
    assert v.low_value == 1.0    # batch-2 low merged in
    assert v.n_events == 4       # 2 + 2 view events in hour 10
    assert not os.path.exists(table + "._old")  # orphan cleaned up
