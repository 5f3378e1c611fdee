"""Crash-window unit tests for streaming/state_swap.py.

The swap protocol has three distinct crash points; each must heal on
the next recover_state/swap_write pair without losing accumulated state
or wedging the stream:

  1. between rename(live, old) and rename(tmp, live)  — live missing,
     ._old holds the full prior state  → recover_state renames it back.
  2. after rename(tmp, live) but before rmtree(old)   — live is newest,
     ._old is a stale predecessor      → recover_state (or the next
     swap_write) clears ._old; rename(live, old) must not ENOTEMPTY.
  3. mid-write of ._tmp                               — overwrite mode
     on the next batch replaces it; nothing to heal.
"""

from __future__ import annotations

import os

from tdk_apache_log_etl_spark.streaming.state_swap import (
    prune_batch_dirs,
    recover_state,
    swap_write,
)


def _state_df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "v int")


def _read_vals(spark, path):
    return sorted(r.v for r in spark.read.parquet(path).collect())


def test_recover_restores_old_when_live_missing(spark, tmp_path):
    live = str(tmp_path / "state")
    swap_write(_state_df(spark, [1, 2]), live)
    # crash point 1: live renamed away, tmp never renamed in
    os.rename(live, live + "._old")
    recover_state(live)
    assert _read_vals(spark, live) == [1, 2]
    assert not os.path.exists(live + "._old")


def test_recover_clears_stale_old_when_live_exists(spark, tmp_path):
    live = str(tmp_path / "state")
    swap_write(_state_df(spark, [1]), live)
    # crash point 2: simulate dying after rename(tmp, live) but before
    # rmtree(old) — both live and a non-empty ._old exist
    swap_write(_state_df(spark, [1, 2]), live)
    os.makedirs(live + "._old")
    with open(live + "._old/part-stale.parquet", "w") as f:
        f.write("stale")
    recover_state(live)
    assert not os.path.exists(live + "._old")  # stale predecessor gone
    assert _read_vals(spark, live) == [1, 2]  # newest state untouched


def test_swap_write_survives_stale_old_without_recover(spark, tmp_path):
    # belt-and-braces: even if a caller skips recover_state, the next
    # swap_write must not ENOTEMPTY on the leftover ._old
    live = str(tmp_path / "state")
    swap_write(_state_df(spark, [1]), live)
    os.makedirs(live + "._old")
    with open(live + "._old/part-stale.parquet", "w") as f:
        f.write("stale")
    swap_write(_state_df(spark, [1, 2, 3]), live)
    assert _read_vals(spark, live) == [1, 2, 3]
    assert not os.path.exists(live + "._old")


def test_swap_write_restores_old_when_live_missing(spark, tmp_path):
    # ADVICE r7: crash point 1 (live renamed away, tmp never renamed
    # in) followed by a swap_write whose caller skipped recover_state.
    # The old unconditional pre-clean rmtree'd ._old — the ONLY
    # surviving copy — before the merged plan materialized; the
    # entry-point recover_state must rename it back first, so a lazy
    # merged plan that reads the live table still sees the full
    # accumulated state.
    live = str(tmp_path / "state")
    swap_write(_state_df(spark, [1, 2]), live)
    merged = spark.read.parquet(live).unionByName(_state_df(spark, [3]))
    os.rename(live, live + "._old")  # crash point 1
    swap_write(merged, live)  # no recover_state by the caller
    assert _read_vals(spark, live) == [1, 2, 3]
    assert not os.path.exists(live + "._old")


def test_full_cycle_with_recover_between_every_batch(spark, tmp_path):
    live = str(tmp_path / "state")
    for upto in range(1, 5):
        recover_state(live)
        swap_write(_state_df(spark, list(range(upto))), live)
    assert _read_vals(spark, live) == [0, 1, 2, 3]


def test_prune_batch_dirs_keeps_only_requested(tmp_path):
    sd = str(tmp_path)
    for bid in (1, 2, 3, 7):
        os.makedirs(os.path.join(sd, f"batch={bid}"))
    os.makedirs(os.path.join(sd, "notabatch"))
    prune_batch_dirs(sd, keep_ids={3, 7})
    kept = sorted(os.listdir(sd))
    assert kept == ["batch=3", "batch=7", "notabatch"]
