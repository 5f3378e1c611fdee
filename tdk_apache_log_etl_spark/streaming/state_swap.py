"""Crash-RECOVERABLE swap-write for the small foreachBatch state tables.

The incremental streaming operators (OHLC bars, active-user day sets,
Bloom blocklists, freshness watermarks, sketch rollups) maintain a small
parquet state table that each micro-batch rewrites via
write-tmp → rename-away-live → rename-tmp-into-place.  The double rename
is NOT atomic: a process dying between the two renames leaves no live
table, and a naive next batch would silently restart state from that one
batch (all prior accumulation lost) while the orphaned ``._old`` copy
rots on disk.

``recover_state`` heals exactly that window — call it at merge entry,
BEFORE the ``os.path.exists(table_path)`` read-side check — and
``swap_write`` performs the swap itself so the five modules share one
audited implementation instead of five drifting copies.

Local-filesystem semantics are deliberate: this state layer is the
single-node test double for what is a transactional table format
(Delta/Iceberg) on a real cluster, where commit atomicity comes from
the table format, not from renames.  The recover/swap contract here
mirrors that design: recovery is idempotent, the state table is tiny
(one row per grain cell), and the swap window is milliseconds.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame


def recover_state(table_path: str) -> None:
    """Heal a crash inside the swap window: if the live table is missing
    but its ``._old`` predecessor survives, the writer died between the
    two renames — rename the predecessor back so the next merge resumes
    from the full accumulated state instead of restarting from one
    batch.  Idempotent; a no-op whenever the live table exists."""
    old = table_path + "._old"
    if not os.path.exists(table_path) and os.path.exists(old):
        os.rename(old, table_path)
    elif os.path.exists(table_path) and os.path.exists(old):
        # Crash AFTER os.rename(tmp, table_path) but BEFORE the rmtree:
        # the live table is the newer state and ``._old`` is its stale
        # predecessor.  Left in place it would wedge the NEXT swap_write
        # (os.rename(table_path, old) raises ENOTEMPTY), so clear it here.
        shutil.rmtree(old)


def swap_write(merged: DataFrame, table_path: str) -> None:
    """Write ``merged`` to ``table_path`` via tmp-then-double-rename.
    Crash-recoverable (see module docstring), not atomic: pair every
    read of ``table_path`` with a prior :func:`recover_state` call."""
    # Heal BOTH crash windows at entry, BEFORE the tmp write can
    # materialize a lazy ``merged`` plan that reads ``table_path``: if
    # the live table is missing, the orphaned ``._old`` is the ONLY
    # surviving copy of accumulated state (crash between the two
    # renames) and must be renamed back, never rmtree'd — the previous
    # unconditional pre-clean would have silently destroyed it for any
    # caller that skipped recover_state.  When the live table exists,
    # this clears the stale predecessor so the rename below doesn't
    # ENOTEMPTY.  Idempotent; callers that already recovered (all five
    # in-tree ones do, before building ``merged``) pay a stat call.
    recover_state(table_path)
    old = table_path + "._old"
    tmp = table_path + "._tmp"
    merged.write.mode("overwrite").parquet(tmp)
    if os.path.exists(table_path):
        os.rename(table_path, old)
    os.rename(tmp, table_path)
    if os.path.exists(old):
        shutil.rmtree(old)


def prune_batch_dirs(state_dir: str, keep_ids: set[int]) -> None:
    """Retention for the batch-id exactly-once state layout
    (``batch=<id>/...`` dirs committed by their _SUCCESS marker, as in
    drift_stream / mv_stream): the state is CUMULATIVE — each committed
    dir holds the full merged table — so after committing batch N only
    N itself and its predecessor (kept for readers that resolved the
    latest id just before the commit) are live.  Everything older is
    garbage that would otherwise grow O(batches x state size) on a
    long-running stream.  Unknown dir names are left alone.

    CONCURRENT-READER LIMIT: the keep-2 window tolerates exactly ONE
    in-flight commit between a reader resolving ``committed[-1]`` and
    materializing the DataFrame.  If two commits can land inside a
    single reader's resolve→materialize gap (very slow readers, very
    fast triggers), pass a larger ``keep_ids`` set from the caller —
    the function prunes whatever is NOT in ``keep_ids``, so the window
    is the caller's policy, not this function's."""
    if not os.path.isdir(state_dir):
        return
    for name in os.listdir(state_dir):
        if not name.startswith("batch="):
            continue
        try:
            bid = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if bid not in keep_ids:
            shutil.rmtree(os.path.join(state_dir, name), ignore_errors=True)
