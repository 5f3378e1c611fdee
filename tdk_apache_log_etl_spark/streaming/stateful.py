"""Custom stateful streaming: per-key running aggregates via
``applyInPandasWithState`` — the escape hatch for stateful semantics the
built-in windowed aggregations can't express (here: a running per-user
profile that survives across micro-batches and expires on inactivity).

State design for scale: state lives in the executor-local state store keyed
by user_id — memory is bounded by ACTIVE key cardinality (timeouts evict
idle users), never by event volume. Each micro-batch shuffles only that
batch's rows to their key's partition; the store itself never shuffles.
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_events long, total_size long, last_seen string"
OUTPUT_SCHEMA = (
    "user_id long, n_events long, total_size long, last_seen string"
)
IDLE_TIMEOUT_MS = 30 * 60 * 1000  # evict users idle > 30 min (processing time)


def _update_user_profile(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    """Fold this micro-batch's rows for one user into the persistent
    (n_events, total_size, last_seen) state and emit the updated profile."""
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()
        return
    n_events, total_size, last_seen = (
        state.get if state.exists else (0, 0, "")
    )
    for pdf in pdfs:
        n_events += len(pdf)
        total_size += int(pdf["size"].fillna(0).sum())
        batch_max = pdf["time"].dropna().max()
        if pd.notna(batch_max):
            s = batch_max.strftime("%Y-%m-%d %H:%M:%S")
            last_seen = max(last_seen, s)
    state.update((n_events, total_size, last_seen))
    state.setTimeoutDuration(IDLE_TIMEOUT_MS)
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n_events],
            "total_size": [total_size],
            "last_seen": [last_seen],
        }
    )


def running_user_profiles(parsed: DataFrame) -> DataFrame:
    """Streaming per-user running profile over the parsed CLF stream.

    The built-in aggregations could produce per-window counts, but a
    "running total since first seen, evicted after 30 min idle" is genuinely
    custom state — exactly the applyInPandasWithState contract: Arrow
    batches per (key, micro-batch), explicit GroupState, explicit timeout.
    """
    return (
        parsed.filter(parsed["user_id"].isNotNull())
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_profile,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming debounce — the stream twin of operators/logmetrics.py
# dedup_events_debounce (predecessor-based suppression), with the
# last-seen timestamp as explicit per-key state.
# ---------------------------------------------------------------------------

DEBOUNCE_SECONDS = 120
DEBOUNCE_STATE_SCHEMA = "last_epoch long"
DEBOUNCE_OUTPUT_SCHEMA = (
    "user_id long, request_method string, time string"
)
DEBOUNCE_IDLE_TIMEOUT_MS = 60 * 60 * 1000


def _debounce_key(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    """Emit only events that fired more than DEBOUNCE_SECONDS after their
    immediate predecessor for this (user, method) key; the predecessor
    timestamp is the ONLY state (one long per active key)."""
    user_id, method = key
    if state.hasTimedOut:
        state.remove()
        return
    last = state.get[0] if state.exists else None
    batch = pd.concat(list(pdfs), ignore_index=True)
    batch = batch.dropna(subset=["time"]).sort_values("time")
    kept = []
    for ts in batch["time"]:
        epoch = int(ts.value // 1_000_000_000)
        if last is None or epoch - last > DEBOUNCE_SECONDS:
            kept.append(ts)
        last = epoch  # predecessor-based: every event advances the anchor
    if last is not None:
        state.update((last,))
    state.setTimeoutDuration(DEBOUNCE_IDLE_TIMEOUT_MS)
    if kept:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(kept),
                "request_method": [method] * len(kept),
                "time": [t.strftime("%Y-%m-%d %H:%M:%S") for t in kept],
            }
        )


def debounce_stream(parsed: DataFrame) -> DataFrame:
    """Streaming debounce over the parsed CLF stream: suppress repeats of
    the same (user, request_method) within DEBOUNCE_SECONDS of their
    predecessor — identical semantics to the batch
    ``dedup_events_debounce`` operator, state bounded at one timestamp
    per ACTIVE key (idle keys evicted after an hour).

    dropDuplicatesWithinWatermark dedups exact keys within a watermark
    but cannot express "within W of the PREVIOUS occurrence" (a rolling
    anchor); this is precisely the applyInPandasWithState contract."""
    return (
        parsed.filter(parsed["user_id"].isNotNull())
        .groupBy("user_id", "request_method")
        .applyInPandasWithState(
            _debounce_key,
            outputStructType=DEBOUNCE_OUTPUT_SCHEMA,
            stateStructType=DEBOUNCE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
