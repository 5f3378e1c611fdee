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
