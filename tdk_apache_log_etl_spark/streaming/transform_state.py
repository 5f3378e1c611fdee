"""Arbitrary stateful streaming on the Spark 4 ``transformWithStateInPandas``
API: streaming first-seen deduplication with TTL'd state.

Why this API (vs the applyInPandasWithState profile in stateful.py):
``transformWithState`` is the successor contract — typed state variables
(value/list/map) with PER-STATE TTL, timers, and an initial-state hook,
running on the RocksDB state store so state size is bounded by disk, not
executor heap. The two coexist here deliberately: stateful.py shows the
GroupState contract, this module the Spark 4 replacement.

Operator: exact first-occurrence dedup over an unbounded key space.
``dropDuplicatesWithinWatermark`` (streaming/log_stream.py) bounds state
by EVENT-time lateness; this bounds it by PROCESSING-time retention
(``ttlDurationMs``) — the right tool when the stream has no trustworthy
event time (the reference's access logs carry client-skewed clocks) but
"suppress repeats seen in the last N hours" is the contract. State per
key is one LONG (occurrence count), so 10⁹ active keys ≈ tens of GB in
RocksDB per executor — disk-backed, off-heap, and evicted by TTL.

The emitted row is the FIRST row of a key (append mode); subsequent
micro-batches only bump the suppressed-count state. A companion
count can be read back by re-keying — kept out so the output stays a
clean deduped stream.

ENVIRONMENT GATE (disclosed, like the PIL-less multimodal decode): the
transformWithState Python protocol speaks protobuf to the JVM state
server, so the ``protobuf`` package must be importable by workers. This
container ships pyspark without it, so tests/test_streaming.py skips
the e2e run when ``google.protobuf`` is missing; the operator itself is
complete and runs unmodified wherever protobuf is present (any standard
Spark 4 deployment).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

#: Suppress repeats of a key seen within the last 30 minutes.
DEDUP_TTL_MS = 30 * 60 * 1000

OUTPUT_SCHEMA = (
    "ip_address string, request_resource string, "
    "status_code long, size long"
)

#: transformWithState requires the RocksDB state store provider.
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


class FirstSeenDedup(StatefulProcessor):
    """Emit only the first row per (ip, request); count suppressions in
    a TTL'd one-long ValueState."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._seen = handle.getValueState(
            "seen", "n long", ttlDurationMs=DEDUP_TTL_MS
        )

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        n = self._seen.get()[0] if self._seen.exists() else 0
        first: pd.DataFrame | None = None
        for pdf in rows:
            if n == 0 and len(pdf) > 0 and first is None:
                first = pdf.iloc[:1][
                    ["ip_address", "request_resource", "status_code", "size"]
                ]
            n += len(pdf)
        self._seen.update((n,))
        if first is not None:
            yield first

    def close(self) -> None:  # pragma: no cover - nothing to release
        pass


def first_seen_requests(parsed: DataFrame) -> DataFrame:
    """Streaming dedup of the parsed CLF stream to first occurrences of
    (ip_address, request_resource). One shuffle per micro-batch on the
    key; state never shuffles (it lives with its partition's RocksDB
    instance)."""
    return (
        parsed.select(
            "ip_address", "request_resource", "status_code", "size"
        )
        .groupBy("ip_address", "request_resource")
        .transformWithStateInPandas(
            FirstSeenDedup(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Append",
            timeMode="ProcessingTime",
        )
    )
