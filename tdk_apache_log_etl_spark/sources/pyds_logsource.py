"""Custom connector via the Spark 4 Python DataSource API: an
``apachelog`` format that reads directories of CLF ``*.log`` files with
one input partition PER FILE.

Why this exists alongside sources/apache_log.py (the production path):
the native reader (spark.read.text + one-pass JVM regex) is how CLF
should be ingested — every byte stays JVM-side. This module is the
repo's template for the formats that have NO native Spark reader at
all (proprietary binary logs, vendor archive formats): subclass
``DataSource``/``DataSourceReader``, enumerate self-describing input
splits in ``partitions()`` (here: one per file — exactly the
granularity of the reference's S3 listing, sree-etl-tdk-lambda.py:58-66),
and yield tuples from ``read()``. Spark distributes partitions across
executors and streams rows back through Arrow batches.

Scale notes:
  * parallelism = number of files; a 100 TB archive of daily logs is
    tens of thousands of files, so the split list stays driver-cheap
    while saturating any executor count. For giant single files a
    (file, byte-range) split scheme drops in without API changes.
  * the Python-side parse is the SLOW path (~10-100× vs the JVM regex);
    acceptable only because this is the connector-of-last-resort
    template. The row schema matches read_apache_log's parsed output
    (minus derived request/date columns), so the two sources are
    interchangeable upstream of the pipeline — asserted by
    tests/test_textual_sources.py equivalence test.
"""

from __future__ import annotations

import glob
import os
import re
from datetime import datetime, timedelta

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from .apache_log import CLF_REGEX

SCHEMA = (
    "ip_address string, rfc_1413_identity string, user_id long, "
    "time timestamp_ntz, request string, status_code long, size long, "
    "referer string, user_agent string, _corrupt string"
)

_RX = re.compile(CLF_REGEX)
_TIME_RX = re.compile(
    r"^(\d{2})/([A-Za-z]{3})/(\d{4}):(\d{2}):(\d{2}):(\d{2}) ([+-])(\d{2})(\d{2})$"
)
_MONTHS = {
    m: i + 1
    for i, m in enumerate(
        "Jan Feb Mar Apr May Jun Jul Aug Sep Oct Nov Dec".split()
    )
}


def _null_dash(s: str) -> str | None:
    return None if s in ("-", "") else s


def _to_long(s: str | None) -> int | None:
    if s is None:
        return None
    try:
        return int(s)
    except ValueError:
        return None


def _parse_time(s: str | None) -> datetime | None:
    """CLF timestamp → naive UTC, applying the ±HHMM offset exactly like
    the native parser (subtract the offset; sources/apache_log.py)."""
    if s is None:
        return None
    m = _TIME_RX.match(s)
    if not m:
        return None
    day, mon, year, hh, mm, ss, sign, oh, om = m.groups()
    try:
        base = datetime(
            int(year), _MONTHS[mon], int(day), int(hh), int(mm), int(ss)
        )
    except (KeyError, ValueError):
        return None
    offset = timedelta(hours=int(oh), minutes=int(om))
    return base - offset if sign == "+" else base + offset


def parse_clf_line(line: str) -> tuple:
    """One CLF line → the SCHEMA tuple (pure function; unit-testable
    without Spark)."""
    m = _RX.match(line)
    if not m:
        return (None,) * 9 + (line,)
    g = [_null_dash(x) for x in m.groups()]
    return (
        g[0],
        g[1],
        _to_long(g[2]),
        _parse_time(g[3]),
        g[4],
        _to_long(g[5]),
        _to_long(g[6]),
        g[7],
        g[8],
        None,
    )


class _LogFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class ApacheLogReader(DataSourceReader):
    def __init__(self, options: dict):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("apachelog source requires a path option")
        self._glob = options.get("pattern", "*.log")

    def partitions(self):
        files = sorted(glob.glob(os.path.join(self._path, self._glob)))
        # empty dir → one no-op partition (Spark requires >= 1)
        return [_LogFilePartition(f) for f in files] or [
            _LogFilePartition("")
        ]

    def read(self, partition: _LogFilePartition):
        if not partition.path:
            return
        with open(partition.path, encoding="utf-8", errors="replace") as fh:
            for line in fh:
                line = line.rstrip("\n")
                if line:
                    yield parse_clf_line(line)


class ApacheLogStreamReader(DataSourceStreamReader):
    """Streaming half of the connector (``spark.readStream.format(
    "apachelog")``): micro-batch offsets are the SORTED LIST OF FILES
    seen so far — new files between two offsets become that batch's
    input partitions (one per file, same granularity as the batch
    reader), which is exactly the discovery contract of Spark's native
    file stream source re-expressed through the Python API. Offsets are
    JSON-serializable and checkpointable, so restart resumes at the
    file boundary; files are assumed immutable-once-written (the log
    rotation contract the reference's Lambda relies on:
    sree-etl-tdk-lambda.py:147-166).

    Driver-side state is one sorted filename list per offset — tens of
    thousands of daily logs stay trivially cheap; the per-file rows are
    read on EXECUTORS via the same partition reader as the batch path.
    """

    def __init__(self, options: dict):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("apachelog source requires a path option")
        self._glob = options.get("pattern", "*.log")

    def _current_files(self) -> list[str]:
        return sorted(glob.glob(os.path.join(self._path, self._glob)))

    def initialOffset(self) -> dict:
        return {"files": []}

    def latestOffset(self) -> dict:
        return {"files": self._current_files()}

    def partitions(self, start: dict, end: dict):
        new = sorted(set(end["files"]) - set(start["files"]))
        # empty micro-batch → one no-op partition (the API requires >= 1)
        return [_LogFilePartition(f) for f in new] or [_LogFilePartition("")]

    def read(self, partition: _LogFilePartition):
        if not partition.path:
            return
        with open(partition.path, encoding="utf-8", errors="replace") as fh:
            for line in fh:
                line = line.rstrip("\n")
                if line:
                    yield parse_clf_line(line)

    def commit(self, end: dict) -> None:
        # files are immutable once written; nothing to clean up. A
        # post-ingest archive (K5) would move end["files"] here.
        pass


class ApacheLogDataSource(DataSource):
    """``spark.read.format("apachelog").option("path", dir).load()``."""

    @classmethod
    def name(cls) -> str:
        return "apachelog"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> ApacheLogReader:
        return ApacheLogReader(self.options)

    def streamReader(self, schema) -> ApacheLogStreamReader:
        return ApacheLogStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(ApacheLogDataSource)
