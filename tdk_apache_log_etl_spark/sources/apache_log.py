"""Apache Combined Log Format source — the reference's entire ingest path
(reference: sree-etl-tdk-lambda.py:145-218) as ~40 lines of native Spark.

Semantics reproduced from the reference (citations into /root/reference):
  * 9 whitespace-separated fields with quotes/brackets protecting embedded
    spaces (sree-etl-tdk-lambda.py:169 split-regex, :173 usecols, :174 names).
  * ``-`` means NULL in every field (sree-etl-tdk-lambda.py:171).
  * ``time`` is ``[dd/Mon/yyyy:HH:mm:ss ±zzzz]``: brackets stripped, parsed,
    and the numeric offset applied (sree-etl-tdk-lambda.py:41-55, offset
    minutes at :54). We parse the datetime part as TIMESTAMP_NTZ and subtract
    the offset as an interval, yielding UTC wall-clock — value-identity
    preserved, offset-identity not (SURVEY.md §7.4.1). Deliberately NOT
    Spark's ``Z`` pattern: that returns a session-tz instant whose rendering
    shifts under a non-UTC driver session; the NTZ+interval form is
    session-timezone-independent.
  * ``request`` / ``referer`` / ``user_agent`` quote-stripping
    (sree-etl-tdk-lambda.py:30-38), then ``request`` split into
    method/resource/protocol and dropped (sree-etl-tdk-lambda.py:183-186).
  * Declared output schema (sree-etl-tdk-lambda.py:62-78), lowercase names,
    partition column ``date``.

Deliberate improvement over the reference: a malformed line does NOT abort
the whole file (the reference re-raises, sree-etl-tdk-lambda.py:214-218);
instead all parsed columns are NULL and the raw line is preserved in
``_corrupt`` for auditability.

Everything here is a native column expression — regexp_extract, nullif,
try_cast, try_to_timestamp — so the parse stays inside whole-stage codegen
and scales linearly with executors; a Python UDF here would serialize every
row through the Python worker and dominate runtime at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: One regex, one group per CLF field. Equivalent observable behavior to the
#: reference's split-on-whitespace-outside-quotes/brackets regex
#: (sree-etl-tdk-lambda.py:169) combined with its quote/bracket stripping
#: (:30-38): the groups already exclude the delimiters.
CLF_REGEX = (
    r'^(\S+) (\S+) (\S+) \[([^\]]+)\] "([^"]*)" (\S+) (\S+) "([^"]*)" "([^"]*)"\s*$'
)

#: ``dd/Mon/yyyy:HH:mm:ss ±zzzz`` (brackets already stripped by the regex).
CLF_TIME_FORMAT = "dd/MMM/yyyy:HH:mm:ss"
_CLF_TIME_SHAPE = r"^\d{2}/[A-Za-z]{3}/\d{4}:\d{2}:\d{2}:\d{2} [+-]\d{4}$"


def _grp(line: Column, i: int) -> Column:
    """Extract group ``i``, mapping both regex-miss and ``-`` to NULL."""
    g = F.regexp_extract(line, CLF_REGEX, i)
    return F.nullif(F.nullif(g, F.lit("")), F.lit("-"))


def _clf_time_utc(time_raw: Column) -> Column:
    """``dd/Mon/yyyy:HH:mm:ss ±HHMM`` → UTC TIMESTAMP_NTZ.

    Offset minutes computed exactly like the reference
    (sree-etl-tdk-lambda.py:54: ``int(x[-6:-3])*60 + int(x[-3:-1])`` with the
    sign applied) and subtracted, so the stored value is the UTC wall-clock.
    The shape guard keeps to_timestamp_ntz off malformed input (ANSI mode).
    """
    valid = time_raw.rlike(_CLF_TIME_SHAPE)
    local = F.to_timestamp_ntz(
        F.substring(time_raw, 1, 20), F.lit(CLF_TIME_FORMAT)
    )
    sign = F.when(F.substring(time_raw, 22, 1) == "-", -1).otherwise(1)
    offset_min = sign * (
        F.substring(time_raw, 23, 2).cast("int") * 60
        + F.substring(time_raw, 25, 2).cast("int")
    )
    return F.when(
        valid,
        local - F.make_dt_interval(F.lit(0), F.lit(0), offset_min, F.lit(0)),
    )


def parse_clf_lines(
    lines: DataFrame,
    value_col: str = "value",
    run_date: str | None = None,
    keep_corrupt: bool = True,
) -> DataFrame:
    """Parse a DataFrame of raw CLF lines into the cleansed staging schema.

    ``run_date`` stamps the ``date`` partition column (the reference stamps
    the wall-clock ingest date, sree-etl-tdk-lambda.py:205; we default to the
    event date so the partition key is deterministic and meaningful).
    """
    line = F.col(value_col)
    matched = line.rlike(CLF_REGEX)

    request = _grp(line, 5)
    req_parts = F.split(request, " ")
    time_col = _clf_time_utc(_grp(line, 4))
    date_col = (
        F.lit(run_date) if run_date is not None
        else F.date_format(time_col, "yyyy-MM-dd")
    )

    out = lines.select(
        _grp(line, 1).alias("ip_address"),
        # Declared double in the catalog schema (sree-etl-tdk-lambda.py:64)
        # even though %l is effectively always "-" → NULL.
        _grp(line, 2).try_cast("double").alias("rfc_1413_identity"),
        _grp(line, 3).try_cast("long").alias("user_id"),
        time_col.alias("time"),
        _grp(line, 6).try_cast("long").alias("status_code"),
        _grp(line, 7).try_cast("long").alias("size"),
        _grp(line, 8).alias("referer"),
        _grp(line, 9).alias("user_agent"),
        F.get(req_parts, 0).alias("request_method"),
        F.get(req_parts, 1).alias("request_resource"),
        F.get(req_parts, 2).alias("request_protocol"),
        date_col.alias("date"),
        F.when(~matched, line).alias("_corrupt"),
    )
    if not keep_corrupt:
        out = out.drop("_corrupt")
    return out


def read_apache_log(
    spark: SparkSession,
    path: str,
    run_date: str | None = None,
    keep_corrupt: bool = True,
) -> DataFrame:
    """Read ``*.log`` files under ``path`` into the cleansed staging schema.

    ``spark.read.text`` + ``pathGlobFilter`` natively covers the reference's
    S3 listing + extension filter + whole-object read
    (sree-etl-tdk-lambda.py:147-164) — distributed, one row per line.
    """
    lines = spark.read.option("pathGlobFilter", "*.log").text(path)
    return parse_clf_lines(lines, run_date=run_date, keep_corrupt=keep_corrupt)
