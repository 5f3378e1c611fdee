"""Differential harness predicting the driver's correctness gate:
run a registered Spark query and its DuckDB oracle on the same parquet,
compare row count, column names, column TYPES, and exact
(order-insensitive) values.

Type strictness matters: the driver's value hash is dtype-typed, so a
DuckDB ``SUM(bigint_col)`` (which returns HUGEINT and surfaces as
decimal128/float64 through Arrow) hash-mismatches a Spark BIGINT even
when every value is identical.  Round 1 shipped four such oracles that
passed the old value-only local gate and failed the driver.  We now
fetch the oracle result through Arrow and compare canonical type tags —
integer width, float width, decimal precision/scale — against the Spark
schema, so an uncast integer SUM fails locally before it fails remotely.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime
from decimal import Decimal

import duckdb
import pyarrow as pa

from pyspark.sql import types as T

from tdk_apache_log_etl_spark.sources.tables import TABLES


def _canon(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        return ("dec", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("l", tuple(_canon(x) for x in v))
    return ("s", str(v))


# ---------------------------------------------------------------------------
# Canonical type tags.  Arrow (oracle side) and Spark schema (query side)
# both map onto the same small tag language; equality of tags is the
# type-strictness gate.  Integer/float widths and decimal (precision,
# scale) are part of the tag; timestamp unit/timezone are not (the value
# canonicalizer already strips tzinfo, and the driver compares values in
# naive local time).
# ---------------------------------------------------------------------------


def _arrow_tag(t: pa.DataType):
    if pa.types.is_boolean(t):
        return ("b",)
    if pa.types.is_integer(t):
        return ("i", t.bit_width)
    if pa.types.is_floating(t):
        return ("f", t.bit_width)
    if pa.types.is_decimal(t):
        return ("dec", t.precision, t.scale)
    if pa.types.is_timestamp(t):
        return ("ts",)
    if pa.types.is_date(t):
        return ("d",)
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return ("s",)
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return ("bin",)
    if (
        pa.types.is_list(t)
        or pa.types.is_large_list(t)
        or pa.types.is_fixed_size_list(t)
    ):
        return ("l", _arrow_tag(t.value_type))
    if pa.types.is_struct(t):
        return ("struct", tuple((f.name, _arrow_tag(f.type)) for f in t))
    if pa.types.is_null(t):
        return ("null",)
    return ("other", str(t))


def _spark_tag(t: T.DataType):
    if isinstance(t, T.BooleanType):
        return ("b",)
    if isinstance(t, T.LongType):
        return ("i", 64)
    if isinstance(t, T.IntegerType):
        return ("i", 32)
    if isinstance(t, T.ShortType):
        return ("i", 16)
    if isinstance(t, T.ByteType):
        return ("i", 8)
    if isinstance(t, T.DoubleType):
        return ("f", 64)
    if isinstance(t, T.FloatType):
        return ("f", 32)
    if isinstance(t, T.DecimalType):
        return ("dec", t.precision, t.scale)
    if isinstance(t, (T.TimestampType, T.TimestampNTZType)):
        return ("ts",)
    if isinstance(t, T.DateType):
        return ("d",)
    if isinstance(t, T.StringType):
        return ("s",)
    if isinstance(t, T.BinaryType):
        return ("bin",)
    if isinstance(t, T.ArrayType):
        return ("l", _spark_tag(t.elementType))
    if isinstance(t, T.StructType):
        return ("struct", tuple((f.name, _spark_tag(f.dataType)) for f in t))
    if isinstance(t, T.NullType):
        return ("null",)
    return ("other", t.simpleString())


def _normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return sorted(columns), out


def oracle_connection(sf_dir: str):
    """DuckDB connection with the standard tables registered as views.

    Tolerates partial dirs so tests can run parity over a planted
    single-table fixture (e.g. short-document documents.parquet).
    Shared by run_oracle and the oracle-output lints — one source of
    truth for the view-registration boilerplate."""
    con = duckdb.connect()
    for t in TABLES:
        if os.path.exists(f"{sf_dir}/{t}.parquet"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
    return con


def run_oracle(sql: str, sf_dir: str):
    """Run the DuckDB oracle; return (columns, rows, {col: type_tag}).

    Fetched through Arrow so INTEGER/BIGINT widths stay distinguishable
    (``fetchall`` collapses them all to Python int).  NOTE on wide
    numerics: DECIMAL — and HUGEINT, which Arrow exports as
    decimal128(38,0) — are deliberately CAST TO FLOAT64 below to match
    the driver's pandas fetch, so they do NOT keep a distinct tag; a
    Spark DecimalType output therefore mismatches here like it does
    remotely."""
    con = oracle_connection(sf_dir)
    tbl = con.execute(sql).fetch_arrow_table()
    con.close()
    # Driver-fidelity (round-8 ab_sequential_obf): the driver fetches the
    # oracle through pandas, where DuckDB DECIMAL columns arrive as
    # float64, while Spark DecimalType cells stay Decimal objects — so a
    # decimal-typed output hash-mismatches at the driver even when values
    # are identical.  The old harness kept BOTH sides as Decimal and
    # matched locally where the driver failed.  Reproduce the driver:
    # cast oracle-side decimals to float64 before tagging/extracting.
    for i, f in enumerate(tbl.schema):
        if pa.types.is_decimal(f.type):
            tbl = tbl.set_column(
                i,
                pa.field(f.name, pa.float64()),
                tbl.column(i).cast(pa.float64()),
            )
    cols = tbl.column_names
    tags = {f.name: _arrow_tag(f.type) for f in tbl.schema}
    cols_data = [tbl.column(i).to_pylist() for i in range(tbl.num_columns)]
    rows = list(zip(*cols_data)) if cols_data else []
    if tbl.num_columns and not rows and tbl.num_rows:
        rows = [tuple() for _ in range(tbl.num_rows)]
    return cols, rows, tags


def driver_canon_smoke(rows, columns) -> str | None:
    """Reproduce the driver's canonicalization (pandas DataFrame +
    sort_values over ALL columns, then value hashing) and return an
    error string if it cannot digest the result shape.

    The driver crashed on round 4's ``inverted_index_postings`` with
    ``TypeError: unhashable type: 'list'`` — the values were RIGHT, the
    representation (an array<bigint> column) was indigestible.  Running
    the exact same pandas pipeline locally turns that class of failure
    into a red test before the driver ever sees it."""
    import pandas as pd

    try:
        pdf = pd.DataFrame(rows, columns=list(columns))
        if columns:
            pdf = pdf.sort_values(by=list(columns), kind="mergesort")
        # the hash step is where list/dict cells actually detonate;
        # hash EVERY row — an object-dtype surprise first appearing
        # after row 100 of the sorted frame must fail here, not at the
        # driver (the collect above already paid the real cost)
        for c in pdf.columns:
            hash(tuple(pdf[c]))
    except TypeError as exc:  # the driver's failure mode, verbatim
        return f"driver-canon incompatible output: {exc}"
    except Exception as exc:  # pragma: no cover - any other canon crash
        return f"driver-canon crashed: {type(exc).__name__}: {exc}"
    return None


def compare(spark, name: str, fn, sql: str, sf_dir: str):
    """Returns (ok, detail)."""
    sdf = fn(spark, sf_dir)
    s_cols = sdf.columns
    s_tags = {f.name: _spark_tag(f.dataType) for f in sdf.schema.fields}
    s_rows = [tuple(r) for r in sdf.collect()]
    canon_err = driver_canon_smoke(s_rows, s_cols)
    if canon_err is not None:
        return False, canon_err
    o_cols, o_rows, o_tags = run_oracle(sql, sf_dir)

    if sorted(s_cols) != sorted(o_cols):
        return False, f"columns differ: spark={sorted(s_cols)} duck={sorted(o_cols)}"
    type_diffs = {
        c: (s_tags[c], o_tags[c]) for c in s_cols if s_tags[c] != o_tags[c]
    }
    if type_diffs:
        return False, f"column types differ (spark, duck): {type_diffs}"
    if len(s_rows) != len(o_rows):
        return False, f"row counts differ: spark={len(s_rows)} duck={len(o_rows)}"
    nc_s = _normalize(s_rows, s_cols)
    nc_o = _normalize(o_rows, o_cols)
    if nc_s != nc_o:
        diff_s = [r for r in nc_s[1] if r not in set(nc_o[1])][:3]
        diff_o = [r for r in nc_o[1] if r not in set(nc_s[1])][:3]
        return False, f"values differ; spark-only={diff_s} duck-only={diff_o}"
    return True, f"{len(s_rows)} rows match"
