"""Differential harness predicting the driver's correctness gate:
run a registered Spark query and its DuckDB oracle on the same parquet,
compare row count, column names, and exact (order-insensitive) values.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb

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


def _normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return sorted(columns), out


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def compare(spark, name: str, fn, sql: str, sf_dir: str):
    """Returns (ok, detail)."""
    sdf = fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    o_cols, o_rows = run_oracle(sql, sf_dir)

    if sorted(s_cols) != sorted(o_cols):
        return False, f"columns differ: spark={sorted(s_cols)} duck={sorted(o_cols)}"
    if len(s_rows) != len(o_rows):
        return False, f"row counts differ: spark={len(s_rows)} duck={len(o_rows)}"
    nc_s = _normalize(s_rows, s_cols)
    nc_o = _normalize(o_rows, o_cols)
    if nc_s != nc_o:
        diff_s = [r for r in nc_s[1] if r not in set(nc_o[1])][:3]
        diff_o = [r for r in nc_o[1] if r not in set(nc_s[1])][:3]
        return False, f"values differ; spark-only={diff_s} duck-only={diff_o}"
    return True, f"{len(s_rows)} rows match"
