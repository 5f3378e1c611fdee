"""Fixture-table loaders.

The driver materializes TPC-H-ish tables plus ``events``, ``documents``,
``embeddings`` as one parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}`` (TESTDATA.md). At cluster scale these
would be directories of many parquet parts — ``spark.read.parquet`` handles
both identically, and every query in this repo relies on Catalyst pushing
filters and column pruning into the scan rather than pre-shaping the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


#: events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects outright;
#: the legacy flag reads it as epoch-nanos LONG and we rebuild a
#: TIMESTAMP_NTZ with pure interval arithmetic — session-timezone-INDEPENDENT
#: (convert_timezone/timestamp_micros render via the session tz and would
#: silently shift values under a non-UTC driver session) and truncating
#: ns→µs exactly like DuckDB's TIMESTAMP_NS → TIMESTAMP conversion.
_NANOS_TO_NTZ = (
    "TIMESTAMP_NTZ '1970-01-01 00:00:00' + "
    "make_dt_interval(0, 0, 0, CAST({col} DIV 1000 AS DECIMAL(20,0)) / 1000000)"
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr(_NANOS_TO_NTZ.format(col="ts")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
