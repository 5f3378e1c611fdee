"""Generic JSON-lines / CSV sources with corrupt-record quarantine.

The reference ingests exactly one format (Apache CLF over S3 text,
sree-etl-tdk-lambda.py:147-164 — covered by sources/apache_log.py); a
complete engine also ingests the delimited/JSON feeds that surround a
log pipeline.  Both readers follow the same contract as the CLF parser:

  * **explicit DDL schema, never inference** — schema inference is a
    full extra pass over the data before the real read (at 100 TB, a
    second 100 TB scan) and can silently change types between runs;
  * **malformed rows quarantine, never fail the file** — PERMISSIVE mode
    routes unparseable lines into a ``_corrupt`` column (the same
    convention as the CLF parser's ``_corrupt``), so one bad record in a
    10 TB feed costs one NULL row, not the job;
  * **splittable by construction** — single-line JSON and unquoted-
    newline CSV split on block boundaries, so a daily directory
    parallelizes to (bytes / maxPartitionBytes) tasks.  ``multiLine`` is
    deliberately NOT exposed: a multiline file is one task at any size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: the documents feed (TESTDATA.md) as it would arrive as JSONL
DOCUMENTS_DDL = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def _schema_with_corrupt(ddl: str) -> T.StructType:
    schema = T.StructType.fromDDL(ddl)
    return schema.add("_corrupt", T.StringType())


def read_jsonl(
    spark: SparkSession,
    path: str,
    ddl: str,
    keep_corrupt: bool = True,
) -> DataFrame:
    """Read single-line JSON records under ``path`` with the given DDL
    schema; rows that fail to parse land in ``_corrupt`` with all data
    columns NULL (drop the column with ``keep_corrupt=False`` once the
    quarantine has been persisted elsewhere)."""
    df = (
        spark.read.schema(_schema_with_corrupt(ddl))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )
    return df if keep_corrupt else df.drop("_corrupt")


def read_csv(
    spark: SparkSession,
    path: str,
    ddl: str,
    header: bool = True,
    sep: str = ",",
    keep_corrupt: bool = True,
) -> DataFrame:
    """Read CSV under ``path`` with the given DDL schema.  A row whose
    arity or types don't fit the schema quarantines into ``_corrupt``
    (Spark keeps the raw line there); well-formed fields of a partially
    bad row are preserved — the PERMISSIVE contract."""
    df = (
        spark.read.schema(_schema_with_corrupt(ddl))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .option("header", "true" if header else "false")
        .option("sep", sep)
        .csv(path)
    )
    return df if keep_corrupt else df.drop("_corrupt")


def quarantine_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a quarantining read into (clean, corrupt) frames — the
    ingest pattern: clean rows continue down the pipeline, corrupt raw
    lines are persisted for inspection/replay.  Spark requires a
    materialization barrier before filtering on ONLY the corrupt column
    (SPARK-21610); selecting data columns alongside, as both branches
    here do, stays inside the supported contract."""
    clean = df.filter(F.col("_corrupt").isNull()).drop("_corrupt")
    corrupt = df.filter(F.col("_corrupt").isNotNull())
    return clean, corrupt
