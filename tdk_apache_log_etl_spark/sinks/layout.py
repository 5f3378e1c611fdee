"""Data-layout sink: clustered (sorted / z-ordered) Parquet writes for
min/max row-group pruning.

At 100 TB the scan you avoid is worth more than the scan you speed up.
Parquet footers carry per-row-group min/max statistics for every column;
engines (Spark, DuckDB, Trino, ...) skip row groups whose [min, max]
cannot satisfy the predicate. Stats are only USEFUL when the data is
laid out so each row group covers a narrow value range:

  * single-column clustering: ``repartitionByRange(col)`` +
    ``sortWithinPartitions(col)`` — file k holds the k-th value range,
    so a range predicate on ``col`` touches ~1 file. (This is the
    ORDER BY of a CREATE TABLE ... AS in warehouse engines.)
  * multi-column clustering: sort by (a, b) only prunes on ``a``; the
    Z-ORDER key interleaves the BITS of several columns so proximity in
    any single dimension implies proximity in the sort key — predicates
    on EITHER column prune a large fraction of row groups (the
    Delta/Iceberg OPTIMIZE ZORDER design, built here from native
    bit-arithmetic expressions: shiftleft/shiftright/bitwise-and inside
    whole-stage codegen, no UDF).

The z-key normalizes each column to a ``bits``-wide integer rank via
min/max scaling (two scalars read driver-side — the same bounded
collect the IVF quantizer uses), then interleaves. Everything else is a
plain clustered write.

Pruning is proven, not hoped for: tests/test_layout.py reads the footer
statistics back with pyarrow and counts the row groups a range predicate
would touch — clustered layouts must touch a small fraction where the
baseline layout touches ~all. That measurement is engine-neutral (it is
exactly the information any engine's pruner consumes).

Reference parity: the reference's layout story is one hive partition per
day (sree-etl-tdk-lambda.py:112-118); this module is the within-partition
complement a fact table needs once single days are themselves terabytes.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Bits per dimension in the z-key. 2 dims × 16 bits = 32-bit key, well
#: inside a LONG; 65536 ranks per dimension is far finer than any
#: realistic row-group count, so rank quantization never limits pruning.
Z_BITS = 16


def _scale_to_rank(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Min/max-scale a numeric column to an integer in [0, 2^bits)."""
    span = (hi - lo) or 1.0
    frac = (col.cast("double") - F.lit(float(lo))) / F.lit(float(span))
    clamped = F.least(F.greatest(frac, F.lit(0.0)), F.lit(1.0))
    return F.floor(clamped * F.lit(float((1 << bits) - 1))).cast("long")


def zorder_key(ranks: list[Column], bits: int = Z_BITS) -> Column:
    """Interleave the low ``bits`` bits of each rank column, rank 0 in
    the least-significant lane: z = Σ_i Σ_d bit_d(i) << (i·D + d)."""
    d = len(ranks)
    terms = [
        F.shiftleft(
            F.shiftright(ranks[dim], i).bitwiseAND(F.lit(1)),
            i * d + dim,
        )
        for i in range(bits)
        for dim in range(d)
    ]
    return reduce(lambda a, b: a + b, terms)


def write_clustered(
    df: DataFrame, path: str, col: str, n_files: int | None = None
) -> None:
    """Single-column clustered write: range-partition then sort, so each
    output file (hence each row group) covers one narrow value range."""
    n = n_files or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    (
        df.repartitionByRange(n, F.col(col))
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .parquet(path)
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int | None = None,
    bits: int = Z_BITS,
) -> None:
    """Multi-column clustered write via a z-order key. One extra agg job
    reads the per-column min/max (2·D driver-side scalars); the write
    itself is one range shuffle + local sort on the computed key, which
    is dropped before writing."""
    n = n_files or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"lo_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    ranks = [
        _scale_to_rank(F.col(c), bounds[f"lo_{c}"], bounds[f"hi_{c}"], bits)
        for c in cols
    ]
    (
        df.withColumn("_zkey", zorder_key(ranks, bits))
        .repartitionByRange(n, F.col("_zkey"))
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
