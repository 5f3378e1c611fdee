"""Cross-engine exact-match numeric helpers.

The driver's correctness gate value-hashes Spark results against DuckDB
results, so floating-point aggregates must be BIT-IDENTICAL, not just close.
Rules used throughout this repo:

  * Sums of doubles are order-dependent under parallelism → fix each addend
    to 4 decimal places FIRST via floor(x*10^4 + 0.5) (pure IEEE double ops,
    bit-identical in every engine; a DECIMAL(18,4) cast is NOT — Spark
    rounds the exact binary expansion half-up while DuckDB rounds the
    scaled double, and half-way cases diverge), sum the resulting integers
    exactly, and divide the total back down in double. Both engines then
    produce the same bits regardless of partitioning.
  * Averages are expressed as fixed-sum / count — one double division on
    identical operands is deterministic (IEEE 754).
  * Per-row double arithmetic (a*(1-b), sqrt, /) is deterministic given
    identical operands, so raw per-row expressions need no special handling.
  * Left-to-right folds over arrays (F.aggregate in Spark, list_reduce in
    DuckDB) add in the same order → identical bits.

At 100 TB scale the decimal trick is also the *correct* choice for money
columns — it removes the nondeterminism AQE / speculative execution would
otherwise introduce into financial aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


SCALE = 10_000  # 4 decimal places


def dec_sum(col: Column, scale: int = SCALE) -> Column:
    """Order-insensitive exact sum of a double column, returned as double.

    floor(x*scale + 0.5) is round-half-up in pure double arithmetic —
    deterministic and engine-independent; the integer sum is exact (fits
    long for any realistic money column at bench scale; at 100 TB switch
    scale down or sum as decimal)."""
    return (F.sum(F.floor(col * scale + F.lit(0.5))).cast("double") / scale)


def dec_avg(col: Column, scale: int = SCALE) -> Column:
    """Average as exact-sum / count — bit-stable across engines."""
    return dec_sum(col, scale) / F.count(col)


def sql_dec_sum(expr: str, scale: int = SCALE) -> str:
    return (
        f"(CAST(SUM(CAST(FLOOR(({expr}) * {scale} + 0.5) AS BIGINT)) AS DOUBLE)"
        f" / {scale})"
    )


def sql_dec_avg(expr: str, scale: int = SCALE) -> str:
    return f"{sql_dec_sum(expr, scale)} / COUNT({expr})"
