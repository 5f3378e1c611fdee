"""ML feature-preparation operators (SURVEY.md §2.6 extension rows).

The reference stops at raw aggregates (sree-etl-tdk-glue-job.py:52-63);
the feature layer a training pipeline puts on top of relational tables
needs LEAKAGE-SAFE encodings: a categorical target encoding computed
naively (mean of the target per category over ALL rows) leaks each row's
own label into its feature and inflates offline metrics. The standard
fix is out-of-fold (OOF) encoding — every row receives the mean computed
from the OTHER folds only — materialized as a compact (category × fold)
lookup table that the training join broadcasts.

Exactness follows operators/numeric.py: targets fix to 4-dp integers,
all fold/category moments are exact integer sums, and each encoding is
one shared-literal IEEE double chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .numeric import SCALE
from .registry import query

# --------------------------------------------------------------------------
# E176: out-of-fold target encoding of the customer market segment
# --------------------------------------------------------------------------

#: Deterministic fold assignment — orderkey modulus, replayable in SQL.
N_FOLDS = 5
#: Additive-smoothing pseudo-count toward the (fold-excluded) global
#: prior; the standard micci-barreca smoothing that keeps rare
#: categories from memorizing their few labels.
TE_SMOOTH_M = 20

_TE_OOF = (
    f"(CAST(seg_s - s AS DOUBLE) / {SCALE})"
    f" / NULLIF(CAST(seg_n - n AS DOUBLE), 0.0)"
)
_TE_PRIOR = (
    f"(CAST(all_s - fold_s AS DOUBLE) / {SCALE})"
    f" / NULLIF(CAST(all_n - fold_n AS DOUBLE), 0.0)"
)
_TE_SMOOTH = (
    f"((CAST(seg_s - s AS DOUBLE) / {SCALE})"
    f" + {TE_SMOOTH_M}.0 * {_TE_PRIOR})"
    f" / (CAST(seg_n - n AS DOUBLE) + {TE_SMOOTH_M}.0)"
)


@query(
    "target_encode_mktsegment",
    oracle=f"""
        WITH base AS (
          SELECT c.c_mktsegment AS segment,
                 o.o_orderkey % {N_FOLDS} AS fold,
                 CAST(FLOOR(CAST(o.o_totalprice AS DOUBLE) * {SCALE} + 0.5)
                   AS BIGINT) AS t
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ), g AS (
          SELECT segment, fold, CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CAST(t AS HUGEINT)) AS s
          FROM base GROUP BY segment, fold
        ), seg AS (
          SELECT segment, SUM(n) AS seg_n, SUM(s) AS seg_s
          FROM g GROUP BY segment
        ), fld AS (
          SELECT fold, SUM(n) AS fold_n, SUM(s) AS fold_s
          FROM g GROUP BY fold
        ), tot AS (
          SELECT SUM(n) AS all_n, SUM(s) AS all_s FROM g
        )
        SELECT g.segment, g.fold, g.n AS n_rows,
               {_TE_OOF} AS enc_oof,
               {_TE_SMOOTH} AS enc_smoothed
        FROM g
        JOIN seg USING (segment)
        JOIN fld USING (fold)
        CROSS JOIN tot
    """,
)
def target_encode_mktsegment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E176: leakage-safe out-of-fold target encoding — the (segment ×
    fold) lookup table that replaces `c_mktsegment` with the mean order
    value of the OTHER folds' rows in that segment, plus the
    additive-smoothed variant ((S_oof + m·prior_oof)/(n_oof + m),
    m=20) whose prior is itself fold-excluded. Folds are
    `o_orderkey % 5` — deterministic, replayable, and uniform.
    A same-fold mean would leak each row's own label into its feature
    (target leakage); this table is what a feature store materializes
    so the training join stays leak-free.

    Exactness: prices fix to 4-dp integers; every fold/segment/global
    moment is an exact 128-bit integer sum; the encodings are
    shared-literal double chains (NULL when a segment lives entirely in
    one fold).

    Scale: ONE keyed aggregate over the fact join collapses everything
    to a |segments|×|folds| frame (25 rows); marginals and encodings
    are arithmetic on that frame — broadcast-sized output regardless of
    corpus size, exactly the shape the training join wants to
    broadcast."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    base = orders.join(
        customer, orders["o_custkey"] == customer["c_custkey"]
    ).select(
        F.col("c_mktsegment").alias("segment"),
        (F.col("o_orderkey") % N_FOLDS).alias("fold"),
        F.floor(F.col("o_totalprice").cast("double") * SCALE + F.lit(0.5))
        .cast("long")
        .alias("t"),
    )
    g = base.groupBy("segment", "fold").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("t").cast("decimal(38,0)")).alias("s"),
    )
    seg = g.groupBy("segment").agg(
        F.sum("n").alias("seg_n"), F.sum("s").alias("seg_s")
    )
    fld = g.groupBy("fold").agg(
        F.sum("n").alias("fold_n"), F.sum("s").alias("fold_s")
    )
    tot = g.agg(F.sum("n").alias("all_n"), F.sum("s").alias("all_s"))
    return (
        g.join(F.broadcast(seg), "segment")
        .join(F.broadcast(fld), "fold")
        .crossJoin(F.broadcast(tot))
        .select(
            "segment",
            "fold",
            F.col("n").alias("n_rows"),
            F.expr(_TE_OOF).alias("enc_oof"),
            F.expr(_TE_SMOOTH).alias("enc_smoothed"),
        )
    )
