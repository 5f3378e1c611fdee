"""Skew-mitigation utilities: salted joins for hot keys.

AQE's skew-join splitting (spark.sql.adaptive.skewJoin, on in session.py)
handles most skew at runtime by splitting oversized partitions, but it only
triggers for sort-merge joins and only when statistics detect the skew.
Salting is the deterministic, planner-independent fallback — the pattern a
100 TB pipeline reaches for when one user/tenant/null-key holds 1% of the
fact table:

  * big side: deterministic salt = hash(disambiguator) mod R appended to
    the join key, splitting each hot key across R reducers;
  * small side: each row replicated R times (explode of 0..R-1) so every
    salted big-side row still finds its match;
  * join on (key, salt): R× the small side's shuffle bytes buys an R-way
    fan-out of every hot key. Results are EXACTLY those of the unsalted
    join — verified against a plain-SQL DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .numeric import dec_sum, sql_dec_sum
from .registry import query

N_SALTS = 16


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_src: str,
    n_salts: int = N_SALTS,
) -> DataFrame:
    """Inner-join ``big`` and ``small`` on ``key`` with an R-way salt.

    ``salt_src`` is any big-side column with per-row variety (an id column);
    the salt must be a deterministic function of the ROW, never rand() —
    task retries and speculative execution would otherwise produce
    different salts for the same row and duplicate/lose matches.
    """
    big_s = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salts))
    )
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return big_s.join(small_s, [key, "_salt"]).drop("_salt")


@query(
    "skew_salted_user_revenue",
    oracle=f"""
        WITH user_totals AS (
          SELECT o_custkey AS user_id,
                 {sql_dec_sum("o_totalprice")} AS lifetime_value
          FROM orders GROUP BY o_custkey
        )
        SELECT e.user_id,
               COUNT(*) AS n_events,
               MAX(u.lifetime_value) AS lifetime_value
        FROM events e JOIN user_totals u ON e.user_id = u.user_id
        GROUP BY e.user_id
    """,
)
def skew_salted_user_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact-to-dim join: events (a handful of hot user_ids own ALL
    the rows — exactly the shape that strands one reducer) joined to
    per-user lifetime value. The salt splits each hot user across N_SALTS
    reducers; the oracle is the plain unsalted join, proving salting is
    result-invariant."""
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    user_totals = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"))
        .agg(dec_sum(F.col("o_totalprice")).alias("lifetime_value"))
    )
    joined = salted_join(events, user_totals, "user_id", "event_id")
    return joined.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("lifetime_value").alias("lifetime_value"),
    )
