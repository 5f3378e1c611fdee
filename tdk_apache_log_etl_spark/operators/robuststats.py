"""Robust / time-series statistics pack (SURVEY.md §2.6 E63–E67).

The reference's analytics stop at three COUNT aggregates
(sree-etl-tdk-glue-job.py:52-63); a production log/metrics engine also
needs the robust-statistics layer — windowed RANGE frames, winsorized
means, seasonal-baseline anomaly flags, CUSUM changepoint detection, and
distribution-position scoring. Every operator here is pure DataFrame API
(whole-stage codegen, no UDFs) and follows the repo's exact-parity rules
(operators/numeric.py): money/value sums are fixed-point BIGINTs so every
windowed or grouped sum is order-insensitive and bit-identical to the
DuckDB oracle at any parallelism.

Scale notes (100 TB):
  * RANGE-frame windows shuffle once on the partition key; frames are
    bounded by the 30-day range, never by partition row count.
  * Winsorization joins a per-group bound frame (|groups| rows) back to
    facts — broadcast, no second shuffle of the fact table.
  * Seasonal/CUSUM operators aggregate facts down to |group|×|days| rows
    FIRST; all window work happens on the collapsed frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .numeric import SCALE, dec_sum, sql_dec_sum
from .registry import query, scoped_persist

#: Fixed epoch for integer day indexes (any date at/before the data works;
#: both engines compute the identical datediff).
_EPOCH = "1992-01-01"


# --------------------------------------------------------------------------
# E63: true RANGE-frame rolling window (event-time, not row-count, frames)
# --------------------------------------------------------------------------


@query(
    "customer_rolling_30d_revenue",
    oracle=f"""
        WITH o AS (
          SELECT o_orderkey, o_custkey,
                 datediff('day', DATE '{_EPOCH}', CAST(o_orderdate AS DATE))
                   AS day_idx,
                 CAST(FLOOR(o_totalprice * {SCALE} + 0.5) AS BIGINT) AS sc
          FROM orders
        )
        SELECT o_orderkey, o_custkey,
               CAST(SUM(sc) OVER (
                 PARTITION BY o_custkey ORDER BY day_idx
                 RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
               ) AS DOUBLE) / {SCALE} AS revenue_30d
        FROM o
    """,
)
def customer_rolling_30d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E63: per-customer trailing-30-day revenue at each order, via a true
    RANGE frame over an integer day index — the frame is defined by event
    time (orders 31+ days old fall out) rather than row count, which a
    ROWS frame cannot express when order density varies.

    Scale: one shuffle on o_custkey; each frame holds at most 31 days of
    one customer's orders regardless of total data size. The windowed sum
    runs over fixed-point BIGINTs, so the result is identical under any
    intra-frame tie order (same-day orders are RANGE peers in both
    engines)."""
    orders = load_table(spark, sf_dir, "orders")
    day_idx = F.datediff(
        F.to_date("o_orderdate"), F.to_date(F.lit(_EPOCH))
    )
    sc = F.floor(F.col("o_totalprice") * SCALE + F.lit(0.5)).cast("long")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day_idx")
        .rangeBetween(-30, Window.currentRow)
    )
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            day_idx.alias("day_idx"),
            sc.alias("sc"),
        )
        .withColumn(
            "revenue_30d", F.sum("sc").over(w).cast("double") / SCALE
        )
        .select("o_orderkey", "o_custkey", "revenue_30d")
    )


# --------------------------------------------------------------------------
# E64: winsorized mean (robust aggregate after exact-percentile clipping)
# --------------------------------------------------------------------------


@query(
    "winsorized_value_stats",
    oracle=f"""
        WITH e AS (
          SELECT event_type, value FROM events WHERE value IS NOT NULL
        ),
        bounds AS (
          SELECT event_type,
                 quantile_cont(value, 0.05) AS lo,
                 quantile_cont(value, 0.95) AS hi
          FROM e GROUP BY event_type
        )
        SELECT e.event_type,
               COUNT(*) AS n,
               {sql_dec_sum("e.value")} / COUNT(*) AS raw_mean,
               {sql_dec_sum("LEAST(GREATEST(e.value, b.lo), b.hi)")}
                 / COUNT(*) AS winsor_mean
        FROM e JOIN bounds b ON e.event_type = b.event_type
        GROUP BY e.event_type
    """,
)
def winsorized_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E64: winsorized mean — clip each group's values at its exact
    p05/p95, then average. The standard robust-mean step before feeding
    noisy metrics into downstream models; a plain mean is one corrupt
    sensor away from garbage.

    Two aggregations over one fact scan: the bounds frame is |groups|
    rows, broadcast back onto the facts (no second fact shuffle). The
    clip (least/greatest) runs on bit-identical percentile doubles
    (percentile ≡ quantile_cont, proven by events_value_percentiles) and
    the means use the fixed-point trick, so parity is exact. At 100 TB
    swap the exact percentile for approx_percentile's mergeable sketch
    (same shape as events_value_percentiles_approx)."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    p = F.percentile("value", F.array(F.lit(0.05), F.lit(0.95)))
    bounds = events.groupBy("event_type").agg(
        F.get(p, 0).alias("lo"), F.get(p, 1).alias("hi")
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        events.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (dec_sum(F.col("value")) / F.count(F.lit(1))).alias("raw_mean"),
            (dec_sum(clipped) / F.count(F.lit(1))).alias("winsor_mean"),
        )
    )


# --------------------------------------------------------------------------
# E65: seasonal-baseline anomaly detection (day-of-week residuals)
# --------------------------------------------------------------------------


@query(
    "dow_seasonal_anomalies",
    oracle=f"""
        WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS d,
                 SUM(CAST(FLOOR(value * {SCALE} + 0.5) AS BIGINT)) AS sc
          FROM events WHERE value IS NOT NULL
          GROUP BY event_type, CAST(ts AS DATE)
        ),
        base AS (
          SELECT event_type, dayofweek(d) AS dow,
                 SUM(sc) AS tot, COUNT(*) AS nd
          FROM daily GROUP BY event_type, dayofweek(d)
        ),
        scored AS (
          SELECT daily.event_type, daily.d,
                 CAST(daily.sc AS DOUBLE) / {SCALE} AS daily_total,
                 CAST(base.tot AS DOUBLE) / base.nd / {SCALE} AS dow_mean
          FROM daily
          JOIN base ON daily.event_type = base.event_type
                   AND dayofweek(daily.d) = base.dow
        ),
        resid AS (
          SELECT event_type, d, daily_total, dow_mean,
                 daily_total - dow_mean AS residual
          FROM scored
        )
        SELECT event_type, d, daily_total, dow_mean, residual,
               CAST(ROW_NUMBER() OVER (
                 PARTITION BY event_type ORDER BY abs(residual) DESC, d
               ) AS INTEGER) AS rnk
        FROM resid
        QUALIFY rnk <= 3
    """,
)
def dow_seasonal_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E65: seasonal anomaly detection — compare each day's total against
    its day-of-week baseline (weekends legitimately differ from weekdays;
    a global mean would flag every Saturday). Report the top-3
    largest-|residual| days per event type.

    The fact table collapses to |types|×|days| rows in the FIRST
    aggregation; the baseline frame is ≤ |types|×7 rows (broadcast); the
    ranking window runs on the collapsed frame only. Day-of-week mapping:
    Spark ``dayofweek``−1 ≡ DuckDB ``dayofweek`` (0=Sunday). All sums are
    fixed-point BIGINTs; residual doubles come from identical operands in
    both engines, so ordering and values hash-match."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(
        F.sum(
            F.floor(F.col("value") * SCALE + F.lit(0.5)).cast("long")
        ).alias("sc")
    )
    dow = (F.dayofweek("d") - 1).alias("dow")
    base = daily.groupBy("event_type", dow).agg(
        F.sum("sc").alias("tot"), F.count(F.lit(1)).alias("nd")
    )
    scored = (
        daily.withColumn("dow", F.dayofweek("d") - 1)
        .join(F.broadcast(base), ["event_type", "dow"])
        .select(
            "event_type",
            "d",
            (F.col("sc").cast("double") / SCALE).alias("daily_total"),
            (
                F.col("tot").cast("double") / F.col("nd") / SCALE
            ).alias("dow_mean"),
        )
        .withColumn("residual", F.col("daily_total") - F.col("dow_mean"))
    )
    w = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("residual")).desc(), F.asc("d")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 3)
    )


# --------------------------------------------------------------------------
# E66: CUSUM changepoint detection (integer-exact cumulative deviations)
# --------------------------------------------------------------------------


@query(
    "events_cusum_changepoint",
    oracle=f"""
        WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS d,
                 SUM(CAST(FLOOR(value * {SCALE} + 0.5) AS BIGINT)) AS sc
          FROM events WHERE value IS NOT NULL
          GROUP BY event_type, CAST(ts AS DATE)
        ),
        cum AS (
          SELECT event_type, d, sc,
                 SUM(sc) OVER (
                   PARTITION BY event_type ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS prefix,
                 CAST(ROW_NUMBER() OVER (
                   PARTITION BY event_type ORDER BY d
                 ) AS BIGINT) AS k,
                 SUM(sc) OVER (PARTITION BY event_type) AS tot,
                 COUNT(*) OVER (PARTITION BY event_type) AS nd
          FROM daily
        ),
        cusum AS (
          SELECT event_type, d,
                 nd * prefix - k * tot AS cusum_scaled, nd
          FROM cum
        )
        SELECT event_type, d AS change_date,
               CAST(cusum_scaled AS DOUBLE) / nd / {SCALE} AS cusum
        FROM cusum
        QUALIFY ROW_NUMBER() OVER (
          PARTITION BY event_type ORDER BY abs(cusum_scaled) DESC, d
        ) = 1
    """,
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E66: CUSUM changepoint detection — the day where the cumulative
    deviation of daily totals from the series mean peaks, the classic
    level-shift detector for metrics streams.

    The naive form accumulates x_i − mean in floats (order-dependent,
    engine-dependent: DuckDB's segment-tree window sums add in a
    different order than Spark's running fold). Instead the deviation
    sum is multiplied through by n: nd·prefix_k − k·total, every term an
    exact BIGINT — bit-identical whatever order either engine's window
    machinery adds in. Facts collapse to |types|×|days| rows before any
    window; the final division normalizes back to value units."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(
        F.sum(
            F.floor(F.col("value") * SCALE + F.lit(0.5)).cast("long")
        ).alias("sc")
    )
    ordered = Window.partitionBy("event_type").orderBy("d")
    running = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    whole = Window.partitionBy("event_type")
    cum = daily.select(
        "event_type",
        "d",
        F.sum("sc").over(running).alias("prefix"),
        F.row_number().over(ordered).cast("long").alias("k"),
        F.sum("sc").over(whole).alias("tot"),
        F.count(F.lit(1)).over(whole).alias("nd"),
    )
    cusum = cum.select(
        "event_type",
        "d",
        (F.col("nd") * F.col("prefix") - F.col("k") * F.col("tot")).alias(
            "cusum_scaled"
        ),
        "nd",
    )
    pick = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cusum_scaled")).desc(), F.asc("d")
    )
    return (
        cusum.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("d").alias("change_date"),
            (
                F.col("cusum_scaled").cast("double") / F.col("nd") / SCALE
            ).alias("cusum"),
        )
    )


# --------------------------------------------------------------------------
# E67: distribution-position scoring (cume_dist / percent_rank)
# --------------------------------------------------------------------------


@query(
    "customer_spend_cume_dist",
    oracle=f"""
        WITH spend AS (
          SELECT o_custkey,
                 SUM(CAST(FLOOR(o_totalprice * {SCALE} + 0.5) AS BIGINT))
                   AS sc
          FROM orders GROUP BY o_custkey
        )
        SELECT c.c_custkey, c.c_mktsegment,
               CAST(s.sc AS DOUBLE) / {SCALE} AS spend,
               round(cume_dist() OVER (
                 PARTITION BY c.c_mktsegment ORDER BY s.sc
               ), 6) AS spend_cume_dist,
               round(percent_rank() OVER (
                 PARTITION BY c.c_mktsegment ORDER BY s.sc
               ), 6) AS spend_pct_rank
        FROM spend s JOIN customer c ON c.c_custkey = s.o_custkey
    """,
)
def customer_spend_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E67: where does each customer sit in their segment's spend
    distribution — cume_dist (fraction of peers at-or-below) and
    percent_rank. The standard feature for percentile-bucketed cohorts.

    Spend is aggregated to one BIGINT per customer first (exact ties →
    deterministic peer groups in both engines); the window then runs on
    the |customers| aggregate, not the order facts. Both functions are
    rank-count ratios — one double division of identical integers per
    row — rounded to 6 places only as belt-and-braces."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(
            F.floor(F.col("o_totalprice") * SCALE + F.lit(0.5)).cast("long")
        ).alias("sc")
    )
    w = Window.partitionBy("c_mktsegment").orderBy("sc")
    return (
        spend.join(
            customer.select("c_custkey", "c_mktsegment"),
            spend["o_custkey"] == F.col("c_custkey"),
        )
        .select(
            "c_custkey",
            "c_mktsegment",
            (F.col("sc").cast("double") / SCALE).alias("spend"),
            F.round(F.cume_dist().over(w), 6).alias("spend_cume_dist"),
            F.round(F.percent_rank().over(w), 6).alias("spend_pct_rank"),
        )
    )


# --------------------------------------------------------------------------
# E87: weighted median (cumulative-weight order statistic)
# --------------------------------------------------------------------------


@query(
    "supplier_weighted_median_price",
    oracle="""
        WITH li AS (
          SELECT l_suppkey, l_extendedprice,
                 CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT) AS wq,
                 l_orderkey, l_linenumber
          FROM lineitem
        ),
        cum AS (
          SELECT l_suppkey, l_extendedprice, wq,
                 CAST(SUM(wq) OVER (
                   PARTITION BY l_suppkey
                   ORDER BY l_extendedprice, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS BIGINT) AS cw,
                 CAST(SUM(wq) OVER (PARTITION BY l_suppkey) AS BIGINT) AS tot
          FROM li
        )
        SELECT l_suppkey,
               MIN(l_extendedprice) FILTER (WHERE 2 * cw >= tot)
                 AS weighted_median_price,
               CAST(MIN(tot) AS DOUBLE) / 100 AS total_quantity
        FROM cum GROUP BY l_suppkey
    """,
)
def supplier_weighted_median_price(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """E87: quantity-weighted median line price per supplier — the
    order statistic where half the *shipped quantity* (not half the
    rows) lies at or below the price; a plain median over-weights
    small lots exactly the way a plain average over-weights small
    orders (brand_qty_weighted_avg_price's motivation, E58).

    Weighted quantiles have no built-in in either engine: the rewrite
    is a cumulative fixed-point weight window in a fully deterministic
    order (price, orderkey, linenumber — so equal prices accumulate in
    the same order everywhere) and MIN(price) over rows where
    2·cum ≥ total, an exact integer comparison. The selected value is
    raw data, never interpolated — engine-exact by construction.

    Scale: both windows and the final reduce share ONE l_suppkey
    exchange; per-partition size is facts/|suppliers|, which stays
    constant as both grow with SF (contrast a returnflag partitioning:
    3 groups would concentrate the corpus into 3 tasks)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        "l_extendedprice",
        F.floor(F.col("l_quantity") * 100 + F.lit(0.5))
        .cast("long")
        .alias("wq"),
        "l_orderkey",
        "l_linenumber",
    )
    wcum = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("l_suppkey")
    cum = li.select(
        "l_suppkey",
        "l_extendedprice",
        F.sum("wq").over(wcum).alias("cw"),
        F.sum("wq").over(wtot).alias("tot"),
    )
    return cum.groupBy("l_suppkey").agg(
        F.min(
            F.when(2 * F.col("cw") >= F.col("tot"), F.col("l_extendedprice"))
        ).alias("weighted_median_price"),
        (F.min("tot").cast("double") / 100).alias("total_quantity"),
    )


# --------------------------------------------------------------------------
# E96: rolling cross-correlation of two traffic series
# --------------------------------------------------------------------------


@query(
    "rolling_purchase_error_corr",
    oracle="""
        WITH daily AS (
          SELECT CAST(ts AS DATE) AS day,
                 CAST(datediff('day', DATE '1992-01-01', CAST(ts AS DATE))
                   AS BIGINT) AS day_idx,
                 CAST(count(*) FILTER (WHERE event_type = 'purchase')
                   AS BIGINT) AS x,
                 CAST(count(*) FILTER (WHERE event_type = 'error')
                   AS BIGINT) AS y
          FROM events GROUP BY 1, 2
        ),
        win AS (
          SELECT day,
                 CAST(COUNT(*) OVER w AS BIGINT)      AS n,
                 CAST(SUM(x) OVER w AS BIGINT)        AS sx,
                 CAST(SUM(y) OVER w AS BIGINT)        AS sy,
                 CAST(SUM(x * y) OVER w AS BIGINT)    AS sxy,
                 CAST(SUM(x * x) OVER w AS BIGINT)    AS sxx,
                 CAST(SUM(y * y) OVER w AS BIGINT)    AS syy
          FROM daily
          WINDOW w AS (ORDER BY day_idx
                       RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        )
        SELECT day, n AS n_days,
               CAST(n * sxy - sx * sy AS DOUBLE)
             / NULLIF(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                         * CAST(n * syy - sy * sy AS DOUBLE)), 0.0)
                 AS rolling_r
        FROM win
    """,
)
def rolling_purchase_error_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E96: 7-day rolling Pearson correlation between the purchase and
    error daily-count series — the ops/business joint signal ("are
    errors eating conversions this week?"). Joint windowed statistics
    need SIX windowed moment sums sharing one frame; expressing the
    correlation over them keeps every accumulation a BIGINT, with only
    the final num/sqrt(dx·dy) in double (sqrt is correctly-rounded
    IEEE — deterministic on identical operands, the same discipline as
    the anomaly z-scores). Degenerate windows (either series constant)
    yield NULL via NULLIF rather than ±inf.

    Scale: facts collapse to one row per day with both series as
    columns of the SAME row (a single conditional-count aggregate — no
    self-join of two filtered frames); the RANGE frame runs over the
    day index so calendar gaps shrink the window. The window is global
    but over the one-row-per-day frame (waived, same argument as
    moving_avg_daily_revenue)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("x"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("y"),
    ).withColumn(
        "day_idx",
        F.datediff(F.col("day"), F.to_date(F.lit(_EPOCH))).cast("long"),
    )
    w = Window.orderBy("day_idx").rangeBetween(-6, Window.currentRow)
    win = daily.select(
        "day",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    dx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    dy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    return win.select(
        "day",
        F.col("n").alias("n_days"),
        (num / F.nullif(F.sqrt(dx * dy), F.lit(0.0))).alias("rolling_r"),
    )


# --------------------------------------------------------------------------
# E107: Theil–Sen robust trend (median of pairwise slopes)
# --------------------------------------------------------------------------


@query(
    "theil_sen_daily_trend",
    oracle=f"""
        WITH daily AS (
          SELECT event_type,
                 CAST(datediff('day', DATE '{_EPOCH}', CAST(ts AS DATE))
                   AS BIGINT) AS x,
                 CAST(count(*) AS BIGINT) AS y
          FROM events GROUP BY 1, 2
        ),
        slopes AS (
          SELECT a.event_type,
                 CAST(b.y - a.y AS DOUBLE) / (b.x - a.x) AS slope,
                 a.x AS x1, b.x AS x2
          FROM daily a JOIN daily b
            ON a.event_type = b.event_type AND a.x < b.x
        ),
        ranked AS (
          SELECT event_type, slope,
                 row_number() OVER (
                   PARTITION BY event_type ORDER BY slope, x1, x2
                 ) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS n
          FROM slopes
        )
        SELECT event_type,
               CAST(max(n) AS BIGINT) AS n_pairs,
               max(CASE WHEN rn = (n + 1) // 2 THEN slope END)
                 AS theil_sen_slope
        FROM ranked GROUP BY event_type
    """,
)
def theil_sen_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E107: Theil–Sen estimator of each event type's daily-count trend —
    the MEDIAN of all pairwise slopes, the robust-regression complement
    to the OLS fit (events_value_trend): up to ~29% of the days can be
    arbitrarily corrupted (an outage, a bot flood) without moving the
    slope, where least squares chases every outlier.

    Exactness: each pairwise slope is ONE double division of exact
    BIGINTs (identical operands → identical doubles in both engines), so
    the (slope, x1, x2) sort order — x-pair tie-break for duplicate
    slope values — and the lower-middle median pick (rn = (n+1) div 2,
    the quantile_disc convention) are fully deterministic.

    Scale: the pair space is |days|² per type — CALENDAR-bounded, not
    data-bounded (900 pairs for a month, 133k for a year; facts collapse
    to the daily frame before the self-join). For decades-long series,
    window the daily frame to the analysis horizon first; the fact
    table is never self-joined."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.to_date(F.lit(_EPOCH)))
        .cast("long")
        .alias("x"),
    ).agg(F.count(F.lit(1)).alias("y"))
    a = daily.alias("a")
    b = daily.alias("b")
    slopes = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.x") < F.col("b.x")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (
            (F.col("b.y") - F.col("a.y")).cast("double")
            / (F.col("b.x") - F.col("a.x"))
        ).alias("slope"),
        F.col("a.x").alias("x1"),
        F.col("b.x").alias("x2"),
    )
    w = Window.partitionBy("event_type").orderBy("slope", "x1", "x2")
    wn = Window.partitionBy("event_type")
    ranked = slopes.select(
        "event_type",
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return ranked.groupBy("event_type").agg(
        F.max("n").alias("n_pairs"),
        F.max(
            F.when(
                F.col("rn") == F.expr("(n + 1) div 2"), F.col("slope")
            )
        ).alias("theil_sen_slope"),
    )


# --------------------------------------------------------------------------
# E124: Holt double exponential smoothing + h-step forecast
# --------------------------------------------------------------------------

HOLT_H = 7  # forecast horizon (months)
# α = β = 1/2: exactly-representable coefficients, so the recurrence is
# a FIXED chain of correctly-rounded IEEE ops — bit-identical between
# the pandas walk and DuckDB's recursive CTE as long as both write the
# same expression shapes (see _holt_step / the oracle's l_new subquery).


def _holt_walk(pdf):
    """The recurrence, one bounded calendar-sized group: l₁=y₁, b₁=0;
    lₜ = ½yₜ + ½(lₜ₋₁+bₜ₋₁); bₜ = ½(lₜ−lₜ₋₁) + ½bₜ₋₁ — expression
    shapes mirrored EXACTLY in the oracle so doubles match bitwise."""
    import pandas as pd

    pdf = pdf.sort_values("month_index").reset_index(drop=True)
    levels, trends = [], []
    l = b = None
    for y in pdf["revenue"]:
        if l is None:
            l, b = y, 0.0
        else:
            l_new = 0.5 * y + 0.5 * (l + b)
            b = 0.5 * (l_new - l) + 0.5 * b
            l = l_new
        levels.append(l)
        trends.append(b)
    out = pd.DataFrame(
        {
            "month_index": pdf["month_index"],
            "revenue": pdf["revenue"],
            "level": levels,
            "trend": trends,
            "is_forecast": False,
        }
    )
    fc = pd.DataFrame(
        {
            "month_index": [int(pdf["month_index"].iloc[-1]) + h
                            for h in range(1, HOLT_H + 1)],
            "revenue": [None] * HOLT_H,
            "level": [l + h * b for h in range(1, HOLT_H + 1)],
            "trend": [b] * HOLT_H,
            "is_forecast": [True] * HOLT_H,
        }
    )
    return pd.concat([out, fc], ignore_index=True)


@query(
    "monthly_revenue_holt",
    oracle=f"""
        WITH RECURSIVE monthly AS (
          SELECT CAST(ROW_NUMBER() OVER (ORDER BY m) AS BIGINT)
                   AS month_index,
                 y
          FROM (
            SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS m,
                   CAST(SUM(CAST(FLOOR(o_totalprice * {SCALE} + 0.5)
                        AS BIGINT)) AS DOUBLE) / {SCALE} AS y
            FROM orders GROUP BY 1
          )
        ),
        holt AS (
          SELECT month_index, y, y AS l, CAST(0 AS DOUBLE) AS b
          FROM monthly WHERE month_index = 1
          UNION ALL
          SELECT month_index, y, l_new AS l,
                 0.5 * (l_new - l_old) + 0.5 * b_old AS b
          FROM (
            SELECT d.month_index, d.y,
                   0.5 * d.y + 0.5 * (h.l + h.b) AS l_new,
                   h.l AS l_old, h.b AS b_old
            FROM holt h JOIN monthly d ON d.month_index = h.month_index + 1
          )
        ),
        last AS (
          SELECT month_index, l, b FROM holt
          ORDER BY month_index DESC LIMIT 1
        )
        SELECT month_index, y AS revenue, l AS level, b AS trend,
               FALSE AS is_forecast
        FROM holt
        UNION ALL
        SELECT last.month_index + f.h, NULL,
               last.l + f.h * last.b, last.b, TRUE
        FROM last, (SELECT unnest(generate_series(1, {HOLT_H})) AS h) f
    """,
)
def monthly_revenue_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E124: Holt double exponential smoothing (level + trend) over the
    monthly revenue series, with an HOLT_H-step linear forecast — the
    classic ops-forecasting primitive (Holt 1957) that no window
    function expresses (the recurrence feeds its own output back).

    Scale split: the FACTS collapse to one row per month in a single
    map-side-combinable aggregate (the only pass that touches data
    volume); the recurrence then walks the calendar-bounded monthly
    frame inside one applyInPandas group — rows grow with months, not
    orders, the same boundedness waiver as moving_avg_daily_revenue.
    The oracle runs the identical recurrence as a recursive CTE; α=β=½
    keeps every step a fixed chain of correctly-rounded IEEE doubles,
    so parity is exact (hash-gated), not approximate."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = (
        orders.groupBy(
            F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM")
            .alias("m")
        )
        .agg(dec_sum(F.col("o_totalprice")).alias("revenue"))
    )
    w = Window.orderBy("m")
    indexed = monthly.select(
        F.row_number().over(w).cast("long").alias("month_index"), "revenue"
    )
    return (
        indexed.groupBy(F.lit(1).alias("_g"))
        .applyInPandas(
            lambda _, pdf: _holt_walk(pdf),
            "month_index long, revenue double, level double, "
            "trend double, is_forecast boolean",
        )
    )


# --------------------------------------------------------------------------
# E132: classical seasonal indices (ratio-to-centered-moving-average)
# --------------------------------------------------------------------------


@query(
    "seasonal_index_monthly",
    oracle=f"""
        WITH monthly AS (
          SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS ym,
                 CAST(EXTRACT(month FROM CAST(o_orderdate AS DATE))
                   AS BIGINT) AS moy,
                 CAST(SUM(CAST(FLOOR(o_totalprice * {SCALE} + 0.5)
                        AS BIGINT)) AS BIGINT) AS sc
          FROM orders GROUP BY 1, 2
        ),
        idx AS (
          SELECT ym, moy, sc,
                 CAST(ROW_NUMBER() OVER (ORDER BY ym) AS BIGINT) AS i,
                 CAST(COUNT(*) OVER () AS BIGINT) AS n
          FROM monthly
        ),
        cma AS (
          SELECT a.moy, a.sc,
                 -- 24·CMA12: half-weight ends, full-weight middle 11
                 CAST(SUM(CASE WHEN b.i IN (a.i - 6, a.i + 6) THEN b.sc
                               ELSE 2 * b.sc END) AS BIGINT) AS cma24
          FROM idx a JOIN idx b ON b.i BETWEEN a.i - 6 AND a.i + 6
          WHERE a.i > 6 AND a.i <= a.n - 6
          GROUP BY a.moy, a.sc, a.i
        )
        SELECT moy AS month_of_year,
               CAST(COUNT(*) AS BIGINT) AS n_months,
               CAST(SUM(sc) * 24 AS DOUBLE) / SUM(cma24) AS seasonal_index
        FROM cma GROUP BY moy
    """,
)
def seasonal_index_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E132: classical seasonal decomposition — per-calendar-month
    seasonal indices by ratio-to-centered-moving-average (the X-11
    ancestor): detrend each month by its centered 12-month MA (even
    period ⇒ half-weight endpoints), then combine months sharing a
    calendar position. Index > 1 = that month systematically runs above
    trend. Distinct from Holt (which tracks level/trend, not the
    repeating shape) and from the DOW-anomaly pack (weekly grain).

    Exactness: 24·CMA is an exact BIGINT (half-weights ×2), and the
    per-calendar-month index is the RATIO OF SUMS
    Σ(24·vₜ)/Σ(24·CMAₜ) — not a mean of per-month ratios, which would
    be an order-dependent double sum — so one divide per output row
    keeps the hash gate. Scale: facts collapse to the calendar-bounded
    monthly frame first; the self-join window (±6 rows on the month
    index) and everything after run on ≤ |months| rows."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM")
        .alias("ym"),
        F.month(F.col("o_orderdate").cast("date"))
        .cast("long")
        .alias("moy"),
    ).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * SCALE + F.lit(0.5))
        ).cast("long").alias("sc")
    )
    w = Window.orderBy("ym")
    idx = monthly.select(
        "moy", "sc", F.row_number().over(w).cast("long").alias("i")
    ).withColumn("n", F.count(F.lit(1)).over(Window.partitionBy()))
    a = idx.select(
        F.col("moy").alias("a_moy"), F.col("sc").alias("a_sc"),
        F.col("i").alias("a_i"), "n",
    ).filter((F.col("a_i") > 6) & (F.col("a_i") <= F.col("n") - 6))
    b = idx.select(F.col("i").alias("b_i"), F.col("sc").alias("b_sc"))
    cma = (
        a.join(
            b,
            (F.col("b_i") >= F.col("a_i") - 6)
            & (F.col("b_i") <= F.col("a_i") + 6),
        )
        .groupBy("a_moy", "a_sc", "a_i")
        .agg(
            F.sum(
                F.when(
                    (F.col("b_i") == F.col("a_i") - 6)
                    | (F.col("b_i") == F.col("a_i") + 6),
                    F.col("b_sc"),
                ).otherwise(2 * F.col("b_sc"))
            ).alias("cma24")
        )
    )
    return cma.groupBy(F.col("a_moy").alias("month_of_year")).agg(
        F.count(F.lit(1)).alias("n_months"),
        (
            (F.sum("a_sc") * 24).cast("double") / F.sum("cma24")
        ).alias("seasonal_index"),
    )


# --------------------------------------------------------------------------
# E136: two-state burst detection (Kleinberg-style, integer-cost Viterbi)
# --------------------------------------------------------------------------

#: Burst-state rate multiplier: mu1 = BURST_MULT·mu0 + 1 (the +1 keeps the
#: states distinct even when the baseline floors to 0).
BURST_MULT = 3


def _burst_walk(pdf):
    """Exact integer Viterbi over the hourly series: emission cost
    |x − muₛ| (L1), entering the burst state costs gamma = mu1 − mu0.
    Forward min-cost DP then backtrack — decision rules (<= ties) are
    mirrored EXACTLY by the oracle's two recursive CTEs."""
    import pandas as pd

    pdf = pdf.sort_values("i").reset_index(drop=True)
    xs = [int(v) for v in pdf["x"]]
    n = len(xs)
    mu0 = sum(xs) // n
    mu1 = BURST_MULT * mu0 + 1
    gamma = mu1 - mu0
    dp0s, dp1s = [], []
    dp0 = dp1 = 0
    for t, x in enumerate(xs):
        if t == 0:
            dp0, dp1 = abs(x - mu0), abs(x - mu1) + gamma
        else:
            dp0, dp1 = (
                abs(x - mu0) + min(dp0, dp1),
                abs(x - mu1) + min(dp1, dp0 + gamma),
            )
        dp0s.append(dp0)
        dp1s.append(dp1)
    states = [0] * n
    states[n - 1] = 0 if dp0s[n - 1] <= dp1s[n - 1] else 1
    for t in range(n - 2, -1, -1):
        if states[t + 1] == 1:
            states[t] = 1 if dp1s[t] <= dp0s[t] + gamma else 0
        else:
            states[t] = 0 if dp0s[t] <= dp1s[t] else 1
    return pd.DataFrame(
        {
            "hour_index": pdf["i"],
            "hour_ts": pdf["hr"],
            "n_errors": pdf["x"],
            "dp0": dp0s,
            "dp1": dp1s,
            "in_burst": [s == 1 for s in states],
        }
    )


@query(
    "error_burst_viterbi",
    oracle=f"""
        WITH RECURSIVE series AS MATERIALIZED (
          SELECT CAST(ROW_NUMBER() OVER (ORDER BY s.hr) AS BIGINT) AS i,
                 s.hr, COALESCE(c.x, 0) AS x
          FROM (
            SELECT unnest(generate_series(
              (SELECT MIN(date_trunc('hour', ts)) FROM events
               WHERE event_type = 'error'),
              (SELECT MAX(date_trunc('hour', ts)) FROM events
               WHERE event_type = 'error'), INTERVAL 1 HOUR)) AS hr
          ) s
          LEFT JOIN (
            SELECT date_trunc('hour', ts) AS hr,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events WHERE event_type = 'error' GROUP BY 1
          ) c ON c.hr = s.hr
        ), params AS MATERIALIZED (
          SELECT CAST(SUM(x) // COUNT(*) AS BIGINT) AS mu0,
                 CAST({BURST_MULT} * (SUM(x) // COUNT(*)) + 1 AS BIGINT)
                   AS mu1,
                 CAST({BURST_MULT} * (SUM(x) // COUNT(*)) + 1
                   - SUM(x) // COUNT(*) AS BIGINT) AS gamma
          FROM series
        ), fwd AS (
          SELECT s.i, s.hr, s.x,
                 abs(s.x - p.mu0) AS dp0,
                 abs(s.x - p.mu1) + p.gamma AS dp1
          FROM series s CROSS JOIN params p WHERE s.i = 1
          UNION ALL
          SELECT s.i, s.hr, s.x,
                 abs(s.x - p.mu0) + LEAST(f.dp0, f.dp1),
                 abs(s.x - p.mu1) + LEAST(f.dp1, f.dp0 + p.gamma)
          FROM fwd f
          JOIN series s ON s.i = f.i + 1
          CROSS JOIN params p
        ), sel AS MATERIALIZED (
          SELECT f.*, p.gamma FROM fwd f CROSS JOIN params p
        )
        -- Backtrack in closed form: with d = dp1 - dp0, the Viterbi
        -- state is 1 when d < 0, 0 when d > gamma, and CARRIES from the
        -- right inside [0, gamma] (default 0 past the end) — an
        -- independent derivation of the pandas walk's explicit
        -- backtrack, which the hash gate then proves equivalent.
        SELECT i AS hour_index,
               strftime(hr, '%Y-%m-%d %H:%M:%S') AS hour_ts,
               x AS n_errors, dp0, dp1,
               CAST(COALESCE(LAST_VALUE(
                 CASE WHEN dp1 - dp0 < 0 THEN 1
                      WHEN dp1 - dp0 > gamma THEN 0 END IGNORE NULLS)
                 OVER (ORDER BY i DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 0) = 1 AS BOOLEAN) AS in_burst
        FROM sel
    """,
)
def error_burst_viterbi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E136: two-state burst detection over the hourly error series — the
    Kleinberg burst-automaton shape (KDD'02) with integer L1 costs:
    baseline state emits at rate mu0 = floor(mean), burst state at
    mu1 = 3·mu0+1, entering the burst costs gamma = mu1 − mu0; the
    min-cost state SEQUENCE (Viterbi) segments the series into burst
    intervals. Unlike the per-point MAD outliers (E33) or CUSUM mean
    shift (E66), the transition cost makes burst membership STICKY — one
    quiet hour inside an incident doesn't split it.

    Exactness: all-integer DP (abs/min/+ on BIGINTs), so forward costs
    AND the backtracked states are engine-exact; the oracle replays the
    identical recurrence as two recursive CTEs (forward chain, then a
    backward chain re-deriving each argmin decision), tie rules (<=)
    mirrored from the pandas walk.

    Scale: facts collapse to the hourly frame in one map-side aggregate;
    the spine/DP rows grow with CALENDAR hours, not event volume — the
    Holt/E124 boundedness argument; the sequential walk is one
    applyInPandas group over that bounded frame."""
    ev = load_table(spark, sf_dir, "events")
    counts = (
        ev.where(F.col("event_type") == "error")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("hr"))
        .agg(F.count(F.lit(1)).alias("x"))
    )
    spine = counts.agg(
        F.min("hr").alias("lo"), F.max("hr").alias("hi")
    ).select(
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 hour"))
        ).alias("hr")
    )
    series = (
        spine.join(counts, "hr", "left")
        .select("hr", F.coalesce("x", F.lit(0)).alias("x"))
        .select(
            F.row_number().over(Window.orderBy("hr")).cast("long").alias("i"),
            F.date_format("hr", "yyyy-MM-dd HH:mm:ss").alias("hr"),
            "x",
        )
    )
    return series.groupBy(F.lit(1).alias("_g")).applyInPandas(
        lambda _, pdf: _burst_walk(pdf),
        "hour_index long, hour_ts string, n_errors long, "
        "dp0 long, dp1 long, in_burst boolean",
    )


# --------------------------------------------------------------------------
# E141: isotonic calibration (PAVA via the minimax characterization)
# --------------------------------------------------------------------------

#: Activity level = events//5, capped — the grid the minimax join runs
#: on is ≤ ISO_CAP+1 rows at ANY corpus size (a raw-count level would
#: leave one degenerate bucket at bench SFs where every user has 50+
#: events).
ISO_CAP = 20


@query(
    "isotonic_conversion_by_activity",
    oracle=f"""
        WITH per_user AS (
          SELECT user_id,
                 LEAST(CAST(COUNT(*) AS BIGINT) // 5, {ISO_CAP}) AS lvl,
                 MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS conv
          FROM events GROUP BY user_id
        ), grid AS (
          SELECT lvl, CAST(COUNT(*) AS BIGINT) AS n_users,
                 CAST(SUM(conv) AS BIGINT) AS n_conv
          FROM per_user GROUP BY lvl
        ), pre AS (
          SELECT lvl, n_users, n_conv,
                 SUM(n_users) OVER (ORDER BY lvl) AS cn,
                 SUM(n_conv) OVER (ORDER BY lvl) AS cc
          FROM grid
        ), pairs AS (
          SELECT a.lvl AS i, b.lvl AS j,
                 CAST(b.cc - (a.cc - a.n_conv) AS DOUBLE)
                   / (b.cn - (a.cn - a.n_users)) AS mean
          FROM pre a JOIN pre b ON b.lvl >= a.lvl
        ), mins AS (
          SELECT p.i, t.lvl AS t, MIN(p.mean) AS mn
          FROM pairs p JOIN grid t ON t.lvl BETWEEN p.i AND p.j
          GROUP BY p.i, t.lvl
        ), iso AS (
          SELECT t, MAX(mn) AS iso_rate FROM mins GROUP BY t
        )
        SELECT g.lvl AS activity_level, g.n_users, g.n_conv,
               CAST(g.n_conv AS DOUBLE) / g.n_users AS raw_rate,
               i.iso_rate
        FROM grid g JOIN iso i ON i.t = g.lvl
    """,
)
def isotonic_conversion_by_activity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """E141: weighted isotonic regression of conversion rate on user
    activity level — the calibration step behind every "propensity by
    engagement" readout: raw per-level rates are noisy and can dip
    non-monotonically; the isotonic fit is the L2-optimal monotone
    curve (Ayer et al. 1955). Instead of the sequential PAVA
    pool-adjacent loop, this uses the MINIMAX characterization
    iso(t) = max_{{i≤t}} min_{{j≥t}} mean(y[i..j]) — a closed form over
    the bounded level grid that both engines evaluate as plain joins,
    so no recursion and no Python in either engine.

    Exactness: pooled means are single divisions of exact BIGINT prefix
    sums; MIN/MAX over those deterministic doubles are order-free.

    Scale: the fact pass collapses map-side to per-user rows, then to
    the ≤ ISO_CAP-row grid; the O(B³) minimax join lives entirely on
    that calendar-free bounded grid (≤ 8000 rows at B=20), and the
    prefix windows ride the same tiny frame."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.least(
            F.floor(F.count(F.lit(1)) / 5), F.lit(ISO_CAP)
        ).cast("long").alias("lvl"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv"),
    )
    grid = scoped_persist(
        per_user.groupBy("lvl").agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("conv").alias("n_conv"),
        )
    )
    w = Window.orderBy("lvl").rowsBetween(Window.unboundedPreceding, 0)
    pre = grid.select(
        "lvl",
        "n_users",
        "n_conv",
        F.sum("n_users").over(w).alias("cn"),
        F.sum("n_conv").over(w).alias("cc"),
    )
    a, b = pre.alias("a"), pre.alias("b")
    pairs = a.join(b, F.col("b.lvl") >= F.col("a.lvl")).select(
        F.col("a.lvl").alias("i"),
        F.col("b.lvl").alias("j"),
        (
            (F.col("b.cc") - (F.col("a.cc") - F.col("a.n_conv"))).cast("double")
            / (F.col("b.cn") - (F.col("a.cn") - F.col("a.n_users")))
        ).alias("mean"),
    )
    t = grid.select(F.col("lvl").alias("t"))
    mins = (
        pairs.join(
            t, (F.col("t") >= F.col("i")) & (F.col("t") <= F.col("j"))
        )
        .groupBy("i", "t")
        .agg(F.min("mean").alias("mn"))
    )
    iso = mins.groupBy("t").agg(F.max("mn").alias("iso_rate"))
    return grid.join(iso, grid["lvl"] == iso["t"]).select(
        F.col("lvl").alias("activity_level"),
        "n_users",
        "n_conv",
        (F.col("n_conv").cast("double") / F.col("n_users")).alias("raw_rate"),
        "iso_rate",
    )


# --------------------------------------------------------------------------
# E144: split-conformal prediction intervals for event value
# --------------------------------------------------------------------------

#: Target coverage 1 − α = 0.9; the conformal quantile picks the
#: ceil(0.9·(n_cal+1))-th smallest calibration score.
_CONF_NUM, _CONF_DEN = 9, 10


@query(
    "conformal_value_intervals",
    oracle=f"""
        WITH split AS (
          SELECT event_type, value,
                 substring(md5(concat('cf', event_id)), 1, 1) < '8' AS is_cal
          FROM events WHERE value IS NOT NULL
        ), centers AS (
          SELECT event_type, quantile_cont(value, 0.5) AS center,
                 CAST(COUNT(*) AS BIGINT) AS n_cal
          FROM split WHERE is_cal GROUP BY event_type
        ), scored AS (
          SELECT s.event_type, abs(s.value - c.center) AS score,
                 c.n_cal, c.center
          FROM split s JOIN centers c USING (event_type)
          WHERE s.is_cal
        ), ranked AS (
          SELECT event_type, score, n_cal, center,
                 ROW_NUMBER() OVER (
                   PARTITION BY event_type ORDER BY score, event_type
                 ) AS rn
          FROM scored
        ), qhat AS (
          SELECT event_type, n_cal, center, score AS q_hat
          FROM ranked
          WHERE rn = LEAST(
            ({_CONF_NUM} * (n_cal + 1) + {_CONF_DEN - 1}) // {_CONF_DEN},
            n_cal)
        ), test AS (
          SELECT s.event_type,
                 CAST(COUNT(*) AS BIGINT) AS n_test,
                 CAST(COUNT(*) FILTER (
                   WHERE abs(s.value - q.center) <= q.q_hat
                 ) AS BIGINT) AS n_covered
          FROM split s JOIN qhat q USING (event_type)
          WHERE NOT s.is_cal
          GROUP BY s.event_type
        )
        SELECT q.event_type, q.n_cal, t.n_test, q.center, q.q_hat,
               CAST(t.n_covered AS DOUBLE) / t.n_test AS coverage
        FROM qhat q JOIN test t USING (event_type)
    """,
)
def conformal_value_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E144: split-conformal prediction intervals per event type (Vovk;
    Lei et al. JASA'18) — the distribution-free way to attach a
    finite-sample coverage GUARANTEE to a point predictor: calibrate
    |value − median| scores on a held-out half, take the
    ceil(0.9·(n+1))-th smallest as q̂, and [center ± q̂] covers ≥ 90% of
    fresh draws regardless of the value distribution. The test-half
    coverage column audits the guarantee empirically.

    Determinism: the cal/test split is the E115 md5 hash coin (first
    hex char < '8' — exactly 1/2); the conformal rank is pure integer
    ceiling arithmetic (capped at n_cal); the center is the exact
    median (percentile ≡ quantile_cont, proven by
    events_value_percentiles); scores and coverage are exact
    arithmetic on those deterministic doubles — all columns hash-gate.

    Scale: one fact pass for the split, a per-type median, a per-type
    rank window (partitioned on event_type — the same per-key exchange
    every sessionizer pays, never a global sort), and two counting
    aggregates. At extreme per-type volume the exact rank selection
    swaps for the _global_ranks distributed-selection building block
    unchanged."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    split = ev.select(
        "event_type",
        "value",
        (
            F.substring(F.md5(F.concat(F.lit("cf"), F.col("event_id"))), 1, 1)
            < "8"
        ).alias("is_cal"),
    )
    cal = split.where(F.col("is_cal"))
    centers = cal.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("center"),
        F.count(F.lit(1)).alias("n_cal"),
    )
    scored = cal.join(centers, "event_type").select(
        "event_type",
        F.abs(F.col("value") - F.col("center")).alias("score"),
        "n_cal",
        "center",
    )
    w = Window.partitionBy("event_type").orderBy("score", "event_type")
    qhat = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(
            F.col("rn")
            == F.least(
                F.floor(
                    (_CONF_NUM * (F.col("n_cal") + 1) + (_CONF_DEN - 1))
                    / _CONF_DEN
                ),
                F.col("n_cal"),
            )
        )
        .select("event_type", "n_cal", "center", F.col("score").alias("q_hat"))
    )
    test = (
        split.where(~F.col("is_cal"))
        .join(qhat, "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.count(
                F.when(
                    F.abs(F.col("value") - F.col("center")) <= F.col("q_hat"),
                    1,
                )
            ).alias("n_covered"),
        )
    )
    return qhat.join(test, "event_type").select(
        "event_type",
        "n_cal",
        "n_test",
        "center",
        "q_hat",
        (F.col("n_covered").cast("double") / F.col("n_test")).alias(
            "coverage"
        ),
    )


# --------------------------------------------------------------------------
# E147: multiple OLS regression via distributed normal equations
# --------------------------------------------------------------------------

#: Fixed-point scale for the response (4-dp event value).
_OLS_SCALE = 10_000


@query(
    "ols_value_regression",
    oracle=f"""
        WITH m AS (
          SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                 SUM(CAST(hour(ts) AS HUGEINT)) AS sh,
                 SUM(CAST(dayofweek(ts) AS HUGEINT)) AS sd,
                 SUM(CAST(hour(ts) AS HUGEINT) * hour(ts)) AS shh,
                 SUM(CAST(hour(ts) AS HUGEINT) * dayofweek(ts)) AS shd,
                 SUM(CAST(dayofweek(ts) AS HUGEINT) * dayofweek(ts)) AS sdd,
                 SUM(CAST(FLOOR(value * {_OLS_SCALE} + 0.5) AS HUGEINT))
                   AS sy,
                 SUM(CAST(FLOOR(value * {_OLS_SCALE} + 0.5) AS HUGEINT)
                     * hour(ts)) AS shy,
                 SUM(CAST(FLOOR(value * {_OLS_SCALE} + 0.5) AS HUGEINT)
                     * dayofweek(ts)) AS sdy
          FROM events WHERE value IS NOT NULL
        ), d AS (
          SELECT CAST(n AS BIGINT) AS n_rows,
                 CAST(  n * (shh * sdd - shd * shd)
                      - sh * (sh * sdd - shd * sd)
                      + sd * (sh * shd - shh * sd) AS DOUBLE) AS det,
                 CAST(  sy * (shh * sdd - shd * shd)
                      - sh * (shy * sdd - shd * sdy)
                      + sd * (shy * shd - shh * sdy) AS DOUBLE) AS det0,
                 CAST(  n * (shy * sdd - sdy * shd)
                      - sy * (sh * sdd - shd * sd)
                      + sd * (sh * sdy - shy * sd) AS DOUBLE) AS det1,
                 CAST(  n * (shh * sdy - shd * shy)
                      - sh * (sh * sdy - shy * sd)
                      + sy * (sh * shd - shh * sd) AS DOUBLE) AS det2
          FROM m
        )
        SELECT n_rows,
               (det0 / NULLIF(det, 0.0)) / {_OLS_SCALE} AS beta_intercept,
               (det1 / NULLIF(det, 0.0)) / {_OLS_SCALE} AS beta_hour,
               (det2 / NULLIF(det, 0.0)) / {_OLS_SCALE} AS beta_dow
        FROM d
    """,
)
def ols_value_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E147: multiple linear regression (value ~ intercept + hour + dow)
    solved exactly by DISTRIBUTED NORMAL EQUATIONS — the 100 TB-safe way
    to fit a small linear model: one map-side-combinable pass accumulates
    the 9 cross-moments of X'X / X'y, and the 3x3 system is solved in
    closed form (Cramer's rule) on those scalars. No gradient loop, no
    per-row Python, no second pass.

    Exactness: the response is 4-dp fixed-point; every moment accumulates
    in 128-bit integers (decimal(38,0) / HUGEINT — Sigma(h*y_s) overflows
    neither, but the determinant cross-products reach ~1e33 at sf1, far
    past BIGINT), and each determinant is computed EXACTLY in the integer
    domain before ONE cast to double and ONE division — bit-identical in
    both engines at any parallelism. dow is DuckDB's 0=Sunday..6
    convention (Spark's dayofweek-1).

    Scale: a single aggregate with partial (map-side) combine; exactly one
    9-number row crosses the network. At 1000 executors this is the same
    plan, just wider."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    h = F.hour("ts").cast("long")
    d = (F.dayofweek("ts") - 1).cast("long")
    ys = F.floor(F.col("value") * _OLS_SCALE + F.lit(0.5)).cast("long")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731 - local shorthand
    m = ev.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(dec(h)).alias("sh"),
        F.sum(dec(d)).alias("sd"),
        F.sum(dec(h) * h).alias("shh"),
        F.sum(dec(h) * d).alias("shd"),
        F.sum(dec(d) * d).alias("sdd"),
        F.sum(dec(ys)).alias("sy"),
        F.sum(dec(ys) * h).alias("shy"),
        F.sum(dec(ys) * d).alias("sdy"),
    )
    c = F.col
    det = (
        c("n") * (c("shh") * c("sdd") - c("shd") * c("shd"))
        - c("sh") * (c("sh") * c("sdd") - c("shd") * c("sd"))
        + c("sd") * (c("sh") * c("shd") - c("shh") * c("sd"))
    ).cast("double")
    det0 = (
        c("sy") * (c("shh") * c("sdd") - c("shd") * c("shd"))
        - c("sh") * (c("shy") * c("sdd") - c("shd") * c("sdy"))
        + c("sd") * (c("shy") * c("shd") - c("shh") * c("sdy"))
    ).cast("double")
    det1 = (
        c("n") * (c("shy") * c("sdd") - c("sdy") * c("shd"))
        - c("sy") * (c("sh") * c("sdd") - c("shd") * c("sd"))
        + c("sd") * (c("sh") * c("sdy") - c("shy") * c("sd"))
    ).cast("double")
    det2 = (
        c("n") * (c("shh") * c("sdy") - c("shd") * c("shy"))
        - c("sh") * (c("sh") * c("sdy") - c("shy") * c("sd"))
        + c("sy") * (c("sh") * c("shd") - c("shh") * c("sd"))
    ).cast("double")
    safe_det = F.nullif(det, F.lit(0.0))
    return m.select(
        c("n").cast("long").alias("n_rows"),
        ((det0 / safe_det) / _OLS_SCALE).alias("beta_intercept"),
        ((det1 / safe_det) / _OLS_SCALE).alias("beta_hour"),
        ((det2 / safe_det) / _OLS_SCALE).alias("beta_dow"),
    )


# --------------------------------------------------------------------------
# E151: lead/lag cross-correlation between two daily event series
# --------------------------------------------------------------------------

_XCORR_MAX_LAG = 3


@query(
    "error_purchase_xcorr_lags",
    oracle=f"""
        WITH bounds AS (
          SELECT CAST(MIN(ts) AS DATE) AS lo, CAST(MAX(ts) AS DATE) AS hi
          FROM events
        ), cal AS (
          SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
          FROM bounds
        ), daily AS (
          SELECT c.day,
                 CAST(COALESCE(COUNT(*) FILTER (
                   WHERE e.event_type = 'error'), 0) AS BIGINT) AS n_err,
                 CAST(COALESCE(COUNT(*) FILTER (
                   WHERE e.event_type = 'purchase'), 0) AS BIGINT) AS n_pur
          FROM cal c LEFT JOIN events e ON CAST(e.ts AS DATE) = c.day
          GROUP BY c.day
        ), lags AS (
          SELECT unnest(generate_series(-{_XCORR_MAX_LAG},
                                        {_XCORR_MAX_LAG}, 1)) AS lag
        ), paired AS (
          SELECT l.lag, a.n_err AS x, b.n_pur AS y
          FROM lags l
          JOIN daily a ON TRUE
          JOIN daily b ON b.day = a.day + CAST(l.lag AS INTEGER)
        ), m AS (
          SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
                 SUM(CAST(x AS HUGEINT) * y) AS sxy,
                 SUM(CAST(x AS HUGEINT) * x) AS sxx,
                 SUM(CAST(y AS HUGEINT) * y) AS syy
          FROM paired GROUP BY lag
        )
        SELECT lag, n AS n_days,
               CAST(n * sxy - sx * sy AS DOUBLE)
                 / NULLIF(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                               * CAST(n * syy - sy * sy AS DOUBLE)), 0.0)
                 AS xcorr
        FROM m
    """,
)
def error_purchase_xcorr_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E151: cross-correlation function between the daily error-count and
    purchase-count series at lags -3..+3 (does error volume LEAD or LAG
    purchasing?). The calendar is zero-filled between the data's min/max
    date so silent days count as 0 rather than vanishing; each lag's
    Pearson r pairs err(t) with pur(t+lag) over the days where the
    shifted day is still inside the calendar.

    Exactness: counts are integers; the five cross-moments accumulate in
    128-bit (a sf-1000 daily count squared times days would pass BIGINT),
    and r is one fixed sqrt+divide chain over exact integers —
    bit-identical across engines; degenerate constant series yield NULL.

    Scale: the fact table collapses to |days| rows FIRST (map-side
    combinable counts); the lag pairing joins the tiny daily frame to
    itself 7 times via an exploded literal lag column — O(days x lags)
    rows total, broadcast-sized."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.col("ts").cast("date")).alias("lo"),
        F.max(F.col("ts").cast("date")).alias("hi"),
    )
    cal = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("day")
    )
    counts = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.when(F.col("event_type") == "error", 1))
        .cast("long")
        .alias("n_err"),
        F.count(F.when(F.col("event_type") == "purchase", 1))
        .cast("long")
        .alias("n_pur"),
    )
    daily = scoped_persist(
        cal.join(counts, "day", "left").select(
            "day",
            F.coalesce(F.col("n_err"), F.lit(0)).cast("long").alias("n_err"),
            F.coalesce(F.col("n_pur"), F.lit(0)).cast("long").alias("n_pur"),
        )
    )
    lags = spark.range(-_XCORR_MAX_LAG, _XCORR_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = daily.alias("a")
    b = daily.alias("b")
    paired = (
        lags.crossJoin(a)
        .join(
            b,
            F.col("b.day") == F.expr("date_add(a.day, lag)"),
        )
        .select(
            "lag",
            F.col("a.n_err").alias("x"),
            F.col("b.n_pur").alias("y"),
        )
    )
    dx = F.col("x").cast("decimal(38,0)")
    dy = F.col("y").cast("decimal(38,0)")
    m = paired.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dx).alias("sx"),
        F.sum(dy).alias("sy"),
        F.sum(dx * F.col("y")).alias("sxy"),
        F.sum(dx * F.col("x")).alias("sxx"),
        F.sum(dy * F.col("y")).alias("syy"),
    )
    c = F.col
    num = (c("n") * c("sxy") - c("sx") * c("sy")).cast("double")
    den = F.sqrt(
        (c("n") * c("sxx") - c("sx") * c("sx")).cast("double")
        * (c("n") * c("syy") - c("sy") * c("sy")).cast("double")
    )
    return m.select(
        F.col("lag").cast("long").alias("lag"),
        c("n").alias("n_days"),
        (num / F.nullif(den, F.lit(0.0))).alias("xcorr"),
    )


# --------------------------------------------------------------------------
# E155: SAX symbolization of the daily-revenue series (PAA + breakpoints)
# --------------------------------------------------------------------------

#: PAA segment width in days and the 4-symbol Gaussian breakpoints
#: (literal constants shared verbatim with the oracle — equiprobable
#: quartiles of N(0,1)).
_SAX_W = 8
_SAX_BP = "0.6745"


@query(
    "daily_revenue_sax",
    oracle=f"""
        WITH b AS (
          SELECT CAST(MIN(o_orderdate) AS DATE) AS lo,
                 CAST(MAX(o_orderdate) AS DATE) AS hi
          FROM orders
        ), cal AS (
          SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
          FROM b
        ), rev AS (
          SELECT CAST(o_orderdate AS DATE) AS day,
                 CAST(SUM(CAST(FLOOR(o_totalprice * {SCALE} + 0.5)
                      AS BIGINT)) AS BIGINT) AS sc
          FROM orders GROUP BY 1
        ), daily AS (
          SELECT CAST(date_diff('day', b.lo, c.day) AS BIGINT) AS idx,
                 CAST(COALESCE(r.sc, 0) AS BIGINT) AS sc
          FROM cal c CROSS JOIN b LEFT JOIN rev r ON r.day = c.day
        ), m AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CAST(sc AS HUGEINT)) AS s1,
                 SUM(CAST(sc AS HUGEINT) * sc) AS s2
          FROM daily
        ), seg AS (
          SELECT idx // {_SAX_W} AS segment,
                 CAST(COUNT(*) AS BIGINT) AS n_days,
                 SUM(CAST(sc AS HUGEINT)) AS seg_sum
          FROM daily GROUP BY 1
        )
        SELECT s.segment,
               (CAST(s.seg_sum AS DOUBLE) / {SCALE}) / s.n_days AS paa_value,
               CASE WHEN sqrt((CAST(m.n * m.s2 - m.s1 * m.s1 AS DOUBLE))
                              / (CAST(m.n AS DOUBLE) * m.n)) = 0.0 THEN NULL
                    WHEN ((CAST(s.seg_sum AS DOUBLE) / s.n_days)
                          - CAST(m.s1 AS DOUBLE) / m.n)
                         / sqrt((CAST(m.n * m.s2 - m.s1 * m.s1 AS DOUBLE))
                                / (CAST(m.n AS DOUBLE) * m.n))
                         < -{_SAX_BP} THEN 'a'
                    WHEN ((CAST(s.seg_sum AS DOUBLE) / s.n_days)
                          - CAST(m.s1 AS DOUBLE) / m.n)
                         / sqrt((CAST(m.n * m.s2 - m.s1 * m.s1 AS DOUBLE))
                                / (CAST(m.n AS DOUBLE) * m.n))
                         < 0.0 THEN 'b'
                    WHEN ((CAST(s.seg_sum AS DOUBLE) / s.n_days)
                          - CAST(m.s1 AS DOUBLE) / m.n)
                         / sqrt((CAST(m.n * m.s2 - m.s1 * m.s1 AS DOUBLE))
                                / (CAST(m.n AS DOUBLE) * m.n))
                         < {_SAX_BP} THEN 'c'
                    ELSE 'd' END AS sax_symbol
        FROM seg s CROSS JOIN m
    """,
)
def daily_revenue_sax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E155: SAX (Symbolic Aggregate approXimation, Lin et al. DMKD'07) of
    the daily order-revenue series — z-normalize, average into 8-day PAA
    segments, map each segment to one of 4 symbols at the equiprobable
    N(0,1) breakpoints (+-0.6745, 0). The symbolized series is what
    time-series indexing/motif/discord mining actually stores: thousands
    of days collapse to a short string with a lower-bounding distance.

    Exactness: daily revenue is 4-dp fixed point, zero-filled over the
    calendar; global mean/std and segment PAA means all derive from
    exact (128-bit) integer moments, each z-score is ONE fixed double
    chain over identical operands, and the breakpoint comparisons are
    against shared literal constants — so the symbols are bit-identical
    across engines; a constant series yields NULL symbols (std = 0).

    Scale: facts collapse map-side to |days| rows, segments to
    |days|/8; everything after the first aggregate is broadcast-sized.
    """
    orders = load_table(spark, sf_dir, "orders")
    sc_ = F.floor(F.col("o_totalprice") * SCALE + F.lit(0.5)).cast("long")
    rev = orders.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(sc_).cast("long").alias("sc")
    )
    bounds = orders.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("lo"),
        F.max(F.col("o_orderdate").cast("date")).alias("hi"),
    )
    cal = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("day"),
        "lo",
    )
    daily = scoped_persist(
        cal.join(rev, "day", "left").select(
            F.datediff(F.col("day"), F.col("lo")).cast("long").alias("idx"),
            F.coalesce(F.col("sc"), F.lit(0)).cast("long").alias("sc"),
        )
    )
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    m = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec(F.col("sc"))).alias("s1"),
        F.sum(dec(F.col("sc")) * F.col("sc")).alias("s2"),
    )
    seg = daily.groupBy(
        F.expr(f"idx div {_SAX_W}").alias("segment")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(dec(F.col("sc"))).alias("seg_sum"),
    )
    joined = seg.crossJoin(F.broadcast(m))
    std = F.sqrt(
        (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double")
        / (F.col("n").cast("double") * F.col("n"))
    )
    z = (
        (F.col("seg_sum").cast("double") / F.col("n_days"))
        - F.col("s1").cast("double") / F.col("n")
    ) / std
    bp = float(_SAX_BP)
    return joined.select(
        "segment",
        ((F.col("seg_sum").cast("double") / SCALE) / F.col("n_days")).alias(
            "paa_value"
        ),
        F.when(std == 0.0, F.lit(None).cast("string"))
        .when(z < -bp, "a")
        .when(z < 0.0, "b")
        .when(z < bp, "c")
        .otherwise("d")
        .alias("sax_symbol"),
    )


# --------------------------------------------------------------------------
# E159: Holt-Winters additive smoothing (level + trend + weekly seasonality)
# --------------------------------------------------------------------------

_HW_P = 7       # seasonal period (weekly pattern over the daily series)
_HW_H = 14      # forecast horizon (days)
# α = β = γ = 1/2: exactly-representable smoothing weights — the
# recurrence is a fixed chain of correctly-rounded IEEE ops, mirrored
# expression-for-expression in the recursive-CTE oracle.


def _hw_walk(pdf):
    """l,b,s recurrence over one calendar-bounded group. Classic init:
    l0 = mean of the first period, b0 = 0, s_i = y_i - l0; from day P+1,
      l' = 0.5(y - s_head) + 0.5(l + b)
      b' = 0.5(l' - l) + 0.5 b
      s_new = 0.5(y - l') + 0.5 s_head, seasonal queue rotates.
    Forecast h: (l + h*b) + s[(h-1) mod P]."""
    import pandas as pd

    pdf = pdf.sort_values("idx").reset_index(drop=True)
    sc = pdf["sc"].tolist()
    ys = [v / 10000.0 for v in sc]
    n = len(ys)
    p = _HW_P
    l0 = (float(sum(sc[:p])) / 10000.0) / p
    s = [ys[i] - l0 for i in range(p)]
    idxs = pdf["idx"].tolist()
    lev = [l0] * p
    tre = [0.0] * p
    sea = list(s)
    l, b = l0, 0.0
    for t in range(p, n):
        y = ys[t]
        l_new = 0.5 * (y - s[0]) + 0.5 * (l + b)
        b = 0.5 * (l_new - l) + 0.5 * b
        s_new = 0.5 * (y - l_new) + 0.5 * s[0]
        l = l_new
        s = s[1:] + [s_new]
        lev.append(l)
        tre.append(b)
        sea.append(s_new)
    rows = {
        "idx": idxs,
        "revenue": ys,
        "level": lev,
        "trend": tre,
        "seasonal": sea,
        "is_forecast": [False] * n,
    }
    last = idxs[-1]
    for h in range(1, _HW_H + 1):
        rows["idx"].append(last + h)
        rows["revenue"].append(None)
        rows["level"].append((l + h * b) + s[(h - 1) % p])
        rows["trend"].append(b)
        rows["seasonal"].append(s[(h - 1) % p])
        rows["is_forecast"].append(True)
    return pd.DataFrame(rows)


def _hw_oracle() -> str:
    p = _HW_P
    sc_cases = ", ".join(
        f"MAX(CASE WHEN idx = {k} THEN sc END) AS sc{k}" for k in range(1, p + 1)
    )
    s_init = ", ".join(
        f"CAST(sc{k} AS DOUBLE) / {SCALE} - l0 AS s{k}" for k in range(1, p + 1)
    )
    rot = ", ".join(f"s{k}" for k in range(2, p + 1))
    fc_sea = " ".join(
        f"WHEN (f.h - 1) % {p} = {k - 1} THEN w.s{k}" for k in range(1, p + 1)
    )
    return f"""
        WITH RECURSIVE b0 AS (
          SELECT CAST(MIN(o_orderdate) AS DATE) AS lo,
                 CAST(MAX(o_orderdate) AS DATE) AS hi
          FROM orders
        ), cal AS (
          SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
          FROM b0
        ), rev AS (
          SELECT CAST(o_orderdate AS DATE) AS day,
                 CAST(SUM(CAST(FLOOR(o_totalprice * {SCALE} + 0.5)
                      AS BIGINT)) AS BIGINT) AS sc
          FROM orders GROUP BY 1
        ), daily AS (
          SELECT CAST(date_diff('day', b0.lo, c.day) + 1 AS BIGINT) AS idx,
                 CAST(COALESCE(r.sc, 0) AS BIGINT) AS sc,
                 CAST(COALESCE(r.sc, 0) AS DOUBLE) / {SCALE} AS y
          FROM cal c CROSS JOIN b0 LEFT JOIN rev r ON r.day = c.day
        ), init AS (
          SELECT CAST(l0num AS DOUBLE) / {SCALE} / {p} AS l0, {s_init}
          FROM (
            SELECT SUM(sc) FILTER (WHERE idx <= {p}) AS l0num, {sc_cases}
            FROM daily
          )
        ), walk AS (
          SELECT CAST({p} AS BIGINT) AS idx, CAST(NULL AS DOUBLE) AS y,
                 l0 AS l, CAST(0 AS DOUBLE) AS b,
                 s1, s2, s3, s4, s5, s6, s7
          FROM init
          UNION ALL
          SELECT idx, y, l_new,
                 0.5 * (l_new - l) + 0.5 * b,
                 {rot}, 0.5 * (y - l_new) + 0.5 * s1
          FROM (
            SELECT d.idx, d.y, w.l, w.b, w.s1, w.s2, w.s3, w.s4, w.s5,
                   w.s6, w.s7,
                   0.5 * (d.y - w.s1) + 0.5 * (w.l + w.b) AS l_new
            FROM walk w JOIN daily d ON d.idx = w.idx + 1
          )
        ), final AS (
          SELECT * FROM walk ORDER BY idx DESC LIMIT 1
        )
        SELECT d.idx AS day_index, d.y AS revenue, i.l0 AS level,
               CAST(0 AS DOUBLE) AS trend,
               CASE {" ".join(f"WHEN d.idx = {k} THEN i.s{k}" for k in range(1, p + 1))}
               END AS seasonal,
               FALSE AS is_forecast
        FROM daily d CROSS JOIN init i WHERE d.idx <= {p}
        UNION ALL
        SELECT w.idx, w.y, w.l, w.b, w.s7, FALSE
        FROM walk w WHERE w.idx > {p}
        UNION ALL
        SELECT w.idx + f.h, NULL,
               (w.l + f.h * w.b) + (CASE {fc_sea} END),
               w.b, (CASE {fc_sea} END), TRUE
        FROM final w,
             (SELECT unnest(generate_series(1, {_HW_H})) AS h) f
    """


@query("daily_revenue_holt_winters", oracle=_hw_oracle())
def daily_revenue_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E159: Holt-Winters ADDITIVE triple exponential smoothing over the
    zero-filled daily-revenue series — level + trend + a rotating weekly
    seasonal queue (period 7), with a 14-day seasonal forecast: the
    model that follows BOTH drift and the day-of-week cycle, which Holt
    (E124) flattens and the seasonal-index table (E132) can't trend.

    Exactness: alpha=beta=gamma=1/2 (exactly representable), daily
    revenue enters as 4-dp fixed point, and every float expression shape
    is mirrored verbatim between the pandas walk and the recursive-CTE
    oracle (which carries the 7-slot seasonal queue as rotating named
    columns) — so all outputs hash-gate bitwise.

    Scale: facts collapse to one row per DAY in the only volume-bound
    pass; the recurrence walks the calendar-sized frame inside one
    applyInPandas group (rows grow with days, not orders) — the same
    boundedness waiver as monthly_revenue_holt."""
    orders = load_table(spark, sf_dir, "orders")
    sc_ = F.floor(F.col("o_totalprice") * SCALE + F.lit(0.5)).cast("long")
    rev = orders.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(sc_).cast("long").alias("sc")
    )
    bounds = orders.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("lo"),
        F.max(F.col("o_orderdate").cast("date")).alias("hi"),
    )
    cal = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("day"),
        "lo",
    )
    daily = cal.join(rev, "day", "left").select(
        (F.datediff(F.col("day"), F.col("lo")) + 1).cast("long").alias("idx"),
        F.coalesce(F.col("sc"), F.lit(0)).cast("long").alias("sc"),
        F.lit(1).alias("g"),
    )
    out = daily.groupBy("g").applyInPandas(
        lambda pdf: _hw_walk(pdf),
        "idx long, revenue double, level double, trend double, "
        "seasonal double, is_forecast boolean",
    )
    return out.select(
        F.col("idx").alias("day_index"),
        "revenue",
        "level",
        "trend",
        "seasonal",
        "is_forecast",
    )


# --------------------------------------------------------------------------
# E173: Spearman rank correlation (quantity vs extended price)
# --------------------------------------------------------------------------

#: Exact-split wide-integer -> double: the moment determinants exceed
#: 2^53 at sf0.1+, and the ENGINES' native casts round differently there
#: (Spark goes through BigDecimal, DuckDB composes the two 64-bit halves
#: — found as a last-ulp rho divergence in the 10x sweep). Splitting at
#: 2^53 makes both pieces exactly representable, so the one recompose
#: rounding happens on identical operands in both engines.
_P53 = 9_007_199_254_740_992  # 2^53


def _d128(x: str, idiv: str) -> str:
    # split |x| (integer division/modulo of NEGATIVES floors in DuckDB
    # but truncates in Spark — sign is factored out first) and reapply
    # the sign as a double multiply
    ax = f"ABS({x})"
    return (
        f"((CASE WHEN ({x}) < 0 THEN -1.0 ELSE 1.0 END)"
        f" * (CAST(({ax}) {idiv} {_P53} AS DOUBLE) * {_P53}.0"
        f" + CAST(({ax}) % {_P53} AS DOUBLE)))"
    )


def _spear_rho(idiv: str) -> str:
    return (
        f"{_d128('num', idiv)}"
        f" / NULLIF(SQRT({_d128('dx', idiv)} * {_d128('dy', idiv)}), 0.0)"
    )


def _spearman_oracle() -> str:
    def rank_cte(col: str) -> str:
        return f"""r{col} AS (
          SELECT {col},
                 2 * COALESCE(SUM(cnt) OVER (
                   ORDER BY {col}
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) + cnt + 1 AS r_{col}
          FROM (SELECT {col}, CAST(COUNT(*) AS BIGINT) AS cnt
                FROM v GROUP BY {col})
        )"""

    return f"""
        WITH v AS (
          SELECT CAST(FLOOR(CAST(l_quantity AS DOUBLE) * 100 + 0.5)
                   AS BIGINT) AS qv,
                 CAST(FLOOR(CAST(l_extendedprice AS DOUBLE) * 100 + 0.5)
                   AS BIGINT) AS pv
          FROM lineitem
        ), {rank_cte("qv")}, {rank_cte("pv")},
        j AS (
          SELECT rqv.r_qv AS x, rpv.r_pv AS y
          FROM v JOIN rqv USING (qv) JOIN rpv USING (pv)
        ), agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CAST(x AS HUGEINT)) AS sx,
                 SUM(CAST(y AS HUGEINT)) AS sy,
                 SUM(CAST(x AS HUGEINT) * y) AS sxy,
                 SUM(CAST(x AS HUGEINT) * x) AS sxx,
                 SUM(CAST(y AS HUGEINT) * y) AS syy
          FROM j
        ), f AS (
          SELECT n, n * sxy - sx * sy AS num,
                 n * sxx - sx * sx AS dx,
                 n * syy - sy * sy AS dy
          FROM agg
        )
        SELECT n AS n_rows, {_spear_rho("//")} AS rho FROM f
    """


def _avg_rank2(df: DataFrame, col: str, out: str) -> DataFrame:
    """Average rank (doubled, so ties stay integral: r2 = 2·c_less + cnt
    + 1) of every distinct value of ``df[col]`` — two-phase distributed
    prefix sum over the value-collapsed frame (the _global_ranks shape):
    range-repartition → per-partition local windows → 32-row broadcast
    offset frame. No O(distinct-values) single-partition window ever
    materializes, so the plan survives a value domain of any
    cardinality."""
    g = df.groupBy(col).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    local = scoped_persist(
        g.repartitionByRange(32, col).select(
            col, "cnt", F.spark_partition_id().alias("pid")
        )
    )
    w_local = (
        Window.partitionBy("pid")
        .orderBy(col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ptot = local.groupBy("pid").agg(F.sum("cnt").alias("t"))
    w_off = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    off = ptot.select(
        "pid", F.coalesce(F.sum("t").over(w_off), F.lit(0)).alias("off")
    )
    return (
        local.select(
            col,
            "cnt",
            "pid",
            F.coalesce(F.sum("cnt").over(w_local), F.lit(0)).alias("lless"),
        )
        .join(F.broadcast(off), "pid")
        .select(
            col,
            (
                2 * (F.col("off") + F.col("lless")) + F.col("cnt") + 1
            ).alias(out),
        )
    )


@query("spearman_qty_price_corr", oracle=_spearman_oracle())
def spearman_qty_price_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E173: Spearman rank correlation between order-line quantity and
    extended price — the monotone-association companion to the pack's
    Pearson-style moments (E96 rolling corr, E107 Theil-Sen): rank
    correlation is what a metrics platform should report when the
    relationship is nonlinear or the tails are heavy, and on TPC-H
    lineitem it is a known strong positive (price ≈ qty · unit price).

    Method: average ranks with exact tie handling — each distinct value
    carries r2 = 2·c_less + cnt + 1 (avg rank doubled, always integral),
    built by the two-phase distributed prefix sum for BOTH columns
    (quantity's ~50-value domain gets no special case; the same plan
    holds for the ~10⁶-value price domain). ρ is then Pearson over the
    doubled ranks: (n·Σxy − Σx·Σy) / √((n·Σx²−Σx²)·(n·Σy²−Σy²)) — the
    doubling cancels.

    Exactness: every rank and every moment is an exact integer
    (decimal(38,0) Spark / HUGEINT DuckDB — rank products reach n³);
    the final ρ is one shared-literal double chain (div, sqrt), NULL on
    zero variance.

    Scale: two value-collapsed aggregates (map-side combine), two
    32-partition prefix frames, a ~5000-row broadcast join for the
    quantity ranks and one value-keyed shuffle join for price; moment
    sums are a single map-side-combinable aggregate. Nothing quadratic,
    nothing driver-side."""
    li = load_table(spark, sf_dir, "lineitem")
    v = scoped_persist(
        li.select(
            F.floor(F.col("l_quantity").cast("double") * 100 + F.lit(0.5))
            .cast("long")
            .alias("qv"),
            F.floor(
                F.col("l_extendedprice").cast("double") * 100 + F.lit(0.5)
            )
            .cast("long")
            .alias("pv"),
        )
    )
    rq = _avg_rank2(v.select("qv"), "qv", "x")
    rp = _avg_rank2(v.select("pv"), "pv", "y")
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    agg = (
        v.join(F.broadcast(rq), "qv")
        .join(rp, "pv")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(dec("x")).alias("sx"),
            F.sum(dec("y")).alias("sy"),
            F.sum(dec("x") * F.col("y")).alias("sxy"),
            F.sum(dec("x") * F.col("x")).alias("sxx"),
            F.sum(dec("y") * F.col("y")).alias("syy"),
        )
    )
    f = agg.select(
        "n",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias("dx"),
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).alias("dy"),
    )
    return f.select(
        F.col("n").alias("n_rows"), F.expr(_spear_rho("div")).alias("rho")
    )


# --------------------------------------------------------------------------
# E180: Wald-Wolfowitz runs test on daily revenue (randomness audit)
# --------------------------------------------------------------------------

#: 2·n1·n2 is forced to DOUBLE via an explicit CAST on the first factor:
#: bare `2.0 * n_above` parses as DECIMAL×BIGINT with engine-specific
#: division scales (found as a 1e-10 z divergence; doubles end-to-end
#: are bit-identical).
_RUNS_Z = (
    "(CAST(n_runs AS DOUBLE)"
    " - (1.0 + 2.0 * CAST(n_above AS DOUBLE) * n_below / n_days))"
    " / NULLIF(SQRT((2.0 * CAST(n_above AS DOUBLE) * n_below"
    " * (2.0 * CAST(n_above AS DOUBLE) * n_below - n_days))"
    " / (CAST(n_days AS DOUBLE) * n_days * (n_days - 1))), 0.0)"
)


@query(
    "daily_revenue_runs_test",
    oracle=f"""
        WITH daily AS (
          SELECT o_orderdate AS d,
                 SUM(CAST(FLOOR(CAST(o_totalprice AS DOUBLE) * {SCALE}
                                + 0.5) AS HUGEINT)) AS s
          FROM orders GROUP BY o_orderdate
        ), tot AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS nd, SUM(s) AS ts FROM daily
        ), lab AS (
          SELECT d,
                 CASE WHEN daily.s * tot.nd > tot.ts THEN 1 ELSE 0 END
                   AS above
          FROM daily CROSS JOIN tot
        ), runs AS (
          SELECT above,
                 CASE WHEN LAG(above) OVER (ORDER BY d) IS NULL
                        OR LAG(above) OVER (ORDER BY d) <> above
                      THEN 1 ELSE 0 END AS new_run
          FROM lab
        ), agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
                 CAST(SUM(above) AS BIGINT) AS n_above,
                 CAST(COUNT(*) - SUM(above) AS BIGINT) AS n_below,
                 CAST(SUM(new_run) AS BIGINT) AS n_runs
          FROM runs
        )
        SELECT n_days, n_above, n_below, n_runs, {_RUNS_Z} AS z
        FROM agg
    """,
)
def daily_revenue_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E180: Wald-Wolfowitz runs test — is the daily revenue series
    RANDOM around its mean, or does it trend/cycle? Counts maximal runs
    of above/below-mean days; too few runs ⇒ positive serial dependence
    (trend), too many ⇒ alternation. The distribution-free randomness
    audit that complements the pack's model-based series tools (E86
    autocorrelation measures lag-1 only; E66 CUSUM assumes a level
    shift; this tests the whole sign sequence).

    Exactness: daily sums are 4-dp integers; "above mean" is the
    CROSS-MULTIPLIED integer comparison s·n > Σs (no division, no ties
    ambiguity — equal-to-mean days class as below deterministically);
    run boundaries are integer lag comparisons; z is one shared-literal
    double chain from three integers (NULL when a side is empty, where
    the normal approximation is undefined).

    Scale: one map-side-combinable aggregate to the one-row-per-day
    frame; the lag and the prefix counts run on that calendar-bounded
    frame — volume-independent after the first pass."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(
            F.floor(
                F.col("o_totalprice").cast("double") * SCALE + F.lit(0.5)
            ).cast("decimal(38,0)")
        ).alias("s")
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum("s").alias("ts"),
    )
    lab = daily.crossJoin(F.broadcast(tot)).select(
        "d",
        F.when(
            F.col("s") * F.col("nd") > F.col("ts"), F.lit(1)
        ).otherwise(F.lit(0)).alias("above"),
    )
    wlag = Window.orderBy("d")
    runs = lab.select(
        "above",
        F.when(
            F.lag("above").over(wlag).isNull()
            | (F.lag("above").over(wlag) != F.col("above")),
            F.lit(1),
        ).otherwise(F.lit(0)).alias("new_run"),
    )
    agg = runs.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("above").cast("long").alias("n_above"),
        (F.count(F.lit(1)) - F.sum("above")).cast("long").alias("n_below"),
        F.sum("new_run").cast("long").alias("n_runs"),
    )
    return agg.select(
        "n_days", "n_above", "n_below", "n_runs", F.expr(_RUNS_Z).alias("z")
    )


# --------------------------------------------------------------------------
# E193: index of dispersion for daily counts (Poisson overdispersion)
# --------------------------------------------------------------------------

_DISP = (
    "((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1))"
    " / NULLIF(CAST(s AS DOUBLE) / n, 0.0)"
)


@query(
    "daily_count_dispersion",
    oracle=f"""
        WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS d,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2
        ), m AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CAST(c AS HUGEINT)) AS s,
                 SUM(CAST(c AS HUGEINT) * c) AS q
          FROM daily GROUP BY event_type
        )
        SELECT event_type, n AS n_days,
               CAST(s AS DOUBLE) / n AS mean_daily,
               {_DISP} AS dispersion_index
        FROM m
    """,
)
def daily_count_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E193: index of dispersion (variance-to-mean ratio) of each event
    type's daily counts — the one-number Poisson check: ≈1 means
    memoryless arrivals (alerting thresholds from √mean are valid), >1
    overdispersed/bursty (they are not — use E65's seasonal bands or a
    negative-binomial budget instead). The diagnostic that says WHICH
    anomaly machinery applies, before any of it runs.

    Exactness: daily counts are exact integers; per-type Σc/Σc² are
    128-bit; the ratio is one shared-literal chain (sample variance /
    mean), NULL for an empty mean.

    Scale: one (type, day) counting pass (map-side combine) to a
    calendar-bounded frame, then a |types|-row reduce."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec("c")).alias("s"),
        F.sum(dec("c") * F.col("c")).alias("q"),
    )
    return m.select(
        "event_type",
        F.col("n").alias("n_days"),
        (F.col("s").cast("double") / F.col("n")).alias("mean_daily"),
        F.expr(_DISP).alias("dispersion_index"),
    )


# --------------------------------------------------------------------------
# E206: naive and seasonal-naive forecast baselines (MASE denominators)
# --------------------------------------------------------------------------


@query(
    "daily_revenue_mase_baselines",
    oracle=f"""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
                 SUM(CAST(FLOOR(CAST(o_totalprice AS DOUBLE) * {SCALE}
                                + 0.5) AS HUGEINT)) AS s
          FROM orders GROUP BY 1
        ), lagged AS (
          SELECT d, s,
                 LAG(s, 1) OVER (ORDER BY d) AS s1,
                 LAG(s, 7) OVER (ORDER BY d) AS s7
          FROM daily
        ), err AS (
          SELECT CAST(COUNT(s1) AS BIGINT) AS n1,
                 SUM(ABS(s - s1)) AS ae1,
                 CAST(COUNT(s7) AS BIGINT) AS n7,
                 SUM(ABS(s - s7)) AS ae7
          FROM lagged
        )
        SELECT n1 AS n_naive, n7 AS n_seasonal,
               CAST(ae1 AS DOUBLE) / {SCALE} / n1 AS mae_naive,
               CAST(ae7 AS DOUBLE) / {SCALE} / n7 AS mae_seasonal_naive,
               (CAST(ae7 AS DOUBLE) / n7) / NULLIF(CAST(ae1 AS DOUBLE)
                 / n1, 0.0) AS seasonal_vs_naive_ratio
        FROM err
    """,
)
def daily_revenue_mase_baselines(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """E206: the forecast-evaluation floor — mean absolute error of the
    naive (yesterday's value) and seasonal-naive (same weekday last
    week) forecasts of daily revenue. These are the MASE denominators
    (Hyndman & Koehler 2006): any model the pack fits (E117 Holt, E159
    Holt-Winters) is only as good as its error RELATIVE to these — and
    the seasonal/naive ratio by itself already says whether weekly
    seasonality is real (ratio < 1) before fitting anything.

    Exactness: daily sums are 4-dp integers; absolute errors are exact
    integer differences summed exactly; three shared-literal divisions.

    Scale: one map-side pass to the calendar frame; lags ride the
    one-row-per-day window."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("d")
    ).agg(
        F.sum(
            F.floor(
                F.col("o_totalprice").cast("double") * SCALE + F.lit(0.5)
            ).cast("decimal(38,0)")
        ).alias("s")
    )
    w = Window.orderBy("d")
    lagged = daily.select(
        "s",
        F.lag("s", 1).over(w).alias("s1"),
        F.lag("s", 7).over(w).alias("s7"),
    )
    err = lagged.agg(
        F.count("s1").cast("long").alias("n1"),
        F.sum(F.abs(F.col("s") - F.col("s1"))).alias("ae1"),
        F.count("s7").cast("long").alias("n7"),
        F.sum(F.abs(F.col("s") - F.col("s7"))).alias("ae7"),
    )
    return err.select(
        F.col("n1").alias("n_naive"),
        F.col("n7").alias("n_seasonal"),
        (F.col("ae1").cast("double") / SCALE / F.col("n1")).alias(
            "mae_naive"
        ),
        (F.col("ae7").cast("double") / SCALE / F.col("n7")).alias(
            "mae_seasonal_naive"
        ),
        (
            (F.col("ae7").cast("double") / F.col("n7"))
            / F.nullif(
                F.col("ae1").cast("double") / F.col("n1"), F.lit(0.0)
            )
        ).alias("seasonal_vs_naive_ratio"),
    )


# --------------------------------------------------------------------------
# E227: Hodges-Lehmann location estimator (median of Walsh averages)
# --------------------------------------------------------------------------


@query(
    "hodges_lehmann_value",
    oracle="""
        WITH cells AS (
          SELECT CAST(FLOOR(value) AS BIGINT) AS u,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM events WHERE value IS NOT NULL
          GROUP BY 1
        ), pairs AS (
          SELECT a.u + b.u AS s,
                 CASE WHEN a.u < b.u
                      THEN CAST(a.c AS HUGEINT) * b.c
                      ELSE CAST(a.c AS HUGEINT) * (a.c + 1) // 2
                 END AS w
          FROM cells a JOIN cells b ON a.u <= b.u
        ), per_s AS (
          SELECT s, SUM(w) AS w FROM pairs GROUP BY s
        ), cum AS (
          SELECT s, SUM(w) OVER (
                   ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW
                 ) AS cw
          FROM per_s
        ), tot AS (
          SELECT SUM(w) AS n_walsh FROM per_s
        ), med AS (
          SELECT MIN(CASE WHEN 2 * cw >= n_walsh THEN s END) AS s_lo,
                 MIN(CASE WHEN 2 * cw >= n_walsh + 1 THEN s END) AS s_hi
          FROM cum CROSS JOIN tot
        )
        SELECT (SELECT CAST(COUNT(value) AS BIGINT) FROM events) AS n_rows,
               CAST(tot.n_walsh AS DOUBLE) AS n_walsh,
               (CAST(med.s_lo AS DOUBLE) + med.s_hi) / 4.0 AS hl_estimate
        FROM med CROSS JOIN tot
    """,
)
def hodges_lehmann_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E227: Hodges-Lehmann one-sample location estimator of event value
    — the median of all n(n+1)/2 Walsh averages (x_i + x_j)/2, i <= j.
    It is the location estimate the Wilcoxon signed-rank test inverts:
    ~29% breakdown and 0.955 Gaussian efficiency, vs the mean's 0%
    breakdown and the median's 0.64 efficiency — the right default for
    skewed, outlier-prone telemetry values (complements E33 MAD and E64
    winsorization, which REJECT outliers rather than absorb them).

    Computed exactly on the integer-unit value collapse (u = floor(v);
    the raw column is 2-dp so this is a documented, deterministic
    coarsening): never materializes n^2 pairs — the cell frame (u, c) is
    VALUE-DOMAIN-bounded, the i <= j cell grid contributes weight c_i*c_j
    (c_i*(c_i+1)/2 on the diagonal) to Walsh SUM s = u_i + u_j, and the
    weighted lower/upper median comes off a prefix sum over the <=2*|u|
    distinct sums.  hl = (s_lo + s_hi)/4 (sums halve to averages, the
    two central order statistics average again).

    Exactness: weights are 128-bit integers (counts square at 100 TB);
    the median thresholds use the division-free form 2*cw >= N (lower)
    and 2*cw >= N+1 (upper) — exact for both parities of N;
    the only double math is the final literal division.

    Scale: one map-side-combined aggregate collapses ANY volume to the
    value-domain cell frame (<=~600 cells/sf here; bounded by value
    range, not rows); the i<=j grid is a broadcast nested-loop of that
    bounded frame with itself (waived: domain^2, volume-independent);
    the prefix sum is a global window over the <=2|u|-row sum-domain
    frame; N arrives as a 1-row crossJoin."""
    events = load_table(spark, sf_dir, "events")
    cells = (
        events.filter(F.col("value").isNotNull())
        .select(F.floor("value").cast("long").alias("u"))
        .groupBy("u")
        .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("c"))
    )
    a = cells.select(F.col("u").alias("ua"), F.col("c").alias("ca"))
    cells_b = cells.select(F.col("u").alias("ub"), F.col("c").alias("cb"))
    pairs = a.join(F.broadcast(cells_b), F.col("ua") <= F.col("ub")).select(
        (F.col("ua") + F.col("ub")).alias("s"),
        F.when(
            F.col("ua") < F.col("ub"), F.col("ca") * F.col("cb")
        )
        .otherwise(F.col("ca") * (F.col("ca") + 1) / 2)
        .cast("decimal(38,0)")
        .alias("w"),
    )
    per_s = pairs.groupBy("s").agg(
        F.sum("w").cast("decimal(38,0)").alias("w")
    )
    cum = per_s.select(
        "s",
        F.sum("w")
        .over(
            Window.orderBy("s").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .cast("decimal(38,0)")
        .alias("cw"),
    )
    tot = per_s.agg(F.sum("w").cast("decimal(38,0)").alias("n_walsh"))
    med = cum.crossJoin(F.broadcast(tot)).agg(
        F.min(
            F.when(2 * F.col("cw") >= F.col("n_walsh"), F.col("s"))
        ).alias("s_lo"),
        F.min(
            F.when(2 * F.col("cw") >= F.col("n_walsh") + 1, F.col("s"))
        ).alias("s_hi"),
    )
    n_total = events.agg(
        F.count("value").cast("long").alias("n_rows")
    )
    return (
        med.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(n_total))
        .select(
            "n_rows",
            F.col("n_walsh").cast("double").alias("n_walsh"),
            (
                (F.col("s_lo").cast("double") + F.col("s_hi")) / 4.0
            ).alias("hl_estimate"),
        )
    )


# --------------------------------------------------------------------------
# E230: Haar multi-resolution decomposition of the daily revenue series
# --------------------------------------------------------------------------

#: Decomposition depth: level k aggregates 2^k-day blocks (1..3 → 2/4/8
#: days). Depth is a constant, so output stays calendar-bounded.
HAAR_LEVELS = (1, 2, 3)


def _haar_oracle() -> str:
    levels = []
    for k in HAAR_LEVELS:
        half = 1 << (k - 1)
        levels.append(f"""
          SELECT {k} AS level, d.day_idx // {1 << k} AS block,
                 CAST(SUM(d.cents) AS BIGINT) AS total_cents,
                 CAST(SUM(CASE WHEN (d.day_idx // {half}) % 2 = 0
                               THEN d.cents ELSE -d.cents END) AS BIGINT)
                   AS detail_cents
          FROM d GROUP BY 1, 2
        """)
    body = " UNION ALL ".join(levels)
    return f"""
        WITH d AS (
          SELECT DATEDIFF('day', DATE '{_EPOCH}',
                          CAST(o_orderdate AS DATE)) AS day_idx,
                 CAST(FLOOR(CAST(o_totalprice AS DOUBLE) * 100 + 0.5)
                   AS BIGINT) AS cents
          FROM orders
        )
        {body}
    """


@query("daily_revenue_haar", oracle=_haar_oracle())
def daily_revenue_haar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E230: unnormalized Haar wavelet decomposition of daily revenue —
    the multi-resolution view that localizes WHEN a change happened and
    at WHICH time scale (2/4/8-day blocks), complementing E66 CUSUM
    (single global changepoint) and E65 seasonal baselines: a big
    |detail| at level 3 with quiet levels 1-2 is a week-scale regime
    shift; the reverse is a one-day spike.  Per level k and block b:
    total = sum of revenue in the 2^k-day block, detail = left-half sum
    minus right-half sum (the Haar difference on the integer lattice —
    dropping the 1/2^k normalizer keeps every coefficient an EXACT
    integer; callers can rescale for energy plots).

    Absent days contribute zero revenue, which is exactly the zero-fill
    the transform wants — so no calendar spine join is needed at all.

    Exactness: cents are 2-dp fixed-point integers; every coefficient
    is an exact integer sum; no doubles anywhere.

    Scale: |levels| keyed aggregates straight off the fact scan (the
    CASE sign rides the map side), each collapsing to a calendar-bounded
    block frame — no windows, no joins, no spine.  Depth-constant
    unions keep the plan static; AQE coalesces the tiny shuffles."""
    orders = load_table(spark, sf_dir, "orders")
    d = orders.select(
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit(_EPOCH).cast("date")
        ).alias("day_idx"),
        F.floor(F.col("o_totalprice").cast("double") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    parts = []
    for k in HAAR_LEVELS:
        half = 1 << (k - 1)
        sign = F.when(
            ((F.col("day_idx") / half).cast("long") % 2) == 0,
            F.col("cents"),
        ).otherwise(-F.col("cents"))
        parts.append(
            d.groupBy(
                (F.col("day_idx") / (1 << k)).cast("long").alias("block")
            )
            .agg(
                F.sum("cents").cast("long").alias("total_cents"),
                F.sum(sign).cast("long").alias("detail_cents"),
            )
            .select(
                F.lit(k).alias("level"),
                "block",
                "total_cents",
                "detail_cents",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# --------------------------------------------------------------------------
# E234: Bollinger bands over daily revenue (RANGE window, exact moments)
# --------------------------------------------------------------------------

#: Window width in CALENDAR days (RANGE frame on the day index, so a
#: 20-day band means 20 days of wall-clock, not 20 trading rows).
BOLL_DAYS = 20
#: Band width in standard deviations.
BOLL_K = 2

#: Shared double chain over exact integer window moments s (Σcents),
#: n (rows), s2 (Σcents²): population variance then ±K·σ in currency.
_BOLL_MEAN = "(CAST(s AS DOUBLE) / n / 100.0)"


def _boll_exprs(idiv: str) -> dict:
    """Band expression set per engine: s2 is 128-bit (daily cents sums
    square past 2^53 even at sf0.1), so its double conversion must go
    through the _d128 exact split — a plain CAST differs in the last
    ulp between Spark's decimal and DuckDB's hugeint (the SCALE.md
    cast-portability rule; caught by the sf0.1 full sweep)."""
    var = (
        f"(({_d128('s2', idiv)} - CAST(s AS DOUBLE) * s / n)"
        " / n / 10000.0)"
    )
    std = f"SQRT(GREATEST({var}, 0.0))"
    return {
        "mean": _BOLL_MEAN,
        "up": f"({_BOLL_MEAN} + {BOLL_K} * {std})",
        "lo": f"({_BOLL_MEAN} - {BOLL_K} * {std})",
    }


@query(
    "daily_revenue_bollinger",
    oracle=f"""
        WITH d AS (
          SELECT DATEDIFF('day', DATE '{_EPOCH}',
                          CAST(o_orderdate AS DATE)) AS day_idx,
                 CAST(o_orderdate AS DATE) AS day,
                 CAST(SUM(CAST(FLOOR(CAST(o_totalprice AS DOUBLE) * 100
                   + 0.5) AS BIGINT)) AS BIGINT) AS cents
          FROM orders GROUP BY 1, 2
        ), w AS (
          SELECT day, cents,
                 CAST(SUM(cents) OVER win AS BIGINT) AS s,
                 CAST(COUNT(*) OVER win AS BIGINT) AS n,
                 SUM(CAST(cents AS HUGEINT) * cents) OVER win AS s2
          FROM d
          WINDOW win AS (
            ORDER BY day_idx
            RANGE BETWEEN {BOLL_DAYS - 1} PRECEDING AND CURRENT ROW
          )
        )
        SELECT day, CAST(cents AS DOUBLE) / 100.0 AS revenue,
               n AS n_window,
               {_boll_exprs("//")["mean"]} AS sma,
               {_boll_exprs("//")["up"]} AS upper_band,
               {_boll_exprs("//")["lo"]} AS lower_band,
               (CAST(cents AS DOUBLE) / 100.0 > {_boll_exprs("//")["up"]}
                OR CAST(cents AS DOUBLE) / 100.0
                  < {_boll_exprs("//")["lo"]}) AS breach
        FROM w
    """,
)
def daily_revenue_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E234: Bollinger bands — the rolling mean ± 2σ envelope every
    monitoring dashboard draws, over daily revenue with a TRUE 20
    calendar-day RANGE frame (a ROWS frame would silently stretch the
    window across data gaps).  Completes the volatility family: E63
    gives the rolling level, E65 the seasonal baseline, this the
    variance envelope with a breach flag.

    Exactness: window moments are exact integer sums of 2-dp cents (Σc
    as BIGINT, Σc² as 128-bit — daily sums square past int64 at
    warehouse scale); mean/σ/bands are one shared-literal double chain
    (population variance via (Σc² − S²/n)/n, clamped ≥0 against
    last-ulp negatives before SQRT).

    Scale: facts collapse to the one-row-per-day frame FIRST; the only
    window runs over that calendar-bounded frame (waived), with a
    constant 20-day RANGE frame — state per partition is O(window), not
    O(history)."""
    orders = load_table(spark, sf_dir, "orders")
    d = (
        orders.select(
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lit(_EPOCH).cast("date"),
            ).alias("day_idx"),
            F.col("o_orderdate").cast("date").alias("day"),
            F.floor(
                F.col("o_totalprice").cast("double") * 100 + F.lit(0.5)
            )
            .cast("long")
            .alias("c"),
        )
        .groupBy("day_idx", "day")
        .agg(F.sum("c").cast("long").alias("cents"))
    )
    win = (
        Window.orderBy("day_idx")
        .rangeBetween(-(BOLL_DAYS - 1), Window.currentRow)
    )
    w = d.select(
        "day",
        "cents",
        F.sum("cents").over(win).cast("long").alias("s"),
        F.count(F.lit(1)).over(win).cast("long").alias("n"),
        F.sum(
            F.col("cents").cast("decimal(38,0)")
            * F.col("cents").cast("decimal(38,0)")
        )
        .over(win)
        .cast("decimal(38,0)")
        .alias("s2"),
    )
    rev = F.col("cents").cast("double") / 100.0
    e = _boll_exprs("DIV")
    return w.select(
        "day",
        rev.alias("revenue"),
        F.col("n").alias("n_window"),
        F.expr(e["mean"]).alias("sma"),
        F.expr(e["up"]).alias("upper_band"),
        F.expr(e["lo"]).alias("lower_band"),
        (
            (rev > F.expr(e["up"])) | (rev < F.expr(e["lo"]))
        ).alias("breach"),
    )
