"""Concentration / inequality / experimentation pack (SURVEY.md §2.6
E82–E86).

The reference reports raw per-user counts (sree-etl-tdk-glue-job.py:55-60)
and stops; the analytical layer a revenue/traffic engine needs on top of
those counts is *distributional*: which sellers concentrate the revenue
(Pareto/ABC, concentration ratios), how unequal user activity is (Gini),
whether an experiment moved conversion (two-proportion z-test), and how
self-correlated the traffic series is (lag-1 autocorrelation).

Exactness strategy (operators/numeric.py): every statistic here reduces
to integer sums (counts, ranks, fixed-point money) combined by a FIXED
tree of IEEE double operations at the very end — so Spark and DuckDB
produce identical bits at any parallelism; no libm (no log/exp), no
order-dependent float accumulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import default_parallelism
from ..sources.tables import load_table
from .numeric import SCALE
from .registry import query, scoped_persist
from .relational import _global_ranks


# --------------------------------------------------------------------------
# E82: Pareto / ABC classification (cumulative-share banding)
# --------------------------------------------------------------------------


@query(
    "pareto_abc_brands",
    oracle=f"""
        WITH b AS (
          SELECT p.p_brand,
                 CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount)
                        * {SCALE} + 0.5) AS BIGINT)) AS BIGINT) AS sc
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
          GROUP BY p.p_brand
        ),
        w AS (
          SELECT p_brand, sc,
                 CAST(SUM(sc) OVER (
                   ORDER BY sc DESC, p_brand
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS BIGINT) AS cum,
                 CAST(SUM(sc) OVER () AS BIGINT) AS total
          FROM b
        )
        SELECT p_brand,
               CAST(sc AS DOUBLE) / {SCALE} AS revenue,
               CAST(cum AS DOUBLE) / total  AS cum_share,
               CASE WHEN cum * 100 <= total * 80 THEN 'A'
                    WHEN cum * 100 <= total * 95 THEN 'B'
                    ELSE 'C' END AS abc_class
        FROM w
    """,
)
def pareto_abc_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E82: ABC (Pareto) inventory classification — brands ranked by
    revenue; the cumulative-share band assigns class A to the head that
    carries 80% of revenue, B to the next 15%, C to the tail. The class
    boundary test runs in the *scaled-integer* domain
    (cum·100 ≤ total·80), so banding is exact — no float threshold can
    flip a brand between engines.

    Scale: the fact table collapses to one row per brand before any
    window; the cumulative window is global but over the |brands| frame
    (bounded vocabulary, 25 here — the GLOBAL_WINDOW_OK waiver documents
    this), and the revenue join is a fact→dimension equi-join AQE sizes.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    sc_row = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * SCALE
        + F.lit(0.5)
    ).cast("long")
    b = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(F.sum(sc_row).alias("sc"))
    )
    wcum = Window.orderBy(F.desc("sc"), F.asc("p_brand")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wtot = Window.partitionBy()
    w = b.select(
        "p_brand",
        "sc",
        F.sum("sc").over(wcum).alias("cum"),
        F.sum("sc").over(wtot).alias("total"),
    )
    return w.select(
        "p_brand",
        (F.col("sc").cast("double") / SCALE).alias("revenue"),
        (F.col("cum").cast("double") / F.col("total")).alias("cum_share"),
        F.when(F.col("cum") * 100 <= F.col("total") * 80, "A")
        .when(F.col("cum") * 100 <= F.col("total") * 95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )


# --------------------------------------------------------------------------
# E83: concentration ratios (CR1 / CR4) per market
# --------------------------------------------------------------------------


@query(
    "region_revenue_concentration",
    oracle=f"""
        WITH nat AS (
          SELECT r.r_name, n.n_name,
                 CAST(SUM(CAST(FLOOR(o.o_totalprice * {SCALE} + 0.5)
                        AS BIGINT)) AS BIGINT) AS sc
          FROM orders o
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n   ON c.c_nationkey = n.n_nationkey
          JOIN region r   ON n.n_regionkey = r.r_regionkey
          GROUP BY r.r_name, n.n_name
        ),
        rk AS (
          SELECT r_name, sc,
                 row_number() OVER (
                   PARTITION BY r_name ORDER BY sc DESC, n_name) AS rnk
          FROM nat
        )
        SELECT r_name,
               count(*) AS n_nations,
               CAST(SUM(CASE WHEN rnk = 1 THEN sc ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(sc) AS BIGINT) AS top1_share,
               CAST(SUM(CASE WHEN rnk <= 4 THEN sc ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(sc) AS BIGINT) AS top4_share
        FROM rk GROUP BY r_name
    """,
)
def region_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E83: market-concentration ratios — the share of each region's
    order revenue carried by its largest (CR1) and four largest (CR4)
    nations. The antitrust-style alternative to HHI that needs no
    squared shares: sums of fixed-point BIGINTs and ONE double division
    per output column keep it engine-exact (an HHI's per-share float
    squares would accumulate in engine-dependent order).

    Scale: facts collapse to the |nations| frame first (25 rows); the
    ranking window partitions by region over ≤|nations-per-region| rows;
    dimension joins broadcast. Ties in nation revenue break on n_name —
    deterministic in both engines."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    sc_row = F.floor(F.col("o_totalprice") * SCALE + F.lit(0.5)).cast("long")
    nat = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum(sc_row).alias("sc"))
    )
    wrk = Window.partitionBy("r_name").orderBy(F.desc("sc"), F.asc("n_name"))
    rk = nat.select(
        "r_name", "sc", F.row_number().over(wrk).alias("rnk")
    )
    return rk.groupBy("r_name").agg(
        F.count(F.lit(1)).alias("n_nations"),
        (
            F.sum(F.when(F.col("rnk") == 1, F.col("sc")).otherwise(0)).cast(
                "double"
            )
            / F.sum("sc")
        ).alias("top1_share"),
        (
            F.sum(F.when(F.col("rnk") <= 4, F.col("sc")).otherwise(0)).cast(
                "double"
            )
            / F.sum("sc")
        ).alias("top4_share"),
    )


# --------------------------------------------------------------------------
# E84: Gini coefficient of user activity (distributed, no single-task sort)
# --------------------------------------------------------------------------


@query(
    "user_activity_gini",
    oracle="""
        WITH c AS (
          SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
        ),
        r AS (
          SELECT cnt,
                 CAST(row_number() OVER (ORDER BY cnt) AS BIGINT) AS rk
          FROM c
        ),
        s AS (
          SELECT CAST(count(*) AS BIGINT)       AS n_users,
                 CAST(sum(cnt) AS BIGINT)       AS total_events,
                 CAST(sum(rk * cnt) AS BIGINT)  AS a
          FROM r
        )
        SELECT n_users, total_events,
               CAST(2 * a - (n_users + 1) * total_events AS DOUBLE)
                 / (n_users * total_events) AS gini
        FROM s
    """,
)
def user_activity_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E84: Gini coefficient of per-user event counts — the standard
    inequality summary ("how bot-heavy / whale-heavy is this traffic?").
    Uses the rank formulation G = (2·Σi·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) over
    ascending-sorted counts: every term is an exact BIGINT, one final
    double division — engine-exact. Tie order among equal counts cannot
    change Σi·xᵢ (swapping ranks between equal values is a no-op), so
    the arbitrary tie-break inside the sort is harmless.

    Scale: the global ordering does NOT use a single-task sort — it
    rides the shared ``_global_ranks`` distributed selection
    (range-repartition → 32 parallel local sorts → P-row prefix-summed
    offsets, the same machinery as the exact-quantile queries). The
    1-row n_total frame joins back via broadcast."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt")).select(
        "cnt"
    )
    ranked, n_total = _global_ranks(counts, "cnt")
    s = ranked.agg(
        F.sum((F.col("grank") + 1) * F.col("v")).alias("a"),
        F.sum("v").alias("total_events"),
    ).crossJoin(F.broadcast(n_total))
    return s.select(
        F.col("n").alias("n_users"),
        F.col("total_events"),
        (
            (2 * F.col("a") - (F.col("n") + 1) * F.col("total_events")).cast(
                "double"
            )
            / (F.col("n") * F.col("total_events"))
        ).alias("gini"),
    )


# --------------------------------------------------------------------------
# E85: two-proportion z-test (A/B conversion experiment readout)
# --------------------------------------------------------------------------


@query(
    "ab_conversion_ztest",
    oracle="""
        WITH per_user AS (
          SELECT user_id,
                 max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS conv
          FROM events GROUP BY user_id
        ),
        coh AS (
          SELECT CAST(count(*) FILTER (WHERE user_id % 2 = 0) AS BIGINT)
                   AS n_a,
                 CAST(sum(conv) FILTER (WHERE user_id % 2 = 0) AS BIGINT)
                   AS conv_a,
                 CAST(count(*) FILTER (WHERE user_id % 2 = 1) AS BIGINT)
                   AS n_b,
                 CAST(sum(conv) FILTER (WHERE user_id % 2 = 1) AS BIGINT)
                   AS conv_b
          FROM per_user
        )
        SELECT n_a, conv_a, n_b, conv_b,
               CAST(conv_a AS DOUBLE) / n_a AS p_a,
               CAST(conv_b AS DOUBLE) / n_b AS p_b,
               (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
             * (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
             / NULLIF(
                 (CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
               * (1 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
               * (1.0 / n_a + 1.0 / n_b), 0.0) AS z2
        FROM coh
    """,
)
def ab_conversion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E85: two-proportion z-test between two deterministic cohorts
    (user_id parity stands in for the experiment assignment hash): did
    cohort A convert (≥1 purchase) at a different rate than cohort B?
    Reports the squared z statistic (≡ the 1-df chi-square), built from
    the four exact BIGINTs (n_a, conv_a, n_b, conv_b) through a FIXED
    tree of IEEE double ops — identical bits in both engines; NULL when
    the pooled rate is degenerate (0 or 1) instead of a divide-by-zero.

    Scale: one per-user aggregate (map-side combinable max), then a
    4-number global reduce. Nothing wider than one row leaves the
    executors."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv")
    )
    is_a = F.col("user_id") % 2 == 0
    coh = per_user.agg(
        F.count(F.when(is_a, 1)).alias("n_a"),
        F.sum(F.when(is_a, F.col("conv"))).alias("conv_a"),
        F.count(F.when(~is_a, 1)).alias("n_b"),
        F.sum(F.when(~is_a, F.col("conv"))).alias("conv_b"),
    )
    p_a = F.col("conv_a").cast("double") / F.col("n_a")
    p_b = F.col("conv_b").cast("double") / F.col("n_b")
    pooled = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    denom = pooled * (1 - pooled) * (
        F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b")
    )
    return coh.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        p_a.alias("p_a"),
        p_b.alias("p_b"),
        ((p_a - p_b) * (p_a - p_b) / F.nullif(denom, F.lit(0.0))).alias("z2"),
    )


# --------------------------------------------------------------------------
# E86: lag-1 autocorrelation of the daily traffic series (rational r²)
# --------------------------------------------------------------------------


@query(
    "daily_counts_autocorr",
    oracle="""
        WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
          FROM events GROUP BY event_type, day
        ),
        pairs AS (
          SELECT event_type, cnt AS x,
                 lead(cnt) OVER (PARTITION BY event_type ORDER BY day) AS y,
                 lead(day) OVER (PARTITION BY event_type ORDER BY day)
                   AS next_day,
                 day
          FROM daily
        ),
        s AS (
          SELECT event_type,
                 CAST(count(*) AS BIGINT)    AS n,
                 CAST(sum(x) AS BIGINT)      AS sx,
                 CAST(sum(y) AS BIGINT)      AS sy,
                 CAST(sum(x * y) AS BIGINT)  AS sxy,
                 CAST(sum(x * x) AS BIGINT)  AS sxx,
                 CAST(sum(y * y) AS BIGINT)  AS syy
          FROM pairs WHERE next_day = day + 1
          GROUP BY event_type
        )
        SELECT event_type, n AS n_pairs,
               CAST(n * sxy - sx * sy AS DOUBLE)
             * CAST(n * sxy - sx * sy AS DOUBLE)
             / NULLIF(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE), 0.0) AS autocorr_r2
        FROM s
    """,
)
def daily_counts_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E86: lag-1 autocorrelation of each event type's daily-count
    series, reported as r² in its RATIONAL form
    (n·Σxy − Σx·Σy)² / ((n·Σx² − (Σx)²)(n·Σy² − (Σy)²)) — every moment
    is an exact BIGINT over consecutive-calendar-day pairs, and only the
    final squares/division run in double (fixed tree → engine-exact; a
    textbook corr() would sqrt and accumulate floats in engine order).
    High r² means today's traffic predicts tomorrow's — the signal a
    capacity planner wants from exactly these logs.

    Scale: facts collapse to |types| × |days| first; the lead() window
    and the moment reduce share the event_type partitioning. Gap days
    break pairs (next_day = day+1 filter) so holes in the series never
    fabricate correlation. Degenerate (constant) series yield NULL via
    NULLIF, not a divide error."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("event_type").orderBy("day")
    pairs = daily.select(
        "event_type",
        "day",
        F.col("cnt").alias("x"),
        F.lead("cnt").over(w).alias("y"),
        F.lead("day").over(w).alias("next_day"),
    ).where(F.col("next_day") == F.date_add("day", 1))
    s = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
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
    return s.select(
        "event_type",
        F.col("n").alias("n_pairs"),
        (num * num / F.nullif(dx * dy, F.lit(0.0))).alias("autocorr_r2"),
    )


# --------------------------------------------------------------------------
# E89: top-N + OTHER reporting rollup
# --------------------------------------------------------------------------


@query(
    "brand_revenue_top5_other",
    oracle=f"""
        WITH b AS (
          SELECT p.p_brand,
                 CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount)
                        * {SCALE} + 0.5) AS BIGINT)) AS BIGINT) AS sc
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
          GROUP BY p.p_brand
        ),
        rk AS (
          SELECT p_brand, sc,
                 row_number() OVER (ORDER BY sc DESC, p_brand) AS rnk
          FROM b
        )
        SELECT CASE WHEN rnk <= 5 THEN p_brand ELSE 'OTHER' END AS brand_group,
               CAST(SUM(sc) AS DOUBLE) / {SCALE} AS revenue,
               count(*) AS n_brands,
               CAST(min(rnk) AS BIGINT) AS best_rank
        FROM rk
        GROUP BY CASE WHEN rnk <= 5 THEN p_brand ELSE 'OTHER' END
    """,
)
def brand_revenue_top5_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E89: the universal reporting rollup — the top-5 brands by revenue
    named individually, everything else collapsed into one 'OTHER' row
    (so the report always has ≤6 rows and the shares still sum to 100%).
    Subtly NOT a top-k query: the tail is aggregated, not discarded, so
    a LIMIT/TakeOrderedAndProject alone cannot express it — it is a
    rank-then-regroup.

    Scale: facts collapse to the |brands| vocabulary frame before the
    ranking window (bounded, 25 rows — GLOBAL_WINDOW_OK waiver), and the
    regroup runs on the same frame. Revenue stays fixed-point BIGINT
    until the single final division; the (sc desc, brand) tie-break
    makes the top-5 cut deterministic in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    sc_row = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * SCALE
        + F.lit(0.5)
    ).cast("long")
    b = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(F.sum(sc_row).alias("sc"))
    )
    rk = b.select(
        "p_brand",
        "sc",
        F.row_number()
        .over(Window.orderBy(F.desc("sc"), F.asc("p_brand")))
        .alias("rnk"),
    )
    grouped = rk.select(
        F.when(F.col("rnk") <= 5, F.col("p_brand"))
        .otherwise("OTHER")
        .alias("brand_group"),
        "sc",
        "rnk",
    )
    return grouped.groupBy("brand_group").agg(
        (F.sum("sc").cast("double") / SCALE).alias("revenue"),
        F.count(F.lit(1)).alias("n_brands"),
        F.min("rnk").cast("long").alias("best_rank"),
    )


# --------------------------------------------------------------------------
# E91: per-key skew audit (the "find my hot keys" diagnostic)
# --------------------------------------------------------------------------


@query(
    "key_skew_audit",
    oracle="""
        WITH c AS (
          SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
          FROM events GROUP BY user_id
        ),
        q AS (
          SELECT quantile_cont(CAST(cnt AS DOUBLE), [0.5, 0.9, 0.99]) AS qs
          FROM c
        ),
        s AS (
          SELECT CAST(count(*) AS BIGINT) AS n_keys,
                 CAST(sum(cnt) AS BIGINT) AS total_rows,
                 CAST(max(cnt) AS BIGINT) AS max_rows
          FROM c
        )
        SELECT s.n_keys, s.total_rows, s.max_rows,
               q.qs[1] AS p50, q.qs[2] AS p90, q.qs[3] AS p99,
               CAST(s.max_rows AS DOUBLE) * s.n_keys / s.total_rows
                 AS imbalance
        FROM s, q
    """,
)
def key_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E91: the operational skew diagnostic — the per-key row-count
    distribution (p50/p90/p99/max) plus the imbalance ratio
    max/avg = max·n/total, the number that predicts whether a groupBy or
    join on this key needs salting (skew.salted_join) or AQE skew
    splitting BEFORE the job ever runs at scale. The reference has no
    notion of this; at 100 TB it is the first query run on any new key.

    Scale: facts collapse to the per-key count frame; the quantiles ride
    the shared ``_distributed_quantiles`` selection (range repartition +
    32 local sorts — never a single-task global percentile), and the two
    1-row frames (quantile array, count stats) broadcast-crossJoin into
    the single output row. The imbalance division is a fixed
    double-op tree over exact BIGINTs — engine-exact."""
    from .relational import _distributed_quantiles

    ev = load_table(spark, sf_dir, "events")
    # persisted: BOTH the quantile selection and the stats aggregate read
    # this frame — without it the events aggregate runs twice
    counts = scoped_persist(
        ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    )
    q = _distributed_quantiles(
        counts.select(F.col("cnt").cast("double").alias("cnt")),
        "cnt",
        [0.5, 0.9, 0.99],
    )
    s = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("total_rows"),
        F.max("cnt").alias("max_rows"),
    )
    return s.crossJoin(F.broadcast(q)).select(
        "n_keys",
        "total_rows",
        "max_rows",
        F.element_at("qs", 1).alias("p50"),
        F.element_at("qs", 2).alias("p90"),
        F.element_at("qs", 3).alias("p99"),
        (
            F.col("max_rows").cast("double")
            * F.col("n_keys")
            / F.col("total_rows")
        ).alias("imbalance"),
    )


# --------------------------------------------------------------------------
# E92: whale share (revenue share of the top 1% of customers)
# --------------------------------------------------------------------------


@query(
    "whale_revenue_share",
    oracle=f"""
        WITH c AS (
          SELECT o_custkey,
                 CAST(SUM(CAST(FLOOR(o_totalprice * {SCALE} + 0.5)
                        AS BIGINT)) AS BIGINT) AS sc
          FROM orders GROUP BY o_custkey
        ),
        r AS (
          SELECT sc, CAST(row_number() OVER (ORDER BY sc) - 1 AS BIGINT)
                   AS grank
          FROM c
        ),
        n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c),
        s AS (
          SELECT n.n AS n_customers,
                 GREATEST(1, CAST(CEIL(n.n / 100.0) AS BIGINT)) AS k,
                 CAST(sum(r.sc) AS BIGINT) AS total,
                 CAST(sum(CASE WHEN r.grank >=
                     n.n - GREATEST(1, CAST(CEIL(n.n / 100.0) AS BIGINT))
                   THEN r.sc ELSE 0 END) AS BIGINT) AS top_sum
          FROM r, n GROUP BY n.n
        )
        SELECT n_customers, k AS top1pct_n,
               CAST(total AS DOUBLE) / {SCALE} AS total_revenue,
               CAST(top_sum AS DOUBLE) / total AS top1pct_share
        FROM s
    """,
)
def whale_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E92: the whale metric — what fraction of total order revenue the
    top 1% of customers carry (k = max(1, ⌈n/100⌉)). The concentration
    complement to the Gini coefficient: one number, directly actionable
    ("how exposed is revenue to a handful of accounts?").

    The top-k cut CANNOT be a TakeOrderedAndProject: k is data-dependent
    (1% of a count known only at runtime), and LIMIT takes literals — so
    the cut is a rank threshold over the shared ``_global_ranks``
    distributed selection (grank ≥ n−k), with n and k riding broadcast
    1-row frames. Ties at the boundary pick arbitrary rows among EQUAL
    revenues — the share is invariant to that choice. All sums are
    fixed-point BIGINTs; two final double divisions."""
    orders = load_table(spark, sf_dir, "orders")
    sc_row = F.floor(F.col("o_totalprice") * SCALE + F.lit(0.5)).cast("long")
    c = orders.groupBy("o_custkey").agg(F.sum(sc_row).alias("sc")).select("sc")
    ranked, n_total = _global_ranks(c, "sc")
    k = F.greatest(
        F.lit(1).cast("long"),
        F.ceil(F.col("n") / F.lit(100.0)).cast("long"),
    )
    s = (
        ranked.crossJoin(F.broadcast(n_total))
        .select("v", "grank", "n", k.alias("k"))
        .groupBy("n", "k")
        .agg(
            F.sum("v").alias("total"),
            F.sum(
                F.when(F.col("grank") >= F.col("n") - F.col("k"), F.col("v"))
                .otherwise(0)
            ).alias("top_sum"),
        )
    )
    return s.select(
        F.col("n").alias("n_customers"),
        F.col("k").alias("top1pct_n"),
        (F.col("total").cast("double") / SCALE).alias("total_revenue"),
        (F.col("top_sum").cast("double") / F.col("total")).alias(
            "top1pct_share"
        ),
    )


# --------------------------------------------------------------------------
# E93: rank-movement report (market-share movers month over month)
# --------------------------------------------------------------------------


@query(
    "brand_rank_delta_month",
    oracle=f"""
        WITH m AS (
          SELECT CAST(date_trunc('month', l.l_shipdate) AS DATE) AS month,
                 p.p_brand,
                 CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount)
                        * {SCALE} + 0.5) AS BIGINT)) AS BIGINT) AS sc
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
          GROUP BY month, p.p_brand
        ),
        rk AS (
          SELECT month, p_brand,
                 CAST(row_number() OVER (
                   PARTITION BY month ORDER BY sc DESC, p_brand
                 ) AS BIGINT) AS rnk
          FROM m
        )
        SELECT month, p_brand, rnk,
               lag(rnk) OVER (PARTITION BY p_brand ORDER BY month)
                 AS prev_rank,
               lag(rnk) OVER (PARTITION BY p_brand ORDER BY month) - rnk
                 AS rank_delta
        FROM rk
    """,
)
def brand_rank_delta_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E93: month-over-month revenue-rank movement per brand — the
    "biggest movers" report (positive delta = climbed the league table).
    Rank deltas need TWO window orientations — rank WITHIN each month,
    then lag ALONG each brand's month series — which is why no single
    window or group-by expresses it.

    Scale: facts collapse to the |months|×|brands| frame first (~2,100
    rows at any SF); both windows run on that collapsed frame with
    bounded partitions (≤|brands| rows per month, ≤|months| rows per
    brand). The lag is over the brand's PRESENT months (a brand absent
    one month compares to its last ranked month — mirrored exactly in
    the oracle). Ranks tie-break on brand name — deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    sc_row = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * SCALE
        + F.lit(0.5)
    ).cast("long")
    m = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(
            F.date_trunc("month", "l_shipdate").cast("date").alias("month"),
            "p_brand",
        )
        .agg(F.sum(sc_row).alias("sc"))
    )
    wrank = Window.partitionBy("month").orderBy(F.desc("sc"), F.asc("p_brand"))
    rk = m.select(
        "month",
        "p_brand",
        F.row_number().over(wrank).cast("long").alias("rnk"),
    )
    wlag = Window.partitionBy("p_brand").orderBy("month")
    prev = F.lag("rnk").over(wlag)
    return rk.select(
        "month",
        "p_brand",
        "rnk",
        prev.alias("prev_rank"),
        (prev - F.col("rnk")).alias("rank_delta"),
    )


# --------------------------------------------------------------------------
# E99: segment-migration matrix (RFM-tier transitions between periods)
# --------------------------------------------------------------------------

#: Period pivot for the two spend snapshots (orders span 1995-2001 in
#: the fixtures; planted tests control their own dates).
SEGMENT_PIVOT = "1998-07-01"


@query(
    "segment_migration_matrix",
    oracle=f"""
        WITH spend AS (
          SELECT o_custkey,
                 CAST(o_orderdate AS DATE) < DATE '{SEGMENT_PIVOT}'
                   AS is_p1,
                 CAST(SUM(CAST(FLOOR(o_totalprice * {{scale}} + 0.5)
                        AS BIGINT)) AS BIGINT) AS sc
          FROM orders
          GROUP BY o_custkey, CAST(o_orderdate AS DATE) < DATE '{SEGMENT_PIVOT}'
        ),
        tiled AS (
          SELECT o_custkey, is_p1,
                 ntile(4) OVER (PARTITION BY is_p1 ORDER BY sc, o_custkey)
                   AS tile
          FROM spend
        ),
        p1 AS (SELECT o_custkey, tile FROM tiled WHERE is_p1),
        p2 AS (SELECT o_custkey, tile FROM tiled WHERE NOT is_p1)
        SELECT coalesce('T' || CAST(p1.tile AS VARCHAR), 'none')
                 AS seg_from,
               coalesce('T' || CAST(p2.tile AS VARCHAR), 'none')
                 AS seg_to,
               count(*) AS n_customers
        FROM p1 FULL OUTER JOIN p2 ON p1.o_custkey = p2.o_custkey
        GROUP BY 1, 2
    """.replace("{scale}", str(SCALE)),
)
def segment_migration_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E99: customer segment-migration matrix — spend quartile (T1 low …
    T4 high) in the period before SEGMENT_PIVOT crossed with the
    quartile after it, plus 'none' rows for customers active in only
    one period. The classification-transition report behind "are our
    top-tier customers downgrading?" — a cross-tab of two
    INDEPENDENTLY-computed rankings, which no single window expresses.

    ntile ties are broken by (spend, custkey) — a UNIQUE order, so tile
    assignment is deterministic in both engines (ntile on a non-unique
    order would be an engine-dependent coin flip at the boundaries).

    Scale: orders collapse to ≤2 rows per customer; the quartile
    windows run over the per-customer aggregate partitioned by period
    (the ntile_customer_quartiles waiver argument), and the full-outer
    self-alignment joins on the customer key. Output is a ≤5×5 grid."""
    orders = load_table(spark, sf_dir, "orders")
    sc_row = F.floor(F.col("o_totalprice") * SCALE + F.lit(0.5)).cast("long")
    spend = orders.groupBy(
        "o_custkey",
        (
            F.col("o_orderdate").cast("date")
            < F.to_date(F.lit(SEGMENT_PIVOT))
        ).alias("is_p1"),
    ).agg(F.sum(sc_row).alias("sc"))
    w = Window.partitionBy("is_p1").orderBy("sc", "o_custkey")
    tiled = spend.select(
        "o_custkey", "is_p1", F.ntile(4).over(w).alias("tile")
    )
    p1 = tiled.where(F.col("is_p1")).select(
        F.col("o_custkey").alias("k1"), F.col("tile").alias("t1")
    )
    p2 = tiled.where(~F.col("is_p1")).select(
        F.col("o_custkey").alias("k2"), F.col("tile").alias("t2")
    )
    joined = p1.join(p2, p1.k1 == p2.k2, "full_outer")
    return joined.groupBy(
        F.coalesce(
            F.concat(F.lit("T"), F.col("t1").cast("string")), F.lit("none")
        ).alias("seg_from"),
        F.coalesce(
            F.concat(F.lit("T"), F.col("t2").cast("string")), F.lit("none")
        ).alias("seg_to"),
    ).agg(F.count(F.lit(1)).alias("n_customers"))


# --------------------------------------------------------------------------
# E128: difference-in-differences estimator (quasi-experimental uplift)
# --------------------------------------------------------------------------

DID_PIVOT = "2024-01-16"  # pre/post split over the fixtures' event month


@query(
    "did_value_uplift",
    oracle=f"""
        WITH cells AS (
          SELECT (user_id % 2 = 0) AS treated,
                 (CAST(ts AS DATE) >= DATE '{DID_PIVOT}') AS post,
                 CAST(SUM(CAST(FLOOR(value * {SCALE} + 0.5) AS BIGINT))
                   AS BIGINT) AS sc,
                 COUNT(*) AS n
          FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
          GROUP BY 1, 2
        ),
        wide AS (
          SELECT
            MAX(CASE WHEN treated AND post THEN sc END) AS s_tp,
            MAX(CASE WHEN treated AND post THEN n END) AS n_tp,
            MAX(CASE WHEN treated AND NOT post THEN sc END) AS s_tb,
            MAX(CASE WHEN treated AND NOT post THEN n END) AS n_tb,
            MAX(CASE WHEN NOT treated AND post THEN sc END) AS s_cp,
            MAX(CASE WHEN NOT treated AND post THEN n END) AS n_cp,
            MAX(CASE WHEN NOT treated AND NOT post THEN sc END) AS s_cb,
            MAX(CASE WHEN NOT treated AND NOT post THEN n END) AS n_cb
          FROM cells
        )
        SELECT CAST(n_tp AS BIGINT) AS n_treat_post,
               CAST(n_tb AS BIGINT) AS n_treat_pre,
               CAST(n_cp AS BIGINT) AS n_ctrl_post,
               CAST(n_cb AS BIGINT) AS n_ctrl_pre,
               CAST(s_tp AS DOUBLE) / {SCALE} / n_tp AS mean_treat_post,
               CAST(s_tb AS DOUBLE) / {SCALE} / n_tb AS mean_treat_pre,
               CAST(s_cp AS DOUBLE) / {SCALE} / n_cp AS mean_ctrl_post,
               CAST(s_cb AS DOUBLE) / {SCALE} / n_cb AS mean_ctrl_pre,
               (CAST(s_tp AS DOUBLE) / {SCALE} / n_tp
                  - CAST(s_tb AS DOUBLE) / {SCALE} / n_tb)
             - (CAST(s_cp AS DOUBLE) / {SCALE} / n_cp
                  - CAST(s_cb AS DOUBLE) / {SCALE} / n_cb) AS did
        FROM wide
    """,
)
def did_value_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E128: difference-in-differences — the quasi-experimental uplift
    estimate (Card & Krueger '94 design): (treated post−pre) −
    (control post−pre) cancels both the level difference between the
    groups and the common time shock, which a naive post-only A/B
    comparison confounds. Treatment = even user_id (the same synthetic
    assignment convention as ab_conversion_ztest); pre/post splits at
    DID_PIVOT.

    Scale: ONE map-side-combinable aggregate to the 2×2 cell grid; the
    estimator is pure cell arithmetic on a 1-row frame. Exactness:
    scaled-BIGINT cell sums, then a FIXED tree of correctly-rounded
    divides/subtracts — hash-gated."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    sc = F.floor(F.col("value") * SCALE + F.lit(0.5)).cast("long")
    treated = F.col("user_id") % 2 == 0
    post = F.to_date("ts") >= F.lit(DID_PIVOT).cast("date")

    def cell(tp, pp, agg):
        cond = (treated == F.lit(tp)) & (post == F.lit(pp))
        return F.sum(F.when(cond, agg))

    wide = ev.agg(
        cell(True, True, sc).alias("s_tp"),
        cell(True, True, F.lit(1)).alias("n_tp"),
        cell(True, False, sc).alias("s_tb"),
        cell(True, False, F.lit(1)).alias("n_tb"),
        cell(False, True, sc).alias("s_cp"),
        cell(False, True, F.lit(1)).alias("n_cp"),
        cell(False, False, sc).alias("s_cb"),
        cell(False, False, F.lit(1)).alias("n_cb"),
    )
    m = lambda s, n: F.col(s).cast("double") / SCALE / F.col(n)  # noqa: E731
    return wide.select(
        F.col("n_tp").alias("n_treat_post"),
        F.col("n_tb").alias("n_treat_pre"),
        F.col("n_cp").alias("n_ctrl_post"),
        F.col("n_cb").alias("n_ctrl_pre"),
        m("s_tp", "n_tp").alias("mean_treat_post"),
        m("s_tb", "n_tb").alias("mean_treat_pre"),
        m("s_cp", "n_cp").alias("mean_ctrl_post"),
        m("s_cb", "n_cb").alias("mean_ctrl_pre"),
        (
            (m("s_tp", "n_tp") - m("s_tb", "n_tb"))
            - (m("s_cp", "n_cp") - m("s_cb", "n_cb"))
        ).alias("did"),
    )


# --------------------------------------------------------------------------
# E134: Mann-Whitney U rank-sum test (nonparametric cohort comparison)
# --------------------------------------------------------------------------

_MWU_Z_SQL = (
    "CAST(u_a_x2 - n_a * n_b AS DOUBLE) / (2.0 * SQRT("
    "(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0) * ("
    "CAST(n_a + n_b + 1 AS DOUBLE) - CAST(tie_term AS DOUBLE) / "
    "(CAST(n_a + n_b AS DOUBLE) * CAST(n_a + n_b - 1 AS DOUBLE)))))"
)


@query(
    "mannwhitney_value_by_cohort",
    oracle=f"""
        WITH vals AS (
          SELECT value AS v,
                 CAST(COUNT(*) FILTER (WHERE user_id % 2 = 0) AS BIGINT)
                   AS c_a,
                 CAST(COUNT(*) FILTER (WHERE user_id % 2 = 1) AS BIGINT)
                   AS c_b
          FROM events WHERE value IS NOT NULL
          GROUP BY value
        ), ranked AS (
          SELECT c_a, c_b, c_a + c_b AS t,
                 1 + COALESCE(SUM(c_a + c_b) OVER (
                   ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS rank_min
          FROM vals
        ), agg AS (
          SELECT CAST(SUM(c_a) AS BIGINT) AS n_a,
                 CAST(SUM(c_b) AS BIGINT) AS n_b,
                 CAST(SUM(c_a * (2 * rank_min + t - 1)) AS BIGINT)
                   AS rank_sum_a_x2,
                 CAST(SUM(t * t * t - t) AS BIGINT) AS tie_term
          FROM ranked
        )
        SELECT n_a, n_b, rank_sum_a_x2, tie_term,
               rank_sum_a_x2 - n_a * (n_a + 1) AS u_a_x2,
               {_MWU_Z_SQL} AS z
        FROM (SELECT *, rank_sum_a_x2 - n_a * (n_a + 1) AS u_a_x2 FROM agg)
    """,
)
def mannwhitney_value_by_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E134: Mann-Whitney U rank-sum test between the two deterministic
    user-parity cohorts over event `value` — the nonparametric companion
    to E85's proportion z-test: it compares whole DISTRIBUTIONS, is
    outlier-immune (a whale's 1e9 value moves a t-test arbitrarily, a
    rank test by one rank), and needs no normality assumption. Average
    ranks for ties and the standard tie-corrected normal approximation
    (Lehmann, "Nonparametrics", eq. 1.29).

    Exactness: everything up to z is BIGINT — events collapse to one row
    per DISTINCT value with per-cohort counts (each row IS a tie group,
    so 2·avg_rank = 2·rank_min + t − 1 stays integral), rank sums and the
    Σ(t³−t) tie term are exact integer sums, and z is ONE fixed chain of
    IEEE double ops rendered from a literal shared with the oracle.

    Scale: the only window runs over the value-collapsed frame, which is
    bounded by the VALUE DOMAIN (2-decimal readings in a fixed range —
    ≤ ~100k rows at ANY corpus size), not by event volume; the collapse
    itself is one map-side-combinable aggregate. At extreme tie counts
    (t³ near BIGINT) the same algebra runs in DECIMAL(38,0)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    is_a = F.col("user_id") % 2 == 0
    vals = ev.groupBy(F.col("value").alias("v")).agg(
        F.count(F.when(is_a, 1)).alias("c_a"),
        F.count(F.when(~is_a, 1)).alias("c_b"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = vals.select(
        "c_a",
        "c_b",
        (F.col("c_a") + F.col("c_b")).alias("t"),
        (
            F.lit(1)
            + F.coalesce(
                F.sum(F.col("c_a") + F.col("c_b")).over(w), F.lit(0)
            )
        ).alias("rank_min"),
    )
    agg = ranked.agg(
        F.sum("c_a").alias("n_a"),
        F.sum("c_b").alias("n_b"),
        F.sum(
            F.col("c_a") * (2 * F.col("rank_min") + F.col("t") - 1)
        ).alias("rank_sum_a_x2"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias(
            "tie_term"
        ),
    )
    return agg.withColumn(
        "u_a_x2",
        F.col("rank_sum_a_x2") - F.col("n_a") * (F.col("n_a") + 1),
    ).select(
        "n_a",
        "n_b",
        "rank_sum_a_x2",
        "tie_term",
        "u_a_x2",
        F.expr(_MWU_Z_SQL).alias("z"),
    )


# --------------------------------------------------------------------------
# E140: CUPED variance-reduced experiment readout
# --------------------------------------------------------------------------

#: Money scale for per-user value sums: 2-dp readings make ×100 exact.
_CUPED_SCALE = 100


@query(
    "cuped_adjusted_uplift",
    oracle=f"""
        WITH bounds AS (
          SELECT CAST(MIN(ts) AS DATE)
                 + CAST(date_diff('day', CAST(MIN(ts) AS DATE),
                                  CAST(MAX(ts) AS DATE)) // 2 AS INTEGER)
                   AS mid
          FROM events
        ), per_user AS (
          SELECT e.user_id, e.user_id % 2 = 0 AS is_a,
                 CAST(COALESCE(SUM(CAST(FLOOR(e.value * {_CUPED_SCALE} + 0.5)
                        AS BIGINT)) FILTER (WHERE CAST(e.ts AS DATE) < b.mid),
                      0) AS BIGINT) AS sx,
                 CAST(COALESCE(SUM(CAST(FLOOR(e.value * {_CUPED_SCALE} + 0.5)
                        AS BIGINT)) FILTER (WHERE CAST(e.ts AS DATE) >= b.mid),
                      0) AS BIGINT) AS sy
          FROM events e CROSS JOIN bounds b
          WHERE e.value IS NOT NULL
          GROUP BY e.user_id
        ), g AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CAST(sx AS HUGEINT)) AS sum_x,
                 SUM(CAST(sy AS HUGEINT)) AS sum_y,
                 SUM(CAST(sx AS HUGEINT) * sy) AS sum_xy,
                 SUM(CAST(sx AS HUGEINT) * sx) AS sum_xx,
                 SUM(CAST(sy AS HUGEINT) * sy) AS sum_yy,
                 CAST(COUNT(*) FILTER (WHERE is_a) AS BIGINT) AS n_a,
                 CAST(COUNT(*) FILTER (WHERE NOT is_a) AS BIGINT) AS n_b,
                 COALESCE(SUM(CAST(sy AS HUGEINT)) FILTER (WHERE is_a), 0)
                   AS sum_y_a,
                 COALESCE(SUM(CAST(sy AS HUGEINT)) FILTER (WHERE NOT is_a), 0)
                   AS sum_y_b,
                 COALESCE(SUM(CAST(sx AS HUGEINT)) FILTER (WHERE is_a), 0)
                   AS sum_x_a,
                 COALESCE(SUM(CAST(sx AS HUGEINT)) FILTER (WHERE NOT is_a), 0)
                   AS sum_x_b
          FROM per_user
        )
        SELECT n_a, n_b,
               CAST(n * sum_xy - sum_x * sum_y AS DOUBLE)
                 / NULLIF(CAST(n * sum_xx - sum_x * sum_x AS DOUBLE), 0.0)
                 AS theta,
               (CAST(n * sum_xy - sum_x * sum_y AS DOUBLE)
                  * CAST(n * sum_xy - sum_x * sum_y AS DOUBLE))
                 / NULLIF(CAST(n * sum_xx - sum_x * sum_x AS DOUBLE)
                          * CAST(n * sum_yy - sum_y * sum_y AS DOUBLE), 0.0)
                 AS rho2,
               (CAST(sum_y_a AS DOUBLE) / {_CUPED_SCALE}) / n_a
                 - (CAST(sum_y_b AS DOUBLE) / {_CUPED_SCALE}) / n_b
                 AS raw_diff,
               ((CAST(sum_y_a AS DOUBLE) / {_CUPED_SCALE}) / n_a
                 - (CAST(sum_y_b AS DOUBLE) / {_CUPED_SCALE}) / n_b)
               - (CAST(n * sum_xy - sum_x * sum_y AS DOUBLE)
                  / NULLIF(CAST(n * sum_xx - sum_x * sum_x AS DOUBLE), 0.0))
                 * ((CAST(sum_x_a AS DOUBLE) / {_CUPED_SCALE}) / n_a
                    - (CAST(sum_x_b AS DOUBLE) / {_CUPED_SCALE}) / n_b)
                 AS adjusted_diff
        FROM g
    """,
)
def cuped_adjusted_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E140: CUPED (Deng et al., WSDM'13) — variance-reduced experiment
    readout: each user's post-period value Y is adjusted by their OWN
    pre-period value X via Y' = Y − θ(X − X̄), θ = cov(X,Y)/var(X).
    Pre-existing whale/cohort imbalance (which the raw diff E85-style
    readout confounds with the treatment) cancels; ρ² reports the
    fraction of variance removed. The pre/post split is the data-driven
    calendar midpoint, so the query is SF-portable.

    Exactness: per-user X/Y are exact ×100-scaled BIGINTs (2-dp money);
    the five cross-moments accumulate in 128-bit integers (HUGEINT /
    DECIMAL(38,0) — Σx² at sf1 overflows a 64-bit long, and a double
    accumulation would be order-dependent), and θ, ρ², and both diffs
    are fixed IEEE chains over those exact integers, NULL-guarded for
    the degenerate var=0 cases.

    Scale: one fact pass → per-user frame (map-side combinable sums),
    one 12-number global reduce, a 1-row bounds broadcast. Nothing
    wider than a row ever reaches the driver."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    bounds = ev.agg(
        F.date_add(
            F.min("ts").cast("date"),
            (F.datediff(F.max("ts").cast("date"), F.min("ts").cast("date"))
             / 2).cast("int"),
        ).alias("mid")
    )
    sv = F.floor(F.col("value") * _CUPED_SCALE + F.lit(0.5)).cast("long")
    per_user = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.first(F.col("user_id") % 2 == 0).alias("is_a"),
            F.coalesce(
                F.sum(F.when(F.col("ts").cast("date") < F.col("mid"), sv)),
                F.lit(0),
            ).alias("sx"),
            F.coalesce(
                F.sum(F.when(F.col("ts").cast("date") >= F.col("mid"), sv)),
                F.lit(0),
            ).alias("sy"),
        )
    )
    dx = F.col("sx").cast("decimal(38,0)")
    dy = F.col("sy").cast("decimal(38,0)")
    g = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dx).alias("sum_x"),
        F.sum(dy).alias("sum_y"),
        F.sum(dx * F.col("sy")).alias("sum_xy"),
        F.sum(dx * F.col("sx")).alias("sum_xx"),
        F.sum(dy * F.col("sy")).alias("sum_yy"),
        F.count(F.when(F.col("is_a"), 1)).alias("n_a"),
        F.count(F.when(~F.col("is_a"), 1)).alias("n_b"),
        F.coalesce(F.sum(F.when(F.col("is_a"), dy)), F.lit(0)).alias("sum_y_a"),
        F.coalesce(F.sum(F.when(~F.col("is_a"), dy)), F.lit(0)).alias("sum_y_b"),
        F.coalesce(F.sum(F.when(F.col("is_a"), dx)), F.lit(0)).alias("sum_x_a"),
        F.coalesce(F.sum(F.when(~F.col("is_a"), dx)), F.lit(0)).alias("sum_x_b"),
    )
    covn = (F.col("n") * F.col("sum_xy") - F.col("sum_x") * F.col("sum_y")).cast(
        "double"
    )
    varxn = (F.col("n") * F.col("sum_xx") - F.col("sum_x") * F.col("sum_x")).cast(
        "double"
    )
    varyn = (F.col("n") * F.col("sum_yy") - F.col("sum_y") * F.col("sum_y")).cast(
        "double"
    )
    theta = covn / F.nullif(varxn, F.lit(0.0))
    mean = lambda s, n: (F.col(s).cast("double") / _CUPED_SCALE) / F.col(n)
    raw_diff = mean("sum_y_a", "n_a") - mean("sum_y_b", "n_b")
    x_diff = mean("sum_x_a", "n_a") - mean("sum_x_b", "n_b")
    return g.select(
        "n_a",
        "n_b",
        theta.alias("theta"),
        (covn * covn / F.nullif(varxn * varyn, F.lit(0.0))).alias("rho2"),
        raw_diff.alias("raw_diff"),
        (raw_diff - theta * x_diff).alias("adjusted_diff"),
    )


# --------------------------------------------------------------------------
# E142: Poisson-bootstrap confidence interval for the mean event value
# --------------------------------------------------------------------------

#: Bootstrap replicas; the percentile CI reads ranks 2 and B−1 of the
#: sorted replicate means (the conservative outer pair around 2.5/97.5%).
BOOT_B = 64
#: floor(CDF_Poisson(1)(k) · 2^32) for k = 0..7 — weights ≥ 8 are
#: truncated (P ≈ 1e-5; the same literal table renders in both engines,
#: so truncation cannot drift).
_POIS_T = [1580030168, 3160060337, 3950075421, 4213413783,
           4279248373, 4292415291, 4294609777, 4294923276]

#: md5-hex (column `h`) → uniform 32-bit
#: integer u = value of the first 8 hex chars. The mapping is one shared
#: CONTRACT with two per-engine renderings (Spark `conv(…,16,10)`, DuckDB
#: `('0x'||…)::BIGINT` — neither engine has the other's function); the
#: hash gate proves them equivalent. An earlier shared-string digit
#: polynomial (8× instr+substring per row) cost 5.7 s of the 9.1 s
#: sf0.1 wall — native radix conversion removes it.
#: Each 128-bit digest seeds FOUR replicas (8 hex chars each): replica
#: b = 4·(g−1)+j reads chars [8(j−1)+1, 8j] of md5(event_id, g) — a 4×
#: cut in hash work over one-digest-per-replica.
#: The Spark side renders the same contract column-wise (one
#: conv(substring(h{g}, 8(j−1)+1, 8), 16, 10) per replica) inside
#: poisson_bootstrap_value_ci — positions and CASE table identical.
_BOOT_H = "md5(concat(event_id, '_', g))"
_BOOT_U_DUCK = (
    "CAST(('0x' || substring(h, (j - 1) * 8 + 1, 8)) AS BIGINT)"
)
_BOOT_W = (
    "CASE "
    + " ".join(
        f"WHEN u < {t} THEN {k}" for k, t in enumerate(_POIS_T)
    )
    + " ELSE 8 END"
)


@query(
    "poisson_bootstrap_value_ci",
    oracle=f"""
        WITH base AS (
          SELECT event_id,
                 CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS sx
          FROM events WHERE value IS NOT NULL
        ), rep AS (
          SELECT event_id, sx,
                 unnest(generate_series(1, {BOOT_B // 4})) AS g
          FROM base
        ), hh AS (
          SELECT sx, g, {_BOOT_H} AS h FROM rep
        ), uu AS (
          SELECT sx, (g - 1) * 4 + j AS b, {_BOOT_U_DUCK} AS u
          FROM (
            SELECT sx, g, h, unnest(generate_series(1, 4)) AS j FROM hh
          )
        ), ww AS (
          SELECT sx, b, {_BOOT_W} AS w FROM uu
        ), per AS (
          SELECT b, CAST(SUM(w * sx) AS BIGINT) AS ws,
                 CAST(SUM(w) AS BIGINT) AS wn
          FROM ww GROUP BY b
        ), means AS (
          SELECT b, CAST(ws AS DOUBLE)
                   / (100.0 * CAST(NULLIF(wn, 0) AS DOUBLE)) AS m
          FROM per
        ), ranked AS (
          SELECT m, ROW_NUMBER() OVER (ORDER BY m, b) AS rn FROM means
        ), stats AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
                 CAST(SUM(sx) AS BIGINT) AS tot
          FROM base
        )
        SELECT s.n_events, CAST({BOOT_B} AS BIGINT) AS n_replicas,
               CAST(s.tot AS DOUBLE)
                 / (100.0 * CAST(s.n_events AS DOUBLE)) AS point_mean,
               (SELECT m FROM ranked WHERE rn = 2) AS boot_lo,
               (SELECT m FROM ranked WHERE rn = {BOOT_B - 1}) AS boot_hi
        FROM stats s
    """,
)
def poisson_bootstrap_value_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E142: distributed bootstrap CI for the mean event value via the
    Poisson bootstrap (Hanley & MacGibbon 2006; the production-standard
    resampling at scale — multinomial resampling needs the global n per
    draw, Poisson(1) weights don't, so every replica is ONE
    map-side-combinable weighted sum over a single fact pass). B=64
    deterministic replicas; CI = the conservative outer rank pair of
    the sorted replicate means.

    Determinism: each weight derives from md5(event_id, replica) mapped
    through the literal Poisson(1) CDF table — the u-integer and the
    CASE table render from ONE expression string shared verbatim with
    the oracle (the E115 hash-coin discipline, extended from a binary
    coin to an 8-bin inverse-CDF draw); replicate sums are exact
    BIGINTs, each mean one fixed division, so the whole CI hash-gates.

    Scale: ONE pass over the 2-column fact frame with 2B+2
    accumulators — per event the B weights render as B codegen'd CASE
    columns off the 16 digests (draw definitions IDENTICAL to the
    oracle's unnest pipeline: replica b = 4(g−1)+j reads hex chars
    [8(j−1)+1, 8j] of md5(event_id, g)), and the global agg
    partial-combines map-side, so nothing is ever exploded: the
    earlier explode form materialized B rows per event (384 M rows at
    sf1) through a hash aggregate just to sum them back to B rows, and
    that row churn — not the md5s — dominated its 33.5 s sf1 wall.
    The B-row quantile pick then happens driver-side on the single
    collected row (sorting 64 floats; the distributed part is the one
    fact pass).  Hash work stays amortized 4× (four 32-bit draws per
    128-bit digest) with native radix conversion per engine (a
    shared-string digit polynomial cost 5.7 s of a 9.1 s sf0.1 wall).
    Empty input yields the oracle's (0, B, NULL, NULL, NULL) row."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "events_boot_v"
    )
    n_digests = BOOT_B // 4
    # The whole plan renders as ONE SQL string (a ~200-Column builder
    # version measured 2x slower per call — the py4j round-trips and
    # per-Column analysis dominated a sub-second executor job).  The
    # REPARTITION hint rebalances the 2-column frame to full core width
    # before the CPU-bound digest+draw projection (16 md5 + 64 radix
    # conversions per event): at bench scale the parquet is one split
    # and would otherwise run single-threaded; at cluster scale the
    # tiny per-row shuffle cost is dwarfed by the per-row hash work,
    # and the sums are exact integers, so round-robin placement cannot
    # change the result.  u columns materialize once per replica (not
    # once per CASE branch), w columns once per replica (not once in
    # SUM(w*sx) and again in SUM(w)).
    width = default_parallelism(spark)
    hsel = ", ".join(
        f"md5(concat(event_id, '_', {g})) AS h{g}"
        for g in range(1, n_digests + 1)
    )
    usel = ", ".join(
        f"CAST(conv(substring(h{g}, {(j - 1) * 8 + 1}, 8), 16, 10)"
        f" AS BIGINT) AS u{(g - 1) * 4 + j}"
        for g in range(1, n_digests + 1)
        for j in range(1, 5)
    )
    w_tmpl = (
        "CAST(CASE "
        + " ".join(
            "WHEN u{b} < %d THEN %d" % (t, k) for k, t in enumerate(_POIS_T)
        )
        + " ELSE 8 END AS BIGINT)"
    )
    wsel = ", ".join(
        f"{w_tmpl.format(b=b)} AS w{b}" for b in range(1, BOOT_B + 1)
    )
    aggs = ", ".join(
        f"SUM(w{b} * sx) AS ws{b}, SUM(w{b}) AS wn{b}"
        for b in range(1, BOOT_B + 1)
    )
    row = spark.sql(
        f"""
        SELECT {aggs}, COUNT(1) AS n_events, SUM(sx) AS tot
        FROM (
          SELECT sx, {wsel} FROM (
            SELECT sx, {usel} FROM (
              SELECT sx, {hsel} FROM (
                SELECT /*+ REPARTITION({width}) */ event_id,
                       CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS sx
                FROM events_boot_v WHERE value IS NOT NULL
              )
            )
          )
        )
        """
    ).collect()[0]
    means = []
    for b in range(1, BOOT_B + 1):
        wn = row[f"wn{b}"]
        m = row[f"ws{b}"] / (100.0 * wn) if wn else None
        means.append((m, b))
    ranked = sorted(
        means,
        key=lambda t: (t[0] is None, t[0] if t[0] is not None else 0.0, t[1]),
    )
    n_events = int(row["n_events"])
    point_mean = row["tot"] / (100.0 * n_events) if n_events else None
    return spark.createDataFrame(
        [
            (
                n_events,
                BOOT_B,
                point_mean,
                ranked[1][0],
                ranked[BOOT_B - 2][0],
            )
        ],
        "n_events long, n_replicas long, point_mean double, "
        "boot_lo double, boot_hi double",
    )


# --------------------------------------------------------------------------
# E154: chi-square / Cramér's V association (effect size, exact arithmetic)
# --------------------------------------------------------------------------

#: Chi-square accumulates in units of 1e-6: each cell's
#: (n·O−r·c)²·SCALE // (n·r·c) is EXACT integer arithmetic (128-bit), so
#: the sum is order-insensitive — a raw double Σ over cells would depend
#: on cell visit order and diverge between engines.
_CHI2_SCALE = 1_000_000


@query(
    "type_dow_cramers_v",
    oracle=f"""
        WITH obs AS (
          SELECT event_type, dayofweek(ts) AS dow,
                 CAST(COUNT(*) AS BIGINT) AS o
          FROM events GROUP BY 1, 2
        ), rt AS (
          SELECT event_type, CAST(SUM(o) AS BIGINT) AS r FROM obs GROUP BY 1
        ), ct AS (
          SELECT dow, CAST(SUM(o) AS BIGINT) AS c FROM obs GROUP BY 1
        ), tot AS (
          SELECT CAST(SUM(o) AS BIGINT) AS n,
                 CAST(COUNT(DISTINCT event_type) AS BIGINT) AS nr,
                 CAST(COUNT(DISTINCT dow) AS BIGINT) AS nc
          FROM obs
        ), grid AS (
          SELECT rt.event_type, ct.dow, rt.r, ct.c,
                 CAST(COALESCE(obs.o, 0) AS BIGINT) AS o
          FROM rt CROSS JOIN ct
          LEFT JOIN obs ON obs.event_type = rt.event_type
                       AND obs.dow = ct.dow
        ), cells AS (
          SELECT CAST(SUM(
            ((CAST(t.n AS HUGEINT) * g.o - CAST(g.r AS HUGEINT) * g.c)
             * (CAST(t.n AS HUGEINT) * g.o - CAST(g.r AS HUGEINT) * g.c)
             * {_CHI2_SCALE})
            // (CAST(t.n AS HUGEINT) * g.r * g.c)
          ) AS BIGINT) AS chi2_scaled
          FROM grid g CROSS JOIN tot t
        )
        SELECT t.n AS n_events,
               CAST(c.chi2_scaled AS DOUBLE) / {_CHI2_SCALE} AS chi2,
               sqrt((CAST(c.chi2_scaled AS DOUBLE) / {_CHI2_SCALE})
                    / (t.n * LEAST(t.nr - 1, t.nc - 1))) AS cramers_v
        FROM cells c CROSS JOIN tot t
    """,
)
def type_dow_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E154: chi-square independence statistic + Cramér's V effect size
    over the event_type x day-of-week contingency grid — the NORMALIZED
    companion to the E110 total-variation readout (V in [0,1] is
    comparable across grids of different shape; raw chi-square is not).

    Exactness: every cell contributes
    (n·O−r·c)²·10⁶ // (n·r·c) — pure 128-bit INTEGER arithmetic — so the
    cell sum is exact and order-insensitive; a naive double chi-square
    sum would depend on cell visit order and diverge between engines. V
    is one sqrt over identical operands. Zero-count cells with positive
    margins are included (they carry r·c²/n of the statistic).

    Scale: facts collapse map-side to the |types|x|dows| grid (35 cells);
    margins and total derive from the grid, never rescanning facts; the
    driver sees one row."""
    ev = load_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type", (F.dayofweek("ts") - 1).cast("long").alias("dow")
    ).agg(F.count(F.lit(1)).cast("long").alias("o"))
    obs = scoped_persist(obs)
    rt = obs.groupBy("event_type").agg(F.sum("o").cast("long").alias("r"))
    ct = obs.groupBy("dow").agg(F.sum("o").cast("long").alias("c"))
    tot = obs.agg(
        F.sum("o").cast("long").alias("n"),
        F.countDistinct("event_type").cast("long").alias("nr"),
        F.countDistinct("dow").cast("long").alias("nc"),
    )
    grid = (
        rt.crossJoin(ct)
        .join(obs, ["event_type", "dow"], "left")
        .select(
            "r", "c", F.coalesce(F.col("o"), F.lit(0)).cast("long").alias("o")
        )
    )
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    num = dec(F.col("n")) * F.col("o") - dec(F.col("r")) * F.col("c")
    cell = F.expr(
        f"CAST((num * num * {_CHI2_SCALE}) div (nn * r * c) AS BIGINT)"
    )
    cells = (
        grid.crossJoin(F.broadcast(tot))
        .select(
            num.alias("num"),
            dec(F.col("n")).alias("nn"),
            dec(F.col("r")).alias("r"),
            dec(F.col("c")).alias("c"),
        )
        .select(cell.alias("cell"))
        .agg(F.sum("cell").cast("long").alias("chi2_scaled"))
    )
    chi2 = F.col("chi2_scaled").cast("double") / _CHI2_SCALE
    return cells.crossJoin(F.broadcast(tot)).select(
        F.col("n").alias("n_events"),
        chi2.alias("chi2"),
        F.sqrt(
            chi2 / (F.col("n") * F.least(F.col("nr") - 1, F.col("nc") - 1))
        ).alias("cramers_v"),
    )


# --------------------------------------------------------------------------
# E156: two-sample Kolmogorov–Smirnov drift test (exact, distributed)
# --------------------------------------------------------------------------


@query(
    "value_ks_drift",
    oracle="""
        WITH b AS (
          SELECT CAST(MIN(ts) AS DATE)
                 + CAST(date_diff('day', CAST(MIN(ts) AS DATE),
                                  CAST(MAX(ts) AS DATE)) // 2 AS INTEGER)
                   AS mid
          FROM events WHERE value IS NOT NULL
        ), g AS (
          SELECT value AS v,
                 CAST(COUNT(*) FILTER (WHERE CAST(ts AS DATE) < b.mid)
                   AS BIGINT) AS c1,
                 CAST(COUNT(*) FILTER (WHERE CAST(ts AS DATE) >= b.mid)
                   AS BIGINT) AS c2
          FROM events CROSS JOIN b
          WHERE value IS NOT NULL
          GROUP BY value
        ), cum AS (
          SELECT v,
                 CAST(SUM(c1) OVER (ORDER BY v) AS BIGINT) AS f1,
                 CAST(SUM(c2) OVER (ORDER BY v) AS BIGINT) AS f2,
                 CAST(SUM(c1) OVER () AS BIGINT) AS n1,
                 CAST(SUM(c2) OVER () AS BIGINT) AS n2
          FROM g
        ), d AS (
          SELECT v, n1, n2, ABS(f1 * n2 - f2 * n1) AS num FROM cum
        ), mx AS (
          SELECT MAX(num) AS mnum FROM d
        )
        SELECT d.n1, d.n2,
               CAST(mx.mnum AS DOUBLE)
                 / (CAST(d.n1 AS DOUBLE) * d.n2) AS ks_stat,
               MIN(d.v) OVER () AS ks_at
        FROM d CROSS JOIN mx
        WHERE d.num = mx.mnum
        QUALIFY ROW_NUMBER() OVER (ORDER BY d.v) = 1
    """,
)
def value_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E156: exact two-sample Kolmogorov–Smirnov statistic between the
    event-value distributions of the first and second calendar halves —
    the standard "did the metric's DISTRIBUTION drift" test (mean-based
    monitors miss shape changes; KS does not), with the value where the
    CDF gap peaks (smallest such value on ties).

    Exactness: at every distinct value x the CDF gap is the INTEGER
    |F1(x)·n1·n2 − F2(x)·n1·n2| = |c1≤x·n2 − c2≤x·n1| — cross-multiplied
    so no per-point division ever happens; one double division at the
    very end. The argmax tie-breaks to the smallest value by exact
    comparison.

    Scale: the fact table collapses to one row per DISTINCT value
    (map-side combine); cumulative counts use the two-phase distributed
    prefix sum (range-repartition → per-partition window → broadcast
    offsets, the _global_ranks shape) — no global single-partition
    window ever materializes, so the plan survives a value domain of
    any cardinality."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    bounds = ev.agg(
        F.date_add(
            F.min(F.col("ts").cast("date")),
            (
                F.datediff(
                    F.max(F.col("ts").cast("date")),
                    F.min(F.col("ts").cast("date")),
                )
                / 2
            ).cast("int"),
        ).alias("mid")
    )
    g = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy(F.col("value").alias("v"))
        .agg(
            F.count(F.when(F.col("ts").cast("date") < F.col("mid"), 1))
            .cast("long")
            .alias("c1"),
            F.count(F.when(F.col("ts").cast("date") >= F.col("mid"), 1))
            .cast("long")
            .alias("c2"),
        )
    )
    # two-phase distributed prefix sum over the value order
    local = scoped_persist(
        g.repartitionByRange(32, "v").select(
            "v", "c1", "c2", F.spark_partition_id().alias("pid")
        )
    )
    w_local = (
        Window.partitionBy("pid")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    part_tot = local.groupBy("pid").agg(
        F.sum("c1").alias("t1"), F.sum("c2").alias("t2")
    )
    w_off = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = part_tot.select(
        "pid",
        F.coalesce(F.sum("t1").over(w_off), F.lit(0)).alias("o1"),
        F.coalesce(F.sum("t2").over(w_off), F.lit(0)).alias("o2"),
    )
    totals = part_tot.agg(
        F.sum("t1").cast("long").alias("n1"),
        F.sum("t2").cast("long").alias("n2"),
    )
    cum = local.join(F.broadcast(offsets), "pid").select(
        "v",
        (F.col("o1") + F.sum("c1").over(w_local)).cast("long").alias("f1"),
        (F.col("o2") + F.sum("c2").over(w_local)).cast("long").alias("f2"),
    )
    d = scoped_persist(
        cum.crossJoin(F.broadcast(totals)).select(
            "v",
            "n1",
            "n2",
            F.abs(
                F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1")
            ).alias("num"),
        )
    )
    mx = d.agg(F.max("num").alias("mnum"))
    return (
        d.join(F.broadcast(mx), d["num"] == mx["mnum"])
        .groupBy("n1", "n2", "mnum")
        .agg(F.min("v").alias("ks_at"))
        .select(
            "n1",
            "n2",
            (
                F.col("mnum").cast("double")
                / (F.col("n1").cast("double") * F.col("n2"))
            ).alias("ks_stat"),
            "ks_at",
        )
    )


# --------------------------------------------------------------------------
# E169: one-way ANOVA (F statistic) for value across event types
# --------------------------------------------------------------------------

_ANOVA_SCALE = 100  # 2-dp fixed point for the response


@query(
    "value_anova_by_type",
    oracle=f"""
        WITH per AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CAST(FLOOR(value * {_ANOVA_SCALE} + 0.5) AS HUGEINT))
                   AS s1,
                 SUM(CAST(FLOOR(value * {_ANOVA_SCALE} + 0.5) AS HUGEINT)
                     * CAST(FLOOR(value * {_ANOVA_SCALE} + 0.5) AS BIGINT))
                   AS s2
          FROM events WHERE value IS NOT NULL
          GROUP BY event_type
        ), g AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS k,
                 CAST(SUM(n) AS BIGINT) AS n_tot,
                 SUM(s1) AS s1_tot,
                 SUM(s2) AS s2_tot,
                 SUM((s1 * s1) // n) AS sq_within_num
          FROM per
        )
        SELECT k AS n_groups, n_tot AS n_values,
               (CAST(g.sq_within_num AS DOUBLE)
                  - CAST(g.s1_tot AS DOUBLE) * g.s1_tot / g.n_tot)
                 / ({_ANOVA_SCALE}.0 * {_ANOVA_SCALE}) AS ss_between,
               (CAST(g.s2_tot AS DOUBLE)
                  - CAST(g.sq_within_num AS DOUBLE))
                 / ({_ANOVA_SCALE}.0 * {_ANOVA_SCALE}) AS ss_within,
               ((CAST(g.sq_within_num AS DOUBLE)
                   - CAST(g.s1_tot AS DOUBLE) * g.s1_tot / g.n_tot)
                  / (g.k - 1))
               / NULLIF((CAST(g.s2_tot AS DOUBLE)
                           - CAST(g.sq_within_num AS DOUBLE))
                          / (g.n_tot - g.k), 0.0) AS f_stat
        FROM g
    """,
)
def value_anova_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E169: one-way ANOVA — does mean event value differ ACROSS the
    event types? F = (SS_between/(k−1)) / (SS_within/(n−k)), the k-group
    generalization of the pack's two-group tests (E85 z-test, E134
    Mann-Whitney). SS_between = Σ nᵢx̄ᵢ² − n·x̄² computed as
    Σ⌊s₁ᵢ²/nᵢ⌋ − s₁²/n over fixed-point sums.

    Exactness: per-group Σx and Σx² accumulate as exact 128-bit
    integers of the 2-dp response; the single inexact step per term is
    ONE floor-division (⌊s₁²/n⌋, identical integer op both engines) and
    the final fixed double chain — so F hash-gates. Degenerate
    zero-within-variance data yields NULL F.

    Scale: one map-side-combinable pass to |types| rows; everything
    after is arithmetic on a 5-row frame."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    sv = F.floor(F.col("value") * _ANOVA_SCALE + F.lit(0.5)).cast("long")
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    per = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec(sv)).alias("s1"),
        F.sum(dec(sv) * sv).alias("s2"),
    )
    g = per.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("n_tot"),
        F.sum("s1").alias("s1_tot"),
        F.sum("s2").alias("s2_tot"),
        F.sum(F.expr("CAST((s1 * s1) div n AS decimal(38,0))")).alias(
            "sq_within_num"
        ),
    )
    sc2 = float(_ANOVA_SCALE * _ANOVA_SCALE)
    ssb = (
        F.col("sq_within_num").cast("double")
        - F.col("s1_tot").cast("double") * F.col("s1_tot") / F.col("n_tot")
    )
    ssw = F.col("s2_tot").cast("double") - F.col("sq_within_num").cast(
        "double"
    )
    return g.select(
        F.col("k").alias("n_groups"),
        F.col("n_tot").alias("n_values"),
        (ssb / sc2).alias("ss_between"),
        (ssw / sc2).alias("ss_within"),
        (
            (ssb / (F.col("k") - 1))
            / F.nullif(ssw / (F.col("n_tot") - F.col("k")), F.lit(0.0))
        ).alias("f_stat"),
    )


# --------------------------------------------------------------------------
# E172: Wilson score intervals for the hourly error rate
# --------------------------------------------------------------------------

#: The Wilson pieces are SHARED SQL literals (Spark F.expr == DuckDB text)
#: so both engines evaluate the identical IEEE expression tree — the
#: whole statistic is pure per-row double arithmetic on two integers
#: (n, k), deterministic without any fixed-point scaling. z is written
#: as 1.96 * 1.96 rather than 3.8416: both engines parse the literal
#: 1.96 to the same double and multiply identically, while the decimal
#: literal 3.8416 rounds to a DIFFERENT double than the product.
_W_P = "(CAST(n_errors AS DOUBLE) / n_events)"
_W_DEN = "(1.0 + (1.96 * 1.96) / n_events)"
_W_CENTER = f"(({_W_P} + (1.96 * 1.96) / (2.0 * n_events)) / {_W_DEN})"
_W_HALF = (
    f"((1.96 * SQRT(({_W_P} * (1.0 - {_W_P})"
    f" + (1.96 * 1.96) / (4.0 * n_events)) / n_events)) / {_W_DEN})"
)


@query(
    "hourly_error_rate_wilson",
    oracle=f"""
        WITH per AS (
          SELECT CAST(hour(ts) AS BIGINT) AS hr,
                 CAST(COUNT(*) AS BIGINT) AS n_events,
                 CAST(COUNT(*) FILTER (WHERE event_type = 'error')
                   AS BIGINT) AS n_errors
          FROM events
          GROUP BY 1
        )
        SELECT hr, n_events, n_errors,
               {_W_P} AS p_hat,
               ({_W_CENTER} - {_W_HALF}) AS ci_lo,
               ({_W_CENTER} + {_W_HALF}) AS ci_hi
        FROM per
    """,
)
def hourly_error_rate_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E172: per hour-of-day, the error share with its Wilson 95% score
    interval — the interval an SLO dashboard should draw instead of the
    textbook Wald CI, which collapses to width 0 at p̂=0 and escapes
    [0,1] near the edges exactly where error rates live; Wilson stays
    inside [0,1] and has correct coverage at small k (Brown/Cai/DasGupta,
    "Interval Estimation for a Binomial Proportion", 2001). Completes
    the uncertainty story the pack's point estimates (E85 z-test, E94
    burn rate) leave open: is 3am's elevated rate signal or small-n?

    Exactness: the aggregate is two exact integers per hour (n, k); the
    interval is ONE fixed chain of IEEE double ops (div, sqrt) rendered
    from SQL literals shared verbatim with the oracle, so both engines
    evaluate identical operands in identical order — bit-equal with no
    fixed-point scaling needed.

    Scale: one map-side-combinable aggregate to a 24-row frame; the
    interval math runs on 24 rows. No shuffle beyond the single
    hour-keyed exchange."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy(F.hour("ts").cast("long").alias("hr")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.count(F.when(F.col("event_type") == "error", 1))
        .cast("long")
        .alias("n_errors"),
    )
    return per.select(
        "hr",
        "n_events",
        "n_errors",
        F.expr(_W_P).alias("p_hat"),
        F.expr(f"({_W_CENTER} - {_W_HALF})").alias("ci_lo"),
        F.expr(f"({_W_CENTER} + {_W_HALF})").alias("ci_hi"),
    )


# --------------------------------------------------------------------------
# E182: Welch's unequal-variance t-test (purchase vs view values)
# --------------------------------------------------------------------------

_WELCH_SCALE = 100  # 2-dp fixed point for the response
_W_M1 = f"(CAST(s1 AS DOUBLE) / {_WELCH_SCALE} / n1)"
_W_M2 = f"(CAST(s2 AS DOUBLE) / {_WELCH_SCALE} / n2)"
_W_V1 = (
    "((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1)"
    f" / ({_WELCH_SCALE}.0 * {_WELCH_SCALE}) / (n1 - 1))"
)
_W_V2 = (
    "((CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2)"
    f" / ({_WELCH_SCALE}.0 * {_WELCH_SCALE}) / (n2 - 1))"
)
_W_SE2 = f"({_W_V1} / n1 + {_W_V2} / n2)"
_W_T = f"(({_W_M1} - {_W_M2}) / NULLIF(SQRT({_W_SE2}), 0.0))"
_W_DF = (
    f"(({_W_SE2} * {_W_SE2})"
    f" / NULLIF(({_W_V1} / n1) * ({_W_V1} / n1) / (n1 - 1)"
    f" + ({_W_V2} / n2) * ({_W_V2} / n2) / (n2 - 1), 0.0))"
)


@query(
    "welch_ttest_purchase_view",
    oracle=f"""
        WITH a AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n1,
                 SUM(CAST(FLOOR(value * {_WELCH_SCALE} + 0.5) AS HUGEINT))
                   AS s1,
                 SUM(CAST(FLOOR(value * {_WELCH_SCALE} + 0.5) AS HUGEINT)
                     * CAST(FLOOR(value * {_WELCH_SCALE} + 0.5) AS BIGINT))
                   AS q1
          FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
        ), b AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n2,
                 SUM(CAST(FLOOR(value * {_WELCH_SCALE} + 0.5) AS HUGEINT))
                   AS s2,
                 SUM(CAST(FLOOR(value * {_WELCH_SCALE} + 0.5) AS HUGEINT)
                     * CAST(FLOOR(value * {_WELCH_SCALE} + 0.5) AS BIGINT))
                   AS q2
          FROM events WHERE event_type = 'view' AND value IS NOT NULL
        )
        SELECT n1 AS n_purchase, n2 AS n_view,
               {_W_M1} AS mean_purchase, {_W_M2} AS mean_view,
               ({_W_M1} - {_W_M2}) AS mean_diff,
               {_W_T} AS t_stat, {_W_DF} AS welch_df
        FROM a CROSS JOIN b
    """,
)
def welch_ttest_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E182: Welch's unequal-variance t-test between purchase and view
    event values — the parametric two-sample mean test the pack's
    ladder still lacked (E85 tests PROPORTIONS, E134 tests ranks, E169
    assumes equal variances across k groups; Welch is the
    default-correct two-group mean test when variances differ), with
    the Welch-Satterthwaite effective degrees of freedom.

    Exactness: per-group Σx/Σx² are exact 128-bit integers of the 2-dp
    response; means/variances/t/df are ONE shared-literal double chain
    (every integer operand explicitly CAST before any literal touches
    it — the E180 decimal-literal lesson), NULL t on zero pooled
    variance, NULL df on degenerate groups.

    Scale: two map-side-combinable single-row aggregates crossJoined —
    nothing after the first pass depends on volume."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    sv = F.floor(F.col("value") * _WELCH_SCALE + F.lit(0.5)).cast("long")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731

    def side(tp: str, n: str, s: str, q: str):
        g = ev.where(F.col("event_type") == tp)
        return g.agg(
            F.count(F.lit(1)).cast("long").alias(n),
            F.sum(dec(sv)).alias(s),
            F.sum(dec(sv) * sv).alias(q),
        )

    a = side("purchase", "n1", "s1", "q1")
    b = side("view", "n2", "s2", "q2")
    return a.crossJoin(F.broadcast(b)).select(
        F.col("n1").alias("n_purchase"),
        F.col("n2").alias("n_view"),
        F.expr(_W_M1).alias("mean_purchase"),
        F.expr(_W_M2).alias("mean_view"),
        F.expr(f"({_W_M1} - {_W_M2})").alias("mean_diff"),
        F.expr(_W_T).alias("t_stat"),
        F.expr(_W_DF).alias("welch_df"),
    )


# --------------------------------------------------------------------------
# E185: Cochran-Mantel-Haenszel stratified conversion test
# --------------------------------------------------------------------------

#: Strata: three fixed hour-of-day bands (diurnal confounder). Bounded
#: and deterministic, so the per-stratum terms can be laid out as fixed
#: columns of ONE row — the double additions then happen in a FIXED
#: expression order (a groupBy-sum over strata would be order-dependent).
_CMH_BANDS = [(0, 7), (8, 15), (16, 23)]


def _cmh_terms(k: int) -> tuple[str, str]:
    """(a_k − E_k, V_k) as SQL over the stratum-k count columns."""
    a, n1, m1, n = f"a{k}", f"n1_{k}", f"m1_{k}", f"n_{k}"
    diff = (
        f"(CAST({a} AS DOUBLE)"
        f" - CAST({n1} AS DOUBLE) * {m1} / NULLIF({n}, 0))"
    )
    var = (
        f"(CAST({n1} AS DOUBLE) * ({n} - {n1}) * {m1} * ({n} - {m1})"
        f" / NULLIF(CAST({n} AS DOUBLE) * {n} * ({n} - 1), 0.0))"
    )
    return diff, var


_CMH_DIFFS, _CMH_VARS = zip(
    *[_cmh_terms(k) for k in range(len(_CMH_BANDS))]
)
_CMH_CHI2 = (
    f"((({' + '.join(_CMH_DIFFS)}) * ({' + '.join(_CMH_DIFFS)}))"
    f" / NULLIF({' + '.join(_CMH_VARS)}, 0.0))"
)


def _cmh_cells_sql() -> str:
    cols = []
    for k, (lo, hi) in enumerate(_CMH_BANDS):
        band = f"hour(ts) BETWEEN {lo} AND {hi}"
        cols.append(
            f"CAST(COUNT(*) FILTER (WHERE {band} AND user_id % 2 = 0"
            f" AND event_type = 'purchase') AS BIGINT) AS a{k}"
        )
        cols.append(
            f"CAST(COUNT(*) FILTER (WHERE {band} AND user_id % 2 = 0)"
            f" AS BIGINT) AS n1_{k}"
        )
        cols.append(
            f"CAST(COUNT(*) FILTER (WHERE {band}"
            f" AND event_type = 'purchase') AS BIGINT) AS m1_{k}"
        )
        cols.append(
            f"CAST(COUNT(*) FILTER (WHERE {band}) AS BIGINT) AS n_{k}"
        )
    return ", ".join(cols)


@query(
    "cmh_conversion_by_hour_band",
    oracle=f"""
        WITH cells AS (
          SELECT {_cmh_cells_sql()}
          FROM events WHERE user_id IS NOT NULL
        )
        SELECT {', '.join(
            f'a{k}, n1_{k}, m1_{k}, n_{k}' for k in range(len(_CMH_BANDS))
        )},
               {_CMH_CHI2} AS cmh_chi2
        FROM cells
    """,
)
def cmh_conversion_by_hour_band(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """E185: Cochran-Mantel-Haenszel test — does the even/odd-user "arm"
    convert differently once the diurnal confounder is STRATIFIED OUT?
    E85's pooled z-test is vulnerable to Simpson's paradox when arms are
    unevenly exposed across hours; CMH pools the per-stratum 2×2 tables
    as χ² = (Σ(aₖ−Eₖ))² / ΣVₖ with the hypergeometric Eₖ, Vₖ — the
    standard stratified A/B analysis (Mantel & Haenszel 1959).

    Exactness: all 12 stratum cells are exact integers of ONE
    map-side-combinable pass laid out as fixed COLUMNS of a single row,
    so the three-term double sums evaluate in a fixed literal order
    (a groupBy over strata would re-associate them); χ² is one shared
    literal, NULL on degenerate strata.

    Scale: one aggregate to one row; arithmetic after it is
    volume-independent."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
    )
    hour = F.hour("ts")
    arm_a = F.col("user_id") % 2 == 0
    purch = F.col("event_type") == "purchase"
    aggs = []
    for k, (lo, hi) in enumerate(_CMH_BANDS):
        band = hour.between(lo, hi)
        aggs.extend(
            [
                F.count(F.when(band & arm_a & purch, 1))
                .cast("long")
                .alias(f"a{k}"),
                F.count(F.when(band & arm_a, 1))
                .cast("long")
                .alias(f"n1_{k}"),
                F.count(F.when(band & purch, 1))
                .cast("long")
                .alias(f"m1_{k}"),
                F.count(F.when(band, 1)).cast("long").alias(f"n_{k}"),
            ]
        )
    cells = ev.agg(*aggs)
    out_cols = [
        c
        for k in range(len(_CMH_BANDS))
        for c in (f"a{k}", f"n1_{k}", f"m1_{k}", f"n_{k}")
    ]
    return cells.select(*out_cols, F.expr(_CMH_CHI2).alias("cmh_chi2"))


# --------------------------------------------------------------------------
# E203: event-mix drift — 2×k chi-square between calendar halves
# --------------------------------------------------------------------------


@query(
    "event_type_mix_drift",
    oracle=f"""
        WITH b AS (
          SELECT CAST(MIN(ts) AS DATE)
                 + CAST(date_diff('day', CAST(MIN(ts) AS DATE),
                                  CAST(MAX(ts) AS DATE)) // 2 AS INTEGER)
                   AS mid
          FROM events
        ), obs AS (
          SELECT event_type,
                 CASE WHEN CAST(ts AS DATE) < b.mid THEN 0 ELSE 1 END
                   AS half,
                 CAST(COUNT(*) AS BIGINT) AS o
          FROM events CROSS JOIN b GROUP BY 1, 2
        ), rt AS (
          SELECT event_type, CAST(SUM(o) AS BIGINT) AS r FROM obs GROUP BY 1
        ), ct AS (
          SELECT half, CAST(SUM(o) AS BIGINT) AS c FROM obs GROUP BY 1
        ), tot AS (
          SELECT CAST(SUM(o) AS BIGINT) AS n,
                 CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k
          FROM obs
        ), grid AS (
          SELECT rt.event_type, ct.half, rt.r, ct.c,
                 CAST(COALESCE(obs.o, 0) AS BIGINT) AS o
          FROM rt CROSS JOIN ct
          LEFT JOIN obs ON obs.event_type = rt.event_type
                       AND obs.half = ct.half
        ), cells AS (
          SELECT CAST(SUM(
            ((CAST(t.n AS HUGEINT) * g.o - CAST(g.r AS HUGEINT) * g.c)
             * (CAST(t.n AS HUGEINT) * g.o - CAST(g.r AS HUGEINT) * g.c)
             * {_CHI2_SCALE})
            // (CAST(t.n AS HUGEINT) * g.r * g.c)
          ) AS BIGINT) AS chi2_scaled
          FROM grid g CROSS JOIN tot t
        )
        SELECT t.n AS n_events, t.k AS n_types,
               t.k - 1 AS dof,
               CAST(c.chi2_scaled AS DOUBLE) / {_CHI2_SCALE} AS chi2
        FROM cells c CROSS JOIN tot t
    """,
)
def event_type_mix_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E203: did the event-type MIX drift between the first and second
    calendar halves — the 2×k chi-square homogeneity test, the
    categorical sibling of E156's KS (which tests a CONTINUOUS metric)
    and the across-time counterpart of E151's type×dow association
    (within one period). A mix shift is the earliest symptom of
    instrumentation changes and bot inflows; per-type monitors miss it
    when totals also move.

    Exactness: the E151 discipline — every cell's (n·o − r·c)²·S //
    (n·r·c) is an exact integer floor-division, so the cross-cell SUM
    is exact under any partitioning; one final descale division.

    Scale: one (type, half) aggregate (map-side combine), a bounded
    2×k grid rebuilt from marginals (zero-fill for types absent in a
    half), 1-row totals."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_add(
            F.min(F.col("ts").cast("date")),
            (
                F.datediff(
                    F.max(F.col("ts").cast("date")),
                    F.min(F.col("ts").cast("date")),
                )
                / 2
            ).cast("int"),
        ).alias("mid")
    )
    obs = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy(
            "event_type",
            F.when(F.col("ts").cast("date") < F.col("mid"), 0)
            .otherwise(1)
            .alias("half"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
    )
    obs = scoped_persist(obs)
    rt = obs.groupBy("event_type").agg(F.sum("o").cast("long").alias("r"))
    ct = obs.groupBy("half").agg(F.sum("o").cast("long").alias("c"))
    tot = obs.agg(
        F.sum("o").cast("long").alias("n"),
        F.countDistinct("event_type").alias("k"),
    )
    grid = (
        rt.crossJoin(F.broadcast(ct))
        .join(obs, ["event_type", "half"], "left")
        .select(
            "r",
            "c",
            F.coalesce(F.col("o"), F.lit(0)).cast("long").alias("o"),
        )
    )
    cells = grid.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.expr(
                f"CAST(((CAST(n AS decimal(38,0)) * o"
                f" - CAST(r AS decimal(38,0)) * c)"
                f" * (CAST(n AS decimal(38,0)) * o"
                f" - CAST(r AS decimal(38,0)) * c)"
                f" * {_CHI2_SCALE})"
                f" div (CAST(n AS decimal(38,0)) * r * c) AS decimal(38,0))"
            )
        )
        .cast("long")
        .alias("chi2_scaled")
    )
    return cells.crossJoin(F.broadcast(tot)).select(
        F.col("n").alias("n_events"),
        F.col("k").alias("n_types"),
        (F.col("k") - 1).alias("dof"),
        (F.col("chi2_scaled").cast("double") / _CHI2_SCALE).alias("chi2"),
    )


# --------------------------------------------------------------------------
# E213: language x source association (corpus-composition Cramér's V)
# --------------------------------------------------------------------------


@query(
    "lang_source_association",
    oracle=f"""
        WITH obs AS (
          SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
          FROM documents GROUP BY 1, 2
        ), rt AS (
          SELECT lang, CAST(SUM(o) AS BIGINT) AS r FROM obs GROUP BY 1
        ), ct AS (
          SELECT source, CAST(SUM(o) AS BIGINT) AS c FROM obs GROUP BY 1
        ), tot AS (
          SELECT CAST(SUM(o) AS BIGINT) AS n,
                 CAST(COUNT(DISTINCT lang) AS BIGINT) AS nr,
                 CAST(COUNT(DISTINCT source) AS BIGINT) AS nc
          FROM obs
        ), grid AS (
          SELECT rt.lang, ct.source, rt.r, ct.c,
                 CAST(COALESCE(obs.o, 0) AS BIGINT) AS o
          FROM rt CROSS JOIN ct
          LEFT JOIN obs ON obs.lang = rt.lang AND obs.source = ct.source
        ), cells AS (
          SELECT CAST(SUM(
            ((CAST(t.n AS HUGEINT) * g.o - CAST(g.r AS HUGEINT) * g.c)
             * (CAST(t.n AS HUGEINT) * g.o - CAST(g.r AS HUGEINT) * g.c)
             * {_CHI2_SCALE})
            // (CAST(t.n AS HUGEINT) * g.r * g.c)
          ) AS BIGINT) AS chi2_scaled
          FROM grid g CROSS JOIN tot t
        )
        SELECT t.n AS n_docs, t.nr AS n_langs, t.nc AS n_sources,
               CAST(c.chi2_scaled AS DOUBLE) / {_CHI2_SCALE} AS chi2,
               sqrt((CAST(c.chi2_scaled AS DOUBLE) / {_CHI2_SCALE})
                    / (t.n * LEAST(t.nr - 1, t.nc - 1))) AS cramers_v
        FROM cells c CROSS JOIN tot t
    """,
)
def lang_source_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E213: is language independent of source in the corpus — Cramér's
    V over the (lang × source) contingency grid, E151's machinery
    repointed at CORPUS COMPOSITION: a high V means per-source mixture
    weights (E197) double as language weights whether intended or not,
    and language-balanced sampling must stratify by source. The
    categorical companion to E200's duplication matrix in the
    before-you-weight audit set.

    Exactness: the E151 discipline — integer-quantized per-cell χ²
    terms (one exact floor-division each) summed exactly; V is one
    shared-literal sqrt chain.

    Scale: one (lang × source) counting aggregate, a bounded grid
    rebuild from marginals with zero-fill, 1-row totals."""
    docs = load_table(spark, sf_dir, "documents")
    obs = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("o")
    )
    obs = scoped_persist(obs)
    rt = obs.groupBy("lang").agg(F.sum("o").cast("long").alias("r"))
    ct = obs.groupBy("source").agg(F.sum("o").cast("long").alias("c"))
    tot = obs.agg(
        F.sum("o").cast("long").alias("n"),
        F.countDistinct("lang").alias("nr"),
        F.countDistinct("source").alias("nc"),
    )
    grid = (
        rt.crossJoin(F.broadcast(ct))
        .join(obs, ["lang", "source"], "left")
        .select(
            "r",
            "c",
            F.coalesce(F.col("o"), F.lit(0)).cast("long").alias("o"),
        )
    )
    cells = grid.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.expr(
                f"CAST(((CAST(n AS decimal(38,0)) * o"
                f" - CAST(r AS decimal(38,0)) * c)"
                f" * (CAST(n AS decimal(38,0)) * o"
                f" - CAST(r AS decimal(38,0)) * c)"
                f" * {_CHI2_SCALE})"
                f" div (CAST(n AS decimal(38,0)) * r * c) AS decimal(38,0))"
            )
        )
        .cast("long")
        .alias("chi2_scaled")
    )
    return cells.crossJoin(F.broadcast(tot)).select(
        F.col("n").alias("n_docs"),
        F.col("nr").alias("n_langs"),
        F.col("nc").alias("n_sources"),
        (F.col("chi2_scaled").cast("double") / _CHI2_SCALE).alias("chi2"),
        F.expr(
            f"sqrt((CAST(chi2_scaled AS DOUBLE) / {_CHI2_SCALE})"
            f" / (n * LEAST(nr - 1, nc - 1)))"
        ).alias("cramers_v"),
    )


# --------------------------------------------------------------------------
# E215: supplier-concentration HHI bands per part (single-source risk)
# --------------------------------------------------------------------------

_HHI_SCALE = 1_000_000
#: DOJ/FTC horizontal-merger bands, in HHI millionths.
_HHI_HIGH = 250_000
_HHI_MODERATE = 150_000


@query(
    "part_supplier_hhi_bands",
    oracle=f"""
        WITH pq AS (
          SELECT l_partkey, l_suppkey,
                 SUM(CAST(FLOOR(CAST(l_quantity AS DOUBLE) * 100 + 0.5)
                     AS HUGEINT)) AS q
          FROM lineitem GROUP BY 1, 2
        ), per_part AS (
          SELECT l_partkey,
                 CAST((SUM(q * q) * {_HHI_SCALE})
                      // (SUM(q) * SUM(q)) AS BIGINT) AS hhi
          FROM pq GROUP BY l_partkey
        ), banded AS (
          SELECT CASE WHEN hhi = {_HHI_SCALE} THEN 'single-sourced'
                      WHEN hhi >= {_HHI_HIGH} THEN 'highly-concentrated'
                      WHEN hhi >= {_HHI_MODERATE} THEN 'moderate'
                      ELSE 'diversified' END AS band
          FROM per_part
        ), tot AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM banded
        )
        SELECT b.band, CAST(COUNT(*) AS BIGINT) AS n_parts,
               CAST(COUNT(*) AS DOUBLE) / t.n_total AS part_share
        FROM banded b CROSS JOIN tot t
        GROUP BY b.band, t.n_total
    """,
)
def part_supplier_hhi_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E215: single-source supply risk — each part's supplier
    Herfindahl-Hirschman index over shipped quantity, banded at the
    DOJ/FTC merger thresholds (1.0 single-sourced, ≥0.25 highly
    concentrated, ≥0.15 moderate). E83 deliberately reported CR1/CR4
    instead of HHI because per-share float squares accumulate in
    engine-dependent order; the cross-multiplied integer form removes
    that objection — HHI·S = Σq_s²·S // (Σq_s)² is ONE exact 128-bit
    floor division per part, no float ever summed.

    Scale: (part, supplier) quantity collapse (map-side combine) → one
    part-keyed aggregate → a ≤4-row band regroup + 1-row total. The
    per-part HHI never materializes shares.

    The FIRST-level sum runs as BIGINT, not decimal(38,0) (guide §2.3
    narrower types: −28% at sf10, where this aggregate over ~55M
    near-distinct (part, supplier) groups is the query's wall): the
    scaled per-row quantity is ≤ 5000, so the per-(part, supplier) sum
    overflows BIGINT only past ~1.8e15 lineitem rows for ONE pair —
    far beyond any real multiplicity. Only the squaring level, where
    q² genuinely needs 128 bits, casts up to decimal(38,0); the
    integers (and hence every HHI bit) are identical."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.floor(F.col("l_quantity").cast("double") * 100 + F.lit(0.5)).cast(
        "long"
    )
    pq = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(q).cast("decimal(38,0)").alias("q")
    )
    per_part = pq.groupBy("l_partkey").agg(
        F.expr(
            f"CAST((SUM(q * q) * {_HHI_SCALE})"
            f" div (SUM(q) * SUM(q)) AS BIGINT)"
        ).alias("hhi")
    )
    band = (
        F.when(F.col("hhi") == _HHI_SCALE, "single-sourced")
        .when(F.col("hhi") >= _HHI_HIGH, "highly-concentrated")
        .when(F.col("hhi") >= _HHI_MODERATE, "moderate")
        .otherwise("diversified")
    )
    banded = per_part.select(band.alias("band"))
    tot = banded.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    return (
        banded.crossJoin(F.broadcast(tot))
        .groupBy("band", "n_total")
        .agg(F.count(F.lit(1)).cast("long").alias("n_parts"))
        .select(
            "band",
            "n_parts",
            (F.col("n_parts").cast("double") / F.col("n_total")).alias(
                "part_share"
            ),
        )
    )


# --------------------------------------------------------------------------
# E216: Kendall tau-b rank correlation (quantity vs discount)
# --------------------------------------------------------------------------

from .robuststats import _d128  # noqa: E402  (2^53-split wide-int -> double)


def _kendall_tau(idiv: str) -> str:
    # tau_b = (P - Q) / sqrt((n0 - Tx) * (n0 - Ty)); every operand is an
    # exact 128-bit integer converted via the 2^53-split (_d128) so the
    # one recompose rounding happens on identical operands both engines.
    return (
        f"({_d128('conc', idiv)} - {_d128('disc', idiv)})"
        f" / NULLIF(SQRT(({_d128('n0', idiv)} - {_d128('tx', idiv)})"
        f" * ({_d128('n0', idiv)} - {_d128('ty', idiv)})), 0.0)"
    )


@query(
    "kendall_tau_qty_discount",
    oracle=f"""
        WITH grid AS (
          SELECT CAST(l_quantity AS BIGINT) AS qv,
                 CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) AS dv,
                 CAST(COUNT(*) AS BIGINT) AS cnt
          FROM lineitem
          GROUP BY 1, 2
        ), pq AS (
          SELECT
            COALESCE(SUM(CASE WHEN b.dv > a.dv
              THEN CAST(a.cnt AS HUGEINT) * b.cnt END), 0) AS conc,
            COALESCE(SUM(CASE WHEN b.dv < a.dv
              THEN CAST(a.cnt AS HUGEINT) * b.cnt END), 0) AS disc
          FROM grid a JOIN grid b ON a.qv < b.qv
        ), qm AS (
          SELECT SUM((CAST(cq AS HUGEINT) * (cq - 1)) // 2) AS tx
          FROM (SELECT SUM(cnt) AS cq FROM grid GROUP BY qv)
        ), dm AS (
          SELECT SUM((CAST(cd AS HUGEINT) * (cd - 1)) // 2) AS ty
          FROM (SELECT SUM(cnt) AS cd FROM grid GROUP BY dv)
        ), tot AS (
          SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows,
                 (CAST(SUM(cnt) AS HUGEINT) * (SUM(cnt) - 1)) // 2 AS n0
          FROM grid
        )
        SELECT n_rows,
               {_d128('conc', '//')} AS concordant,
               {_d128('disc', '//')} AS discordant,
               {_kendall_tau('//')} AS tau_b
        FROM pq, qm, dm, tot
    """,
)
def kendall_tau_qty_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E216: Kendall tau-b between line quantity and discount — the
    rank-correlation companion to E173's Spearman rho, preferred when
    the data is heavily tied (both columns here have tiny domains, so
    ties dominate and tau-b's tie-corrected denominator is the honest
    choice; Spearman's tie algebra under-penalizes).

    The O(n^2) pair count never touches row pairs: both variables live
    on bounded DOMAINS (quantity 1..50, discount in 2-dp cents), so the
    lineitem table collapses to a <=|Q|x|D| contingency grid (<=550
    cells at ANY corpus size) and concordant/discordant pairs are
    cell-count products over the grid self-join -- the same
    domain-collapse argument as E134/E188. Tie terms come off the two
    marginals; all counts and products accumulate in 128-bit integers
    (HUGEINT / DECIMAL(38,0)) and reach doubles only through the
    2^53-split, so tau_b hash-gates at any SF.

    Scale: one map-side-combinable collapse to the grid, a broadcast
    self-join of a <=550-row frame, two marginal aggregates, and a
    shared-literal double chain on one row."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    grid = scoped_persist(
        li.groupBy(
            F.col("l_quantity").cast("long").alias("qv"),
            F.floor(F.col("l_discount") * 100 + F.lit(0.5))
            .cast("long")
            .alias("dv"),
        ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    a, b = grid.alias("a"), grid.alias("b")
    pq = (
        a.join(F.broadcast(b), F.col("a.qv") < F.col("b.qv"))
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("b.dv") > F.col("a.dv"),
                        dec(F.col("a.cnt")) * F.col("b.cnt"),
                    )
                ),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("conc"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("b.dv") < F.col("a.dv"),
                        dec(F.col("a.cnt")) * F.col("b.cnt"),
                    )
                ),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("disc"),
        )
    )
    qm = (
        grid.groupBy("qv")
        .agg(F.sum("cnt").alias("cq"))
        .agg(
            F.sum(
                F.expr("CAST((CAST(cq AS DECIMAL(38,0)) * (cq - 1))"
                       " div 2 AS DECIMAL(38,0))")
            ).alias("tx")
        )
    )
    dm = (
        grid.groupBy("dv")
        .agg(F.sum("cnt").alias("cd"))
        .agg(
            F.sum(
                F.expr("CAST((CAST(cd AS DECIMAL(38,0)) * (cd - 1))"
                       " div 2 AS DECIMAL(38,0))")
            ).alias("ty")
        )
    )
    tot = grid.agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.expr(
            "CAST((CAST(SUM(cnt) AS DECIMAL(38,0)) * (SUM(cnt) - 1))"
            " div 2 AS DECIMAL(38,0))"
        ).alias("n0"),
    )
    return (
        pq.crossJoin(F.broadcast(qm))
        .crossJoin(F.broadcast(dm))
        .crossJoin(F.broadcast(tot))
        .select(
            "n_rows",
            F.expr(_d128("conc", "div")).alias("concordant"),
            F.expr(_d128("disc", "div")).alias("discordant"),
            F.expr(_kendall_tau("div")).alias("tau_b"),
        )
    )


# --------------------------------------------------------------------------
# E217: Kruskal-Wallis rank test for value across event types
# --------------------------------------------------------------------------

#: chi-square 0.95 critical values for df 1..9 — decimal literals parse
#: to identical doubles in both engines (round-to-nearest).
_CHI2_05 = {
    1: "3.841458820694124",
    2: "5.991464547107979",
    3: "7.814727903251179",
    4: "9.487729036781154",
    5: "11.070497693516351",
    6: "12.591587243743977",
    7: "14.067140449340169",
    8: "15.50731305586545",
    9: "16.918977604620448",
}


def _kw_exprs(idiv: str) -> dict[str, str]:
    nd = _d128("n_tot", idiv)
    h = (
        f"(3.0 * {_d128('s_terms', idiv)} / ({nd} * ({nd} + 1.0))"
        f" - 3.0 * ({nd} + 1.0))"
    )
    c = f"(1.0 - {_d128('ties3', idiv)} / ({nd} * {nd} * {nd} - {nd}))"
    crit = "CASE " + " ".join(
        f"WHEN k - 1 = {df} THEN {v}" for df, v in _CHI2_05.items()
    ) + " END"
    return {
        "h": h,
        "c": c,
        "h_adj": f"({h} / NULLIF({c}, 0.0))",
        "crit": crit,
        "reject": f"(({h} / NULLIF({c}, 0.0)) > ({crit}))",
    }


def _kw_oracle() -> str:
    e = _kw_exprs("//")
    return f"""
        WITH vals AS (
          SELECT event_type,
                 CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM events WHERE value IS NOT NULL
          GROUP BY 1, 2
        ), pv AS (
          SELECT v, CAST(SUM(c) AS BIGINT) AS t,
                 1 + COALESCE(SUM(SUM(c)) OVER (
                   ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS rank_min
          FROM vals GROUP BY v
        ), per AS (
          SELECT event_type, CAST(SUM(c) AS BIGINT) AS n_i,
                 SUM(CAST(c AS HUGEINT)
                     * (2 * pv.rank_min + pv.t - 1)) AS r2
          FROM vals JOIN pv USING (v)
          GROUP BY event_type
        ), agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS k,
                 CAST(SUM(n_i) AS BIGINT) AS n_tot,
                 SUM((r2 * r2) // n_i) AS s_terms
          FROM per
        ), tie AS (
          SELECT SUM(CAST(t AS HUGEINT) * t * t - t) AS ties3 FROM pv
        )
        SELECT k AS n_groups, n_tot AS n_values,
               {e['h']} AS h_stat,
               {e['c']} AS tie_correction,
               {e['h_adj']} AS h_adj,
               k - 1 AS df,
               {e['reject']} AS reject_at_05
        FROM agg, tie
    """


@query("value_kruskal_wallis", oracle=_kw_oracle())
def value_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E217: Kruskal-Wallis H — the rank-based (distribution-free)
    counterpart of E169's one-way ANOVA: does the DISTRIBUTION of event
    value differ across event types, without assuming normal residuals?
    H = 12/(N(N+1)) * sum(R_i^2/n_i) - 3(N+1), tie-corrected by
    C = 1 - sum(t^3 - t)/(N^3 - N); with doubled average ranks
    (2*avg_rank = 2*rank_min + t - 1, always integral) the identity
    becomes H = 3*S/(N(N+1)) - 3(N+1) with S = sum(R2_i^2 / n_i).

    Exactness: the E188 value-domain collapse bounds the ranked frame by
    the 2-dp value DOMAIN, doubled rank sums and tie cubes accumulate in
    128-bit integers, the single inexact step per group is ONE floor
    division (identical op both engines, same waiver as E169), and the
    final chain is shared-literal doubles through the 2^53-split. The
    df<=9 chi-square critical values are shared decimal literals, so the
    reject flag hash-gates too. All-tied data gives C=0 -> NULL h_adj.

    Scale: one map-side collapse to |types|x|values|, a domain-bounded
    prefix-sum window, a |types|-row aggregate, two 1-row crossJoins."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    sv = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    vals = scoped_persist(
        ev.groupBy(F.col("event_type"), sv.alias("v")).agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    pv = scoped_persist(
        vals.groupBy("v")
        .agg(F.sum("c").cast("long").alias("t"))
        .select(
            "v",
            "t",
            (
                F.lit(1) + F.coalesce(F.sum("t").over(w), F.lit(0))
            ).alias("rank_min"),
        )
    )
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    per = (
        vals.join(pv, "v")
        .groupBy("event_type")
        .agg(
            F.sum("c").cast("long").alias("n_i"),
            F.sum(
                dec(F.col("c"))
                * (2 * F.col("rank_min") + F.col("t") - 1)
            ).alias("r2"),
        )
    )
    agg = per.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_i").cast("long").alias("n_tot"),
        F.sum(
            F.expr("CAST((r2 * r2) div n_i AS DECIMAL(38,0))")
        ).alias("s_terms"),
    )
    tie = pv.agg(
        F.sum(
            dec(F.col("t")) * F.col("t") * F.col("t") - F.col("t")
        ).alias("ties3")
    )
    e = _kw_exprs("div")
    return (
        agg.crossJoin(F.broadcast(tie))
        .select(
            F.col("k").alias("n_groups"),
            F.col("n_tot").alias("n_values"),
            F.expr(e["h"]).alias("h_stat"),
            F.expr(e["c"]).alias("tie_correction"),
            F.expr(e["h_adj"]).alias("h_adj"),
            (F.col("k") - 1).alias("df"),
            F.expr(e["reject"]).alias("reject_at_05"),
        )
    )


# --------------------------------------------------------------------------
# E233: population stability index (PSI) — log-free quarter-bit lattice
# --------------------------------------------------------------------------

from .text import _surprisal_steps  # noqa: E402  (integer log2 lattice)

#: ln(2)/4 — converts quarter-bit lattice differences to nats (the PSI
#: convention); shortest-round-trip literal, one multiply per bin.
_PSI_LN2_Q = "0.17328679513998632"
#: 1e-9 fixed point for the cross-engine-exact per-feature sum.
_PSI_SCALE = 1_000_000_000

_PSI_TERM = (
    f"CAST(FLOOR(ABS(CAST(la AS DOUBLE) / n1 - CAST(lb AS DOUBLE) / n2)"
    f" * ABS(qb_q - qb_p) * {_PSI_LN2_Q} * {_PSI_SCALE} + 0.5) AS BIGINT)"
)

_PSI_FEATURES_SPARK = (
    "stack(2, 'event_type', event_type,"
    " 'value_log2', CASE WHEN value IS NULL THEN CAST(NULL AS STRING)"
    " ELSE concat('v', LENGTH(BIN(CAST(FLOOR(value) AS BIGINT) + 1))) END)"
    " AS (feature, bin)"
)


def _psi_oracle() -> str:
    def chain(tag: str, out: str, start: str) -> tuple[str, str]:
        prev = start
        sql = ""
        for i, (col, expr) in enumerate(_surprisal_steps("duck")):
            nxt = f"{tag}{i}"
            sql += f", {nxt} AS (SELECT *, {expr} AS {col} FROM {prev})"
            prev = nxt
        sql += (
            f", {tag}_done AS (SELECT feature, bin, la, lb, n1, n2"
            + (", qb_p" if tag == "cq" else "")
            + f", qbits AS {out} FROM {prev})"
        )
        return sql, f"{tag}_done"

    p_sql, p_done = chain("cp", "qb_p", "pin")
    q_sql, q_done = chain("cq", "qb_q", "qin")
    return f"""
        WITH ev AS (
          SELECT date_diff('day', DATE '1992-01-01',
                           CAST(ts AS DATE)) AS day_idx,
                 event_type, value
          FROM events
        ), mid AS (
          SELECT (MIN(day_idx) + MAX(day_idx) + 1) // 2 AS mid_day FROM ev
        ), binned AS (
          SELECT f.feature, f.bin,
                 CASE WHEN ev.day_idx < mid.mid_day THEN 0 ELSE 1 END AS half
          FROM ev CROSS JOIN mid
          CROSS JOIN LATERAL (
            SELECT 'event_type' AS feature, ev.event_type AS bin
            UNION ALL
            SELECT 'value_log2',
                   CASE WHEN ev.value IS NULL THEN NULL
                        ELSE 'v' || LENGTH(BIN(CAST(FLOOR(ev.value)
                          AS BIGINT) + 1)) END
          ) f
          WHERE f.bin IS NOT NULL
        ), cells AS (
          SELECT feature, bin,
                 CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) + 1
                   AS BIGINT) AS la,
                 CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) + 1
                   AS BIGINT) AS lb
          FROM binned GROUP BY feature, bin
        ), ft AS (
          SELECT feature, CAST(SUM(la) AS BIGINT) AS n1,
                 CAST(SUM(lb) AS BIGINT) AS n2
          FROM cells GROUP BY feature
        ), pin AS (
          SELECT c.feature, c.bin, c.la, c.lb, ft.n1, ft.n2,
                 c.la AS num, ft.n1 AS den
          FROM cells c JOIN ft ON c.feature = ft.feature
        ){p_sql}, qin AS (
          SELECT feature, bin, la, lb, n1, n2, qb_p,
                 lb AS num, n2 AS den
          FROM {p_done}
        ){q_sql}
        SELECT feature,
               CAST(COUNT(*) AS BIGINT) AS n_bins,
               CAST(SUM({_PSI_TERM}) AS DOUBLE) / {_PSI_SCALE} AS psi
        FROM {q_done}
        GROUP BY feature
    """


@query("event_feature_psi", oracle=_psi_oracle())
def event_feature_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E233: population stability index — THE industry drift number every
    model-monitoring stack quotes (rule of thumb: <0.1 stable, 0.1-0.25
    watch, >0.25 re-fit) — for two event features (type mix; value
    magnitude via power-of-two buckets), comparing the first calendar
    half of the data against the second.  Complements the drift family:
    E104 TVD (bounded, no tail emphasis), E148 KS (max single gap), E203
    chi-square (significance); PSI weights each bin's share change by
    its log-ratio, which is what makes it sensitive to tail migration.

    PSI = sum_bins (p_i - q_i) * ln(p_i / q_i), Laplace +1 on both halves
    so empty bins are defined.  NO log is ever evaluated: ln(p/q) =
    (qbits(q) - qbits(p)) * ln2/4 on the E223 integer quarter-bit
    lattice (each half's -log2 runs the num<=den chain against its own
    total, so no cross-product can overflow), and both factors of each
    term carry the same sign mathematically, so the product of absolute
    values is exact up to the documented <=1/2-bit lattice error —
    deterministic and bit-identical across engines, unlike any libm-ln
    variant.  Terms quantize to 1e-9 before the per-feature sum.

    Scale: one map-side stack + keyed count collapses any volume to the
    (feature, bin) frame (|types| + ~10 value buckets); the midpoint is
    a 1-row crossJoin; the lattice chains are per-bin scalar ops on that
    tiny frame."""
    ev = load_table(spark, sf_dir, "events").select(
        F.datediff(
            F.col("ts").cast("date"), F.lit("1992-01-01").cast("date")
        ).alias("day_idx"),
        "event_type",
        "value",
    )
    mid = ev.agg(
        F.expr("CAST((MIN(day_idx) + MAX(day_idx) + 1) DIV 2 AS BIGINT)")
        .alias("mid_day")
    )
    binned = (
        ev.crossJoin(F.broadcast(mid))
        .select(
            F.expr(_PSI_FEATURES_SPARK),
            F.when(F.col("day_idx") < F.col("mid_day"), 0)
            .otherwise(1)
            .alias("half"),
        )
        .filter(F.col("bin").isNotNull())
    )
    cells = binned.groupBy("feature", "bin").agg(
        (F.sum(F.when(F.col("half") == 0, 1).otherwise(0)) + 1)
        .cast("long")
        .alias("la"),
        (F.sum(F.when(F.col("half") == 1, 1).otherwise(0)) + 1)
        .cast("long")
        .alias("lb"),
    )
    return psi_from_cells(cells)


def psi_from_cells(cells: DataFrame) -> DataFrame:
    """Lattice PSI from a Laplace-smoothed cell frame (feature, bin,
    la, lb) — shared by the batch halves query above and the streaming
    drift monitor (streaming/drift_stream.py), which feeds la from a
    frozen baseline table and lb from live maintained counts."""
    ft = cells.groupBy("feature").agg(
        F.sum("la").cast("long").alias("n1"),
        F.sum("lb").cast("long").alias("n2"),
    )
    scored = cells.join(F.broadcast(ft), "feature").select(
        "feature",
        "bin",
        "la",
        "lb",
        "n1",
        "n2",
        F.col("la").alias("num"),
        F.col("n1").alias("den"),
    )
    for col, expr in _surprisal_steps("spark"):
        scored = scored.withColumn(col, F.expr(expr))
    scored = scored.select(
        "feature",
        "bin",
        "la",
        "lb",
        "n1",
        "n2",
        F.col("qbits").alias("qb_p"),
        F.col("lb").alias("num"),
        F.col("n2").alias("den"),
    )
    for col, expr in _surprisal_steps("spark"):
        scored = scored.withColumn(col, F.expr(expr))
    scored = scored.withColumn("qb_q", F.col("qbits"))
    return scored.groupBy("feature").agg(
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        (
            F.sum(F.expr(_PSI_TERM)).cast("double") / _PSI_SCALE
        ).alias("psi"),
    )


# --------------------------------------------------------------------------
# E241: group-sequential A/B monitoring (O'Brien-Fleming boundaries)
# --------------------------------------------------------------------------

#: O'Brien-Fleming SQUARED z boundaries for K=5 equally-spaced looks at
#: two-sided alpha=0.05: z_k = 2.0403 * sqrt(K/k), squared so the
#: comparison is against E85's sqrt-free z^2 statistic. Constants are
#: the classic published values (Jennison & Turnbull table 2.3 shape).
OBF_K = 5
OBF_Z2 = (20.8141, 10.4070, 6.9380, 5.2035, 4.1628)

#: E85's z^2 chain over exact integer columns (n_a, conv_a, n_b, conv_b)
#: — identical text in both engines.
_OBF_Z2_EXPR = (
    "((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)"
    " * (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)"
    " / NULLIF((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))"
    " * (1 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))"
    " * (1.0 / n_a + 1.0 / n_b), 0.0))"
)

#: Bare decimal literals parse as DECIMAL in BOTH engines; the driver
#: canonicalizes Spark Decimal objects and DuckDB float64 differently,
#: so the CASE is cast to DOUBLE once here (shared by query + oracle).
_OBF_BOUND_SQL = "CAST(CASE " + " ".join(
    f"WHEN look = {k + 1} THEN {b}" for k, b in enumerate(OBF_Z2)
) + " END AS DOUBLE)"


@query(
    "ab_sequential_obf",
    oracle=f"""
        WITH ev AS (
          SELECT user_id,
                 date_diff('day', DATE '1992-01-01', CAST(ts AS DATE))
                   AS day_idx,
                 event_type
          FROM events
        ), per_user AS (
          SELECT user_id, MIN(day_idx) AS first_day,
                 MIN(CASE WHEN event_type = 'purchase' THEN day_idx END)
                   AS conv_day
          FROM ev GROUP BY user_id
        ), bounds AS (
          SELECT MIN(day_idx) AS d0, MAX(day_idx) AS d1 FROM ev
        ), fanned AS (
          SELECT u.user_id, u.first_day, u.conv_day, l.look,
                 b.d0 + ((b.d1 - b.d0) * l.look + {OBF_K} - 1)
                   // {OBF_K} AS cutoff
          FROM per_user u CROSS JOIN bounds b
          CROSS JOIN (
            {" UNION ALL ".join(f"SELECT {k} AS look"
                                for k in range(1, OBF_K + 1))}
          ) l
        ), looks AS (
          SELECT look, MAX(cutoff) AS cutoff_day,
                 CAST(COUNT(*) FILTER (WHERE first_day <= cutoff
                   AND user_id % 2 = 0) AS BIGINT) AS n_a,
                 CAST(COUNT(*) FILTER (WHERE conv_day <= cutoff
                   AND user_id % 2 = 0) AS BIGINT) AS conv_a,
                 CAST(COUNT(*) FILTER (WHERE first_day <= cutoff
                   AND user_id % 2 = 1) AS BIGINT) AS n_b,
                 CAST(COUNT(*) FILTER (WHERE conv_day <= cutoff
                   AND user_id % 2 = 1) AS BIGINT) AS conv_b
          FROM fanned GROUP BY look
        ), scored AS (
          SELECT look, cutoff_day, n_a, conv_a, n_b, conv_b,
                 {_OBF_Z2_EXPR} AS z2,
                 {_OBF_BOUND_SQL} AS z2_boundary
          FROM looks
        ), first_x AS (
          SELECT MIN(CASE WHEN z2 >= z2_boundary THEN look END) AS fx
          FROM scored
        )
        SELECT s.look, s.cutoff_day, s.n_a, s.conv_a, s.n_b, s.conv_b,
               s.z2, s.z2_boundary,
               COALESCE(s.z2 >= s.z2_boundary, FALSE) AS crossed,
               COALESCE(s.look = f.fx, FALSE) AS is_first_crossing
        FROM scored s CROSS JOIN first_x f
    """,
)
def ab_sequential_obf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E241: group-sequential experiment monitoring with O'Brien-Fleming
    stopping boundaries — the guard rail against the peeking problem:
    re-running E85's fixed-horizon z-test on every dashboard refresh
    inflates false positives severalfold, while OBF spends almost no
    alpha early (|z| must beat 4.56 at the first of five looks) and
    converges to ~2.04 at the end, preserving the overall 0.05 level.
    Each look scores the CUMULATIVE cohorts as of its calendar cutoff
    (users enter at their first event; conversions count once
    purchased), flags boundary crossings, and marks the FIRST crossing
    — the early-stop decision an experimentation platform automates.

    Exactness: cutoffs and cumulative counts are exact integers (the
    constant 5x user fan-out mirrors E238's lattice move); z² reuses
    E85's sqrt-free fixed double chain; boundaries are literal squared
    constants, so 'crossed' is a pure comparison.

    Scale: one per-user aggregate, a 1-row calendar-bounds crossJoin,
    constant 5x fan-out, one (look x arm) rollup to a 5-row frame —
    nothing volume-sized past the first aggregate."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.datediff(
            F.col("ts").cast("date"), F.lit("1992-01-01").cast("date")
        ).alias("day_idx"),
        "event_type",
    )
    per_user = ev.groupBy("user_id").agg(
        F.min("day_idx").alias("first_day"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("day_idx"))
        ).alias("conv_day"),
    )
    bounds = ev.agg(
        F.min("day_idx").alias("d0"), F.max("day_idx").alias("d1")
    )
    fanned = (
        per_user.crossJoin(F.broadcast(bounds))
        .select(
            "user_id",
            "first_day",
            "conv_day",
            F.explode(
                F.array(*[F.lit(k) for k in range(1, OBF_K + 1)])
            ).alias("look"),
            "d0",
            "d1",
        )
        .select(
            "user_id",
            "first_day",
            "conv_day",
            "look",
            F.expr(
                f"d0 + ((d1 - d0) * look + {OBF_K} - 1) DIV {OBF_K}"
            ).alias("cutoff"),
        )
    )
    is_a = F.col("user_id") % 2 == 0
    looks = fanned.groupBy("look").agg(
        F.max("cutoff").alias("cutoff_day"),
        F.count(F.when((F.col("first_day") <= F.col("cutoff")) & is_a, 1))
        .cast("long")
        .alias("n_a"),
        F.count(F.when((F.col("conv_day") <= F.col("cutoff")) & is_a, 1))
        .cast("long")
        .alias("conv_a"),
        F.count(
            F.when((F.col("first_day") <= F.col("cutoff")) & ~is_a, 1)
        )
        .cast("long")
        .alias("n_b"),
        F.count(
            F.when((F.col("conv_day") <= F.col("cutoff")) & ~is_a, 1)
        )
        .cast("long")
        .alias("conv_b"),
    )
    scored = looks.select(
        "look",
        "cutoff_day",
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.expr(_OBF_Z2_EXPR).alias("z2"),
        F.expr(_OBF_BOUND_SQL).alias("z2_boundary"),
    )
    first_x = scored.agg(
        F.min(
            F.when(F.col("z2") >= F.col("z2_boundary"), F.col("look"))
        ).alias("fx")
    )
    return scored.crossJoin(F.broadcast(first_x)).select(
        "look",
        "cutoff_day",
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        "z2",
        "z2_boundary",
        F.coalesce(
            F.col("z2") >= F.col("z2_boundary"), F.lit(False)
        ).alias("crossed"),
        F.coalesce(F.col("look") == F.col("fx"), F.lit(False)).alias(
            "is_first_crossing"
        ),
    )
