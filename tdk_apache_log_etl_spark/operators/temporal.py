"""Temporal join operators the reference lacks (SURVEY.md §2.5 verified
absences; driver north-star "custom operators" category): as-of join and
range join, built as compositions of existing DataFrame ops — no custom
physical operator needed, and no O(n·m) nested-loop join at any scale.

As-of join (point-in-time lookup): for each event, the most recent order of
the same customer at-or-before the event time. The scalable shape is the
union-and-carry-forward trick: tag both sides, union them, sort within the
user partition by time, and carry the last order's attributes forward with
``last(..., ignorenulls=True)``. ONE shuffle on the join key; contrast with
a per-event subquery (quadratic) or an inequality join (nested loop).

Range join (interval containment): pairs of events within a bounded time
window. The scalable shape is bucketization: quantize time into
window-sized buckets so each pair lands in the same or adjacent bucket,
equi-join on (key, bucket) ∪ (key, bucket+1), then apply the exact range
predicate. The equi-join hash-partitions both sides — no cross product —
and the bound guarantees each pair is found exactly once after the filter.

Both have exact ANSI-SQL oracles (DuckDB ASOF JOIN / inequality join) — a
true differential test of independent implementations.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query, scoped_persist


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tie_break: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Generic as-of join: for every ``left`` row, attach the ``right`` row
    with the greatest ``right_ts`` <= ``left_ts`` within the same ``on`` key
    (``direction="backward"``, the default), or the smallest ``right_ts``
    >= ``left_ts`` (``direction="forward"``).

    Union both sides with a side marker, window-sort by (ts, side) within
    the key partition — right rows sort BEFORE left rows at equal ts so
    ties match (<= semantics, like DuckDB ASOF) — and carry the right
    attributes forward. One shuffle, linear, skew governed by the key.

    The carry is ONE struct of all right_cols, not per-column last()s: a
    per-column carry with ignorenulls would smear an older row's non-null
    value over a matched row whose attribute is legitimately NULL. The
    struct is non-null exactly for right rows, so last(struct,
    ignorenulls) finds the latest matching ROW and its fields come back
    verbatim — NULLs included.

    ``tie_break`` (a right-side column, e.g. a primary key) disambiguates
    multiple right rows at the same (key, ts): the max-tie_break row wins.
    This replaces a pre-aggregation of the right side — the tie-break rides
    the sort the window already does, where a groupBy dedup would cost its
    own exchange of the whole right side first.
    """
    l_tagged = left.withColumn("_t", F.col(left_ts)).withColumn(
        "_is_left", F.lit(1)
    )
    for c in right_cols:
        l_tagged = l_tagged.withColumn(c, F.lit(None).cast(dict(right.dtypes)[c]))
    r_tagged = (
        right.select(
            F.col(on),
            F.col(right_ts).alias("_t"),
            F.lit(0).alias("_is_left"),
            *right_cols,
        )
    )
    for c in left.columns:
        if c not in (on,):
            r_tagged = r_tagged.withColumn(
                c, F.lit(None).cast(dict(left.dtypes)[c])
            )
    unioned = l_tagged.select(
        on, "_t", "_is_left", *right_cols, *[c for c in left.columns if c != on]
    ).unionByName(
        r_tagged.select(
            on, "_t", "_is_left", *right_cols, *[c for c in left.columns if c != on]
        )
    )
    if direction == "backward":
        order_cols = [F.col("_t").asc(), F.col("_is_left").asc()]
        if tie_break is not None:
            # Right rows at equal (key, ts) sort by tie_break ascending, so
            # the carried-forward last() is the max-tie_break row. Left rows
            # hold NULL here; nulls_first keeps them ordered after is_left
            # anyway.
            order_cols.append(F.col(tie_break).asc_nulls_first())
        frame = (Window.unboundedPreceding, Window.currentRow)
    else:
        # forward: left rows sort BEFORE right rows at equal ts (>= match),
        # and the carry runs ahead — first() finds the EARLIEST right row
        # at-or-after; tie ascending makes the min-tie_break row win.
        order_cols = [F.col("_t").asc(), F.col("_is_left").desc()]
        if tie_break is not None:
            order_cols.append(F.col(tie_break).asc_nulls_last())
        frame = (Window.currentRow, Window.unboundedFollowing)
    w = (
        Window.partitionBy(on)
        .orderBy(*order_cols)
        .rowsBetween(*frame)
    )
    payload = F.when(F.col("_is_left") == 0, F.struct(*right_cols))
    carry = F.last if direction == "backward" else F.first
    carried = unioned.select(
        "*", carry(payload, ignorenulls=True).over(w).alias("_asof_p")
    )
    out = carried.filter(F.col("_is_left") == 1).drop(
        "_t", "_is_left", *right_cols
    )
    return out.select(
        *[c for c in out.columns if c != "_asof_p"],
        *[F.col(f"_asof_p.{c}").alias(c) for c in right_cols],
    )


@query(
    "asof_join_last_order",
    oracle="""
        WITH o AS (
          SELECT o_custkey, o_orderdate,
                 MAX(o_orderkey) AS o_orderkey,
                 MAX_BY(o_totalprice, o_orderkey) AS o_totalprice
          FROM orders GROUP BY 1, 2
        )
        SELECT e.event_id, e.user_id,
               strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
               o.o_orderkey AS last_orderkey,
               o.o_totalprice AS last_totalprice
        FROM events e
        ASOF LEFT JOIN o
          ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
)
def asof_join_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event gets the customer's most recent order
    at-or-before the event time. The DuckDB oracle uses the built-in ASOF
    JOIN — an independent implementation of the same semantics (with an
    explicit same-day dedup, since DuckDB's ASOF picks arbitrarily among
    equal-timestamp matches; ours resolves them via the window tie-break
    without a separate aggregation pass)."""
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        "o_orderdate",
        "o_orderkey",
        "o_totalprice",
    )
    joined = asof_join(
        events,
        orders,
        on="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        right_cols=["o_orderkey", "o_totalprice"],
        tie_break="o_orderkey",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_totalprice").alias("last_totalprice"),
    )


RANGE_JOIN_WINDOW_SECONDS = 1800


@query(
    "range_join_click_purchase",
    oracle=f"""
        SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
               CAST(floor(epoch(p.ts)) AS BIGINT)
                 - CAST(floor(epoch(c.ts)) AS BIGINT) AS lag_seconds
        FROM events c JOIN events p
          ON c.user_id = p.user_id
         AND c.event_type = 'click' AND p.event_type = 'purchase'
         AND p.ts > c.ts
         AND p.ts <= c.ts + INTERVAL {RANGE_JOIN_WINDOW_SECONDS} SECOND
    """,
)
def range_join_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join via bucketization: purchases within 30 minutes AFTER a
    click by the same user.

    Quantizing event time into window-sized buckets turns the inequality
    join into an equi-join on (user_id, bucket): a purchase at most
    ``window`` after a click is in the click's bucket or the next one, so
    the click side is expanded to 2 bucket keys (explode of a 2-element
    array — bounded, not a cross join) and the exact predicate filters the
    joined pairs. Spark plans a hash join on (user_id, bucket); without the
    buckets it would fall back to BroadcastNestedLoopJoin — quadratic.
    """
    events = load_table(spark, sf_dir, "events")
    win = RANGE_JOIN_WINDOW_SECONDS
    # Seconds since a fixed NTZ origin — session-timezone-INDEPENDENT
    # (unix_timestamp(cast(ntz as timestamp)) renders via the session tz
    # and would move bucket boundaries under a non-UTC driver).
    epoch = F.expr("timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
            epoch.alias("click_epoch"),
            F.floor(epoch / win).alias("b0"),
        )
        .select(
            "click_id",
            "user_id",
            "click_ts",
            "click_epoch",
            F.explode(F.array(F.col("b0"), F.col("b0") + 1)).alias("bucket"),
        )
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        epoch.alias("purchase_epoch"),
        F.floor(epoch / win).alias("bucket"),
    )
    return (
        clicks.join(purchases, ["user_id", "bucket"])
        .filter(
            (F.col("purchase_ts") > F.col("click_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("click_ts") + F.expr(f"INTERVAL {win} SECONDS")
            )
        )
        .select(
            "click_id",
            "purchase_id",
            "user_id",
            # Difference of floor-epochs, matching the oracle's
            # floor(epoch()) arithmetic exactly (timestampdiff truncates the
            # interval instead and disagrees on sub-second components).
            (F.col("purchase_epoch") - F.col("click_epoch")).alias("lag_seconds"),
        )
    )


@query(
    "asof_join_next_order",
    oracle="""
        SELECT e.event_id, e.user_id,
               strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
               c.o_orderkey AS next_orderkey,
               c.o_totalprice AS next_totalprice
        FROM events e LEFT JOIN (
          SELECT * FROM (
            SELECT e2.event_id AS eid, o.o_orderkey, o.o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY e2.event_id
                                      ORDER BY o.o_orderdate, o.o_orderkey)
                     AS rn
            FROM events e2 JOIN orders o
              ON e2.user_id = o.o_custkey AND o.o_orderdate >= e2.ts
          ) WHERE rn = 1
        ) c ON c.eid = e.event_id
    """,
)
def asof_join_next_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: each event gets the customer's FIRST order
    at-or-after the event time (the fulfillment-lookup direction; the
    backward twin above is the attribution direction). Same union +
    carry shape run forward — one shuffle on the key, a first() over the
    forward frame instead of last() over the backward one. The oracle is
    an independent inequality-join + ROW_NUMBER decorrelation with the
    identical (orderdate, orderkey) tie-break."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        "o_orderdate",
        "o_orderkey",
        "o_totalprice",
    )
    joined = asof_join(
        events,
        orders,
        on="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        right_cols=["o_orderkey", "o_totalprice"],
        tie_break="o_orderkey",
        direction="forward",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        F.col("o_orderkey").alias("next_orderkey"),
        F.col("o_totalprice").alias("next_totalprice"),
    )


#: Gap threshold for the rapid-reorder chain query.
CHAIN_GAP_DAYS = 30

_CHAIN_SQL_ORACLE = f"""
WITH RECURSIVE nxt AS (
  SELECT o_custkey, o_orderkey,
         CAST(o_orderdate AS DATE) AS d,
         LEAD(o_orderkey) OVER w AS nk,
         LEAD(CAST(o_orderdate AS DATE)) OVER w AS nd,
         LAG(CAST(o_orderdate AS DATE)) OVER w AS pd
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
),
edges AS (
  SELECT o_orderkey AS src, nk AS dst FROM nxt
  WHERE nk IS NOT NULL AND date_diff('day', d, nd) <= {CHAIN_GAP_DAYS}
),
heads AS (
  SELECT o_custkey, o_orderkey AS head FROM nxt
  WHERE pd IS NULL OR date_diff('day', pd, d) > {CHAIN_GAP_DAYS}
),
chain(o_custkey, head, tail, len) AS (
  SELECT o_custkey, head, head, 1 FROM heads
  UNION ALL
  SELECT c.o_custkey, c.head, e.dst, c.len + 1
  FROM chain c JOIN edges e ON e.src = c.tail
)
SELECT o_custkey, head AS head_orderkey, CAST(MAX(len) AS BIGINT) AS chain_len
FROM chain GROUP BY o_custkey, head HAVING MAX(len) >= 2
"""

_CHAIN_RECURSION_SQL = """
WITH RECURSIVE chain(o_custkey, head, tail, len) AS (
  SELECT o_custkey, head, head, 1 FROM {heads}
  UNION ALL
  SELECT c.o_custkey, c.head, e.dst, c.len + 1
  FROM chain c JOIN {edges} e ON e.src = c.tail
)
SELECT o_custkey, head AS head_orderkey, CAST(MAX(len) AS BIGINT) AS chain_len
FROM chain GROUP BY o_custkey, head HAVING MAX(len) >= 2
"""


@query("order_chains_recursive_sql", oracle=_CHAIN_SQL_ORACLE)
def order_chains_recursive_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rapid-reorder chains — maximal runs of a customer's consecutive
    orders each placed within {CHAIN_GAP_DAYS} days of the previous one —
    via Spark 4's recursive CTE (WITH RECURSIVE, new in 4.0). Chain
    membership is a PATH property (each link must individually satisfy
    the gap), which a single window cannot express; the recursion walks
    lead()-derived next-order edges from each chain head. The edge
    relation is functional (≤1 successor per order) and time-ordered
    (acyclic), so each recursion step is a linear equi-join with no
    path explosion and guaranteed termination — rounds = longest chain,
    the same bound the Pregel loop in operators/dedup.py pays per
    component diameter.

    The edge/head relations are built ONCE in DataFrame land and
    localCheckpoint'ed before the recursion: CTE inlining would
    otherwise re-run the lead/lag window inside every recursion round
    (measured 3.3 s → 1.9 s at sf0.1 from this alone) — the same
    materialize-what-iterates rule the dedup loop applies. The DuckDB
    oracle runs the whole thing as one recursive SQL statement; only
    chain heads with length ≥ 2 are returned."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    d = F.col("o_orderdate").cast("date")
    nxt = orders.select(
        "o_custkey",
        "o_orderkey",
        d.alias("d"),
        F.lead("o_orderkey").over(w).alias("nk"),
        F.lead(d).over(w).alias("nd"),
        F.lag(d).over(w).alias("pd"),
    )
    edges = (
        nxt.where(
            F.col("nk").isNotNull()
            & (F.datediff("nd", "d") <= CHAIN_GAP_DAYS)
        )
        .select(F.col("o_orderkey").alias("src"), F.col("nk").alias("dst"))
        .localCheckpoint(eager=True)
    )
    heads = (
        nxt.where(
            F.col("pd").isNull()
            | (F.datediff("d", "pd") > CHAIN_GAP_DAYS)
        )
        .select("o_custkey", F.col("o_orderkey").alias("head"))
        .localCheckpoint(eager=True)
    )
    # Per-call view names: createOrReplaceTempView on a fixed name is
    # session-global state — it clobbers same-named views and races when
    # queries share one session. spark.sql() analyzes eagerly (the view
    # plans are inlined at parse time), so the views can be dropped
    # immediately; the localCheckpoint RDDs keep the data alive for the
    # recursion itself and fall to GC with the returned frame.
    # Spark guards runaway recursions with a 1M-row accumulation limit
    # (spark.sql.cteRecursionRowLimit) — correct for unbounded graphs,
    # but THIS recursion is structurally terminating (functional acyclic
    # edge relation: every row belongs to exactly one finite chain), so
    # total rows scale with the order count and trip the guard at ~1.5M
    # orders (found by the 10× scaling study, SCALE.md). Lift the ROW
    # guard; keep the LEVEL guard (rounds = longest chain, which data
    # can't grow past pathology without indicating a real bug).
    if int(spark.conf.get("spark.sql.cteRecursionRowLimit")) != -1:
        spark.conf.set("spark.sql.cteRecursionRowLimit", "-1")
    suffix = uuid.uuid4().hex
    edges_view = f"chain_edges_{suffix}"
    heads_view = f"chain_heads_{suffix}"
    edges.createOrReplaceTempView(edges_view)
    heads.createOrReplaceTempView(heads_view)
    try:
        return spark.sql(
            _CHAIN_RECURSION_SQL.format(edges=edges_view, heads=heads_view)
        )
    finally:
        spark.catalog.dropTempView(edges_view)
        spark.catalog.dropTempView(heads_view)


@query(
    "user_daily_value_locf",
    oracle="""
        WITH daily AS (
          SELECT user_id, CAST(ts AS DATE) AS day, value,
                 ROW_NUMBER() OVER (
                   PARTITION BY user_id, CAST(ts AS DATE)
                   ORDER BY ts DESC, event_id DESC
                 ) AS rn
          FROM events
        ), last_daily AS (
          SELECT user_id, day, value FROM daily WHERE rn = 1
        ), bounds AS (
          SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1
          FROM events
        ), spine AS (
          SELECT u.user_id, s.day
          FROM (SELECT DISTINCT user_id FROM events) u,
               (SELECT unnest(generate_series(d0, d1,
                              INTERVAL 1 DAY))::DATE AS day
                FROM bounds) s
        )
        SELECT sp.user_id, sp.day,
               LAST_VALUE(ld.value IGNORE NULLS) OVER (
                 PARTITION BY sp.user_id ORDER BY sp.day
                 ROWS UNBOUNDED PRECEDING
               ) AS value_filled,
               ld.value IS NOT NULL AS observed
        FROM spine sp LEFT JOIN last_daily ld
          ON ld.user_id = sp.user_id AND ld.day = sp.day
    """,
)
def user_daily_value_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily resampling with last-observation-carried-forward —
    the feature-store primitive that turns an irregular event stream
    into a dense per-key daily panel (gap days inherit the most recent
    observed value; days before a user's first observation stay NULL).

    Differs from the GLOBAL spines (daily_revenue_gapfilled /
    _interpolated): the spine here is per-key. Fan-out is bounded by
    construction — the corpus collapses to one row per (user, day)
    BEFORE the spine join, day bounds ride a 1-row crossJoin (same
    shape as rolling_wau), each user explodes into at most |days| rows,
    and the LOCF window runs over |days|-bounded per-user frames on the
    same user partitioning the spine join just produced. All values are
    carried, never recomputed — engine-exact by construction."""
    events = load_table(spark, sf_dir, "events")
    daily_w = Window.partitionBy(
        "user_id", F.to_date("ts")
    ).orderBy(F.desc("ts"), F.desc("event_id"))
    last_daily = (
        events.select(
            "user_id",
            F.to_date("ts").alias("day"),
            "value",
            F.row_number().over(daily_w).alias("rn"),
        )
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    bounds = events.agg(
        F.min(F.to_date("ts")).alias("d0"),
        F.max(F.to_date("ts")).alias("d1"),
    )
    spine = (
        events.select("user_id")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "user_id",
            F.explode(
                F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
            ).alias("day"),
        )
    )
    locf = Window.partitionBy("user_id").orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        spine.join(last_daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.last("value", ignorenulls=True).over(locf).alias(
                "value_filled"
            ),
            F.col("value").isNotNull().alias("observed"),
        )
    )


# ---------------------------------------------------------------------------
# E74: time-weighted average over validity intervals
# ---------------------------------------------------------------------------

#: 2-decimal fixed point for the weighted products: value_scaled ×
#: microsecond durations stay far below BIGINT range (≤ ~1e4 × month-span
#: ≈ 2.7e16 per user) where the standard 4-decimal scale would run within
#: 4× of overflow.
_TW_VSCALE = 100


@query(
    "user_time_weighted_value",
    oracle=f"""
        WITH seg AS (
          SELECT user_id,
                 CAST(FLOOR(value * {_TW_VSCALE} + 0.5) AS BIGINT)
                   AS v_scaled,
                 date_diff('microsecond', ts,
                           LEAD(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)) AS dur_us
          FROM events
          WHERE user_id IS NOT NULL AND value IS NOT NULL
        )
        SELECT user_id,
               CAST(SUM(v_scaled * dur_us) AS DOUBLE) / SUM(dur_us)
                 / {_TW_VSCALE} AS tw_avg_value,
               CAST(SUM(dur_us) AS BIGINT) AS active_us,
               CAST(COUNT(*) AS BIGINT) AS n_intervals
        FROM seg
        WHERE dur_us IS NOT NULL AND dur_us > 0
        GROUP BY user_id
    """,
)
def user_time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E74: time-weighted mean of a stepwise metric — each reading is
    valid until the user's next reading, so its weight is the interval
    length, not 1. The plain AVG the reference could compute
    over-weights bursts of rapid readings; the time-weighted form is
    the standard for billing meters / utilization / sensor gauges.

    One lead() window and the final aggregate share a single user_id
    shuffle. Weights are exact integer MICROSECONDS (both engines count
    whole microseconds — no per-engine second-truncation convention to
    pin) and values are fixed-point, so every product and sum is an
    exact BIGINT; zero-length intervals (duplicate timestamps) drop in
    both engines."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = events.select(
        "user_id",
        F.floor(F.col("value") * _TW_VSCALE + F.lit(0.5))
        .cast("long")
        .alias("v_scaled"),
        F.timestamp_diff(
            "MICROSECOND", F.col("ts"), F.lead("ts").over(w)
        ).alias("dur_us"),
    )
    return (
        seg.filter(F.col("dur_us").isNotNull() & (F.col("dur_us") > 0))
        .groupBy("user_id")
        .agg(
            (
                F.sum(F.col("v_scaled") * F.col("dur_us")).cast("double")
                / F.sum("dur_us")
                / _TW_VSCALE
            ).alias("tw_avg_value"),
            F.sum("dur_us").cast("long").alias("active_us"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
    )


# --------------------------------------------------------------------------
# E98: order-fulfillment lag (counting percentiles on a bounded domain)
# --------------------------------------------------------------------------


@query(
    "order_ship_lag_stats",
    oracle="""
        WITH lags AS (
          SELECT o.o_orderpriority,
                 CAST(datediff('day', CAST(o.o_orderdate AS DATE),
                        CAST(min(l.l_shipdate) AS DATE)) AS BIGINT)
                   AS lag_days
          FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
          GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
        )
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(lag_days) AS DOUBLE) / count(*) AS avg_lag_days,
               CAST(quantile_disc(lag_days, 0.5) AS BIGINT)  AS p50_lag,
               CAST(quantile_disc(lag_days, 0.95) AS BIGINT) AS p95_lag
        FROM lags GROUP BY o_orderpriority
    """,
)
def order_ship_lag_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E98: days from order placement to FIRST shipment, summarized per
    priority class (n, mean, p50, p95) — the fulfillment-SLA readout.
    The percentiles are EXACT but never buffer per-group values: lag is
    an integer-day domain, so the distribution collapses to
    (priority, lag_days) counts and the order statistics come from a
    cumulative-count window over that bounded frame — p50 is the least
    lag with 2·cum ≥ n, p95 the least with 20·cum ≥ 19·n (integer
    comparisons ≡ the quantile_disc ceil(q·n)−1 convention, so the
    oracle can use quantile_disc directly). This counting-percentile
    pattern is the scale answer wherever the metric's domain is small
    even though the row count isn't.

    Scale: one orderkey join collapse (min shipdate rides the same
    aggregate), then the frame is |priorities| × |lag domain| — a few
    hundred rows at any corpus size. The mean is an exact BIGINT sum
    over one double division."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lags = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
        .agg(F.min("l_shipdate").alias("first_ship"))
        .select(
            "o_orderpriority",
            F.datediff(
                F.col("first_ship").cast("date"),
                F.col("o_orderdate").cast("date"),
            )
            .cast("long")
            .alias("lag_days"),
        )
    )
    dist = lags.groupBy("o_orderpriority", "lag_days").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wcum = (
        Window.partitionBy("o_orderpriority")
        .orderBy("lag_days")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("o_orderpriority")
    cum = dist.select(
        "o_orderpriority",
        "lag_days",
        "cnt",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wtot).alias("n"),
    )
    return cum.groupBy("o_orderpriority").agg(
        F.max("n").alias("n_orders"),
        (
            F.sum(F.col("lag_days") * F.col("cnt")).cast("double")
            / F.max("n")
        ).alias("avg_lag_days"),
        F.min(
            F.when(2 * F.col("cum") >= F.col("n"), F.col("lag_days"))
        ).alias("p50_lag"),
        F.min(
            F.when(20 * F.col("cum") >= 19 * F.col("n"), F.col("lag_days"))
        ).alias("p95_lag"),
    )


# --------------------------------------------------------------------------
# E108: capped sessionization (gap OR max-duration split)
# --------------------------------------------------------------------------

#: Session breaks on >30 min inactivity OR when the session's total
#: duration would exceed 4 h (the cap product-analytics tools apply so a
#: long-polling bot can't produce a week-long "session").
SESSION_GAP_S = 1800
SESSION_CAP_S = 4 * 3600

#: Per-user event budget for the sequential walk. A pathological
#: mega-user (bot hammering one id) would otherwise serialize one
#: partition — the walk is inherently per-key sequential, so the bound
#: has to come from truncation, not parallelism. Users over the cap
#: process their first CAP events (by ts, event_id) and are flagged in
#: the explicit `truncated` output column; 100k events is ~35 days of
#: 1 event/30 s, far beyond any human session horizon.
EVENTS_PER_USER_CAP = 100_000

_CAPPED_SCHEMA = (
    "user_id long, n_events long, n_sessions long, "
    "n_gap_splits long, n_cap_splits long, truncated boolean"
)


def _capped_sessions_block(pdf):
    """Vectorized stats for ONE block of complete users, pre-sorted by
    (user_id, ts, event_id). Gap splits come from one numpy diff
    (floor-seconds > GAP ⟺ Δns ≥ (GAP+1)·1e9, the integer-floor
    identity); within each gap-free segment the cap splits advance by
    SEARCHSORTED, so Python iterates once per SESSION, never per event.
    Gap is checked before cap by construction (a gap boundary opens a
    new segment before any cap test) — precedence mirrored in the
    recursive oracle."""
    import numpy as np
    import pandas as pd

    # normalize to ns explicitly: Arrow may hand the column over as us
    ns = pdf["ts"].astype("datetime64[ns]").astype("int64").to_numpy()
    uid = pdf["user_id"].to_numpy()
    NS = 1_000_000_000
    n = len(pdf)
    new_user = np.empty(n, dtype=bool)
    new_user[0] = True
    new_user[1:] = uid[1:] != uid[:-1]
    gap = np.zeros(n, dtype=bool)
    gap[1:] = (ns[1:] - ns[:-1]) >= (SESSION_GAP_S + 1) * NS
    gap &= ~new_user
    user_starts = np.flatnonzero(new_user)
    user_idx = np.cumsum(new_user) - 1
    n_users = len(user_starts)
    n_events = np.diff(np.append(user_starts, n))
    n_gap = np.add.reduceat(gap, user_starts)
    n_cap = np.zeros(n_users, dtype=np.int64)
    seg_starts = np.flatnonzero(new_user | gap)
    seg_bounds = np.append(seg_starts, n)
    cap_delta = (SESSION_CAP_S + 1) * NS
    for s in range(len(seg_starts)):
        i, j = int(seg_bounds[s]), int(seg_bounds[s + 1])
        k = i
        while True:
            nxt = int(np.searchsorted(ns[k:j], ns[k] + cap_delta)) + k
            if nxt >= j:
                break
            n_cap[user_idx[i]] += 1
            k = nxt
    return pd.DataFrame(
        {
            "user_id": uid[user_starts],
            "n_events": n_events.astype("int64"),
            "n_sessions": (1 + n_gap + n_cap).astype("int64"),
            "n_gap_splits": n_gap.astype("int64"),
            "n_cap_splits": n_cap,
            "truncated": pdf["truncated"].to_numpy()[user_starts],
        }
    )


def _capped_sessions_partition(batches):
    """mapInPandas body: Arrow batches arrive sorted by (user_id, ts,
    event_id) within the partition, but one user's rows can SPAN batch
    boundaries — so the trailing user carries into the next batch and
    only complete users emit. Per-partition state is one user's rows."""
    import pandas as pd

    carry = None
    for pdf in batches:
        if carry is not None:
            pdf = pd.concat([carry, pdf], ignore_index=True)
        last_uid = pdf["user_id"].iloc[-1]
        mask = pdf["user_id"].to_numpy() == last_uid
        carry = pdf[mask]
        head = pdf[~mask]
        if len(head):
            yield _capped_sessions_block(head)
    if carry is not None and len(carry):
        yield _capped_sessions_block(carry)


@query(
    "capped_sessions_per_user",
    oracle=f"""
        WITH RECURSIVE ev0 AS (
          SELECT user_id, ts,
                 row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS rn,
                 COUNT(*) OVER (PARTITION BY user_id) AS n_total
          FROM events
        ),
        ev AS (
          SELECT user_id, ts, rn, n_total FROM ev0
          WHERE rn <= {EVENTS_PER_USER_CAP}
        ),
        walk AS (
          SELECT user_id, ts, rn, n_total, 1 AS sid, ts AS sstart,
                 CAST(NULL AS VARCHAR) AS reason
          FROM ev WHERE rn = 1
          UNION ALL
          SELECT e.user_id, e.ts, e.rn, e.n_total,
                 CASE WHEN CAST(FLOOR(epoch(e.ts - w.ts)) AS BIGINT)
                           > {SESSION_GAP_S}
                       OR CAST(FLOOR(epoch(e.ts - w.sstart)) AS BIGINT)
                           > {SESSION_CAP_S}
                      THEN w.sid + 1 ELSE w.sid END,
                 CASE WHEN CAST(FLOOR(epoch(e.ts - w.ts)) AS BIGINT)
                           > {SESSION_GAP_S}
                       OR CAST(FLOOR(epoch(e.ts - w.sstart)) AS BIGINT)
                           > {SESSION_CAP_S}
                      THEN e.ts ELSE w.sstart END,
                 CASE WHEN CAST(FLOOR(epoch(e.ts - w.ts)) AS BIGINT)
                           > {SESSION_GAP_S} THEN 'gap'
                      WHEN CAST(FLOOR(epoch(e.ts - w.sstart)) AS BIGINT)
                           > {SESSION_CAP_S} THEN 'cap' END
          FROM walk w JOIN ev e
            ON e.user_id = w.user_id AND e.rn = w.rn + 1
        )
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(max(sid) AS BIGINT) AS n_sessions,
               CAST(count(*) FILTER (WHERE reason = 'gap') AS BIGINT)
                 AS n_gap_splits,
               CAST(count(*) FILTER (WHERE reason = 'cap') AS BIGINT)
                 AS n_cap_splits,
               MAX(n_total) > {EVENTS_PER_USER_CAP} AS truncated
        FROM walk GROUP BY user_id
    """,
)
def capped_sessions_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E108: dual-condition sessionization — a session ends on >30 min
    inactivity OR when it has run 4 hours total. The duration cap is
    what separates this from sessionize_gap (E5): the cap compares
    against the SESSION START, which itself depends on every earlier
    split decision — a genuine sequential recurrence no window/lag
    rewrite expresses (the gap-sum trick works precisely because gap
    splits don't look at session state).

    Implementation is the repo's sanctioned escape hatch for inherently
    sequential per-key logic, in its AMORTIZED form: one hash exchange
    on the user key (the window's) + ``mapInPandas`` over the sorted
    partitions, so one Python call processes a whole partition of users
    (a per-group applyInPandas pays its invocation overhead per USER —
    measured 4× slower at 1.5k users and ruinous at millions), with the
    trailing user carried across Arrow batch boundaries. Inside the
    block the walk is numpy-vectorized: gap splits from one diff, cap
    splits by per-session searchsorted. The DuckDB oracle replays the
    identical recurrence as a recursive CTE (rounds = max events per
    user), with the repo's pinned elapsed-whole-seconds semantics and
    gap-before-cap precedence — so even the stateful path is
    hash-checked.

    Skew bound (round 4): a mega-user can't serialize a partition —
    users beyond EVENTS_PER_USER_CAP events walk only their first CAP
    events (by ts, event_id) and carry an explicit ``truncated`` flag,
    mirrored in the oracle. The row_number/count windows ride the SAME
    single exchange+sort the mapper needs (plan-asserted in
    tests/test_plans.py), so the cap costs no extra shuffle."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id"
    )
    return capped_sessions(ev)


def capped_sessions(
    ev: DataFrame, cap: int = EVENTS_PER_USER_CAP
) -> DataFrame:
    """Dual-condition sessionization over (user_id, ts, event_id) with a
    per-user event budget. The window exec hash-partitions by user_id
    and sorts by (user_id, ts, event_id); filter preserves both, so
    mapInPandas consumes the window's own layout — one exchange total."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    capped = (
        ev.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "truncated",
            F.count(F.lit(1)).over(Window.partitionBy("user_id")) > cap,
        )
        .filter(F.col("rn") <= cap)
        .select("user_id", "ts", "truncated")
    )
    return capped.mapInPandas(_capped_sessions_partition, _CAPPED_SCHEMA)


# --------------------------------------------------------------------------
# E165: per-key interval union (merged coverage length, gaps-and-islands)
# --------------------------------------------------------------------------

#: Order validity window in days (same convention as
#: overlapping_orders_per_customer's pairwise-overlap count — this
#: operator reports the MERGED coverage those overlaps produce).
_SPAN_DAYS = 30


@query(
    "customer_order_span_union",
    oracle=f"""
        WITH iv AS (
          SELECT o_custkey AS custkey,
                 CAST(o_orderdate AS DATE) AS s,
                 CAST(o_orderdate AS DATE) + {_SPAN_DAYS} AS e,
                 o_orderkey AS okey
          FROM orders
        ), marked AS (
          SELECT custkey, s, e, okey,
                 CASE WHEN MAX(e) OVER (
                        PARTITION BY custkey ORDER BY s, okey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                      ) >= s THEN 0 ELSE 1 END AS is_new
          FROM iv
        ), islands AS (
          SELECT custkey, s, e,
                 CAST(SUM(is_new) OVER (
                   PARTITION BY custkey ORDER BY s, okey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS BIGINT) AS island
          FROM marked
        ), merged AS (
          SELECT custkey, island,
                 CAST(date_diff('day', MIN(s), MAX(e)) AS BIGINT) AS covered
          FROM islands GROUP BY custkey, island
        )
        SELECT custkey,
               CAST((SELECT COUNT(*) FROM iv i
                     WHERE i.custkey = merged.custkey) AS BIGINT)
                 AS n_intervals,
               CAST(COUNT(*) AS BIGINT) AS n_islands,
               CAST(SUM(covered) AS BIGINT) AS days_covered
        FROM merged GROUP BY custkey
    """,
)
def customer_order_span_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E165: union-of-intervals per key — each order opens a 30-day
    validity window; report, per customer, how many MERGED activity
    islands those windows form and the total days actually covered
    (double-covered days count once). The gaps-and-islands window idiom
    no aggregate expresses directly: an interval starts a new island iff
    its start exceeds the running max of all previous ends.
    Complements E19 (pairwise overlap counts) and E126 (global
    concurrency curve) with per-key coverage length.

    Exactness: all arithmetic is integer day math; island boundaries
    compare exact dates; tie order (start, orderkey) is total.

    Scale: one shuffle on custkey; both windows ride that single
    exchange, frames bounded by the customer's own order count; the
    island aggregate collapses map-side. No global window, no
    cross-key traffic."""
    orders = load_table(spark, sf_dir, "orders")
    iv = orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderdate").cast("date").alias("s"),
        F.date_add(F.col("o_orderdate").cast("date"), _SPAN_DAYS).alias("e"),
        F.col("o_orderkey").alias("okey"),
    )
    w_prev = (
        Window.partitionBy("custkey")
        .orderBy("s", "okey")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = iv.select(
        "custkey",
        "s",
        "e",
        "okey",
        F.when(F.max("e").over(w_prev) >= F.col("s"), F.lit(0))
        .otherwise(F.lit(1))
        .alias("is_new"),
    )
    # both windows use the SAME total (s, okey) order: with (s, e) a
    # same-start tie could attach a row to the wrong island depending on
    # engine sort stability
    w_run = (
        Window.partitionBy("custkey")
        .orderBy("s", "okey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = marked.select(
        "custkey",
        "s",
        "e",
        F.sum("is_new").over(w_run).cast("long").alias("island"),
    )
    merged = islands.groupBy("custkey", "island").agg(
        F.datediff(F.max("e"), F.min("s")).cast("long").alias("covered")
    )
    counts = iv.groupBy("custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals")
    )
    return (
        merged.groupBy("custkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_islands"),
            F.sum("covered").cast("long").alias("days_covered"),
        )
        .join(counts, "custkey")
        .select("custkey", "n_intervals", "n_islands", "days_covered")
    )


# --------------------------------------------------------------------------
# E190: business-day fulfilment lag by order priority
# --------------------------------------------------------------------------

#: Weekday-count prefix anchored at a known Monday (1970-01-05):
#: wb(d) = 5·(m div 7) + min(m mod 7, 5) counts weekdays in [anchor, d),
#: so business-day lag = wb(ship) − wb(order) — pure integer date
#: arithmetic, no per-day expansion, no calendar table.
_BD_SPARK = (
    "(5 * (datediff({d}, DATE '1970-01-05') div 7)"
    " + LEAST(datediff({d}, DATE '1970-01-05') % 7, 5))"
)
_BD_DUCK = (
    "(5 * (date_diff('day', DATE '1970-01-05', {d}) // 7)"
    " + LEAST(date_diff('day', DATE '1970-01-05', {d}) % 7, 5))"
)


@query(
    "business_day_ship_lag",
    oracle=f"""
        WITH lags AS (
          SELECT o.o_orderpriority AS priority,
                 {_BD_DUCK.format(d="CAST(l.l_shipdate AS DATE)")}
                 - {_BD_DUCK.format(d="o.o_orderdate")} AS bd
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        )
        SELECT priority,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(bd) AS DOUBLE) / COUNT(*) AS mean_bd_lag,
               CAST(MIN(bd) AS BIGINT) AS min_bd_lag,
               CAST(MAX(bd) AS BIGINT) AS max_bd_lag
        FROM lags GROUP BY priority
    """,
)
def business_day_ship_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E190: fulfilment lag in BUSINESS days per order priority — the
    SLA form ops teams actually contract on (E98's calendar-day stats
    over-penalize weekend spans). Weekdays between two dates come from
    a closed-form prefix count anchored at a known Monday — wb(d) =
    5·⌊m/7⌋ + min(m mod 7, 5) with m = days since 1970-01-05 — so the
    lag is wb(ship)−wb(order): pure integer arithmetic per row, no
    per-day explode, no calendar dimension join, and immune to the
    engines' different DAYOFWEEK numbering conventions (no dayofweek
    call at all).

    Exactness: integer date diffs, integer div/mod, one exact-sum /
    count division per priority.

    Scale: one fact join (orderkey-keyed) and one 5-row aggregate —
    the same shape as E98, which this extends."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_shipdate").cast("date").alias("ship_d")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    j = li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
    bd = F.expr(_BD_SPARK.format(d="ship_d")) - F.expr(
        _BD_SPARK.format(d="o_orderdate")
    )
    return (
        j.select(F.col("o_orderpriority").alias("priority"), bd.alias("bd"))
        .groupBy("priority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            (F.sum("bd").cast("double") / F.count(F.lit(1))).alias(
                "mean_bd_lag"
            ),
            F.min("bd").cast("long").alias("min_bd_lag"),
            F.max("bd").cast("long").alias("max_bd_lag"),
        )
    )


# --------------------------------------------------------------------------
# E208: business-day SLA attainment by order priority
# --------------------------------------------------------------------------

#: Contracted ship SLAs in BUSINESS days per priority class (fixed
#: contract literals, mirrored into the oracle).
SLA_BDAYS = {
    "1-URGENT": 3,
    "2-HIGH": 5,
    "3-MEDIUM": 7,
    "4-NOT SPECIFIED": 10,
    "5-LOW": 14,
}

_SLA_CASE = (
    "CASE "
    + " ".join(
        f"WHEN priority = '{p}' THEN {d}"
        for p, d in sorted(SLA_BDAYS.items())
    )
    + " ELSE 10 END"
)


@query(
    "priority_sla_attainment",
    oracle=f"""
        WITH lags AS (
          SELECT o.o_orderpriority AS priority,
                 {_BD_DUCK.format(d="CAST(l.l_shipdate AS DATE)")}
                 - {_BD_DUCK.format(d="o.o_orderdate")} AS bd
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        )
        SELECT priority,
               CAST({_SLA_CASE} AS BIGINT) AS sla_bdays,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(COUNT(*) FILTER (WHERE bd <= {_SLA_CASE}) AS BIGINT)
                 AS n_within_sla,
               CAST(COUNT(*) FILTER (WHERE bd <= {_SLA_CASE}) AS DOUBLE)
                 / COUNT(*) AS attainment
        FROM lags GROUP BY priority
    """,
)
def priority_sla_attainment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E208: SLA attainment — the share of order lines shipped within
    each priority class's contracted business-day budget (the fixed
    literal SLA table, urgent=3 … low=14). E190 measures the lag
    DISTRIBUTION; this is the attainment KPI the contract is graded on,
    computed with the same Monday-anchored weekday prefix (no
    dayofweek, no calendar dim) so weekend spans never count against
    the SLA.

    Exactness: integer business-day lags compared against integer
    literals; counts and one division per priority.

    Scale: identical shape to E190 — one orderkey-keyed fact join, one
    5-row aggregate."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_shipdate").cast("date").alias("ship_d")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    j = li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
    bd = F.expr(_BD_SPARK.format(d="ship_d")) - F.expr(
        _BD_SPARK.format(d="o_orderdate")
    )
    lags = j.select(
        F.col("o_orderpriority").alias("priority"), bd.alias("bd")
    )
    within = F.col("bd") <= F.expr(_SLA_CASE)
    return lags.groupBy("priority").agg(
        F.expr(_SLA_CASE).cast("long").alias("sla_bdays"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.count(F.when(within, 1)).cast("long").alias("n_within_sla"),
        (
            F.count(F.when(within, 1)).cast("double") / F.count(F.lit(1))
        ).alias("attainment"),
    )


# --------------------------------------------------------------------------
# E211: supplier reliability ranking by Wilson lower bound
# --------------------------------------------------------------------------

#: "On time" = shipped within this many business days of the order.
ONTIME_BDAYS = 7
SUPPLIER_TOPK = 20

_SLB_P = "(CAST(k AS DOUBLE) / n)"
_SLB_DEN = "(1.0 + (1.96 * 1.96) / n)"
_SLB_CENTER = f"(({_SLB_P} + (1.96 * 1.96) / (2.0 * n)) / {_SLB_DEN})"
_SLB_HALF = (
    f"((1.96 * SQRT(({_SLB_P} * (1.0 - {_SLB_P})"
    f" + (1.96 * 1.96) / (4.0 * n)) / n)) / {_SLB_DEN})"
)
_SLB = f"({_SLB_CENTER} - {_SLB_HALF})"


@query(
    "supplier_ontime_wilson_ranking",
    oracle=f"""
        WITH lags AS (
          SELECT l.l_suppkey AS suppkey,
                 CASE WHEN {_BD_DUCK.format(d="CAST(l.l_shipdate AS DATE)")}
                        - {_BD_DUCK.format(d="o.o_orderdate")}
                        <= {ONTIME_BDAYS}
                      THEN 1 ELSE 0 END AS ontime
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        ), per AS (
          SELECT suppkey, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(ontime) AS BIGINT) AS k
          FROM lags GROUP BY suppkey
        )
        SELECT suppkey, n AS n_lines, k AS n_on_time,
               {_SLB_P} AS rate, {_SLB} AS wilson_lb
        FROM per
        ORDER BY wilson_lb DESC, suppkey
        LIMIT {SUPPLIER_TOPK}
    """,
)
def supplier_ontime_wilson_ranking(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """E211: rank suppliers by the Wilson LOWER bound of their on-time
    rate — the "how not to sort by average rating" fix (a 2/2 supplier
    must not outrank a 95/100 one; the lower confidence bound
    penalizes small n exactly as much as the evidence warrants).
    Composes E190's business-day lag with E172's Wilson machinery into
    the pack's procurement KPI; raw rate is emitted alongside so the
    re-ranking is visible.

    Exactness: integer business-day lags and counts; the bound is the
    E172 shared-literal IEEE chain; ties break on suppkey.

    Scale: one orderkey-keyed fact join, one supplier-keyed aggregate,
    TopK via TakeOrderedAndProject (never a full sort)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        F.col("l_shipdate").cast("date").alias("ship_d"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    j = li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
    bd = F.expr(_BD_SPARK.format(d="ship_d")) - F.expr(
        _BD_SPARK.format(d="o_orderdate")
    )
    per = (
        j.select(
            F.col("l_suppkey").alias("suppkey"),
            F.when(bd <= ONTIME_BDAYS, 1).otherwise(0).alias("ontime"),
        )
        .groupBy("suppkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("ontime").cast("long").alias("k"),
        )
    )
    scored = per.select(
        "suppkey",
        F.col("n").alias("n_lines"),
        F.col("k").alias("n_on_time"),
        F.expr(_SLB_P).alias("rate"),
        F.expr(_SLB).alias("wilson_lb"),
    )
    return scored.orderBy(
        F.desc("wilson_lb"), F.asc("suppkey")
    ).limit(SUPPLIER_TOPK)


# --------------------------------------------------------------------------
# E225: OHLC candlestick bars (open/high/low/close) per event type x hour
# --------------------------------------------------------------------------


@query(
    "events_value_ohlc_hourly",
    oracle="""
        WITH h AS (
          SELECT event_type,
                 date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_ts,
                 value,
                 ROW_NUMBER() OVER (
                   PARTITION BY event_type,
                                date_trunc('hour', CAST(ts AS TIMESTAMP))
                   ORDER BY CAST(ts AS TIMESTAMP), event_id
                 ) AS rn_a,
                 ROW_NUMBER() OVER (
                   PARTITION BY event_type,
                                date_trunc('hour', CAST(ts AS TIMESTAMP))
                   ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC
                 ) AS rn_d
          FROM events
        )
        SELECT event_type, hour_ts,
               MAX(CASE WHEN rn_a = 1 THEN value END) AS open_value,
               MAX(value) AS high_value,
               MIN(value) AS low_value,
               MAX(CASE WHEN rn_d = 1 THEN value END) AS close_value,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM h
        GROUP BY event_type, hour_ts
    """,
)
def events_value_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E225: OHLC (open/high/low/close) candlestick bars — the market-data
    downsampling every time-series store ships (kdb+/Timescale/Influx),
    repointed at the event stream: per (event_type, hour) the value of
    the first event, the extrema, the value of the last event, and the
    bar volume.  First/last order by (ts, event_id) so ties are
    deterministic; the bar grid is whatever hours actually occur (gap
    fill is daily_revenue_gapfilled's job).

    Exactness: open/high/low/close are SELECTIONS of existing doubles
    (min_by/max_by on the (ts, event_id) struct — no accumulation, so no
    fixed-point scaling is needed); the oracle's ROW_NUMBER form picks
    the identical rows.  The oracle casts ts to microseconds so both
    engines break sub-microsecond ties identically (the Spark loader
    already truncates ns -> us).

    Scale: ONE map-side-combinable aggregate — min_by/max_by/min/max/
    count all have partial merge states, so each bar collapses within
    every input partition before the single exchange on the (type, hour)
    key.  Output is |types| x |hours| (calendar-bounded), never
    volume-sized.  This is the shape the streaming twin maintains
    incrementally (see streaming/, watermarked tumbling windows)."""
    events = load_table(spark, sf_dir, "events")
    order_key = F.struct("ts", "event_id")
    return (
        events.select(
            "event_type",
            F.date_trunc("hour", "ts").alias("hour_ts"),
            "value",
            "ts",
            "event_id",
        )
        .groupBy("event_type", "hour_ts")
        .agg(
            F.min_by("value", order_key).alias("open_value"),
            F.max("value").alias("high_value"),
            F.min("value").alias("low_value"),
            F.max_by("value", order_key).alias("close_value"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
    )


# --------------------------------------------------------------------------
# E232: empirical-Bayes shrunk on-time ranking (beta-binomial, MoM prior)
# --------------------------------------------------------------------------

#: Fixed-point scale for per-supplier rate moments: rates quantize to
#: 1e-9 integers BEFORE summing so the prior's mean/variance are exact
#: integer sums (order-insensitive) in both engines.
_EB_SCALE = 1_000_000_000

#: Shared-literal double chains over the exact integer inputs
#: (sp = Σ rate·1e9, sp2 = Σ rate²·1e9, s_n = #suppliers) — identical
#: text in Spark and DuckDB, so identical IEEE bits.
_EB_MU = f"((CAST(sp AS DOUBLE) / {_EB_SCALE}.0) / s_n)"
_EB_EP2 = f"((CAST(sp2 AS DOUBLE) / {_EB_SCALE}.0) / s_n)"
_EB_V = f"({_EB_EP2} - {_EB_MU} * {_EB_MU})"
_EB_C = f"(({_EB_MU} * (1.0 - {_EB_MU})) / {_EB_V} - 1.0)"
_EB_DEGEN = f"({_EB_V} <= 0.0 OR {_EB_C} <= 0.0)"
_EB_SHRUNK = (
    f"CASE WHEN {_EB_DEGEN} THEN (CAST(k AS DOUBLE) / n)"
    f" ELSE (CAST(k AS DOUBLE) + {_EB_MU} * {_EB_C})"
    f" / (CAST(n AS DOUBLE) + {_EB_C}) END"
)
_EB_STRENGTH = (
    f"CASE WHEN {_EB_DEGEN} THEN CAST(NULL AS DOUBLE) ELSE {_EB_C} END"
)


@query(
    "supplier_ontime_eb_shrunk",
    oracle=f"""
        WITH lags AS (
          SELECT l.l_suppkey AS suppkey,
                 CASE WHEN {_BD_DUCK.format(d="CAST(l.l_shipdate AS DATE)")}
                        - {_BD_DUCK.format(d="o.o_orderdate")}
                        <= {ONTIME_BDAYS}
                      THEN 1 ELSE 0 END AS ontime
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        ), per AS (
          SELECT suppkey, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(ontime) AS BIGINT) AS k
          FROM lags GROUP BY suppkey
        ), q AS (
          SELECT suppkey, n, k,
                 CAST(FLOOR((CAST(k AS DOUBLE) / n) * {_EB_SCALE} + 0.5)
                   AS BIGINT) AS pq,
                 CAST(FLOOR((CAST(k AS DOUBLE) / n) * (CAST(k AS DOUBLE) / n)
                   * {_EB_SCALE} + 0.5) AS BIGINT) AS p2q
          FROM per
        ), prior AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS s_n,
                 CAST(SUM(pq) AS BIGINT) AS sp,
                 CAST(SUM(p2q) AS BIGINT) AS sp2
          FROM q
        )
        SELECT suppkey, n AS n_lines, k AS n_on_time,
               (CAST(k AS DOUBLE) / n) AS rate,
               {_EB_SHRUNK} AS shrunk_rate,
               {_EB_STRENGTH} AS prior_strength
        FROM q CROSS JOIN prior
        ORDER BY shrunk_rate DESC, suppkey
        LIMIT {SUPPLIER_TOPK}
    """,
)
def supplier_ontime_eb_shrunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E232: empirical-Bayes shrunk on-time ranking — the Bayesian twin
    of E211's Wilson lower bound.  Each supplier's raw on-time rate is
    shrunk toward the population prior, with the prior Beta(α, β)
    estimated from the data itself by method of moments (α+β =
    μ(1−μ)/Var(p) − 1): shrunk = (k + α)/(n + α + β).  A 2/2 supplier
    gets pulled hard toward the population mean while a 95/100 supplier
    barely moves — fixing the same small-sample inversion E211 fixes,
    but with a posterior MEAN (usable downstream as a probability)
    instead of a confidence bound.  When every supplier has the same
    rate the prior is degenerate (Var = 0) and shrunk = raw, with
    prior_strength NULL.

    Exactness: per-supplier rates quantize to 1e-9 integers before the
    moment sums, so μ/Var/α+β are shared-literal double chains over
    identical integer operands in both engines; each shrunk rate is one
    more such chain.

    Scale: one fact-join aggregate to the |suppliers| frame (same as
    E211), one 1-row moment crossJoin, TakeOrdered top-K."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        F.col("l_shipdate").cast("date").alias("ship_d"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    j = li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
    bd = F.expr(_BD_SPARK.format(d="ship_d")) - F.expr(
        _BD_SPARK.format(d="o_orderdate")
    )
    per = (
        j.select(
            F.col("l_suppkey").alias("suppkey"),
            F.when(bd <= ONTIME_BDAYS, 1).otherwise(0).alias("ontime"),
        )
        .groupBy("suppkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("ontime").cast("long").alias("k"),
        )
    )
    p = F.col("k").cast("double") / F.col("n")
    q = per.select(
        "suppkey",
        "n",
        "k",
        F.floor(p * _EB_SCALE + F.lit(0.5)).cast("long").alias("pq"),
        F.floor(p * p * _EB_SCALE + F.lit(0.5)).cast("long").alias("p2q"),
    )
    prior = q.agg(
        F.count(F.lit(1)).cast("long").alias("s_n"),
        F.sum("pq").cast("long").alias("sp"),
        F.sum("p2q").cast("long").alias("sp2"),
    )
    scored = q.crossJoin(F.broadcast(prior)).select(
        "suppkey",
        F.col("n").alias("n_lines"),
        F.col("k").alias("n_on_time"),
        (F.col("k").cast("double") / F.col("n")).alias("rate"),
        F.expr(_EB_SHRUNK).alias("shrunk_rate"),
        F.expr(_EB_STRENGTH).alias("prior_strength"),
    )
    return scored.orderBy(
        F.desc("shrunk_rate"), F.asc("suppkey")
    ).limit(SUPPLIER_TOPK)


# --------------------------------------------------------------------------
# E236: replay watermark audit (how out-of-order is storage order vs
# event time — the watermark a CDC replay would need)
# --------------------------------------------------------------------------

#: Lateness quantiles reported (1.0 = max).
WM_QS = (0.5, 0.95, 0.99, 1.0)


@query(
    "replay_watermark_audit",
    oracle=f"""
        WITH r AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
                 MAX(CAST(o_orderdate AS DATE)) OVER (
                   ORDER BY o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS rmax
          FROM orders
        ), l AS (
          SELECT CAST(date_diff('day', d, rmax) AS DOUBLE) AS late_days
          FROM r
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN late_days > 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_late,
               quantile_cont(late_days, {WM_QS[0]}) AS p50_late_days,
               quantile_cont(late_days, {WM_QS[1]}) AS p95_late_days,
               quantile_cont(late_days, {WM_QS[2]}) AS p99_late_days,
               quantile_cont(late_days, {WM_QS[3]}) AS max_late_days
        FROM l
    """,
)
def replay_watermark_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E236: watermark sizing for a storage-order replay — before
    re-streaming a table (CDC backfill, Kafka re-ingest, stream-batch
    unification) you must know how OUT-OF-ORDER storage order is
    relative to event time: every watermark smaller than the observed
    lateness silently drops rows, every larger one holds state longer
    than needed.  For each row this computes its lateness behind the
    running event-time high-water mark in arrival (o_orderkey) order,
    then reports the p50/p95/p99/max lateness — p99 is the watermark a
    replay should configure, and a huge value is the same signal E228
    reads from zone maps: the table wants date clustering.

    The running max is the repo's two-phase prefix pattern (never a
    volume-sized global window): range-partition on the arrival key →
    per-partition running max (P parallel local windows) → the 32-row
    per-partition max frame prefix-maxed and broadcast back.  Lateness
    quantiles run on the shared distributed-selection machinery
    (_distributed_quantiles — no single-task percentile sort).

    Exactness: lateness is an exact integer day count cast to double;
    quantile interpolation is the engine-shared pos = q·(n−1) formula.
    """
    from .relational import _distributed_quantiles

    orders = load_table(spark, sf_dir, "orders")
    part = (
        orders.select(
            "o_orderkey", F.col("o_orderdate").cast("date").alias("d")
        )
        .repartitionByRange(32, "o_orderkey")
        .select(
            "o_orderkey", "d", F.spark_partition_id().alias("pid")
        )
    )
    local = part.select(
        "pid",
        "d",
        F.max("d")
        .over(
            Window.partitionBy("pid")
            .orderBy("o_orderkey")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .alias("lmax"),
    )
    pidmax = local.groupBy("pid").agg(F.max("d").alias("pmax"))
    prevmax = pidmax.select(
        "pid",
        F.max("pmax")
        .over(
            Window.orderBy("pid").rowsBetween(
                Window.unboundedPreceding, -1
            )
        )
        .alias("offmax"),
    )
    late = (
        local.join(F.broadcast(prevmax), "pid")
        .select(
            F.datediff(
                F.greatest(
                    F.col("lmax"),
                    F.coalesce(F.col("offmax"), F.col("lmax")),
                ),
                F.col("d"),
            )
            .cast("double")
            .alias("late_days")
        )
    )
    late = scoped_persist(late)
    stats = late.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.when(F.col("late_days") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_late"),
    )
    q = _distributed_quantiles(late, "late_days", list(WM_QS))
    return stats.crossJoin(F.broadcast(q)).select(
        "n_rows",
        "n_late",
        F.get("qs", 0).alias("p50_late_days"),
        F.get("qs", 1).alias("p95_late_days"),
        F.get("qs", 2).alias("p99_late_days"),
        F.get("qs", 3).alias("max_late_days"),
    )
