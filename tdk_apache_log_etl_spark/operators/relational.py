"""Relational core over the TPC-H-ish star schema.

The reference's single-table model has no joins, windows, sorts, or set ops
(SURVEY.md §2.5 — verified absences), but the engine must still be a complete
analytics surface; these are the E7 (enrichment joins), E8 (top-k), plus
window / rollup / set-op operators, each designed for 100 TB:

  * dimension joins are explicitly broadcast (no shuffle of the fact table);
  * fact-fact joins shuffle on the join key once and reuse that partitioning;
  * top-k is orderBy+limit → Spark plans TakeOrderedAndProject (no global
    sort, per-partition heaps + driver merge of k rows);
  * aggregation sums use the decimal trick (operators/numeric.py) so results
    are bit-identical regardless of partitioning/AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .numeric import SCALE, dec_sum, sql_dec_sum
from .registry import query, scoped_persist


def _ts(df: DataFrame, colname: str, value: str):
    """A literal comparable to df[colname] whatever timestamp flavor the
    parquet footer produced (TIMESTAMP vs TIMESTAMP_NTZ)."""
    return F.lit(value).cast(df.schema[colname].dataType)


# --------------------------------------------------------------------------
# Aggregation pipeline (TPC-H Q1 shape) over lineitem
# --------------------------------------------------------------------------


@query(
    "tpch_q1_pricing_summary",
    oracle=f"""
        SELECT
          l_returnflag,
          l_linestatus,
          {sql_dec_sum("l_quantity")} AS sum_qty,
          {sql_dec_sum("l_extendedprice")} AS sum_base_price,
          {sql_dec_sum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
          {sql_dec_sum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")}
            AS sum_charge,
          {sql_dec_sum("l_quantity")} / COUNT(l_quantity) AS avg_qty,
          {sql_dec_sum("l_extendedprice")} / COUNT(l_extendedprice) AS avg_price,
          {sql_dec_sum("l_discount")} / COUNT(l_discount) AS avg_disc,
          COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan → pushed filter → partial/final hash agg; 6 aggregates in one
    pass (whole-stage codegen keeps this a single pipelined stage up to the
    exchange). The group-by key cardinality is tiny (3×2) so the exchange
    moves only partial-agg rows."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= _ts(li, "l_shipdate", "1998-09-01 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum(F.col("l_quantity")).alias("sum_qty"),
            dec_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            dec_sum(disc_price).alias("sum_disc_price"),
            dec_sum(charge).alias("sum_charge"),
            (dec_sum(F.col("l_quantity")) / F.count("l_quantity")).alias("avg_qty"),
            (dec_sum(F.col("l_extendedprice")) / F.count("l_extendedprice")).alias(
                "avg_price"
            ),
            (dec_sum(F.col("l_discount")) / F.count("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# E8: top-k
# --------------------------------------------------------------------------


@query(
    "topk_orders_by_price",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10
    """,
)
def topk_orders_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E8: Spark plans TakeOrderedAndProject — per-partition top-k heaps,
    only k rows reach the driver; no global sort even at 100 TB. The
    o_orderkey tiebreak makes the k-th row deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# E7: enrichment joins
# --------------------------------------------------------------------------


@query(
    "join_customer_region",
    oracle=f"""
        SELECT r.r_name AS region_name,
               COUNT(*) AS n_customers,
               {sql_dec_sum("c.c_acctbal")} AS total_acctbal
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
    """,
)
def join_customer_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7 broadcast path: nation and region are tiny dims — broadcast them
    explicitly so the customer table never shuffles for the join (plan shows
    BroadcastHashJoin; asserted in tests/test_plans.py)."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dec_sum(F.col("c_acctbal")).alias("total_acctbal"),
        )
    )


@query(
    "orders_lineitem_revenue",
    oracle=f"""
        SELECT o.o_orderpriority AS order_priority,
               COUNT(DISTINCT o.o_orderkey) AS n_orders,
               {sql_dec_sum("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
        FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderpriority
    """,
)
def orders_lineitem_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7 fact-fact path: orders ⋈ lineitem shuffles both sides on
    l_orderkey once (sort-merge or shuffled-hash under AQE); at 100 TB the
    scale answer is bucketing both tables on orderkey at write time
    (sinks/staging.py) so this join needs no exchange at all."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("o_orderpriority").alias("order_priority"))
        .agg(
            F.countDistinct("o_orderkey").alias("n_orders"),
            dec_sum(revenue).alias("revenue"),
        )
    )


@query(
    "star_revenue_by_nation",
    oracle=f"""
        SELECT n.n_name AS nation_name,
               {sql_dec_sum("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
               COUNT(*) AS n_lineitems
        FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY n.n_name
    """,
)
def star_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7 full star: two fact-fact shuffle joins + one broadcast dim join.
    Catalyst reorders freely since we declare, not schedule; nation is
    explicitly broadcast."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        customer.join(orders, orders.o_custkey == customer.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), nation.n_nationkey == customer.c_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            dec_sum(revenue).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@query(
    "semi_join_big_spenders",
    oracle="""
        SELECT c.c_custkey, c.c_name
        FROM customer c
        WHERE EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
        )
    """,
)
def semi_join_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers with at least one >400k order. Semi joins
    ship only the join key of the right side — no payload shuffle."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    big = orders.filter(F.col("o_totalprice") > 400000)
    return customer.join(
        big, customer.c_custkey == big.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "anti_join_orderless_customers",
    oracle="""
        SELECT c.c_custkey, c.c_name
        FROM customer c
        WHERE NOT EXISTS (
          SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        )
    """,
)
def anti_join_orderless_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers that never ordered."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------


@query(
    "window_top_order_per_customer",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
                 ) AS rn
          FROM orders
        ) WHERE rn = 1
    """,
)
def window_top_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window: each customer's most expensive order. Spark pushes
    rn=1 into the window via a per-partition top-1 limit (WindowGroupLimit)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


# --------------------------------------------------------------------------
# Grouping sets / set ops / distinct
# --------------------------------------------------------------------------


@query(
    "rollup_lineitem_status",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n_items,
               {sql_dec_sum("l_quantity")} AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_lineitem_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets — subtotals + grand total in one shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        dec_sum(F.col("l_quantity")).alias("sum_qty"),
    )


@query(
    "union_nationkeys",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey FROM supplier
    """,
)
def union_nationkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op: UNION (distinct) of two key sets."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        customer.select(F.col("c_nationkey").alias("nationkey"))
        .union(supplier.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


@query(
    "intersect_nationkeys",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey FROM supplier
    """,
)
def intersect_nationkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op: INTERSECT — nations having both customers and suppliers."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return customer.select(F.col("c_nationkey").alias("nationkey")).intersect(
        supplier.select(F.col("s_nationkey").alias("nationkey"))
    )


@query(
    "except_nationkeys",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT s_nationkey FROM supplier
    """,
)
def except_nationkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op: EXCEPT — nations with customers but no suppliers."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return customer.select(F.col("c_nationkey").alias("nationkey")).subtract(
        supplier.select(F.col("s_nationkey").alias("nationkey"))
    )


@query(
    "custkey_orders_except_all",
    oracle="""
        SELECT o_custkey AS custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
        EXCEPT ALL
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    """,
)
def custkey_orders_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op with BAG semantics: EXCEPT ALL keeps multiplicity — a
    customer with five 1995 orders and two 1996 orders survives three
    times (their year-over-year order deficit), where plain EXCEPT would
    drop them entirely. Spark plans ``exceptAll`` as a counted
    aggregate + generate, one shuffle on the compared row — no sort, no
    per-row matching, scale-safe."""
    orders = load_table(spark, sf_dir, "orders")
    y95 = orders.filter(
        (F.col("o_orderdate") >= _ts(orders, "o_orderdate", "1995-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts(orders, "o_orderdate", "1996-01-01 00:00:00"))
    ).select(F.col("o_custkey").alias("custkey"))
    y96 = orders.filter(
        (F.col("o_orderdate") >= _ts(orders, "o_orderdate", "1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts(orders, "o_orderdate", "1997-01-01 00:00:00"))
    ).select(F.col("o_custkey").alias("custkey"))
    return y95.exceptAll(y96)


@query(
    "custkey_orders_intersect_all",
    oracle="""
        SELECT o_custkey AS custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
        INTERSECT ALL
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    """,
)
def custkey_orders_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag INTERSECT ALL: each customer appears min(#1995 orders,
    #1996 orders) times — the retained year-over-year order volume.
    Same counted-aggregate physical shape as exceptAll."""
    orders = load_table(spark, sf_dir, "orders")
    y95 = orders.filter(
        (F.col("o_orderdate") >= _ts(orders, "o_orderdate", "1995-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts(orders, "o_orderdate", "1996-01-01 00:00:00"))
    ).select(F.col("o_custkey").alias("custkey"))
    y96 = orders.filter(
        (F.col("o_orderdate") >= _ts(orders, "o_orderdate", "1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts(orders, "o_orderdate", "1997-01-01 00:00:00"))
    ).select(F.col("o_custkey").alias("custkey"))
    return y95.intersectAll(y96)


@query(
    "distinct_mktsegments",
    oracle="SELECT DISTINCT c_mktsegment AS mktsegment FROM customer",
)
def distinct_mktsegments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain DISTINCT (hash-agg on the projected column only)."""
    customer = load_table(spark, sf_dir, "customer")
    return customer.select(F.col("c_mktsegment").alias("mktsegment")).distinct()


# --------------------------------------------------------------------------
# Date bucketing
# --------------------------------------------------------------------------


@query(
    "orders_by_month",
    oracle=f"""
        SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS order_month,
               COUNT(*) AS n_orders,
               {sql_dec_sum("o_totalprice")} AS total_price
        FROM orders GROUP BY 1
    """,
)
def orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar bucketing on the order date (X6-family date functions)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dec_sum(F.col("o_totalprice")).alias("total_price"),
        )
    )


@query(
    "part_type_stats",
    oracle=f"""
        SELECT p_type,
               COUNT(*) AS n_parts,
               {sql_dec_sum("p_retailprice")} / COUNT(p_retailprice) AS avg_price,
               MAX(p_size) AS max_size
        FROM part GROUP BY p_type
    """,
)
def part_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-dimension profiling aggregate."""
    part = load_table(spark, sf_dir, "part")
    return part.groupBy("p_type").agg(
        F.count(F.lit(1)).alias("n_parts"),
        (dec_sum(F.col("p_retailprice")) / F.count("p_retailprice")).alias(
            "avg_price"
        ),
        F.max("p_size").alias("max_size"),
    )


@query(
    "cube_orders_status_priority",
    oracle=f"""
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
               COUNT(*) AS n_orders,
               {sql_dec_sum("o_totalprice")} AS sum_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_orders_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dims — all 4 grouping sets in one Expand+shuffle pass
    (Spark plans Expand: each row fans to 4 grouping variants BEFORE the
    exchange, so the shuffle carries partial aggregates, not 4× raw rows).
    GROUPING() columns disambiguate 'rolled-up' NULLs from data NULLs."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
        F.count(F.lit(1)).alias("n_orders"),
        dec_sum(F.col("o_totalprice")).alias("sum_price"),
    )


_GROUPING_SETS_SQL = """
    SELECT l_returnflag, l_suppkey,
           CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
           CAST(GROUPING(l_suppkey) AS INTEGER) AS g_supp,
           COUNT(*) AS n_items,
           {dec_sum_qty} AS sum_qty
    FROM {table}
    GROUP BY GROUPING SETS ((l_returnflag), (l_suppkey), ())
"""


@query(
    "grouping_sets_lineitem",
    oracle=_GROUPING_SETS_SQL.format(
        dec_sum_qty=sql_dec_sum("l_quantity"), table="lineitem"
    ),
)
def grouping_sets_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL entry point — the exact query
    string is ANSI and runs verbatim in both engines (SURVEY.md §3.3: SQL
    is a first-class entry point, same Catalyst plan as the DataFrame
    form)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_gs_v"
    )
    return spark.sql(
        _GROUPING_SETS_SQL.format(
            dec_sum_qty=sql_dec_sum("l_quantity"), table="lineitem_gs_v"
        )
    )


_PIVOT_PRIORITIES = (
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"
)


@query(
    "pivot_status_by_priority",
    oracle="""
        SELECT o_orderstatus,
    """
    + ",\n".join(
        f"""COUNT(CASE WHEN o_orderpriority = '{p}' THEN 1 END) AS "p{i}" """
        for i, p in enumerate(_PIVOT_PRIORITIES)
    )
    + """
        FROM orders GROUP BY o_orderstatus
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an EXPLICIT value list — never the values-discovery form,
    which runs an extra distinct job over the data before planning (a
    driver-blocking scan at 100 TB). With pinned values Spark compiles the
    pivot to one pass of conditional aggregates, same as the oracle SQL."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority", list(_PIVOT_PRIORITIES))
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderstatus",
            *[
                F.coalesce(F.col(p), F.lit(0)).alias(f"p{i}")
                for i, p in enumerate(_PIVOT_PRIORITIES)
            ],
        )
    )


@query(
    "tpch_q3_shipping_priority",
    oracle=f"""
        SELECT l_orderkey,
               {sql_dec_sum("l_extendedprice * (1 - l_discount)")} AS revenue,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               o_orderpriority
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate > TIMESTAMP '1998-01-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → join → fact-fact join on
    the order key → group → top-10. The BUILDING-filtered customer joins
    WITHOUT a forced broadcast hint — even filtered, customer is an
    unbounded dimension at 100 TB, so AQE picks broadcast vs shuffle from
    the measured post-filter size (it broadcasts at bench scale).
    orders↔lineitem shuffle once on orderkey; the final ORDER BY + LIMIT
    plans TakeOrderedAndProject — no global sort of the aggregate."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cutoff_o = _ts(orders, "o_orderdate", "1998-01-01")
    cutoff_l = _ts(li, "l_shipdate", "1998-01-01")
    return (
        li.filter(F.col("l_shipdate") > cutoff_l)
        .join(
            orders.filter(F.col("o_orderdate") < cutoff_o),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "tpch_q6_revenue_delta",
    oracle=f"""
        SELECT {sql_dec_sum("l_extendedprice * l_discount")} AS revenue_delta,
               COUNT(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.02 AND 0.09
          AND l_quantity < 24
    """,
)
def tpch_q6_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate. Every predicate is a
    pushable parquet filter (range on shipdate/discount/quantity) — the
    100 TB cost is row groups actually decoded, not rows scanned."""
    li = load_table(spark, sf_dir, "lineitem")
    lo = _ts(li, "l_shipdate", "1997-01-01")
    hi = _ts(li, "l_shipdate", "1998-01-01")
    return (
        li.filter(
            (F.col("l_shipdate") >= lo)
            & (F.col("l_shipdate") < hi)
            & (F.col("l_discount").between(0.02, 0.09))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dec_sum(F.col("l_extendedprice") * F.col("l_discount")).alias(
                "revenue_delta"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "scalar_subquery_pricey_parts",
    oracle="""
        SELECT p_brand, COUNT(*) AS n_parts
        FROM part
        WHERE p_retailprice > (SELECT AVG(p_retailprice) FROM part)
        GROUP BY p_brand
    """,
)
def scalar_subquery_pricey_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery — parts above the average retail price.
    Catalyst evaluates the subquery once (its own tiny job) and folds the
    scalar into the main scan's filter; no join materializes. AVG here is
    plain double avg in BOTH engines: a single global aggregate has one
    deterministic merge order, so bit-identity holds without the decimal
    trick."""
    part = load_table(spark, sf_dir, "part")
    part.createOrReplaceTempView("part_sq_v")
    return spark.sql(
        """
        SELECT p_brand, COUNT(*) AS n_parts
        FROM part_sq_v
        WHERE p_retailprice > (SELECT AVG(p_retailprice) FROM part_sq_v)
        GROUP BY p_brand
        """
    )


_EXISTS_SQL = """
    SELECT c_mktsegment,
           COUNT(*) AS n_customers
    FROM {customer} c
    WHERE EXISTS (
      SELECT 1 FROM {orders} o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    GROUP BY c_mktsegment
"""


@query(
    "exists_urgent_customers",
    oracle=_EXISTS_SQL.format(customer="customer", orders="orders"),
)
def exists_urgent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS via the SQL entry point — Catalyst decorrelates it
    into a left-semi hash join (same physical plan as the DataFrame
    leftsemi in semi_join_big_spenders; this covers the SQL subquery
    path)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_ex_v")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_ex_v")
    return spark.sql(
        _EXISTS_SQL.format(customer="customer_ex_v", orders="orders_ex_v")
    )


@query(
    "running_revenue_by_customer",
    oracle="""
        WITH daily AS (
          SELECT o_custkey, o_orderdate,
                 SUM(CAST(FLOOR(o_totalprice * 10000 + 0.5) AS BIGINT))
                   AS day_scaled
          FROM orders GROUP BY 1, 2
        )
        SELECT o_custkey,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               CAST(SUM(day_scaled) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate
                 ROWS UNBOUNDED PRECEDING
               ) AS DOUBLE) / 10000 AS running_total
        FROM daily
    """,
)
def running_revenue_by_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative analytic frame: per-customer running revenue by order
    date. The day-level pre-aggregation shuffles on (custkey, date); the
    window then re-sorts within the custkey partition only — both stages
    hash-partition on the customer, so AQE can reuse the exchange. The
    running sum accumulates the fixed-point integers (operators/numeric.py)
    so every prefix is bit-identical in both engines. The scaled LONG rides
    both stages undivided — converting to double between them and re-scaling
    truncates where the oracle rounds (a one-ulp trap)."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy("o_custkey", "o_orderdate").agg(
        F.sum(F.floor(F.col("o_totalprice") * 10000 + F.lit(0.5))).alias(
            "day_scaled"
        )
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.select(
        "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        (F.sum("day_scaled").over(w).cast("double") / 10000).alias(
            "running_total"
        ),
    )


# --------------------------------------------------------------------------
# Wider TPC-H shapes (Q4/Q5/Q12/Q14 analogues on the available columns).
# The reference has no joins at all (SURVEY.md §2.5), so these are E7-family
# coverage: correlated EXISTS with an inequality, a 6-table star with a
# cross-dimension equality, conditional aggregation, and a ratio metric.
# --------------------------------------------------------------------------


@query(
    "tpch_q4_priority_count",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1997-10-01'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
          )
        GROUP BY o_orderpriority
    """,
)
def tpch_q4_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS with an inequality
    (l_shipdate > o_orderdate). Planned as ONE left-semi hash join on the
    equi-key (orderkey) with the inequality as a residual join filter —
    never a per-row subquery. The date-range filter prunes orders before
    the shuffle; at 100 TB it is a parquet row-group pushdown."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lo = _ts(orders, "o_orderdate", "1997-01-01")
    hi = _ts(orders, "o_orderdate", "1997-10-01")
    return (
        orders.filter(
            (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
        )
        .join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "leftsemi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "tpch_q5_local_supplier_volume",
    oracle=f"""
        SELECT n_name,
               {sql_dec_sum("l_extendedprice * (1 - l_discount)")} AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY n_name
    """,
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table star with the cross-dimension equality
    c_nationkey = s_nationkey ("local supplier"). The ONLY shuffle is
    lineitem↔orders on the order key. nation and region are broadcast by
    hint (bounded: 25 and 5 rows at ANY scale factor); customer and
    supplier carry NO hint — both grow with the scale factor, and AQE
    decides broadcast vs shuffle from measured sizes (at bench scale it
    broadcasts them, so the nationkey equality still rides the join as a
    residual filter and the fact table is never re-partitioned for a
    dimension)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    lo = _ts(orders, "o_orderdate", "1997-01-01")
    hi = _ts(orders, "o_orderdate", "1998-01-01")
    return (
        li.join(
            orders.filter(
                (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )


@query(
    "tpch_q12_priority_by_flag",
    oracle="""
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_returnflag
    """,
)
def tpch_q12_priority_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode → returnflag on this schema): conditional
    aggregation — two CASE-sums in one pass, one shuffle on the tiny
    group key. The orders side carries only (o_orderkey, o_orderpriority)
    through the join: column pruning keeps the shuffle narrow."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lo = _ts(li, "l_shipdate", "1997-01-01")
    hi = _ts(li, "l_shipdate", "1998-01-01")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .join(
            orders.select("o_orderkey", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@query(
    "tpch_q14_promo_revenue",
    oracle=f"""
        SELECT (100.0 * {sql_dec_sum(
            "CASE WHEN p_type = 'PROMO' "
            "THEN l_extendedprice * (1 - l_discount) ELSE 0 END"
        )}) / {sql_dec_sum("l_extendedprice * (1 - l_discount)")}
          AS promo_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-09-01'
          AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue ratio. part joins pruned to two
    columns with NO forced broadcast — part grows with the scale factor
    (hundreds of GB even two-column at 100 TB TPC-H), so AQE chooses the
    strategy (broadcast at bench scale, shuffle-on-partkey beyond). Both
    sums ride ONE aggregation pass; the ratio divides two
    fixed-point-exact doubles, so the single-row result is bit-identical
    across engines and partitionings."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    lo = _ts(li, "l_shipdate", "1997-09-01")
    hi = _ts(li, "l_shipdate", "1997-10-01")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .join(
            part.select("p_partkey", "p_type"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .agg(
            (
                (
                    F.lit(100.0)
                    * dec_sum(
                        F.when(F.col("p_type") == "PROMO", disc_price).otherwise(
                            F.lit(0.0)
                        )
                    )
                )
                / dec_sum(disc_price)
            ).alias("promo_revenue")
        )
    )


# --------------------------------------------------------------------------
# Analytic-window breadth: RANGE frame (moving average), ntile, lag gaps.
# The reference has zero window functions (SURVEY.md §2.5); these complete
# the analytic surface alongside window_top_order_per_customer (ROWS top-1)
# and running_revenue_by_customer (cumulative frame).
# --------------------------------------------------------------------------

# Epoch-day via timestampdiff against an NTZ epoch — floor-epoch difference
# is the ONLY session-tz-proof day arithmetic shared bit-for-bit with
# DuckDB's epoch()/86400 (date_diff counts boundary crossings, unix_*
# renders via session tz).
_EPOCH_DAY = (
    "CAST(timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
    " o_orderdate) / 86400 AS BIGINT)"
)


@query(
    "moving_avg_daily_revenue",
    oracle="""
        WITH daily AS (
          SELECT CAST(epoch(o_orderdate) / 86400 AS BIGINT) AS day_num,
                 SUM(CAST(FLOOR(o_totalprice * 10000 + 0.5) AS BIGINT))
                   AS day_scaled,
                 COUNT(*) AS n_orders
          FROM orders GROUP BY 1
        )
        SELECT day_num,
               (CAST(SUM(day_scaled) OVER w AS DOUBLE) / 10000)
                 / SUM(n_orders) OVER w AS avg_order_price_7d,
               CAST(SUM(n_orders) OVER w AS BIGINT) AS n_orders_7d
        FROM daily
        WINDOW w AS (ORDER BY day_num RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def moving_avg_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day average order price: a RANGE frame over epoch-day —
    the frame is VALUE-based (covers calendar gaps), not row-based. Day
    pre-aggregation shrinks the window input to one row per day, so the
    single-partition window sees ~2400 rows at any corpus size — the
    global window is NOT a scale hazard once the heavy lifting happened in
    the partial aggregation. Fixed-point longs ride the frame; one double
    division at the end keeps bit-parity."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.select(
            F.expr(_EPOCH_DAY).alias("day_num"), F.col("o_totalprice")
        )
        .groupBy("day_num")
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 10000 + F.lit(0.5))
            ).alias("day_scaled"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    w = Window.orderBy("day_num").rangeBetween(-6, 0)
    return daily.select(
        "day_num",
        (
            (F.sum("day_scaled").over(w).cast("double") / 10000)
            / F.sum("n_orders").over(w)
        ).alias("avg_order_price_7d"),
        F.sum("n_orders").over(w).alias("n_orders_7d"),
    )


@query(
    "ntile_customer_quartiles",
    oracle="""
        WITH q AS (
          SELECT c_acctbal,
                 ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
          FROM customer
        )
        SELECT quartile, COUNT(*) AS n_customers,
               round(MIN(c_acctbal), 4) AS min_bal,
               round(MAX(c_acctbal), 4) AS max_bal
        FROM q GROUP BY quartile
    """,
)
def ntile_customer_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) wealth quartiles. The order key includes c_custkey so
    bucket assignment is total-ordered → deterministic across engines
    (ntile over a non-unique key would split ties arbitrarily). min/max
    per bucket are order-insensitive; no float summation.

    Scale note: an unpartitioned ntile funnels all rows through one task —
    exact and fine for dimension-sized inputs, but at fact scale swap to
    approx_percentile boundary cuts + a range-bucket assignment join
    (sketch-mergeable, no global sort); the exact form stays as the
    small-input oracle."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return (
        cust.select(
            "c_acctbal", F.ntile(4).over(w).cast("long").alias("quartile")
        )
        .groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.min("c_acctbal"), 4).alias("min_bal"),
            F.round(F.max("c_acctbal"), 4).alias("max_bal"),
        )
    )


@query(
    "order_gap_days",
    oracle="""
        WITH g AS (
          SELECT o_custkey,
                 CAST(epoch(o_orderdate) / 86400 AS BIGINT)
                   - lag(CAST(epoch(o_orderdate) / 86400 AS BIGINT)) OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey
                     ) AS gap
          FROM orders
        )
        SELECT o_custkey, COUNT(*) AS n_gaps,
               CAST(SUM(gap) AS DOUBLE) / COUNT(*) AS avg_gap_days,
               MAX(gap) AS max_gap_days
        FROM g WHERE gap IS NOT NULL
        GROUP BY o_custkey
    """,
)
def order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-order gap per customer via lag() over (custkey, orderdate,
    orderkey) — the unique key makes tie order deterministic. One shuffle
    on custkey serves both the window and the following aggregation
    (exchange reuse); gaps are integer days, so avg is an exact long sum
    over a double division — no fixed-point machinery needed."""
    orders = load_table(spark, sf_dir, "orders")
    day_num = F.expr(_EPOCH_DAY)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = orders.select(
        "o_custkey", (day_num - F.lag(day_num).over(w)).alias("gap")
    ).filter(F.col("gap").isNotNull())
    return gaps.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        (F.sum("gap").cast("double") / F.count(F.lit(1))).alias("avg_gap_days"),
        F.max("gap").alias("max_gap_days"),
    )


@query(
    "tpch_q10_returned_items",
    oracle=f"""
        SELECT c_custkey, c_name, n_name,
               {sql_dec_sum("l_extendedprice * (1 - l_discount)")} AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1997-07-01'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns, top-20 customers. One
    fact-fact shuffle on orderkey; nation (25 rows, bounded) is broadcast
    by hint, but customer carries NO hint — it is an unbounded dimension
    (billions of rows at 100 TB TPC-H) and a forced broadcast would OOM
    the executors; AQE picks broadcast vs shuffle from the measured size.
    The final top-20 is TakeOrderedAndProject with a c_custkey tiebreak
    so the cut is deterministic."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    lo = _ts(orders, "o_orderdate", "1997-01-01")
    hi = _ts(orders, "o_orderdate", "1997-07-01")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "tpch_q18_large_orders",
    oracle=f"""
        SELECT c_custkey, c_name, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               {sql_dec_sum("l_quantity")} AS total_qty
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        GROUP BY c_custkey, c_name, o_orderkey, o_orderdate
        HAVING {sql_dec_sum("l_quantity")} > 120
    """,
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders via HAVING on an aggregate.
    The quantity rollup groups on the (already co-partitioned) orderkey
    before joining customer — aggregate-then-join keeps the probe at one
    row per order, not one per lineitem. customer joins WITHOUT a
    broadcast hint: it is an unbounded dimension and forcing it into
    executor memory is exactly the plan that dies at 100 TB; AQE chooses
    from the runtime size instead."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    qty = (
        li.groupBy("l_orderkey")
        .agg(dec_sum(F.col("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > 120)
    )
    return (
        qty.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "total_qty",
        )
    )


@query(
    "tpch_q19_disjunctive_revenue",
    oracle=f"""
        SELECT {sql_dec_sum("l_extendedprice * (1 - l_discount)")} AS revenue,
               COUNT(*) AS n_items
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 20)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30
               AND l_quantity BETWEEN 10 AND 30)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 20 AND 50
               AND l_quantity BETWEEN 20 AND 40)
    """,
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs across both join sides. Catalyst
    distributes the disjunction: the part-only terms (brand OR'd with
    brand) and the lineitem-only quantity bound become single-side filters
    PUSHED BELOW the join, shrinking both inputs before the join probe
    (no forced broadcast: part is unbounded, AQE sizes the strategy); the
    mixed residual evaluates after. Writing the predicate once,
    declaratively, gets all of that — no hand-split needed."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "tpch_q15_top_supplier",
    oracle=f"""
        WITH rev AS (
          SELECT l_suppkey,
                 {sql_dec_sum("l_extendedprice * (1 - l_discount)")}
                   AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate < TIMESTAMP '1997-04-01'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN rev ON s_suppkey = l_suppkey
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: derived per-supplier revenue view, filtered to its
    own global max (scalar subquery against the SAME derived aggregate).
    The revenue frame is built once and persisted so the subquery branch
    and the join branch don't recompute the lineitem aggregation; the max
    is a one-row broadcast into the filter. Revenue is fixed-point exact,
    so 'equal to the max' is well-defined across engines — with raw double
    sums this query would be nondeterministic (ties on a summation-order-
    dependent value)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    lo = _ts(li, "l_shipdate", "1997-01-01")
    hi = _ts(li, "l_shipdate", "1997-04-01")
    rev = (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy("l_suppkey")
        .agg(
            dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("total_revenue")
        )
    )
    rev = scoped_persist(rev)
    max_rev = rev.agg(F.max("total_revenue").alias("m"))
    return (
        rev.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("m"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "customer_rfm_scores",
    oracle=f"""
        WITH per_cust AS (
          SELECT c_custkey, c_mktsegment,
                 date_diff('day', MAX(o_orderdate),
                           TIMESTAMP '2001-09-01') AS recency_days,
                 COUNT(*) AS frequency,
                 {sql_dec_sum("o_totalprice")} AS monetary
          FROM customer JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey, c_mktsegment
        )
        SELECT c_custkey, c_mktsegment,
               CAST(recency_days AS BIGINT) AS recency_days,
               frequency, monetary,
               percent_rank() OVER (
                 PARTITION BY c_mktsegment
                 ORDER BY monetary, c_custkey
               ) AS monetary_pct,
               cume_dist() OVER (
                 PARTITION BY c_mktsegment
                 ORDER BY frequency
               ) AS frequency_cume
        FROM per_cust
    """,
)
def customer_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer scoring with
    segment-relative analytic ranks — exercises percent_rank and
    cume_dist, the two rank-family functions the rest of the suite
    doesn't touch.  One shuffle aggregates per customer; the rank
    windows then re-shuffle once on the segment key.  percent_rank
    orders by (monetary, c_custkey) so ties rank deterministically;
    cume_dist is tie-stable by definition (ties share a value).

    Scale note: the per-segment window sees all customers of a segment —
    fine at dimension scale; at fact scale swap to approx_percentile
    boundary cuts exactly as documented for ntile_customer_quartiles.
    The reference date is pinned past the fixture's order horizon (the
    reference pipeline would use run_date)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    ref_date = _ts(orders, "o_orderdate", "2001-09-01")
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.datediff(ref_date, F.max("o_orderdate"))
            .cast("long")
            .alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            dec_sum(F.col("o_totalprice")).alias("monetary"),
        )
    )
    w_m = Window.partitionBy("c_mktsegment").orderBy("monetary", "c_custkey")
    w_f = Window.partitionBy("c_mktsegment").orderBy("frequency")
    return per_cust.select(
        "c_custkey",
        "c_mktsegment",
        "recency_days",
        "frequency",
        "monetary",
        F.percent_rank().over(w_m).alias("monetary_pct"),
        F.cume_dist().over(w_f).alias("frequency_cume"),
    )


@query(
    "supplier_rank_in_nation",
    oracle="""
        SELECT s_suppkey, n_name,
               CAST(rank() OVER w AS BIGINT) AS bal_rank,
               CAST(dense_rank() OVER w AS BIGINT) AS bal_dense_rank
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WINDOW w AS (PARTITION BY n_name ORDER BY s_acctbal DESC, s_suppkey)
    """,
)
def supplier_rank_in_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation supplier leaderboard — rank() and dense_rank(), the
    last two rank-family functions not yet exercised.  The order key
    appends s_suppkey so rank assignment is total-ordered (deterministic
    across engines even on tied balances); the window partitions by
    nation, so no global sort at any scale."""
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(
        F.desc("s_acctbal"), F.asc("s_suppkey")
    )
    return (
        supp.join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .select(
            "s_suppkey",
            "n_name",
            F.rank().over(w).cast("long").alias("bal_rank"),
            F.dense_rank().over(w).cast("long").alias("bal_dense_rank"),
        )
    )


@query(
    "top3_orders_per_segment",
    oracle="""
        SELECT c_mktsegment, o_orderkey, o_totalprice
        FROM (
          SELECT c_mktsegment, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (
                   PARTITION BY c_mktsegment
                   ORDER BY o_totalprice DESC, o_orderkey
                 ) AS rn
          FROM orders JOIN customer ON o_custkey = c_custkey
        ) WHERE rn <= 3
    """,
)
def top3_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k for k > 1: the rn <= k filter pushes below the
    shuffle as WindowGroupLimit (per-partition top-k heaps before the
    exchange — asserted in test_plans), so each group ships k rows per
    input partition, never its whole order history. Order key appends
    the orderkey for tie-deterministic membership."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_mktsegment",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@query(
    "dq_audit",
    oracle="""
        SELECT 1 AS check_idx, 'orders_null_custkey' AS check_name,
               (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL)
                 AS violations
        UNION ALL
        SELECT 2, 'orders_dup_orderkey',
               (SELECT COUNT(*) FROM (
                  SELECT o_orderkey FROM orders
                  GROUP BY o_orderkey HAVING COUNT(*) > 1))
        UNION ALL
        SELECT 3, 'lineitem_orphan_orderkey',
               (SELECT COUNT(*) FROM lineitem
                WHERE l_orderkey NOT IN
                      (SELECT o_orderkey FROM orders))
        UNION ALL
        SELECT 4, 'lineitem_nonpositive_qty',
               (SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 0)
        UNION ALL
        SELECT 5, 'orders_date_out_of_range',
               (SELECT COUNT(*) FROM orders
                WHERE o_orderdate < TIMESTAMP '1990-01-01'
                   OR o_orderdate > TIMESTAMP '2030-01-01')
    """,
)
def dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit over the fact tables: null keys, duplicate
    primary keys, referential orphans, domain violations — the checks an
    ingest gate runs before publishing a partition. Each check is one
    aggregate (the orphan check an anti join on the key), and the result
    is a fixed 5-row scorecard assembled from 1-row aggregates —
    driver-sized output whatever the corpus size. All-zero violations on
    the fixtures is itself the assertion: the generator produces
    referentially-intact data, and a regression in ingest would light a
    row up."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lo = _ts(orders, "o_orderdate", "1990-01-01")
    hi = _ts(orders, "o_orderdate", "2030-01-01")

    def check(idx: int, name: str, frame: DataFrame) -> DataFrame:
        return frame.agg(
            F.lit(idx).cast("int").alias("check_idx"),
            F.lit(name).alias("check_name"),
            F.count(F.lit(1)).alias("violations"),
        )

    dup_keys = (
        orders.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
    orphans = li.join(
        orders.select("o_orderkey"),
        li["l_orderkey"] == F.col("o_orderkey"),
        "left_anti",
    )
    return (
        check(1, "orders_null_custkey",
              orders.filter(F.col("o_custkey").isNull()))
        .unionAll(check(2, "orders_dup_orderkey", dup_keys))
        .unionAll(check(3, "lineitem_orphan_orderkey", orphans))
        .unionAll(check(4, "lineitem_nonpositive_qty",
                        li.filter(F.col("l_quantity") <= 0)))
        .unionAll(check(5, "orders_date_out_of_range",
                        orders.filter(
                            (F.col("o_orderdate") < lo)
                            | (F.col("o_orderdate") > hi)
                        )))
    )


#: engine-neutral Q1 text — valid verbatim in BOTH Spark SQL and DuckDB
#: (the scaled-sum helper emits only FLOOR/CAST/SUM/COUNT arithmetic)
_Q1_SQL_NEUTRAL = f"""
    SELECT
      l_returnflag,
      l_linestatus,
      {sql_dec_sum("l_quantity")} AS sum_qty,
      {sql_dec_sum("l_extendedprice")} AS sum_base_price,
      {sql_dec_sum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
      {sql_dec_sum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")}
        AS sum_charge,
      {sql_dec_sum("l_quantity")} / COUNT(l_quantity) AS avg_qty,
      {sql_dec_sum("l_extendedprice")} / COUNT(l_extendedprice) AS avg_price,
      {sql_dec_sum("l_discount")} / COUNT(l_discount) AS avg_disc,
      COUNT(*) AS count_order
    FROM {{table}}
    WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
"""


@query(
    "tpch_q1_sql_form",
    oracle=_Q1_SQL_NEUTRAL.format(table="lineitem"),
)
def tpch_q1_sql_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The A5 pattern (verbatim SQL via spark.sql, the Athena-style entry
    point) applied to the relational core: ONE SQL string runs unchanged
    in both Spark SQL and DuckDB — the scaled-sum arithmetic is
    engine-neutral by construction, so the dialect-portability claim is
    hash-checked, not asserted. The view registration is the ad-hoc-SQL
    path a reference user would take (SURVEY.md §3.3); the plan is
    identical to the DataFrame form (same Catalyst pipeline)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_v"
    )
    return spark.sql(_Q1_SQL_NEUTRAL.format(table="lineitem_v"))


@query(
    "part_cooccurrence_topk",
    oracle="""
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               COUNT(*) AS n_orders
        FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
        JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
        ORDER BY n_orders DESC, part_a, part_b
        LIMIT 20
    """,
)
def part_cooccurrence_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the 20 part pairs most often bought
    in the same order. The self-join on the order key fans out as
    Σ(parts-per-order²) — bounded by basket size (~7 lines/order), NOT
    corpus size, so it scales linearly with orders; the a < b predicate
    halves the pairs and canonicalizes their orientation. Distinct
    (order, part) first so multi-line items of one part don't inflate
    counts. Top-20 plans TakeOrderedAndProject; the (n_orders, part_a,
    part_b) sort key is unique per row, so the cut is deterministic."""
    op = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = op.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a")
    )
    b = op.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_partkey").alias("part_b")
    )
    return (
        a.join(
            b,
            (F.col("ok") == F.col("ok2"))
            & (F.col("part_a") < F.col("part_b")),
        )
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(20)
    )


@query(
    "daily_revenue_gapfilled",
    oracle="""
        WITH daily AS (
          SELECT CAST(epoch(o_orderdate) / 86400 AS BIGINT) AS day_num,
                 COUNT(*) AS n_orders,
                 SUM(CAST(FLOOR(o_totalprice * 10000 + 0.5) AS BIGINT))
                   AS scaled
          FROM orders GROUP BY 1
        ),
        bounds AS (SELECT MIN(day_num) AS lo, MAX(day_num) AS hi FROM daily),
        spine AS (
          SELECT unnest(generate_series(lo, hi)) AS day_num FROM bounds
        )
        SELECT s.day_num,
               COALESCE(n_orders, 0) AS n_orders,
               CAST(COALESCE(scaled, 0) AS DOUBLE) / 10000 AS revenue
        FROM spine s LEFT JOIN daily d ON s.day_num = d.day_num
    """,
)
def daily_revenue_gapfilled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily revenue: a generated calendar spine left-joined to
    the per-day aggregate, so days with zero orders appear as explicit
    zero rows — the shape every downstream time-series consumer (anomaly
    detection, forecasting, the RANGE-frame queries here) needs, since a
    missing day and a zero day are different facts.

    Scale shape: the heavy lifting is the one fact-table aggregation; the
    spine is sequence(min, max) exploded from a ONE-ROW frame (a few
    thousand int64s even for decades of days — generated, never stored),
    and the spine⋈daily join is two tiny post-aggregate frames (AQE
    broadcasts). Epoch-day arithmetic keeps it session-tz-proof (see
    _EPOCH_DAY). Revenue rides fixed-point and converts to double once."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.select(
            F.expr(_EPOCH_DAY).alias("day_num"), F.col("o_totalprice")
        )
        .groupBy("day_num")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.floor(F.col("o_totalprice") * 10000 + F.lit(0.5))
            ).alias("scaled"),
        )
    )
    # daily feeds BOTH the spine bounds and the join probe; without a
    # persist the plan scans+aggregates orders twice.
    daily = scoped_persist(daily)
    spine = daily.agg(
        F.min("day_num").alias("lo"), F.max("day_num").alias("hi")
    ).select(F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day_num"))
    return spine.join(daily, "day_num", "left").select(
        "day_num",
        F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
        (
            F.coalesce(F.col("scaled"), F.lit(0)).cast("double") / 10000
        ).alias("revenue"),
    )


@query(
    "overlapping_orders_per_customer",
    oracle="""
        WITH iv AS (
          SELECT o_custkey, o_orderkey, o_orderdate AS start_ts, end_ts
          FROM orders
          JOIN (SELECT l_orderkey, MAX(l_shipdate) AS end_ts
                FROM lineitem GROUP BY l_orderkey) li
            ON o_orderkey = l_orderkey
        ),
        flagged AS (
          SELECT o_custkey,
                 CASE WHEN MAX(end_ts) OVER (
                        PARTITION BY o_custkey
                        ORDER BY start_ts, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                      ) > start_ts THEN 1 ELSE 0 END AS ov
          FROM iv
        )
        SELECT o_custkey,
               COUNT(*) AS n_orders,
               CAST(SUM(ov) AS BIGINT) AS n_overlapping
        FROM flagged
        GROUP BY o_custkey
        HAVING SUM(ov) > 0
    """,
)
def overlapping_orders_per_customer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Interval-overlap detection without an interval join: an order's
    active interval is [o_orderdate, max(l_shipdate)]; an order overlaps
    an earlier order of the same customer iff the running maximum of
    earlier interval ends passes its start. The naive formulation is a
    per-customer self-join on the overlap predicate — O(k²) rows per
    customer and a nested-loop join Spark can't hash; the running-max
    window computes the same per-order flag in O(k log k) with ONE sort
    per customer partition. Per-customer partitions are bounded (order
    count per customer, not corpus size), so no global sort appears.
    The interval ends come from one map-side-combinable agg over
    lineitem sharing the o_orderkey shuffle with the join. Ties
    tie-break on o_orderkey so the frame boundary — and therefore the
    flag — is engine-independent."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ends = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("end_ts"))
    iv = orders.join(ends, orders.o_orderkey == ends.l_orderkey).select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").alias("start_ts"),
        "end_ts",
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("start_ts", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.select(
        "o_custkey",
        F.when(F.max("end_ts").over(w) > F.col("start_ts"), 1)
        .otherwise(0)
        .alias("ov"),
    )
    return (
        flagged.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("ov").alias("n_overlapping"),
        )
        .where(F.col("n_overlapping") > 0)
    )


_LATERAL_TOP2_SQL = """
SELECT c.c_mktsegment, c.c_custkey, l.o_orderkey, l.o_totalprice
FROM customer c,
LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
) l
"""


@query("lateral_top2_orders", oracle=_LATERAL_TOP2_SQL)
def lateral_top2_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery — each customer's two priciest orders,
    written the way an analyst would (per-row subquery with ORDER BY +
    LIMIT), executed the way a cluster needs: Catalyst decorrelates the
    lateral into a WindowGroupLimit over orders plus ONE equi-join
    (verified in the plan — no per-customer re-execution, no nested
    loop), so the 'run a query per row' phrasing costs the same as the
    hand-written window form in window_top_order_per_customer. The
    IDENTICAL SQL string is the DuckDB oracle — dialect-portable like
    tpch_q1_sql_form. Ties broken by o_orderkey so LIMIT is
    deterministic."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_LATERAL_TOP2_SQL)


@query(
    "daily_revenue_interpolated",
    oracle="""
        WITH daily AS (
          SELECT CAST(epoch(o_orderdate) / 86400 AS BIGINT) AS day_num,
                 SUM(CAST(FLOOR(o_totalprice * 10000 + 0.5) AS BIGINT))
                   AS scaled
          FROM orders GROUP BY 1
        ),
        bounds AS (SELECT MIN(day_num) AS lo, MAX(day_num) AS hi FROM daily),
        spine AS (
          SELECT unnest(generate_series(lo, hi)) AS day_num FROM bounds
        ),
        joined AS (
          SELECT s.day_num, d.scaled FROM spine s
          LEFT JOIN daily d ON s.day_num = d.day_num
        ),
        nbrs AS (
          SELECT day_num, scaled,
                 last_value(CASE WHEN scaled IS NOT NULL
                                 THEN day_num END IGNORE NULLS) OVER wp
                   AS prev_day,
                 last_value(scaled IGNORE NULLS) OVER wp AS prev_s,
                 first_value(CASE WHEN scaled IS NOT NULL
                                  THEN day_num END IGNORE NULLS) OVER wf
                   AS next_day,
                 first_value(scaled IGNORE NULLS) OVER wf AS next_s
          FROM joined
          WINDOW
            wp AS (ORDER BY day_num
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
            wf AS (ORDER BY day_num
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT day_num,
               (CASE WHEN scaled IS NOT NULL THEN CAST(scaled AS DOUBLE)
                     ELSE CAST(prev_s AS DOUBLE)
                          + CAST(next_s - prev_s AS DOUBLE)
                            * CAST(day_num - prev_day AS DOUBLE)
                            / CAST(next_day - prev_day AS DOUBLE)
                END) / 10000 AS revenue,
               scaled IS NULL AS is_interpolated
        FROM nbrs
    """,
)
def daily_revenue_interpolated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap repair by LINEAR INTERPOLATION — where
    daily_revenue_gapfilled makes missing days explicit zeros, this
    estimates them from the nearest observed neighbors (the hypertable
    `interpolate()` semantic): carry the last observed (day, value)
    forward and the next observed one backward with ignorenulls window
    functions, then one rational blend. The spine's first/last days are
    always observed (bounds come from the data), so every gap has both
    neighbors — no NULL output rows.

    Scale: identical to the gap-fill — one fact aggregation, a generated
    spine, and windows over the BOUNDED one-row-per-day frame (waived in
    the global-window sweep with the same pre-aggregated argument as
    moving_avg_daily_revenue). The blend stays on scaled integers cast
    to double in a fixed expression tree, so both engines produce
    identical bits despite the division."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.select(
            F.expr(_EPOCH_DAY).alias("day_num"), F.col("o_totalprice")
        )
        .groupBy("day_num")
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 10000 + F.lit(0.5))
            ).alias("scaled")
        )
    )
    # same double-scan shape as daily_revenue_gapfilled: persist the tiny
    # per-day frame so orders is aggregated once.
    daily = scoped_persist(daily)
    spine = daily.agg(
        F.min("day_num").alias("lo"), F.max("day_num").alias("hi")
    ).select(F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day_num"))
    joined = spine.join(daily, "day_num", "left")
    wp = Window.orderBy("day_num").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wf = Window.orderBy("day_num").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    obs_day = F.when(F.col("scaled").isNotNull(), F.col("day_num"))
    nbrs = joined.select(
        "day_num",
        "scaled",
        F.last(obs_day, ignorenulls=True).over(wp).alias("prev_day"),
        F.last("scaled", ignorenulls=True).over(wp).alias("prev_s"),
        F.first(obs_day, ignorenulls=True).over(wf).alias("next_day"),
        F.first("scaled", ignorenulls=True).over(wf).alias("next_s"),
    )
    blend = F.col("prev_s").cast("double") + (
        F.col("next_s") - F.col("prev_s")
    ).cast("double") * (F.col("day_num") - F.col("prev_day")).cast(
        "double"
    ) / (F.col("next_day") - F.col("prev_day")).cast("double")
    return nbrs.select(
        "day_num",
        (
            F.when(
                F.col("scaled").isNotNull(), F.col("scaled").cast("double")
            ).otherwise(blend)
            / 10000
        ).alias("revenue"),
        F.col("scaled").isNull().alias("is_interpolated"),
    )


@query(
    "lineitem_measures_unpivot",
    oracle=f"""
        WITH m AS (
          SELECT l_returnflag, 'quantity' AS measure, l_quantity AS v
          FROM lineitem
          UNION ALL
          SELECT l_returnflag, 'extendedprice', l_extendedprice
          FROM lineitem
          UNION ALL
          SELECT l_returnflag, 'discount', l_discount FROM lineitem
        )
        SELECT l_returnflag, measure,
               COUNT(*) AS n,
               {sql_dec_sum('v')} AS total
        FROM m GROUP BY l_returnflag, measure
    """,
)
def lineitem_measures_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long reshape with the NATIVE unpivot operator (the
    DataFrame `melt`): three measure columns become (measure, value)
    rows in one Expand node — the relational dual of pivot, and the
    shape a metrics store or plotting layer wants. Expand multiplies
    rows 3× WITHOUT reading the scan three times (the oracle's UNION ALL
    phrasing is the portable equivalent, but Spark plans unpivot as one
    pass); the follow-up aggregate is an ordinary partial+final
    hash-agg on the widened rows. Fixed-point sums keep the three
    measure totals bit-identical across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ["l_returnflag"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure_col",
        "v",
    ).select(
        "l_returnflag",
        F.regexp_replace(F.col("measure_col"), "^l_", "").alias("measure"),
        "v",
    )
    return long.groupBy("l_returnflag", "measure").agg(
        F.count(F.lit(1)).alias("n"), dec_sum(F.col("v")).alias("total")
    )


#: Equi-depth histogram: 10 buckets bounded by the 9 interior deciles.
_EQUIDEPTH_QS = [i / 10 for i in range(1, 10)]


def _global_ranks(df: DataFrame, colname: str):
    """Distributed global ranking of one column: returns (ranked frame
    with (v, grank) where grank is the 0-based global order statistic
    index, and a 1-row n_total frame). Range-repartition → P parallel
    local sorts → prefix-summed offsets; the building block both the
    interpolated (_distributed_quantiles) and discrete
    (price_quartiles_disc) selection paths share."""
    ranked_local = scoped_persist(
        df.repartitionByRange(32, colname)
        .select(F.col(colname).alias("v"), F.spark_partition_id().alias("pid"))
        .select(
            "v",
            "pid",
            F.row_number()
            .over(Window.partitionBy("pid").orderBy("v"))
            .alias("lrank"),
        )
    )
    counts = ranked_local.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt"))
    woff = Window.orderBy("pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "pid",
        F.coalesce(F.sum("cnt").over(woff), F.lit(0)).alias("off"),
    )
    n_total = counts.agg(F.sum("cnt").alias("n"))
    ranked = ranked_local.join(F.broadcast(offsets), "pid").select(
        "v", (F.col("off") + F.col("lrank") - 1).alias("grank")
    )
    return ranked, n_total


def _distributed_quantiles(df: DataFrame, colname: str, qs: list) -> DataFrame:
    """Exact interpolated quantiles of ``df[colname]`` as ONE 1-row frame
    with an array column ``qs`` — computed by distributed selection, never
    a single-task sort.

    Spark's exact ``percentile`` aggregate buffers every value into the
    one final reduce task (its partial state is the full value multiset),
    so a GLOBAL percentile is a hidden single-task sort — measured 6.4 s
    vs 1.3 s for the rest of the query at sf0.1, and fatal at 100 TB.
    The scalable form is textbook distributed selection:

      1. repartitionByRange on the value → non-overlapping, pid-ordered
         ranges (sampled boundaries; the RESULT is boundary-independent);
      2. row_number within each partition — P parallel local sorts;
      3. per-partition counts (P rows) prefix-summed into global offsets
         (a global window over a partition-count-bounded frame — waived);
      4. global rank = offset + local rank; the 2·|qs| target ranks are
         broadcast-joined and interpolated with quantile_cont's formula
         lo + (hi-lo)·frac at pos = q·(N-1) — pure double arithmetic on
         identical operands, so boundaries are engine-exact.

    Ties are immaterial: rank assignment among equal values is arbitrary,
    but the k-th smallest VALUE is unique."""
    spark = df.sparkSession
    ranked, n_total = _global_ranks(df, colname)
    targets = (
        spark.range(1)
        .select(F.explode(F.array(*[F.lit(q) for q in qs])).alias("q"))
        .crossJoin(F.broadcast(n_total))
        .select(
            "q",
            (F.col("q") * (F.col("n") - 1).cast("double")).alias("pos"),
        )
        .select(
            "q",
            F.floor("pos").alias("lo"),
            F.ceil("pos").alias("hi"),
            (F.col("pos") - F.floor("pos").cast("double")).alias("frac"),
        )
    )
    hits = ranked.join(
        F.broadcast(targets),
        (ranked["grank"] == targets["lo"]) | (ranked["grank"] == targets["hi"]),
    )
    boundaries = hits.groupBy("q", "frac").agg(
        F.max(F.when(F.col("grank") == F.col("lo"), F.col("v"))).alias("vlo"),
        F.max(F.when(F.col("grank") == F.col("hi"), F.col("v"))).alias("vhi"),
    )
    return boundaries.select(
        "q",
        (
            F.col("vlo") + (F.col("vhi") - F.col("vlo")) * F.col("frac")
        ).alias("boundary"),
    ).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("q", "boundary"))),
            lambda x: x["boundary"],
        ).alias("qs")
    )



@query(
    "equidepth_price_histogram",
    oracle=f"""
        WITH bounds AS (
          SELECT quantile_cont(l_extendedprice,
                               {_EQUIDEPTH_QS}) AS qs
          FROM lineitem
        ), bucketed AS (
          SELECT len(list_filter(b.qs, q -> l.l_extendedprice > q)) AS bucket,
                 l.l_extendedprice AS price
          FROM lineitem l, bounds b
        )
        SELECT CAST(bucket AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               MIN(price) AS min_price,
               MAX(price) AS max_price
        FROM bucketed GROUP BY bucket
    """,
)
def equidepth_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (decile) histogram of l_extendedprice — the optimizer-
    statistics / data-profiling primitive that equal-width histograms
    (events_value_histogram) can't replace on skewed distributions.

    The 9 decile boundaries come from _distributed_quantiles (range-
    partitioned parallel selection — see its docstring for why Spark's
    own global ``percentile`` is a hidden single-task sort), broadcast
    back over the fact via a bounded crossJoin; each row's bucket is how
    many boundaries lie strictly below it — the identical closed-form
    comparison the oracle's list_filter computes, so bucket assignment
    is engine-exact (ties at a boundary go to the lower bucket in
    both)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    bounds = _distributed_quantiles(li, "l_extendedprice", _EQUIDEPTH_QS)
    # size(filter(...)) rather than aggregate(filter(...), 0, acc+1):
    # one interpreted higher-order function per row instead of two
    # (measured 0.78 -> 0.67 s for the bucketing pass at sf0.1), and
    # the literal mirror of the oracle's len(list_filter(...)).
    bucketed = li.crossJoin(F.broadcast(bounds)).select(
        F.size(
            F.filter(F.col("qs"), lambda q: F.col("l_extendedprice") > q)
        )
        .cast("long")
        .alias("bucket"),
        F.col("l_extendedprice").alias("price"),
    )
    return bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("price").alias("min_price"),
        F.max("price").alias("max_price"),
    )


@query(
    "nation_revenue_share_in_region",
    oracle="""
        WITH rev AS (
          SELECT r.r_name AS region_name, n.n_name AS nation_name,
                 CAST(SUM(CAST(FLOOR(
                   l.l_extendedprice * (1 - l.l_discount) * 10000 + 0.5
                 ) AS BIGINT)) AS BIGINT) AS rev_scaled
          FROM customer c
          JOIN orders o ON o.o_custkey = c.c_custkey
          JOIN lineitem l ON l.l_orderkey = o.o_orderkey
          JOIN nation n ON n.n_nationkey = c.c_nationkey
          JOIN region r ON r.r_regionkey = n.n_regionkey
          GROUP BY r.r_name, n.n_name
        )
        SELECT region_name, nation_name,
               CAST(rev_scaled AS DOUBLE) / 10000 AS revenue,
               CAST(rev_scaled AS DOUBLE)
                 / CAST(SUM(rev_scaled) OVER (
                     PARTITION BY region_name) AS DOUBLE) AS region_share
        FROM rev
    """,
)
def nation_revenue_share_in_region(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Ratio-to-report: each nation's share of its region's revenue —
    the classic OLAP percent-of-total reporting shape.

    The share window sums the SCALED-INTEGER revenue (exact BIGINT
    addition, order-independent), not the double — a window-sum of
    doubles over the region frame would be merge-order-dependent, the
    exact nondeterminism dec_sum exists to kill. One double division at
    the end on identical operands → engine-exact. The window frame is
    nations-per-region (≤25 rows) on the aggregate output, never the
    fact table."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    rev = (
        customer.join(orders, orders.o_custkey == customer.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), nation.n_nationkey == customer.c_nationkey)
        .join(F.broadcast(region), region.r_regionkey == nation.n_regionkey)
        .groupBy(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
        )
        .agg(
            F.sum(
                F.floor(revenue * 10000 + F.lit(0.5)).cast("long")
            ).alias("rev_scaled")
        )
    )
    w = Window.partitionBy("region_name")
    return rev.select(
        "region_name",
        "nation_name",
        (F.col("rev_scaled").cast("double") / 10000).alias("revenue"),
        (
            F.col("rev_scaled").cast("double")
            / F.sum("rev_scaled").over(w).cast("double")
        ).alias("region_share"),
    )


@query(
    "orders_month_over_month",
    oracle="""
        WITH monthly AS (
          SELECT date_trunc('month', o_orderdate) AS month,
                 CAST(COUNT(*) AS BIGINT) AS n_orders
          FROM orders GROUP BY 1
        )
        SELECT CAST(month AS DATE) AS month, n_orders,
               LAG(n_orders) OVER (ORDER BY month) AS prev_orders,
               CAST(n_orders - LAG(n_orders) OVER (ORDER BY month)
                    AS DOUBLE)
                 / CAST(LAG(n_orders) OVER (ORDER BY month) AS DOUBLE)
                 AS mom_change
        FROM monthly
    """,
)
def orders_month_over_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month order growth — the reporting delta every BI
    surface needs (count, previous month, fractional change; first
    month's change is NULL).

    The lag window is GLOBAL but runs over the monthly aggregate (one
    row per month — dozens of rows at any fact volume), never the fact
    table; this is the same pre-aggregated-global-window pattern as
    moving_avg_daily_revenue (waived in the hazard sweep with the
    boundedness argument). The change ratio is one BIGINT→DOUBLE
    division pair on identical operands — engine-exact."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    w = Window.orderBy("month")
    prev = F.lag("n_orders").over(w)
    return monthly.select(
        F.col("month").cast("date").alias("month"),
        "n_orders",
        prev.alias("prev_orders"),
        (
            (F.col("n_orders") - prev).cast("double")
            / prev.cast("double")
        ).alias("mom_change"),
    )


@query(
    "referential_integrity_audit",
    oracle="""
        SELECT 'dup_order_keys' AS check_name,
               CAST(COALESCE(SUM(n - 1), 0) AS BIGINT) AS n_violations
        FROM (SELECT o_orderkey, COUNT(*) AS n FROM orders
              GROUP BY o_orderkey HAVING COUNT(*) > 1)
        UNION ALL
        SELECT 'orphan_lineitems',
               CAST(COUNT(*) AS BIGINT)
        FROM lineitem l WHERE NOT EXISTS (
          SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        UNION ALL
        SELECT 'orphan_orders',
               CAST(COUNT(*) AS BIGINT)
        FROM orders o WHERE NOT EXISTS (
          SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        UNION ALL
        SELECT 'null_order_keys',
               CAST(COUNT(*) AS BIGINT)
        FROM orders WHERE o_orderkey IS NULL
    """,
)
def referential_integrity_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-table referential-integrity scorecard: duplicate primary
    keys, orphaned foreign keys (lineitem→orders, orders→customer), and
    NULL keys — the contract checks a warehouse runs before promoting a
    load (complements the single-table dq_audit).

    Each orphan check is a LEFT ANTI join on the key (Spark plans the
    NOT EXISTS the same way); duplicate-PK counts aggregate the key
    frame, not the facts. Four 1-row aggregates union into a fixed
    4-row scorecard at any volume."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")
    dup_pk = (
        orders.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .agg(
            F.lit("dup_order_keys").alias("check_name"),
            F.coalesce(F.sum(F.col("n") - 1), F.lit(0))
            .cast("long")
            .alias("n_violations"),
        )
    )
    orphan_li = (
        lineitem.join(
            orders, lineitem["l_orderkey"] == orders["o_orderkey"], "left_anti"
        )
        .agg(
            F.lit("orphan_lineitems").alias("check_name"),
            F.count(F.lit(1)).alias("n_violations"),
        )
    )
    orphan_orders = (
        orders.join(
            customer, orders["o_custkey"] == customer["c_custkey"], "left_anti"
        )
        .agg(
            F.lit("orphan_orders").alias("check_name"),
            F.count(F.lit(1)).alias("n_violations"),
        )
    )
    null_keys = orders.where(F.col("o_orderkey").isNull()).agg(
        F.lit("null_order_keys").alias("check_name"),
        F.count(F.lit(1)).alias("n_violations"),
    )
    return dup_pk.unionAll(orphan_li).unionAll(orphan_orders).unionAll(
        null_keys
    )


@query(
    "top3_orders_per_segment_with_ties",
    oracle="""
        SELECT c_mktsegment, o_orderkey, o_totalprice,
               CAST(rk AS BIGINT) AS price_rank
        FROM (
          SELECT c_mktsegment, o_orderkey, o_totalprice,
                 RANK() OVER (
                   PARTITION BY c_mktsegment ORDER BY o_totalprice DESC
                 ) AS rk
          FROM orders JOIN customer ON o_custkey = c_custkey
        ) WHERE rk <= 3
    """,
)
def top3_orders_per_segment_with_ties(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """WITH TIES top-k: rank() ≤ k admits every order tied at the
    boundary price — the ANSI FETCH FIRST ... WITH TIES semantics, vs
    top3_orders_per_segment's exactly-k row_number form. Because ties
    are INCLUDED rather than broken, the result set is deterministic
    without any tie-break column; rank() ≤ k still plans as
    WindowGroupLimit (rank is group-limit-eligible alongside
    row_number)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("o_totalprice"))
    return (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .select(
            "c_mktsegment",
            "o_orderkey",
            "o_totalprice",
            F.rank().over(w).cast("long").alias("price_rank"),
        )
        .where(F.col("price_rank") <= 3)
    )


@query(
    "brand_qty_weighted_avg_price",
    oracle=f"""
        SELECT p.p_brand,
               {sql_dec_sum("l.l_extendedprice * l.l_quantity")}
                 / SUM(l.l_quantity) AS wavg_price,
               CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT)
                 AS total_qty
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY p.p_brand
    """,
)
def brand_qty_weighted_avg_price(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Quantity-weighted average price per brand — the weighted mean
    every pricing report needs, where a plain AVG over-weights small
    orders.

    Numerator rides dec_sum (fixed-point, order-independent);
    denominator Σqty is a sum of small integral doubles — every partial
    is exact, so it too is order-independent — and the single division
    runs on identical operands in both engines. Part is broadcast-sized
    here; at registry scale the join shuffles on partkey once."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(part, part["p_partkey"] == li["l_partkey"])
        .groupBy("p_brand")
        .agg(
            (
                dec_sum(F.col("l_extendedprice") * F.col("l_quantity"))
                / F.sum("l_quantity")
            ).alias("wavg_price"),
            F.sum(F.col("l_quantity").cast("long")).alias("total_qty"),
        )
    )


#: Discrete quantiles: actual data values (order statistics), never
#: interpolated — quantile_disc / PERCENTILE_DISC semantics.
_DISC_QS = [0.25, 0.5, 0.75]


@query(
    "price_quartiles_disc",
    oracle=f"""
        SELECT CAST(q AS DOUBLE) AS q, v AS price FROM (
          SELECT unnest({_DISC_QS}) AS q,
                 unnest(quantile_disc(l_extendedprice, {_DISC_QS})) AS v
          FROM lineitem
        )
    """,
)
def price_quartiles_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENTILE_DISC quartiles of l_extendedprice: the returned values
    are ACTUAL data points (the order statistic at 0-based index
    ceil(q·n)−1 — DuckDB's quantile_disc convention, probed and pinned),
    which matters when the column is money or a code where an
    interpolated phantom value is meaningless.

    Runs on the shared _global_ranks distributed selection (range
    repartition + parallel local sorts + offset prefix-sum) — Spark has
    no percentile_disc aggregate, and its exact percentile would be the
    single-task sort _distributed_quantiles exists to avoid. The 3
    target ranks are broadcast; output is 3 rows at any volume."""
    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    spark_ = li.sparkSession
    ranked, n_total = _global_ranks(li, "l_extendedprice")
    targets = (
        spark_.range(1)
        .select(F.explode(F.array(*[F.lit(q) for q in _DISC_QS])).alias("q"))
        .crossJoin(F.broadcast(n_total))
        .select(
            "q",
            (F.ceil(F.col("q") * F.col("n")) - 1).alias("target_rank"),
        )
    )
    return ranked.join(
        F.broadcast(targets), ranked["grank"] == targets["target_rank"]
    ).select("q", F.col("v").alias("price"))


# --------------------------------------------------------------------------
# E114: skyline / Pareto-frontier query (multi-objective dominance filter)
# --------------------------------------------------------------------------


def _skyline_keep(df: DataFrame, part_cols: list[str]) -> DataFrame:
    """One dominance-filter pass within each partition of ``part_cols``
    (empty = global): keep a row iff no other row in the partition has
    sx ≥, sy ≥ with at least one strict. Two windows express that
    exactly: ``m_strict`` = max(sy) over strictly-larger sx (a RANGE
    frame on the integer sx), and the same-sx max; a row survives iff
    sy beats every strictly-larger-sx row AND is its sx-group maximum.
    Duplicate (sx, sy) pairs tie without strictness and all survive."""
    # DESC order + (unboundedPreceding, -1) ≡ "all rows with strictly
    # larger sx", but as a GROWING frame: Spark evaluates start-fixed
    # frames with one running aggregate (linear), while the equivalent
    # ASC (1, unboundedFollowing) shrinking frame re-scans the remaining
    # frame per row — O(rows²) per partition (measured 8.7 s → 1.8 s at
    # sf1 from this rewrite alone).
    w_strict = (
        Window.partitionBy(*part_cols)
        .orderBy(F.col("sx").desc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_samex = Window.partitionBy(*part_cols, "sx")
    return (
        df.withColumn("_m_strict", F.max("sy").over(w_strict))
        .withColumn("_m_samex", F.max("sy").over(w_samex))
        .filter(
            (F.col("_m_strict").isNull() | (F.col("_m_strict") < F.col("sy")))
            & (F.col("sy") == F.col("_m_samex"))
        )
        .drop("_m_strict", "_m_samex")
    )


@query(
    "skyline_customers_spend_orders",
    oracle=f"""
        WITH c AS (
          SELECT o_custkey AS custkey,
                 CAST(SUM(CAST(FLOOR(o_totalprice * {SCALE} + 0.5)
                        AS BIGINT)) AS BIGINT) AS sx,
                 COUNT(*) AS sy
          FROM orders GROUP BY o_custkey
        )
        SELECT custkey,
               CAST(sx AS DOUBLE) / {SCALE} AS total_spend,
               CAST(sy AS BIGINT) AS n_orders
        FROM c p
        WHERE NOT EXISTS (
          SELECT 1 FROM c q
          WHERE q.sx >= p.sx AND q.sy >= p.sy
            AND (q.sx > p.sx OR q.sy > p.sy)
        )
    """,
)
def skyline_customers_spend_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """E114: skyline (Pareto-frontier) operator — customers not dominated
    on (total spend, order count): no other customer is ≥ on both axes
    and strictly better on one. The multi-objective "best tradeoffs"
    query (Börzsönyi et al., ICDE 2001) that no single ORDER BY can
    express; the oracle is the literal NOT EXISTS dominance definition,
    the Spark plan is the distributed two-phase algorithm.

    Two-phase shape (skyline(S) = skyline(∪ skyline(P_i)) since
    dominance is transitive): phase 1 computes a LOCAL skyline inside
    each of 32 hash buckets of the aggregated per-customer frame —
    fully parallel, no global sort; phase 2 re-runs the same dominance
    filter globally over only the local survivors. For n random points
    the expected skyline is O(log n) per bucket, so the global pass
    sees ~buckets·log n rows, not n (anti-correlated adversarial data
    degrades gracefully to one sort of the still-reduced union). All
    dominance tests are scaled-integer compares; the only doubles are
    the final correctly-rounded unscale, so the hash gate holds at any
    parallelism — bucket assignment provably cannot change the result.
    """
    orders = load_table(spark, sf_dir, "orders")
    c = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * SCALE + F.lit(0.5))
        ).cast("long").alias("sx"),
        F.count(F.lit(1)).alias("sy"),
    )
    bucketed = c.withColumn(
        "_pid", F.pmod(F.xxhash64(F.col("custkey")), F.lit(32))
    )
    local = _skyline_keep(bucketed, ["_pid"]).drop("_pid")
    global_sky = _skyline_keep(local, [])
    return global_sky.select(
        "custkey",
        (F.col("sx").cast("double") / SCALE).alias("total_spend"),
        F.col("sy").alias("n_orders"),
    )


# --------------------------------------------------------------------------
# E194: grouped OLS — discount-quantity response per brand
# --------------------------------------------------------------------------

_ELAST_SCALE = 100  # 2-dp fixed point for discount (x) and quantity (y)
_ELAST_SLOPE = (
    "(CAST(n * sxy - sx * sy AS DOUBLE)"
    " / NULLIF(CAST(n * sxx - sx * sx AS DOUBLE), 0.0))"
)
_ELAST_R2 = (
    "((CAST(n * sxy - sx * sy AS DOUBLE)"
    " * CAST(n * sxy - sx * sy AS DOUBLE))"
    " / NULLIF(CAST(n * sxx - sx * sx AS DOUBLE)"
    " * CAST(n * syy - sy * sy AS DOUBLE), 0.0))"
)


@query(
    "discount_qty_slope_by_brand",
    oracle=f"""
        WITH base AS (
          SELECT p.p_brand AS brand,
                 CAST(FLOOR(CAST(l.l_discount AS DOUBLE) * {_ELAST_SCALE}
                            + 0.5) AS BIGINT) AS x,
                 CAST(FLOOR(CAST(l.l_quantity AS DOUBLE) * {_ELAST_SCALE}
                            + 0.5) AS BIGINT) AS y
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        ), m AS (
          SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CAST(x AS HUGEINT)) AS sx,
                 SUM(CAST(y AS HUGEINT)) AS sy,
                 SUM(CAST(x AS HUGEINT) * y) AS sxy,
                 SUM(CAST(x AS HUGEINT) * x) AS sxx,
                 SUM(CAST(y AS HUGEINT) * y) AS syy
          FROM base GROUP BY brand
        )
        SELECT brand, n AS n_lines,
               {_ELAST_SLOPE} AS qty_per_discount_unit,
               {_ELAST_R2} AS r_squared
        FROM m
    """,
)
def discount_qty_slope_by_brand(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """E194: grouped OLS — per brand, the regression slope of quantity
    on discount (does discounting move volume, and for WHICH brands?)
    with its R². E138's `ols_value_regression` fits ONE global line;
    the grouped form is the per-key variant a pricing team actually
    reads, and it stays a single aggregate: every group's five moments
    ride one brand-keyed exchange — no per-group iteration, no ML
    library.

    Exactness: both variables fix to 2-dp integers; per-brand moments
    are exact 128-bit; slope and R² are shared-literal chains (NULL
    slope for a brand with constant discount — zero x-variance).

    Scale: fact join (partkey-keyed, AQE-broadcastable dim) → one
    map-side-combinable aggregate to the |brands| frame (25 rows) →
    per-row arithmetic."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    base = li.join(part, li["l_partkey"] == part["p_partkey"]).select(
        F.col("p_brand").alias("brand"),
        F.floor(F.col("l_discount").cast("double") * _ELAST_SCALE + F.lit(0.5))
        .cast("long")
        .alias("x"),
        F.floor(F.col("l_quantity").cast("double") * _ELAST_SCALE + F.lit(0.5))
        .cast("long")
        .alias("y"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = base.groupBy("brand").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec("x")).alias("sx"),
        F.sum(dec("y")).alias("sy"),
        F.sum(dec("x") * F.col("y")).alias("sxy"),
        F.sum(dec("x") * F.col("x")).alias("sxx"),
        F.sum(dec("y") * F.col("y")).alias("syy"),
    )
    return m.select(
        "brand",
        F.col("n").alias("n_lines"),
        F.expr(_ELAST_SLOPE).alias("qty_per_discount_unit"),
        F.expr(_ELAST_R2).alias("r_squared"),
    )


# --------------------------------------------------------------------------
# E202: duplicate-charge candidates (same customer, amount, ±1 day)
# --------------------------------------------------------------------------


@query(
    "duplicate_charge_candidates",
    oracle="""
        WITH o AS (
          SELECT o_custkey AS custkey, o_orderkey,
                 CAST(FLOOR(CAST(o_totalprice AS DOUBLE) * 100 + 0.5)
                   AS BIGINT) AS amt,
                 CAST(o_orderdate AS DATE) AS d
          FROM orders
        )
        SELECT a.custkey,
               CAST(a.amt AS DOUBLE) / 100 AS amount,
               a.o_orderkey AS orderkey_a, b.o_orderkey AS orderkey_b,
               CAST(date_diff('day', a.d, b.d) AS BIGINT) AS day_gap
        FROM o a JOIN o b
          ON a.custkey = b.custkey AND a.amt = b.amt
         AND a.o_orderkey < b.o_orderkey
         AND b.d BETWEEN a.d - INTERVAL 1 DAY AND a.d + INTERVAL 1 DAY
    """,
)
def duplicate_charge_candidates(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """E202: double-billing detector — order pairs with the SAME
    customer, the SAME amount (exact, at cents), placed within ±1
    calendar day: the deterministic screen a payments team runs before
    any fuzzy fraud model (true double-charges are exact-amount
    near-simultaneous repeats). Distinct from E43's event debounce
    (which collapses same-type bursts) — this yields the PAIRS with
    their day gap, for human review.

    Scale: the self-join keys on (custkey, exact amount) — a composite
    that is nearly unique, so per-key fan-out is tiny and NO band/range
    machinery is needed; the ±1-day check is a residual filter on the
    keyed join's output. Orderkey ordering dedups the pair symmetric
    double."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        "o_orderkey",
        F.floor(F.col("o_totalprice").cast("double") * 100 + F.lit(0.5))
        .cast("long")
        .alias("amt"),
        F.col("o_orderdate").cast("date").alias("d"),
    )
    a = o.select(
        "custkey",
        F.col("o_orderkey").alias("orderkey_a"),
        "amt",
        F.col("d").alias("da"),
    )
    b = o.select(
        F.col("custkey").alias("custkey_b"),
        F.col("o_orderkey").alias("orderkey_b"),
        F.col("amt").alias("amt_b"),
        F.col("d").alias("db"),
    )
    return (
        a.join(
            b,
            (F.col("custkey") == F.col("custkey_b"))
            & (F.col("amt") == F.col("amt_b"))
            & (F.col("orderkey_a") < F.col("orderkey_b"))
            & F.col("db").between(
                F.date_sub(F.col("da"), 1), F.date_add(F.col("da"), 1)
            ),
        )
        .select(
            "custkey",
            (F.col("amt").cast("double") / 100).alias("amount"),
            "orderkey_a",
            "orderkey_b",
            F.datediff(F.col("db"), F.col("da")).cast("long").alias(
                "day_gap"
            ),
        )
    )
