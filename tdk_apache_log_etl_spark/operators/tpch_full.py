"""The remaining TPC-H query shapes (Q2/7/8/9/11/13/16/17/20/21/22).

Round 1 covered Q1/3/4/5/6/10/12/14/15/18/19; this module completes the
22-query benchmark surface.  The reference has no joins at all
(SURVEY.md §2.5 — verified absences), so like relational.py these are the
E7 enrichment-join family stretched to every classic decision-support
shape: correlated-min subqueries, double-correlated EXISTS / NOT EXISTS,
scalar-subquery HAVING, and distribution-of-counts.

The fixture schema omits ``partsupp`` and the comment/phone/commitdate
columns, so four queries are *shape-preserving adaptations* (documented
per query): the plan topology — what correlates with what, which side
aggregates first, where the semi/anti joins sit — matches the TPC-H
original even where a column had to be derived from ``lineitem`` history
instead of ``partsupp``.

Scale rules (same as relational.py):
  * no forced broadcast of unbounded dimensions (supplier/customer/part
    even filtered) — AQE decides from measured post-filter sizes;
    ``nation``/``region`` are bounded (25/5 rows forever) and safe to
    broadcast;
  * correlated scalar subqueries become window functions over the
    correlation key (one shuffle, no join back) when the correlation is
    to the same frame, or a 1-row crossJoin when truly global;
  * money aggregates use the scaled-integer trick (operators/numeric.py)
    so results are bit-identical to the DuckDB oracle regardless of
    partitioning/AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .numeric import SCALE, dec_sum, sql_dec_sum
from .registry import query
from .relational import _ts


def _year(col: str) -> F.Column:
    """Calendar year as a string — identical rendering in both engines
    (Spark year() is INT while DuckDB's is BIGINT, so strings avoid an
    integer-width schema mismatch in the driver's typed hash)."""
    return F.date_format(col, "yyyy")


# --------------------------------------------------------------------------
# Q2: minimum-cost supplier (correlated MIN subquery)
# --------------------------------------------------------------------------


@query(
    "tpch_q2_min_cost_supplier",
    oracle=f"""
        WITH unit AS (
          SELECT l_partkey, l_suppkey,
                 {sql_dec_sum("l_extendedprice / l_quantity")} / COUNT(*)
                   AS supply_cost
          FROM lineitem GROUP BY l_partkey, l_suppkey
        ),
        m AS (
          SELECT *, MIN(supply_cost) OVER (PARTITION BY l_partkey)
                      AS min_cost
          FROM unit
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supply_cost
        FROM m
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE p_type = 'STANDARD' AND r_name = 'ASIA'
          AND supply_cost = min_cost
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape. The original correlates on partsupp
    (``ps_supplycost = (SELECT MIN(ps_supplycost) ...)``); without a
    partsupp fixture the per-(part, supplier) cost is derived as the
    average unit price from lineitem history — the correlated-MIN
    topology is identical.

    Plan (r2, one full-lineitem shuffle saved): the p_type filter is
    pushed BELOW the expensive aggregation as a left-semi join on
    p_partkey — legal because min_cost is per-partkey, so dropping other
    parts' rows cannot change any surviving row. Then ONE explicit
    repartition on l_partkey alone feeds BOTH the (partkey, suppkey)
    aggregate and the window MIN: hash-partitioning on a subset of the
    group keys satisfies the aggregate's clustering requirement, and the
    window needs exactly that subset — so agg and window share a single
    exchange (asserted in tests/test_plans.py). The semi side broadcasts
    under AQE at bench scale; at 100 TB a shuffle semi-join partitions
    lineitem by l_partkey anyway, which this layout then reuses for free.
    Dimension joins afterwards touch only the min-cost survivors;
    nation/region broadcast (bounded). Ties all survive, as in the
    original; the sort key (s_acctbal, n_name, s_name, p_partkey) is
    unique per row so the LIMIT 100 cut is deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "STANDARD"
    )
    li_std = li.join(
        part.select("p_partkey"),
        li["l_partkey"] == F.col("p_partkey"),
        "left_semi",
    )
    unit = (
        li_std.repartition("l_partkey")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            (
                dec_sum(F.col("l_extendedprice") / F.col("l_quantity"))
                / F.count(F.lit(1))
            ).alias("supply_cost")
        )
        .withColumn(
            "min_cost",
            F.min("supply_cost").over(Window.partitionBy("l_partkey")),
        )
        .filter(F.col("supply_cost") == F.col("min_cost"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    return (
        unit.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            "supply_cost",
        )
        .orderBy(
            F.desc("s_acctbal"), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q7: volume shipping between two nations
# --------------------------------------------------------------------------


@query(
    "tpch_q7_volume_shipping",
    oracle=f"""
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               strftime(l_shipdate, '%Y') AS l_year,
               {sql_dec_sum("l_extendedprice * (1 - l_discount)")} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1, 2, 3
    """,
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bidirectional trade volume between two nations by year.

    The nation pair predicate is pushed below the fact joins: supplier
    and customer each pre-join a 2-row filtered nation broadcast, so the
    fact tables only shuffle rows belonging to the two nations' suppliers
    /customers.  The disjunctive pair filter then runs on the already
    joined names — cheap, and the n² nation cross never materializes."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    lo = _ts(li, "l_shipdate", "1996-01-01")
    hi = _ts(li, "l_shipdate", "1998-01-01")
    supp_n = supp.join(
        F.broadcast(nation.select(
            F.col("n_nationkey").alias("s_nk"),
            F.col("n_name").alias("supp_nation"),
        )),
        F.col("s_nationkey") == F.col("s_nk"),
    ).select("s_suppkey", "supp_nation")
    cust_n = cust.join(
        F.broadcast(nation.select(
            F.col("n_nationkey").alias("c_nk"),
            F.col("n_name").alias("cust_nation"),
        )),
        F.col("c_nationkey") == F.col("c_nk"),
    ).select("c_custkey", "cust_nation")
    return (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust_n, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp_n, F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_1")
             & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2")
               & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            _year("l_shipdate").alias("l_year"),
        )
        .agg(
            dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )


# --------------------------------------------------------------------------
# Q8: national market share
# --------------------------------------------------------------------------


@query(
    "tpch_q8_market_share",
    oracle="""
        WITH all_nations AS (
          SELECT strftime(o_orderdate, '%Y') AS o_year,
                 CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000
                            + 0.5) AS BIGINT) AS vol_scaled,
                 n2.n_name AS supp_nation
          FROM part
          JOIN lineitem ON p_partkey = l_partkey
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region ON n1.n_regionkey = r_regionkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE r_name = 'AFRICA' AND p_type = 'PROMO'
            AND o_orderdate >= TIMESTAMP '1996-01-01'
            AND o_orderdate < TIMESTAMP '1998-01-01'
        )
        SELECT o_year,
               CAST(SUM(CASE WHEN supp_nation = 'NATION_5'
                             THEN vol_scaled ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(vol_scaled) AS DOUBLE) AS mkt_share
        FROM all_nations GROUP BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_5's share of PROMO-part revenue sold into AFRICA
    (its own region) by order year.  The share is a ratio of two sums
    over the SAME joined frame, so it's one conditional aggregation —
    never two scans.  Both numerator and denominator are summed as scaled
    integers (exact under any partitioning) and divided once at the end.
    Join order: part is the most selective filter and enters first
    against lineitem, then the order/customer/region leg restricts to the
    target region, and the supplier leg merely labels rows for the CASE."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "PROMO"
    )
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "AFRICA"
    )
    lo = _ts(orders, "o_orderdate", "1996-01-01")
    hi = _ts(orders, "o_orderdate", "1998-01-01")
    cust_in_region = (
        cust.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                ).select(F.col("n_nationkey").alias("c_nk"))
            ),
            F.col("c_nationkey") == F.col("c_nk"),
        ).select("c_custkey")
    )
    supp_n = supp.join(
        F.broadcast(nation.select(
            F.col("n_nationkey").alias("s_nk"),
            F.col("n_name").alias("supp_nation"),
        )),
        F.col("s_nationkey") == F.col("s_nk"),
    ).select("s_suppkey", "supp_nation")
    vol_scaled = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * SCALE
        + F.lit(0.5)
    ).cast("long")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(
            orders.filter(
                (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust_in_region, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp_n, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            _year("o_orderdate").alias("o_year"),
            vol_scaled.alias("vol_scaled"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(
                        F.col("supp_nation") == "NATION_5",
                        F.col("vol_scaled"),
                    ).otherwise(F.lit(0))
                ).cast("double")
                / F.sum("vol_scaled").cast("double")
            ).alias("mkt_share")
        )
    )


# --------------------------------------------------------------------------
# Q9: product-type profit by nation and year
# --------------------------------------------------------------------------


@query(
    "tpch_q9_product_profit",
    oracle=f"""
        SELECT n_name AS nation,
               strftime(o_orderdate, '%Y') AS o_year,
               {sql_dec_sum("l_extendedprice * (1 - l_discount)")}
                 AS sum_profit
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN nation ON n_nationkey = s_nationkey
        WHERE p_name LIKE '%red%'
        GROUP BY 1, 2
    """,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on 'red' parts by supplier nation and
    order year.  The original subtracts ps_supplycost; without partsupp
    the profit measure is the discounted revenue — join topology
    (5 tables, LIKE filter on part, group by nation × year) unchanged.

    The LIKE '%red%' predicate can't prune parquet row groups but DOES
    run inside the scan (pushed data filter) before the join; part enters
    the fact join first so only red-part lineitems reach the wider joins."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    )
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            F.broadcast(nation),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            _year("o_orderdate").alias("o_year"),
        )
        .agg(
            dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("sum_profit")
        )
    )


# --------------------------------------------------------------------------
# Q11: important parts (scalar-subquery HAVING)
# --------------------------------------------------------------------------


@query(
    "tpch_q11_important_parts",
    oracle="""
        WITH base AS (
          SELECT l_partkey,
                 CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000
                            + 0.5) AS BIGINT) AS v
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          WHERE n_name = 'NATION_3'
        ),
        per_part AS (
          SELECT l_partkey, CAST(SUM(v) AS BIGINT) AS val_scaled
          FROM base GROUP BY l_partkey
        )
        SELECT l_partkey AS p_partkey,
               CAST(val_scaled AS DOUBLE) / 10000 AS part_value
        FROM per_part
        WHERE CAST(val_scaled AS DOUBLE) >
              (SELECT 1.5 * CAST(SUM(val_scaled) AS DOUBLE) / COUNT(*)
               FROM per_part)
    """,
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose traded value through NATION_3
    suppliers exceeds a fraction of the nation's total.  The original
    sums partsupp availability value; here value is lineitem revenue
    through those suppliers — the scalar-subquery-in-HAVING topology is
    identical.

    The global total is the sum of the per-part scaled sums: computed as
    a 1-row aggregate of the SAME per-part frame and crossJoined back
    (Spark broadcasts a single row; no second scan of lineitem because
    the per-part frame is the common subplan).  All sums are exact
    integer sums.  TPC-H scales Q11's fraction with SF (0.0001/SF); the
    equivalent SF-free form used here is a threshold relative to the
    AVERAGE part share (1.5×), so the query stays selective-but-nonempty
    at every fixture scale."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3"
    )
    v = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * SCALE
        + F.lit(0.5)
    ).cast("long")
    base = (
        li.join(
            supp.join(
                F.broadcast(nation),
                F.col("s_nationkey") == F.col("n_nationkey"),
            ).select("s_suppkey"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        ).select("l_partkey", v.alias("v"))
    )
    per_part = base.groupBy("l_partkey").agg(
        F.sum("v").alias("val_scaled")
    )
    total = per_part.agg(
        (
            1.5 * F.sum("val_scaled").cast("double") / F.count(F.lit(1))
        ).alias("avg_threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("val_scaled").cast("double") > F.col("avg_threshold")
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("val_scaled").cast("double") / SCALE).alias(
                "part_value"
            ),
        )
    )


# --------------------------------------------------------------------------
# Q13: customer order-count distribution
# --------------------------------------------------------------------------


@query(
    "tpch_q13_customer_distribution",
    oracle="""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
          SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer
          LEFT JOIN orders ON c_custkey = o_custkey
                          AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey
        )
        GROUP BY c_count
    """,
)
def tpch_q13_customer_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q13: how many customers placed 0, 1, 2, … orders.  The
    original excludes orders by an o_comment NOT LIKE; the fixture has no
    comment column so the exclusion predicate is on o_orderpriority —
    same plan: outer join with a filter INSIDE the join condition (so
    excluded orders count as no-order, not as dropped customers), then
    two aggregations.  The second group-by key (c_count) has tiny
    cardinality, so the second exchange is negligible; the first
    aggregates on the join key it already shuffled on."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


# --------------------------------------------------------------------------
# Q16: supplier count by part attributes (NOT IN anti join)
# --------------------------------------------------------------------------


@query(
    "tpch_q16_supplier_cnt",
    oracle="""
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_type <> 'PROMO'
          AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
          AND l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY p_brand, p_type, p_size
    """,
)
def tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct suppliers able to supply each
    (brand, type, size) bucket, excluding a blacklist subquery.  The
    original's supplier link is partsupp and the blacklist is a comment
    LIKE; here the link is lineitem history and the blacklist is
    negative-balance suppliers — NOT IN → anti join, exactly as Catalyst
    plans the original.

    The anti join runs FIRST on the narrow (suppkey) column so
    blacklisted rows never reach the part join; s_suppkey is non-null so
    NOT IN and ANTI are equivalent (no null-semantics trap)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
    )
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(
            bad_supp,
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# Q17: small-quantity-order revenue (correlated AVG subquery)
# --------------------------------------------------------------------------


@query(
    "tpch_q17_small_qty_revenue",
    oracle=f"""
        WITH j AS (
          SELECT p_partkey, l_quantity, l_extendedprice
          FROM lineitem JOIN part ON p_partkey = l_partkey
          WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
        ),
        w AS (
          SELECT l_quantity, l_extendedprice,
                 CAST(SUM(CAST(FLOOR(l_quantity * 10000 + 0.5) AS BIGINT))
                      OVER (PARTITION BY p_partkey) AS DOUBLE) / 10000
                   / COUNT(*) OVER (PARTITION BY p_partkey) AS avg_qty
          FROM j
        )
        SELECT {sql_dec_sum("l_extendedprice")} / 7.0 AS avg_yearly
        FROM w WHERE l_quantity < 0.5 * avg_qty
    """,
)
def tpch_q17_small_qty_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q17: revenue that would be lost by refusing small orders of
    Brand#3 SMALL parts (p_type stands in for the missing p_container).
    The correlated ``AVG(l_quantity) WHERE l_partkey = p_partkey``
    decorrelates into a window average over the part key — the part
    filter keeps every lineitem of each qualifying part, so the window
    sees exactly the rows the correlated subquery would.  One shuffle on
    partkey serves both the window and the filter; the final aggregate
    is a 1-row reduction.  The window average uses the scaled-integer
    sum so the 0.5 × avg threshold compares identically in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
    )
    w = Window.partitionBy("p_partkey")
    joined = li.join(part, F.col("l_partkey") == F.col("p_partkey"))
    avg_qty = (
        F.sum(
            F.floor(F.col("l_quantity") * SCALE + F.lit(0.5)).cast("long")
        ).over(w).cast("double")
        / SCALE
        / F.count(F.lit(1)).over(w)
    )
    return (
        joined.withColumn("avg_qty", avg_qty)
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            (dec_sum(F.col("l_extendedprice")) / 7.0).alias("avg_yearly")
        )
    )


# --------------------------------------------------------------------------
# Q20: part-promotion suppliers (nested semi joins)
# --------------------------------------------------------------------------


@query(
    "tpch_q20_promotion_suppliers",
    oracle="""
        SELECT s_name, s_acctbal
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_7'
          AND s_suppkey IN (
            SELECT l_suppkey
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            WHERE p_name LIKE 'red%'
              AND l_shipdate >= TIMESTAMP '1998-01-01'
              AND l_shipdate < TIMESTAMP '1999-01-01'
            GROUP BY l_suppkey, l_partkey
            HAVING CAST(SUM(CAST(FLOOR(l_quantity * 10000 + 0.5)
                                 AS BIGINT)) AS BIGINT) > 250000
          )
    """,
)
def tpch_q20_promotion_suppliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q20 shape: NATION_7 suppliers who moved serious volume of
    'red' parts in 1998.  The original compares shipped quantity to
    partsupp availability; without partsupp the inner threshold is an
    absolute quantity (> 25 units, scaled ×10⁴) — the nesting is
    unchanged: an aggregate-HAVING subquery feeding a semi join feeding
    the nation-filtered supplier scan.

    The inner aggregate groups by (suppkey, partkey) — the per-part
    grain the original correlates on — then projects the distinct
    suppkeys for a LEFT SEMI join.  Quantity sums use scaled integers so
    the HAVING boundary (exactly 25.0) cuts identically in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("red%")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_7"
    )
    lo = _ts(li, "l_shipdate", "1998-01-01")
    hi = _ts(li, "l_shipdate", "1999-01-01")
    movers = (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(
                F.floor(F.col("l_quantity") * SCALE + F.lit(0.5))
                .cast("long")
            ).alias("qty_scaled")
        )
        .filter(F.col("qty_scaled") > 25 * SCALE)
        .select("l_suppkey")
    )
    return (
        supp.join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            movers,
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_name", "s_acctbal")
    )


# --------------------------------------------------------------------------
# Q21: suppliers who kept orders waiting (EXISTS + NOT EXISTS)
# --------------------------------------------------------------------------


@query(
    "tpch_q21_waiting_suppliers",
    oracle="""
        SELECT s_name, COUNT(*) AS numwait
        FROM lineitem l1
        JOIN orders ON o_orderkey = l1.l_orderkey
        JOIN supplier ON s_suppkey = l1.l_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE o_orderstatus = 'F'
          AND n_name = 'NATION_2'
          AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          AND EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
    """,
)
def tpch_q21_waiting_suppliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q21: the sole-blame detector — NATION_2 suppliers whose
    line was the ONLY late one on a finished multi-supplier order.
    "Late" is l_shipdate > o_orderdate + 60 days (the fixture has no
    commit/receipt dates; the lateness predicate differs, the correlated
    topology doesn't).

    Rather than two correlated joins back to lineitem (the EXISTS and
    NOT EXISTS), the per-order facts — distinct suppliers and distinct
    LATE suppliers — come from collect_set window aggregates over
    l_orderkey: EXISTS(other supplier) ≡ n_supp ≥ 2, NOT EXISTS(other
    late supplier) ≡ n_late_supp = 1 given the candidate row itself is
    late.  The window form reads the lineitem⋈orders frame ONCE (a
    groupBy + join-back re-scans both fact tables — measured, no
    ReusedExchange) and shuffles once on l_orderkey; per-order state is
    the supplier set of one order (~7 entries), bounded at any scale.
    The count(*) grain (candidate late lines) matches the oracle's
    EXISTS form exactly."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_2"
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        "INTERVAL 60 DAY"
    )
    w = Window.partitionBy("l_orderkey")
    nation_supp = supp.join(
        F.broadcast(nation),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "l_suppkey", late.alias("is_late"))
        .select(
            "l_suppkey",
            "is_late",
            F.size(F.collect_set("l_suppkey").over(w)).alias("n_supp"),
            F.size(
                F.collect_set(
                    F.when(F.col("is_late"), F.col("l_suppkey"))
                ).over(w)
            ).alias("n_late_supp"),
        )
        .filter(
            F.col("is_late")
            & (F.col("n_supp") >= 2)
            & (F.col("n_late_supp") == 1)
        )
        .join(nation_supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q22: global sales opportunity (anti join + global-scalar threshold)
# --------------------------------------------------------------------------


@query(
    "tpch_q22_sales_opportunity",
    oracle="""
        WITH coded AS (
          SELECT CAST(c_custkey % 7 AS INTEGER) AS cntrycode,
                 c_custkey, c_acctbal
          FROM customer
        ),
        threshold AS (
          SELECT CAST(SUM(CAST(FLOOR(c_acctbal * 10000 + 0.5) AS BIGINT))
                      AS DOUBLE) / 10000 / COUNT(*) AS avg_bal
          FROM coded
          WHERE c_acctbal > 0.0 AND cntrycode IN (1, 2, 4, 5)
        )
        SELECT cntrycode,
               COUNT(*) AS numcust,
               CAST(SUM(CAST(FLOOR(c_acctbal * 10000 + 0.5) AS BIGINT))
                    AS DOUBLE) / 10000 AS totacctbal
        FROM coded, threshold
        WHERE cntrycode IN (1, 2, 4, 5)
          AND c_acctbal > avg_bal
          AND NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey
              AND o_orderdate >= TIMESTAMP '2000-01-01'
          )
        GROUP BY cntrycode
    """,
)
def tpch_q22_sales_opportunity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q22: well-funded customers in target countries who have
    gone quiet.  The fixture has no c_phone, so the country code is
    c_custkey mod 7; "quiet" is no order since 2000 (every fixture
    customer has SOME order, so the original's NOT EXISTS-any-order
    would be vacuously empty — the recency cutoff restores the intended
    anti-join selectivity).

    Three pieces, each the scale-right shape: the global average balance
    is a 1-row aggregate crossJoined back (broadcast, no driver
    round-trip); the quiet check is an anti join against date-filtered
    orders (pushed-down range scan); the final rollup groups by the
    7-value code.  Balance sums are scaled-integer exact."""
    cust = load_table(spark, sf_dir, "customer").select(
        (F.col("c_custkey") % 7).cast("int").alias("cntrycode"),
        "c_custkey",
        "c_acctbal",
    ).filter(F.col("cntrycode").isin(1, 2, 4, 5))
    orders = load_table(spark, sf_dir, "orders")
    cutoff = _ts(orders, "o_orderdate", "2000-01-01")
    recent = orders.filter(F.col("o_orderdate") >= cutoff).select(
        "o_custkey"
    )
    threshold = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(
                F.floor(F.col("c_acctbal") * SCALE + F.lit(0.5))
                .cast("long")
            ).cast("double")
            / SCALE
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            recent,
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dec_sum(F.col("c_acctbal")).alias("totacctbal"),
        )
    )
