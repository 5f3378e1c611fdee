"""Market-basket analysis (SURVEY.md §2.6 E119): A-priori frequent
itemsets over order baskets.

The reference's per-user counting (sree-etl-tdk-glue-job.py:55-60) is a
1-itemset frequency table; the classic next question — which items
co-occur in the SAME basket more often than chance capacity allows —
is the A-priori lattice walk (Agrawal & Srikant, VLDB'94). The graph
pack already materializes the 2-itemset level as its edge relation
(graph.py MIN_COOCCUR); this module walks one level further to
frequent TRIPLES, because level 3 is where the downward-closure prune
(every sub-pair of a frequent triple must itself be frequent) starts
doing real work.

Scale shape: all candidate generation happens as self-joins keyed on
the ORDER (the natural shuffle key, paid from one persisted dedup of
the basket relation), so per-order cost is bounded by basket_size³/6 —
TPC-H baskets are ≤ 7 items, and any retail-shaped basket is O(10²);
the 100 TB guard is basket size, not corpus size. The (p1,p2) prune is
applied BETWEEN the second and third join, so triples are only
expanded under already-frequent pairs — at minsup=2 on sf0.01 that
cuts candidate pairs from ~76k to 3.4k before the widest join. The
final support filter recounts candidates EXACTLY, so pruning can only
reduce work, never change the answer (same invariant as the E116
verify pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query, scoped_persist

#: Minimum basket support for pairs AND triples (unrolled in the oracle).
MINSUP = 2


@query(
    "frequent_part_triples",
    oracle=f"""
        WITH b AS (
          SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        )
        SELECT a.l_partkey AS p1, c.l_partkey AS p2, d.l_partkey AS p3,
               COUNT(*) AS support
        FROM b a
        JOIN b c ON a.l_orderkey = c.l_orderkey
               AND a.l_partkey < c.l_partkey
        JOIN b d ON a.l_orderkey = d.l_orderkey
               AND c.l_partkey < d.l_partkey
        GROUP BY 1, 2, 3
        HAVING COUNT(*) >= {MINSUP}
    """,
)
def frequent_part_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E119: frequent 3-itemsets of parts co-ordered in ≥ MINSUP
    baskets, via the A-priori downward-closure prune. The oracle is the
    direct 3-way self-join; the Spark plan inserts the level-2 prune so
    the widest join only expands candidates whose leading pair is
    already frequent — exactness is unaffected because the final
    HAVING recounts every surviving triple."""
    li = load_table(spark, sf_dir, "lineitem")
    b = scoped_persist(
        li.select("l_orderkey", "l_partkey").distinct()
    )
    a = b.select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("p1")
    )
    c = b.select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("p2")
    )
    d = b.select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("p3")
    )
    pairs = a.join(c, "okey").filter(F.col("p1") < F.col("p2"))
    freq_pairs = (
        pairs.groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("sup2"))
        .filter(F.col("sup2") >= MINSUP)
        .select("p1", "p2")
    )
    pruned_pairs = pairs.join(freq_pairs, ["p1", "p2"], "left_semi")
    triples = pruned_pairs.join(d, "okey").filter(
        F.col("p2") < F.col("p3")
    )
    return (
        triples.groupBy("p1", "p2", "p3")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= MINSUP)
    )
