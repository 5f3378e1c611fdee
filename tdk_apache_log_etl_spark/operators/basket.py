"""Market-basket analysis (SURVEY.md §2.6 E119/E125/E126): A-priori
frequent itemsets, item-item collaborative filtering, and the sweep-line
backlog curve over order baskets/intervals.

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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query, scoped_persist

#: Minimum basket support for pairs AND triples (unrolled in the oracle).
MINSUP = 2


def _distinct_baskets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ONE persisted distinct (l_orderkey, l_partkey) incidence
    frame the basket family starts from. Factored so every consumer
    (triples, item-item CF, the two holdout metrics) persists a
    semantically IDENTICAL frame — scoped_persist keys on semantic
    hash, so adjacent basket queries share one materialization instead
    of re-running the scan+distinct (the itemcf pair previously
    persisted a RENAMED variant, a different hash, and re-paid it)."""
    li = load_table(spark, sf_dir, "lineitem")
    return scoped_persist(li.select("l_orderkey", "l_partkey").distinct())


def _holdout_split_and_recs(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Shared E164/E222 eval scaffolding: the deterministic holdout
    split, the train-side co-occurrence pair count, and the K-bounded
    rec lists WITH their rank column. Factored so both metrics build
    bit-identical plans for the expensive shared prefix (Σ basket² pair
    join + per-src window): with the bench placing the two queries
    adjacently, scoped_persist serves the second query from cache.
    Returns (test, recs_rn); output values of both callers unchanged."""
    items = _distinct_baskets(spark, sf_dir).select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("item")
    )
    is_test = F.col("okey") % _CF_TEST_MOD == 0
    train = items.where(~is_test)
    test = scoped_persist(items.where(is_test))
    a, b = train.alias("a"), train.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.okey") == F.col("b.okey"))
            & (F.col("a.item") != F.col("b.item")),
        )
        .groupBy(F.col("a.item").alias("src"), F.col("b.item").alias("dst"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    w = Window.partitionBy("src").orderBy(F.desc("c"), F.asc("dst"))
    recs_rn = scoped_persist(
        pairs.select("src", "dst", F.row_number().over(w).alias("rn")).where(
            F.col("rn") <= _CF_K
        )
    )
    return test, recs_rn


@query(
    "frequent_part_triples",
    oracle=f"""
        WITH b AS MATERIALIZED (
          SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ), pr AS MATERIALIZED (
          SELECT a.l_orderkey, a.l_partkey AS p1, c.l_partkey AS p2
          FROM b a
          JOIN b c ON a.l_orderkey = c.l_orderkey
                 AND a.l_partkey < c.l_partkey
        )
        SELECT pr.p1, pr.p2, d.l_partkey AS p3,
               COUNT(*) AS support
        FROM pr
        JOIN b d ON pr.l_orderkey = d.l_orderkey
               AND pr.p2 < d.l_partkey
        GROUP BY 1, 2, 3
        HAVING COUNT(*) >= {MINSUP}
    """,
)
def frequent_part_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E119: frequent 3-itemsets of parts co-ordered in ≥ MINSUP
    baskets, via the A-priori downward-closure prune. The oracle is the
    direct 3-way self-join, staged through a MATERIALIZED pair CTE so
    every oracle join carries the orderkey equality — the flat form let
    DuckDB's optimizer at sf1 stats pick the inequality-only (c, d)
    pair first, an IEJoin whose cross-order output is ~10^13 rows
    (>50 min vs ~1 min staged; found by the round-7 sf1 parity sweep).
    The Spark plan inserts the level-2 prune so the widest join only
    expands candidates whose leading pair is already frequent —
    exactness is unaffected because the final HAVING recounts every
    surviving triple."""
    b = _distinct_baskets(spark, sf_dir)
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


# --------------------------------------------------------------------------
# E125: item-item collaborative filtering (cosine over co-order counts)
# --------------------------------------------------------------------------

CF_TOPK = 5
CF_MINSUP = 2  # pair support floor (same role as the graph edge cut)


@query(
    "item_item_cosine_topk",
    oracle=f"""
        WITH b AS (
          SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        deg AS (
          SELECT l_partkey, COUNT(*) AS n FROM b GROUP BY l_partkey
        ),
        pairs AS (
          SELECT a.l_partkey AS p1, c.l_partkey AS p2, COUNT(*) AS co
          FROM b a JOIN b c ON a.l_orderkey = c.l_orderkey
                AND a.l_partkey <> c.l_partkey
          GROUP BY 1, 2
          HAVING COUNT(*) >= {CF_MINSUP}
        ),
        scored AS (
          SELECT p.p1, p.p2, p.co,
                 CAST(p.co AS DOUBLE) / sqrt(
                   CAST(d1.n AS DOUBLE) * CAST(d2.n AS DOUBLE)
                 ) AS cosine
          FROM pairs p
          JOIN deg d1 ON d1.l_partkey = p.p1
          JOIN deg d2 ON d2.l_partkey = p.p2
        )
        SELECT p1, p2, CAST(co AS BIGINT) AS co_orders, cosine,
               CAST(rk AS INTEGER) AS rank
        FROM (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY p1 ORDER BY cosine DESC, p2
          ) AS rk FROM scored
        ) WHERE rk <= {CF_TOPK}
    """,
)
def item_item_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E125: item-item collaborative filtering — for every part, the
    CF_TOPK most-similar parts by cosine over binary basket incidence:
    sim(a,b) = co(a,b)/√(n(a)·n(b)) (Sarwar et al., WWW'01; the
    "customers also bought" primitive). The co-occurrence self-join is
    basket-bounded (Σ basket² rows, keyed on the order), the support
    floor prunes the one-off pair tail BEFORE the degree joins, and the
    per-item top-k collapses to WindowGroupLimit — at 100 TB the pair
    frame is the significant-co-occurrence relation the graph pack
    already bounds, never an item×item matrix. Exactness: co and n are
    BIGINTs; the cosine is one product, one correctly-rounded sqrt, and
    one divide — hash-gate-stable."""
    b = _distinct_baskets(spark, sf_dir)
    deg = b.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))
    a = b.select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("p1")
    )
    c = b.select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("p2")
    )
    pairs = (
        a.join(c, "okey")
        .filter(F.col("p1") != F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("co"))
        .filter(F.col("co") >= CF_MINSUP)
    )
    scored = (
        pairs.join(deg.select(F.col("l_partkey").alias("p1"),
                              F.col("n").alias("n1")), "p1")
        .join(deg.select(F.col("l_partkey").alias("p2"),
                         F.col("n").alias("n2")), "p2")
        .withColumn(
            "cosine",
            F.col("co").cast("double")
            / F.sqrt(F.col("n1").cast("double") * F.col("n2").cast("double")),
        )
    )
    w = Window.partitionBy("p1").orderBy(F.desc("cosine"), F.asc("p2"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= CF_TOPK)
        .select("p1", "p2", F.col("co").alias("co_orders"), "cosine", "rank")
    )


# --------------------------------------------------------------------------
# E126: open-order backlog curve (sweep-line over interval endpoints)
# --------------------------------------------------------------------------


@query(
    "order_backlog_curve",
    oracle="""
        WITH iv AS (
          SELECT o.o_orderkey,
                 CAST(o.o_orderdate AS DATE) AS open_day,
                 MAX(CAST(l.l_shipdate AS DATE)) AS close_day
          FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
          GROUP BY 1, 2
        ),
        deltas AS (
          SELECT open_day AS day, CAST(1 AS BIGINT) AS delta FROM iv
          UNION ALL
          SELECT close_day + INTERVAL 1 DAY, CAST(-1 AS BIGINT) FROM iv
        ),
        daily AS (
          SELECT CAST(day AS DATE) AS day, SUM(delta) AS d
          FROM deltas GROUP BY 1
        )
        SELECT day,
               CAST(SUM(d) OVER (
                 ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS n_open
        FROM daily
    """,
)
def order_backlog_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E126: how many orders are open (placed, not yet fully shipped) on
    each day — the interval-stabbing question. The naive plan joins
    every calendar day against every order interval (days × orders); the
    sweep-line plan converts each interval to two endpoint deltas
    (+1 open, −1 the day after last shipment), collapses them to ONE row
    per day with a map-side-combinable sum, and prefix-sums the
    calendar-bounded delta frame — fact volume is touched exactly once,
    and the only single-partition pass is over |days| rows (the same
    calendar-frame waiver as the moving-average family). Closure uses
    max(l_shipdate) per order (one keyed aggregate on the natural join
    key). All arithmetic is BIGINT — hash-gate exact."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    iv = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("open_day"),
        )
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("close_day"))
    )
    deltas = iv.select(
        F.col("open_day").alias("day"), F.lit(1).cast("long").alias("delta")
    ).unionByName(
        iv.select(
            F.date_add("close_day", 1).alias("day"),
            F.lit(-1).cast("long").alias("delta"),
        )
    )
    daily = deltas.groupBy("day").agg(F.sum("delta").alias("d"))
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return daily.select(
        "day", F.sum("d").over(w).cast("long").alias("n_open")
    )


# --------------------------------------------------------------------------
# E164: item-item recommender evaluation — held-out precision@K
# --------------------------------------------------------------------------

_CF_K = 5          # recommendation list depth
_CF_TEST_MOD = 5   # baskets with l_orderkey % 5 == 0 are held out


@query(
    "itemcf_holdout_precision",
    oracle=f"""
        WITH items AS (
          SELECT DISTINCT l_orderkey AS okey, l_partkey AS item
          FROM lineitem
        ), train AS (
          SELECT okey, item FROM items WHERE okey % {_CF_TEST_MOD} <> 0
        ), test AS (
          SELECT okey, item FROM items WHERE okey % {_CF_TEST_MOD} = 0
        ), pairs AS (
          SELECT a.item AS src, b.item AS dst, CAST(COUNT(*) AS BIGINT) AS c
          FROM train a JOIN train b
            ON a.okey = b.okey AND a.item <> b.item
          GROUP BY 1, 2
        ), recs AS (
          SELECT src, dst
          FROM (
            SELECT src, dst,
                   ROW_NUMBER() OVER (
                     PARTITION BY src ORDER BY c DESC, dst
                   ) AS rn
            FROM pairs
          ) WHERE rn <= {_CF_K}
        ), evalrows AS (
          SELECT t.okey, t.item,
                 CAST(COUNT(t2.item) AS BIGINT) AS hits
          FROM test t
          JOIN recs r ON r.src = t.item
          LEFT JOIN test t2
            ON t2.okey = t.okey AND t2.item = r.dst
          GROUP BY t.okey, t.item
        ), cold AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_cold
          FROM test t
          WHERE NOT EXISTS (SELECT 1 FROM recs r WHERE r.src = t.item)
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_eval,
               c.n_cold,
               CAST(SUM(e.hits) AS DOUBLE)
                 / ({_CF_K} * COUNT(*)) AS precision_at_k,
               CAST(COUNT(*) FILTER (WHERE e.hits > 0) AS DOUBLE)
                 / COUNT(*) AS hit_rate
        FROM evalrows e CROSS JOIN cold c
        GROUP BY c.n_cold
    """,
)
def itemcf_holdout_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E164: offline evaluation of the co-occurrence recommender — hold
    out every {_CF_TEST_MOD}th basket, build item->top-{_CF_K}
    co-occurrence recommendations from the REST, and measure
    precision@K / hit-rate against what the held-out baskets actually
    contain: the train/test harness any recommender change is judged by
    (E125 builds the model; this scores it without leakage — test
    baskets never feed the pair counts).

    Exactness: the split is a deterministic key modulus; rec lists use a
    total ROW_NUMBER order (count desc, item asc); hits are exact counts
    and both metrics are single divisions of BIGINTs. Cold items (never
    seen in train) are counted separately, not silently dropped.

    Scale: pair counting is the basket-bounded self-join (Σ basket²),
    rec-list cutting is one keyed window on the collapsed pair frame —
    never a global sort; scoring joins test items to the ≤K-per-item rec
    frame, so eval cost is O(test items × K)."""
    test, recs_rn = _holdout_split_and_recs(spark, sf_dir)
    recs = recs_rn.select("src", "dst")
    t = test.alias("t")
    t2 = test.alias("t2")
    r = recs.alias("r")
    evalrows = (
        t.join(r, F.col("r.src") == F.col("t.item"))
        .join(
            t2,
            (F.col("t2.okey") == F.col("t.okey"))
            & (F.col("t2.item") == F.col("r.dst")),
            "left",
        )
        .groupBy(F.col("t.okey"), F.col("t.item"))
        .agg(F.count(F.col("t2.item")).cast("long").alias("hits"))
    )
    cold = test.join(
        recs.select(F.col("src").alias("item")).distinct(), "item", "left_anti"
    ).agg(F.count(F.lit(1)).cast("long").alias("n_cold"))
    return (
        evalrows.crossJoin(F.broadcast(cold))
        .groupBy("n_cold")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_eval"),
            (
                F.sum("hits").cast("double")
                / (_CF_K * F.count(F.lit(1)))
            ).alias("precision_at_k"),
            (
                F.count(F.when(F.col("hits") > 0, 1)).cast("double")
                / F.count(F.lit(1))
            ).alias("hit_rate"),
        )
        .select("n_eval", "n_cold", "precision_at_k", "hit_rate")
    )


# --------------------------------------------------------------------------
# E209: basket-size histogram with the wedge/pair cost budget
# --------------------------------------------------------------------------


@query(
    "basket_size_wedge_budget",
    oracle="""
        WITH sizes AS (
          SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS k
          FROM lineitem GROUP BY l_orderkey
        )
        SELECT k AS basket_size,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(COUNT(*) * k * (k - 1) AS BIGINT) AS pair_budget,
               CAST(SUM(CAST(COUNT(*) * k * (k - 1) AS BIGINT))
                    OVER () AS BIGINT) AS total_pair_budget
        FROM sizes GROUP BY k
    """,
)
def basket_size_wedge_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E209: the basket-size histogram WITH its self-join cost budget —
    every order of k lines contributes k·(k−1) ordered pairs to the
    co-occurrence edge build (E28/E29/E129/E164 all start there), so
    Σ n_k·k·(k−1) is the exact row count of that shuffle BEFORE running
    it. This is the planning query behind the pack's documented
    basket-bounded-join claims: one giant basket (k=10⁴) alone costs
    10⁸ pairs, and this histogram is how you find it first (then cap or
    salt it, as skew.py does for keys).

    Exactness: pure integer counting; the budget window runs over the
    ≤|distinct k| frame (bounded by the max basket size, not volume).

    Scale: one orderkey-keyed count (map-side combine) + a regroup on
    k."""
    li = load_table(spark, sf_dir, "lineitem")
    sizes = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    hist = sizes.groupBy(F.col("k").alias("basket_size")).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )
    hist = hist.withColumn(
        "pair_budget",
        (
            F.col("n_orders") * F.col("basket_size")
            * (F.col("basket_size") - 1)
        ).cast("long"),
    )
    w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return hist.withColumn(
        "total_pair_budget", F.sum("pair_budget").over(w).cast("long")
    )


# --------------------------------------------------------------------------
# E222: held-out NDCG@K for the co-occurrence recommender
# --------------------------------------------------------------------------

#: 1/log2(i+1) discounts and their left-to-right prefix sums (ideal DCG
#: at m relevant items), precomputed in Python and embedded as shortest
#: round-trip literals — both engines parse them to the identical
#: doubles, so no engine ever evaluates a log.
_NDCG_G = [
    "1.0",
    "0.6309297535714575",
    "0.5",
    "0.43067655807339306",
    "0.38685280723454163",
]
_NDCG_IDCG = [
    "1.0",
    "1.6309297535714575",
    "2.1309297535714578",
    "2.5616063116448506",
    "2.9484591188793923",
]

#: Fixed-order DCG chain over the 5 per-rank hit flags (h1..h5 are 0/1
#: BIGINTs, so each product is exact and the addition order is the
#: written order in BOTH engines).
#: Spark parses bare float literals as DECIMAL (DuckDB as DOUBLE) — the
#: explicit CAST pins both engines to double arithmetic; converting the
#: exact decimal digits to double reproduces the original double because
#: the literals are shortest-round-trip reprs.
_DCG = " + ".join(
    f"h{i + 1} * CAST({g} AS DOUBLE)" for i, g in enumerate(_NDCG_G)
)
#: Ideal DCG for m = least(K, basket_size - 1) relevant items.
_IDCG = (
    "CASE m "
    + " ".join(
        f"WHEN {i + 1} THEN CAST({v} AS DOUBLE)"
        for i, v in enumerate(_NDCG_IDCG)
    )
    + " END"
)
#: Per-row NDCG quantized to 1e-9 fixed point so the cross-row mean is
#: an exact integer sum (numeric.py discipline; ndcg <= 1 so no
#: overflow at any row count within 2^53/1e9).
_NDCG_Q = f"CAST(FLOOR((({_DCG}) / ({_IDCG})) * 1000000000 + 0.5) AS BIGINT)"


@query(
    "itemcf_holdout_ndcg",
    oracle=f"""
        WITH items AS (
          SELECT DISTINCT l_orderkey AS okey, l_partkey AS item
          FROM lineitem
        ), train AS (
          SELECT okey, item FROM items WHERE okey % {_CF_TEST_MOD} <> 0
        ), test AS (
          SELECT okey, item FROM items WHERE okey % {_CF_TEST_MOD} = 0
        ), bsize AS (
          SELECT okey, CAST(COUNT(*) AS BIGINT) AS bs FROM test GROUP BY okey
        ), pairs AS (
          SELECT a.item AS src, b.item AS dst, CAST(COUNT(*) AS BIGINT) AS c
          FROM train a JOIN train b
            ON a.okey = b.okey AND a.item <> b.item
          GROUP BY 1, 2
        ), recs AS (
          SELECT src, dst, rn
          FROM (
            SELECT src, dst,
                   ROW_NUMBER() OVER (
                     PARTITION BY src ORDER BY c DESC, dst
                   ) AS rn
            FROM pairs
          ) WHERE rn <= {_CF_K}
        ), flags AS (
          SELECT t.okey, t.item,
                 MAX(CASE WHEN r.rn = 1 AND t2.item IS NOT NULL
                     THEN 1 ELSE 0 END) AS h1,
                 MAX(CASE WHEN r.rn = 2 AND t2.item IS NOT NULL
                     THEN 1 ELSE 0 END) AS h2,
                 MAX(CASE WHEN r.rn = 3 AND t2.item IS NOT NULL
                     THEN 1 ELSE 0 END) AS h3,
                 MAX(CASE WHEN r.rn = 4 AND t2.item IS NOT NULL
                     THEN 1 ELSE 0 END) AS h4,
                 MAX(CASE WHEN r.rn = 5 AND t2.item IS NOT NULL
                     THEN 1 ELSE 0 END) AS h5
          FROM test t
          JOIN recs r ON r.src = t.item
          LEFT JOIN test t2
            ON t2.okey = t.okey AND t2.item = r.dst
          GROUP BY t.okey, t.item
        ), perrow AS (
          SELECT LEAST({_CF_K}, b.bs - 1) AS m,
                 h1, h2, h3, h4, h5
          FROM flags f JOIN bsize b ON b.okey = f.okey
        )
        SELECT CAST(COUNT(*) FILTER (WHERE m >= 1) AS BIGINT) AS n_eval,
               CAST(COUNT(*) FILTER (WHERE m < 1) AS BIGINT)
                 AS n_degenerate,
               CAST(SUM({_NDCG_Q}) FILTER (WHERE m >= 1) AS DOUBLE)
                 / 1000000000 / NULLIF(COUNT(*) FILTER (WHERE m >= 1), 0)
                 AS mean_ndcg
        FROM perrow
    """,
)
def itemcf_holdout_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E222: NDCG@K of the co-occurrence recommender on held-out baskets
    — E164 scores WHETHER the relevant items appear in the top-K;
    NDCG scores WHERE (a hit at rank 1 beats a hit at rank 5), the
    metric recommender and retrieval changes are actually gated on.

    Exactness without logs: the 1/log2(i+1) discounts and their prefix
    sums (ideal DCG) are Python-precomputed shortest-round-trip literals
    — no engine evaluates a log; per-row DCG is a FIXED-ORDER literal
    chain over five 0/1 rank-hit flags; ideal DCG is a CASE lookup on
    m = least(K, basket_size-1); and the cross-row mean quantizes each
    NDCG to 1e-9 fixed point first (numeric.py rule) so the sum is an
    exact integer in any partitioning. Baskets with no possible
    relevant item (m=0) are counted, not silently averaged in.

    Scale: same basket-bounded pair join and K-bounded rec frame as
    E164; the flag pivot keeps eval rows at one row per (basket, item)
    regardless of K."""
    test, recs = _holdout_split_and_recs(spark, sf_dir)
    bsize = test.groupBy("okey").agg(
        F.count(F.lit(1)).cast("long").alias("bs")
    )
    t, t2, r = test.alias("t"), test.alias("t2"), recs.alias("r")
    hit = F.col("t2.item").isNotNull()
    flags = (
        t.join(r, F.col("r.src") == F.col("t.item"))
        .join(
            t2,
            (F.col("t2.okey") == F.col("t.okey"))
            & (F.col("t2.item") == F.col("r.dst")),
            "left",
        )
        .groupBy(F.col("t.okey").alias("okey"), F.col("t.item"))
        .agg(
            *[
                F.max(
                    F.when((F.col("r.rn") == i) & hit, 1).otherwise(0)
                ).alias(f"h{i}")
                for i in range(1, 6)
            ]
        )
    )
    perrow = flags.join(bsize, "okey").select(
        F.least(F.lit(_CF_K), F.col("bs") - 1).alias("m"),
        "h1",
        "h2",
        "h3",
        "h4",
        "h5",
    )
    ok_m = F.col("m") >= 1
    return perrow.agg(
        F.count(F.when(ok_m, 1)).cast("long").alias("n_eval"),
        F.count(F.when(~ok_m, 1)).cast("long").alias("n_degenerate"),
        (
            F.sum(F.when(ok_m, F.expr(_NDCG_Q))).cast("double")
            / 1000000000
            / F.nullif(F.count(F.when(ok_m, 1)), F.lit(0)).cast("double")
        ).alias("mean_ndcg"),
    )
