"""CDC-shape operators: batch MERGE (upsert) and SCD2 history build.

A lakehouse pipeline's write side is dominated by two shapes the
reference's truncate-and-reload design (sree-etl-tdk-glue-job.py:72-94
overwrites the Oracle table nightly) never needed but any incremental
100 TB pipeline does:

  * MERGE / upsert — apply a (much smaller) change batch to a large
    base table. Without a table format's MERGE INTO, the engine-level
    shape is ONE full-outer shuffle join on the key with coalesce per
    column — which is exactly what Delta/Iceberg MERGE lowers to. The
    change side derives from facts, so it is NOT force-broadcast: AQE
    picks broadcast when the batch is small enough, shuffle join when
    it is not (the 100 TB-safe default; cf. VERDICT.md on forced
    dimension broadcasts).
  * SCD2 — turn a change stream into versioned history rows with
    [valid_from, valid_to) ranges. The scalable shape is window
    functions partitioned by the business key: detect value changes
    with lag(), close intervals with lead() — two window passes over
    ONE shuffle on the key, no self-join, no driver loop.

Both queries synthesize their change batches deterministically from the
fixture tables (latest order per customer; the events stream), so each
has a full DuckDB oracle — MERGE semantics are checked value-by-value,
not just row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

#: Offset distinguishing synthetic "insert" keys from existing ones —
#: far above sf1's 150k customer keys, still tiny vs BIGINT range.
INSERT_KEY_OFFSET = 1_000_000


def merge_upsert(
    base: DataFrame, changes: DataFrame, key: str, payload: list[str]
) -> DataFrame:
    """Engine-level MERGE: full-outer join on ``key``; change rows win
    per column; an ``op`` column reports matched/unmatched routing
    (update/insert/keep). One shuffle; join strategy left to AQE."""
    b = base.select(key, *payload)
    c = changes.select(
        F.col(key).alias(f"_c_{key}"),
        *[F.col(p).alias(f"_c_{p}") for p in payload],
    )
    joined = b.join(c, b[key] == c[f"_c_{key}"], "full_outer")
    return joined.select(
        F.coalesce(b[key], c[f"_c_{key}"]).alias(key),
        *[
            F.coalesce(c[f"_c_{p}"], b[p]).alias(p)
            for p in payload
        ],
        F.when(b[key].isNull(), F.lit("insert"))
        .when(c[f"_c_{key}"].isNull(), F.lit("keep"))
        .otherwise(F.lit("update"))
        .alias("op"),
    )


@query(
    "merge_upsert_customers",
    oracle=f"""
        WITH latest AS (
          SELECT o_custkey, o_orderpriority,
                 ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey DESC
                 ) AS rn
          FROM orders
        ),
        changes AS (
          SELECT o_custkey AS c_custkey,
                 CAST(NULL AS VARCHAR) AS c_name,
                 o_orderpriority AS c_mktsegment
          FROM latest WHERE rn = 1
          UNION ALL
          SELECT o_custkey + {INSERT_KEY_OFFSET},
                 'NEW-' || CAST(o_custkey AS VARCHAR),
                 o_orderpriority
          FROM latest WHERE rn = 1
        )
        SELECT COALESCE(b.c_custkey, c.c_custkey) AS c_custkey,
               COALESCE(c.c_name, b.c_name) AS c_name,
               COALESCE(c.c_mktsegment, b.c_mktsegment) AS c_mktsegment,
               CASE WHEN b.c_custkey IS NULL THEN 'insert'
                    WHEN c.c_custkey IS NULL THEN 'keep'
                    ELSE 'update' END AS op
        FROM customer b FULL OUTER JOIN changes c USING (c_custkey)
    """,
)
def merge_upsert_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE demo over a deterministic change batch: each customer's
    latest order re-segments them (update); the same rows with offset
    keys arrive as brand-new customers (insert); order-less customers
    pass through (keep). NULL change columns mean "leave unchanged" —
    the per-column coalesce of a real MERGE ... UPDATE SET."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    latest = (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderpriority")
    )
    updates = latest.select(
        F.col("o_custkey").alias("c_custkey"),
        F.lit(None).cast("string").alias("c_name"),
        F.col("o_orderpriority").alias("c_mktsegment"),
    )
    inserts = latest.select(
        (F.col("o_custkey") + INSERT_KEY_OFFSET).alias("c_custkey"),
        F.concat(F.lit("NEW-"), F.col("o_custkey").cast("string")).alias(
            "c_name"
        ),
        F.col("o_orderpriority").alias("c_mktsegment"),
    )
    return merge_upsert(
        customer,
        updates.unionByName(inserts),
        "c_custkey",
        ["c_name", "c_mktsegment"],
    )


@query(
    "scd2_user_event_history",
    oracle="""
        WITH ordered AS (
          SELECT user_id, event_type, event_id,
                 CAST(ts AS TIMESTAMP) AS ts,
                 LAG(event_type) OVER w AS prev_type
          FROM events
          WHERE user_id IS NOT NULL AND event_type IS NOT NULL
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        versions AS (
          SELECT user_id, event_type, event_id, ts
          FROM ordered
          WHERE prev_type IS NULL OR event_type <> prev_type
        )
        SELECT user_id, event_type,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
               strftime(
                 LEAD(ts) OVER wv, '%Y-%m-%d %H:%M:%S'
               ) AS valid_to,
               CAST(ROW_NUMBER() OVER wv AS BIGINT) AS version
        FROM versions
        WINDOW wv AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def scd2_user_event_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 from the events change stream: per user, consecutive runs of
    the same event_type compress into one version row with
    [valid_from, valid_to) bounds (valid_to NULL = current). lag()
    finds change points, lead() closes intervals, row_number() numbers
    versions — all over the SAME user_id partitioning, so the whole
    history build is one shuffle however long each user's history is.
    Timestamps surface as second-precision strings (the repo's
    engine-neutral timestamp convention; see operators/logmetrics.py)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        events.filter(
            F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
        )
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
    )
    wv = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changes.select(
        "user_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format(F.lead("ts").over(wv), "yyyy-MM-dd HH:mm:ss").alias(
            "valid_to"
        ),
        F.row_number().over(wv).cast("long").alias("version"),
    )


@query(
    "orders_snapshot_diff",
    oracle="""
        WITH snap_a AS (
          SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
          WHERE o_orderdate < DATE '1996-01-01'
        ), snap_b AS (
          SELECT o_orderkey, o_orderstatus,
                 CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice + 1
                      ELSE o_totalprice END AS o_totalprice
          FROM orders
          WHERE o_orderdate < DATE '1997-01-01'
            AND (o_orderkey % 97 <> 0 OR o_orderdate >= DATE '1996-01-01')
        )
        SELECT
          CASE WHEN a.o_orderkey IS NULL THEN 'added'
               WHEN b.o_orderkey IS NULL THEN 'removed'
               WHEN a.o_orderstatus <> b.o_orderstatus
                 OR a.o_totalprice <> b.o_totalprice THEN 'changed'
               ELSE 'unchanged' END AS diff_kind,
          CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM snap_a a FULL OUTER JOIN snap_b b USING (o_orderkey)
        GROUP BY 1
    """,
)
def orders_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-diff audit between two snapshots: classify every key as
    added / removed / changed / unchanged and count each class — the
    reconciliation report run after every backfill or migration.

    The two snapshots are derived deterministically from orders (orders
    before 1996; orders before 1997 minus every 97th pre-1996 key, with
    every 89th price bumped by 1, so all four classes are non-empty). The diff is ONE full-outer shuffle join
    on the key with a per-column comparison — the same single-shuffle
    shape as merge_upsert, so a 100 TB reconciliation costs one co-
    partitioned pass; the output is a 4-row scorecard, never row-level
    driver traffic."""
    orders = load_table(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    snap_a = orders.where(
        F.col("o_orderdate") < F.lit("1996-01-01").cast("date")
    ).select(*cols)
    snap_b = orders.where(
        (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
        & (
            (F.col("o_orderkey") % 97 != 0)
            | (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        )
    ).select(
        F.col("o_orderkey").alias("b_o_orderkey"),
        F.col("o_orderstatus").alias("b_o_orderstatus"),
        F.when(
            F.col("o_orderkey") % 89 == 0, F.col("o_totalprice") + 1
        )
        .otherwise(F.col("o_totalprice"))
        .alias("b_o_totalprice"),
    )
    j = snap_a.join(
        snap_b, snap_a["o_orderkey"] == snap_b["b_o_orderkey"], "full_outer"
    )
    kind = (
        F.when(F.col("o_orderkey").isNull(), "added")
        .when(F.col("b_o_orderkey").isNull(), "removed")
        .when(
            (F.col("o_orderstatus") != F.col("b_o_orderstatus"))
            | (F.col("o_totalprice") != F.col("b_o_totalprice")),
            "changed",
        )
        .otherwise("unchanged")
    )
    return j.groupBy(kind.alias("diff_kind")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )


# ---------------------------------------------------------------------------
# E75: CDC apply with delete tombstones
# ---------------------------------------------------------------------------


def apply_cdc(
    base: DataFrame, changes: DataFrame, key: str, payload: list[str]
) -> DataFrame:
    """Engine-level MERGE with DELETE: the change batch carries an
    ``op`` column ('upsert' | 'delete'); matched deletes remove the base
    row, matched upserts update per column (NULL = leave unchanged),
    unmatched upserts insert, unmatched deletes are no-ops (idempotent
    replay of an already-applied tombstone). Same single full-outer
    shuffle as merge_upsert — this is what MERGE INTO ... WHEN MATCHED
    AND op='delete' THEN DELETE lowers to."""
    b = base.select(key, *payload)
    c = changes.select(
        F.col(key).alias(f"_c_{key}"),
        F.col("op").alias("_c_op"),
        *[F.col(p).alias(f"_c_{p}") for p in payload],
    )
    joined = b.join(c, b[key] == c[f"_c_{key}"], "full_outer")
    return (
        joined
        # tombstones: drop matched-delete rows AND unmatched-delete no-ops
        .filter(
            F.col("_c_op").isNull() | (F.col("_c_op") != F.lit("delete"))
        )
        .select(
            F.coalesce(b[key], c[f"_c_{key}"]).alias(key),
            *[
                F.coalesce(c[f"_c_{p}"], b[p]).alias(p)
                for p in payload
            ],
            F.when(b[key].isNull(), F.lit("insert"))
            .when(c[f"_c_{key}"].isNull(), F.lit("keep"))
            .otherwise(F.lit("update"))
            .alias("op"),
        )
    )


@query(
    "cdc_apply_with_deletes",
    oracle=f"""
        WITH latest AS (
          SELECT o_custkey, o_orderpriority,
                 ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey DESC
                 ) AS rn
          FROM orders
        ),
        changes AS (
          SELECT o_custkey AS c_custkey,
                 CASE WHEN o_custkey % 7 = 0 THEN 'delete'
                      ELSE 'upsert' END AS op,
                 CAST(NULL AS VARCHAR) AS c_name,
                 o_orderpriority AS c_mktsegment
          FROM latest WHERE rn = 1
          UNION ALL
          SELECT o_custkey + {INSERT_KEY_OFFSET}, 'upsert',
                 'NEW-' || CAST(o_custkey AS VARCHAR),
                 o_orderpriority
          FROM latest WHERE rn = 1
        ),
        merged AS (
          SELECT COALESCE(b.c_custkey, c.c_custkey) AS c_custkey,
                 COALESCE(c.c_name, b.c_name) AS c_name,
                 COALESCE(c.c_mktsegment, b.c_mktsegment) AS c_mktsegment,
                 CASE WHEN b.c_custkey IS NULL THEN 'insert'
                      WHEN c.c_custkey IS NULL THEN 'keep'
                      ELSE 'update' END AS op,
                 c.op AS change_op
          FROM customer b FULL OUTER JOIN changes c USING (c_custkey)
        )
        SELECT c_custkey, c_name, c_mktsegment, op
        FROM merged
        WHERE change_op IS NULL OR change_op <> 'delete'
    """,
)
def cdc_apply_with_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E75: MERGE with tombstones over a deterministic change batch:
    every 7th active customer's latest change is a DELETE, the rest
    re-segment (update); offset-key rows arrive as inserts; order-less
    customers pass through. The oracle replays the same batch in SQL, so
    the hash gate checks delete/update/insert routing value-by-value."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    latest = (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderpriority")
    )
    updates = latest.select(
        F.col("o_custkey").alias("c_custkey"),
        F.when(F.col("o_custkey") % 7 == 0, F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("op"),
        F.lit(None).cast("string").alias("c_name"),
        F.col("o_orderpriority").alias("c_mktsegment"),
    )
    inserts = latest.select(
        (F.col("o_custkey") + INSERT_KEY_OFFSET).alias("c_custkey"),
        F.lit("upsert").alias("op"),
        F.concat(F.lit("NEW-"), F.col("o_custkey").cast("string")).alias(
            "c_name"
        ),
        F.col("o_orderpriority").alias("c_mktsegment"),
    )
    return apply_cdc(
        customer,
        updates.unionByName(inserts),
        "c_custkey",
        ["c_name", "c_mktsegment"],
    )
