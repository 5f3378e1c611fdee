"""Table-statistics / storage-layout operators (SURVEY.md §2.6 E228–E229).

The reference never inspects its own storage (sree-etl-tdk-glue-job.py
writes parquet and walks away); a real lakehouse engine maintains TWO
metadata layers above the bytes it writes:

  * **zone maps** (min/max per file/row-group) — what Parquet row-group
    stats, Iceberg manifests, and Delta file stats all are.  Whether a
    predicate can SKIP a zone depends entirely on how the data was
    clustered when written, so the engine needs an *audit* that prices a
    layout before committing to it: for each candidate sort order, how
    many zones does a canonical predicate touch, and what read
    amplification does the layout leave on the table?
  * **column statistics** (NDV / null count / bounds) — the ANALYZE
    TABLE layer the cost-based optimizer joins against when it picks
    broadcast sides and join orders.

Both are implemented as ordinary aggregates so they run distributed and
land as broadcast-sized stat frames — exactly the artifacts a catalog
would persist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# --------------------------------------------------------------------------
# E228: zone-map pruning audit — price a clustering layout before writing it
# --------------------------------------------------------------------------

#: Rows per zone — stands in for a Parquet row group / data file.  The
#: audit's conclusions are layout-relative, so the exact size only needs
#: to be constant across the layouts being compared.
ZONE_ROWS = 1_000

#: Canonical probe predicates: one calendar year each (the BETWEEN shape
#: every time-filtered dashboard query takes).  A literal frame — its
#: size never grows with the table.
PROBE_YEARS = (1995, 1996, 1997, 1998, 1999, 2000)

_PROBES_SQL = " UNION ALL ".join(
    f"SELECT {y} AS probe_year, DATE '{y}-01-01' AS lo, "
    f"DATE '{y + 1}-01-01' AS hi"
    for y in PROBE_YEARS
)


@query(
    "zonemap_prune_audit",
    oracle=f"""
        WITH base AS (
          SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d
          FROM orders
        ), stored AS (
          SELECT 'as_stored' AS layout,
                 o_orderkey // {ZONE_ROWS} AS zone, d
          FROM base
        ), sorted_pos AS (
          SELECT d,
                 ROW_NUMBER() OVER (ORDER BY d, o_orderkey) - 1 AS pos
          FROM base
        ), sorted AS (
          SELECT 'date_sorted' AS layout,
                 pos // {ZONE_ROWS} AS zone, d
          FROM sorted_pos
        ), zones AS (
          SELECT layout, zone, MIN(d) AS zmin, MAX(d) AS zmax,
                 CAST(COUNT(*) AS BIGINT) AS n_rows
          FROM (SELECT * FROM stored UNION ALL SELECT * FROM sorted)
          GROUP BY layout, zone
        ), probes AS ({_PROBES_SQL}),
        matched AS (
          SELECT p.probe_year, CAST(COUNT(*) AS BIGINT) AS rows_matched
          FROM base b JOIN probes p ON b.d >= p.lo AND b.d < p.hi
          GROUP BY p.probe_year
        ), hit AS (
          SELECT z.layout, p.probe_year,
                 CAST(COUNT(*) AS BIGINT) AS zones_hit,
                 CAST(SUM(z.n_rows) AS BIGINT) AS rows_scanned
          FROM zones z JOIN probes p
            ON z.zmin < p.hi AND z.zmax >= p.lo
          GROUP BY z.layout, p.probe_year
        ), totals AS (
          SELECT layout, CAST(COUNT(*) AS BIGINT) AS zones_total
          FROM zones GROUP BY layout
        )
        SELECT h.layout, h.probe_year, t.zones_total, h.zones_hit,
               h.rows_scanned, m.rows_matched,
               CAST(h.rows_scanned AS DOUBLE)
                 / CAST(m.rows_matched AS DOUBLE) AS read_amplification
        FROM hit h
        JOIN totals t ON h.layout = t.layout
        JOIN matched m ON h.probe_year = m.probe_year
    """,
)
def zonemap_prune_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E228: zone-map (min/max) pruning audit across candidate layouts.

    Models each run of ZONE_ROWS consecutive rows as one "zone" (a
    Parquet row group / Iceberg data file), computes the min/max
    o_orderdate zone map under TWO layouts — the table as stored
    (orderkey order) and re-clustered by order date — then prices six
    one-year probe predicates against each: zones touched, rows the scan
    must read (every row of every overlapping zone), rows that actually
    match, and the resulting read amplification.  This is the
    ANALYZE-before-OPTIMIZE step that justifies (or rejects) a
    re-clustering job: a date-sorted layout sends read_amplification to
    ~1.0 while the unsorted layout reads the whole table for every year.

    Exactness: all counts are exact integers; the single double division
    (rows_scanned / rows_matched) is one IEEE op on identical operands.

    Scale: the date-sorted position is a two-phase distributed prefix
    sum — per-date counts collapse to the calendar-bounded date frame
    (the ONLY global window runs over that ≤|days| frame), intra-date
    ranks partition by date; no volume-sized single partition exists.
    Zone frames are |rows|/ZONE_ROWS small and the probe side is a
    6-row literal broadcast, so the overlap join is a bounded
    nested-loop against a literal, never zone x zone.
    """
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("d")
    )
    stored = base.select(
        F.lit("as_stored").alias("layout"),
        (F.col("o_orderkey") / ZONE_ROWS).cast("long").alias("zone"),
        "d",
    )
    # date-sorted global position WITHOUT a global window: cumulative
    # count of strictly-earlier dates (calendar-bounded frame) + the
    # per-date rank (partitioned window).
    per_date = base.groupBy("d").agg(F.count(F.lit(1)).alias("cnt"))
    cum = per_date.select(
        "d",
        (
            F.sum("cnt").over(
                Window.orderBy("d").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            )
            - F.col("cnt")
        ).alias("cum_before"),
    )
    intra = base.withColumn(
        "intra_rank",
        F.row_number().over(
            Window.partitionBy("d").orderBy("o_orderkey")
        ),
    )
    sorted_ = (
        intra.join(F.broadcast(cum), "d")
        .select(
            F.lit("date_sorted").alias("layout"),
            (
                (F.col("cum_before") + F.col("intra_rank") - 1)
                / ZONE_ROWS
            )
            .cast("long")
            .alias("zone"),
            "d",
        )
    )
    zones = (
        stored.unionByName(sorted_)
        .groupBy("layout", "zone")
        .agg(
            F.min("d").alias("zmin"),
            F.max("d").alias("zmax"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )
    probes = spark.sql(f"SELECT * FROM ({_PROBES_SQL})")
    matched = (
        base.join(
            F.broadcast(probes),
            (F.col("d") >= F.col("lo")) & (F.col("d") < F.col("hi")),
        )
        .groupBy("probe_year")
        .agg(F.count(F.lit(1)).cast("long").alias("rows_matched"))
    )
    hit = (
        zones.join(
            F.broadcast(probes),
            (F.col("zmin") < F.col("hi")) & (F.col("zmax") >= F.col("lo")),
        )
        .groupBy("layout", "probe_year")
        .agg(
            F.count(F.lit(1)).cast("long").alias("zones_hit"),
            F.sum("n_rows").cast("long").alias("rows_scanned"),
        )
    )
    totals = zones.groupBy("layout").agg(
        F.count(F.lit(1)).cast("long").alias("zones_total")
    )
    return (
        hit.join(F.broadcast(totals), "layout")
        .join(F.broadcast(matched), "probe_year")
        .select(
            "layout",
            "probe_year",
            "zones_total",
            "zones_hit",
            "rows_scanned",
            "rows_matched",
            (
                F.col("rows_scanned").cast("double")
                / F.col("rows_matched").cast("double")
            ).alias("read_amplification"),
        )
    )


# --------------------------------------------------------------------------
# E229: ANALYZE-style column statistics profile (NDV / nulls / bounds)
# --------------------------------------------------------------------------

#: (column, numeric?) — bounds are emitted only for numerically-ordered
#: columns so the output schema stays type-uniform; string/timestamp
#: bounds would need engine-specific rendering to compare.
_ORDERS_COLS = (
    ("o_orderkey", True),
    ("o_custkey", True),
    ("o_orderstatus", False),
    ("o_totalprice", True),
    ("o_orderdate", False),
    ("o_orderpriority", False),
)


def _ndv_oracle() -> str:
    parts = []
    for c, num in _ORDERS_COLS:
        mn = f"CAST(MIN({c}) AS DOUBLE)" if num else "CAST(NULL AS DOUBLE)"
        mx = f"CAST(MAX({c}) AS DOUBLE)" if num else "CAST(NULL AS DOUBLE)"
        parts.append(
            f"SELECT '{c}' AS column_name,"
            f" CAST(COUNT(DISTINCT {c}) AS BIGINT) AS ndv,"
            f" CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,"
            f" {mn} AS min_num, {mx} AS max_num FROM orders"
        )
    return " UNION ALL ".join(parts)


@query("orders_ndv_profile", oracle=_ndv_oracle())
def orders_ndv_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E229: the ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS layer —
    exact NDV, null count, and (for numeric columns) min/max bounds for
    every column of ``orders``, as the one-row-per-column stat frame a
    catalog persists and the cost-based optimizer joins against when
    choosing broadcast sides, join orders, and bucket counts.

    Exactness: NDV and null counts are exact integers; bounds are
    selections of existing values cast to double (no accumulation).

    Scale: ONE pass — Spark plans the multi-distinct aggregate with an
    Expand (each row fans out once per column) followed by ordinary
    partial/final aggregation, so the table is scanned once however many
    columns are profiled; the oracle's per-column UNION is the readable
    equivalent.  The result is |columns| rows.  For 100 TB tables where
    exact NDV is too hot, the HLL sketch rollup (operators/sketches.py)
    is the drop-in approximate variant of this same frame.
    """
    orders = load_table(spark, sf_dir, "orders")
    aggs = []
    for c, num in _ORDERS_COLS:
        aggs.append(F.countDistinct(c).cast("long").alias(f"{c}__ndv"))
        aggs.append(
            (F.count(F.lit(1)) - F.count(c)).cast("long").alias(f"{c}__nul")
        )
        if num:
            aggs.append(F.min(c).cast("double").alias(f"{c}__min"))
            aggs.append(F.max(c).cast("double").alias(f"{c}__max"))
    wide = orders.agg(*aggs)
    stack_args = []
    for c, num in _ORDERS_COLS:
        mn = f"`{c}__min`" if num else "CAST(NULL AS DOUBLE)"
        mx = f"`{c}__max`" if num else "CAST(NULL AS DOUBLE)"
        stack_args.append(f"'{c}', `{c}__ndv`, `{c}__nul`, {mn}, {mx}")
    stack = (
        f"stack({len(_ORDERS_COLS)}, {', '.join(stack_args)})"
        " AS (column_name, ndv, n_nulls, min_num, max_num)"
    )
    return wide.select(F.expr(stack))


# --------------------------------------------------------------------------
# E231: MV-rewrite path, driver-checked end-to-end
# --------------------------------------------------------------------------

#: cents-fixed revenue — exact integer sums at any parallelism
_REV = "cast(floor(cast(o_totalprice as double) * 100 + 0.5) as bigint)"


def daily_rev_mv_spec():
    """The (day x status) rollup spec shared by the batch MV build here
    and the streaming maintenance in streaming/mv_stream.py."""
    from ..planning import AggQuery

    return AggQuery(
        table="orders",
        keys={
            "month_day": "date_trunc('day', o_orderdate)",
            "status": "o_orderstatus",
        },
        measures={
            "rev_cents": ("sum", _REV),
            "n_orders": ("count", "*"),
            "n_vals": ("count", _REV),
        },
    )


def monthly_rev_query():
    """The month-grain query the MV rewrite must subsume."""
    from ..planning import AggQuery

    return AggQuery(
        table="orders",
        keys={
            "month": "date_trunc('month', o_orderdate)",
            "status": "o_orderstatus",
        },
        measures={
            "rev_cents": ("sum", _REV),
            "n_orders": ("count", "*"),
            "avg_cents": ("avg", _REV),
        },
    )


@query(
    "mv_monthly_revenue_rewrite",
    oracle="""
        SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
               o_orderstatus AS status,
               CAST(SUM(CAST(FLOOR(CAST(o_totalprice AS DOUBLE) * 100 + 0.5)
                 AS BIGINT)) AS BIGINT) AS rev_cents,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(FLOOR(CAST(o_totalprice AS DOUBLE) * 100 + 0.5)
                 AS BIGINT)) AS DOUBLE)
                 / COUNT(o_totalprice) AS avg_cents
        FROM orders
        GROUP BY 1, 2
    """,
)
def mv_monthly_revenue_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E231: monthly revenue by status answered THROUGH the
    materialized-view rewrite (planning/mv_rewrite.py) — builds the
    (day x status) rollup MV, then lets the matcher roll it up to month
    via the date_trunc lattice and decompose avg into stored sum/count.
    The oracle computes the same answer directly from the fact table, so
    the driver's hash check proves the REWRITE path end-to-end: a wrong
    lattice rule, a lossy merge, or a COUNT(*)/COUNT(expr) mix-up all
    hash-mismatch here.

    Exactness: revenue is cents-fixed integer sums; avg is one double
    division of identical integer operands.

    Scale: this is the MV economics in miniature — the monthly query
    touches only the |days| x |statuses| rollup, never the fact table
    (tests/test_mv_rewrite.py asserts inputFiles() provenance); at
    100 TB the same rewrite turns a terabyte scan into kilobytes. The
    MV build itself is the one fact-table pass, amortized across every
    query the MV can answer."""
    import hashlib
    import os
    import tempfile

    from ..planning import MaterializedView, build_mv, try_rewrite

    tag = hashlib.sha256(sf_dir.encode("utf-8")).hexdigest()[:12]
    path = os.path.join(
        tempfile.gettempdir(), f"spark_graft_mv_daily_rev_{tag}"
    )
    mv = MaterializedView("daily_rev", daily_rev_mv_spec(), path)
    build_mv(load_table(spark, sf_dir, "orders"), mv)
    out = try_rewrite(spark, monthly_rev_query(), mv)
    if out is None:  # pragma: no cover - matcher contract
        raise AssertionError("MV rewrite must subsume the monthly query")
    return out


# --------------------------------------------------------------------------
# E235: functional-dependency audit (profiling / constraint discovery)
# --------------------------------------------------------------------------

#: Candidate dependencies to audit — the shortlist a profiler tests
#: before a catalog declares constraints. The first two are the primary
#: key doing its job (must HOLD); the last two are plausible-but-false
#: business rules (a customer places orders in many statuses; a day
#: sees many priorities) that the audit must REFUTE with counts.
FD_CANDIDATES = (
    ("o_orderkey", "o_custkey"),
    ("o_orderkey", "o_orderstatus"),
    ("o_custkey", "o_orderstatus"),
    ("o_orderdate", "o_orderpriority"),
)


def _fd_oracle() -> str:
    parts = []
    for lhs, rhs in FD_CANDIDATES:
        parts.append(f"""
          SELECT '{lhs}' AS lhs, '{rhs}' AS rhs,
                 CAST(COUNT(*) AS BIGINT) AS n_groups,
                 CAST(SUM(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_violating,
                 CAST(MAX(d) AS BIGINT) AS max_rhs_distinct,
                 (SUM(CASE WHEN d > 1 THEN 1 ELSE 0 END) = 0) AS holds
          FROM (
            SELECT {lhs}, CAST(COUNT(DISTINCT {rhs}) AS BIGINT) AS d
            FROM orders GROUP BY {lhs}
          )
        """)
    return " UNION ALL ".join(parts)


@query("orders_fd_audit", oracle=_fd_oracle())
def orders_fd_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E235: functional-dependency audit — for each candidate rule
    lhs → rhs, how many lhs groups carry MORE than one distinct rhs
    (zero ⇔ the dependency holds).  This is the constraint-discovery
    pass a catalog/profiler runs before declaring keys and denormalized
    columns, and the audit that catches silent denormalization drift
    (an upstream backfill writing two statuses for one order key shows
    up here before it corrupts joins downstream).  Complements E51's
    referential-integrity audit (cross-table) with the intra-table
    dependency layer; E229's ndv == rows is the single-column special
    case (unique-key discovery).

    Exactness: all counts are exact integers; `holds` is an integer
    comparison.

    Scale: one keyed aggregate per candidate (map-side partial
    countDistinct), each collapsing to a 1-row summary — |candidates|
    bounded scans that AQE runs as cheap parallel jobs; no joins."""
    orders = load_table(spark, sf_dir, "orders")
    parts = []
    for lhs, rhs in FD_CANDIDATES:
        g = orders.groupBy(lhs).agg(
            F.countDistinct(rhs).cast("long").alias("d")
        )
        parts.append(
            g.agg(
                F.count(F.lit(1)).cast("long").alias("n_groups"),
                F.sum(F.when(F.col("d") > 1, 1).otherwise(0))
                .cast("long")
                .alias("n_violating"),
                F.max("d").cast("long").alias("max_rhs_distinct"),
            ).select(
                F.lit(lhs).alias("lhs"),
                F.lit(rhs).alias("rhs"),
                "n_groups",
                "n_violating",
                "max_rhs_distinct",
                (F.col("n_violating") == 0).alias("holds"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# --------------------------------------------------------------------------
# E245: join skew report — price a join's hot keys before running it
# --------------------------------------------------------------------------

JOIN_SKEW_TOPK = 10


@query(
    "join_skew_report",
    oracle=f"""
        WITH l AS (
          SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS cl
          FROM lineitem GROUP BY 1
        ), o AS (
          SELECT o_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS co
          FROM orders GROUP BY 1
        ), j AS (
          SELECT l.k, l.cl, o.co, CAST(l.cl * o.co AS BIGINT) AS out_rows
          FROM l JOIN o ON l.k = o.k
        ), tot AS (
          SELECT CAST(SUM(out_rows) AS BIGINT) AS total_out,
                 CAST(COUNT(*) AS BIGINT) AS n_keys
          FROM j
        )
        SELECT j.k AS join_key, j.cl AS left_rows, j.co AS right_rows,
               j.out_rows,
               CAST(j.out_rows AS DOUBLE) / tot.total_out
                 AS output_share,
               CAST(j.out_rows AS DOUBLE) * tot.n_keys / tot.total_out
                 AS skew_ratio
        FROM j CROSS JOIN tot
        ORDER BY j.out_rows DESC, j.k
        LIMIT {JOIN_SKEW_TOPK}
    """,
)
def join_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E245: join-skew pricing — BEFORE shuffling the lineitem⋈orders
    join, which keys will dominate its output?  Per key the output
    contribution is cl·co (the join's multiplicity product); the report
    lists the top keys with their share of total output and their
    skew ratio (contribution ÷ the uniform per-key average — the number
    AQE's skew-join threshold reasons about, and the trigger for the
    salting strategy in operators/skew.py).  Pairs with the planning
    layer: join_order prices ORDER, this prices the HOT KEYS of a
    chosen join.

    Exactness: counts and products are exact integers; the two ratios
    are single double divisions against the same 1-row totals.

    Scale: two map-side-combined keyed counts, one equi-join of the
    per-key COUNT frames (never the facts), a 1-row totals crossJoin,
    TakeOrdered top-K.  The per-key join frame feeds BOTH the totals
    aggregate and the final projection, so it is scoped_persist-ed —
    without it each keyed fact aggregation runs twice."""
    from .registry import scoped_persist

    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("k"))
        .agg(F.count(F.lit(1)).cast("long").alias("cl"))
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderkey").alias("k"))
        .agg(F.count(F.lit(1)).cast("long").alias("co"))
    )
    j = scoped_persist(
        li.join(orders, "k").select(
            "k",
            "cl",
            "co",
            (F.col("cl") * F.col("co")).cast("long").alias("out_rows"),
        )
    )
    tot = j.agg(
        F.sum("out_rows").cast("long").alias("total_out"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
    )
    return (
        j.crossJoin(F.broadcast(tot))
        .select(
            F.col("k").alias("join_key"),
            F.col("cl").alias("left_rows"),
            F.col("co").alias("right_rows"),
            "out_rows",
            (
                F.col("out_rows").cast("double") / F.col("total_out")
            ).alias("output_share"),
            (
                F.col("out_rows").cast("double")
                * F.col("n_keys")
                / F.col("total_out")
            ).alias("skew_ratio"),
        )
        .orderBy(F.desc("out_rows"), F.asc("join_key"))
        .limit(JOIN_SKEW_TOPK)
    )
