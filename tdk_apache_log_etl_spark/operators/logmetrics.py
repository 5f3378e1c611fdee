"""Reference analytics re-expressed over the ``events`` fixture table.

The reference's whole analytical output is three metrics over the cleansed
log table (sree-etl-tdk-glue-job.py:52-63) plus three ad-hoc Athena checks
(README.md:64-66). ``events`` is the driver's log-shaped stand-in
(FIXTURES.md): user_id ↔ CLF user_id, event_type='purchase' ↔
status_code=200, value ↔ size.

Also here: the extension operators that naturally live on an event stream —
gap-based sessionization (E5), event-time tumbling windows (E5), JSON prop
extraction (E6) — and a full CLF parse round-trip that exercises the
apache_log source against a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.apache_log import parse_clf_lines
from ..session import default_parallelism, input_partitions
from ..sources.tables import load_table
from .numeric import dec_sum, sql_dec_sum
from .registry import query, scoped_persist

# --------------------------------------------------------------------------
# The reference's three computed metrics (sree-etl-tdk-glue-job.py:52-63)
# --------------------------------------------------------------------------


@query(
    "clf_user_count",
    oracle="SELECT COUNT(DISTINCT user_id) AS user_count FROM events",
)
def clf_user_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: total distinct users (sree-etl-tdk-glue-job.py:52).

    The reference does select('user_id').distinct().count() — a full
    distinct shuffle then a count. countDistinct lets Spark plan a partial
    aggregate per partition before the exchange; at 100 TB the
    approx_count_distinct variant (clf_user_count_approx) avoids the exact
    distinct entirely.
    """
    events = load_table(spark, sf_dir, "events")
    return events.agg(F.countDistinct("user_id").alias("user_count"))


@query(
    "clf_user_count_approx",
    oracle="""
        SELECT COUNT(DISTINCT user_id) AS user_count_exact,
               TRUE AS approx_within_5pct
        FROM events
    """,
)
def clf_user_count_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 at scale: HyperLogLog++ distinct-count — no full shuffle of keys.

    The HLL++ estimate itself is engine-specific (DuckDB's sketch gives a
    different number), so the driver-checkable OUTPUT is the operator's
    actual contract: the exact count plus a boolean asserting the
    estimate landed within 5× its configured 1% relative standard
    deviation. Spark's HLL++ is deterministic for a given value set, so
    the boolean is stable across runs and cluster layouts — this turns a
    formerly rows-only query into a hash-checked one without pretending
    two different sketches agree digit-for-digit."""
    events = load_table(spark, sf_dir, "events")
    return events.agg(
        F.countDistinct("user_id").alias("user_count_exact"),
        (
            F.abs(
                F.approx_count_distinct("user_id", 0.01)
                - F.countDistinct("user_id")
            )
            <= 0.05 * F.countDistinct("user_id")
        ).alias("approx_within_5pct"),
    )


@query(
    "clf_requests_per_user",
    oracle="""
        SELECT user_id, COUNT(*) AS requests_count
        FROM events GROUP BY user_id
    """,
)
def clf_requests_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: per-user request counts (sree-etl-tdk-glue-job.py:55-60).

    The reference counts the phantom column 'client_requested_resource';
    per SURVEY.md §1.3 the intended semantic is count of requests per user.
    Spark plans this as partial hash-agg → exchange → final hash-agg, so the
    shuffle carries one row per (partition, user) not per event.
    """
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(F.count(F.lit(1)).alias("requests_count"))


@query(
    "clf_total_successful_requests",
    oracle="""
        SELECT COUNT(*) AS total_successful_requests
        FROM events WHERE event_type = 'purchase'
    """,
)
def clf_total_successful_requests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/F1: filtered global count (sree-etl-tdk-glue-job.py:63).

    The equality predicate is pushed into the parquet scan (PushedFilters),
    so at scale only matching row groups are decoded.
    """
    events = load_table(spark, sf_dir, "events")
    return events.filter(F.col("event_type") == "purchase").agg(
        F.count(F.lit(1)).alias("total_successful_requests")
    )


@query(
    "clf_daily_summary",
    oracle="""
        SELECT
          COUNT(DISTINCT user_id) AS user_count,
          COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
            AS total_successful_requests,
          COUNT(*) AS total_requests
        FROM events
    """,
)
def clf_daily_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V1 + §7.2 'one scan, many aggregates': the reference computes its
    metrics with three separate actions (three scans of the same partition,
    sree-etl-tdk-glue-job.py:52,63,68); here all metrics come from ONE scan
    and one aggregate — the shape that matters at 100 TB.
    """
    events = load_table(spark, sf_dir, "events")
    return events.agg(
        F.countDistinct("user_id").alias("user_count"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias(
            "total_successful_requests"
        ),
        F.count(F.lit(1)).alias("total_requests"),
    )


# --------------------------------------------------------------------------
# The Athena ad-hoc checks (README.md:64-66), run through spark.sql
# --------------------------------------------------------------------------


@query(
    "athena_count_nonnull_users",
    oracle="SELECT COUNT(*) AS cnt FROM events WHERE user_id IS NOT NULL",
)
def athena_count_nonnull_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2/A4 via the SQL entry point (README.md:64) — the same string runs
    verbatim through spark.sql against a registered view (SURVEY.md §3.3)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_athena_v")
    return spark.sql(
        "SELECT COUNT(*) AS cnt FROM events_athena_v WHERE user_id IS NOT NULL"
    )


@query(
    "athena_requests_by_user_sql",
    oracle="SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id",
)
def athena_requests_by_user_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: the group-by check query in SQL form (README.md:65)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_athena_v")
    return spark.sql(
        "SELECT user_id, COUNT(*) AS cnt FROM events_athena_v GROUP BY user_id"
    )


@query(
    "events_error_count",
    oracle="SELECT COUNT(*) AS error_count FROM events WHERE event_type = 'error'",
)
def events_error_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 variant: equality predicate + count (status_code-style filter)."""
    events = load_table(spark, sf_dir, "events")
    return events.filter(F.col("event_type") == "error").agg(
        F.count(F.lit(1)).alias("error_count")
    )


# --------------------------------------------------------------------------
# Projection / filter / per-group stats (P1-P5, F1, A2 generalizations)
# --------------------------------------------------------------------------


@query(
    "events_filter_project",
    oracle="""
        SELECT event_id, user_id, value
        FROM events WHERE event_type = 'click' AND value > 50
    """,
)
def events_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P2/F1: projection + conjunctive predicate. Both the filter and the
    3-column projection reach the parquet scan (PushedFilters / ReadSchema —
    asserted in tests/test_plans.py)."""
    events = load_table(spark, sf_dir, "events")
    return events.filter(
        (F.col("event_type") == "click") & (F.col("value") > 50)
    ).select("event_id", "user_id", "value")


@query(
    "events_type_stats",
    oracle=f"""
        SELECT
          event_type,
          COUNT(*) AS n_events,
          COUNT(DISTINCT user_id) AS n_users,
          {sql_dec_sum("value")} AS total_value,
          MIN(value) AS min_value,
          MAX(value) AS max_value,
          {sql_dec_sum("value")} / COUNT(value) AS avg_value
        FROM events GROUP BY event_type
    """,
)
def events_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-aggregate per group — partial+final hash aggregation; min/max on
    raw parquet doubles are exact, sums use the decimal trick
    (operators/numeric.py)."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        dec_sum(F.col("value")).alias("total_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        (dec_sum(F.col("value")) / F.count("value")).alias("avg_value"),
    )


# --------------------------------------------------------------------------
# E6: JSON prop extraction
# --------------------------------------------------------------------------


@query(
    "json_props_extract",
    oracle="""
        SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
               COUNT(*) AS cnt
        FROM events GROUP BY 1
    """,
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6: get_json_object on the props column — native JsonPath evaluation
    (no Python), grouped to exercise agg-over-derived-column."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.select(
            F.get_json_object("props", "$.k").cast("long").alias("k")
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# --------------------------------------------------------------------------
# E5: event-time windows + gap sessionization
# --------------------------------------------------------------------------


@query(
    "hourly_event_counts",
    oracle="""
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_ts,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users
        FROM events GROUP BY 1
    """,
)
def hourly_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5 batch tumbling window via date_trunc (wall-clock, tz-safe; the
    streaming variant with window()+watermark lives in streaming/)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss")
            .alias("hour_ts")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


SESSION_GAP_SECONDS = 1800


@query(
    "sessionize_gap",
    oracle=f"""
        WITH flagged AS (
          SELECT user_id, ts, event_id,
                 CASE
                   WHEN ts - LAG(ts) OVER w <= INTERVAL {SESSION_GAP_SECONDS} SECOND
                   THEN 0 ELSE 1
                 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sessions AS (
          SELECT user_id, ts,
                 CAST(SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
          FROM flagged
        )
        SELECT user_id, session_id,
               COUNT(*) AS n_events,
               strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start
        FROM sessions GROUP BY user_id, session_id
    """,
)
def sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5: gap-based sessionization — lag + cumulative-sum session ids.

    One shuffle on user_id serves both window functions AND the final
    group-by (same partitioning reused across stages). At 100 TB this is the
    canonical approach; the streaming equivalent is session_window with a
    watermark (streaming/windows.py).
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts") - F.lag("ts").over(w)
    new_session = F.when(
        gap <= F.expr(f"INTERVAL {SESSION_GAP_SECONDS} SECONDS"), 0
    ).otherwise(1)
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        events.withColumn("new_session", new_session)
        .withColumn("session_id", F.sum("new_session").over(cum))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        )
    )


# --------------------------------------------------------------------------
# CLF parse round-trip: synthesize CLF lines from events, parse them back
# with the real apache_log source, compare against directly-computed truth.
# --------------------------------------------------------------------------

_CLF_ORACLE = """
    SELECT
      '10.0.' || CAST(user_id % 256 AS VARCHAR) || '.'
              || CAST(event_id % 256 AS VARCHAR) AS ip_address,
      CAST(NULL AS DOUBLE) AS rfc_1413_identity,
      CASE WHEN user_id % 7 = 0 THEN NULL ELSE user_id END AS user_id_parsed,
      strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S') AS time_str,
      'GET' AS request_method,
      '/r/' || CAST(event_id AS VARCHAR) AS request_resource,
      'HTTP/1.1' AS request_protocol,
      CASE WHEN event_type = 'error' THEN CAST(500 AS BIGINT)
           ELSE CAST(200 AS BIGINT) END AS status_code,
      CASE WHEN event_type = 'view' THEN NULL
           ELSE event_id * 10 END AS size,
      CASE WHEN event_type = 'click' THEN 'https://example.com/start'
           ELSE NULL END AS referer,
      'Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36' AS user_agent
    FROM events
"""


def synthesize_clf_lines(events: DataFrame) -> DataFrame:
    """Render events as Combined Log Format lines (deterministic)."""
    ip = F.concat(
        F.lit("10.0."),
        (F.col("user_id") % 256).cast("string"),
        F.lit("."),
        (F.col("event_id") % 256).cast("string"),
    )
    user = F.when(F.col("user_id") % 7 == 0, F.lit("-")).otherwise(
        F.col("user_id").cast("string")
    )
    time_part = F.concat(
        F.lit("["),
        F.date_format(F.col("ts"), "dd/MMM/yyyy:HH:mm:ss"),
        F.lit(" +0000]"),
    )
    request = F.concat(
        F.lit('"GET /r/'), F.col("event_id").cast("string"), F.lit(' HTTP/1.1"')
    )
    status = F.when(F.col("event_type") == "error", F.lit("500")).otherwise(
        F.lit("200")
    )
    size = F.when(F.col("event_type") == "view", F.lit("-")).otherwise(
        (F.col("event_id") * 10).cast("string")
    )
    referer = F.when(
        F.col("event_type") == "click", F.lit('"https://example.com/start"')
    ).otherwise(F.lit('"-"'))
    ua = F.lit('"Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36"')
    return events.select(
        F.concat_ws(
            " ", ip, F.lit("-"), user, time_part, request, status, size, referer, ua
        ).alias("value")
    )


@query("clf_parse_roundtrip", oracle=_CLF_ORACLE)
def clf_parse_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3/X1-X5/P3 end-to-end: synthesize CLF lines from events, run the
    production parser (sources/apache_log.py), emit typed+formatted columns.
    The DuckDB oracle computes the expected parse output directly from the
    events columns — a hash-checked differential test of the whole parser.
    """
    parsed = _parsed_clf(spark, sf_dir)
    return parsed.select(
        "ip_address",
        "rfc_1413_identity",
        F.col("user_id").alias("user_id_parsed"),
        F.date_format("time", "yyyy-MM-dd HH:mm:ss").alias("time_str"),
        "request_method",
        "request_resource",
        "request_protocol",
        "status_code",
        "size",
        "referer",
        "user_agent",
    )


# --------------------------------------------------------------------------
# Distribution metrics: percentiles + histogram (log-analytics staples the
# reference's 3 aggregates can't express; SURVEY.md §2.6 scope)
# --------------------------------------------------------------------------


@query(
    "events_value_percentiles",
    oracle="""
        SELECT event_type,
               round(quantile_cont(value, 0.50), 6) AS p50,
               round(quantile_cont(value, 0.90), 6) AS p90,
               round(quantile_cont(value, 0.99), 6) AS p99,
               COUNT(value) AS n
        FROM events GROUP BY event_type
    """,
)
def events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles per group. Spark's
    percentile() and DuckDB's quantile_cont share the index = p*(n-1)
    definition, so rounded values hash-match. At 100 TB use
    approx_percentile (t-digest sketch, mergeable, no global sort) —
    exact percentile requires shuffling every group's values to one
    reducer."""
    events = load_table(spark, sf_dir, "events")
    p = F.percentile("value", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return events.groupBy("event_type").agg(
        F.round(F.get(p, 0), 6).alias("p50"),
        F.round(F.get(p, 1), 6).alias("p90"),
        F.round(F.get(p, 2), 6).alias("p99"),
        F.count("value").alias("n"),
    )


#: approx_percentile accuracy parameter: rank error is bounded by n/ACC.
APPROX_PCTL_ACC = 10_000


@query(
    "events_value_percentiles_approx",
    oracle="""
        SELECT event_type, COUNT(*) AS n,
               TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
        FROM events WHERE value IS NOT NULL
        GROUP BY event_type
    """,
)
def events_value_percentiles_approx(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The 100 TB form of events_value_percentiles: approx_percentile's
    mergeable sketch combines map-side, so no group ever ships its raw
    values to one reducer — the shuffle carries one sketch per
    (partition x group).

    The estimates are engine-specific (DuckDB's quantile sketch differs),
    so the driver-checkable OUTPUT is the operator's contract: per group,
    a boolean per percentile asserting the returned value's rank interval
    overlaps the Greenwald-Khanna guarantee [floor((p-eps)*n),
    ceil((p+eps)*n)] with eps = 1/accuracy (±1 slack for rank-definition
    boundary conventions). The rank check is one broadcast join of the
    tiny per-group sketch results back onto the values plus one
    aggregate — the same verification a production data-quality gate
    would run. Spark's GK sketch is deterministic for a given value
    set, so the booleans are stable. The EXACT twin above remains the
    value-level correctness anchor."""
    events = load_table(spark, sf_dir, "events")
    ev = events.select("event_type", "value").filter(
        F.col("value").isNotNull()
    )
    p = F.approx_percentile(
        "value", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)), F.lit(APPROX_PCTL_ACC)
    )
    approx = ev.groupBy("event_type").agg(
        F.get(p, 0).alias("ap50"),
        F.get(p, 1).alias("ap90"),
        F.get(p, 2).alias("ap99"),
        F.count(F.lit(1)).alias("n"),
    )
    j = ev.join(F.broadcast(approx), "event_type")
    ranks = j.groupBy("event_type").agg(
        F.first("n").alias("n"),
        *[
            agg
            for q in ("50", "90", "99")
            for agg in (
                F.sum((F.col("value") < F.col(f"ap{q}")).cast("long")).alias(
                    f"lt{q}"
                ),
                F.sum((F.col("value") <= F.col(f"ap{q}")).cast("long")).alias(
                    f"le{q}"
                ),
            )
        ],
    )
    eps = 1.0 / APPROX_PCTL_ACC

    def ok(q: str, frac: float):
        n = F.col("n")
        lo = F.floor((frac - eps) * n) - 1
        hi = F.ceil((frac + eps) * n) + 1
        # value's rank interval [lt+1, le] must overlap [lo, hi]
        return (F.col(f"lt{q}") + 1 <= hi) & (F.col(f"le{q}") >= lo)

    return ranks.select(
        "event_type",
        "n",
        ok("50", 0.5).alias("p50_ok"),
        ok("90", 0.9).alias("p90_ok"),
        ok("99", 0.99).alias("p99_ok"),
    )


HIST_BUCKET_WIDTH = 25.0
HIST_N_BUCKETS = 12


@query(
    "events_value_histogram",
    oracle=f"""
        SELECT LEAST(GREATEST(CAST(floor(value / {HIST_BUCKET_WIDTH}) AS BIGINT),
                              0), {HIST_N_BUCKETS - 1}) AS bucket,
               COUNT(*) AS n
        FROM events
        WHERE value IS NOT NULL
        GROUP BY 1
    """,
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram with clamped edge buckets — one hash
    aggregation keyed on the bucket id; the classic single-pass shape for
    response-size/latency distributions over logs."""
    events = load_table(spark, sf_dir, "events")
    bucket = F.least(
        F.greatest(
            F.floor(F.col("value") / HIST_BUCKET_WIDTH).cast("long"), F.lit(0)
        ),
        F.lit(HIST_N_BUCKETS - 1),
    )
    return (
        events.filter(F.col("value").isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "events_null_profile",
    oracle="""
        WITH u AS (
          UNPIVOT (
            SELECT CAST(event_id IS NULL AS INTEGER) AS event_id,
                   CAST(ts IS NULL AS INTEGER) AS ts,
                   CAST(user_id IS NULL AS INTEGER) AS user_id,
                   CAST(event_type IS NULL AS INTEGER) AS event_type,
                   CAST(value IS NULL AS INTEGER) AS value,
                   CAST(props IS NULL AS INTEGER) AS props
            FROM events
          ) ON COLUMNS(*) INTO NAME column_name VALUE is_null
        )
        SELECT column_name, CAST(SUM(is_null) AS BIGINT) AS n_nulls,
               COUNT(*) AS n_rows
        FROM u GROUP BY column_name
    """,
)
def events_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality null profile via unpivot: per-column null counts in ONE
    scan (the naive per-column count(*) loop is N scans — a real cost when
    N×100 TB). unpivot/melt is the long-format pivot inverse; the narrow
    (column_name, is_null) stream aggregates map-side before the shuffle."""
    events = load_table(spark, sf_dir, "events")
    flags = events.select(
        *[
            F.col(c).isNull().cast("long").alias(c)
            for c in ["event_id", "ts", "user_id", "event_type", "value", "props"]
        ]
    )
    return (
        flags.unpivot([], flags.columns, "column_name", "is_null")
        .groupBy("column_name")
        .agg(
            F.sum("is_null").alias("n_nulls"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# --------------------------------------------------------------------------
# Log-analytics pack over the parsed CLF frame: the ad-hoc queries an
# operator of the reference pipeline actually runs against the staging
# table (README.md:62-66 is the tip of this iceberg). Input is the
# synthesized CLF corpus parsed by the PRODUCTION parser, so each oracle is
# another end-to-end differential test of the parse+analyze pipeline.
# --------------------------------------------------------------------------


def _parsed_clf(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    # The regex parse is the expensive half of every clf_* query, and its
    # parallelism is capped by the SCAN's split count — a bench-scale
    # events.parquet is one ~20 MB file, i.e. ONE task doing all the
    # regex work on a 32-core machine.  When the scan is under-split,
    # spread the raw events across the cluster's cores first (one cheap
    # narrow-column shuffle buys a 32x-parallel parse).  At production
    # scale the input has >= cores splits and this is a no-op — no
    # shuffle is ever added to an already-parallel read.
    p = max(8, default_parallelism(spark))
    _np = input_partitions(events)
    if _np is None or _np < p:
        events = events.repartition(p)
    # scoped_persist is the clf pack's STAGING materialization: (a) the
    # 14 clf_* queries run back-to-back in the sweep/bench, so the parse
    # is paid once per corpus instead of once per query — exactly what
    # the reference's staging table does for its downstream readers; and
    # (b) the InMemoryRelation is a predicate-pushdown BARRIER, which
    # matters for correctness of the COST MODEL, not results: Catalyst
    # happily pushes a filter like `parse_url(referer) IS NOT NULL`
    # below the repartition exchange, INLINING the whole 9-field
    # synthesize+regex expression (4 copies of it) into a Filter that
    # runs on the pre-repartition single split — measured 45 s vs 10 s
    # for the parse itself at sf1.  Filters now evaluate against the
    # cached parsed rows.
    from .registry import scoped_persist

    # Own cache pool: 15 clf_* readers are scattered across the bench
    # (indices 0..274), and the shared LRU evicted this frame under the
    # intervening queries' staging pressure — late readers re-paid the
    # full parse (~3.5 s at sf0.1, measured r9).  The pool holds at most
    # _MAX_POOLED_CACHES parsed corpora, so memory stays bounded.
    return scoped_persist(
        parse_clf_lines(synthesize_clf_lines(events)), pool="clf_parse"
    )


@query(
    "clf_subnet_traffic",
    oracle="""
        SELECT '10.0.' || CAST(user_id % 256 AS VARCHAR) AS subnet24,
               COUNT(*) AS n_requests,
               CAST(SUM(CASE WHEN event_type = 'view' THEN 0
                        ELSE event_id * 10 END) AS BIGINT) AS total_bytes
        FROM events GROUP BY 1
    """,
)
def clf_subnet_traffic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic per /24 subnet: substring_index keeps the first three IP
    octets — native string ops on the parsed frame, one hash aggregation.
    (total_bytes treats NULL size as 0 via sum over coalesce, matching the
    oracle's CASE.)"""
    parsed = _parsed_clf(spark, sf_dir)
    return (
        parsed.groupBy(
            F.substring_index(F.col("ip_address"), ".", 3).alias("subnet24")
        )
        .agg(
            F.count(F.lit(1)).alias("n_requests"),
            F.sum(F.coalesce(F.col("size"), F.lit(0))).alias("total_bytes"),
        )
    )


@query(
    "clf_referer_domains",
    oracle="""
        SELECT 'example.com' AS domain, COUNT(*) AS n_requests
        FROM events WHERE event_type = 'click'
    """,
)
def clf_referer_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referer-domain breakdown via native parse_url(..., 'HOST') — no
    regex, no UDF. Null referers (direct traffic) are excluded, matching
    the reference corpus where only clicks carry a referer."""
    parsed = _parsed_clf(spark, sf_dir)
    return (
        parsed.select(F.parse_url(F.col("referer"), F.lit("HOST")).alias("domain"))
        .filter(F.col("domain").isNotNull())
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n_requests"))
    )


@query(
    "clf_status_class_breakdown",
    oracle="""
        SELECT CASE WHEN event_type = 'error' THEN '5xx' ELSE '2xx' END
                 AS status_class,
               COUNT(*) AS n_requests
        FROM events GROUP BY 1
    """,
)
def clf_status_class_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Requests per HTTP status class (2xx/3xx/4xx/5xx) — the first chart
    on every ops dashboard; floor(status/100) keys the aggregation."""
    parsed = _parsed_clf(spark, sf_dir)
    return (
        parsed.groupBy(
            F.concat(
                (F.col("status_code") / 100).cast("int").cast("string"),
                F.lit("xx"),
            ).alias("status_class")
        )
        .agg(F.count(F.lit(1)).alias("n_requests"))
    )


@query(
    "clf_top_user_agents",
    oracle="""
        SELECT 'Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36' AS user_agent,
               COUNT(*) AS n_requests
        FROM events
    """,
)
def clf_top_user_agents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user agents (quoted field with embedded spaces — the parse case
    the naive whitespace split gets wrong); top-k planned as
    TakeOrderedAndProject."""
    parsed = _parsed_clf(spark, sf_dir)
    return (
        parsed.groupBy("user_agent")
        .agg(F.count(F.lit(1)).alias("n_requests"))
        .orderBy(F.desc("n_requests"), F.asc("user_agent"))
        .limit(10)
    )


@query(
    "funnel_conversion",
    oracle="""
        WITH s1 AS (
          SELECT user_id, MIN(ts) AS t1 FROM events
          WHERE event_type = 'view' GROUP BY user_id
        ),
        s2 AS (
          SELECT e.user_id, MIN(e.ts) AS t2
          FROM events e JOIN s1 ON e.user_id = s1.user_id
          WHERE e.event_type = 'click' AND e.ts > s1.t1
          GROUP BY e.user_id
        ),
        s3 AS (
          SELECT e.user_id, MIN(e.ts) AS t3
          FROM events e JOIN s2 ON e.user_id = s2.user_id
          WHERE e.event_type = 'purchase' AND e.ts > s2.t2
          GROUP BY e.user_id
        )
        SELECT * FROM (
          SELECT 1 AS stage_idx, 'view' AS stage,
                 (SELECT COUNT(*) FROM s1) AS n_users
          UNION ALL
          SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
          UNION ALL
          SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3)
        )
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered event funnel: users who viewed, then clicked strictly
    after their first view, then purchased strictly after that click —
    the classic product-analytics operator (no reference analogue; the
    reference has no event sequencing at all, SURVEY.md §2.5).

    Each stage is one aggregate on user_id joined to the previous
    stage's first-passage time; all three shuffles hash the SAME key, so
    the exchanges align (no re-partitioning between stages), and each
    stage's frame shrinks monotonically. Strict ts inequality makes the
    result engine-independent (no tie ambiguity: equal timestamps never
    advance a stage). The 3-row summary assembles from three count
    aggregates — driver-sized, not a data union."""
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    s1 = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        events.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        events.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    def _stage(idx: int, name: str, frame: DataFrame) -> DataFrame:
        return frame.agg(
            F.lit(idx).cast("int").alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).alias("n_users"),
        )
    return _stage(1, "view", s1).unionAll(
        _stage(2, "click", s2)
    ).unionAll(_stage(3, "purchase", s3))


@query(
    "retention_cohorts",
    oracle="""
        WITH ev AS (
          SELECT user_id, event_type,
                 date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                   AS day
          FROM events
        ),
        signup AS (
          SELECT user_id,
                 CAST(FLOOR(CAST(MIN(day) AS DOUBLE) / 7) AS BIGINT)
                   AS cohort_week
          FROM ev WHERE event_type = 'signup' GROUP BY user_id
        )
        SELECT cohort_week,
               CAST(FLOOR(CAST(ev.day AS DOUBLE) / 7) AS BIGINT)
                 - cohort_week AS week_offset,
               COUNT(DISTINCT ev.user_id) AS n_active
        FROM ev JOIN signup ON ev.user_id = signup.user_id
        WHERE CAST(FLOOR(CAST(ev.day AS DOUBLE) / 7) AS BIGINT)
              >= cohort_week
        GROUP BY 1, 2
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention matrix: users grouped by signup week (cohort),
    counted as active in each subsequent week they produced any event —
    the standard growth-analytics rollup (no reference analogue;
    SURVEY.md §2.5 verified absences).

    Plan: signup first-passage aggregates on user_id, rejoins the event
    stream on the same key (aligned exchanges), then one aggregate on
    the tiny (cohort_week, week_offset) grid. countDistinct carries the
    user ids through the final shuffle — at fact scale swap to
    approx_count_distinct exactly as documented for clf_user_count's HLL
    variant. Week arithmetic goes through FLOOR(double/7) identically in
    both engines (exact for any realistic day number)."""
    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        "user_id",
        "event_type",
        F.unix_date(F.to_date("ts")).cast("long").alias("day"),
    )
    week = lambda c: F.floor(c.cast("double") / 7).cast("long")  # noqa: E731
    signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(week(F.min("day")).alias("cohort_week"))
    )
    return (
        ev.join(signup, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (week(F.col("day")) - F.col("cohort_week")).alias("week_offset"),
        )
        .filter(F.col("week_offset") >= 0)
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@query(
    "rolling_wau",
    oracle="""
        WITH user_days AS (
          SELECT DISTINCT user_id,
                 date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                   AS day
          FROM events
        ),
        contrib AS (
          SELECT user_id, day + i AS obs_day
          FROM user_days, LATERAL (
            SELECT unnest(generate_series(0, 6)) AS i
          ) t
        ),
        bounds AS (
          SELECT MIN(day) AS lo, MAX(day) AS hi FROM user_days
        )
        SELECT obs_day, COUNT(DISTINCT user_id) AS wau
        FROM contrib, bounds
        WHERE obs_day BETWEEN lo AND hi
        GROUP BY obs_day
    """,
)
def rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per calendar day — the classic growth
    metric. countDistinct over a sliding RANGE window is not a window
    function Spark (or any engine) supports directly; the scalable shape
    is the bounded fan-out: dedup to (user, day), explode each into the
    ≤7 observation days it contributes to, and hash-aggregate distinct
    users per day. The fan-out is a constant 7× of the DEDUPED user-day
    frame (tiny relative to raw events), versus a per-day self-join or a
    quadratic window. Observation days outside the corpus range are
    clipped by a broadcast 1-row bounds frame. E175
    (`active_users_7d_sliding`) is the delta-encoded refinement of this
    same metric: ≤2 boundary deltas per user-day instead of the 7×
    fan-out, and a calendar prefix sum instead of a per-day distinct —
    the form to prefer at fact scale."""
    events = load_table(spark, sf_dir, "events")
    user_days = (
        events.select(
            "user_id",
            F.unix_date(F.to_date("ts")).cast("long").alias("day"),
        ).distinct()
    )
    contrib = user_days.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.col("day") + 6)
        ).alias("obs_day"),
    )
    bounds = user_days.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    return (
        contrib.crossJoin(F.broadcast(bounds))
        .filter(F.col("obs_day").between(F.col("lo"), F.col("hi")))
        .groupBy("obs_day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )


@query(
    "events_value_anomalies",
    oracle="""
        WITH stats AS (
          SELECT event_type,
                 COUNT(value) AS n_events,
                 CAST(SUM(CAST(FLOOR(value * 10000 + 0.5) AS BIGINT))
                      AS DOUBLE) / 10000 / COUNT(value) AS mean_value,
                 sqrt(
                   CAST(SUM(CAST(FLOOR(value * value * 10000 + 0.5)
                                 AS BIGINT)) AS DOUBLE) / 10000
                     / COUNT(value)
                   - POW(CAST(SUM(CAST(FLOOR(value * 10000 + 0.5)
                                       AS BIGINT)) AS DOUBLE) / 10000
                         / COUNT(value), 2)
                 ) AS std_value
          FROM events WHERE value IS NOT NULL GROUP BY event_type
        )
        SELECT e.event_type, n_events, mean_value, std_value,
               CAST(SUM(CASE WHEN abs(e.value - mean_value)
                                  > 3 * std_value
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
        FROM events e JOIN stats ON e.event_type = stats.event_type
        WHERE e.value IS NOT NULL
        GROUP BY e.event_type, n_events, mean_value, std_value
    """,
)
def events_value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-sigma outlier counts per event type. stddev_pop's float sums are
    partitioning-dependent, so mean and variance come from scaled-integer
    sums (Σv and Σv² exact, then two deterministic double divisions and
    one sqrt — bit-identical in both engines). The per-type stats frame
    is bounded by event-type cardinality and broadcast-joins back for the
    outlier pass; events are scanned twice, both scans pruned to
    (event_type, value). A window over event_type instead would funnel
    each type's full history through one task — the trap this shape
    avoids."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    ).select("event_type", "value")
    s = F.sum(F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("long"))
    ss = F.sum(
        F.floor(F.col("value") * F.col("value") * 10000 + F.lit(0.5))
        .cast("long")
    )
    n = F.count("value")
    mean = s.cast("double") / 10000 / n
    var = ss.cast("double") / 10000 / n - mean * mean
    dim = events.groupBy(F.col("event_type").alias("s_type")).agg(
        n.alias("n_events"),
        mean.alias("mean_value"),
        F.sqrt(var).alias("std_value"),
    )
    return (
        events.join(
            F.broadcast(dim), F.col("event_type") == F.col("s_type")
        )
        .groupBy("event_type", "n_events", "mean_value", "std_value")
        .agg(
            F.sum(
                F.when(
                    F.abs(F.col("value") - F.col("mean_value"))
                    > 3 * F.col("std_value"),
                    1,
                ).otherwise(0)
            ).cast("long").alias("n_anomalies")
        )
    )


@query(
    "variant_props_extract",
    oracle="""
        SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
               COUNT(*) AS cnt,
               CAST(MIN(event_id) AS BIGINT) AS first_event
        FROM events GROUP BY 1
    """,
)
def variant_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6 on the Spark 4 VARIANT path: ``try_parse_json`` shreds the JSON
    string ONCE into the binary Variant encoding, then ``variant_get``
    probes it with a typed path — no re-parse per extraction, which is
    the difference that matters when a props blob is probed for ten keys
    instead of one (``get_json_object`` re-parses the string per call).
    ``try_`` semantics: malformed JSON → NULL row, never a failed job —
    the 100 TB posture where one bad record must not kill a 1000-executor
    stage. Same aggregation semantics as json_props_extract, so the same
    DuckDB oracle applies; both stay in whole-stage codegen."""
    events = load_table(spark, sf_dir, "events")
    v = F.try_parse_json(F.col("props"))
    return (
        events.select(
            F.variant_get(v, "$.k", "bigint").alias("k"), "event_id"
        )
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("event_id").alias("first_event"),
        )
    )


#: Fixed epoch for the trend regressor: keeps the day regressor small so
#: every moment sum stays exactly representable in BIGINT (the raw epoch
#: day is ~20k; its cross-moments with 1e4-scaled values overflow long at
#: bench scale already — centering is correctness, not cosmetics).
TREND_EPOCH = "2024-01-01"


@query(
    "events_value_trend",
    oracle=f"""
        WITH m AS (
          SELECT event_type,
                 COUNT(*) AS n,
                 SUM(x) AS sx,
                 SUM(x * x) AS sxx,
                 SUM(y) AS sy,
                 SUM(x * y) AS sxy
          FROM (
            SELECT event_type,
                   CAST(date_diff('day', DATE '{TREND_EPOCH}',
                                  CAST(ts AS DATE)) AS BIGINT) AS x,
                   CAST(FLOOR(value * 10000 + 0.5) AS BIGINT) AS y
            FROM events
          )
          GROUP BY event_type
        )
        SELECT event_type,
               CAST(n AS BIGINT) AS n,
               (CAST(n * sxy - sx * sy AS DOUBLE)
                  / NULLIF(CAST(n * sxx - sx * sx AS DOUBLE), 0)) / 10000
                 AS slope_per_day,
               (CAST(sy AS DOUBLE) / n / 10000)
                 - ((CAST(n * sxy - sx * sy AS DOUBLE)
                       / NULLIF(CAST(n * sxx - sx * sx AS DOUBLE), 0)) / 10000)
                   * (CAST(sx AS DOUBLE) / n)
                 AS intercept
        FROM m
    """,
)
def events_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group least-squares trend (slope of value over time) as pure
    integer moment sums — distributed OLS without ML machinery or a
    second pass: slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) over a day index
    and a 1e4-scaled value. Why not covar_samp/var_samp (both engines
    have them): their float accumulation is partitioning-order-dependent
    in the last bits, so the cross-engine hash would flap; integer
    moments are exact and commutative, so ONE map-side-combinable
    aggregation yields bit-stable slopes under any parallelism. The
    same four moments also give the intercept — no extra scan. At 100 TB
    switch the moment sums to DECIMAL(38,0); the shape is unchanged."""
    events = load_table(spark, sf_dir, "events")
    x = F.datediff(F.to_date("ts"), F.to_date(F.lit(TREND_EPOCH))).cast(
        "long"
    )
    y = F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("long")
    m = (
        events.select("event_type", x.alias("x"), y.alias("y"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
        )
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    # Degenerate groups (single event, or all events on one day) have
    # den = 0; both engines must yield NULL slope/intercept there rather
    # than ANSI-divide-by-zero on Spark vs ±inf on DuckDB.
    slope = (num / F.nullif(den, F.lit(0.0))) / 10000
    intercept = (
        F.col("sy").cast("double") / F.col("n") / 10000
        - slope * (F.col("sx").cast("double") / F.col("n"))
    )
    return m.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        slope.alias("slope_per_day"),
        intercept.alias("intercept"),
    )


@query(
    "session_window_counts_batch",
    oracle=f"""
        WITH flagged AS (
          SELECT user_id, ts, event_id,
                 CASE
                   WHEN ts - LAG(ts) OVER w < INTERVAL {SESSION_GAP_SECONDS} SECOND
                   THEN 0 ELSE 1
                 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sessions AS (
          SELECT user_id, ts,
                 SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS sid
          FROM flagged
        )
        SELECT user_id,
               strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               strftime(MAX(ts) + INTERVAL {SESSION_GAP_SECONDS} SECOND,
                        '%Y-%m-%d %H:%M:%S') AS session_end,
               COUNT(*) AS n_events
        FROM sessions GROUP BY user_id, sid
    """,
)
def session_window_counts_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5 via the NATIVE session operator: ``session_window`` works in
    batch too, and this is the same sessionization as sessionize_gap
    without the two-window lag/prefix-sum dance — the operator merges
    point-intervals [ts, ts+gap) whenever a new event lands strictly
    inside the open session (Spark's merge rule is ``<``, not ``<=``:
    the session end is exclusive, and the oracle's LAG test mirrors
    that). One shuffle on user_id, sessions assembled executor-side;
    the window bounds come back as session start and exclusive end
    (max ts + gap). Formatted to whole seconds like sessionize_gap so
    the NTZ timestamps compare engine-neutrally."""
    events = load_table(spark, sf_dir, "events")
    sw = events.groupBy(
        F.session_window(F.col("ts"), f"{SESSION_GAP_SECONDS} seconds"),
        "user_id",
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return sw.select(
        "user_id",
        F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss").alias(
            "session_start"
        ),
        F.date_format("session_window.end", "yyyy-MM-dd HH:mm:ss").alias(
            "session_end"
        ),
        "n_events",
    )


# --------------------------------------------------------------------------
# IP-range (CIDR-style) enrichment: the classic log-analytics lookup — map
# each request's IP into an owning block from a ranges dimension. The
# scalable shape is interval bucketing: both sides get a coarse equi-key
# (floor(idx / B)), ranges are exploded to every bucket they overlap, and
# the join is a plain hash join on the bucket with the BETWEEN residual —
# never a nested-loop scan of ranges per row. Here the exploded dimension
# is 25 nation-derived blocks, so it broadcasts; at 100 TB with millions of
# ranges the identical plan shuffles on the bucket key instead.
# --------------------------------------------------------------------------

#: Width of each nation-owned IP block over the 10.0.0.0/16 index space
#: (third_octet*256 + fourth_octet ∈ [0, 65535]); 25 blocks cover
#: [0, 65524], the tail straggler IPs match no block and are dropped by
#: the inner join (a real property of registry lookups worth testing).
_IP_BLOCK_WIDTH = 2621
#: Interval-bucketing granularity for the equi-key.
_IP_BUCKET = 4096


def with_ip_bucket(parsed: DataFrame) -> DataFrame:
    """Project a parsed CLF frame (batch OR streaming — narrow ops only)
    to its /16-local IP index (octet3*256 + octet4) plus the interval
    bucket, keeping the byte size.

    coalesce(-1) makes ip_idx (and so the bucket key) NON-NULLABLE.
    Without it, an inner join injects isnotnull(bucket) below the
    projections, and that filter inlines the whole regex-parse
    expression outside the projects' common-subexpression sharing —
    re-running the parse per row made the batch query ~40x slower at
    sf0.1. -1 is below every block's lo, so null-ip rows match nothing.
    The second coalesce exists because Divide is nullable in Catalyst's
    metadata even with a literal divisor."""
    octets = F.split(F.col("ip_address"), "\\.")
    return parsed.select(
        F.coalesce(
            octets.getItem(2).cast("long") * 256
            + octets.getItem(3).cast("long"),
            F.lit(-1),
        ).alias("ip_idx"),
        F.coalesce(F.col("size"), F.lit(0)).alias("sz"),
    ).withColumn(
        "bucket",
        F.coalesce((F.col("ip_idx") / _IP_BUCKET).cast("long"), F.lit(-1)),
    )


def bucketed_ip_ranges(nation: DataFrame) -> DataFrame:
    """Nation-derived IP blocks [k*W, k*W + W - 1] exploded to each
    bucket of width B they overlap (at most ceil(W/B)+1 ≈ 2 rows per
    range) — the dimension side of the interval-bucketed range join."""
    w = _IP_BLOCK_WIDTH
    return nation.select(
        F.col("n_name").alias("block_owner"),
        (F.col("n_nationkey").cast("long") * w).alias("lo"),
        (F.col("n_nationkey").cast("long") * w + w - 1).alias("hi"),
    ).select(
        "block_owner",
        "lo",
        "hi",
        F.explode(
            F.sequence(
                (F.col("lo") / _IP_BUCKET).cast("long"),
                (F.col("hi") / _IP_BUCKET).cast("long"),
            )
        ).alias("bucket"),
    )


def ip_range_join(ips: DataFrame, ranges: DataFrame) -> DataFrame:
    """Bucket-equality hash join with the BETWEEN residual — never a
    per-row range scan. No broadcast hint: a tiny dim broadcasts on its
    size estimate; an unbounded registry-scale ranges table correctly
    degrades to a shuffled hash join instead of a pinned OOM."""
    return ips.join(
        ranges,
        (ips["bucket"] == ranges["bucket"])
        & (ips["ip_idx"] >= ranges["lo"])
        & (ips["ip_idx"] <= ranges["hi"]),
        "inner",
    )


@query(
    "ip_range_enrich_traffic",
    oracle=f"""
        WITH ips AS (
          SELECT (user_id % 256) * 256 + (event_id % 256) AS ip_idx,
                 CASE WHEN event_type = 'view' THEN 0
                      ELSE event_id * 10 END AS sz
          FROM events
        ), ranges AS (
          SELECT n_name AS block_owner,
                 n_nationkey * {_IP_BLOCK_WIDTH} AS lo,
                 n_nationkey * {_IP_BLOCK_WIDTH} + {_IP_BLOCK_WIDTH} - 1 AS hi
          FROM nation
        )
        SELECT block_owner,
               CAST(COUNT(*) AS BIGINT) AS n_requests,
               CAST(SUM(sz) AS BIGINT) AS total_bytes
        FROM ips JOIN ranges ON ip_idx BETWEEN lo AND hi
        GROUP BY block_owner
    """,
)
def ip_range_enrich_traffic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic per IP-range owner via an interval-bucketed range join
    (see with_ip_bucket / bucketed_ip_ranges / ip_range_join — the same
    three pieces run unchanged over a log STREAM in
    streaming/log_stream.py:enrich_stream_ip_ranges)."""
    ips = with_ip_bucket(_parsed_clf(spark, sf_dir))
    ranges = bucketed_ip_ranges(load_table(spark, sf_dir, "nation"))
    return ip_range_join(ips, ranges).groupBy("block_owner").agg(
        F.count(F.lit(1)).alias("n_requests"),
        F.sum("sz").alias("total_bytes"),
    )


@query(
    "user_burst_rates",
    oracle="""
        WITH per_min AS (
          SELECT user_id, date_trunc('minute', ts) AS minute,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2
        )
        SELECT user_id,
               MAX(n) AS peak_per_minute,
               CAST(SUM(n) AS BIGINT) AS total_events,
               MAX(n) >= 5 AS burst_flag
        FROM per_min GROUP BY user_id
    """,
)
def user_burst_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-limit / bot heuristic: each user's peak events-per-minute and
    a burst flag (peak >= 5). Two aggregations, but the second consumes
    the first's (user_id, minute) partial — AQE coalesces the already-tiny
    second exchange, and nothing wider than per-minute counts ever
    shuffles. The 100 TB version is identical; the per-user state is two
    longs."""
    events = load_table(spark, sf_dir, "events")
    per_min = events.groupBy(
        "user_id", F.date_trunc("minute", F.col("ts")).alias("minute")
    ).agg(F.count(F.lit(1)).alias("n"))
    return per_min.groupBy("user_id").agg(
        F.max("n").alias("peak_per_minute"),
        F.sum("n").alias("total_events"),
        (F.max("n") >= 5).alias("burst_flag"),
    )


#: Rows kept per stratum by the deterministic stratified sampler.
_STRATUM_K = 50


@query(
    "stratified_sample_events",
    oracle=f"""
        SELECT event_type, event_id, CAST(rk AS BIGINT) AS sample_rank
        FROM (
          SELECT event_type, event_id,
                 ROW_NUMBER() OVER (
                   PARTITION BY event_type
                   ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
                 ) AS rk
          FROM events
        ) t WHERE rk <= {_STRATUM_K}
    """,
)
def stratified_sample_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: exactly K rows per event_type,
    chosen by ranking on a content hash — the balanced-evaluation-set /
    debugging-slice primitive. Unlike sampleBy() (rate-based, seed- and
    partitioning-dependent), the hash order is a pure function of the
    data, so the sample is reproducible across runs, partitionings, and
    engines.

    One shuffle on event_type; rank<=K collapses to WindowGroupLimit, so
    each partition retains only K candidates pre-shuffle — at 100 TB the
    exchange carries O(strata x K) rows after the per-partition prune,
    not the corpus. For heavily-skewed strata the two-level refinement
    (per-partition top-K, then global top-K of candidates) is exactly
    what WindowGroupLimit already implements."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.md5(F.col("event_id").cast("string")), "event_id"
    )
    return (
        events.select(
            "event_type",
            "event_id",
            F.row_number().over(w).cast("long").alias("sample_rank"),
        )
        .where(F.col("sample_rank") <= _STRATUM_K)
    )


@query(
    "events_value_mad_outliers",
    oracle="""
        WITH med AS (
          SELECT event_type,
                 quantile_cont(value, 0.5) AS med
          FROM events GROUP BY event_type
        ), dev AS (
          SELECT e.event_type, e.value, m.med,
                 abs(e.value - m.med) AS adev
          FROM events e JOIN med m USING (event_type)
        ), mad AS (
          SELECT event_type, med,
                 quantile_cont(adev, 0.5) AS mad
          FROM dev GROUP BY event_type, med
        )
        SELECT d.event_type,
               round(d.med, 6) AS median_value,
               round(mad.mad, 6) AS mad_value,
               CAST(COUNT(*) FILTER (
                 WHERE d.adev > 3 * 1.4826 * mad.mad
               ) AS BIGINT) AS n_outliers,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM dev d JOIN mad USING (event_type, med)
        GROUP BY d.event_type, d.med, mad.mad
    """,
)
def events_value_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via median absolute deviation — unlike
    the 3-sigma rule (events_value_anomalies), MAD is immune to the
    outliers it hunts, the estimator production monitoring actually
    wants on heavy-tailed metrics.

    Two exact-percentile aggregations on the same event_type key (the
    second consumes the first's partitioning) plus a broadcast-back of
    the per-type scalars — never a per-row window over the corpus. The
    3*1.4826 sigma-equivalence threshold is one fixed double expression,
    so counts are engine-exact; medians themselves ride the same
    percentile/quantile_cont equivalence events_value_percentiles
    already proves."""
    events = load_table(spark, sf_dir, "events")
    med = events.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = events.join(med, "event_type").select(
        "event_type",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type", "med").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(mad, ["event_type", "med"])
        .groupBy("event_type", "med", "mad")
        .agg(
            F.count(
                F.when(F.col("adev") > 3 * 1.4826 * F.col("mad"), 1)
            ).alias("n_outliers"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "event_type",
            F.round("med", 6).alias("median_value"),
            F.round("mad", 6).alias("mad_value"),
            "n_outliers",
            "n_events",
        )
    )


@query(
    "event_transition_matrix",
    oracle="""
        WITH pairs AS (
          SELECT event_type AS from_type,
                 lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                 ) AS to_type
          FROM events
        ), trans AS (
          SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_transitions
          FROM pairs WHERE to_type IS NOT NULL GROUP BY 1, 2
        )
        SELECT from_type, to_type, n_transitions,
               n_transitions / CAST(SUM(n_transitions) OVER (
                 PARTITION BY from_type) AS DOUBLE) AS p_transition
        FROM trans
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition matrix over user event sequences — the
    user-journey primitive behind "what do users do after X" / next-event
    prediction baselines.

    One shuffle on user_id for the lead() window, then the pair counts
    collapse map-side to |event_type|² rows, so the probability window
    runs over a frame bounded by the type vocabulary squared — never the
    corpus. Probabilities are one BIGINT/BIGINT→DOUBLE division on
    identical operands, hence engine-exact."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = events.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    trans = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    wt = Window.partitionBy("from_type")
    return trans.select(
        "from_type",
        "to_type",
        "n_transitions",
        (
            F.col("n_transitions")
            / F.sum("n_transitions").over(wt).cast("double")
        ).alias("p_transition"),
    )


#: Exponential-decay scoring: reference date just past the fixture's event
#: horizon, 7-day half-life, exponent capped so the 1<<k weight divisor
#: stays inside BIGINT whatever the data's age.
_DECAY_REF_DATE = "2024-02-01"
_DECAY_HALF_LIFE_DAYS = 7
_DECAY_MAX_K = 60


@query(
    "user_activity_decay",
    oracle=f"""
        WITH weighted AS (
          SELECT user_id, ts,
                 value / CAST(CAST(1 AS BIGINT) << least(
                   greatest(date_diff('day', CAST(ts AS DATE),
                                      DATE '{_DECAY_REF_DATE}'), 0)
                   // {_DECAY_HALF_LIFE_DAYS}, {_DECAY_MAX_K}
                 ) AS DOUBLE) AS w_value
          FROM events
        )
        SELECT user_id,
               {sql_dec_sum("w_value")} AS decayed_score,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(MAX(ts) AS DATE) AS last_seen
        FROM weighted GROUP BY user_id
    """,
)
def user_activity_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponential time-decay activity score (7-day half-life) —
    the recency-weighted engagement metric feature stores serve.

    The decay weight is 2^-floor(age/half_life): an integer exponent on a
    power of two, so value*weight is an exact exponent shift (no exp/log,
    no libm variance) and the per-row addend is bit-identical in every
    engine; dec_sum then makes the per-user sum order-insensitive. One
    hash aggregation on user_id — at 100 TB it's the same single
    exchange, with the 1<<k divisor guarded into BIGINT range however
    old the tail of the data is."""
    events = load_table(spark, sf_dir, "events")
    age_days = F.greatest(
        F.datediff(F.lit(_DECAY_REF_DATE).cast("date"), F.to_date("ts")),
        F.lit(0),
    )
    k = F.least(
        F.floor(age_days / F.lit(_DECAY_HALF_LIFE_DAYS)),
        F.lit(_DECAY_MAX_K),
    ).cast("int")
    weighted = events.select("user_id", "ts", "value", k.alias("k")).select(
        "user_id",
        "ts",
        (
            F.col("value")
            / F.expr("shiftleft(CAST(1 AS BIGINT), k)").cast("double")
        ).alias("w_value"),
    )
    return weighted.groupBy("user_id").agg(
        dec_sum(F.col("w_value")).alias("decayed_score"),
        F.count(F.lit(1)).alias("n_events"),
        F.max(F.to_date("ts")).alias("last_seen"),
    )


#: Session paths keep the first N event types of each session.
_PATH_PREFIX_LEN = 5
_PATH_TOPK = 10


@query(
    "session_path_topk",
    oracle=f"""
        WITH flagged AS (
          SELECT user_id, ts, event_id, event_type,
                 CASE
                   WHEN ts - LAG(ts) OVER w <= INTERVAL {SESSION_GAP_SECONDS} SECOND
                   THEN 0 ELSE 1
                 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sessions AS (
          SELECT user_id, ts, event_id, event_type,
                 CAST(SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
          FROM flagged
        ), ranked AS (
          SELECT user_id, session_id, event_type,
                 ROW_NUMBER() OVER (
                   PARTITION BY user_id, session_id ORDER BY ts, event_id
                 ) AS rn
          FROM sessions
        ), paths AS (
          SELECT user_id, session_id,
                 string_agg(event_type, '>' ORDER BY rn) AS path
          FROM ranked WHERE rn <= {_PATH_PREFIX_LEN}
          GROUP BY user_id, session_id
        )
        SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
        FROM paths GROUP BY path
        ORDER BY n_sessions DESC, path LIMIT {_PATH_TOPK}
    """,
)
def session_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K most common session paths (the first 5 event types of each
    gap-based session, joined with '>') — the journey-mining summary
    behind funnel discovery.

    Composes the sessionize_gap machinery: one user_id shuffle serves the
    lag window, the cumulative session-id window, AND the per-session
    row_number — three window stages over one partitioning. The rn<=N
    prune bounds every session's contribution before the path strings
    shuffle, path counts collapse map-side, and the final top-K is
    TakeOrderedAndProject with a deterministic (count, path) tie-break.
    collect_list is order-unstable under parallel merge, so the path is
    rebuilt from an array_sort over (rn, event_type) structs — the same
    total order the oracle's ORDER BY rn string_agg uses."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts") - F.lag("ts").over(w)
    new_session = F.when(
        gap <= F.expr(f"INTERVAL {SESSION_GAP_SECONDS} SECONDS"), 0
    ).otherwise(1)
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = (
        events.withColumn("new_session", new_session)
        .withColumn("session_id", F.sum("new_session").over(cum))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id", "session_id").orderBy(
                    "ts", "event_id"
                )
            ),
        )
        .where(F.col("rn") <= _PATH_PREFIX_LEN)
    )
    paths = ranked.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("rn", "event_type"))
                ),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(_PATH_TOPK)
    )


#: Priority sampling (Duffield/Lund/Thorup): keep the K highest-priority
#: rows per stratum, priority = weight / uniform(0,1].
_WSAMPLE_K = 30
#: Knuth multiplicative hash → deterministic uniform in (0, 1] with
#: 2^20 resolution; pure integer arithmetic, identical in every engine.
_WSAMPLE_HASH_MULT = 2654435761
_WSAMPLE_HASH_MOD = 1 << 20


@query(
    "weighted_sample_events",
    oracle=f"""
        WITH keyed AS (
          SELECT event_type, event_id, value,
                 value / (CAST((event_id * {_WSAMPLE_HASH_MULT})
                               % {_WSAMPLE_HASH_MOD} + 1 AS DOUBLE)
                          / {_WSAMPLE_HASH_MOD}) AS priority
          FROM events
        )
        SELECT event_type, event_id, value,
               CAST(rk AS BIGINT) AS sample_rank
        FROM (
          SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY event_type
                   ORDER BY priority DESC, event_id
                 ) AS rk
          FROM keyed
        ) t WHERE rk <= {_WSAMPLE_K}
    """,
)
def weighted_sample_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted (priority) sampling: K rows per event_type
    with inclusion probability proportional to `value` — the
    importance-sampling primitive for building weighted eval slices
    (Duffield/Lund/Thorup priority sampling, u derived from a
    multiplicative hash of the row id instead of a RNG).

    Unlike rate-based sampleBy(fractions, seed), the sample is a pure
    function of the data: u = (Knuth-hash(event_id)+1)/2^20 is exact
    integer arithmetic, priority = value/u is one double division on
    identical operands, so the chosen rows are identical across runs,
    partitionings, and engines. rank≤K collapses to WindowGroupLimit —
    each partition prunes to K candidates before the event_type
    exchange, exactly the stratified_sample_events plan shape."""
    events = load_table(spark, sf_dir, "events")
    u = (
        (F.col("event_id") * F.lit(_WSAMPLE_HASH_MULT))
        % F.lit(_WSAMPLE_HASH_MOD)
        + F.lit(1)
    ).cast("double") / F.lit(_WSAMPLE_HASH_MOD)
    keyed = events.select(
        "event_type",
        "event_id",
        "value",
        (F.col("value") / u).alias("priority"),
    )
    w = Window.partitionBy("event_type").orderBy(
        F.desc("priority"), "event_id"
    )
    return (
        keyed.select(
            "event_type",
            "event_id",
            "value",
            F.row_number().over(w).cast("long").alias("sample_rank"),
        )
        .where(F.col("sample_rank") <= _WSAMPLE_K)
    )


#: Debounce window: an event is suppressed when the SAME (user, type)
#: fired within this many seconds before it.
_DEBOUNCE_SECONDS = 120


@query(
    "dedup_events_debounce",
    oracle=f"""
        WITH lagged AS (
          SELECT event_id, user_id, event_type, ts,
                 LAG(ts) OVER (
                   PARTITION BY user_id, event_type ORDER BY ts, event_id
                 ) AS prev_ts
          FROM events
        )
        SELECT event_id, user_id, event_type
        FROM lagged
        WHERE prev_ts IS NULL
           OR ts - prev_ts > INTERVAL {_DEBOUNCE_SECONDS} SECOND
    """,
)
def dedup_events_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed event deduplication (debounce): drop an event when the
    same (user, event_type) fired within the suppression window before
    it — double-click / retry-storm suppression, the time-aware dedup
    exact-hash dedup can't express.

    One lag() over the (user_id, event_type) partitioning — a single
    shuffle, per-key state of one timestamp. Semantics are
    predecessor-based (each event within W of its immediate predecessor
    is dropped, the debounce convention), not kept-anchor-based (which
    is sequential per key, the applyInPandas shape pack_sequences_greedy
    demonstrates). The streaming twin is dropDuplicatesWithinWatermark /
    the TTL'd first-seen dedup in streaming/transform_state.py."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    return (
        events.withColumn("prev_ts", prev_ts)
        .where(
            F.col("prev_ts").isNull()
            | (
                F.col("ts") - F.col("prev_ts")
                > F.expr(f"INTERVAL {_DEBOUNCE_SECONDS} SECONDS")
            )
        )
        .select("event_id", "user_id", "event_type")
    )


#: Benford first-digit probabilities log10(1+1/d), materialized as
#: literals ONCE here so both engines consume identical doubles and the
#: operator itself never calls libm log.
_BENFORD_P = {
    1: 0.3010299956639812,
    2: 0.17609125905568124,
    3: 0.12493873660829992,
    4: 0.09691001300805642,
    5: 0.07918124604762482,
    6: 0.06694678963061322,
    7: 0.05799194697768673,
    8: 0.05115252244738129,
    9: 0.04575749056067514,
}


@query(
    "benford_value_audit",
    oracle=f"""
        WITH digits AS (
          SELECT CAST(regexp_extract(CAST(value AS VARCHAR), '[1-9]')
                      AS BIGINT) AS digit
          FROM events WHERE value > 0
        ), counts AS (
          SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_values
          FROM digits GROUP BY digit
        ), expected AS (
          SELECT CAST(digit AS BIGINT) AS digit,
                 CAST(expected_p AS DOUBLE) AS expected_p
          FROM (VALUES
            {", ".join(f"({d}, {p!r})" for d, p in _BENFORD_P.items())}
          ) AS t(digit, expected_p)
        )
        SELECT e.digit, COALESCE(c.n_values, 0) AS n_values, e.expected_p,
               (CAST(COALESCE(c.n_values, 0) AS DOUBLE)
                  - e.expected_p * CAST(n.total AS DOUBLE))
               * (CAST(COALESCE(c.n_values, 0) AS DOUBLE)
                  - e.expected_p * CAST(n.total AS DOUBLE))
               / (e.expected_p * CAST(n.total AS DOUBLE)) AS chi2_term
        FROM expected e
        LEFT JOIN counts c USING (digit)
        CROSS JOIN (SELECT CAST(SUM(n_values) AS BIGINT) AS total
                    FROM counts) n
    """,
)
def benford_value_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-significant-digit audit of the value column —
    the fraud/fabrication screen accountants run on financial columns,
    here as a per-digit chi-square contribution table (9 rows at any
    corpus size).

    The Benford probabilities are baked as literals (log10 evaluated
    once, at authoring time), so the operator is pure count + fixed
    double arithmetic — engine-exact, no libm at query time. The digit
    histogram collapses map-side to ≤9 rows; everything after the one
    tiny aggregation is arithmetic on a 9-row frame (the corpus total is
    a 1-row crossJoin of the already-aggregated counts, not a rescan).
    chi2 terms use explicit x*x, not power()."""
    events = load_table(spark, sf_dir, "events")
    counts = (
        events.where(F.col("value") > 0)
        .select(
            F.regexp_extract(F.col("value").cast("string"), "[1-9]", 0)
            .cast("long")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_values"))
    )
    expected = spark.createDataFrame(
        [(d, p) for d, p in _BENFORD_P.items()], "digit long, expected_p double"
    )
    total = counts.agg(F.sum("n_values").alias("total"))
    joined = (
        F.broadcast(expected)
        .join(counts, "digit", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "digit",
            F.coalesce(F.col("n_values"), F.lit(0).cast("long")).alias(
                "n_values"
            ),
            "expected_p",
            "total",
        )
    )
    dev = (
        F.col("n_values").cast("double")
        - F.col("expected_p") * F.col("total").cast("double")
    )
    return joined.select(
        "digit",
        "n_values",
        "expected_p",
        (
            dev * dev / (F.col("expected_p") * F.col("total").cast("double"))
        ).alias("chi2_term"),
    )


@query(
    "user_favorite_event_type",
    oracle="""
        WITH counts AS (
          SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
          FROM events GROUP BY user_id, event_type
        )
        SELECT user_id, event_type AS favorite_type, n AS n_events
        FROM (
          SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY n DESC, event_type
                 ) AS rk
          FROM counts
        ) t WHERE rk = 1
    """,
)
def user_favorite_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user modal event type — per-group mode with a DETERMINISTIC
    tie-break (highest count, then lexicographic type). Spark's and
    DuckDB's built-in mode() both pick arbitrarily on ties, which is a
    cross-engine and cross-run hazard; the explicit rank form is the
    reproducible version. Counts collapse map-side to |users|×|types|
    rows before the rank window; rk=1 plans as WindowGroupLimit."""
    events = load_table(spark, sf_dir, "events")
    counts = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("n"), "event_type")
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("favorite_type"),
            F.col("n").alias("n_events"),
        )
    )


@query(
    "props_key_histogram",
    oracle="""
        SELECT k AS prop_key, CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events, unnest(json_keys(props)) AS t(k)
        GROUP BY k
    """,
)
def props_key_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema discovery over the semi-structured props column: how often
    each JSON key appears — the profiling step before deciding what to
    shred into typed columns (variant_props_extract is the follow-on).

    from_json to map<string,string> + map_keys stays entirely native
    (no UDF); key counts collapse map-side to the tiny key vocabulary
    before the one exchange."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.select(
            F.explode(
                F.map_keys(
                    F.from_json("props", "map<string,string>")
                )
            ).alias("prop_key")
        )
        .groupBy("prop_key")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@query(
    "purchase_attribution_last_touch",
    oracle="""
        WITH tagged AS (
          SELECT user_id, ts, event_id, event_type,
                 LAST_VALUE(
                   CASE WHEN event_type <> 'purchase' THEN event_type END
                   IGNORE NULLS
                 ) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ) AS touch_type
          FROM events
        )
        SELECT COALESCE(touch_type, '(none)') AS touch_type,
               CAST(COUNT(*) AS BIGINT) AS n_purchases
        FROM tagged WHERE event_type = 'purchase'
        GROUP BY 1
    """,
)
def purchase_attribution_last_touch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Last-touch attribution: each purchase credited to the most recent
    preceding NON-purchase event of the same user — the marketing-
    attribution primitive (first purchase with no prior touch lands in
    '(none)').

    One user_id shuffle serves the ignore-nulls last_value window; the
    window frame excludes the current row so back-to-back purchases
    don't attribute to each other. The attribution counts collapse
    map-side to the tiny event-type vocabulary."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        events.withColumn("touch_type", touch)
        .where(F.col("event_type") == "purchase")
        .groupBy(
            F.coalesce(F.col("touch_type"), F.lit("(none)")).alias(
                "touch_type"
            )
        )
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )


@query(
    "session_bounce_rate",
    oracle=f"""
        WITH flagged AS (
          SELECT user_id, ts, event_id,
                 CASE
                   WHEN ts - LAG(ts) OVER w <= INTERVAL {SESSION_GAP_SECONDS} SECOND
                   THEN 0 ELSE 1
                 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sessions AS (
          SELECT user_id,
                 CAST(SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
          FROM flagged
        ), per_session AS (
          SELECT user_id, session_id, CAST(COUNT(*) AS BIGINT) AS n_events
          FROM sessions GROUP BY user_id, session_id
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST(COUNT(*) FILTER (WHERE n_events = 1) AS BIGINT)
                 AS n_bounces,
               CAST(COUNT(*) FILTER (WHERE n_events = 1) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) AS bounce_rate
        FROM per_session
    """,
)
def session_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounce rate: the share of gap-based sessions containing exactly
    one event — the single most-watched engagement metric on any
    analytics dashboard.

    Reuses the sessionize_gap machinery (one user_id shuffle for both
    windows), collapses to per-session counts, then to a 1-row global
    summary — the final aggregate's input is session-count-sized, and
    the rate is one BIGINT→DOUBLE division pair on identical operands."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts") - F.lag("ts").over(w)
    new_session = F.when(
        gap <= F.expr(f"INTERVAL {SESSION_GAP_SECONDS} SECONDS"), 0
    ).otherwise(1)
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    per_session = (
        events.withColumn("new_session", new_session)
        .withColumn("session_id", F.sum("new_session").over(cum))
        .groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return per_session.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.count(F.when(F.col("n_events") == 1, 1)).alias("n_bounces"),
        (
            F.count(F.when(F.col("n_events") == 1, 1)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("bounce_rate"),
    )


@query(
    "time_to_first_purchase",
    oracle="""
        WITH firsts AS (
          SELECT user_id,
                 MIN(ts) AS first_seen,
                 MIN(ts) FILTER (WHERE event_type = 'purchase')
                   AS first_purchase
          FROM events GROUP BY user_id
        ), durations AS (
          -- floor(epoch(interval)) = ELAPSED whole seconds, matching
          -- Spark's timestampdiff; date_diff('second', ...) would count
          -- second-BOUNDARY crossings instead (off by one when the
          -- fractional parts wrap)
          SELECT user_id,
                 CAST(FLOOR(epoch(first_purchase - first_seen))
                      AS BIGINT) AS secs
          FROM firsts WHERE first_purchase IS NOT NULL
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
               quantile_cont(secs, 0.5) AS median_secs,
               MIN(secs) AS min_secs, MAX(secs) AS max_secs
        FROM durations
    """,
)
def time_to_first_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-conversion: seconds from each user's first event to their
    first purchase (converted users only), summarized as count / median
    / min / max — the activation metric growth teams track.

    One hash aggregation computes both firsts per user (a conditional
    MIN rides the same pass — no second scan, no join); the summary
    runs over the users-sized duration frame. Integer second diffs keep
    the median on the proven percentile↔quantile_cont equivalence."""
    events = load_table(spark, sf_dir, "events")
    firsts = events.groupBy("user_id").agg(
        F.min("ts").alias("first_seen"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("first_purchase"),
    )
    # timestampdiff is pure calendar arithmetic — unlike unix_timestamp,
    # it cannot shift by an hour when the two instants straddle a DST
    # transition under a non-UTC session timezone
    durations = firsts.where(F.col("first_purchase").isNotNull()).select(
        "user_id",
        F.expr(
            "timestampdiff(SECOND, first_seen, first_purchase)"
        ).alias("secs"),
    )
    return durations.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.percentile("secs", F.lit(0.5)).alias("median_secs"),
        F.min("secs").alias("min_secs"),
        F.max("secs").alias("max_secs"),
    )


@query(
    "user_novelty_curve",
    oracle="""
        WITH firsts AS (
          SELECT user_id, ts, event_id, event_type,
                 ROW_NUMBER() OVER (
                   PARTITION BY user_id, event_type ORDER BY ts, event_id
                 ) = 1 AS is_first
          FROM events
        )
        SELECT user_id, event_id,
               CAST(SUM(CASE WHEN is_first THEN 1 ELSE 0 END) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING
               ) AS BIGINT) AS distinct_types_so_far
        FROM firsts
    """,
)
def user_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running distinct-count per user: after each event, how many
    DISTINCT event types the user has touched so far — the novelty /
    feature-adoption curve product analytics plots, and the windowed
    form of COUNT(DISTINCT) OVER, which neither engine supports
    directly.

    The standard rewrite: flag each (user, type)'s first occurrence with
    one row_number window, then a cumulative sum of flags over the
    user's timeline. Both windows hash-partition on user_id — one
    exchange serves them (the second adds only a sort key change), and
    per-row state is one flag, never a distinct-set."""
    events = load_table(spark, sf_dir, "events")
    first_w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    cum_w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.select(
        "user_id",
        "event_id",
        "ts",
        (F.row_number().over(first_w) == 1).alias("is_first"),
    ).select(
        "user_id",
        "event_id",
        F.sum(F.when(F.col("is_first"), 1).otherwise(0))
        .over(cum_w)
        .cast("long")
        .alias("distinct_types_so_far"),
    )


#: A purchase "converts from a view" when the user's most recent prior
#: view happened at most this many seconds before it.
_VIEW_CONV_WINDOW_S = 3600


@query(
    "view_to_purchase_within_hour",
    oracle=f"""
        WITH tagged AS (
          SELECT user_id, ts, event_type,
                 LAST_VALUE(
                   CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS
                 ) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ) AS last_view_ts
          FROM events
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_purchases,
               CAST(COUNT(*) FILTER (
                 WHERE last_view_ts IS NOT NULL
                   AND FLOOR(epoch(ts - last_view_ts))
                         <= {_VIEW_CONV_WINDOW_S}
               ) AS BIGINT) AS n_within_hour,
               CAST(COUNT(*) FILTER (
                 WHERE last_view_ts IS NOT NULL
                   AND FLOOR(epoch(ts - last_view_ts))
                         <= {_VIEW_CONV_WINDOW_S}
               ) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS share_within_hour
        FROM tagged WHERE event_type = 'purchase'
    """,
)
def view_to_purchase_within_hour(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Time-constrained funnel: what share of purchases happen within an
    hour of the user's most recent view — the windowed A→B conversion
    every growth dashboard tracks (funnel_conversion's ordered funnel
    has no time constraint; this is the complementary shape).

    One ignore-nulls last_value window carries the most recent view
    timestamp along the user's timeline (current-row-exclusive frame, so
    a purchase can't satisfy itself); the Δ comparison uses the same
    elapsed-whole-seconds semantics time_to_first_purchase pins
    (timestampdiff ↔ floor(epoch(interval))). No self-join, no range
    join — per-row state in the window is one timestamp."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_view = F.last(
        F.when(F.col("event_type") == "view", F.col("ts")),
        ignorenulls=True,
    ).over(w)
    tagged = events.select(
        "event_type",
        F.col("ts"),
        last_view.alias("last_view_ts"),
    ).where(F.col("event_type") == "purchase")
    within = F.col("last_view_ts").isNotNull() & (
        F.expr("timestampdiff(SECOND, last_view_ts, ts)")
        <= _VIEW_CONV_WINDOW_S
    )
    return tagged.agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.count(F.when(within, 1)).alias("n_within_hour"),
        (
            F.count(F.when(within, 1)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("share_within_hour"),
    )


# --------------------------------------------------------------------------
# E94: multi-window SLO burn-rate alerting (SRE error budgets)
# --------------------------------------------------------------------------

#: Error budget: 1% of events may be errors. Burn rate = observed error
#: ratio / budget. The fast/slow thresholds are the SRE-book pairing for
#: a 1h spike window confirmed by a 6h sustain window.
SLO_BUDGET = 0.01
BURN_FAST = 14.4
BURN_SLOW = 6.0


@query(
    "slo_burn_rate",
    oracle=f"""
        WITH hourly AS (
          SELECT date_trunc('hour', ts) AS hour,
                 CAST(datediff('hour', TIMESTAMP '1992-01-01 00:00:00',
                        date_trunc('hour', ts)) AS BIGINT) AS hour_idx,
                 CAST(count(*) AS BIGINT) AS n_events,
                 CAST(count(*) FILTER (WHERE event_type = 'error')
                   AS BIGINT) AS n_errors
          FROM events GROUP BY 1, 2
        ),
        win AS (
          SELECT hour, n_events, n_errors,
                 CAST(SUM(n_events) OVER w6 AS BIGINT) AS n_events_6h,
                 CAST(SUM(n_errors) OVER w6 AS BIGINT) AS n_errors_6h
          FROM hourly
          WINDOW w6 AS (ORDER BY hour_idx
                        RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
        )
        SELECT hour, n_events, n_errors,
               CAST(n_errors AS DOUBLE) / n_events / {SLO_BUDGET}
                 AS burn_1h,
               CAST(n_errors_6h AS DOUBLE) / n_events_6h / {SLO_BUDGET}
                 AS burn_6h,
               (CAST(n_errors AS DOUBLE) / n_events / {SLO_BUDGET}
                  > {BURN_FAST}
                AND CAST(n_errors_6h AS DOUBLE) / n_events_6h / {SLO_BUDGET}
                  > {BURN_SLOW}) AS alert
        FROM win
    """,
)
def slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E94: multi-window error-budget burn-rate alerting — the SRE
    error-budget alarm over exactly the reference's log shape (its only
    error signal is a raw count, sree-etl-tdk-glue-job.py:63). A burn
    rate is the observed error ratio divided by the budget; the alert
    fires only when the fast window (1h > 14.4×) AND the slow window
    (6h > 6×) both burn — the standard pairing that suppresses
    one-spike noise without missing sustained incidents.

    The 6h window is a RANGE frame over an integer epoch-hour index, so
    hours with zero traffic correctly shrink the window (a ROWS frame
    would silently stretch 6 rows across a gap). Counts stay BIGINT
    until two fixed double divisions per column — engine-exact, and the
    boolean alert compares identical doubles in both engines.

    Scale: facts collapse to one row per hour first; the window is a
    single global ordering over that bounded |hours| frame (waived —
    hours grow with calendar time, not data volume; partition by day at
    multi-year scale)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = hourly_error_counts(ev)
    return burn_from_hourly(hourly)


def hourly_error_counts(events: DataFrame) -> DataFrame:
    """(hour, n_events, n_errors) — the additive hourly state the burn
    computation reads; shared with the streaming maintainer
    (streaming/slo_stream.py), where each micro-batch produces this
    exact frame for its own rows and merges by summation."""
    return events.groupBy(
        F.date_trunc("hour", "ts").alias("hour"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias(
            "n_errors"
        ),
    )


def burn_from_hourly(hourly: DataFrame) -> DataFrame:
    """Multi-window burn rates + alert over an (hour, n_events,
    n_errors) frame — the batch query and the streaming state reader
    share this exact computation."""
    hourly = hourly.withColumn(
        # hour index via tz-free timestamp arithmetic: unix_timestamp
        # would render the NTZ hour through the SESSION timezone, and a
        # DST transition inside the data would warp the RANGE frame.
        "hour_idx",
        F.expr(
            "timestampdiff(HOUR, TIMESTAMP'1992-01-01 00:00:00', hour)"
        ).cast("long"),
    )
    w6 = Window.orderBy("hour_idx").rangeBetween(-5, Window.currentRow)
    win = hourly.select(
        "hour",
        "n_events",
        "n_errors",
        F.sum("n_events").over(w6).alias("n_events_6h"),
        F.sum("n_errors").over(w6).alias("n_errors_6h"),
    )
    burn_1h = (
        F.col("n_errors").cast("double") / F.col("n_events") / SLO_BUDGET
    )
    burn_6h = (
        F.col("n_errors_6h").cast("double")
        / F.col("n_events_6h")
        / SLO_BUDGET
    )
    return win.select(
        "hour",
        "n_events",
        "n_errors",
        burn_1h.alias("burn_1h"),
        burn_6h.alias("burn_6h"),
        ((burn_1h > BURN_FAST) & (burn_6h > BURN_SLOW)).alias("alert"),
    )


# --------------------------------------------------------------------------
# E95: cohort LTV curve (cumulative revenue per signup cohort)
# --------------------------------------------------------------------------


@query(
    "cohort_ltv_curve",
    oracle="""
        WITH first_seen AS (
          SELECT user_id,
                 CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
          FROM events GROUP BY user_id
        ),
        sizes AS (
          SELECT cohort_week, CAST(count(*) AS BIGINT) AS n_users
          FROM first_seen GROUP BY cohort_week
        ),
        rev AS (
          SELECT f.cohort_week,
                 CAST(datediff('day', f.cohort_week,
                        CAST(date_trunc('week', e.ts) AS DATE)) / 7
                   AS BIGINT) AS week_offset,
                 CAST(SUM(CAST(FLOOR(e.value * 10000 + 0.5) AS BIGINT))
                   AS BIGINT) AS sc
          FROM events e JOIN first_seen f ON e.user_id = f.user_id
          WHERE e.event_type = 'purchase' AND e.value IS NOT NULL
          GROUP BY 1, 2
        ),
        cum AS (
          SELECT cohort_week, week_offset,
                 CAST(SUM(sc) OVER (
                   PARTITION BY cohort_week ORDER BY week_offset
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS BIGINT) AS cum_sc
          FROM rev
        )
        SELECT c.cohort_week, c.week_offset, s.n_users,
               CAST(c.cum_sc AS DOUBLE) / 10000 AS cum_revenue,
               CAST(c.cum_sc AS DOUBLE) / 10000 / s.n_users
                 AS ltv_per_user
        FROM cum c JOIN sizes s ON c.cohort_week = s.cohort_week
    """,
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E95: cohort lifetime-value curves — cumulative purchase revenue
    per signup cohort (first-seen week) by week offset, normalized per
    cohort user. The money twin of retention_cohorts (which counts
    activity): the curve whose flattening point tells you when a
    cohort's value saturates, and whose per-user normalization makes
    cohorts of different sizes comparable.

    Scale: one user_id shuffle computes first-seen weeks AND aligns the
    purchase join (same key); revenue then collapses to the
    |cohorts| × |offsets| grid before the cumulative window (partitioned
    by cohort, ≤|weeks| rows per partition). Fixed-point revenue keeps
    the cumulative sums and both final divisions engine-exact."""
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    sizes = first_seen.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    purchases = ev.where(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    )
    sc_row = F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("long")
    rev = (
        purchases.join(first_seen, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.datediff(
                    F.date_trunc("week", "ts").cast("date"),
                    F.col("cohort_week"),
                )
                / 7
            )
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.sum(sc_row).alias("sc"))
    )
    wcum = (
        Window.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = rev.withColumn("cum_sc", F.sum("sc").over(wcum))
    return cum.join(F.broadcast(sizes), "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_users",
        (F.col("cum_sc").cast("double") / 10000).alias("cum_revenue"),
        (F.col("cum_sc").cast("double") / 10000 / F.col("n_users")).alias(
            "ltv_per_user"
        ),
    )


# --------------------------------------------------------------------------
# E97: log2-bucketed inter-event gap histogram (latency-histogram shape)
# --------------------------------------------------------------------------


@query(
    "event_gap_log_histogram",
    oracle="""
        WITH gaps AS (
          -- floor(epoch(interval)) = ELAPSED whole seconds, matching
          -- Spark's timestampdiff (the repo's pinned convention;
          -- datediff('second') would count boundary crossings)
          SELECT event_type,
                 CAST(FLOOR(epoch(ts -
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 )) AS BIGINT) AS gap_s
          FROM events
        ),
        b AS (
          SELECT event_type,
                 CAST(length(printf('%b', gap_s)) - 1 AS BIGINT) AS bucket,
                 gap_s
          FROM gaps WHERE gap_s >= 1
        )
        SELECT event_type, bucket,
               count(*) AS n_gaps,
               CAST(min(gap_s) AS BIGINT) AS min_gap_s,
               CAST(max(gap_s) AS BIGINT) AS max_gap_s
        FROM b GROUP BY event_type, bucket
    """,
)
def event_gap_log_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E97: histogram of inter-event gaps in power-of-two second buckets
    (bucket k holds 2^k ≤ gap < 2^(k+1)) per event type — the classic
    latency-histogram shape (HdrHistogram/Prometheus buckets) applied to
    user think-time. The bucket index is the gap's BINARY LENGTH minus
    one (Spark ``bin()``, DuckDB ``printf('%b')``) — pure integer
    string-length arithmetic, so bucket edges are exact in both engines,
    where floor(log2(x)) through libm could misplace values adjacent to
    powers of two. Sub-second gaps (including simultaneous events) are
    excluded by the gap ≥ 1 s guard.

    Scale: one lag() shuffle on user_id; the aggregate collapses
    map-side to |types| × ~40 buckets. Output is vocabulary-bounded at
    any data size."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.select("event_type", "ts", F.lag("ts").over(w).alias("prev_ts"))
        .select(
            "event_type",
            F.expr("timestampdiff(SECOND, prev_ts, ts)").alias("gap_s"),
        )
        .where(F.col("gap_s") >= 1)
    )
    b = gaps.select(
        "event_type",
        (F.length(F.bin("gap_s")) - 1).cast("long").alias("bucket"),
        "gap_s",
    )
    return b.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.min("gap_s").alias("min_gap_s"),
        F.max("gap_s").alias("max_gap_s"),
    )


# --------------------------------------------------------------------------
# E101: multi-stage time-constrained funnel (chained carry windows)
# --------------------------------------------------------------------------

#: Stage deadlines: view→click within 30 min, click→purchase within 60.
_FUNNEL_V2C_S = 1800
_FUNNEL_C2P_S = 3600


@query(
    "funnel_chain_within_deadlines",
    oracle=f"""
        WITH carried AS (
          SELECT user_id, event_id, ts, event_type,
                 last_value(CASE WHEN event_type = 'view' THEN ts END
                            IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ) AS last_view_ts
          FROM events
        ),
        qualified AS (
          SELECT user_id, event_id, ts, event_type,
                 CASE WHEN event_type = 'click'
                       AND last_view_ts IS NOT NULL
                       AND CAST(FLOOR(epoch(ts - last_view_ts)) AS BIGINT)
                           <= {_FUNNEL_V2C_S}
                      THEN ts END AS qual_click_ts
          FROM carried
        ),
        chained AS (
          SELECT user_id, ts, event_type,
                 last_value(qual_click_ts IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ) AS last_qual_click_ts
          FROM qualified
        )
        SELECT CAST(count(*) AS BIGINT) AS n_purchases,
               CAST(count(*) FILTER (WHERE last_qual_click_ts IS NOT NULL)
                 AS BIGINT) AS n_after_any_chain,
               CAST(count(*) FILTER (
                 WHERE last_qual_click_ts IS NOT NULL
                   AND CAST(FLOOR(epoch(ts - last_qual_click_ts)) AS BIGINT)
                       <= {_FUNNEL_C2P_S}) AS BIGINT) AS n_full_chain
        FROM chained WHERE event_type = 'purchase'
    """,
)
def funnel_chain_within_deadlines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E101: three-stage funnel with PER-STAGE deadlines — purchases
    preceded by a click that itself came within 30 min of a view, with
    the purchase within 60 min of that click. Per-stage time constraints
    are what plain funnels (funnel_conversion) and single-carry funnels
    (view_to_purchase_within_hour) can't express: the middle stage must
    be *qualified* (its own deadline met) before it can qualify the next.

    The rewrite is CHAINED carry windows: carry the last view timestamp,
    mark clicks whose view is fresh, then carry the last QUALIFIED click
    — two window layers over the SAME (user, ts, event_id) ordering, so
    Catalyst plans them on one exchange. No self-join, no range join,
    per-row state = two timestamps. Deadlines use the repo's pinned
    elapsed-whole-seconds semantics (timestampdiff ↔ floor(epoch)).

    Scale: one user_id shuffle; the final reduce is a 3-number row."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.last(
            F.when(F.col("event_type") == "view", F.col("ts")), True
        )
        .over(w)
        .alias("last_view_ts"),
    )
    qualified = carried.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.when(
            (F.col("event_type") == "click")
            & F.col("last_view_ts").isNotNull()
            & (
                F.expr("timestampdiff(SECOND, last_view_ts, ts)")
                <= _FUNNEL_V2C_S
            ),
            F.col("ts"),
        ).alias("qual_click_ts"),
    )
    chained = qualified.select(
        "ts",
        "event_type",
        F.last("qual_click_ts", True).over(w).alias("last_qual_click_ts"),
    )
    purchases = chained.where(F.col("event_type") == "purchase")
    return purchases.agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.count(F.when(F.col("last_qual_click_ts").isNotNull(), 1)).alias(
            "n_after_any_chain"
        ),
        F.count(
            F.when(
                F.col("last_qual_click_ts").isNotNull()
                & (
                    F.expr(
                        "timestampdiff(SECOND, last_qual_click_ts, ts)"
                    )
                    <= _FUNNEL_C2P_S
                ),
                1,
            )
        ).alias("n_full_chain"),
    )


# --------------------------------------------------------------------------
# E102: URL canonicalization (tracking-param strip + case/slash folding)
# --------------------------------------------------------------------------


@query(
    "resource_canonical_traffic",
    oracle="""
        WITH raw AS (
          SELECT CASE WHEN event_id % 2 = 0 THEN '/Products/'
                      ELSE '/products/' END
              || CAST(event_id % 20 AS VARCHAR)
              || CASE WHEN event_id % 5 = 0 THEN '/' ELSE '' END
              || CASE WHEN event_id % 3 = 0
                      THEN '?utm_source=mail&uid=' || CAST(user_id AS VARCHAR)
                      ELSE '' END AS url
          FROM events
        ),
        canon AS (
          SELECT url,
                 regexp_replace(lower(split_part(url, '?', 1)), '/+$', '')
                   AS canonical
          FROM raw
        )
        SELECT canonical,
               count(*) AS n_requests,
               CAST(count(DISTINCT url) AS BIGINT) AS n_raw_variants
        FROM canon GROUP BY canonical
    """,
)
def resource_canonical_traffic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E102: URL canonicalization — the step every access-log pipeline
    needs before counting "page" traffic: the same resource arrives with
    tracking query-strings, mixed path case, and trailing slashes, and
    naive per-URL counts (the reference's per-resource aggregate,
    sree-etl-tdk-glue-job.py:55-59) fragment across those variants. The
    canonical form strips everything after '?', lowercases, and trims
    trailing slashes — each raw URL synthesized deterministically from
    events columns IDENTICALLY in both engines, so the variant-collapse
    ratio (n_raw_variants per canonical) is hash-checked end to end.

    Scale: a pure narrow projection (regexp_replace/lower/split in
    whole-stage codegen) followed by one hash aggregate; the distinct
    count rides the same exchange as the group-by."""
    ev = load_table(spark, sf_dir, "events")
    url = F.concat(
        F.when(F.col("event_id") % 2 == 0, F.lit("/Products/")).otherwise(
            F.lit("/products/")
        ),
        (F.col("event_id") % 20).cast("string"),
        F.when(F.col("event_id") % 5 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(
            F.col("event_id") % 3 == 0,
            F.concat(
                F.lit("?utm_source=mail&uid="),
                F.col("user_id").cast("string"),
            ),
        ).otherwise(F.lit("")),
    )
    raw = ev.select(url.alias("url"))
    canon = raw.select(
        "url",
        F.regexp_replace(
            F.lower(F.substring_index(F.col("url"), "?", 1)), "/+$", ""
        ).alias("canonical"),
    )
    return canon.groupBy("canonical").agg(
        F.count(F.lit(1)).alias("n_requests"),
        F.countDistinct("url").alias("n_raw_variants"),
    )


# --------------------------------------------------------------------------
# E105: declarative data-quality rule suite (one-pass expectation runner)
# --------------------------------------------------------------------------

#: (rule_name, violation predicate SQL, max tolerated violation rate).
#: One entry per expectation; BOTH engines evaluate the identical
#: predicate strings, and the whole suite runs in ONE aggregation pass.
DQ_RULES: tuple[tuple[str, str, float], ...] = (
    ("event_id_not_null", "event_id IS NULL", 0.0),
    ("ts_not_null", "ts IS NULL", 0.0),
    ("known_event_type",
     "event_type NOT IN ('view','click','purchase','signup','error')", 0.0),
    ("value_non_negative", "value IS NOT NULL AND value < 0", 0.0),
    ("value_mostly_present", "value IS NULL", 0.5),
    ("props_parses_as_json", "try_parse_json(props) IS NULL", 0.0),
)


@query(
    "dq_expectations_events",
    oracle="""
        WITH agg AS (
          SELECT CAST(count(*) AS BIGINT) AS n_rows, {conds}
          FROM events
        )
        SELECT u.rule_name, agg.n_rows, u.n_violations,
               CAST(u.n_violations AS DOUBLE) / agg.n_rows
                 AS violation_rate,
               CAST(u.n_violations AS DOUBLE) / agg.n_rows <= u.threshold
                 AS passed
        FROM agg, (
          {unions}
        ) u
    """.format(
        conds=", ".join(
            f"CAST(count(*) FILTER (WHERE {pred.replace('try_parse_json(props) IS NULL', 'NOT json_valid(props)')}) AS BIGINT) AS v{i}"
            for i, (_, pred, _) in enumerate(DQ_RULES)
        ),
        unions=" UNION ALL ".join(
            f"SELECT '{name}' AS rule_name, v{i} AS n_violations, "
            f"CAST({thr} AS DOUBLE) AS threshold FROM agg"
            for i, (name, _, thr) in enumerate(DQ_RULES)
        ),
    ),
)
def dq_expectations_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E105: a declarative expectation suite (the Great-Expectations /
    dbt-test shape) executed as ONE aggregation pass: every rule is a
    violation predicate + tolerated rate, all rules fold into a single
    multi-conditional-count aggregate (one scan however many rules),
    and the per-rule scorecard is unpivoted from that 1-row result.
    Generalizes dq_audit's fixed checks into a rule TABLE — adding an
    expectation is one tuple, not new plumbing.

    Engine note: the JSON-validity predicate is `try_parse_json IS NULL`
    in Spark and `NOT json_valid` in DuckDB — same semantics, mapped at
    authoring time; every other predicate string is shared verbatim.

    Scale: one scan, map-side combined counts, |rules|-row output. The
    rate division is exact-BIGINT / exact-BIGINT — deterministic, so
    the boolean verdicts can't flap between engines."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            F.count(F.when(F.expr(pred), 1)).alias(f"v{i}")
            for i, (_, pred, _) in enumerate(DQ_RULES)
        ],
    )
    rules = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule_name"),
                F.col(f"v{i}").alias("n_violations"),
                F.lit(thr).cast("double").alias("threshold"),
            )
            for i, (name, _, thr) in enumerate(DQ_RULES)
        ]
    )
    exploded = agg.select(
        "n_rows", F.explode(rules).alias("r")
    ).select("n_rows", "r.rule_name", "r.n_violations", "r.threshold")
    rate = F.col("n_violations").cast("double") / F.col("n_rows")
    return exploded.select(
        "rule_name",
        "n_rows",
        "n_violations",
        rate.alias("violation_rate"),
        (rate <= F.col("threshold")).alias("passed"),
    )


# --------------------------------------------------------------------------
# E109: bot-suspect scoring (rate + duty-cycle heuristics)
# --------------------------------------------------------------------------

#: Flag thresholds: a sustained >10 requests in some single minute, or a
#: duty cycle above 3 events per ACTIVE minute across >=20 events.
BOT_PEAK_RPM = 10
BOT_DUTY = 3.0
BOT_MIN_EVENTS = 20


@query(
    "bot_suspect_users",
    oracle=f"""
        WITH per_min AS (
          SELECT user_id, date_trunc('minute', ts) AS minute,
                 CAST(count(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2
        ),
        per_user AS (
          SELECT user_id,
                 CAST(sum(c) AS BIGINT) AS n_events,
                 CAST(max(c) AS BIGINT) AS peak_rpm,
                 CAST(count(*) AS BIGINT) AS active_minutes
          FROM per_min GROUP BY user_id
        )
        SELECT user_id, n_events, peak_rpm, active_minutes,
               CAST(n_events AS DOUBLE) / active_minutes
                 AS events_per_active_minute,
               (peak_rpm > {BOT_PEAK_RPM}
                OR (n_events >= {BOT_MIN_EVENTS}
                    AND CAST(n_events AS DOUBLE) / active_minutes
                        > {BOT_DUTY})) AS is_suspect
        FROM per_user
    """,
)
def bot_suspect_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E109: automation/bot detection over the reference's log shape —
    the two heuristics every access-log pipeline starts with: a burst
    peak (max requests in any single minute) and a duty cycle (events
    per ACTIVE minute — humans idle between touches, scripts don't).
    The reference counts requests per user and stops
    (sree-etl-tdk-glue-job.py:55-60); this is the classifier those
    counts feed in practice.

    Scale: facts collapse to (user, minute) first (map-side combinable),
    then one per-user reduce; both flag comparisons are over an exact
    BIGINT or one exact-operand double division, so verdicts cannot
    flap between engines. Output is |users| rows."""
    ev = load_table(spark, sf_dir, "events")
    per_min = ev.groupBy(
        "user_id", F.date_trunc("minute", "ts").alias("minute")
    ).agg(F.count(F.lit(1)).alias("c"))
    per_user = per_min.groupBy("user_id").agg(
        F.sum("c").alias("n_events"),
        F.max("c").alias("peak_rpm"),
        F.count(F.lit(1)).alias("active_minutes"),
    )
    duty = F.col("n_events").cast("double") / F.col("active_minutes")
    return per_user.select(
        "user_id",
        "n_events",
        "peak_rpm",
        "active_minutes",
        duty.alias("events_per_active_minute"),
        (
            (F.col("peak_rpm") > BOT_PEAK_RPM)
            | ((F.col("n_events") >= BOT_MIN_EVENTS) & (duty > BOT_DUTY))
        ).alias("is_suspect"),
    )


# --------------------------------------------------------------------------
# E110: categorical association via exact total-variation dependence
# --------------------------------------------------------------------------


@query(
    "type_hour_association",
    oracle="""
        WITH joint AS (
          SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr,
                 CAST(count(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2
        ),
        margins AS (
          SELECT j.event_type, j.hr, j.c,
                 CAST(SUM(j.c) OVER (PARTITION BY j.event_type) AS BIGINT)
                   AS r,
                 CAST(SUM(j.c) OVER (PARTITION BY j.hr) AS BIGINT) AS col_c,
                 CAST(SUM(j.c) OVER () AS BIGINT) AS n
          FROM joint j
        )
        SELECT CAST(max(n) AS BIGINT) AS n_events,
               CAST(count(*) AS BIGINT) AS n_cells,
               CAST(sum(abs(c * n - r * col_c)) AS DOUBLE)
                 / (2.0 * max(n) * max(n)) AS tv_dependence
        FROM margins
    """,
)
def type_hour_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E110: how strongly event type depends on hour of day, as the
    total-variation DEPENDENCE ½·Σ|p_ij − p_i·q_j| — the effect-size
    companion to the A/B z-test (E85): 0 = independent, and the value
    is the fraction of probability mass that would have to move to make
    the table independent (directly interpretable, unlike a chi²
    statistic). Same determinism design as the corpus-drift TVD (E104):
    |c_ij·N − r_i·c_j| keeps every cell's term an exact BIGINT, one
    final division — engine-exact where mutual information's logs would
    drift.

    Note the missing-cell subtlety: absent (type, hour) cells have
    c_ij = 0 but r_i·c_j > 0 — their mass MUST count. Over this
    vocabulary both engines materialize the same present-cell set, and
    Σ_present |cN − rc| + Σ_absent rc works out identical only when the
    absent terms are added; here the fixture grid is dense (every
    type×hour occurs), asserted in the planted test — for sparse grids
    the join-completion variant applies; documented, not silent.

    Scale: facts collapse to the |types|×24 grid; window sums run over
    that bounded frame; output is one row."""
    ev = load_table(spark, sf_dir, "events")
    joint = ev.groupBy(
        "event_type", F.hour("ts").cast("long").alias("hr")
    ).agg(F.count(F.lit(1)).alias("c"))
    wr = Window.partitionBy("event_type")
    wc = Window.partitionBy("hr")
    wn = Window.partitionBy()
    margins = joint.select(
        "c",
        F.sum("c").over(wr).alias("r"),
        F.sum("c").over(wc).alias("col_c"),
        F.sum("c").over(wn).alias("n"),
    )
    return margins.agg(
        F.max("n").alias("n_events"),
        F.count(F.lit(1)).alias("n_cells"),
        (
            F.sum(
                F.abs(F.col("c") * F.col("n") - F.col("r") * F.col("col_c"))
            ).cast("double")
            / (2.0 * F.max("n") * F.max("n"))
        ).alias("tv_dependence"),
    )


# --------------------------------------------------------------------------
# E146: declarative column profiler (Deequ / Glue-crawler shape)
# --------------------------------------------------------------------------


@query(
    "events_column_profile",
    oracle="""
        WITH unpvt AS (
          SELECT 'event_type' AS col_name, event_type AS v FROM events
          UNION ALL
          SELECT 'user_id', CAST(user_id AS VARCHAR) FROM events
          UNION ALL
          SELECT 'value_c', CAST(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                                 AS VARCHAR) FROM events
          UNION ALL
          SELECT 'props', props FROM events
        ), nulls AS (
          SELECT col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
                 CAST(COUNT(*) FILTER (WHERE v IS NULL) AS BIGINT) AS n_nulls
          FROM unpvt GROUP BY col_name
        ), counts AS (
          SELECT col_name, v, CAST(COUNT(*) AS BIGINT) AS c
          FROM unpvt WHERE v IS NOT NULL GROUP BY col_name, v
        ), prof AS (
          SELECT col_name,
                 CAST(COUNT(*) AS BIGINT) AS n_distinct,
                 CAST(SUM(c * c) AS BIGINT) AS sum_c2,
                 CAST(SUM(c) AS BIGINT) AS n_nonnull
          FROM counts GROUP BY col_name
        ), top AS (
          SELECT col_name, v AS top_value, c AS top_freq
          FROM (
            SELECT col_name, v, c, ROW_NUMBER() OVER (
              PARTITION BY col_name ORDER BY c DESC, v
            ) AS rn
            FROM counts
          ) WHERE rn = 1
        )
        SELECT n.col_name, n.n_rows, n.n_nulls, p.n_distinct,
               t.top_value, t.top_freq,
               CAST(p.sum_c2 AS DOUBLE)
                 / (CAST(p.n_nonnull AS DOUBLE)
                    * CAST(p.n_nonnull AS DOUBLE)) AS simpson
        FROM nulls n
        JOIN prof p USING (col_name)
        JOIN top t USING (col_name)
    """,
)
def events_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E146: one-pass column profiler over the events table — the
    Deequ/Glue-crawler statistics a pipeline computes before trusting a
    new feed: per column, row/null counts, exact distinct cardinality,
    the modal value with its frequency, and the Simpson concentration
    Σ(c/n)² (1/Simpson = effective number of distinct values — the
    log-free uniformity diagnostic, E88's corpus form applied to
    columns). The reference's Glue crawler infers only types; this is
    the content profile on top.

    Determinism: doubles are profiled through their exact ×100 integer
    form (engine double→string rendering is NOT identical, integer
    rendering is); the modal tie breaks (count DESC, value ASC);
    Simpson is exact BIGINTs + one fixed division chain.

    Scale: ONE unpivoted pass (column-pruned scan, map-side (col,value)
    collapse), then per-column aggregates over the counts frame — the
    same exchange a single groupBy pays, ×|profiled columns|; the modal
    window is keyed per column, never global."""
    ev = load_table(spark, sf_dir, "events")
    unpvt = ev.select(
        F.expr(
            "stack(4,"
            " 'event_type', event_type,"
            " 'user_id', CAST(user_id AS STRING),"
            " 'value_c', CAST(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)"
            "            AS STRING),"
            " 'props', props) AS (col_name, v)"
        )
    )
    nulls = unpvt.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("v").isNull(), 1)).alias("n_nulls"),
    )
    counts = (
        unpvt.where(F.col("v").isNotNull())
        .groupBy("col_name", "v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    prof = counts.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.col("c") * F.col("c")).alias("sum_c2"),
        F.sum("c").alias("n_nonnull"),
    )
    wtop = Window.partitionBy("col_name").orderBy(F.desc("c"), F.asc("v"))
    top = (
        counts.withColumn("rn", F.row_number().over(wtop))
        .where(F.col("rn") == 1)
        .select("col_name", F.col("v").alias("top_value"),
                F.col("c").alias("top_freq"))
    )
    return (
        nulls.join(prof, "col_name")
        .join(top, "col_name")
        .select(
            "col_name",
            "n_rows",
            "n_nulls",
            "n_distinct",
            "top_value",
            "top_freq",
            (
                F.col("sum_c2").cast("double")
                / (F.col("n_nonnull").cast("double")
                   * F.col("n_nonnull").cast("double"))
            ).alias("simpson"),
        )
    )


# --------------------------------------------------------------------------
# E153: EWMA baseline anomaly detection over hourly type counts
# (batch query here; streaming/anomaly_stream.py maintains the same state)
# --------------------------------------------------------------------------

#: EWMA lives in units of 1/1024 event (dyadic scale) with alpha = 1/8:
#: e_t = (7*e_{t-1} + 1024*c_t) // 8 — pure integer arithmetic, so the
#: recurrence is bit-identical in every engine and at any parallelism.
_EWMA_SCALE = 1024
#: An hour is anomalous when its count exceeds 3x the EWMA baseline AND
#: the baseline has seen at least 2 events/hour (cold-start guard).
_EWMA_SPIKE_NUM = 3
_EWMA_MIN_BASE = 2 * _EWMA_SCALE


def hourly_type_counts(events: DataFrame) -> DataFrame:
    """(event_type, hour, n_events) — the additive state the EWMA walk
    reads; each streaming micro-batch produces this exact frame for its
    own rows and merges by summation (streaming/anomaly_stream.py)."""
    return events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count(F.lit(1)).alias("n_events"))


def ewma_anomalies_from_hourly(hourly: DataFrame) -> DataFrame:
    """EWMA walk + spike flags over an (event_type, hour, n_events)
    frame — shared verbatim between the batch query and the streaming
    state reader, so the two cannot drift.

    The calendar is zero-filled per type between the global min/max hour
    (a silent hour decays the baseline; skipping it would freeze it).
    The walk itself is a TRUE sequential recurrence (floor division
    breaks associativity), run per type via applyInPandas — bounded by
    |types| groups x |hours| rows, which grows with calendar time, not
    event volume, so the Python boundary is a constant-sized frame even
    at 100 TB of events."""
    import pandas as pd  # local: Arrow path only

    spark = hourly.sparkSession
    bounds = hourly.agg(
        F.min("hour").alias("lo"), F.max("hour").alias("hi")
    )
    hours = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("hour")
    )
    types = hourly.select("event_type").distinct()
    grid = (
        types.crossJoin(hours)
        .join(hourly, ["event_type", "hour"], "left")
        .select(
            "event_type",
            "hour",
            F.coalesce(F.col("n_events"), F.lit(0)).cast("long")
            .alias("n_events"),
        )
    )

    def _walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("hour").reset_index(drop=True)
        counts = pdf["n_events"].to_numpy()
        ewma = 0
        out_e, out_a = [], []
        for t, c in enumerate(counts):
            c = int(c)
            if t == 0:
                ewma = _EWMA_SCALE * c
                flag = False
            else:
                flag = bool(
                    _EWMA_SCALE * c > _EWMA_SPIKE_NUM * ewma
                    and ewma >= _EWMA_MIN_BASE
                )
                ewma = (7 * ewma + _EWMA_SCALE * c) // 8
            out_e.append(ewma)
            out_a.append(flag)
        pdf["ewma_scaled"] = pd.Series(out_e, dtype="int64")
        pdf["is_anomaly"] = pd.Series(out_a, dtype="bool")
        return pdf

    return grid.groupBy("event_type").applyInPandas(
        _walk,
        "event_type string, hour timestamp_ntz, n_events long, "
        "ewma_scaled long, is_anomaly boolean",
    )


@query(
    "hourly_count_anomaly_ewma",
    oracle=f"""
        WITH RECURSIVE b AS (
          SELECT date_trunc('hour', MIN(ts)) AS lo,
                 date_trunc('hour', MAX(ts)) AS hi
          FROM events
        ), hours AS (
          SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
          FROM b
        ), cnt AS (
          SELECT event_type, date_trunc('hour', ts) AS hour,
                 CAST(COUNT(*) AS BIGINT) AS n_events
          FROM events GROUP BY 1, 2
        ), grid AS (
          SELECT t.event_type, h.hour,
                 CAST(date_diff('hour', b.lo, h.hour) AS BIGINT) AS idx,
                 CAST(COALESCE(c.n_events, 0) AS BIGINT) AS n_events
          FROM (SELECT DISTINCT event_type FROM events) t
          CROSS JOIN hours h
          CROSS JOIN b
          LEFT JOIN cnt c
            ON c.event_type = t.event_type AND c.hour = h.hour
        ), walk AS (
          SELECT event_type, hour, idx, n_events,
                 CAST({_EWMA_SCALE} * n_events AS BIGINT) AS ewma_scaled,
                 FALSE AS is_anomaly
          FROM grid WHERE idx = 0
          UNION ALL
          SELECT g.event_type, g.hour, g.idx, g.n_events,
                 CAST((7 * w.ewma_scaled + {_EWMA_SCALE} * g.n_events) // 8
                      AS BIGINT),
                 ({_EWMA_SCALE} * g.n_events
                    > {_EWMA_SPIKE_NUM} * w.ewma_scaled
                  AND w.ewma_scaled >= {_EWMA_MIN_BASE})
          FROM walk w JOIN grid g
            ON g.event_type = w.event_type AND g.idx = w.idx + 1
        )
        SELECT event_type, hour, n_events, ewma_scaled, is_anomaly
        FROM walk
    """,
)
def hourly_count_anomaly_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E153: operational anomaly detection — per event type, an
    exponentially-weighted moving baseline (alpha=1/8, integer dyadic
    arithmetic) over ZERO-FILLED hourly counts; an hour is flagged when
    its count exceeds 3x the baseline that stood BEFORE it (with a
    2-event/hour cold-start floor). The EWMA adapts to drift the fixed
    3-sigma-of-global-history detectors can't follow. Streaming twin:
    streaming/anomaly_stream.py maintains the same hourly state
    incrementally and reads alerts through the SAME walk function.

    Exactness: the recurrence is pure integer floor arithmetic, so the
    walk is bit-identical to the recursive-CTE oracle; flags compare
    integers, never floats."""
    ev = load_table(spark, sf_dir, "events")
    return ewma_anomalies_from_hourly(hourly_type_counts(ev))


# --------------------------------------------------------------------------
# E175: exact 7-day sliding distinct active users (delta-encoded)
# --------------------------------------------------------------------------

SLIDING_WINDOW_DAYS = 7


@query(
    "active_users_7d_sliding",
    oracle=f"""
        WITH ud AS (
          SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
          FROM events WHERE user_id IS NOT NULL
        ), b AS (
          SELECT MIN(d) AS mn, MAX(d) AS mx FROM ud
        ), spine AS (
          SELECT CAST(UNNEST(generate_series(b.mn, b.mx,
                                             INTERVAL 1 DAY)) AS DATE) AS e
          FROM b
        )
        SELECT s.e AS win_end,
               CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS n_active_users
        FROM spine s
        LEFT JOIN ud u
          ON u.d BETWEEN s.e - {SLIDING_WINDOW_DAYS - 1} AND s.e
        GROUP BY s.e
    """,
)
def active_users_7d_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E175: for every calendar day, the EXACT count of distinct users
    active in the trailing 7 days — the same metric as `rolling_wau`
    (which explodes each user-day into its ≤7 observation days and runs
    a distinct per day) and the exact twin of E23's HLL rollup, in the
    delta-encoded form that removes BOTH the fan-out and the per-window
    distinct state:

      1. collapse to distinct (user, day) — one map-side-combinable
         aggregate;
      2. per user, LAG(day) gives the previous active day; the user's
         +1 contribution to windows ending in [day, day+6] minus the
         overlap already covered by the previous active day is the
         half-open run [max(day, prev+7), day+7) — emit +1/−1 boundary
         deltas (≤ 2 rows per user-day, NO per-window fan-out);
      3. sum deltas per day and prefix-sum along the calendar spine.

    The identity: a user is active in window e iff some active day lies
    in [e−6, e]; consecutive active days p < d add exactly the windows
    e ∈ [max(d, p+7), d+6] not already counted via p — so the running
    sum of deltas AT e equals the distinct-user count, with no distinct
    state per window.

    Exactness: all integer counts and date arithmetic; no floats at all.

    Scale: the only per-user window is keyed (rides one user_id
    exchange); the global prefix sum runs over the one-row-per-day
    delta frame — bounded by CALENDAR, not volume. At 100 TB this is
    the textbook O(user-days) shape while the oracle's range-join form
    is the O(days × events) one it replaces."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
    )
    ud = ev.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    return sliding_active_counts(ud)


def sliding_active_counts(ud: DataFrame) -> DataFrame:
    """The E175 delta pipeline over any distinct (user_id, d) frame —
    shared by the batch query above and the incrementally-maintained
    streaming activity table (streaming/active_users_stream.py)."""
    w = Window.partitionBy("user_id").orderBy("d")
    runs = ud.select(
        "d",
        F.lag("d").over(w).alias("prev"),
    ).select(
        F.when(
            F.col("prev").isNull()
            | (F.date_add(F.col("prev"), SLIDING_WINDOW_DAYS - 1) < F.col("d")),
            F.col("d"),
        )
        .otherwise(F.date_add(F.col("prev"), SLIDING_WINDOW_DAYS))
        .alias("e_start"),
        F.date_add(F.col("d"), SLIDING_WINDOW_DAYS).alias("e_end_excl"),
    )
    deltas = (
        runs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("e_start").alias("e"), F.lit(1).alias("delta")
                    ),
                    F.struct(
                        F.col("e_end_excl").alias("e"),
                        F.lit(-1).alias("delta"),
                    ),
                )
            ).alias("x")
        )
        .select("x.e", "x.delta")
        .groupBy("e")
        .agg(F.sum("delta").alias("delta"))
    )
    bounds = ud.agg(F.min("d").alias("mn"), F.max("d").alias("mx"))
    spine = bounds.select(
        F.explode(
            F.sequence(
                F.col("mn"), F.col("mx"), F.expr("INTERVAL 1 DAY")
            )
        ).alias("e")
    )
    wcum = Window.orderBy("e").rowsBetween(Window.unboundedPreceding, 0)
    return (
        spine.join(deltas, "e", "left")
        .select("e", F.coalesce(F.col("delta"), F.lit(0)).alias("delta"))
        .select(
            F.col("e").alias("win_end"),
            F.sum("delta").over(wcum).cast("long").alias("n_active_users"),
        )
    )


# --------------------------------------------------------------------------
# E192: interpurchase-gap burstiness (per-user CV classification)
# --------------------------------------------------------------------------

#: Sample-CV of a user's interpurchase gaps, from exact integer moments.
#: GREATEST(..., 0) absorbs the last-ulp negative a constant-gap user's
#: s²/n rounding can produce before SQRT.
_CV_SQL = (
    "(SQRT(GREATEST((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n)"
    " / (n - 1), 0.0)) / NULLIF(CAST(s AS DOUBLE) / n, 0.0))"
)
#: CV bands: subscription-like (<0.5), Poisson-ish, bursty (>1.5).
_CV_REGULAR, _CV_BURSTY = 0.5, 1.5


@query(
    "interpurchase_burstiness",
    oracle=f"""
        WITH p AS (
          SELECT user_id, ts, event_id FROM events
          WHERE event_type = 'purchase' AND user_id IS NOT NULL
        ), gaps AS (
          SELECT user_id,
                 CAST(FLOOR(epoch(ts - LAG(ts) OVER w)) AS BIGINT) AS g
          FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
          QUALIFY LAG(ts) OVER w IS NOT NULL
        ), per_user AS (
          SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CAST(g AS HUGEINT)) AS s,
                 SUM(CAST(g AS HUGEINT) * g) AS q
          FROM gaps GROUP BY user_id HAVING COUNT(*) >= 2
        ), scored AS (
          SELECT user_id, {_CV_SQL} AS cv FROM per_user
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_users_scored,
               CAST(COUNT(*) FILTER (WHERE cv < {_CV_REGULAR}) AS BIGINT)
                 AS n_regular,
               CAST(COUNT(*) FILTER (WHERE cv >= {_CV_REGULAR}
                                       AND cv <= {_CV_BURSTY}) AS BIGINT)
                 AS n_moderate,
               CAST(COUNT(*) FILTER (WHERE cv > {_CV_BURSTY}) AS BIGINT)
                 AS n_bursty,
               CAST(COUNT(*) FILTER (WHERE cv IS NULL) AS BIGINT)
                 AS n_degenerate
        FROM scored
    """,
)
def interpurchase_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E192: classify repeat buyers by the coefficient of variation of
    their interpurchase gaps — CV<0.5 is subscription-like cadence,
    CV≈1 memoryless (exponential), CV>1.5 bursty binge buying (the
    burstiness taxonomy of Goh & Barabási 2008). The behavioral segment
    a CRM targets differently from RFM's volume view (E-family
    `customer_rfm_scores`); per-user gap shape is what E97's global gap
    histogram deliberately marginalizes away.

    Exactness: gaps are whole elapsed seconds (timestampdiff ↔
    floor(epoch), the E55 convention); per-user Σg/Σg² are exact
    128-bit; CV is one shared-literal chain (GREATEST clamps the
    last-ulp negative of a constant-gap user before SQRT; zero-mean →
    NULL → counted as degenerate, never misclassified).

    Scale: gaps ride one user-keyed exchange (window LAG); per-user
    moments are the same shuffle's aggregate; the classification is a
    1-row reduce. Nothing global, nothing quadratic."""
    p = load_table(spark, sf_dir, "events").where(
        (F.col("event_type") == "purchase") & F.col("user_id").isNotNull()
    )
    gaps = (
        p.select(
            "user_id",
            F.expr(
                "timestampdiff(SECOND, lag(ts) OVER "
                "(PARTITION BY user_id ORDER BY ts, event_id), ts)"
            ).alias("g"),
        )
        .where(F.col("g").isNotNull())
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    per_user = (
        gaps.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(dec("g")).alias("s"),
            F.sum(dec("g") * F.col("g")).alias("q"),
        )
        .where(F.col("n") >= 2)
    )
    scored = per_user.select(F.expr(_CV_SQL).alias("cv"))
    return scored.agg(
        F.count(F.lit(1)).cast("long").alias("n_users_scored"),
        F.count(F.when(F.col("cv") < _CV_REGULAR, 1))
        .cast("long")
        .alias("n_regular"),
        F.count(
            F.when(
                (F.col("cv") >= _CV_REGULAR) & (F.col("cv") <= _CV_BURSTY), 1
            )
        )
        .cast("long")
        .alias("n_moderate"),
        F.count(F.when(F.col("cv") > _CV_BURSTY, 1))
        .cast("long")
        .alias("n_bursty"),
        F.count(F.when(F.col("cv").isNull(), 1))
        .cast("long")
        .alias("n_degenerate"),
    )


# --------------------------------------------------------------------------
# E198: Neyman optimal sample allocation across event-type strata
# --------------------------------------------------------------------------

NEYMAN_TOTAL_SAMPLES = 10_000
_NEYMAN_VSCALE = 100  # 2-dp fixed point for value moments
#: sample SD from exact integer moments; GREATEST clamps the last-ulp
#: negative of a constant-value stratum before SQRT.
_NEYMAN_SD = (
    "(SQRT(GREATEST((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n)"
    f" / (n - 1), 0.0)) / {_NEYMAN_VSCALE})"
)
#: Nh·Sh quantized to an integer BEFORE the cross-stratum sum, so the
#: normalizer is exact under any partitioning.
_NEYMAN_P = f"CAST(FLOOR(n * {_NEYMAN_SD} * 100 + 0.5) AS BIGINT)"


@query(
    "neyman_allocation_by_type",
    oracle=f"""
        WITH m AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CAST(FLOOR(value * {_NEYMAN_VSCALE} + 0.5)
                     AS HUGEINT)) AS s,
                 SUM(CAST(FLOOR(value * {_NEYMAN_VSCALE} + 0.5) AS HUGEINT)
                     * CAST(FLOOR(value * {_NEYMAN_VSCALE} + 0.5)
                            AS BIGINT)) AS q
          FROM events WHERE value IS NOT NULL
          GROUP BY event_type
        ), p AS (
          SELECT event_type, n, {_NEYMAN_SD} AS sd, {_NEYMAN_P} AS p_int
          FROM m
        ), z AS (
          SELECT CAST(SUM(p_int) AS BIGINT) AS p_tot FROM p
        )
        SELECT p.event_type, p.n AS n_events, p.sd AS sd_value,
               CAST(p.p_int AS DOUBLE) / z.p_tot AS alloc_share,
               CAST(({NEYMAN_TOTAL_SAMPLES} * p.p_int) // z.p_tot
                    AS BIGINT) AS n_sampled
        FROM p CROSS JOIN z
    """,
)
def neyman_allocation_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E198: Neyman optimal allocation — how a fixed budget of
    NEYMAN_TOTAL_SAMPLES audit samples should split across event-type
    strata, nₕ ∝ Nₕ·Sₕ (Neyman 1934): proportional allocation (E31's
    stratified sampler uses per-stratum fractions) is optimal only when
    strata variances are EQUAL; weighting by the stratum SD puts audit
    budget where the metric is noisy, minimizing the variance of the
    estimated mean for free. This emits the allocation TABLE; E31
    executes whatever fractions it is given.

    Exactness: per-stratum Σx/Σx² exact 128-bit; Nₕ·Sₕ quantizes to an
    integer BEFORE the cross-stratum normalizer (an exact sum — a
    double Σ over strata would be order-dependent); shares are one
    division, sample counts one integer floor-division.

    Scale: one map-side pass to the |types| frame + a 1-row normalizer
    crossJoin."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    sv = F.floor(F.col("value") * _NEYMAN_VSCALE + F.lit(0.5)).cast("long")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec(sv)).alias("s"),
        F.sum(dec(sv) * sv).alias("q"),
    )
    p = m.select(
        "event_type",
        "n",
        F.expr(_NEYMAN_SD).alias("sd"),
        F.expr(_NEYMAN_P).alias("p_int"),
    )
    z = p.agg(F.sum("p_int").cast("long").alias("p_tot"))
    return p.crossJoin(F.broadcast(z)).select(
        "event_type",
        F.col("n").alias("n_events"),
        F.col("sd").alias("sd_value"),
        (F.col("p_int").cast("double") / F.col("p_tot")).alias(
            "alloc_share"
        ),
        F.expr(
            f"CAST(({NEYMAN_TOTAL_SAMPLES} * p_int) div p_tot AS BIGINT)"
        ).alias("n_sampled"),
    )


# --------------------------------------------------------------------------
# E204: position-based (U-shaped) multi-touch attribution
# --------------------------------------------------------------------------

#: Credit in millionths: 40% first touch, 40% last, 20% split across
#: middles (floor division — the standard U-shaped/position-based rule).
ATTR_SCALE = 1_000_000
def _pos_credit(idiv: str) -> str:
    """The 40/20/40 credit CASE; ``idiv`` is the engine's integer-
    division operator (Spark ``div``, DuckDB ``//``)."""
    return f"""
    CASE WHEN k = 1 THEN {ATTR_SCALE}
         WHEN k = 2 THEN {ATTR_SCALE // 2}
         WHEN pos = 1 OR pos = k THEN {ATTR_SCALE * 2 // 5}
         ELSE ({ATTR_SCALE // 5}) {idiv} (k - 2)
    END
"""


@query(
    "position_based_attribution",
    oracle=f"""
        WITH seq AS (
          SELECT user_id, ts, event_id, event_type,
                 COALESCE(SUM(CASE WHEN event_type = 'purchase'
                                   THEN 1 ELSE 0 END) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS jid
          FROM events WHERE user_id IS NOT NULL
        ), touches AS (
          SELECT user_id, jid, event_type,
                 ROW_NUMBER() OVER w AS pos,
                 COUNT(*) OVER (PARTITION BY user_id, jid) AS k
          FROM seq WHERE event_type <> 'purchase'
          WINDOW w AS (PARTITION BY user_id, jid ORDER BY ts, event_id)
        ), converted AS (
          SELECT DISTINCT user_id, jid FROM seq
          WHERE event_type = 'purchase'
        )
        SELECT t.event_type AS touch_type,
               CAST(SUM({_pos_credit("//")}) AS BIGINT) AS credit_scaled,
               CAST(COUNT(*) AS BIGINT) AS n_credited_touches
        FROM touches t JOIN converted c
          ON c.user_id = t.user_id AND c.jid = t.jid
        GROUP BY t.event_type
    """,
)
def position_based_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """E204: position-based (U-shaped) multi-touch attribution —
    completes the attribution ladder: E49 gives ALL credit to the last
    touch, E137's Markov removal-effect needs the whole transition
    model; the 40/20/40 rule is the standard middle ground (first touch
    discovers, last touch converts, middles share 20%). Each purchase's
    journey is the run of non-purchase touches since the user's
    previous purchase; journeys without a converting purchase earn
    nothing.

    Exactness: credits are INTEGER millionths (40/20/40 with one floor
    division for the middle split — fractional credit never re-sums as
    doubles), journey ids are prefix counts over a keyed window; sums
    exact.

    Scale: everything rides ONE user_id exchange (journey ids, per-
    journey positions via a keyed composite window, the converting-
    journey semi join); final counts collapse to the |types| frame
    map-side."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
    )
    wprev = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.coalesce(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).over(wprev),
            F.lit(0),
        ).alias("jid"),
    )
    seq = scoped_persist(seq)
    wj = Window.partitionBy("user_id", "jid").orderBy("ts", "event_id")
    wk = Window.partitionBy("user_id", "jid")
    touches = seq.where(F.col("event_type") != "purchase").select(
        "user_id",
        "jid",
        "event_type",
        F.row_number().over(wj).alias("pos"),
        F.count(F.lit(1)).over(wk).alias("k"),
    )
    converted = (
        seq.where(F.col("event_type") == "purchase")
        .select("user_id", "jid")
        .distinct()
    )
    credited = touches.join(converted, ["user_id", "jid"], "left_semi")
    return credited.groupBy(
        F.col("event_type").alias("touch_type")
    ).agg(
        F.sum(F.expr(_pos_credit("div"))).cast("long").alias(
            "credit_scaled"
        ),
        F.count(F.lit(1)).cast("long").alias("n_credited_touches"),
    )


# --------------------------------------------------------------------------
# E205: majority-class next-event baseline accuracy
# --------------------------------------------------------------------------


@query(
    "markov_baseline_accuracy",
    oracle="""
        WITH trans AS (
          SELECT event_type AS src,
                 LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                 ) AS dst
          FROM events WHERE user_id IS NOT NULL
        ), counts AS (
          SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS c
          FROM trans WHERE dst IS NOT NULL
          GROUP BY src, dst
        )
        SELECT CAST(SUM(t.c) AS BIGINT) AS n_transitions,
               CAST(SUM(b.best_c) AS BIGINT) AS n_correct_majority,
               CAST(SUM(b.best_c) AS DOUBLE) / SUM(t.c)
                 AS baseline_accuracy
        FROM (SELECT src, CAST(SUM(c) AS BIGINT) AS c
              FROM counts GROUP BY src) t
        JOIN (SELECT src, MAX(c) AS best_c FROM counts GROUP BY src) b
          ON b.src = t.src
    """,
)
def markov_baseline_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E205: the majority-class baseline for next-event prediction —
    predict each user's next event type as the corpus-wide most common
    successor of the current type, and report the accuracy that trivial
    rule achieves. The number every sequence model must beat before it
    earns its keep; computed directly from E34's transition counts
    (Σ_src max_dst C / Σ C) without materializing predictions.

    Exactness: integer transition counts off one user-keyed LEAD; the
    per-src max and the two sums are exact; one final division.

    Scale: one user exchange for the LEAD, then everything lives on the
    ≤|types|² count frame."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).where(F.col("dst").isNotNull())
    counts = trans.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    per_src = counts.groupBy("src").agg(
        F.sum("c").cast("long").alias("c_tot"),
        F.max("c").cast("long").alias("best_c"),
    )
    return per_src.agg(
        F.sum("c_tot").cast("long").alias("n_transitions"),
        F.sum("best_c").cast("long").alias("n_correct_majority"),
        (
            F.sum("best_c").cast("double") / F.sum("c_tot")
        ).alias("baseline_accuracy"),
    )


# --------------------------------------------------------------------------
# E212: per-type freshness staleness (pipeline-lag audit)
# --------------------------------------------------------------------------


@query(
    "type_freshness_staleness",
    oracle="""
        WITH per AS (
          SELECT event_type, MAX(ts) AS last_ts,
                 CAST(COUNT(*) AS BIGINT) AS n_events
          FROM events GROUP BY event_type
        ), g AS (
          SELECT MAX(last_ts) AS corpus_max FROM per
        )
        SELECT per.event_type, per.n_events, per.last_ts,
               CAST(FLOOR(epoch(g.corpus_max - per.last_ts)) AS BIGINT)
                 AS staleness_secs,
               CAST(FLOOR(epoch(g.corpus_max - per.last_ts)) AS BIGINT)
                 > 86400 AS stale_over_1d
        FROM per CROSS JOIN g
    """,
)
def type_freshness_staleness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E212: per-stream freshness — how far each event type's newest
    record lags the corpus high-water mark. When one upstream producer
    stalls, global row counts barely move but ITS type's staleness
    grows; anchoring to the corpus max (never wall-clock, which would
    be nondeterministic and untestable) makes the audit replayable and
    is exactly how a backfill-tolerant freshness SLO is defined. The
    E105 expectation suite checks VALUES; this checks ARRIVAL.

    Exactness: per-type MAX timestamps, whole-second lags via the
    repo's pinned timestampdiff ↔ floor(epoch) convention, a literal
    1-day flag.

    Scale: one map-side MAX per type + a 1-row high-water crossJoin."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    g = per.agg(F.max("last_ts").alias("corpus_max"))
    j = per.crossJoin(F.broadcast(g))
    stale = F.expr("timestampdiff(SECOND, last_ts, corpus_max)").cast(
        "long"
    )
    return j.select(
        "event_type",
        "n_events",
        "last_ts",
        stale.alias("staleness_secs"),
        (stale > 86400).alias("stale_over_1d"),
    )


# --------------------------------------------------------------------------
# E220: Apdex score per event type
# --------------------------------------------------------------------------

#: Apdex (Application Performance Index, Apdex Alliance spec): satisfied
#: if the measure is <= T, tolerating if <= 4T, frustrated beyond.
APDEX_T = 1.0


@query(
    "apdex_by_type",
    oracle=f"""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(*) FILTER (WHERE value <= {APDEX_T})
                 AS BIGINT) AS n_satisfied,
               CAST(COUNT(*) FILTER (WHERE value > {APDEX_T}
                                       AND value <= 4 * {APDEX_T})
                 AS BIGINT) AS n_tolerating,
               CAST(2 * COUNT(*) FILTER (WHERE value <= {APDEX_T})
                      + COUNT(*) FILTER (WHERE value > {APDEX_T}
                                           AND value <= 4 * {APDEX_T})
                 AS DOUBLE) / (2 * COUNT(*)) AS apdex
        FROM events WHERE value IS NOT NULL
        GROUP BY event_type
    """,
)
def apdex_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E220: Apdex score of event value per type — the third leg of the
    SRE reporting triple next to E94 (SLO burn) and E172 (Wilson error
    bounds): a single bounded [0,1] user-satisfaction index,
    (satisfied + tolerating/2) / n at threshold T / 4T.

    Exactness: the three counters are exact integers and the score is
    computed cross-multiplied — (2*sat + tol) / (2*n), ONE double
    division per group, no float ever summed. Threshold compares happen
    on the raw double column with shared literals, identical both
    engines.

    Scale: one map-side-combinable aggregate to |types| rows."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    sat = F.col("value") <= APDEX_T
    tol = (F.col("value") > APDEX_T) & (F.col("value") <= 4 * APDEX_T)
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.count(F.when(sat, 1)).cast("long").alias("n_satisfied"),
        F.count(F.when(tol, 1)).cast("long").alias("n_tolerating"),
        (
            (
                2 * F.count(F.when(sat, 1)) + F.count(F.when(tol, 1))
            ).cast("double")
            / (2 * F.count(F.lit(1)))
        ).alias("apdex"),
    )


# --------------------------------------------------------------------------
# E240: longest-prefix-match IP routing classification
# --------------------------------------------------------------------------

#: Literal routing table: (route, prefix_len, network_base_u32) — nested
#: prefixes on purpose (10.0.0.0/8 ⊃ /16 ⊃ /17, /24), so only a true
#: LPM resolves them. 10.0.0.0 = 167772160; 10.0.128.0/17 covers the
#: high half of the synthesized user octet; 10.0.42.0/24 is a canary.
IP_ROUTES = (
    ("core", 8, 167_772_160),
    ("dc-east", 16, 167_772_160),
    ("dc-east-hi", 17, 167_804_928),
    ("canary", 24, 167_782_912),
)

_ROUTES_SQL = " UNION ALL ".join(
    f"SELECT '{n}' AS route, {l} AS plen, CAST({b} AS BIGINT) AS base"
    for n, l, b in IP_ROUTES
)
_LENS = sorted({l for _, l, _ in IP_ROUTES})


@query(
    "ip_longest_prefix_route",
    oracle=f"""
        WITH ips AS (
          SELECT '10.0.' || CAST(user_id % 256 AS VARCHAR) || '.'
                   || CAST(event_id % 256 AS VARCHAR) AS ip,
                 (user_id % 256) * 256 + (event_id % 256)
                   + 167772160 AS u32
          FROM events
        ), per_ip AS (
          SELECT ip, MIN(u32) AS u32,
                 CAST(COUNT(*) AS BIGINT) AS n_requests
          FROM ips GROUP BY ip
        ), fanned AS (
          SELECT p.ip, p.n_requests, l.plen AS probe_len,
                 (p.u32 >> (32 - l.plen)) << (32 - l.plen) AS masked
          FROM per_ip p CROSS JOIN (
            {" UNION ALL ".join(f"SELECT {l} AS plen" for l in _LENS)}
          ) l
        ), routes AS ({_ROUTES_SQL}),
        matched AS (
          SELECT f.ip, f.n_requests, r.route, r.plen
          FROM fanned f JOIN routes r
            ON f.probe_len = r.plen AND f.masked = r.base
        ), winner AS (
          SELECT ip, n_requests,
                 MAX(plen) AS prefix_len,
                 ARG_MAX(route, plen) AS route
          FROM matched GROUP BY ip, n_requests
        )
        SELECT route, prefix_len,
               CAST(COUNT(*) AS BIGINT) AS n_ips,
               CAST(SUM(n_requests) AS BIGINT) AS n_requests
        FROM winner GROUP BY route, prefix_len
    """,
)
def ip_longest_prefix_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E240: longest-prefix-match routing classification — the router /
    geo-IP / tenant-attribution lookup done the way a distributed engine
    must: NEVER a per-row scan of the prefix table. Each distinct client
    IP fans out to the |distinct prefix lengths| masked keys (a CONSTANT
    ≤ 33× for IPv4) and equi-joins the broadcast route table on
    (prefix_len, masked_network); the most-specific match wins via
    max/max_by. Traffic is pre-aggregated per IP first, so the fan-out
    runs on the ADDRESS vocabulary, not the request volume — the same
    vocabulary-collapse move as E14/E239.

    Parses the synthesized CLF lines like the other clf_* queries (the
    oracle reproduces the IP arithmetic from events directly), so the
    regex parse path is exercised end-to-end.

    Exactness: u32 addresses, masks, and counts are all integers; ties
    are impossible (one route per (len, base)).

    Scale: one keyed per-IP aggregate (map-side combinable), constant
    fan-out, broadcast equi-join against the route literal, two tiny
    rollups. The route table can grow to real BGP size (~10⁶ rows) and
    this stays a broadcast hash join."""
    parsed = _parsed_clf(spark, sf_dir)
    oct_ = F.split(F.col("ip"), "\\.")
    per_ip = (
        parsed.groupBy(F.col("ip_address").alias("ip"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_requests"))
        .select(
            "ip",
            "n_requests",
            (
                F.element_at(oct_, 1).cast("long") * 16_777_216
                + F.element_at(oct_, 2).cast("long") * 65_536
                + F.element_at(oct_, 3).cast("long") * 256
                + F.element_at(oct_, 4).cast("long")
            ).alias("u32"),
        )
    )
    fanned = per_ip.select(
        "ip",
        "n_requests",
        F.explode(
            F.array(*[F.lit(l) for l in _LENS])
        ).alias("probe_len"),
        "u32",
    ).select(
        "ip",
        "n_requests",
        "probe_len",
        F.expr(
            "shiftleft(shiftright(u32, 32 - probe_len), 32 - probe_len)"
        ).alias("masked"),
    )
    routes = spark.sql(f"SELECT * FROM ({_ROUTES_SQL})")
    matched = fanned.join(
        F.broadcast(routes),
        (F.col("probe_len") == F.col("plen"))
        & (F.col("masked") == F.col("base")),
    )
    winner = matched.groupBy("ip", "n_requests").agg(
        F.max("plen").alias("prefix_len"),
        F.max_by("route", "plen").alias("route"),
    )
    return winner.groupBy("route", "prefix_len").agg(
        F.count(F.lit(1)).cast("long").alias("n_ips"),
        F.sum("n_requests").cast("long").alias("n_requests"),
    )
