"""Growth / journey-mining pack (SURVEY.md §2.6 E78–E81).

The reference's entire user analytics is three COUNT aggregates over one
day of logs (sree-etl-tdk-glue-job.py:52-63); a production product-
analytics engine also answers the *longitudinal* questions over the same
events: who is new / retained / resurrected / churned each week (growth
accounting), how long users' activity streaks run (gaps-and-islands),
which journey shapes sessions take (MATCH_RECOGNIZE-style sequence
regexes), and how far traffic has fallen from its historical peak.

Everything here is pure DataFrame API over the collapsed (user, period)
or (type, day) frames — the fact table is aggregated down FIRST, so all
window work happens on frames bounded by |users|×|weeks| or
|types|×|days|, never on raw events. All outputs are integer counts or
exact divisions of BIGINTs, so results are bit-identical to the DuckDB
oracle at any parallelism (operators/numeric.py rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query, scoped_persist

#: Journey paths are capped at the first N events per user: the collect
#: is bounded per key no matter how active one user is (the 100 TB
#: guard — an unbounded collect_list is a per-key OOM waiting for a bot).
_PATH_CAP = 100


# --------------------------------------------------------------------------
# E78: weekly growth accounting (new / retained / resurrected / churned)
# --------------------------------------------------------------------------


@query(
    "user_growth_accounting",
    oracle="""
        WITH weeks AS (
          SELECT DISTINCT user_id,
                 CAST(date_trunc('week', ts) AS DATE) AS week
          FROM events
        ),
        m AS (
          SELECT user_id, week,
                 lag(week)  OVER (PARTITION BY user_id ORDER BY week) AS prev_w,
                 lead(week) OVER (PARTITION BY user_id ORDER BY week) AS next_w
          FROM weeks
        ),
        cls AS (
          SELECT week,
                 CASE WHEN prev_w IS NULL THEN 'new'
                      WHEN prev_w = week - 7 THEN 'retained'
                      ELSE 'resurrected' END AS cls
          FROM m
          UNION ALL
          SELECT week + 7 AS week, 'churned' AS cls
          FROM m
          WHERE next_w IS NULL OR next_w > week + 7
        )
        SELECT week,
               count(*) FILTER (WHERE cls = 'new')         AS n_new,
               count(*) FILTER (WHERE cls = 'retained')    AS n_retained,
               count(*) FILTER (WHERE cls = 'resurrected') AS n_resurrected,
               count(*) FILTER (WHERE cls = 'churned')     AS n_churned
        FROM cls GROUP BY week
    """,
)
def user_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E78: weekly growth accounting — every active user-week classified
    as new (first week ever), retained (also active the prior week), or
    resurrected (active before, but not the prior week); a churn event is
    booked to week w+1 for each user active in w but not w+1 (so the four
    series satisfy the growth-accounting identity
    active_w = new_w + retained_w + resurrected_w and
    active_{w+1} = active_w - churned_{w+1} + new_{w+1} + resurrected_{w+1}).

    The reference can only report a single day's distinct-user count
    (sree-etl-tdk-glue-job.py:52); this is the standard DAU/WAU
    accounting layer products build over exactly such logs.

    Scale: events collapse to DISTINCT (user, week) first — the window
    and everything after run on a frame bounded by |users| × |weeks|.
    One shuffle on user_id (lag and lead share the partitioning), one
    reduce by week. The churn branch books weeks one past the last
    activity, which may extend past the corpus end — deliberate, and
    mirrored exactly by the oracle."""
    ev = load_table(spark, sf_dir, "events")
    return weekly_class_counts(classify_weeks(growth_weeks(ev)))


def growth_weeks(events: DataFrame) -> DataFrame:
    """The maintained growth state: DISTINCT (user_id, week) activity
    pairs — everything growth accounting needs, at |users|×|weeks|."""
    return events.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("week")
    ).distinct()


def classify_weeks(weeks: DataFrame) -> DataFrame:
    """(user_id, week, cls) rows — new/retained/resurrected per active
    user-week plus the churn bookings at w+1. Shared by the batch query
    and the incremental maintainer."""
    w = Window.partitionBy("user_id").orderBy("week")
    marked = weeks.select(
        "user_id",
        "week",
        F.lag("week").over(w).alias("prev_w"),
        F.lead("week").over(w).alias("next_w"),
    )
    cls = marked.select(
        "user_id",
        "week",
        F.when(F.col("prev_w").isNull(), F.lit("new"))
        .when(F.col("prev_w") == F.date_sub("week", 7), F.lit("retained"))
        .otherwise(F.lit("resurrected"))
        .alias("cls"),
    )
    churn = marked.where(
        F.col("next_w").isNull() | (F.col("next_w") > F.date_add("week", 7))
    ).select(
        "user_id",
        F.date_add("week", 7).alias("week"),
        F.lit("churned").alias("cls"),
    )
    return cls.unionByName(churn)


def weekly_class_counts(class_rows: DataFrame) -> DataFrame:
    """Fold (user_id, week, cls) rows to the weekly scorecard."""
    return class_rows.groupBy("week").agg(
        F.count(F.when(F.col("cls") == "new", 1)).alias("n_new"),
        F.count(F.when(F.col("cls") == "retained", 1)).alias("n_retained"),
        F.count(F.when(F.col("cls") == "resurrected", 1)).alias(
            "n_resurrected"
        ),
        F.count(F.when(F.col("cls") == "churned", 1)).alias("n_churned"),
    )


def merge_growth_state(
    state_weeks: DataFrame,
    state_class_rows: DataFrame,
    delta_events: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """E106: fold a delta batch into maintained growth-accounting state
    WITHOUT rescanning history and WITHOUT re-classifying untouched
    users.

    Growth classes are not additively decomposable — a user's new delta
    week can flip an old week from 'churn-after' to 'retained-before',
    so per-week counts can't just merge by addition. But the
    classification is PER-USER: only users present in the delta can
    change. The merge therefore:

      1. unions the delta's (user, week) pairs into the state (distinct),
      2. anti-joins the kept class rows (users NOT in the delta pass
         through untouched — never re-shuffled through a window),
      3. re-classifies ONLY the affected users' merged week sets.

    Cost: O(|delta| + |affected users' weeks| + |state|-passthrough);
    the events history is never read — the merge consumes only the two
    state frames and the delta, and the pass-through/recompute split is
    structure-asserted in tests (LeftAnti carries untouched users around
    the window, LeftSemi feeds only affected users into it). Returns
    (merged_weeks, merged_class_rows); weekly_class_counts folds the
    rows to the scorecard."""
    delta_weeks = growth_weeks(delta_events)
    affected = delta_weeks.select("user_id").distinct()
    merged_weeks = state_weeks.unionByName(delta_weeks).distinct()
    kept = state_class_rows.join(affected, "user_id", "left_anti")
    recomputed = classify_weeks(
        merged_weeks.join(affected, "user_id", "left_semi")
    )
    return merged_weeks, kept.unionByName(recomputed)


def _register_incremental() -> None:
    """Driver-checked query: maintain growth accounting across a
    mid-month seam; the oracle is the DIRECT full recompute, so the
    driver's hash gate is the merge == recompute equivalence proof for
    a NON-decomposable, window-classified aggregate (the seam case that
    breaks additive merging: a user active in both halves must flip
    from churned@seam to retained)."""
    from .registry import ORACLES, query

    @query(
        "growth_accounting_incremental",
        # identical oracle as the batch query: the direct recompute
        oracle=ORACLES["user_growth_accounting"],
    )
    def growth_accounting_incremental(spark: SparkSession, sf_dir: str):
        ev = load_table(spark, sf_dir, "events")
        cut = F.lit("2024-01-15").cast("timestamp_ntz")
        a = ev.where(F.col("ts") < cut)
        b = ev.where(F.col("ts") >= cut)
        state_weeks = growth_weeks(a)
        state_rows = classify_weeks(state_weeks)
        _weeks, rows = merge_growth_state(state_weeks, state_rows, b)
        return weekly_class_counts(rows)

    _ = growth_accounting_incremental


_register_incremental()


# --------------------------------------------------------------------------
# E79: longest consecutive-day activity streaks (gaps and islands)
# --------------------------------------------------------------------------


@query(
    "user_longest_streak",
    oracle="""
        WITH days AS (
          SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        ),
        grp AS (
          SELECT user_id, day,
                 day - CAST(row_number() OVER (
                   PARTITION BY user_id ORDER BY day) AS INTEGER) AS anchor
          FROM days
        ),
        streaks AS (
          SELECT user_id, anchor, count(*) AS len
          FROM grp GROUP BY user_id, anchor
        )
        SELECT user_id,
               max(len)                 AS longest_streak,
               CAST(sum(len) AS BIGINT) AS n_active_days,
               count(*)                 AS n_streaks
        FROM streaks GROUP BY user_id
    """,
)
def user_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E79: per-user longest run of consecutive active days — the classic
    gaps-and-islands rewrite: on the deduped (user, day) frame,
    day − row_number() is constant within a consecutive run, so one
    group-by on that anchor yields streak lengths without any self-join
    or iterative pass.

    Scale: facts collapse to DISTINCT (user, day) first (bounded by
    |users| × |days|); the row_number window, the anchor group-by, and
    the final per-user reduce all share the user_id partitioning — one
    shuffle total. Counts are BIGINTs; no floats anywhere."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    grp = days.select(
        "user_id",
        "day",
        F.date_sub("day", F.row_number().over(w)).alias("anchor"),
    )
    streaks = grp.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("len")
    )
    return streaks.groupBy("user_id").agg(
        F.max("len").alias("longest_streak"),
        F.sum("len").alias("n_active_days"),
        F.count(F.lit(1)).alias("n_streaks"),
    )


# --------------------------------------------------------------------------
# E80: sequence-pattern matching over journey strings (MATCH_RECOGNIZE-ish)
# --------------------------------------------------------------------------


@query(
    "journey_pattern_counts",
    oracle=f"""
        WITH r AS (
          SELECT user_id, event_type,
                 row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM events
        ),
        p AS (
          SELECT user_id,
                 '>' || string_agg(event_type, '>' ORDER BY rn) || '>' AS path
          FROM r WHERE rn <= {_PATH_CAP} GROUP BY user_id
        )
        SELECT
          count(*) AS n_users,
          count(*) FILTER (WHERE regexp_matches(path, '>view>purchase>'))
            AS n_direct_conversion,
          count(*) FILTER (WHERE regexp_matches(path, '>view>([^>]+>)*purchase>'))
            AS n_eventual_conversion,
          count(*) FILTER (WHERE regexp_matches(path, '^>signup>'))
            AS n_signup_first,
          count(*) FILTER (WHERE regexp_matches(path, '>error>error>'))
            AS n_repeated_error
        FROM p
    """,
)
def journey_pattern_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E80: MATCH_RECOGNIZE-style sequence mining without MATCH_RECOGNIZE
    (neither Spark nor DuckDB ships it): each user's first-_PATH_CAP (100)
    events become one delimited journey string ('>view>click>…>') in
    deterministic (ts, event_id) order, and row-pattern predicates become
    ordinary regexes over that string — adjacency is '>a>b>', "eventually
    followed by" is '>a>([^>]+>)*b>', anchors express "first event".

    Scale: the per-user collect is capped at _PATH_CAP events (window
    row_number → filter BEFORE the collect), so per-key state is bounded
    no matter how active a single key is; the row_number window and the
    group-by share one user_id shuffle. Regexes stay in the POSIX-common
    subset (literals, [^>] classes, *) so Java and RE2 semantics agree.
    Output is one row of exact BIGINT counts."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    ).where(F.col("rn") <= _PATH_CAP)
    paths = r.groupBy("user_id").agg(
        F.concat(
            F.lit(">"),
            F.concat_ws(
                ">",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                    lambda s: s.event_type,
                ),
            ),
            F.lit(">"),
        ).alias("path")
    )
    return paths.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count(F.when(F.col("path").rlike(">view>purchase>"), 1)).alias(
            "n_direct_conversion"
        ),
        F.count(
            F.when(F.col("path").rlike(">view>([^>]+>)*purchase>"), 1)
        ).alias("n_eventual_conversion"),
        F.count(F.when(F.col("path").rlike("^>signup>"), 1)).alias(
            "n_signup_first"
        ),
        F.count(F.when(F.col("path").rlike(">error>error>"), 1)).alias(
            "n_repeated_error"
        ),
    )


# --------------------------------------------------------------------------
# E81: decline-from-peak traffic monitoring
# --------------------------------------------------------------------------


@query(
    "peak_decline_by_type",
    oracle="""
        WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
          FROM events GROUP BY event_type, day
        ),
        runmax AS (
          SELECT event_type, day, cnt,
                 max(cnt) OVER (
                   PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS peak_so_far
          FROM daily
        )
        SELECT event_type,
               max(cnt)                 AS peak_daily,
               max(peak_so_far - cnt)   AS max_decline,
               count(*)                 AS n_days
        FROM runmax GROUP BY event_type
    """,
)
def peak_decline_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E81: deepest drop below the historical peak, per event type — the
    drawdown statistic ops dashboards alarm on ("traffic is N below its
    best day so far"). A plain min-vs-max comparison misses ordering: the
    decline must be measured against the *running* maximum, never a later
    peak.

    Scale: facts collapse to the |types| × |days| daily frame first; the
    running-max window and the final reduce share the event_type
    partitioning. Everything is BIGINT counts — engine-exact."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runmax = daily.withColumn("peak_so_far", F.max("cnt").over(w))
    return runmax.groupBy("event_type").agg(
        F.max("cnt").alias("peak_daily"),
        F.max(F.col("peak_so_far") - F.col("cnt")).alias("max_decline"),
        F.count(F.lit(1)).alias("n_days"),
    )


# --------------------------------------------------------------------------
# E127: Kaplan–Meier retention survival curve (right-censored churn)
# --------------------------------------------------------------------------

KM_CHURN_GAP_DAYS = 14  # silent for this long at corpus end = churned


def _km_walk(pdf):
    """The product-limit recurrence over the (bounded, calendar-sized)
    duration grid: S ← S · (1 − d/n), ascending t. Expression shape
    mirrored exactly in the recursive-CTE oracle → bit-identical."""
    import pandas as pd

    pdf = pdf.sort_values("t").reset_index(drop=True)
    s = 1.0
    out = []
    for _, r in pdf.iterrows():
        s = s * (1.0 - r["d_churned"] / r["n_at_risk"])
        out.append(s)
    pdf["survival"] = out
    return pdf[
        ["t", "n_at_risk", "d_churned", "c_censored", "survival"]
    ]


@query(
    "retention_survival_km",
    oracle=f"""
        WITH RECURSIVE bounds AS (
          SELECT MAX(CAST(ts AS DATE)) AS corpus_end FROM events
        ),
        per_user AS (
          SELECT user_id,
                 MIN(CAST(ts AS DATE)) AS first_day,
                 MAX(CAST(ts AS DATE)) AS last_day
          FROM events WHERE user_id IS NOT NULL GROUP BY user_id
        ),
        labeled AS (
          SELECT u.user_id,
                 CASE WHEN date_diff('day', u.last_day, b.corpus_end)
                           > {KM_CHURN_GAP_DAYS}
                      THEN date_diff('day', u.first_day, u.last_day)
                      ELSE date_diff('day', u.first_day, b.corpus_end)
                 END AS t,
                 CASE WHEN date_diff('day', u.last_day, b.corpus_end)
                           > {KM_CHURN_GAP_DAYS}
                      THEN 1 ELSE 0 END AS churned
          FROM per_user u, bounds b
        ),
        grid AS (
          SELECT t,
                 CAST(SUM(churned) AS BIGINT) AS d_churned,
                 CAST(SUM(1 - churned) AS BIGINT) AS c_censored
          FROM labeled GROUP BY t
        ),
        at_risk AS (
          SELECT t, d_churned, c_censored,
                 CAST(SUM(d_churned + c_censored) OVER (
                   ORDER BY t DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS BIGINT) AS n_at_risk,
                 CAST(ROW_NUMBER() OVER (ORDER BY t) AS BIGINT) AS i
          FROM grid
        ),
        km AS (
          SELECT i, t, n_at_risk, d_churned, c_censored,
                 1.0 * (1.0 - CAST(d_churned AS DOUBLE) / n_at_risk)
                   AS survival
          FROM at_risk WHERE i = 1
          UNION ALL
          SELECT a.i, a.t, a.n_at_risk, a.d_churned, a.c_censored,
                 k.survival
                   * (1.0 - CAST(a.d_churned AS DOUBLE) / a.n_at_risk)
          FROM km k JOIN at_risk a ON a.i = k.i + 1
        )
        SELECT t, n_at_risk, d_churned, c_censored, survival FROM km
    """,
)
def retention_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E127: Kaplan–Meier product-limit retention curve (KM 1958) —
    P(user still active after t days since first touch), with users
    still active at corpus end treated as RIGHT-CENSORED at their
    observed span instead of counted as churn (the error naive
    "retention = active/total" curves make). A user is churned when
    silent for > KM_CHURN_GAP_DAYS at corpus end; their event time is
    their observed activity span. Ŝ(t) = Π_{t'≤t} (1 − d_{t'}/n_{t'}).

    Scale split (the Holt pattern): facts collapse to one row per user
    in one keyed aggregate, then to the duration GRID (≤ calendar
    days); the at-risk suffix count is a growing DESC frame (one
    running aggregate, never a shrinking-frame rescan), and only the
    product walk runs single-group over the bounded grid. The 1-row
    corpus-end crossJoin is a broadcast scalar (BNLJ_OK). The survival
    product is a fixed multiply chain → bit-identical to the oracle's
    recursive CTE."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    per_user = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_day"),
        F.max(F.to_date("ts")).alias("last_day"),
    )
    bounds = events.agg(F.max(F.to_date("ts")).alias("corpus_end"))
    lab = per_user.crossJoin(F.broadcast(bounds)).select(
        F.when(
            F.datediff("corpus_end", "last_day") > KM_CHURN_GAP_DAYS,
            F.datediff("last_day", "first_day"),
        )
        .otherwise(F.datediff("corpus_end", "first_day"))
        .cast("long")
        .alias("t"),
        F.when(
            F.datediff("corpus_end", "last_day") > KM_CHURN_GAP_DAYS, 1
        )
        .otherwise(0)
        .alias("churned"),
    )
    grid = lab.groupBy("t").agg(
        F.sum("churned").alias("d_churned"),
        F.sum(1 - F.col("churned")).alias("c_censored"),
    )
    w_desc = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    at_risk = grid.select(
        "t",
        "d_churned",
        "c_censored",
        F.sum(F.col("d_churned") + F.col("c_censored"))
        .over(w_desc)
        .alias("n_at_risk"),
    )
    return at_risk.groupBy(F.lit(1).alias("_g")).applyInPandas(
        lambda _, pdf: _km_walk(pdf),
        "t long, n_at_risk long, d_churned long, c_censored long, "
        "survival double",
    )


# --------------------------------------------------------------------------
# E130: Markov removal-effect attribution (multi-touch, data-driven)
# --------------------------------------------------------------------------

MK_SCALE = 10**9      # absorption probabilities in units of 1e-9
MK_ITERS = 16         # unrolled identically in the SQL oracle
MK_CHANNELS = ["view", "click", "signup", "error"]
_MK_STATES = ["START"] + MK_CHANNELS  # iterating states (absorbers fixed)


def _mk_transitions_sql() -> str:
    """Shared journey→transition-counts SQL (DuckDB dialect; the Spark
    side mirrors it in DataFrame ops): per user, the touch sequence up
    to the FIRST purchase; START → first touch, touch → next touch,
    last touch → CONV (user purchased) or NULL (never did)."""
    return """
        seq AS (
          SELECT user_id, ts, event_id, event_type,
                 MIN(CASE WHEN event_type = 'purchase' THEN ts END)
                   OVER (PARTITION BY user_id) AS first_purchase
          FROM events WHERE user_id IS NOT NULL
        ),
        touches AS (
          SELECT user_id, ts, event_id, event_type,
                 first_purchase IS NOT NULL AS converts
          FROM seq
          WHERE event_type <> 'purchase'
            AND (first_purchase IS NULL OR ts < first_purchase)
        ),
        hops AS (
          SELECT user_id, event_type AS s,
                 LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                 ) AS nxt,
                 ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                 ) AS rn,
                 converts
          FROM touches
        ),
        trans AS (
          SELECT 'START' AS s, s AS t FROM hops WHERE rn = 1
          UNION ALL
          SELECT s, nxt AS t FROM hops WHERE nxt IS NOT NULL
          UNION ALL
          SELECT s, CASE WHEN converts THEN 'CONV' ELSE 'NULL' END AS t
          FROM hops WHERE nxt IS NULL
          UNION ALL
          -- users whose very first event is the purchase: START → CONV
          SELECT 'START', 'CONV'
          FROM seq GROUP BY user_id
          HAVING COUNT(CASE WHEN event_type <> 'purchase'
                            AND (first_purchase IS NULL
                                 OR ts < first_purchase)
                       THEN 1 END) = 0
             AND MAX(first_purchase) IS NOT NULL
        ),
        counts AS MATERIALIZED (
          SELECT s, t, CAST(COUNT(*) AS BIGINT) AS c
          FROM trans GROUP BY s, t
        )
    """


def _mk_oracle() -> str:
    variants = ["full"] + MK_CHANNELS
    # per-variant counts: removing channel X redirects s→X edges to NULL
    # and drops X's outgoing edges (Anderl et al. 2016 removal effect)
    vsel = []
    for v in variants:
        if v == "full":
            vsel.append("SELECT 'full' AS variant, s, t, c FROM counts")
        else:
            vsel.append(
                f"SELECT '{v}' AS variant, s, "
                f"CASE WHEN t = '{v}' THEN 'NULL' ELSE t END AS t, c "
                f"FROM counts WHERE s <> '{v}'"
            )
    steps = [
        """p0 AS (
          SELECT variant, s AS state, CAST(0 AS BIGINT) AS p
          FROM vcounts GROUP BY variant, s
        )"""
    ]
    for k in range(MK_ITERS):
        steps.append(f"""p{k + 1} AS (
          SELECT vc.variant, vc.s AS state,
                 CAST(SUM(vc.c * CASE
                       WHEN vc.t = 'CONV' THEN {MK_SCALE}
                       WHEN vc.t = 'NULL' THEN 0
                       ELSE COALESCE(pk.p, 0) END) // tot.tc AS BIGINT)
                   AS p
          FROM vcounts vc
          JOIN vtot tot
            ON tot.variant = vc.variant AND tot.s = vc.s
          LEFT JOIN p{k} pk
            ON pk.variant = vc.variant AND pk.state = vc.t
          GROUP BY vc.variant, vc.s, tot.tc
        )""")
    return f"""
        WITH {_mk_transitions_sql().strip().rstrip()},
        vcounts AS MATERIALIZED ({' UNION ALL '.join(vsel)}),
        vtot AS MATERIALIZED (
          SELECT variant, s, SUM(c) AS tc FROM vcounts GROUP BY variant, s
        ),
        {', '.join(steps)},
        final AS (
          SELECT variant, p FROM p{MK_ITERS} WHERE state = 'START'
        )
        SELECT ch.variant AS channel,
               CAST(f.p AS DOUBLE) / {MK_SCALE} AS p_conv_full,
               CAST(COALESCE(ch.p, 0) AS DOUBLE) / {MK_SCALE}
                 AS p_conv_removed,
               CAST(f.p - COALESCE(ch.p, 0) AS DOUBLE) / f.p
                 AS removal_effect
        FROM final ch, final f
        WHERE f.variant = 'full' AND ch.variant <> 'full'
    """


@query("markov_attribution_removal", oracle=_mk_oracle())
def markov_attribution_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E130: data-driven multi-touch attribution — each channel's
    removal effect (Anderl et al. 2016; the industry alternative to
    last-touch): build the first-order Markov chain over journey
    touches (START → … → CONV/NULL, truncated at the first purchase),
    then for each channel re-route its incoming edges to NULL, drop its
    outgoing ones, and measure how much START→CONV absorption drops:
    removal_effect = (P_full − P_removed)/P_full.

    Absorption probabilities come from MK_ITERS unrolled value-
    iteration steps in SCALED-INTEGER arithmetic with floor division —
    the pagerank discipline — so both engines produce identical bits
    and the oracle unrolls the same 16 steps as chained MATERIALIZED
    CTEs (no aggregation over a recursive reference needed). All 5
    variants (full + 4 removals) iterate together over the collected
    (variant, state) grid.

    Scale: the only pass over fact volume is the journey/hop window +
    one transition count (map-side combinable); everything after lives
    on the ≤ |variants|·|states|² count grid — bounded by the fixed
    event-type vocabulary, like the E34 transition matrix. At
    petabyte counts, pre-normalize c to per-mille before the c·p
    products to keep the BIGINT headroom (documented, not needed at
    bench SFs)."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    w_user = Window.partitionBy("user_id")
    seq = events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).over(w_user).alias("first_purchase"),
    )
    touches = seq.filter(
        (F.col("event_type") != "purchase")
        & (
            F.col("first_purchase").isNull()
            | (F.col("ts") < F.col("first_purchase"))
        )
    ).withColumn("converts", F.col("first_purchase").isNotNull())
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    hops = touches.select(
        "user_id",
        F.col("event_type").alias("s"),
        F.lead("event_type").over(w_ord).alias("nxt"),
        F.row_number().over(w_ord).alias("rn"),
        "converts",
    )
    first = hops.filter(F.col("rn") == 1).select(
        F.lit("START").alias("s"), F.col("s").alias("t")
    )
    mid = hops.filter(F.col("nxt").isNotNull()).select(
        "s", F.col("nxt").alias("t")
    )
    last = hops.filter(F.col("nxt").isNull()).select(
        "s",
        F.when(F.col("converts"), "CONV").otherwise("NULL").alias("t"),
    )
    # users whose only pre-purchase history is empty: START → CONV
    direct = (
        seq.groupBy("user_id")
        .agg(
            F.min("first_purchase").alias("fp"),
            F.sum(
                F.when(
                    (F.col("event_type") != "purchase")
                    & (
                        F.col("first_purchase").isNull()
                        | (F.col("ts") < F.col("first_purchase"))
                    ),
                    1,
                ).otherwise(0)
            ).alias("n_touch"),
        )
        .filter(F.col("fp").isNotNull() & (F.col("n_touch") == 0))
        .select(F.lit("START").alias("s"), F.lit("CONV").alias("t"))
    )
    counts = (
        first.unionByName(mid).unionByName(last).unionByName(direct)
        .groupBy("s", "t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # The (variant, s, t) grid is bounded by the FIXED event-type
    # vocabulary (≤ 5·6·6 cells at any corpus size), so the value
    # iteration runs driver-side over the collected grid — the same
    # bounded-driver-artifact shape as the CMS probe and IVF centroids;
    # 16 Spark jobs of 30-row joins would buy nothing but latency. The
    # arithmetic (Σ c·p // tot) is the oracle's, bit for bit.
    #
    # The variant fan-out happens on the COLLECTED base grid, in
    # Python: each removal variant is a pure per-row transform of
    # counts (drop s == ch, remap t == ch -> 'NULL'), so building it as
    # 5 unioned DataFrame branches made the optimizer carry five copies
    # of the whole fact pipeline (window + transition count) in one
    # plan — ~0.5 s of duplicated plan/agg work per call at sf0.1 for
    # what is a <=36-row driver loop (guide §1.2 "don't compute things
    # you throw away"). Duplicate (variant, s, t) cells after the
    # remap need no merge here, exactly as the union form needed none:
    # the accumulation below sums every edge's c into num/tot, so the
    # multiset of (t, c) per (variant, s) key is what matters, and it
    # is identical.
    base_cells = [(r.s, r.t, int(r.c)) for r in counts.collect()]
    cells = [(("full", s), (t, c)) for s, t, c in base_cells]
    for ch in MK_CHANNELS:
        cells.extend(
            ((ch, s), ("NULL" if t == ch else t, c))
            for s, t, c in base_cells
            if s != ch
        )
    from collections import defaultdict

    out_edges: dict[tuple, list] = defaultdict(list)
    tot: dict[tuple, int] = defaultdict(int)
    for key, (t, c) in cells:
        out_edges[key].append((t, c))
        tot[key] += c
    p: dict[tuple, int] = {key: 0 for key in out_edges}
    for _ in range(MK_ITERS):
        new = {}
        for (variant, s), edges in out_edges.items():
            num = 0
            for t, c in edges:
                if t == "CONV":
                    pv = MK_SCALE
                elif t == "NULL":
                    pv = 0
                else:
                    pv = p.get((variant, t), 0)
                num += c * pv
            new[(variant, s)] = num // tot[(variant, s)]
        p = new
    p_full = p.get(("full", "START"), 0)
    rows = []
    for ch in MK_CHANNELS:
        p_rem = p.get((ch, "START"), 0)
        rows.append(
            (
                ch,
                p_full / MK_SCALE,
                p_rem / MK_SCALE,
                (p_full - p_rem) / p_full if p_full else None,
            )
        )
    return spark.createDataFrame(
        rows,
        "channel string, p_conv_full double, p_conv_removed double, "
        "removal_effect double",
    )


# --------------------------------------------------------------------------
# E147b/E148: sequential-pattern support (a-before-b pair mining)
# --------------------------------------------------------------------------


@query(
    "seq_pattern_pairs",
    oracle="""
        WITH ut AS (
          SELECT user_id, event_type,
                 MIN(ts) AS first_ts, MAX(ts) AS last_ts
          FROM events GROUP BY user_id, event_type
        ), total AS (
          SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM ut
        ), sup AS (
          SELECT a.event_type AS type_a, b.event_type AS type_b,
                 CAST(COUNT(*) AS BIGINT) AS n_support
          FROM ut a JOIN ut b
            ON a.user_id = b.user_id
           AND a.event_type <> b.event_type
           AND a.first_ts < b.last_ts
          GROUP BY a.event_type, b.event_type
        )
        SELECT s.type_a, s.type_b, s.n_support,
               CAST(s.n_support AS DOUBLE) / t.n_users AS support_share
        FROM sup s CROSS JOIN total t
    """,
)
def seq_pattern_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E148: sequential-pattern mining, pair level (GSP/PrefixSpan's
    length-2 stage): pattern ``a -> b`` is SUPPORTED by a user iff some
    ``a`` event happens strictly before some ``b`` event (equivalently
    first(a) < last(b)); support = #users, plus the share of all active
    users. Unlike event_transition_matrix (ADJACENT steps only) this
    admits arbitrary gaps — the classic seq-mining semantics.

    Scale: the fact table collapses to the (user, type, first, last)
    frame first — map-side combinable, at most |types| rows per user —
    so the per-user pair expansion is bounded by |types|^2 (25 here),
    never by the user's event count; one shuffle on user_id, then a
    map-side-combined pair count over a 5x5 key domain. The total-users
    scalar is a 1-row broadcast."""
    ev = load_table(spark, sf_dir, "events")
    ut = scoped_persist(
        ev.groupBy("user_id", "event_type").agg(
            F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts")
        )
    )
    total = ut.agg(
        F.countDistinct("user_id").cast("long").alias("n_users")
    )
    a, b = ut.alias("a"), ut.alias("b")
    sup = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") != F.col("b.event_type"))
            & (F.col("a.first_ts") < F.col("b.last_ts")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_support"))
    )
    return sup.crossJoin(F.broadcast(total)).select(
        "type_a",
        "type_b",
        "n_support",
        (F.col("n_support").cast("double") / F.col("n_users")).alias(
            "support_share"
        ),
    )


# --------------------------------------------------------------------------
# E207: conversion by acquisition channel (first-touch cohorting)
# --------------------------------------------------------------------------


@query(
    "acquisition_channel_conversion",
    oracle="""
        WITH ft AS (
          SELECT user_id, event_type AS first_type
          FROM events WHERE user_id IS NOT NULL
          QUALIFY ROW_NUMBER() OVER (
            PARTITION BY user_id ORDER BY ts, event_id
          ) = 1
        ), agg AS (
          SELECT user_id, MIN(ts) AS first_ts,
                 MIN(ts) FILTER (WHERE event_type = 'purchase')
                   AS first_purchase
          FROM events WHERE user_id IS NOT NULL
          GROUP BY user_id
        ), firsts AS (
          SELECT ft.first_type, agg.first_ts, agg.first_purchase
          FROM ft JOIN agg USING (user_id)
        )
        SELECT first_type AS acquisition_type,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(COUNT(*) FILTER (
                 WHERE first_purchase IS NOT NULL
                   AND first_purchase > first_ts) AS BIGINT)
                 AS n_converted_later,
               CAST(COUNT(*) FILTER (
                 WHERE first_purchase IS NOT NULL
                   AND first_purchase > first_ts) AS DOUBLE)
                 / COUNT(*) AS conversion_rate
        FROM firsts GROUP BY first_type
    """,
)
def acquisition_channel_conversion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """E207: does HOW a user arrives predict whether they later buy —
    users cohorted by their very first event type (the acquisition
    "channel" in this schema), with the share that purchases at any
    LATER moment. The first-touch complement to E49/E204's
    purchase-side attribution, and the first split a growth team makes
    before the full journey machinery (E80) runs. Users whose first
    event IS a purchase are their own cohort and never count as
    converted-later (no self-conversion).

    Exactness: per-user first event by the total (ts, event_id) order
    (MIN_BY ↔ min_by, deterministic under ties), first purchase by
    filtered MIN; counts and one division.

    Scale: ONE user-keyed aggregate (min_by and filtered min are
    map-side-combinable), then a |types|-row regroup."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
    )
    firsts = ev.groupBy("user_id").agg(
        F.min_by("event_type", F.struct("ts", "event_id")).alias(
            "first_type"
        ),
        F.min("ts").alias("first_ts"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("first_purchase"),
    )
    conv = F.col("first_purchase").isNotNull() & (
        F.col("first_purchase") > F.col("first_ts")
    )
    return firsts.groupBy(
        F.col("first_type").alias("acquisition_type")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.count(F.when(conv, 1)).cast("long").alias("n_converted_later"),
        (
            F.count(F.when(conv, 1)).cast("double") / F.count(F.lit(1))
        ).alias("conversion_rate"),
    )


# --------------------------------------------------------------------------
# E210: churn-definition sensitivity (30/60/90-day inactivity)
# --------------------------------------------------------------------------

CHURN_WINDOWS_DAYS = [30, 60, 90]


@query(
    "inactivity_churn_rates",
    oracle=f"""
        WITH lasts AS (
          SELECT user_id, MAX(CAST(ts AS DATE)) AS last_d
          FROM events WHERE user_id IS NOT NULL
          GROUP BY user_id
        ), b AS (
          SELECT MAX(last_d) AS corpus_end FROM lasts
        )
        SELECT CAST(w.win AS BIGINT) AS window_days,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(COUNT(*) FILTER (
                 WHERE l.last_d < b.corpus_end - w.win) AS BIGINT)
                 AS n_churned,
               CAST(COUNT(*) FILTER (
                 WHERE l.last_d < b.corpus_end - w.win) AS DOUBLE)
                 / COUNT(*) AS churn_rate
        FROM lasts l
        CROSS JOIN b
        CROSS JOIN (SELECT UNNEST(ARRAY{CHURN_WINDOWS_DAYS}) AS win) w
        GROUP BY w.win
    """,
)
def inactivity_churn_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E210: churn-definition sensitivity — the share of users inactive
    for more than 30/60/90 days as of corpus end, side by side. "Churn"
    has no ground truth, only a chosen inactivity window; reporting the
    ladder (instead of one anointed number) shows how much the KPI is
    an artifact of the definition — the sensitivity check that belongs
    next to E78's growth accounting (whose 'churned' state picks ONE
    window) before anyone optimizes the metric.

    Exactness: per-user last-active day (one keyed MAX), integer date
    comparisons against a 3-row literal window frame, counts and one
    division per window.

    Scale: one user-keyed aggregate; the 3-window fan-out is a literal
    crossJoin on the per-user frame (3× |users| rows, then map-side
    collapse)."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
    )
    lasts = ev.groupBy("user_id").agg(
        F.max(F.col("ts").cast("date")).alias("last_d")
    )
    b = lasts.agg(F.max("last_d").alias("corpus_end"))
    wins = ev.sparkSession.range(1).select(
        F.explode(
            F.array(*[F.lit(w) for w in CHURN_WINDOWS_DAYS])
        ).alias("win")
    )
    j = lasts.crossJoin(F.broadcast(b)).crossJoin(F.broadcast(wins))
    # date minus an INTEGER COLUMN needs the SQL form (F.date_sub takes
    # a literal only in this codebase's pinned API usage)
    churned = F.expr("last_d < corpus_end - win")
    return j.groupBy(F.col("win").cast("long").alias("window_days")).agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.count(F.when(churned, 1)).cast("long").alias("n_churned"),
        (
            F.count(F.when(churned, 1)).cast("double") / F.count(F.lit(1))
        ).alias("churn_rate"),
    )


# --------------------------------------------------------------------------
# E226: exact Shapley-value channel attribution (unanimity-game closed form)
# --------------------------------------------------------------------------

#: Credit denominator: LCM(1..6) covers every possible touched-set size
#: (there are only 4 non-purchase event types today; 60 also divides 5
#: and 6 so the lattice survives new channels), keeping every per-user
#: credit an exact integer.
SHAPLEY_LCM = 60


@query(
    "shapley_attribution",
    oracle=f"""
        WITH fp AS (
          SELECT user_id,
                 MIN(ROW(CAST(ts AS TIMESTAMP), event_id)) AS fkey
          FROM events WHERE event_type = 'purchase'
          GROUP BY user_id
        ), touched AS (
          SELECT DISTINCT e.user_id, e.event_type AS channel
          FROM events e JOIN fp ON e.user_id = fp.user_id
          WHERE e.event_type <> 'purchase'
            AND ROW(CAST(e.ts AS TIMESTAMP), e.event_id) < fp.fkey
        ), sized AS (
          SELECT user_id, channel,
                 COUNT(*) OVER (PARTITION BY user_id) AS set_size
          FROM touched
        )
        SELECT channel,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM({SHAPLEY_LCM} // set_size) AS BIGINT)
                 AS credit_60ths,
               CAST(SUM({SHAPLEY_LCM} // set_size) AS DOUBLE)
                 / {SHAPLEY_LCM} AS shapley_conversions
        FROM sized
        GROUP BY channel
    """,
)
def shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E226: EXACT Shapley-value attribution of conversions to channels,
    completing the attribution ladder (E49 last-touch, E204 position-
    based, E131 Markov removal-effect) with the game-theoretic one.

    Model: each converting user u defines a coalition game where a
    channel set S "converts" iff it covers every channel the user
    actually touched before their first purchase: v_u(S) = 1[T_u <= S].
    That is the UNANIMITY game on T_u, whose Shapley value is the closed
    form phi_i = 1/|T_u| for i in T_u and 0 otherwise; total v over users
    is a sum of unanimity games, and Shapley values are linear in v, so
    the exact Shapley attribution — no 2^n subset enumeration, no
    sampling — is Sum_u 1/|T_u| over users who touched the channel.
    Credits are integers on the 1/60 lattice (60 = LCM(1..6) covers any
    touched-set size up to 6 channels), so the engine sums exact
    integers and divides once at the end.

    T_u = distinct non-purchase event types strictly before u's FIRST
    purchase, ordered by (ts, event_id); the oracle casts ts to
    microseconds so tie-breaks match the Spark loader's ns -> us
    truncation.  Users whose first purchase has no prior touches carry
    no credit (organic conversions; they are countable as
    n_converting - sum(n_users over singleton sets) downstream).

    Scale: first-purchase keys collapse per user (map-side min on the
    (ts,event_id) struct); the touch scan is ONE equi-join on user_id
    with a residual struct comparison (shuffle-hash/SMJ on user_id,
    never a cross product); distinct + set-size + final rollup all key
    on user_id then channel, so the largest shuffle is one pass over
    pre-purchase events.  Output is |channels| rows."""
    events = load_table(spark, sf_dir, "events")
    key = F.struct("ts", "event_id")
    fp = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(key).alias("fkey"))
    )
    touched = (
        events.filter(F.col("event_type") != "purchase")
        .join(fp, "user_id")
        .filter(key < F.col("fkey"))
        .select("user_id", F.col("event_type").alias("channel"))
        .distinct()
    )
    sized = touched.withColumn(
        "set_size",
        F.count(F.lit(1)).over(Window.partitionBy("user_id")),
    )
    credit = (F.lit(SHAPLEY_LCM) / F.col("set_size")).cast("long")
    return sized.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(credit).cast("long").alias("credit_60ths"),
        (F.sum(credit).cast("double") / SHAPLEY_LCM).alias(
            "shapley_conversions"
        ),
    )


# --------------------------------------------------------------------------
# E243: log-rank test — do two cohorts share a survival curve?
# --------------------------------------------------------------------------

#: chi-square(1) critical value at alpha = 0.05 (literal constant).
_LOGRANK_CRIT = 3.841458820694124
#: 1e-9 fixed point for the cross-engine-exact O-E and variance sums.
_LR_SCALE = 1_000_000_000

#: Per-event-time terms over exact integers (d1, d = d1+d2,
#: n1, n = n1+n2): observed-minus-expected and the hypergeometric
#: variance, quantized BEFORE the grid sum — identical text both
#: engines.
_LR_OE_Q = (
    f"CAST(FLOOR((d1 - CAST(d AS DOUBLE) * n1 / n) * {_LR_SCALE} + 0.5)"
    " AS BIGINT)"
)
_LR_V_Q = (
    "CAST(FLOOR(CASE WHEN n > 1 THEN"
    " (CAST(d AS DOUBLE) * n1 / n) * (CAST(n2 AS DOUBLE) / n)"
    " * (CAST(n - d AS DOUBLE) / (n - 1))"
    f" ELSE 0.0 END * {_LR_SCALE} + 0.5) AS BIGINT)"
)


@query(
    "conversion_logrank_test",
    oracle=f"""
        WITH bounds AS (
          SELECT MAX(CAST(ts AS DATE)) AS corpus_end FROM events
        ), per_user AS (
          SELECT user_id, user_id % 2 AS cohort,
                 MIN(CAST(ts AS DATE)) AS first_day,
                 MIN(CASE WHEN event_type = 'purchase'
                     THEN CAST(ts AS DATE) END) AS conv_day
          FROM events WHERE user_id IS NOT NULL GROUP BY user_id
        ), labeled AS (
          SELECT cohort,
                 CASE WHEN u.conv_day IS NOT NULL
                      THEN date_diff('day', u.first_day, u.conv_day)
                      ELSE date_diff('day', u.first_day, b.corpus_end)
                 END AS t,
                 CASE WHEN u.conv_day IS NOT NULL
                      THEN 1 ELSE 0 END AS churned
          FROM per_user u, bounds b
        ), grid AS (
          SELECT t,
                 CAST(SUM(CASE WHEN cohort = 0 THEN churned
                   ELSE 0 END) AS BIGINT) AS d1g,
                 CAST(SUM(CASE WHEN cohort = 1 THEN churned
                   ELSE 0 END) AS BIGINT) AS d2g,
                 CAST(SUM(CASE WHEN cohort = 0 THEN 1
                   ELSE 0 END) AS BIGINT) AS m1,
                 CAST(SUM(CASE WHEN cohort = 1 THEN 1
                   ELSE 0 END) AS BIGINT) AS m2
          FROM labeled GROUP BY t
        ), risk AS (
          SELECT t, d1g AS d1, d2g AS d2,
                 CAST(SUM(m1) OVER (ORDER BY t DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS n1,
                 CAST(SUM(m2) OVER (ORDER BY t DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS n2
          FROM grid
        ), terms AS (
          SELECT t, d1, d1 + d2 AS d, n1, n2, n1 + n2 AS n
          FROM risk WHERE d1 + d2 > 0
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_event_times,
               CAST(SUM(d1) AS BIGINT) AS observed_1,
               CAST(SUM({_LR_OE_Q}) AS DOUBLE) / {_LR_SCALE}
                 AS oe_sum,
               CASE WHEN SUM({_LR_V_Q}) > 0 THEN
                 (CAST(SUM({_LR_OE_Q}) AS DOUBLE) / {_LR_SCALE})
                 * (CAST(SUM({_LR_OE_Q}) AS DOUBLE) / {_LR_SCALE})
                 / (CAST(SUM({_LR_V_Q}) AS DOUBLE) / {_LR_SCALE})
               END AS logrank_z2,
               COALESCE(CASE WHEN SUM({_LR_V_Q}) > 0 THEN
                 (CAST(SUM({_LR_OE_Q}) AS DOUBLE) / {_LR_SCALE})
                 * (CAST(SUM({_LR_OE_Q}) AS DOUBLE) / {_LR_SCALE})
                 / (CAST(SUM({_LR_V_Q}) AS DOUBLE) / {_LR_SCALE})
                 > {_LOGRANK_CRIT} END, FALSE) AS reject_at_05
        FROM terms
    """,
)
def conversion_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E243: log-rank (Mantel-Cox) test on time-to-first-purchase —
    completes the survival family: E127 DRAWS a Kaplan-Meier curve,
    this DECIDES whether two cohorts (user-id parity = the assignment
    hash) share one. The survival time is days from first touch to
    first purchase, with never-purchasers right-censored at corpus end
    — the censoring-correct version of "which arm converts faster"
    that E85's endpoint z-test cannot ask. At each distinct conversion
    time the observed cohort-0 conversions are compared to their
    hypergeometric expectation d·n1/n given the at-risk sets, and
    z² = (Σ(O−E))²/ΣV is read against the literal χ²(1) critical
    value.

    Exactness: at-risk suffix counts are exact integers off the
    duration GRID; each per-time O−E and variance term is ONE shared
    double chain quantized to 1e-9 integers before the grid sum, so the
    statistic is bit-identical at any parallelism; a zero total
    variance (no churn, or one cohort empty) yields NULL z² and a FALSE
    reject rather than a divide-by-zero.

    Scale: the E127 split — one per-user aggregate, collapse to the
    calendar-bounded duration grid, two suffix-count windows over that
    grid (waived), one 1-row reduce."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    bounds = events.agg(
        F.max(F.col("ts").cast("date")).alias("corpus_end")
    )
    per_user = events.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_day"),
        F.min(
            F.when(
                F.col("event_type") == "purchase",
                F.col("ts").cast("date"),
            )
        ).alias("conv_day"),
    )
    labeled = per_user.crossJoin(F.broadcast(bounds)).select(
        (F.col("user_id") % 2).alias("cohort"),
        F.when(
            F.col("conv_day").isNotNull(),
            F.datediff(F.col("conv_day"), F.col("first_day")),
        )
        .otherwise(F.datediff(F.col("corpus_end"), F.col("first_day")))
        .alias("t"),
        F.when(F.col("conv_day").isNotNull(), 1).otherwise(0).alias(
            "churned"
        ),
    )
    grid = labeled.groupBy("t").agg(
        F.sum(F.when(F.col("cohort") == 0, F.col("churned")).otherwise(0))
        .cast("long")
        .alias("d1"),
        F.sum(F.when(F.col("cohort") == 1, F.col("churned")).otherwise(0))
        .cast("long")
        .alias("d2"),
        F.sum(F.when(F.col("cohort") == 0, 1).otherwise(0))
        .cast("long")
        .alias("m1"),
        F.sum(F.when(F.col("cohort") == 1, 1).otherwise(0))
        .cast("long")
        .alias("m2"),
    )
    wdesc = Window.orderBy(F.desc("t")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = grid.select(
        "t",
        "d1",
        "d2",
        F.sum("m1").over(wdesc).cast("long").alias("n1"),
        F.sum("m2").over(wdesc).cast("long").alias("n2"),
    )
    terms = risk.filter(F.col("d1") + F.col("d2") > 0).select(
        "t",
        "d1",
        (F.col("d1") + F.col("d2")).alias("d"),
        "n1",
        "n2",
        (F.col("n1") + F.col("n2")).alias("n"),
    )
    z2 = (
        "CASE WHEN vq > 0 THEN"
        f" (CAST(oeq AS DOUBLE) / {_LR_SCALE})"
        f" * (CAST(oeq AS DOUBLE) / {_LR_SCALE})"
        f" / (CAST(vq AS DOUBLE) / {_LR_SCALE}) END"
    )
    return (
        terms.agg(
            F.count(F.lit(1)).cast("long").alias("n_event_times"),
            F.sum("d1").cast("long").alias("observed_1"),
            F.sum(F.expr(_LR_OE_Q)).cast("long").alias("oeq"),
            F.sum(F.expr(_LR_V_Q)).cast("long").alias("vq"),
        )
        .select(
            "n_event_times",
            "observed_1",
            (F.col("oeq").cast("double") / _LR_SCALE).alias("oe_sum"),
            F.expr(z2).alias("logrank_z2"),
            F.coalesce(
                F.expr(z2) > _LOGRANK_CRIT, F.lit(False)
            ).alias("reject_at_05"),
        )
    )
