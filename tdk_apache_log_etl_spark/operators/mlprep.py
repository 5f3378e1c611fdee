"""ML feature-preparation operators (SURVEY.md §2.6 extension rows).

The reference stops at raw aggregates (sree-etl-tdk-glue-job.py:52-63);
the feature layer a training pipeline puts on top of relational tables
needs LEAKAGE-SAFE encodings: a categorical target encoding computed
naively (mean of the target per category over ALL rows) leaks each row's
own label into its feature and inflates offline metrics. The standard
fix is out-of-fold (OOF) encoding — every row receives the mean computed
from the OTHER folds only — materialized as a compact (category × fold)
lookup table that the training join broadcasts.

Exactness follows operators/numeric.py: targets fix to 4-dp integers,
all fold/category moments are exact integer sums, and each encoding is
one shared-literal IEEE double chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .numeric import SCALE
from .registry import query, scoped_persist

# --------------------------------------------------------------------------
# E176: out-of-fold target encoding of the customer market segment
# --------------------------------------------------------------------------

#: Deterministic fold assignment — orderkey modulus, replayable in SQL.
N_FOLDS = 5
#: Additive-smoothing pseudo-count toward the (fold-excluded) global
#: prior; the standard micci-barreca smoothing that keeps rare
#: categories from memorizing their few labels.
TE_SMOOTH_M = 20

_TE_OOF = (
    f"(CAST(seg_s - s AS DOUBLE) / {SCALE})"
    f" / NULLIF(CAST(seg_n - n AS DOUBLE), 0.0)"
)
_TE_PRIOR = (
    f"(CAST(all_s - fold_s AS DOUBLE) / {SCALE})"
    f" / NULLIF(CAST(all_n - fold_n AS DOUBLE), 0.0)"
)
_TE_SMOOTH = (
    f"((CAST(seg_s - s AS DOUBLE) / {SCALE})"
    f" + {TE_SMOOTH_M}.0 * {_TE_PRIOR})"
    f" / (CAST(seg_n - n AS DOUBLE) + {TE_SMOOTH_M}.0)"
)


@query(
    "target_encode_mktsegment",
    oracle=f"""
        WITH base AS (
          SELECT c.c_mktsegment AS segment,
                 o.o_orderkey % {N_FOLDS} AS fold,
                 CAST(FLOOR(CAST(o.o_totalprice AS DOUBLE) * {SCALE} + 0.5)
                   AS BIGINT) AS t
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ), g AS (
          SELECT segment, fold, CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CAST(t AS HUGEINT)) AS s
          FROM base GROUP BY segment, fold
        ), seg AS (
          SELECT segment, SUM(n) AS seg_n, SUM(s) AS seg_s
          FROM g GROUP BY segment
        ), fld AS (
          SELECT fold, SUM(n) AS fold_n, SUM(s) AS fold_s
          FROM g GROUP BY fold
        ), tot AS (
          SELECT SUM(n) AS all_n, SUM(s) AS all_s FROM g
        )
        SELECT g.segment, g.fold, g.n AS n_rows,
               {_TE_OOF} AS enc_oof,
               {_TE_SMOOTH} AS enc_smoothed
        FROM g
        JOIN seg USING (segment)
        JOIN fld USING (fold)
        CROSS JOIN tot
    """,
)
def target_encode_mktsegment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E176: leakage-safe out-of-fold target encoding — the (segment ×
    fold) lookup table that replaces `c_mktsegment` with the mean order
    value of the OTHER folds' rows in that segment, plus the
    additive-smoothed variant ((S_oof + m·prior_oof)/(n_oof + m),
    m=20) whose prior is itself fold-excluded. Folds are
    `o_orderkey % 5` — deterministic, replayable, and uniform.
    A same-fold mean would leak each row's own label into its feature
    (target leakage); this table is what a feature store materializes
    so the training join stays leak-free.

    Exactness: prices fix to 4-dp integers; every fold/segment/global
    moment is an exact 128-bit integer sum; the encodings are
    shared-literal double chains (NULL when a segment lives entirely in
    one fold).

    Scale: ONE keyed aggregate over the fact join collapses everything
    to a |segments|×|folds| frame (25 rows); marginals and encodings
    are arithmetic on that frame — broadcast-sized output regardless of
    corpus size, exactly the shape the training join wants to
    broadcast."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    base = orders.join(
        customer, orders["o_custkey"] == customer["c_custkey"]
    ).select(
        F.col("c_mktsegment").alias("segment"),
        (F.col("o_orderkey") % N_FOLDS).alias("fold"),
        F.floor(F.col("o_totalprice").cast("double") * SCALE + F.lit(0.5))
        .cast("long")
        .alias("t"),
    )
    g = base.groupBy("segment", "fold").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("t").cast("decimal(38,0)")).alias("s"),
    )
    seg = g.groupBy("segment").agg(
        F.sum("n").alias("seg_n"), F.sum("s").alias("seg_s")
    )
    fld = g.groupBy("fold").agg(
        F.sum("n").alias("fold_n"), F.sum("s").alias("fold_s")
    )
    tot = g.agg(F.sum("n").alias("all_n"), F.sum("s").alias("all_s"))
    return (
        g.join(F.broadcast(seg), "segment")
        .join(F.broadcast(fld), "fold")
        .crossJoin(F.broadcast(tot))
        .select(
            "segment",
            "fold",
            F.col("n").alias("n_rows"),
            F.expr(_TE_OOF).alias("enc_oof"),
            F.expr(_TE_SMOOTH).alias("enc_smoothed"),
        )
    )


# --------------------------------------------------------------------------
# E183: decision-stump split finder (weighted Gini over value thresholds)
# --------------------------------------------------------------------------

_SPLIT_SCALE = 100  # 2-dp fixed point for the split feature

#: Weighted Gini impurity of the (<=v | >v) split, algebraically reduced
#: to N·gini = Σ_side (n_side − (pos² + neg²)/n_side) — one shared double
#: chain per candidate row on exact integer counts.
_GINI_W = (
    "(((CAST(nl AS DOUBLE)"
    " - (CAST(pl AS DOUBLE) * pl + CAST(ql AS DOUBLE) * ql) / nl)"
    " + (CAST(nr AS DOUBLE)"
    " - (CAST(pr AS DOUBLE) * pr + CAST(qr AS DOUBLE) * qr) / nr))"
    " / n_total)"
)


def _split_oracle() -> str:
    return f"""
        WITH base AS (
          SELECT CAST(FLOOR(value * {_SPLIT_SCALE} + 0.5) AS BIGINT) AS v,
                 CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
          FROM events WHERE value IS NOT NULL
        ), g AS (
          SELECT v, CAST(SUM(y) AS BIGINT) AS pos,
                 CAST(COUNT(*) - SUM(y) AS BIGINT) AS neg
          FROM base GROUP BY v
        ), cum AS (
          SELECT v,
                 CAST(SUM(pos) OVER w AS BIGINT) AS pl,
                 CAST(SUM(neg) OVER w AS BIGINT) AS ql,
                 CAST(SUM(pos) OVER () AS BIGINT) AS tp,
                 CAST(SUM(neg) OVER () AS BIGINT) AS tn
          FROM g
          WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW)
        ), cand AS (
          SELECT v, pl, ql, pl + ql AS nl,
                 tp - pl AS pr, tn - ql AS qr,
                 (tp + tn) - (pl + ql) AS nr,
                 tp + tn AS n_total
          FROM cum WHERE (tp + tn) - (pl + ql) > 0
        ), scored AS (
          SELECT v, nl, nr, {_GINI_W} AS gw FROM cand
        )
        SELECT CAST(v AS DOUBLE) / {_SPLIT_SCALE} AS split_value,
               nl AS n_left, nr AS n_right, gw AS weighted_gini
        FROM scored
        WHERE gw = (SELECT MIN(gw) FROM scored)
        QUALIFY ROW_NUMBER() OVER (ORDER BY v) = 1
    """


@query("best_split_value_for_purchase", oracle=_split_oracle())
def best_split_value_for_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """E183: the exact decision stump — the single threshold on event
    `value` that best separates purchases from everything else by
    weighted Gini impurity, i.e. the split a tree trainer's first node
    would pick. Feature pipelines use it as a supervised binning /
    feature-importance primitive; it completes E176's encoding story
    with the other classic tabular-ML preprocessing step.

    Method: collapse events to one row per DISTINCT 2-dp value with
    class counts (the XGBoost-style exact greedy enumeration), prefix
    sums give every candidate's left/right class counts, and the
    weighted impurity N·Σ nS(1−Σp²) reduces to Σ(nS−(pos²+neg²)/nS) —
    one shared-literal double chain per candidate on exact integers.
    Argmin tie-breaks to the smallest threshold via exact double
    equality (identical operands both engines).

    Scale: one map-side-combinable collapse, the two-phase distributed
    prefix sum over the value-collapsed frame (the _global_ranks
    shape — bounded by the value DOMAIN, not volume), and 1-row
    min/argmin broadcasts. The right-empty candidate is excluded (its
    impurity is the unsplit baseline)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    y = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    g = ev.select(
        F.floor(F.col("value") * _SPLIT_SCALE + F.lit(0.5))
        .cast("long")
        .alias("v"),
        y.alias("y"),
    ).groupBy("v").agg(
        F.sum("y").cast("long").alias("pos"),
        (F.count(F.lit(1)) - F.sum("y")).cast("long").alias("neg"),
    )
    from pyspark.sql import Window

    from .registry import scoped_persist

    local = scoped_persist(
        g.repartitionByRange(32, "v").select(
            "v", "pos", "neg", F.spark_partition_id().alias("pid")
        )
    )
    w_local = (
        Window.partitionBy("pid")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ptot = local.groupBy("pid").agg(
        F.sum("pos").alias("tp_p"), F.sum("neg").alias("tn_p")
    )
    w_off = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    off = ptot.select(
        "pid",
        F.coalesce(F.sum("tp_p").over(w_off), F.lit(0)).alias("op"),
        F.coalesce(F.sum("tn_p").over(w_off), F.lit(0)).alias("on"),
    )
    tot = ptot.agg(
        F.sum("tp_p").cast("long").alias("tp"),
        F.sum("tn_p").cast("long").alias("tn"),
    )
    cum = (
        local.join(F.broadcast(off), "pid")
        .select(
            "v",
            (F.col("op") + F.sum("pos").over(w_local)).cast("long").alias(
                "pl"
            ),
            (F.col("on") + F.sum("neg").over(w_local)).cast("long").alias(
                "ql"
            ),
        )
        .crossJoin(F.broadcast(tot))
    )
    cand = cum.select(
        "v",
        "pl",
        "ql",
        (F.col("pl") + F.col("ql")).alias("nl"),
        (F.col("tp") - F.col("pl")).alias("pr"),
        (F.col("tn") - F.col("ql")).alias("qr"),
        ((F.col("tp") + F.col("tn")) - (F.col("pl") + F.col("ql"))).alias(
            "nr"
        ),
        (F.col("tp") + F.col("tn")).alias("n_total"),
    ).where(F.col("nr") > 0)
    scored = scoped_persist(
        cand.select("v", "nl", "nr", F.expr(_GINI_W).alias("gw"))
    )
    mn = scored.agg(F.min("gw").alias("mg"))
    best_v = (
        scored.join(F.broadcast(mn), scored["gw"] == mn["mg"])
        .agg(F.min("v").alias("v"))
    )
    return scored.join(F.broadcast(best_v), "v").select(
        (F.col("v").cast("double") / _SPLIT_SCALE).alias("split_value"),
        F.col("nl").alias("n_left"),
        F.col("nr").alias("n_right"),
        F.col("gw").alias("weighted_gini"),
    )


# --------------------------------------------------------------------------
# E187: temporal train/val split leakage audit
# --------------------------------------------------------------------------


@query(
    "temporal_split_leakage_audit",
    oracle="""
        WITH b AS (
          SELECT CAST(MIN(ts) AS DATE)
                 + CAST(date_diff('day', CAST(MIN(ts) AS DATE),
                                  CAST(MAX(ts) AS DATE)) // 2 AS INTEGER)
                   AS mid
          FROM events WHERE user_id IS NOT NULL
        ), per_user AS (
          SELECT user_id,
                 MIN(CAST(ts AS DATE)) AS d_min,
                 MAX(CAST(ts AS DATE)) AS d_max
          FROM events WHERE user_id IS NOT NULL
          GROUP BY user_id
        )
        SELECT CAST(COUNT(*) FILTER (WHERE d_min < b.mid) AS BIGINT)
                 AS n_train_users,
               CAST(COUNT(*) FILTER (WHERE d_max >= b.mid) AS BIGINT)
                 AS n_val_users,
               CAST(COUNT(*) FILTER (WHERE d_min < b.mid
                                       AND d_max >= b.mid) AS BIGINT)
                 AS n_overlap_users,
               CAST(COUNT(*) FILTER (WHERE d_min < b.mid
                                       AND d_max >= b.mid) AS DOUBLE)
                 / NULLIF(COUNT(*) FILTER (WHERE d_max >= b.mid), 0)
                 AS overlap_share
        FROM per_user CROSS JOIN b
    """,
)
def temporal_split_leakage_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """E187: entity-overlap audit of the time-based train/val split —
    E12 splits by doc hash (entity-disjoint by construction); production
    event models split by TIME, and then the same user appears on both
    sides of the cut: any user-level memorization (IDs, embeddings,
    target encodings) leaks future behavior into training metrics. This
    reports how many calendar-midpoint validation users were already
    seen in training — the number that decides between a time split, a
    user split, or user-level feature freezing.

    Exactness: per-user min/max day + integer counts; one double
    division (NULL when the validation side is empty).

    Scale: one user-keyed min/max aggregate (map-side combine), a
    broadcast 1-row midpoint, one global count row."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
    )
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
    per_user = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("d_min"),
        F.max(F.col("ts").cast("date")).alias("d_max"),
    )
    j = per_user.crossJoin(F.broadcast(bounds))
    in_train = F.col("d_min") < F.col("mid")
    in_val = F.col("d_max") >= F.col("mid")
    return j.agg(
        F.count(F.when(in_train, 1)).cast("long").alias("n_train_users"),
        F.count(F.when(in_val, 1)).cast("long").alias("n_val_users"),
        F.count(F.when(in_train & in_val, 1))
        .cast("long")
        .alias("n_overlap_users"),
        (
            F.count(F.when(in_train & in_val, 1)).cast("double")
            / F.nullif(
                F.count(F.when(in_val, 1)).cast("double"), F.lit(0.0)
            )
        ).alias("overlap_share"),
    )


# --------------------------------------------------------------------------
# E188: exact ROC AUC of value as a purchase score (U-statistic form)
# --------------------------------------------------------------------------

_AUC = (
    "(CAST(u_x2 AS DOUBLE)"
    " / (2.0 * CAST(n_pos AS DOUBLE) * n_neg))"
)


@query(
    "value_auc_for_purchase",
    oracle=f"""
        WITH vals AS (
          SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v,
                 CAST(COUNT(*) FILTER (WHERE event_type = 'purchase')
                   AS BIGINT) AS c_pos,
                 CAST(COUNT(*) FILTER (WHERE event_type <> 'purchase')
                   AS BIGINT) AS c_neg
          FROM events WHERE value IS NOT NULL
          GROUP BY 1
        ), ranked AS (
          SELECT c_pos, c_neg, c_pos + c_neg AS t,
                 1 + COALESCE(SUM(c_pos + c_neg) OVER (
                   ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS rank_min
          FROM vals
        ), agg AS (
          SELECT CAST(SUM(c_pos) AS BIGINT) AS n_pos,
                 CAST(SUM(c_neg) AS BIGINT) AS n_neg,
                 CAST(SUM(c_pos * (2 * rank_min + t - 1)) AS BIGINT)
                   AS rank_sum_x2
          FROM ranked
        )
        SELECT n_pos, n_neg,
               rank_sum_x2 - n_pos * (n_pos + 1) AS u_x2,
               {_AUC} AS auc,
               ({_AUC} * 2.0 - 1.0) AS gini_coef
        FROM (
          SELECT *, rank_sum_x2 - n_pos * (n_pos + 1) AS u_x2 FROM agg
        )
    """,
)
def value_auc_for_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E188: exact ROC AUC of event `value` as a purchase classifier —
    THE ranking metric for the features this pack materializes (E176
    encodings, E183 splits), computed distribution-exactly via the
    U-statistic identity AUC = U/(n₊·n₋) with tie-averaged ranks
    (= P(score₊ > score₋) + ½P(tie) — the Mann-Whitney machinery of
    E134 repointed at its ML reading), plus the Gini coefficient
    2·AUC−1. No sorted sweep over raw rows, no trapezoid sums.

    Exactness: events collapse to one row per distinct 2-dp value with
    class counts; tie-averaged rank sums stay integral in doubled units
    (2·avg_rank = 2·rank_min + t − 1); AUC is one shared-literal double
    chain from three exact integers.

    Scale: one map-side-combinable collapse; the rank window runs over
    the value-collapsed frame, bounded by the 2-dp value DOMAIN (≤
    ~100k rows at ANY corpus size — the E134 argument), then one
    1-row aggregate."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    is_pos = F.col("event_type") == "purchase"
    vals = ev.groupBy(
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("v")
    ).agg(
        F.count(F.when(is_pos, 1)).cast("long").alias("c_pos"),
        F.count(F.when(~is_pos, 1)).cast("long").alias("c_neg"),
    )
    from pyspark.sql import Window

    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = vals.select(
        "c_pos",
        "c_neg",
        (F.col("c_pos") + F.col("c_neg")).alias("t"),
        (
            F.lit(1)
            + F.coalesce(
                F.sum(F.col("c_pos") + F.col("c_neg")).over(w), F.lit(0)
            )
        ).alias("rank_min"),
    )
    agg = ranked.agg(
        F.sum("c_pos").cast("long").alias("n_pos"),
        F.sum("c_neg").cast("long").alias("n_neg"),
        F.sum(F.col("c_pos") * (2 * F.col("rank_min") + F.col("t") - 1))
        .cast("long")
        .alias("rank_sum_x2"),
    )
    return agg.withColumn(
        "u_x2",
        F.col("rank_sum_x2") - F.col("n_pos") * (F.col("n_pos") + 1),
    ).select(
        "n_pos",
        "n_neg",
        "u_x2",
        F.expr(_AUC).alias("auc"),
        F.expr(f"({_AUC} * 2.0 - 1.0)").alias("gini_coef"),
    )


# --------------------------------------------------------------------------
# E195: deterministic epoch shard assignment (global training shuffle)
# --------------------------------------------------------------------------

#: Shard count and the epoch being planned (a new epoch = a new salt =
#: a fresh pseudo-random permutation of docs over shards).
N_SHARDS = 64
SHUFFLE_EPOCH = 1
#: Knuth multiplicative hash constant (2654435761 = floor(2^32/phi)) —
#: integer arithmetic only, so BOTH engines compute the identical shard
#: (xxhash64/md5-hex-to-int don't mirror across engines).
_KNUTH_A = 2_654_435_761
_SHARD = (
    f"(((doc_id + {SHUFFLE_EPOCH} * 1000003) * {_KNUTH_A})"
    f" % 4294967296) % {N_SHARDS}"
)


@query(
    "epoch_shard_assignment",
    oracle=f"""
        WITH assign AS (
          SELECT {_SHARD} AS shard,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok,
                 n_chars
          FROM documents
        )
        SELECT CAST(shard AS BIGINT) AS shard,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(ntok) AS BIGINT) AS n_tokens,
               CAST(SUM(n_chars) AS BIGINT) AS n_chars
        FROM assign GROUP BY shard
    """,
)
def epoch_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E195: the global training shuffle as a deterministic shard plan —
    every document lands in one of N_SHARDS shards by a salted Knuth
    multiplicative hash of its id, and a NEW EPOCH is just a new salt
    (a fresh pseudo-random permutation with zero data movement until
    the write). This is how a 100 TB corpus is "shuffled": not a global
    sort, but a hash-assignment whose per-shard token/byte balance this
    query reports (imbalanced shards = stragglers in the training job).

    Exactness: pure integer arithmetic (the Knuth constant over a 2³²
    ring) — engine-identical, unlike xxhash64 (Spark-only) or
    md5-hex-to-int (no portable hex cast); token/byte sums exact.

    Scale: one narrow projection + one 64-group aggregate; the eventual
    shard WRITE is `repartition(N_SHARDS, shard)` on the same key —
    this query is its dry-run audit."""
    docs = load_table(spark, sf_dir, "documents")
    shard_expr = (
        (
            (F.col("doc_id") + SHUFFLE_EPOCH * 1_000_003) * _KNUTH_A
        ) % 4294967296
    ) % N_SHARDS
    return (
        docs.select(
            shard_expr.cast("long").alias("shard"),
            F.size(F.split(F.col("text"), " ")).cast("long").alias("ntok"),
            "n_chars",
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("ntok").cast("long").alias("n_tokens"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )
    )


# --------------------------------------------------------------------------
# E218: hashing-trick feature buckets + collision audit
# --------------------------------------------------------------------------

#: Hashed feature-space width. Deliberately small so the audit SHOWS
#: collisions at bench scale; production widths (2^18..2^22) make the
#: same query a near-identity report.
FEATURE_HASH_D = 64
#: Engine-portable token hash: polynomial char fold (the E4 fingerprint
#: convention) re-mixed by two Knuth multipliers — one for the bucket,
#: one for the hashing-trick sign bit (Weinberger et al. 2009: a signed
#: hash makes collisions cancel in expectation instead of biasing up).
_FH_MOD = 1_000_000_007
_FH_BUCKET_A = 2_654_435_761
_FH_SIGN_A = 2_246_822_519


@query(
    "feature_hash_collision_audit",
    oracle=f"""
        WITH tok AS (
          SELECT unnest(string_split(text, ' ')) AS token FROM documents
        ), vocab AS (
          SELECT token, CAST(COUNT(*) AS BIGINT) AS c
          FROM tok WHERE token <> '' GROUP BY token
        ), hashed AS (
          SELECT ((list_reduce(
                    list_prepend(
                      CAST(0 AS BIGINT),
                      list_transform(
                        range(1, length(token) + 1),
                        i -> CAST(ascii(substr(token, CAST(i AS INTEGER), 1))
                               AS BIGINT)
                      )
                    ),
                    (acc, ch) -> (acc * 31 + ch) % {_FH_MOD}
                  ) * {_FH_BUCKET_A}) % 4294967296) AS hb,
                 ((list_reduce(
                    list_prepend(
                      CAST(0 AS BIGINT),
                      list_transform(
                        range(1, length(token) + 1),
                        i -> CAST(ascii(substr(token, CAST(i AS INTEGER), 1))
                               AS BIGINT)
                      )
                    ),
                    (acc, ch) -> (acc * 31 + ch) % {_FH_MOD}
                  ) * {_FH_SIGN_A}) % 4294967296) % 2 AS sb,
                 c
          FROM vocab
        )
        SELECT CAST(hb % {FEATURE_HASH_D} AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(c) AS BIGINT) AS total_count,
               CAST(SUM(CASE WHEN sb = 0 THEN c ELSE -c END) AS BIGINT)
                 AS signed_count
        FROM hashed
        GROUP BY 1
    """,
)
def feature_hash_collision_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """E218: the hashing trick (feature hashing) over the corpus
    vocabulary, with its collision audit — the fixed-width, vocab-free
    featurization a 100 TB text pipeline uses when a materialized
    vocabulary is operationally off the table. Each bucket reports how
    many DISTINCT tokens landed on it (collisions), the total mass, and
    the SIGNED mass (Weinberger's sign trick: collisions cancel in
    expectation — |signed| << total on a collided bucket is the trick
    visibly working).

    Engine-portable hashing: xxhash64 exists only in Spark, so the
    bucket comes from the E4 polynomial char fold re-mixed by two Knuth
    multipliers (bucket and sign draw on DIFFERENT multipliers — the
    sign must not be a function of the bucket). Pure integer ops both
    engines.

    Scale: tokens collapse to the VOCABULARY before any hashing (the
    char fold runs once per distinct token, not once per corpus token),
    then one |vocab| -> D shuffle. The explode is the unavoidable
    linear pass; everything downstream is vocabulary-sized."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(
            F.explode(F.split(F.col("text"), " ")).alias("token")
        )
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    codes = F.transform(
        F.sequence(F.lit(1), F.length("token")),
        lambda i: F.ascii(
            F.substring(F.col("token"), i, F.lit(1))
        ).cast("long"),
    )
    h = F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * 31 + ch) % _FH_MOD,
    )
    hashed = vocab.select(
        ((h * _FH_BUCKET_A) % 4294967296).alias("hb"),
        (((h * _FH_SIGN_A) % 4294967296) % 2).alias("sb"),
        "c",
    )
    return hashed.groupBy(
        (F.col("hb") % FEATURE_HASH_D).cast("long").alias("bucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("c").cast("long").alias("total_count"),
        F.sum(
            F.when(F.col("sb") == 0, F.col("c")).otherwise(-F.col("c"))
        )
        .cast("long")
        .alias("signed_count"),
    )


# --------------------------------------------------------------------------
# E219: score-decile calibration / cumulative-gains table
# --------------------------------------------------------------------------

_CAL_DECILES = 10


@query(
    "value_decile_calibration",
    oracle=f"""
        WITH vals AS (
          SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v,
                 CAST(COUNT(*) AS BIGINT) AS t,
                 CAST(COUNT(*) FILTER (WHERE event_type = 'purchase')
                   AS BIGINT) AS pos
          FROM events WHERE value IS NOT NULL
          GROUP BY 1
        ), ranked AS (
          SELECT v, t, pos,
                 COALESCE(SUM(t) OVER (
                   ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS rank0,
                 CAST(SUM(t) OVER () AS BIGINT) AS n,
                 CAST(SUM(pos) OVER () AS BIGINT) AS n_pos
          FROM vals
        ), bucketed AS (
          SELECT (rank0 * {_CAL_DECILES}) // n AS decile,
                 n, n_pos, t, pos
          FROM ranked
        ), per AS (
          SELECT decile, n, n_pos,
                 CAST(SUM(t) AS BIGINT) AS n_events,
                 CAST(SUM(pos) AS BIGINT) AS n_purchases
          FROM bucketed GROUP BY 1, 2, 3
        )
        SELECT CAST(decile AS BIGINT) AS decile, n_events, n_purchases,
               CAST(n_purchases AS DOUBLE) / n_events AS purchase_rate,
               CAST(SUM(n_events) OVER w AS DOUBLE) / n AS cum_event_share,
               CAST(SUM(n_purchases) OVER w AS DOUBLE)
                 / NULLIF(n_pos, 0) AS cum_purchase_share,
               CAST(n_purchases AS DOUBLE) * n
                 / (CAST(n_events AS DOUBLE) * NULLIF(n_pos, 0)) AS lift
        FROM per
        WINDOW w AS (ORDER BY decile DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def value_decile_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E219: calibration / cumulative-gains table of event value read as
    a purchase score — the reliability diagram behind every "is this
    score usable for targeting" decision: per value-decile purchase
    rate (calibration), plus top-down cumulative gains and lift (if you
    action the top k deciles, what share of purchases do you capture?).

    Decile assignment is VALUE-DOMAIN exact: rows collapse to distinct
    2-dp values (E188's argument), each value cell goes wholly to
    decile floor(rank0 * 10 / n) from its cumulative predecessor count
    — a deterministic whole-cell rule both engines compute identically
    (no within-tie row splitting, which would be order-dependent).
    Heavily tied score distributions therefore yield FEWER than 10
    occupied deciles rather than nondeterministic splits.

    Scale: one map-side collapse to the value domain, domain-bounded
    prefix windows, then arithmetic on a <=10-row frame."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    sv = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    is_pos = F.col("event_type") == "purchase"
    vals = ev.groupBy(sv.alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("t"),
        F.count(F.when(is_pos, 1)).cast("long").alias("pos"),
    )
    w_prev = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = vals.select(
        "t",
        "pos",
        F.coalesce(F.sum("t").over(w_prev), F.lit(0)).alias("rank0"),
        F.sum("t").over(w_all).cast("long").alias("n"),
        F.sum("pos").over(w_all).cast("long").alias("n_pos"),
    )
    per = (
        ranked.select(
            F.expr(f"(rank0 * {_CAL_DECILES}) div n").alias("decile"),
            "n",
            "n_pos",
            "t",
            "pos",
        )
        .groupBy("decile", "n", "n_pos")
        .agg(
            F.sum("t").cast("long").alias("n_events"),
            F.sum("pos").cast("long").alias("n_purchases"),
        )
    )
    w_gain = Window.orderBy(F.col("decile").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return per.select(
        F.col("decile").cast("long").alias("decile"),
        "n_events",
        "n_purchases",
        (F.col("n_purchases").cast("double") / F.col("n_events")).alias(
            "purchase_rate"
        ),
        (
            F.sum("n_events").over(w_gain).cast("double") / F.col("n")
        ).alias("cum_event_share"),
        (
            F.sum("n_purchases").over(w_gain).cast("double")
            / F.nullif(F.col("n_pos"), F.lit(0)).cast("double")
        ).alias("cum_purchase_share"),
        (
            F.col("n_purchases").cast("double")
            * F.col("n")
            / (
                F.col("n_events").cast("double")
                * F.nullif(F.col("n_pos"), F.lit(0)).cast("double")
            )
        ).alias("lift"),
    )


# --------------------------------------------------------------------------
# E221: split-conformal prediction interval with holdout coverage check
# --------------------------------------------------------------------------

#: Nominal coverage level (alpha = 0.1). The conformal quantile index is
#: ceil((1-alpha) * (n_cal + 1)) — the finite-sample-valid choice
#: (Vovk et al.; Angelopoulos & Bates 2023 tutorial convention).
_CONF_NUM = 9  # (1-alpha) as the rational 9/10
_CONF_DEN = 10

from .robuststats import _d128  # noqa: E402


def _conformal_oracle() -> str:
    hw = f"({_d128('qhat', '//')} / (CAST(n_cal AS DOUBLE) * 100.0))"
    return f"""
        WITH vals AS (
          SELECT event_id % 2 = 0 AS is_cal,
                 CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v
          FROM events WHERE value IS NOT NULL
        ), cal AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_cal,
                 CAST(SUM(v) AS HUGEINT) AS s
          FROM vals WHERE is_cal
        ), res AS (
          SELECT ABS(CAST(v AS HUGEINT) * c.n_cal - c.s) AS r,
                 CAST(COUNT(*) AS BIGINT) AS cnt
          FROM vals, cal c WHERE is_cal
          GROUP BY 1
        ), q AS (
          SELECT MIN(r) AS qhat FROM (
            SELECT r, SUM(cnt) OVER (
              ORDER BY r ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS cum FROM res
          ), cal c
          WHERE cum >= ({_CONF_NUM} * (c.n_cal + 1) + {_CONF_DEN} - 1)
                       // {_CONF_DEN}
        ), tst AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
                 CAST(COUNT(*) FILTER (
                   WHERE ABS(CAST(v AS HUGEINT) * c.n_cal - c.s)
                         <= q.qhat) AS BIGINT) AS n_covered
          FROM vals, cal c, q WHERE NOT is_cal
        )
        SELECT c.n_cal, t.n_test,
               {_d128('s', '//')} / (CAST(n_cal AS DOUBLE) * 100.0)
                 AS pred_mean,
               {hw} AS halfwidth,
               CAST(t.n_covered AS DOUBLE) / NULLIF(t.n_test, 0)
                 AS coverage,
               CAST(0.9 AS DOUBLE) AS target_coverage
        FROM cal c, q, tst t
    """


@query("conformal_value_interval", oracle=_conformal_oracle())
def conformal_value_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E221: split-conformal prediction interval for event value under
    the global-mean predictor, with its empirical holdout coverage —
    the distribution-free uncertainty wrapper modern ML pipelines put
    around ANY point predictor: calibrate |y - yhat| on one half, take
    the ceil((1-a)(n+1))-th smallest nonconformity as the interval
    half-width, and the guarantee P(covered) >= 1-a holds with no
    distributional assumptions. The test-half coverage column is the
    guarantee audited.

    Exactness: with the global-mean predictor every residual shares one
    denominator, so |v*n - s| keeps all nonconformities INTEGRAL
    (128-bit) — the quantile is a counting quantile over the residual
    DOMAIN (bounded by the 2-dp value domain), the coverage compare is
    integer-vs-integer, the quantile index is one integer ceil-div, and
    doubles appear only in the final 2^53-split chain.

    Scale: one pass collapses both halves to the value domain; the only
    ordered pass is the prefix sum over the bounded residual frame."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    vals = scoped_persist(
        ev.select(
            (F.col("event_id") % 2 == 0).alias("is_cal"),
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("long")
            .alias("v"),
        )
    )
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    cal = vals.where("is_cal").agg(
        F.count(F.lit(1)).cast("long").alias("n_cal"),
        F.sum(dec(F.col("v"))).alias("s"),
    )
    res = (
        vals.where("is_cal")
        .crossJoin(F.broadcast(cal))
        .groupBy(
            F.abs(dec(F.col("v")) * F.col("n_cal") - F.col("s")).alias("r")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w = Window.orderBy("r").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    q = (
        res.select("r", F.sum("cnt").over(w).alias("cum"))
        .crossJoin(F.broadcast(cal))
        .where(
            F.col("cum")
            >= F.expr(
                f"({_CONF_NUM} * (n_cal + 1) + {_CONF_DEN} - 1)"
                f" div {_CONF_DEN}"
            )
        )
        .agg(F.min("r").alias("qhat"))
    )
    tst = (
        vals.where(~F.col("is_cal"))
        .crossJoin(F.broadcast(cal))
        .crossJoin(F.broadcast(q))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.count(
                F.when(
                    F.abs(dec(F.col("v")) * F.col("n_cal") - F.col("s"))
                    <= F.col("qhat"),
                    1,
                )
            )
            .cast("long")
            .alias("n_covered"),
        )
    )
    hw = f"({_d128('qhat', 'div')} / (CAST(n_cal AS DOUBLE) * 100.0))"
    return (
        cal.crossJoin(F.broadcast(q))
        .crossJoin(F.broadcast(tst))
        .select(
            "n_cal",
            "n_test",
            F.expr(
                f"{_d128('s', 'div')} / (CAST(n_cal AS DOUBLE) * 100.0)"
            ).alias("pred_mean"),
            F.expr(hw).alias("halfwidth"),
            (
                F.col("n_covered").cast("double")
                / F.nullif(F.col("n_test"), F.lit(0)).cast("double")
            ).alias("coverage"),
            F.lit(0.9).alias("target_coverage"),
        )
    )


# --------------------------------------------------------------------------
# E224: cross-source quantile normalization (batch-effect correction)
# --------------------------------------------------------------------------


@query(
    "doc_length_quantile_normalize",
    oracle="""
        WITH pooled AS (
          SELECT n_chars AS v, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM documents GROUP BY 1
        ), pcum AS (
          SELECT v, SUM(cnt) OVER (
            ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
          ) AS cum FROM pooled
        ), tot AS (
          SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM pooled
        ), src AS (
          SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM documents GROUP BY 1, 2
        ), scum AS (
          SELECT source, v, cnt,
                 SUM(cnt) OVER (
                   PARTITION BY source ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS cum_s,
                 SUM(cnt) OVER (PARTITION BY source) AS n_s
          FROM src
        ), targets AS (
          SELECT source, v, cnt, cum_s,
                 (cum_s * t.n + n_s - 1) // n_s AS tgt
          FROM scum, tot t
        )
        SELECT source,
               CAST(v AS BIGINT) AS length,
               cnt AS n_docs,
               CAST(cum_s AS BIGINT) AS cum_source,
               CAST((SELECT MIN(p.v) FROM pcum p WHERE p.cum >= tgt)
                 AS BIGINT) AS normalized_length
        FROM targets
    """,
)
def doc_length_quantile_normalize(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """E224: quantile normalization of per-source document-length
    distributions onto the POOLED corpus distribution — the
    batch-effect correction genomics normalizes microarrays with,
    repointed at the corpus problem it solves for training data: two
    sources whose "long document" means different things get their
    length (or any score) axes made comparable before thresholds/
    mixtures treat them as one scale. Each (source, length) cell maps
    to the pooled value at its within-source quantile: the type-1
    inverse CDF, normalized = min{ v' : cum_pooled(v') >= ceil(r_s *
    N / n_s) }.

    Exactness: ranks and targets are exact integers (one ceil-division
    in integer form), and the inverse-CDF lookup is the E123 as-of
    machinery (union + ordered carry) — no float appears anywhere.

    Scale: everything after the two map-side collapses lives on
    DOMAIN-bounded frames (|lengths| and |sources|x|lengths| cells, not
    docs); the as-of mapping is one union-sort of those two bounded
    frames. The global windows ride the same waiver as the equidepth
    family."""
    docs = load_table(spark, sf_dir, "documents")
    pooled = docs.groupBy(F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    w_p = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pcum = pooled.select(
        F.col("v").alias("pv"), F.sum("cnt").over(w_p).alias("cum")
    )
    tot = pooled.agg(F.sum("cnt").cast("long").alias("n"))
    src = docs.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    w_s = (
        Window.partitionBy("source")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("source")
    targets = (
        src.select(
            "source",
            "v",
            "cnt",
            F.sum("cnt").over(w_s).alias("cum_s"),
            F.sum("cnt").over(w_tot).alias("n_s"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "v",
            "cnt",
            "cum_s",
            F.expr("(cum_s * n + n_s - 1) div n_s").alias("tgt"),
            F.lit(1).alias("one"),
        )
    )
    from .temporal import asof_join

    mapped = asof_join(
        targets,
        pcum.select(F.lit(1).alias("one"), "cum", "pv"),
        on="one",
        left_ts="tgt",
        right_ts="cum",
        right_cols=["pv"],
        direction="forward",
    )
    return mapped.select(
        "source",
        F.col("v").cast("long").alias("length"),
        F.col("cnt").alias("n_docs"),
        F.col("cum_s").cast("long").alias("cum_source"),
        F.col("pv").cast("long").alias("normalized_length"),
    )
