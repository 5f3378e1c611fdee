"""Privacy operators: PII detection/redaction and log anonymization.

Standard compliance stages of both pipelines this repo serves:

  * **PII scrub** — the LLM-training-corpus pass (the C4/Dolma lineage):
    find and redact emails, IPv4 addresses, and phone numbers in document
    text before training. Pure ``regexp_count``/``regexp_replace``
    projections — JVM regex inside whole-stage codegen, no UDF, no
    shuffle; embarrassingly parallel at any corpus size.

  * **log anonymization** — the GDPR-style pass over the reference's
    domain (Apache access logs, sree-etl-tdk-lambda.py parses full client
    IPs and identities): truncate the IP's last octet and replace the
    user id with an irreversible content-hash pseudonym, keeping the
    columns analytics joins on.

The synthetic corpus is PII-free word-soup, so ``pii_scrub`` plants a
deterministic contact string derived from ``doc_id`` (same expression in
the oracle — the planted text is part of the query contract, like the
probe slice in hygiene.benchmark_decontaminate); the regexes then do
real extraction work that DuckDB re-verifies independently.

Regex parity note: patterns stick to the syntax subset (character
classes, ``\\d``, ``{m,n}``, ``\\b``) that Java regex (Spark) and RE2
(DuckDB) interpret identically; DuckDB needs the explicit ``'g'`` flag
where Spark's regexp_replace is always-global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# -- patterns (Java regex == RE2 on this subset) ---------------------------
EMAIL_RX = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RX = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RX = r"\+\d{1,2} \d{3}-\d{4}"

#: planted contact line: one email, one IPv4, one phone per document,
#: all deterministic functions of doc_id so the oracle replays them.
_PLANT_SPARK = (
    "concat(text, ' contact user', doc_id, '@example.org or 203.0.',"
    " pmod(doc_id, 113), '.', pmod(doc_id, 251),"
    " ' or +1 555-', lpad(cast(pmod(doc_id, 10000) as string), 4, '0'))"
)
_PLANT_SQL = (
    "text || ' contact user' || doc_id || '@example.org or 203.0.'"
    " || (doc_id % 113) || '.' || (doc_id % 251)"
    " || ' or +1 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)


def scrub_pii(full_text: F.Column) -> dict[str, F.Column]:
    """The redaction expressions over ANY text column: per-category match
    counts (taken before redaction) and the scrubbed text. Email first —
    its local/domain parts contain digits and dots that the IP/phone
    patterns could otherwise chew on."""
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(full_text, EMAIL_RX, "<EMAIL>"),
            IPV4_RX,
            "<IP>",
        ),
        PHONE_RX,
        "<PHONE>",
    )
    return {
        "n_emails": F.regexp_count(full_text, F.lit(EMAIL_RX)).cast("long"),
        "n_ips": F.regexp_count(full_text, F.lit(IPV4_RX)).cast("long"),
        "n_phones": F.regexp_count(full_text, F.lit(PHONE_RX)).cast("long"),
        "clean_text": redacted,
    }


@query(
    "pii_scrub",
    oracle=f"""
        WITH t AS (
          SELECT doc_id, {_PLANT_SQL} AS full_text FROM documents
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(full_text, '{EMAIL_RX}'))
                    AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(full_text, '{IPV4_RX}'))
                    AS BIGINT) AS n_ips,
               CAST(len(regexp_extract_all(full_text, '{PHONE_RX}'))
                    AS BIGINT) AS n_phones,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(full_text, '{EMAIL_RX}', '<EMAIL>', 'g'),
                   '{IPV4_RX}', '<IP>', 'g'),
                 '{PHONE_RX}', '<PHONE>', 'g') AS clean_text
        FROM t
    """,
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over the corpus: per-document email/IP/phone match
    counts and the text with every match replaced by a typed placeholder.
    One narrow projection — scan-parallel, pushdown-friendly, nothing
    leaves codegen."""
    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id", F.expr(_PLANT_SPARK).alias("full_text")
    )
    cols = scrub_pii(F.col("full_text"))
    return planted.select(
        "doc_id", *[c.alias(n) for n, c in cols.items()]
    )


@query(
    "log_anonymize",
    oracle="""
        WITH t AS (
          SELECT event_id, user_id,
                 '203.0.' || (event_id % 113) || '.' || (event_id % 251)
                   AS ip, event_type
          FROM events
        )
        SELECT event_id,
               regexp_replace(ip, '\\.\\d{1,3}$', '.0') AS ip_anon,
               CASE WHEN user_id IS NULL THEN NULL
                    ELSE substring(md5('u' || user_id), 1, 12)
               END AS user_pseudo,
               event_type
        FROM t
    """,
)
def log_anonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR-style access-log anonymization: last IP octet truncated to
    ``.0`` (the common /24 coarsening — still joins against subnet-level
    geo/abuse tables) and the user id replaced by a salted-hash pseudonym
    (irreversible, but STABLE: the same user maps to the same pseudonym,
    so per-user analytics — requests_per_user, sessionize — keep working
    on the anonymized frame). The client IP is synthesized from event_id
    the same way clf_subnet_traffic stands in for the parsed CLF frame.
    NULL user (the CLF ``-``) stays NULL rather than becoming a shared
    fake identity. Narrow projection, no shuffle."""
    events = load_table(spark, sf_dir, "events")
    ip = F.concat(
        F.lit("203.0."),
        F.pmod(F.col("event_id"), F.lit(113)).cast("string"),
        F.lit("."),
        F.pmod(F.col("event_id"), F.lit(251)).cast("string"),
    )
    return events.select(
        "event_id",
        F.regexp_replace(ip, r"\.\d{1,3}$", ".0").alias("ip_anon"),
        F.when(
            F.col("user_id").isNotNull(),
            F.substring(
                F.md5(
                    F.encode(
                        F.concat(F.lit("u"), F.col("user_id").cast("string")),
                        "UTF-8",
                    )
                ),
                1,
                12,
            ),
        ).alias("user_pseudo"),
        "event_type",
    )


# ---------------------------------------------------------------------------
# E73: k-anonymity / l-diversity audit
# ---------------------------------------------------------------------------

#: Minimum acceptable equivalence-class size for the quasi-identifier set.
K_ANONYMITY_THRESHOLD = 5


@query(
    "k_anonymity_audit",
    oracle=f"""
        SELECT c_nationkey AS nationkey,
               c_mktsegment AS segment,
               CAST(COUNT(*) AS BIGINT) AS group_size,
               CAST(COUNT(DISTINCT CASE WHEN c_acctbal < 0 THEN 'neg'
                                        ELSE 'nonneg' END) AS BIGINT)
                 AS l_diversity,
               CAST(CASE WHEN COUNT(*) < {K_ANONYMITY_THRESHOLD}
                         THEN 1 ELSE 0 END AS INTEGER) AS below_k
        FROM customer
        GROUP BY c_nationkey, c_mktsegment
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E73: re-identification risk audit before releasing a dataset —
    the size of every quasi-identifier equivalence class (here
    nation × market segment) plus its l-diversity over a sensitive
    attribute (account-balance sign). Classes below k are the rows an
    attacker can single out; l=1 classes leak the sensitive value even
    at large k (homogeneity attack). One hash aggregate over the QI
    key; the distinct-count rides the same shuffle (its domain is 2
    values, so the partial aggregate stays tiny). At 100 TB widen the
    QI set and the same single-aggregate shape holds."""
    customer = load_table(spark, sf_dir, "customer")
    sens = F.when(F.col("c_acctbal") < 0, F.lit("neg")).otherwise(
        F.lit("nonneg")
    )
    return (
        customer.groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.count_distinct(sens).alias("l_diversity"),
        )
        .withColumn(
            "below_k",
            F.when(
                F.col("group_size") < K_ANONYMITY_THRESHOLD, 1
            ).otherwise(0).cast("int"),
        )
    )


# --------------------------------------------------------------------------
# E115: local differential privacy — randomized-response share estimation
# --------------------------------------------------------------------------


@query(
    "randomized_response_purchase_share",
    oracle="""
        WITH rr AS (
          SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                   AS day,
                 CASE WHEN substring(md5(CAST(event_id AS VARCHAR)), 1, 2)
                           < 'c0'
                      THEN CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END
                      ELSE CASE WHEN event_type = 'purchase'
                                THEN 0 ELSE 1 END
                 END AS reported
          FROM events
        )
        SELECT day,
               COUNT(*) AS n_events,
               CAST(SUM(reported) AS BIGINT) AS reported_ones,
               CAST(4 * SUM(reported) - COUNT(*) AS DOUBLE) / 2
                 AS est_purchases,
               CAST(4 * SUM(reported) - COUNT(*) AS DOUBLE)
                 / (2 * COUNT(*)) AS est_share
        FROM rr GROUP BY day
    """,
)
def randomized_response_purchase_share(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """E115: local-DP telemetry — per-day purchase share estimated from
    RANDOMIZED RESPONSES only (Warner 1965; the RAPPOR primitive): each
    event reports its true is-purchase bit with p=3/4, the flipped bit
    with 1/4, giving ε = ln 3 local differential privacy; the collector
    unbiases with T̂ = (4·Σreported − n)/2 and never aggregates the raw
    bit. The whole operator is one map-side-combinable aggregate — at
    100 TB it is exactly as cheap as the non-private count it replaces.

    Determinism: the "coin" is the first byte of md5(event_id) < 0xC0
    (192/256 = 3/4 exactly), reproducible bit-for-bit in both engines —
    so the estimate is hash-gated, not just statistically plausible.
    The estimator arithmetic is exact: (4r − n) is BIGINT; the /2 and
    /(2n) are single correctly-rounded divides. A production rollout
    would swap the hash coin for a client-side CSPRNG; the estimator,
    plan shape, and accuracy bound (|T̂ − T| = O(√n) whp) are identical.
    """
    events = load_table(spark, sf_dir, "events")
    coin_true = (
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 2) < "c0"
    )
    is_purchase = (F.col("event_type") == "purchase").cast("int")
    reported = F.when(coin_true, is_purchase).otherwise(
        1 - is_purchase
    )
    rr = events.select(
        F.unix_date(F.to_date("ts")).cast("long").alias("day"),
        reported.alias("reported"),
    )
    agg = rr.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("reported").alias("reported_ones"),
    )
    est_num = 4 * F.col("reported_ones") - F.col("n_events")
    return agg.select(
        "day",
        "n_events",
        "reported_ones",
        (est_num.cast("double") / 2).alias("est_purchases"),
        (
            est_num.cast("double") / (2 * F.col("n_events"))
        ).alias("est_share"),
    )


# --------------------------------------------------------------------------
# E162: central-DP histogram release (two-sided geometric mechanism)
# --------------------------------------------------------------------------

#: ε = ln 3 → α = e^(−ε) = 1/3 EXACTLY, so the geometric CDF thresholds
#: floor((1 − 3^−(k+1))·2^32) are exact integers computed once and
#: rendered as the SAME literal table in both engines (the E142
#: inverse-CDF discipline). Truncation at k=20: P(G>20) = 3^−21 ≈ 1e-10.
_GEO_T = [2863311530, 3817748707, 4135894433, 4241943008, 4277292533,
          4289075708, 4293003433, 4294312675, 4294749089, 4294894560,
          4294943050, 4294959214, 4294964602, 4294966398, 4294966996,
          4294967196, 4294967262, 4294967284, 4294967292, 4294967294,
          4294967295]
_GEO_CASE = (
    "CASE "
    + " ".join(f"WHEN u < {t} THEN {k}" for k, t in enumerate(_GEO_T))
    + " ELSE 21 END"
)
#: Two uniforms per released cell from one digest: chars 1-8 and 9-16 of
#: md5('dp_' || event_type).
_DP_U_SPARK = "CAST(conv(substring(h, {o}, 8), 16, 10) AS BIGINT)"
_DP_U_DUCK = "CAST(('0x' || substring(h, {o}, 8)) AS BIGINT)"


@query(
    "dp_type_histogram",
    oracle=f"""
        WITH c AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_true
          FROM events GROUP BY 1
        ), hh AS (
          SELECT event_type, n_true,
                 md5('dp_' || event_type) AS h
          FROM c
        ), noise AS (
          SELECT event_type, n_true,
                 ({_GEO_CASE.replace("u", "u1")})
                 - ({_GEO_CASE.replace("u", "u2")}) AS z
          FROM (
            SELECT event_type, n_true,
                   {_DP_U_DUCK.format(o=1)} AS u1,
                   {_DP_U_DUCK.format(o=9)} AS u2
            FROM hh
          )
        )
        SELECT event_type, CAST(n_true + z AS BIGINT) AS n_released,
               CAST(z AS BIGINT) AS noise
        FROM noise
    """,
)
def dp_type_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E162: ε-differentially-private histogram release of per-type
    event counts via the two-sided geometric mechanism (Ghosh-
    Roughgarden-Sundararajan'09 — the discrete Laplace, utility-optimal
    for counts): released = true + (G₁ − G₂), Gᵢ geometric with
    α = e^(−ε) = 1/3 (ε = ln 3, chosen so every CDF threshold is an
    EXACT integer literal shared between engines). The "noise" draws are
    md5-derived through the literal inverse-CDF table — the E115/E142
    deterministic-coin discipline, which makes the release reproducible
    and hash-checkable across engines (a production deployment would
    swap the digest seed for a secret per-release nonce; the mechanism,
    sensitivity-1 counting query, and collector shape are exactly this).
    The true count never leaves this operator in a real release — it is
    emitted here only through the noise column the tests audit.

    Scale: ONE map-side-combinable count pass; the mechanism runs on the
    |types|-row result — release cost is independent of data volume."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_true")
    )
    hh = c.select(
        "event_type",
        "n_true",
        F.md5(F.concat(F.lit("dp_"), F.col("event_type"))).alias("h"),
    )
    uu = hh.select(
        "event_type",
        "n_true",
        F.expr(_DP_U_SPARK.format(o=1)).alias("u1"),
        F.expr(_DP_U_SPARK.format(o=9)).alias("u2"),
    )
    g1 = F.expr(_GEO_CASE.replace("u", "u1"))
    g2 = F.expr(_GEO_CASE.replace("u", "u2"))
    z = (g1 - g2).cast("long")
    return uu.select(
        "event_type",
        (F.col("n_true") + z).cast("long").alias("n_released"),
        z.alias("noise"),
    )


# --------------------------------------------------------------------------
# E177: t-closeness audit (sensitive-distribution distance per QI class)
# --------------------------------------------------------------------------

_TCLOSE = "CAST(t_num AS DOUBLE) / (2.0 * n_g * n_total)"


@query(
    "t_closeness_audit",
    oracle=f"""
        WITH cells AS (
          SELECT c_nationkey AS nationkey, c_mktsegment AS segment,
                 CAST(FLOOR(CAST(c_acctbal AS DOUBLE) / 1000) AS BIGINT)
                   AS sbucket,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM customer
          GROUP BY 1, 2, 3
        ), grp AS (
          SELECT nationkey, segment, CAST(SUM(c) AS BIGINT) AS n_g
          FROM cells GROUP BY 1, 2
        ), gmarg AS (
          SELECT sbucket, CAST(SUM(c) AS BIGINT) AS c_s
          FROM cells GROUP BY 1
        ), tot AS (
          SELECT CAST(SUM(c) AS BIGINT) AS n_total FROM cells
        ), present AS (
          SELECT ce.nationkey, ce.segment, g.n_g, t.n_total,
                 SUM(ABS(CAST(ce.c AS HUGEINT) * t.n_total
                         - CAST(gl.c_s AS HUGEINT) * g.n_g)) AS sum_abs,
                 CAST(SUM(gl.c_s) AS BIGINT) AS c_present
          FROM cells ce
          JOIN grp g USING (nationkey, segment)
          JOIN gmarg gl USING (sbucket)
          CROSS JOIN tot t
          GROUP BY 1, 2, 3, 4
        )
        SELECT nationkey, segment, n_g AS group_size,
               {_TCLOSE} AS t_closeness
        FROM (
          SELECT nationkey, segment, n_g, n_total,
                 sum_abs + CAST(n_total - c_present AS HUGEINT) * n_g
                   AS t_num
          FROM present
        )
    """,
)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E177: t-closeness — for every quasi-identifier class (nation ×
    segment), the total-variation distance between its sensitive-value
    distribution (account balance in fixed 1000-unit bands) and the
    global one. Completes the release-audit ladder k-anonymity →
    l-diversity (E73) → t-closeness (Li/Li/Venkatasubramanian, ICDE
    2007): a class can be large (k ok) and diverse (l ok) yet still
    leak via a SKEWED sensitive distribution; TVD ≤ t is the guarantee
    that membership reveals almost nothing beyond the public marginal.

    TVD over the bounded band domain, including bands ABSENT from a
    class: Σ_present |c_s·N − C_s·n_g| + (N − ΣC_present)·n_g, all
    exact 128-bit integers (cross-multiplied — no per-band division),
    then ONE shared-literal double division by 2·n_g·N.

    Scale: one aggregate to the (QI × band) cell frame, a keyed join
    against the |QI| group frame, a broadcast against the ≤11-row band
    marginal, and a 1-row total crossJoin — every frame after the first
    aggregate is bounded by DOMAIN sizes, not row counts."""
    customer = load_table(spark, sf_dir, "customer")
    cells = customer.groupBy(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("c_acctbal").cast("double") / 1000)
        .cast("long")
        .alias("sbucket"),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    grp = cells.groupBy("nationkey", "segment").agg(
        F.sum("c").cast("long").alias("n_g")
    )
    glob = cells.groupBy("sbucket").agg(
        F.sum("c").cast("long").alias("c_s")
    )
    tot = cells.agg(F.sum("c").cast("long").alias("n_total"))
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    present = (
        cells.join(grp, ["nationkey", "segment"])
        .join(F.broadcast(glob), "sbucket")
        .crossJoin(F.broadcast(tot))
        .groupBy("nationkey", "segment", "n_g", "n_total")
        .agg(
            F.sum(
                F.abs(
                    dec("c") * F.col("n_total") - dec("c_s") * F.col("n_g")
                )
            ).alias("sum_abs"),
            F.sum("c_s").cast("long").alias("c_present"),
        )
    )
    tnum = present.select(
        "nationkey",
        "segment",
        "n_g",
        "n_total",
        (
            F.col("sum_abs")
            + (F.col("n_total") - F.col("c_present")).cast("decimal(38,0)")
            * F.col("n_g")
        ).alias("t_num"),
    )
    return tnum.select(
        "nationkey",
        "segment",
        F.col("n_g").alias("group_size"),
        F.expr(_TCLOSE).alias("t_closeness"),
    )


# --------------------------------------------------------------------------
# E238: k-anonymity generalization planner (lattice search, one shuffle)
# --------------------------------------------------------------------------

#: Anonymity target: every quasi-identifier group must hold >= K people.
KANON_TARGET = 5

#: Location ladder: nation (L0) -> region (L1) -> suppressed (L2).
#: Balance ladder: 100-wide (L0) -> 1000-wide (L1) -> 5000-wide (L2)
#: -> suppressed (L3).  Cost of a lattice point = sum of levels (the
#: standard generalization-height information-loss proxy).
_LOC_LEVELS = 3
_BAL_LEVELS = 4


def _kanon_keys(engine: str) -> list[tuple[int, int, str, str]]:
    """(loc_level, bal_level, loc_expr, bal_expr) for every lattice
    point — identical SQL text in both engines."""
    s = "STRING" if engine == "spark" else "VARCHAR"
    loc = [
        f"CAST(c_nationkey AS {s})",
        f"CAST(n_regionkey AS {s})",
        "'*'",
    ]
    bal = [
        f"CAST(CAST(FLOOR(c_acctbal / 100) AS BIGINT) AS {s})",
        f"CAST(CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS {s})",
        f"CAST(CAST(FLOOR(c_acctbal / 5000) AS BIGINT) AS {s})",
        "'*'",
    ]
    return [
        (li, lb, loc[li], bal[lb])
        for li in range(_LOC_LEVELS)
        for lb in range(_BAL_LEVELS)
    ]


def _kanon_oracle() -> str:
    arms = " UNION ALL ".join(
        f"SELECT {li} AS loc_level, {lb} AS bal_level,"
        f" {le} AS loc_key, {be} AS bal_key"
        for li, lb, le, be in _kanon_keys("duck")
    )
    return f"""
        WITH base AS (
          SELECT c.c_nationkey, c.c_acctbal, n.n_regionkey
          FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        ), fanned AS (
          SELECT f.* FROM base CROSS JOIN LATERAL ({arms}) f
        ), cells AS (
          SELECT loc_level, bal_level, loc_key, bal_key,
                 CAST(COUNT(*) AS BIGINT) AS sz
          FROM fanned GROUP BY 1, 2, 3, 4
        ), combos AS (
          SELECT loc_level, bal_level,
                 CAST(COUNT(*) AS BIGINT) AS n_groups,
                 CAST(MIN(sz) AS BIGINT) AS k_min,
                 loc_level + bal_level AS cost,
                 MIN(sz) >= {KANON_TARGET} AS meets_k
          FROM cells GROUP BY loc_level, bal_level
        ), winner AS (
          SELECT MIN(ROW(cost, loc_level, bal_level)) AS w
          FROM combos WHERE meets_k
        )
        SELECT loc_level, bal_level, n_groups, k_min, cost, meets_k,
               (meets_k AND ROW(cost, loc_level, bal_level)
                 = (SELECT w FROM winner)) AS chosen
        FROM combos
    """


@query("kanon_generalization_plan", oracle=_kanon_oracle())
def kanon_generalization_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E238: k-anonymity generalization PLANNER — where E73 audits one
    release shape, this searches the whole generalization lattice
    (nation→region→* × four balance-band widths) and marks the
    cheapest point whose smallest quasi-identifier group still holds
    ≥ K people: the Samarati/Incognito decision of which columns to
    coarsen BEFORE a release, made from data, with the cost/anonymity
    trade-off of every alternative visible in one frame.

    One shuffle total: each customer fans out to |lattice| (12) rows
    map-side, ONE keyed aggregate sizes every group of every lattice
    point, and a second tiny aggregate collapses to the 12-row combo
    frame; the winner is the lexicographic MIN of (cost, levels) among
    points meeting K — deterministic, no floating point anywhere.

    Scale: fan-out is a constant 12×; group cells are bounded by the
    QI domains (≤ 25·|bands|), so the combo frame never grows with
    volume."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    base = cust.join(
        F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"]
    )
    arms = []
    for li, lb, le, be in _kanon_keys("spark"):
        arms.append(
            f"({li}, {lb}, {le}, {be})"
        )
    fanned = base.select(
        F.explode(
            F.expr(
                "array" + "(" + ", ".join(
                    f"struct({li} AS loc_level, {lb} AS bal_level, "
                    f"{le} AS loc_key, {be} AS bal_key)"
                    for li, lb, le, be in _kanon_keys("spark")
                ) + ")"
            )
        ).alias("g")
    ).select("g.loc_level", "g.bal_level", "g.loc_key", "g.bal_key")
    cells = fanned.groupBy(
        "loc_level", "bal_level", "loc_key", "bal_key"
    ).agg(F.count(F.lit(1)).cast("long").alias("sz"))
    combos = cells.groupBy("loc_level", "bal_level").agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min("sz").cast("long").alias("k_min"),
    ).select(
        "loc_level",
        "bal_level",
        "n_groups",
        "k_min",
        (F.col("loc_level") + F.col("bal_level")).alias("cost"),
        (F.col("k_min") >= KANON_TARGET).alias("meets_k"),
    )
    winner = combos.filter("meets_k").agg(
        F.min(F.struct("cost", "loc_level", "bal_level")).alias("w")
    )
    return combos.crossJoin(F.broadcast(winner)).select(
        "loc_level",
        "bal_level",
        "n_groups",
        "k_min",
        "cost",
        "meets_k",
        (
            F.col("meets_k")
            & (
                F.struct("cost", "loc_level", "bal_level") == F.col("w")
            )
        ).alias("chosen"),
    )
