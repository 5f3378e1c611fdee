"""E4: text analysis over the ``documents`` table — tokenization, quality
scoring, language heuristics, document fingerprinting.

All hot-path operators are native column expressions (split / filter /
transform / aggregate higher-order functions) — zero Python in the row path,
so these scale with executors exactly like any other codegen'd expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import default_parallelism, input_partitions
from ..sources.tables import load_table
from .numeric import dec_sum, sql_dec_sum
from .registry import query, scoped_persist

#: Tiny per-language marker-word lists for the n-gram/stopword language-ID
#: heuristic. Shared between the Spark expression and the DuckDB oracle so
#: both compute identical scores.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist"),
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "los", "que", "de"),
    "fr": ("le", "les", "et", "des", "une"),
    "zh": ("de5", "le5", "shi4", "zai4", "he2"),
}

STOPWORDS: tuple[str, ...] = ("the", "a", "of", "and", "to", "in", "is", "it")


def _tokens(col: str = "text") -> Column:
    return F.split(F.col(col), " ")


def _marker_score(tokens: Column, markers: tuple[str, ...]) -> Column:
    return F.size(F.filter(tokens, lambda t: t.isin(*markers)))


def _sql_marker_score(markers: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{m}'" for m in markers)
    return (
        f"len(list_filter(string_split(text, ' '), t -> t IN ({lst})))"
    )


@query(
    "token_stats_by_lang",
    oracle="""
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
               SUM(len(string_split(text, ' '))) / COUNT(*) AS avg_tokens,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY lang
    """,
)
def token_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 token counting: whitespace tokenization + per-language corpus
    stats. split/size are codegen'd; no UDF."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(_tokens())
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(n_tok).alias("total_tokens"),
            (F.sum(n_tok) / F.count(F.lit(1))).alias("avg_tokens"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@query(
    "text_quality_scores",
    oracle=f"""
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               length(replace(text, ' ', '')) AS n_chars_nospace,
               length(replace(text, ' ', ''))
                 / len(string_split(text, ' ')) AS avg_token_len,
               {_sql_marker_score(STOPWORDS)}
                 / len(string_split(text, ' ')) AS stopword_ratio
        FROM documents
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 quality scoring: per-document length / token / stopword-ratio
    features — the standard cheap filters of an LLM-data pipeline. All
    integer-derived doubles (single deterministic division), so the oracle
    matches bit-for-bit."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    n_tokens = F.size(toks)
    n_chars_nospace = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    n_stop = _marker_score(toks, STOPWORDS)
    return docs.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        n_chars_nospace.cast("long").alias("n_chars_nospace"),
        (n_chars_nospace / n_tokens).alias("avg_token_len"),
        (n_stop / n_tokens).alias("stopword_ratio"),
    )


@query(
    "lang_doc_counts",
    oracle=f"""
        SELECT lang, source,
               COUNT(*) AS n_docs,
               {sql_dec_sum("n_chars")} AS total_chars
        FROM documents GROUP BY lang, source
    """,
)
def lang_doc_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-key corpus profile (lang × source)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        dec_sum(F.col("n_chars").cast("double")).alias("total_chars"),
    )


@query(
    "language_filter_en",
    oracle="""
        SELECT doc_id, source, n_chars
        FROM documents WHERE lang = 'en' AND n_chars > 200
    """,
)
def language_filter_en(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 language filter: the lang + min-length predicate combo every
    training-data pipeline applies first; both predicates push to the scan."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter((F.col("lang") == "en") & (F.col("n_chars") > 200)).select(
        "doc_id", "source", "n_chars"
    )


def _langid_sql_case() -> str:
    langs = sorted(LANG_MARKERS)
    scores = {l: _sql_marker_score(LANG_MARKERS[l]) for l in langs}
    whens = []
    for l in langs:
        conds = " AND ".join(
            f"{scores[l]} >= {scores[o]}" for o in langs if o != l
        )
        whens.append(f"WHEN {conds} THEN '{l}'")
    return "CASE " + " ".join(whens) + " ELSE 'und' END"


@query(
    "langid_heuristic",
    oracle=f"""
        SELECT {_langid_sql_case()} AS predicted_lang,
               COUNT(*) AS n_docs
        FROM documents GROUP BY 1
    """,
)
def langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 language-ID: marker-word scoring with a deterministic argmax
    (alphabetical tie-break, 'und' when all scores are 0-vs-0 ties resolve
    to the first language). On real corpora the marker lists would be
    fastText-style n-gram tables; the operator shape — score per language,
    argmax — is identical."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    langs = sorted(LANG_MARKERS)
    scores = {l: _marker_score(toks, LANG_MARKERS[l]) for l in langs}
    pred: Column = F.lit("und")
    # Build the CASE chain in reverse so earlier (alphabetical) langs win ties.
    expr = None
    for l in langs:
        cond = None
        for o in langs:
            if o == l:
                continue
            c = scores[l] >= scores[o]
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, l) if expr is None else expr.when(cond, l)
    pred = expr.otherwise("und")
    return (
        docs.select(pred.alias("predicted_lang"))
        .groupBy("predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


FINGERPRINT_MOD = 1_000_000_007


@query(
    "doc_fingerprint",
    oracle=f"""
        SELECT doc_id,
               list_reduce(
                 list_prepend(
                   CAST(0 AS BIGINT),
                   list_transform(
                     range(1, length(text) + 1),
                     i -> CAST(ascii(substr(text, CAST(i AS INTEGER), 1)) AS BIGINT)
                   )
                 ),
                 (acc, c) -> (acc * 31 + c) % {FINGERPRINT_MOD}
               ) AS fingerprint
        FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 document fingerprinting: polynomial rolling hash over the UTF-8
    code points — a content-defined fingerprint computable in any engine
    (unlike xxhash64, which is Spark-specific; that variant backs the
    MinHash dedup in operators/dedup.py). Left-fold order is identical in
    Spark's aggregate() and DuckDB's list_reduce, so values hash-match."""
    docs = load_table(spark, sf_dir, "documents")
    codes = F.transform(
        F.sequence(F.lit(1), F.length("text")),
        lambda i: F.ascii(F.substring(F.col("text"), i, F.lit(1))).cast("long"),
    )
    fp = F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + c) % FINGERPRINT_MOD,
    )
    return docs.select("doc_id", fp.alias("fingerprint"))


#: GPT-2-style pre-tokenizer shape: letter runs, single digits, punctuation
#: runs. Plain character classes only, so the Java (Spark) and RE2 (DuckDB)
#: regex engines agree exactly.
BPE_TOKEN_REGEX = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+"


@query(
    "bpe_token_stats",
    oracle=f"""
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(SUM(len(regexp_extract_all(text, '{BPE_TOKEN_REGEX}')))
                    AS BIGINT) AS bpe_tokens,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens
        FROM documents GROUP BY lang
    """,
)
def bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 token counting, both ways a data pipeline needs: whitespace tokens
    (fast budget proxy) and a BPE-ish pre-tokenization count (letter runs /
    digits / punctuation — the GPT-2 pre-tokenizer shape without the merges
    table). regexp_count is a native codegen'd expression; counting needs no
    materialized token array."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.regexp_count("text", F.lit(BPE_TOKEN_REGEX))).alias("bpe_tokens"),
        F.sum(F.size(F.split(F.col("text"), " "))).alias("ws_tokens"),
    )


# -- Deterministic mixture sampling ----------------------------------------

# Per-source keep rates for the training mix, encoded as a hex threshold on
# the first byte of md5(text): 'c0'→75%, '80'→50%, '40'→25%.
_MIX_HI = ("src0", "src1", "src2", "src3", "src4")
_MIX_MID = ("src5", "src6", "src7", "src8", "src9")


@query(
    "mixture_sample_by_source",
    oracle="""
        SELECT doc_id, source,
               substring(md5(text), 1, 2) AS h2
        FROM documents
        WHERE substring(md5(text), 1, 2) <
              CASE WHEN source IN ('src0','src1','src2','src3','src4')
                     THEN 'c0'
                   WHEN source IN ('src5','src6','src7','src8','src9')
                     THEN '80'
                   ELSE '40' END
    """,
)
def mixture_sample_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible data-mixing sampler: per-source keep rates applied by
    comparing a CONTENT-HASH prefix to a hex threshold — no RNG, no seed
    plumbing, identical sample whatever the partitioning, cluster size, or
    engine (the property `df.sample`/`sampleBy` cannot give you across
    retries and re-runs, since their sampling is per-partition-seeded).
    Membership is also stable under re-ingestion: the same document is in
    or out of the mix forever, which makes downstream dataset versions
    diffable. Pure scan-side filter — pushdown-friendly, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    h2 = F.substring(F.md5(F.encode(F.col("text"), "UTF-8")), 1, 2)
    threshold = (
        F.when(F.col("source").isin(*_MIX_HI), "c0")
        .when(F.col("source").isin(*_MIX_MID), "80")
        .otherwise("40")
    )
    return docs.select("doc_id", "source", h2.alias("h2")).filter(
        F.col("h2") < threshold
    )


@query(
    "temperature_mixture_sample",
    oracle="""
        WITH counts AS (
          SELECT source, COUNT(*) AS n FROM documents GROUP BY source
        ),
        mn AS (SELECT MIN(n) AS n_min FROM counts),
        rates AS (
          SELECT source,
                 lpad(lower(to_hex(CAST(least(
                     floor(sqrt(CAST(n_min AS DOUBLE) / n) * 16777216),
                     16777215) AS BIGINT))), 6, '0') AS thr
          FROM counts, mn
        )
        SELECT d.doc_id, d.source
        FROM documents d JOIN rates r USING (source)
        WHERE substring(md5(d.text), 1, 6) < r.thr
    """,
)
def temperature_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-reweighted mixture sampling (T=2): the multilingual-
    training trick of flattening source proportions — target share
    q_s ∝ p_s^(1/T) is materialized as a per-doc keep rate
    r_s = sqrt(n_min/n_s) (smallest source keeps ~everything, large
    sources are downsampled toward balance). Rates come from the corpus
    itself in one tiny aggregate; membership is the same content-hash
    threshold as mixture_sample_by_source, so the sample is deterministic
    across engines, partitionings, and re-runs.

    Numeric discipline for the cross-engine hash: T=2 keeps the rate
    inside correctly-rounded IEEE territory (divide, sqrt, and a
    power-of-two scale are all exact-or-correctly-rounded in BOTH
    engines; an arbitrary pow() would differ in last-ULP and flip
    boundary docs). For arbitrary T, compute the per-source thresholds
    driver-side (the source list is bounded) and join them in as
    literals. The 1-row n_min crossJoin is a broadcast scalar
    (BNLJ_OK in tests/test_plan_hazards.py)."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    n_min = counts.agg(F.min("n").alias("n_min"))
    thr = F.lpad(
        F.lower(
            F.hex(
                F.least(
                    F.floor(
                        F.sqrt(F.col("n_min").cast("double") / F.col("n"))
                        * 16777216
                    ),
                    F.lit(16777215),
                )
            )
        ),
        6,
        "0",
    )
    rates = counts.crossJoin(F.broadcast(n_min)).select(
        "source", thr.alias("thr")
    )
    h6 = F.substring(F.md5(F.encode(F.col("text"), "UTF-8")), 1, 6)
    return (
        docs.select("doc_id", "source", h6.alias("h6"))
        .join(F.broadcast(rates), "source")
        .filter(F.col("h6") < F.col("thr"))
        .select("doc_id", "source")
    )


@query(
    "doc_repetition_scores",
    oracle="""
        WITH docs AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ),
        tok AS (
          SELECT doc_id, SUM(c) AS n_tokens, MAX(c) AS max_tok FROM (
            SELECT doc_id, w, COUNT(*) AS c
            FROM (SELECT doc_id, unnest(ws) AS w FROM docs)
            GROUP BY doc_id, w
          ) GROUP BY doc_id
        ),
        sh AS (
          SELECT doc_id, COUNT(*) AS n_sh, COUNT(DISTINCT w3) AS n_uniq
          FROM (
            SELECT doc_id,
                   CASE WHEN len(ws) < 3 THEN array_to_string(ws, ' ')
                        ELSE ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] END AS w3
            FROM docs, LATERAL (
              SELECT unnest(generate_series(1, greatest(len(ws) - 2, 1))) AS i
            ) t
          ) GROUP BY doc_id
        )
        SELECT tok.doc_id,
               1.0 - CAST(n_uniq AS DOUBLE) / n_sh AS dup_3gram_frac,
               CAST(max_tok AS DOUBLE) / n_tokens AS top_token_frac
        FROM tok JOIN sh ON tok.doc_id = sh.doc_id
    """,
)
def doc_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 repetition filters (the Gopher-rules signals): fraction of
    duplicated word 3-grams and the most-frequent-token share. The 3-gram
    stats are pure array expressions (no explode — the shingle list stays
    inside one projection, whole-stage codegen'd); the token mode needs a
    per-(doc, token) count, which is one explode + two hash aggregations
    re-using the same doc_id partitioning. Integer counts → one double
    division each, so the oracle matches bit-for-bit."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split(F.col("text"), " ").alias("ws"))
    k = F.greatest(F.size(F.col("ws")) - 2, F.lit(1))
    # try_element_at + NULL-skipping concat_ws: documents under 3 tokens
    # yield the whole document as the single "3-gram" (the oracle's
    # len(ws) < 3 CASE) instead of an ANSI out-of-bounds error.
    raw_sh = F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.concat_ws(
            " ",
            F.try_element_at(F.col("ws"), i),
            F.try_element_at(F.col("ws"), i + 1),
            F.try_element_at(F.col("ws"), i + 2),
        ),
    )
    sh_stats = toks.select(
        "doc_id",
        F.size(raw_sh).alias("n_sh"),
        F.size(F.array_distinct(raw_sh)).alias("n_uniq"),
    )
    tok_stats = (
        toks.select("doc_id", F.explode("ws").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("n_tokens"), F.max("c").alias("max_tok"))
    )
    return tok_stats.join(sh_stats, "doc_id").select(
        "doc_id",
        (1.0 - F.col("n_uniq").cast("double") / F.col("n_sh")).alias(
            "dup_3gram_frac"
        ),
        (F.col("max_tok").cast("double") / F.col("n_tokens")).alias(
            "top_token_frac"
        ),
    )


@query(
    "top_tokens_global",
    oracle="""
        SELECT w, COUNT(*) AS n
        FROM (
          SELECT unnest(string_split(text, ' ')) AS w FROM documents
        )
        GROUP BY w
        ORDER BY n DESC, w
        LIMIT 20
    """,
)
def top_tokens_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head: explode → count → top-20. The aggregation
    is partial+final (the exchange carries one row per (partition, token),
    not one per token occurrence) and the top-k is TakeOrderedAndProject —
    at corpus scale the full vocabulary never sorts globally, and the
    driver receives k rows. Tiebreak on the token keeps the cut
    deterministic."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("w"))
        .limit(20)
    )


@query(
    "doc_distinctive_tokens",
    oracle="""
        WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS token
          FROM documents
        ),
        tf AS (
          SELECT doc_id, token, COUNT(*) AS tf_count
          FROM tok GROUP BY doc_id, token
        ),
        df AS (
          SELECT token, COUNT(DISTINCT doc_id) AS df_count FROM tok
          GROUP BY token
        ),
        n AS (SELECT COUNT(*) AS n_docs FROM documents)
        SELECT doc_id, token,
               CAST(tf_count AS BIGINT) AS tf_count,
               CAST(df_count AS BIGINT) AS df_count,
               CAST(tf_count AS DOUBLE) * n_docs / df_count AS score
        FROM (
          SELECT tf.doc_id, tf.token, tf.tf_count, df.df_count, n.n_docs,
                 ROW_NUMBER() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY CAST(tf.tf_count AS DOUBLE) * n.n_docs
                              / df.df_count DESC,
                            tf.token
                 ) AS rn
          FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
        ) WHERE rn <= 3
    """,
)
def doc_distinctive_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most distinctive tokens per document — the TF-IDF shape
    with a rational score (tf × N / df) instead of tf·log(N/df): the
    ranking semantics are the classic ones, but the score avoids libm
    log(), whose last-ulp rounding differs between engines and would
    poison the hash gate. Two aggregates (term frequency on (doc, token),
    document frequency on token), a broadcast 1-row corpus count, and a
    per-doc top-3 window (WindowGroupLimit). The df join shuffles on the
    token — the natural key; a stop-token df cut (as in dedup's prefix
    filter) bounds the hottest tokens at web scale."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    tf = tok.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("tf_count")
    )
    df_counts = tok.groupBy(F.col("token").alias("df_token")).agg(
        F.countDistinct("doc_id").alias("df_count")
    )
    total = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    score = (
        F.col("tf_count").cast("double") * F.col("n_docs") / F.col("df_count")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("token")
    )
    return (
        tf.join(df_counts, F.col("token") == F.col("df_token"))
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id", "token", "tf_count", "df_count", score.alias("score")
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


# --------------------------------------------------------------------------
# Composed quality gate + deterministic split: the two decisions a corpus
# pipeline makes per document after the signals are computed.
# --------------------------------------------------------------------------

#: quality-gate thresholds (Gopher-rule shapes, tuned so the synthetic
#: corpus splits meaningfully rather than all-pass: token counts run
#: 10-99, top-token fractions 0.07-0.14, mean token lengths 3.7-5.3).
GATE_MIN_TOKENS = 25
GATE_MAX_TOKENS = 100_000
GATE_MAX_TOP_TOKEN_FRAC = 0.12
GATE_MAX_DUP3_FRAC = 0.55
GATE_MEAN_LEN_LO = 3.0
GATE_MEAN_LEN_HI = 5.0


@query(
    "quality_filter_gate",
    oracle=f"""
        WITH docs AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ),
        tok AS (
          SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
                 MAX(c)::DOUBLE / SUM(c) AS top_frac,
                 SUM(c * LEN(w))::DOUBLE / SUM(c) AS mean_len
          FROM (
            SELECT doc_id, w, COUNT(*) AS c
            FROM (SELECT doc_id, unnest(ws) AS w FROM docs)
            GROUP BY doc_id, w
          ) GROUP BY doc_id
        ),
        sh AS (
          SELECT doc_id,
                 1.0 - COUNT(DISTINCT w3)::DOUBLE / COUNT(*) AS dup3
          FROM (
            SELECT doc_id,
                   CASE WHEN len(ws) < 3 THEN array_to_string(ws, ' ')
                        ELSE ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                   END AS w3
            FROM docs, LATERAL (
              SELECT unnest(generate_series(1, greatest(len(ws) - 2, 1)))
                AS i
            ) t
          ) GROUP BY doc_id
        )
        SELECT tok.doc_id, n_tokens,
               n_tokens BETWEEN {GATE_MIN_TOKENS} AND {GATE_MAX_TOKENS}
                 AS ok_length,
               top_frac <= {GATE_MAX_TOP_TOKEN_FRAC} AS ok_top_token,
               dup3 <= {GATE_MAX_DUP3_FRAC} AS ok_repetition,
               mean_len BETWEEN {GATE_MEAN_LEN_LO} AND {GATE_MEAN_LEN_HI}
                 AS ok_word_len,
               (n_tokens BETWEEN {GATE_MIN_TOKENS} AND {GATE_MAX_TOKENS})
                 AND top_frac <= {GATE_MAX_TOP_TOKEN_FRAC}
                 AND dup3 <= {GATE_MAX_DUP3_FRAC}
                 AND (mean_len BETWEEN {GATE_MEAN_LEN_LO}
                      AND {GATE_MEAN_LEN_HI}) AS keep
        FROM tok JOIN sh ON tok.doc_id = sh.doc_id
    """,
)
def quality_filter_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed keep/drop decision (Gopher-style): length bounds,
    top-token concentration, duplicate-3-gram fraction, and mean word
    length, each surfaced as its own boolean so downstream can report WHY
    documents drop (per-rule drop rates are the standard pipeline health
    metric), plus the conjunctive ``keep``.

    Shape: one explode + two hash aggregations on doc_id for the token
    stats (count-per-token feeds max/sum in the same aggregation tree),
    3-gram stats stay inside a single array projection (no explode), one
    doc_id join to combine — the second aggregation and the join reuse the
    doc_id partitioning. All thresholds are compile-time literals, so the
    gate composes into any scan without breaking pushdown below it."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split(F.col("text"), " ").alias("ws"))
    per_tok = (
        toks.select("doc_id", F.explode("ws").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tok = per_tok.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        (F.max("c").cast("double") / F.sum("c")).alias("top_frac"),
        (
            dec_sum(F.col("c") * F.length("w")).cast("double") / F.sum("c")
        ).alias("mean_len"),
    )
    w3 = F.when(
        F.size(F.col("ws")) < 3, F.array(F.array_join(F.col("ws"), " "))
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(F.col("ws")) - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(F.col("ws"), i),
                F.try_element_at(F.col("ws"), i + 1),
                F.try_element_at(F.col("ws"), i + 2),
            ),
        )
    )
    sh = toks.select("doc_id", w3.alias("g3")).select(
        "doc_id",
        (
            F.lit(1.0)
            - F.size(F.array_distinct("g3")).cast("double") / F.size("g3")
        ).alias("dup3"),
    )
    ok_length = F.col("n_tokens").between(GATE_MIN_TOKENS, GATE_MAX_TOKENS)
    ok_top = F.col("top_frac") <= GATE_MAX_TOP_TOKEN_FRAC
    ok_rep = F.col("dup3") <= GATE_MAX_DUP3_FRAC
    ok_len = F.col("mean_len").between(GATE_MEAN_LEN_LO, GATE_MEAN_LEN_HI)
    return tok.join(sh, "doc_id").select(
        "doc_id",
        "n_tokens",
        ok_length.alias("ok_length"),
        ok_top.alias("ok_top_token"),
        ok_rep.alias("ok_repetition"),
        ok_len.alias("ok_word_len"),
        (ok_length & ok_top & ok_rep & ok_len).alias("keep"),
    )


#: md5-prefix threshold for the 90/10 train/val cut ('e6'/'100' ≈ 0.898).
SPLIT_TRAIN_MAX = "e6"


@query(
    "train_val_split_counts",
    oracle=f"""
        SELECT source,
               CASE WHEN substring(md5('split:' || doc_id), 1, 2)
                         < '{SPLIT_TRAIN_MAX}'
                    THEN 'train' ELSE 'val' END AS split,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS n_chars
        FROM documents
        GROUP BY 1, 2
    """,
)
def train_val_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~90/10 train/validation assignment audited per
    source: membership hashes the DOCUMENT ID with a split-purpose salt
    (not the text — exact duplicates must be allowed to land in different
    splits for the leakage DETECTOR to catch them; near-dup leakage is
    benchmark_decontaminate's job), so the split is reproducible across
    engines, partitionings, and re-runs — `randomSplit` guarantees none
    of that. Scan-side projection + one aggregation; the audit is the
    by-product, the assignment expression is the operator."""
    docs = load_table(spark, sf_dir, "documents")
    h2 = F.substring(
        F.md5(
            F.encode(
                F.concat(F.lit("split:"), F.col("doc_id").cast("string")),
                "UTF-8",
            )
        ),
        1,
        2,
    )
    split = F.when(h2 < SPLIT_TRAIN_MAX, "train").otherwise("val")
    return docs.groupBy(
        "source", split.alias("split")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("n_chars"),
    )


@query(
    "token_commonness_scores",
    oracle="""
        WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
        ),
        tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM tok GROUP BY doc_id, w),
        cnt AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
        tot AS (SELECT COUNT(*) AS t FROM tok)
        SELECT doc_id,
               CAST(SUM(tf) AS BIGINT) AS n_tokens,
               CAST(SUM(tf * c) AS BIGINT) AS sum_freq,
               CAST(SUM(tf * c) AS DOUBLE) / CAST(SUM(tf) AS DOUBLE)
                 / CAST((SELECT t FROM tot) AS DOUBLE) AS commonness
        FROM tf JOIN cnt USING (w)
        GROUP BY doc_id
    """,
)
def token_commonness_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM commonness score per document — the log-free proxy for
    'how typical is this document's vocabulary of the corpus': the mean
    corpus frequency p(t) = count(t)/total of its tokens. Rare-garbage
    documents (OCR noise, base64 spill) score near 1/total; boilerplate
    scores high. The standard LM quality signal is mean log p(t); the
    ranking is monotone in this sum either way, and staying in integer
    arithmetic (sum of counts, two final double divisions) keeps the
    result bit-identical across engines and partitionings
    (operators/numeric.py rules), where a float log-sum would not be.

    Shape, scale-first: ONE explode pass feeds (a) per-doc term
    frequencies grouped on (doc_id, token) and (b) the corpus vocabulary
    count grouped on token — so the tf⋈vocab join is on DISTINCT
    (doc, token) pairs, not raw token instances (documents repeating a
    token contribute one join row, the heavy-tail 'the' rows collapse
    per-doc first). The vocabulary side is Zipf-skewed; AQE's skew-join
    splitting handles the hot tokens, and the final per-doc agg re-uses
    the (doc_id, w) clustering so it is map-side-combinable. The corpus
    total rides in as a broadcast single-row frame, never a collect().
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("w")
    )
    tf = tok.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    cnt = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    total = tok.agg(F.count(F.lit(1)).alias("t"))
    per_doc = (
        tf.join(cnt, "w")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("c")).alias("sum_freq"),
        )
    )
    return per_doc.crossJoin(F.broadcast(total)).select(
        "doc_id",
        "n_tokens",
        "sum_freq",
        (
            F.col("sum_freq").cast("double")
            / F.col("n_tokens").cast("double")
            / F.col("t").cast("double")
        ).alias("commonness"),
    )


#: Inverted-index postings keep the first N document ids per token.
_POSTINGS_SAMPLE = 3
#: ...and only tokens appearing in at least this many documents.
_POSTINGS_MIN_DF = 5


@query(
    "inverted_index_postings",
    oracle=f"""
        WITH tf AS (
          SELECT token, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
          FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents
          ) WHERE token <> '' GROUP BY token, doc_id
        )
        SELECT token,
               CAST(COUNT(*) AS BIGINT) AS doc_freq,
               CAST(SUM(tf) AS BIGINT) AS total_tf,
               array_to_string(
                 (list_sort(list(doc_id)))[1:{_POSTINGS_SAMPLE}], ','
               ) AS sample_docs
        FROM tf GROUP BY token
        HAVING COUNT(*) >= {_POSTINGS_MIN_DF}
    """,
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed inverted-index build: per token, document frequency,
    total term frequency, and a bounded sorted sample of posting doc ids
    — the search/retrieval-side artifact of a corpus (BM25 statistics
    and posting lists start exactly here).

    tokenize → explode → (token, doc_id) count collapses map-side before
    the one shuffle on token; per-token state after that is two longs
    plus a SAMPLE-bounded array (collect_list is applied AFTER the
    per-doc collapse and truncated by slice, so no posting list is
    unbounded driver- or executor-side). array_sort makes the sample
    deterministic under parallel merge — the same first-N-by-id the
    oracle's list_sort slice yields; the sample is serialized to a
    comma-joined STRING because the correctness gate's pandas
    canonicalizer cannot hash list-typed cells (round-4 driver ERR).
    At 100 TB the token key is Zipfian;
    the df>=MIN threshold shown here trims the long tail, and the
    standard upgrade for the head (stop-word-sized postings) is the same
    salting split skew_salted_user_revenue demonstrates."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "doc_id",
            F.explode(F.split("text", " ")).alias("token"),
        )
        .where(F.col("token") != "")
        .groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return (
        tf.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("doc_freq"),
            F.sum("tf").alias("total_tf"),
            F.concat_ws(
                ",",
                F.transform(
                    F.slice(
                        F.array_sort(F.collect_list("doc_id")),
                        1,
                        _POSTINGS_SAMPLE,
                    ),
                    lambda d: d.cast("string"),
                ),
            ).alias("sample_docs"),
        )
        .where(F.col("doc_freq") >= _POSTINGS_MIN_DF)
    )


#: BM25 ranking: fixed query term set, standard k1/b, top-N result.
_BM25_TERMS = ["join", "hash", "scan"]
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPN = 20
#: Per-addend fixed-point scale for the order-insensitive score sum
#: (scores are O(1); 1e-7 resolution leaves ties to the doc_id break).
_BM25_SCALE = 10**7


@query(
    "bm25_doc_ranking",
    oracle=f"""
        WITH toks AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS token
          FROM documents
        ), doclen AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
          FROM toks WHERE token <> '' GROUP BY doc_id
        ), corpus AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(dl) AS BIGINT) AS total_len
          FROM doclen
        ), tf AS (
          SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
          FROM toks WHERE token IN ({", ".join(f"'{t}'" for t in _BM25_TERMS)})
          GROUP BY doc_id, token
        ), df AS (
          SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token
        ), scored AS (
          SELECT tf.doc_id,
                 (CAST(c.n_docs - df.df AS DOUBLE) + 0.5)
                   / (CAST(df.df AS DOUBLE) + 0.5)
                 * (CAST(tf.tf AS DOUBLE) * {_BM25_K1 + 1})
                   / (CAST(tf.tf AS DOUBLE) + {_BM25_K1} * ({1 - _BM25_B}
                      + {_BM25_B} * (CAST(d.dl AS DOUBLE)
                        / (CAST(c.total_len AS DOUBLE) / c.n_docs))))
                 AS addend
          FROM tf
          JOIN df USING (token)
          JOIN doclen d USING (doc_id)
          CROSS JOIN corpus c
        )
        SELECT doc_id, {sql_dec_sum("addend", _BM25_SCALE)} AS bm25_score
        FROM scored GROUP BY doc_id
        ORDER BY bm25_score DESC, doc_id LIMIT {_BM25_TOPN}
    """,
)
def bm25_doc_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N documents by BM25 relevance for a fixed query term set — the
    retrieval-side ranking that consumes inverted_index_postings'
    statistics (Robertson/Spärck Jones BM25, rational idf form).

    The raw idf (N-df+0.5)/(df+0.5) is kept UN-logged: log() routes
    through libm, whose last-ulp behavior differs across engines, while
    the rational form is pure +,*,/ on identical operands — engine-exact
    — and is monotone in the standard idf, so the RANKING is the
    textbook one. tf rows exist only for the |terms| query tokens (the
    IN-filter prunes before any shuffle), corpus stats ride one 1-row
    crossJoin, per-doc scores sum ≤|terms| addends through dec_sum
    (order-insensitive), and the top-N is TakeOrderedAndProject with a
    doc_id tie-break."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).where(F.col("token") != "")
    doclen = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    corpus = doclen.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_len"),
    )
    tf = (
        toks.where(F.col("token").isin(_BM25_TERMS))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    term_df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    avgdl = F.col("total_len").cast("double") / F.col("n_docs")
    idf = ((F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5)) / (
        F.col("df").cast("double") + F.lit(0.5)
    )
    tfc = (F.col("tf").cast("double") * F.lit(_BM25_K1 + 1)) / (
        F.col("tf").cast("double")
        + F.lit(_BM25_K1)
        * (
            F.lit(1 - _BM25_B)
            + F.lit(_BM25_B) * (F.col("dl").cast("double") / avgdl)
        )
    )
    scored = (
        tf.join(F.broadcast(term_df), "token")
        .join(doclen, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .select("doc_id", (idf * tfc).alias("addend"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(dec_sum(F.col("addend"), _BM25_SCALE).alias("bm25_score"))
        .orderBy(F.desc("bm25_score"), "doc_id")
        .limit(_BM25_TOPN)
    )


#: Co-occurrence lift: pairs among the top-M document-frequency tokens,
#: kept when they share at least MIN_DF_AB documents.
_LIFT_TOP_TOKENS = 30
_LIFT_MIN_DF_AB = 5


@query(
    "token_cooccurrence_lift",
    oracle=f"""
        WITH incidence AS (
          SELECT DISTINCT doc_id, token FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents
          ) WHERE token <> ''
        ), df AS (
          SELECT token, CAST(COUNT(*) AS BIGINT) AS df
          FROM incidence GROUP BY token
        ), top_tokens AS (
          SELECT token, df FROM df ORDER BY df DESC, token
          LIMIT {_LIFT_TOP_TOKENS}
        ), inc_top AS (
          SELECT i.doc_id, i.token, t.df
          FROM incidence i JOIN top_tokens t USING (token)
        ), n AS (
          SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
          FROM incidence
        ), pairs AS (
          SELECT a.token AS token_a, b.token AS token_b,
                 a.df AS df_a, b.df AS df_b,
                 CAST(COUNT(*) AS BIGINT) AS df_ab
          FROM inc_top a JOIN inc_top b
            ON a.doc_id = b.doc_id AND a.token < b.token
          GROUP BY 1, 2, 3, 4
        )
        SELECT token_a, token_b, df_ab,
               CAST(n.n_docs * df_ab AS DOUBLE)
                 / CAST(df_a * df_b AS DOUBLE) AS lift
        FROM pairs CROSS JOIN n
        WHERE df_ab >= {_LIFT_MIN_DF_AB}
    """,
)
def token_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-level token co-occurrence lift (the PMI ratio before the
    log): lift = N·df(a,b) / (df(a)·df(b)) for pairs among the top-M
    most frequent tokens — the association-mining statistic behind
    related-term discovery and market-basket lift.

    The quadratic hazard (vocabulary² pairs) is bounded by construction:
    only the top-M tokens by document frequency (one small
    TakeOrderedAndProject, broadcast) enter the self-join, so the pair
    space is ≤M²/2 per doc however large the corpus or vocabulary.
    Both integer products in the lift fit BIGINT and the single
    DOUBLE division is on identical operands — engine-exact; the log
    that would make this true PMI is deliberately NOT applied (libm
    last-ulp variance), and lift is monotone in PMI."""
    docs = load_table(spark, sf_dir, "documents")
    incidence = scoped_persist(
        docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("token")
        )
        .where(F.col("token") != "")
        .distinct()
    )
    df = incidence.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    top_tokens = df.orderBy(F.desc("df"), "token").limit(_LIFT_TOP_TOKENS)
    inc_top = incidence.join(F.broadcast(top_tokens), "token")
    n = incidence.agg(F.count_distinct("doc_id").alias("n_docs"))
    a = inc_top.alias("a")
    b = inc_top.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.token") < F.col("b.token")),
        )
        .groupBy(
            F.col("a.token").alias("token_a"),
            F.col("b.token").alias("token_b"),
            F.col("a.df").alias("df_a"),
            F.col("b.df").alias("df_b"),
        )
        .agg(F.count(F.lit(1)).alias("df_ab"))
        .where(F.col("df_ab") >= _LIFT_MIN_DF_AB)
    )
    return pairs.crossJoin(F.broadcast(n)).select(
        "token_a",
        "token_b",
        "df_ab",
        (
            (F.col("n_docs") * F.col("df_ab")).cast("double")
            / (F.col("df_a") * F.col("df_b")).cast("double")
        ).alias("lift"),
    )


# --------------------------------------------------------------------------
# E72: out-of-vocabulary rate vs a frequency-truncated vocab
# --------------------------------------------------------------------------

#: Deliberately small so the fixture corpus (tiny synthetic vocabulary)
#: produces non-trivial OOV mass; production would use the tokenizer's
#: real vocab size.
OOV_VOCAB_K = 10


@query(
    "doc_oov_rate",
    oracle=f"""
        WITH toks AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok
          FROM documents
        ),
        vocab AS (
          SELECT tok FROM (
            SELECT tok, COUNT(*) AS c FROM toks
            GROUP BY tok ORDER BY c DESC, tok LIMIT {OOV_VOCAB_K}
          )
        ),
        flags AS (
          SELECT t.doc_id,
                 CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov
          FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(oov) AS BIGINT) AS n_oov,
               round(CAST(SUM(oov) AS DOUBLE) / COUNT(*), 6) AS oov_rate
        FROM flags GROUP BY doc_id
    """,
)
def doc_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E72: per-document out-of-vocabulary rate against the corpus's
    top-K token vocabulary — the tokenizer-coverage metric that decides
    whether a vocab truncation is safe (high-OOV docs degrade into
    <unk>-soup when trained on).

    The vocab is a TakeOrderedAndProject over the token aggregate
    (deterministic count-desc/token-asc tie-break), broadcast back onto
    the exploded tokens; the per-doc aggregate collapses map-side. Two
    scans of documents (one to build the vocab, one to score) — at
    100 TB the vocab frame would be persisted/reused across scoring
    runs, exactly like the IVF centroids."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(_tokens()).alias("tok")
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("tok"))
        .limit(OOV_VOCAB_K)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    flags = toks.join(F.broadcast(vocab), "tok", "left").select(
        "doc_id",
        F.when(F.col("in_vocab").isNull(), 1).otherwise(0).alias("oov"),
    )
    return flags.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("oov").cast("long").alias("n_oov"),
        F.round(
            F.sum("oov").cast("double") / F.count(F.lit(1)), 6
        ).alias("oov_rate"),
    )


# --------------------------------------------------------------------------
# E88: Simpson lexical diversity (rational — no entropy/log needed)
# --------------------------------------------------------------------------


@query(
    "doc_simpson_diversity",
    oracle="""
        WITH toks AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok
          FROM documents
        ),
        tf AS (
          SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
          FROM toks GROUP BY doc_id, tok
        ),
        s AS (
          SELECT doc_id,
                 CAST(sum(tf) AS BIGINT)            AS n_tokens,
                 CAST(count(*) AS BIGINT)           AS n_distinct,
                 CAST(sum(tf * (tf - 1)) AS BIGINT) AS rep
          FROM tf GROUP BY doc_id
        )
        SELECT doc_id, n_tokens, n_distinct,
               1 - CAST(rep AS DOUBLE)
                 / NULLIF(n_tokens * (n_tokens - 1), 0) AS simpson_diversity
        FROM s
    """,
)
def doc_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E88: per-document lexical diversity as the UNBIASED Simpson index
    1 − Σtf(tf−1)/(n(n−1)) — the probability two tokens drawn without
    replacement differ. The standard diversity signal (like entropy)
    but fully RATIONAL: every term is an exact BIGINT and the single
    double division is engine-exact, where a Shannon entropy would sum
    libm logs in engine-dependent order. Low diversity = repetitive/
    boilerplate text — the same family of quality signal as the Gopher
    repetition rules (doc_repetition_scores), on a 0-1 scale.

    Scale: explode → (doc, token) tf collapse (map-side combinable) →
    per-doc reduce sharing the doc_id key; nothing wider than the per-doc
    vocabulary crosses a shuffle. Single-token docs yield NULL via
    NULLIF, not a divide error."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(_tokens()).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    s = tf.groupBy("doc_id").agg(
        F.sum("tf").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.col("tf") * (F.col("tf") - 1)).alias("rep"),
    )
    return s.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        (
            1
            - F.col("rep").cast("double")
            / F.nullif(
                F.col("n_tokens") * (F.col("n_tokens") - 1), F.lit(0)
            )
        ).alias("simpson_diversity"),
    )


# --------------------------------------------------------------------------
# E104: corpus drift — total-variation distance between token distributions
# --------------------------------------------------------------------------


@query(
    "token_distribution_drift",
    oracle="""
        WITH toks AS (
          SELECT doc_id % 2 AS grp,
                 unnest(string_split(text, ' ')) AS tok
          FROM documents
        ),
        c AS (
          SELECT tok,
                 CAST(count(*) FILTER (WHERE grp = 0) AS BIGINT) AS c1,
                 CAST(count(*) FILTER (WHERE grp = 1) AS BIGINT) AS c2
          FROM toks GROUP BY tok
        ),
        n AS (
          SELECT CAST(sum(c1) AS BIGINT) AS n1,
                 CAST(sum(c2) AS BIGINT) AS n2,
                 CAST(count(*) AS BIGINT) AS vocab_union
          FROM c
        )
        SELECT n.n1 AS n_tokens_a, n.n2 AS n_tokens_b, n.vocab_union,
               CAST(sum(abs(c.c1 * n.n2 - c.c2 * n.n1)) AS DOUBLE)
                 / (2.0 * n.n1 * n.n2) AS tvd
        FROM c, n
        GROUP BY n.n1, n.n2, n.vocab_union
    """,
)
def token_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E104: dataset-shift detection — the total-variation distance
    TVD = ½·Σ|p_t − q_t| between the token distributions of two corpus
    slices (even vs odd doc ids standing in for before/after ingests).
    The drift alarm a training-data pipeline runs before a new crawl
    batch joins the mix. TVD instead of KL/Jensen-Shannon is a
    determinism choice: |c1·n2 − c2·n1| keeps every per-token term an
    exact BIGINT (KL's logs would accumulate libm floats in engine
    order), with ONE double division at the end — engine-exact.
    Absent-from-one-side tokens contribute their full mass, so new
    vocabulary is drift, as it should be.

    Scale: explode collapses map-side to the vocabulary; both slice
    counts ride ONE aggregate (conditional counts, no self-join); the
    totals are a 1-row broadcast crossJoin. At extreme corpus sizes the
    BIGINT product c·n approaches overflow (c·n ≤ n², n ≈ 2^31 tokens
    per slice is the safe bound) — switch the numerator to DECIMAL(38,0)
    past that; documented, not silent."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        (F.col("doc_id") % 2).alias("grp"),
        F.explode(_tokens()).alias("tok"),
    )
    c = toks.groupBy("tok").agg(
        F.count(F.when(F.col("grp") == 0, 1)).alias("c1"),
        F.count(F.when(F.col("grp") == 1, 1)).alias("c2"),
    )
    n = c.agg(
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        F.count(F.lit(1)).alias("vocab_union"),
    )
    return (
        c.crossJoin(F.broadcast(n))
        .groupBy("n1", "n2", "vocab_union")
        .agg(
            F.sum(
                F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))
            ).alias("num")
        )
        .select(
            F.col("n1").alias("n_tokens_a"),
            F.col("n2").alias("n_tokens_b"),
            "vocab_union",
            (
                F.col("num").cast("double")
                / (2.0 * F.col("n1") * F.col("n2"))
            ).alias("tvd"),
        )
    )


# --------------------------------------------------------------------------
# E113: character-trigram noise scoring (mojibake / garbage detection)
# --------------------------------------------------------------------------


@query(
    "char_trigram_noise",
    oracle="""
        WITH pos AS (
          SELECT doc_id, text,
                 unnest(generate_series(1, length(text) - 2)) AS i
          FROM documents
          WHERE length(text) >= 3
        ),
        tri AS (
          SELECT doc_id, substring(text, CAST(i AS INTEGER), 3) AS tri
          FROM pos
        ),
        df AS (
          SELECT tri, COUNT(DISTINCT doc_id) AS df_count FROM tri
          GROUP BY tri
        ),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        common AS (
          SELECT tri FROM df, n
          WHERE df_count >= 2 AND df_count * 100 >= n_docs
        ),
        per AS (
          SELECT t.doc_id,
                 COUNT(*) AS n_tri,
                 SUM(CASE WHEN c.tri IS NULL THEN 1 ELSE 0 END) AS n_rare
          FROM tri t LEFT JOIN common c ON t.tri = c.tri
          GROUP BY t.doc_id
        )
        SELECT doc_id,
               CAST(n_tri AS BIGINT) AS n_tri,
               CAST(n_rare AS BIGINT) AS n_rare,
               CAST(n_rare AS DOUBLE) / n_tri AS rare_frac,
               (n_rare * 2 > n_tri) AS noisy
        FROM per
    """,
)
def char_trigram_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E113: corpus-level noise / mojibake detection — for each document,
    the fraction of its character-trigram occurrences whose corpus
    document frequency is below max(2, 1% of documents) — the df≥2 floor
    keeps document-unique trigrams "rare" even in corpora under 100
    docs. Clean prose is built
    almost entirely from the language's common-trigram head; binary
    spill, encoding damage, and keyboard mash produce trigrams nothing
    else in the corpus shares, so a high ``rare_frac`` flags the doc
    without any language model (the heuristic behind C4/Gopher-style
    "gibberish" filters, reduced to exact integer counting).

    Exactness: the 1%-of-docs threshold is the integer test
    ``df·100 ≥ n_docs`` and ``rare_frac`` is one correctly-rounded
    int/int divide, so the hash gate holds across engines. Docs shorter
    than 3 chars have no trigrams and are excluded (both engines emit no
    positions for them).

    Scale: two narrow scans of the docs (occurrence explode for scoring,
    per-doc array_distinct explode for DF — so no .distinct() exchange
    of the per-occurrence frame ever happens) and one shuffle of the
    already-deduped (doc, tri) rows. The design
    trick is the *complement* join: the rare tail of the DF table grows
    with the corpus, but the COMMON head is bounded by
    avg-distinct-trigrams-per-doc / 1% regardless of corpus size
    (≤ ~50k entries for 500-char docs), so the per-doc scoring join
    broadcasts the head and never shuffles the tail. The 1-row n_docs
    crossJoin is a broadcast scalar (BNLJ_OK)."""
    docs = load_table(spark, sf_dir, "documents")
    # Explode amplification sizing: the scan partitions by INPUT bytes,
    # but this operator's cost is ~500× that (every char position).
    # Widen (never collapse) to the cluster's parallelism so one small
    # parquet file can't serialize the whole explode onto one core —
    # measured 3.6 s → 1.3 s at sf0.1 on local[32].
    par = default_parallelism(spark)
    _np = input_partitions(docs)
    if _np is None or _np < par:
        docs = docs.repartition(par)
    tri_array = F.expr(
        "transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))"
    )
    tri = (
        docs.filter(F.length("text") >= 3)
        .select("doc_id", F.explode(tri_array).alias("tri"))
    )
    # DF via per-doc array_distinct BEFORE the explode: the only wide
    # exchange is over the already-deduped (doc, distinct-tri) rows —
    # never a .distinct() shuffle of the full per-occurrence frame
    df_counts = (
        docs.filter(F.length("text") >= 3)
        .select(F.explode(F.array_distinct(tri_array)).alias("tri"))
        .groupBy("tri")
        .agg(F.count(F.lit(1)).alias("df_count"))
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    common = (
        df_counts.crossJoin(F.broadcast(n_docs))
        .filter(
            (F.col("df_count") >= 2)
            & (F.col("df_count") * 100 >= F.col("n_docs"))
        )
        .select("tri")
    )
    scored = (
        tri.join(F.broadcast(common).withColumn("_common", F.lit(1)), "tri", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tri"),
            F.sum(
                F.when(F.col("_common").isNull(), 1).otherwise(0)
            ).alias("n_rare"),
        )
    )
    return scored.select(
        "doc_id",
        "n_tri",
        "n_rare",
        (F.col("n_rare").cast("double") / F.col("n_tri")).alias("rare_frac"),
        (F.col("n_rare") * 2 > F.col("n_tri")).alias("noisy"),
    )


# --------------------------------------------------------------------------
# E139: Good-Turing missing mass + Chao1 vocabulary richness
# --------------------------------------------------------------------------


@query(
    "corpus_coverage_estimates",
    oracle="""
        WITH tf AS (
          SELECT token, CAST(COUNT(*) AS BIGINT) AS f
          FROM (
            SELECT unnest(string_split(text, ' ')) AS token FROM documents
          ) WHERE token <> '' GROUP BY token
        ), fof AS (
          SELECT CAST(SUM(f) AS BIGINT) AS n_tokens,
                 CAST(COUNT(*) AS BIGINT) AS vocab_size,
                 CAST(COUNT(*) FILTER (WHERE f = 1) AS BIGINT)
                   AS n_singletons,
                 CAST(COUNT(*) FILTER (WHERE f = 2) AS BIGINT)
                   AS n_doubletons
          FROM tf
        )
        SELECT n_tokens, vocab_size, n_singletons, n_doubletons,
               CAST(n_singletons AS DOUBLE) / n_tokens AS missing_mass,
               CAST(vocab_size AS DOUBLE)
                 + CAST(n_singletons AS DOUBLE)
                   * CAST(n_singletons AS DOUBLE)
                   / NULLIF(2.0 * n_doubletons, 0.0) AS chao1_vocab
        FROM fof
    """,
)
def corpus_coverage_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E139: corpus-coverage estimators from the frequency-of-frequencies
    profile — Good-Turing missing mass P(next token is UNSEEN) = n₁/N
    (Good 1953) and the Chao1 lower bound on true vocabulary size
    V + n₁²/(2n₂) (Chao 1984). Together they answer the 100 TB curation
    question "is this corpus big enough / still growing in vocabulary?"
    from two numbers no sampling can shortcut.

    Exactness: N, V, n₁, n₂ are exact BIGINTs from two
    map-side-combinable aggregates (token counts → one 4-number reduce);
    the two estimators are fixed chains of IEEE divisions, NULL-guarded
    when n₂ = 0 (Chao1 undefined) instead of a divide-by-zero.

    Scale: ONE vocab-wide shuffle (the token count — linear, the same
    exchange every tokenizer stat pays), then a 1-row reduce; the
    frequency-of-frequencies collapse never materializes per-frequency
    groups wider than the 4 counters."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    fof = tf.agg(
        F.sum("f").alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab_size"),
        F.count(F.when(F.col("f") == 1, 1)).alias("n_singletons"),
        F.count(F.when(F.col("f") == 2, 1)).alias("n_doubletons"),
    )
    return fof.select(
        "n_tokens",
        "vocab_size",
        "n_singletons",
        "n_doubletons",
        (F.col("n_singletons").cast("double") / F.col("n_tokens")).alias(
            "missing_mass"
        ),
        (
            F.col("vocab_size").cast("double")
            + F.col("n_singletons").cast("double")
            * F.col("n_singletons").cast("double")
            / F.nullif(2.0 * F.col("n_doubletons"), F.lit(0.0))
        ).alias("chao1_vocab"),
    )


# --------------------------------------------------------------------------
# E149: sparse TF-vector cosine pairs via df-capped posting-list join
# --------------------------------------------------------------------------

#: Ubiquitous-token prune for the pair join: a token appearing in more
#: than 1/20th of the corpus generates O((n/20)^2) candidate pairs on its
#: own and carries near-zero similarity signal; dropping it bounds the
#: posting self-join the same way the prefix filter bounds
#: exact_jaccard_pairs. The capped vocabulary IS the operator's declared
#: vector space (rare-token cosine), so the oracle matches exactly.
_TF_DF_CAP_DEN = 20
#: ABSOLUTE posting-length cap, alongside the relative one: the relative
#: cap alone scales with the corpus (df <= n/20 lets every posting list
#: grow 10x when docs grow 10x, and the self-join's pair work grows
#: ~100x — measured exponent 2.07 on the sf0.1 -> sf1 study, round 6).
#: Capping the list length absolutely bounds each token's pair work at
#: C(cap, 2) regardless of corpus size, making total candidates linear
#: in VOCABULARY — the same absolute-frequency bar ES more-like-this
#: (max_doc_freq) and PPJoin-family prefix filters apply. Tokens this
#: common across an unbounded corpus are stopwords for the rare-token
#: vector space anyway. 256 sits just above the relative cap at the
#: bench sf0.1 (5000 docs, n/20 = 250), so results at BOTH test scales
#: are exactly what the relative-only rule produced, and every larger
#: corpus gets the constant bound: C(256,2) ≈ 33k pairs per token,
#: linear-in-vocabulary totals.
_TF_DF_ABS_CAP = 256
_TF_COS_MIN = 0.30


@query(
    "doc_tf_cosine_pairs",
    oracle=f"""
        WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS token
          FROM documents
        ), tf AS (
          SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
          FROM tok GROUP BY doc_id, token
        ), df AS (
          SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token
        ), nd AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
        ), kept AS (
          SELECT t.doc_id, t.token, t.tf
          FROM tf t JOIN df USING (token) CROSS JOIN nd
          WHERE df.df >= 2 AND df.df * {_TF_DF_CAP_DEN} <= nd.n_docs
            AND df.df <= {_TF_DF_ABS_CAP}
        ), norms AS (
          SELECT doc_id, CAST(SUM(tf * tf) AS BIGINT) AS nrm2
          FROM kept GROUP BY doc_id
        ), dots AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(SUM(a.tf * b.tf) AS BIGINT) AS dot_tf
          FROM kept a JOIN kept b
            ON a.token = b.token AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
        )
        SELECT d.doc_a, d.doc_b, d.dot_tf,
               CAST(d.dot_tf AS DOUBLE)
                 / sqrt(CAST(na.nrm2 * nb.nrm2 AS DOUBLE)) AS cos_sim
        FROM dots d
        JOIN norms na ON na.doc_id = d.doc_a
        JOIN norms nb ON nb.doc_id = d.doc_b
        WHERE CAST(d.dot_tf AS DOUBLE)
                / sqrt(CAST(na.nrm2 * nb.nrm2 AS DOUBLE)) >= {_TF_COS_MIN}
    """,
)
def doc_tf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E149: exact sparse-vector cosine similarity between documents over
    the RARE-token vocabulary (df >= 2 and df <= n_docs/20), computed as a
    posting-list self-join — the inverted-index formulation of document
    similarity (complements minhash_lsh_neardup, which approximates
    Jaccard; this is exact cosine on TF vectors).

    Scale: the join key is the token, and the df caps bound each token's
    contribution — relatively (df <= n_docs/20: kill the head tokens that
    dominate cost with noise) AND absolutely (df <= _TF_DF_ABS_CAP: bound
    every posting list, so per-token pair work is C(cap, 2) at ANY corpus
    size and total candidates are linear in vocabulary, not quadratic in
    documents — the round-6 scaling study measured exponent 2.07 without
    it). The same frequency prune every production similarity self-join
    (PPJoin, ES more-like-this max_doc_freq) applies. Dot products and
    norms are exact BIGINT sums; cosine is one sqrt + one division over
    identical operands, so the threshold verdict is bit-identical in
    both engines."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
        )
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    df = tf.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("df"))
    nd = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    kept = scoped_persist(
        tf.join(df, "token")
        .crossJoin(F.broadcast(nd))
        .where(
            (F.col("df") >= 2)
            & (F.col("df") * _TF_DF_CAP_DEN <= F.col("n_docs"))
            & (F.col("df") <= _TF_DF_ABS_CAP)
        )
        .select("doc_id", "token", "tf")
    )
    norms = kept.groupBy("doc_id").agg(
        F.sum(F.col("tf") * F.col("tf")).cast("long").alias("nrm2")
    )
    a, b = kept.alias("a"), kept.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.sum(F.col("a.tf") * F.col("b.tf")).cast("long").alias("dot_tf"))
    )
    na = norms.alias("na")
    nb = norms.alias("nb")
    cos = F.col("dot_tf").cast("double") / F.sqrt(
        (F.col("na.nrm2") * F.col("nb.nrm2")).cast("double")
    )
    return (
        dots.join(na, F.col("doc_a") == F.col("na.doc_id"))
        .join(nb, F.col("doc_b") == F.col("nb.doc_id"))
        .where(cos >= _TF_COS_MIN)
        .select("doc_a", "doc_b", "dot_tf", cos.alias("cos_sim"))
    )


# --------------------------------------------------------------------------
# E157: bigram language model with add-one smoothing
# --------------------------------------------------------------------------

#: Report only bigrams seen at least this often — the LM table a scorer
#: would broadcast; the unbounded singleton tail stays distributed.
_BIGRAM_MIN_COUNT = 5


@query(
    "token_bigram_lm",
    oracle=f"""
        WITH tok AS (
          SELECT doc_id,
                 unnest(string_split(text, ' ')) AS w,
                 generate_subscripts(string_split(text, ' '), 1) AS ord
          FROM documents
        ), vocab AS (
          SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM tok
        ), big AS (
          SELECT a.w AS w1, b.w AS w2, CAST(COUNT(*) AS BIGINT) AS c
          FROM tok a JOIN tok b
            ON b.doc_id = a.doc_id AND b.ord = a.ord + 1
          GROUP BY a.w, b.w
        ), uni AS (
          SELECT w1, CAST(SUM(c) AS BIGINT) AS c1 FROM big GROUP BY w1
        )
        SELECT b.w1, b.w2, b.c, u.c1,
               CAST(b.c + 1 AS DOUBLE) / (u.c1 + v.v) AS p_smoothed
        FROM big b JOIN uni u USING (w1) CROSS JOIN vocab v
        WHERE b.c >= {_BIGRAM_MIN_COUNT}
    """,
)
def token_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E157: bigram language model over the corpus — adjacent-token
    conditional probabilities P(w2|w1) with add-one (Laplace) smoothing
    over the full vocabulary: the classic statistical LM whose
    per-document log-probability is the quality/fluency score heavier
    models approximate (and the direct generalization of E41's PMI lift,
    which scores only same-doc co-occurrence, not adjacency). Only
    bigrams with count >= 5 are emitted — the broadcastable scoring head;
    the singleton tail contributes to counts but never ships.

    Exactness: counts and the vocabulary size are exact BIGINTs;
    P = (c+1)/(c1+V) is ONE double division of identical integers.

    Scale: the per-doc adjacent pairing is a ZERO-SHUFFLE zip of the
    token array against itself shifted by one (no positional self-join
    in Spark — that's the oracle's formulation); bigram counts collapse
    map-side, the conditional totals reduce over the already-collapsed
    bigram frame, and V is a 1-row broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.split(F.col("text"), " ").alias("ws"))
    pairs = toks.select(
        F.explode(
            F.arrays_zip(
                F.slice(F.col("ws"), 1, F.size("ws") - 1).alias("w1"),
                F.slice(F.col("ws"), 2, F.size("ws") - 1).alias("w2"),
            )
        ).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    big = scoped_persist(
        pairs.groupBy("w1", "w2").agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )
    )
    uni = big.groupBy("w1").agg(F.sum("c").cast("long").alias("c1"))
    vocab = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("w"))
        .agg(F.countDistinct("w").cast("long").alias("v"))
    )
    return (
        big.where(F.col("c") >= _BIGRAM_MIN_COUNT)
        .join(uni, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            "c",
            "c1",
            (
                (F.col("c") + 1).cast("double") / (F.col("c1") + F.col("v"))
            ).alias("p_smoothed"),
        )
    )


# --------------------------------------------------------------------------
# E160: language-ID evaluation — confusion matrix + per-class recall
# --------------------------------------------------------------------------


@query(
    "langid_confusion_matrix",
    oracle=f"""
        WITH pred AS (
          SELECT lang AS true_lang, {_langid_sql_case()} AS predicted_lang
          FROM documents
        ), cells AS (
          SELECT true_lang, predicted_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
          FROM pred GROUP BY 1, 2
        ), rt AS (
          SELECT true_lang, CAST(SUM(n_docs) AS BIGINT) AS n_true
          FROM cells GROUP BY 1
        )
        SELECT c.true_lang, c.predicted_lang, c.n_docs,
               CAST(c.n_docs AS DOUBLE) / r.n_true AS cell_rate
        FROM cells c JOIN rt r USING (true_lang)
    """,
)
def langid_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E160: evaluation harness for the E4 language-ID classifier — the
    (true lang x predicted lang) confusion matrix with per-cell rates
    (diagonal = per-class recall): the standard readout any classifier
    in a data pipeline ships with, computed against the corpus's labeled
    ``lang`` column. Misroutings concentrate where marker vocabularies
    overlap, and this surfaces exactly which pairs.

    Exactness: the classifier is the SAME deterministic marker-argmax
    (alphabetical tie-break) as langid_heuristic, expression-shared with
    the oracle; counts are exact BIGINTs, rates one division each.

    Scale: one scan scores and classifies every doc (codegen CASE
    chain), cells collapse map-side to a |langs|^2 grid; the margin
    join runs on the collapsed grid."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    langs = sorted(LANG_MARKERS)
    scores = {l: _marker_score(toks, LANG_MARKERS[l]) for l in langs}
    expr = None
    for l in langs:
        cond = None
        for o in langs:
            if o == l:
                continue
            c = scores[l] >= scores[o]
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, l) if expr is None else expr.when(cond, l)
    pred = expr.otherwise("und")
    cells = (
        docs.select(
            F.col("lang").alias("true_lang"), pred.alias("predicted_lang")
        )
        .groupBy("true_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    cells = scoped_persist(cells)
    rt = cells.groupBy("true_lang").agg(
        F.sum("n_docs").cast("long").alias("n_true")
    )
    return cells.join(rt, "true_lang").select(
        "true_lang",
        "predicted_lang",
        "n_docs",
        (F.col("n_docs").cast("double") / F.col("n_true")).alias("cell_rate"),
    )


# --------------------------------------------------------------------------
# E163: corpus vocabulary-growth curve (first-seen tokens per source)
# --------------------------------------------------------------------------


@query(
    "token_first_seen_curve",
    oracle="""
        WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w
          FROM documents
        ), first_seen AS (
          SELECT w, CAST(MIN(doc_id) AS BIGINT) AS first_doc
          FROM tok GROUP BY w
        ), bucketed AS (
          SELECT CAST(first_doc // 100 AS BIGINT) AS doc_bucket,
                 CAST(COUNT(*) AS BIGINT) AS n_new_tokens
          FROM first_seen GROUP BY 1
        )
        SELECT doc_bucket, n_new_tokens,
               CAST(SUM(n_new_tokens) OVER (
                 ORDER BY doc_bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum_vocab
        FROM bucketed
    """,
)
def token_first_seen_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E163: vocabulary-growth (Heaps-law) curve — per bucket of 100
    docs in ingestion order, how many tokens appear for the FIRST time,
    plus the running vocabulary size: the corpus-novelty diagnostic that
    tells a collection pipeline when additional data stops adding new
    language (the corpus twin of E54's per-user novelty curve, and the
    curve whose asymptote E139's Chao1 estimates).

    Exactness: first-seen is an exact MIN over doc ids; counts are
    BIGINTs; the cumulative window runs over the bucket frame.

    Scale: one token scan collapses map-side to the vocabulary frame
    (w, min_doc) — the per-token reduce every distinct-like query pays —
    then to |corpus|/100 bucket rows; the cumulative vocab uses the
    two-phase distributed prefix sum (range-partition -> local windows
    -> broadcast 32-row offsets), so no single-partition window exists
    at ANY corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    first = (
        docs.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("w")
        )
        .groupBy("w")
        .agg(F.min("doc_id").cast("long").alias("first_doc"))
    )
    bucketed = first.groupBy(
        F.expr("first_doc div 100").cast("long").alias("doc_bucket")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_new_tokens"))
    # cumulative vocab via the TWO-PHASE distributed prefix sum (the
    # value_ks_drift shape): bucket count grows with corpus/100, so a
    # single-partition global window would not survive a web-scale
    # corpus — range-partition, local windows, broadcast 32-row offsets
    local = bucketed.repartitionByRange(32, "doc_bucket").select(
        "doc_bucket",
        "n_new_tokens",
        F.spark_partition_id().alias("pid"),
    )
    w_local = (
        Window.partitionBy("pid")
        .orderBy("doc_bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    part_tot = local.groupBy("pid").agg(F.sum("n_new_tokens").alias("t"))
    w_off = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = part_tot.select(
        "pid", F.coalesce(F.sum("t").over(w_off), F.lit(0)).alias("off")
    )
    return local.join(F.broadcast(offsets), "pid").select(
        "doc_bucket",
        "n_new_tokens",
        (F.col("off") + F.sum("n_new_tokens").over(w_local))
        .cast("long")
        .alias("cum_vocab"),
    )


# --------------------------------------------------------------------------
# E181: corpus datasheet card (one-row release summary)
# --------------------------------------------------------------------------

#: "Short document" cut for the datasheet share (tokens).
CARD_SHORT_TOKENS = 20


@query(
    "corpus_datasheet_card",
    oracle=f"""
        WITH base AS (
          SELECT sha256(text) AS h,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok,
                 lang
          FROM documents
        ), m AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(COUNT(DISTINCT h) AS BIGINT) AS n_unique_docs,
                 CAST(SUM(ntok) AS BIGINT) AS total_tokens,
                 CAST(COUNT(*) FILTER (WHERE ntok < {CARD_SHORT_TOKENS})
                   AS BIGINT) AS n_short,
                 CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
          FROM base
        ), v AS (
          SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS vocab_size
          FROM documents, LATERAL UNNEST(string_split(text, ' ')) AS u(tok)
        )
        SELECT m.n_docs, m.n_unique_docs,
               CAST(m.n_docs - m.n_unique_docs AS DOUBLE) / m.n_docs
                 AS dup_rate,
               m.total_tokens,
               CAST(m.total_tokens AS DOUBLE) / m.n_docs AS mean_doc_tokens,
               CAST(m.n_short AS DOUBLE) / m.n_docs AS short_doc_share,
               m.n_langs, v.vocab_size
        FROM m CROSS JOIN v
    """,
)
def corpus_datasheet_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E181: the one-row "datasheet for datasets" summary a corpus
    release ships with (Gebru et al., CACM 2021): scale (docs, tokens,
    vocabulary), integrity (exact-duplicate rate by content hash),
    composition (language count, short-doc share). Every number is the
    headline figure of a pack operator (E1 dedup, E4 token stats) — the
    card is what goes in the README; the operators are the drill-down.

    Exactness: counts and integer sums only; the three shares are one
    double division each on identical operands.

    Scale: two map-side-combinable aggregates — the metrics pass
    (content hash + token count per doc, no shuffle beyond the final
    1-row combine) and the vocabulary distinct (token-keyed exchange,
    the unavoidable cost of an exact vocab count; swap for a HLL at
    100 TB via E23's sketch path) — crossJoined as two 1-row frames."""
    docs = load_table(spark, sf_dir, "documents")
    ntok = F.size(F.split(F.col("text"), " ")).cast("long")
    m = docs.select(
        F.sha2(F.col("text"), 256).alias("h"),
        ntok.alias("ntok"),
        "lang",
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("h").alias("n_unique_docs"),
        F.sum("ntok").cast("long").alias("total_tokens"),
        F.count(F.when(F.col("ntok") < CARD_SHORT_TOKENS, 1))
        .cast("long")
        .alias("n_short"),
        F.countDistinct("lang").alias("n_langs"),
    )
    v = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .agg(F.countDistinct("tok").alias("vocab_size"))
    )
    return m.crossJoin(F.broadcast(v)).select(
        "n_docs",
        "n_unique_docs",
        (
            (F.col("n_docs") - F.col("n_unique_docs")).cast("double")
            / F.col("n_docs")
        ).alias("dup_rate"),
        "total_tokens",
        (F.col("total_tokens").cast("double") / F.col("n_docs")).alias(
            "mean_doc_tokens"
        ),
        (F.col("n_short").cast("double") / F.col("n_docs")).alias(
            "short_doc_share"
        ),
        "n_langs",
        "vocab_size",
    )


# --------------------------------------------------------------------------
# E186: word2vec unigram sampling table (negative sampling + subsampling)
# --------------------------------------------------------------------------

#: count^0.75 in the sqrt-only form c^0.75 = sqrt(c·sqrt(c)): two
#: CORRECTLY-ROUNDED IEEE operations, engine-exact — libm pow(c, 0.75)
#: is not (last-ulp differences would poison the hash gate). The weight
#: quantizes to 2-dp fixed point BEFORE the normalizer sum, so Z is an
#: exact integer under any partitioning.
_NEG_W = (
    "CAST(FLOOR(SQRT(c * SQRT(CAST(c AS DOUBLE))) * 100 + 0.5) AS BIGINT)"
)
#: word2vec subsampling threshold (Mikolov et al. 2013, eq. 5 form).
_SUBSAMPLE_T = "1e-4"
_KEEP_P = (
    f"LEAST(CAST(1 AS DOUBLE),"
    f" (SQRT((CAST(c AS DOUBLE) / total_tokens) / {_SUBSAMPLE_T}) + 1.0)"
    f" * {_SUBSAMPLE_T} / (CAST(c AS DOUBLE) / total_tokens))"
)


@query(
    "unigram_sampling_table",
    oracle=f"""
        WITH cnt AS (
          SELECT tok AS token, CAST(COUNT(*) AS BIGINT) AS c
          FROM documents, LATERAL UNNEST(string_split(text, ' ')) AS u(tok)
          GROUP BY tok
        ), w AS (
          SELECT token, c, {_NEG_W} AS w_int FROM cnt
        ), z AS (
          SELECT CAST(SUM(w_int) AS BIGINT) AS z_total,
                 CAST(SUM(c) AS BIGINT) AS total_tokens
          FROM w
        )
        SELECT w.token, w.c AS n_occurrences, w.w_int,
               CAST(w.w_int AS DOUBLE) / z.z_total AS neg_sample_prob,
               {_KEEP_P} AS keep_prob
        FROM w CROSS JOIN z
    """,
)
def unigram_sampling_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E186: the word2vec sampling table — per token, the negative-
    sampling probability ∝ count^{3/4} (the unigram-to-the-3/4 law that
    up-weights rare words) and the subsampling keep-probability
    (√(f/t)+1)·t/f that discards ultra-frequent tokens (Mikolov et al.,
    NeurIPS 2013). The table every skip-gram/contrastive trainer
    materializes before touching the corpus; pairs with E17's
    commonness scores (ranking) by supplying the SAMPLING law.

    Exactness: count^0.75 is computed as sqrt(c·sqrt(c)) — two
    correctly-rounded IEEE ops, bit-equal in both engines, where libm
    pow() is not — then quantized to a 2-dp integer BEFORE the
    normalizer, so Z is an exact integer sum; both probabilities are
    per-row shared-literal double chains.

    Scale: one token-keyed counting aggregate (map-side combine), a
    1-row (Z, T) crossJoin, and per-row arithmetic — the output is
    vocabulary-sized, the natural broadcast table for the training
    job."""
    docs = load_table(spark, sf_dir, "documents")
    cnt = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    w = cnt.select("token", "c", F.expr(_NEG_W).alias("w_int"))
    z = w.agg(
        F.sum("w_int").cast("long").alias("z_total"),
        F.sum("c").cast("long").alias("total_tokens"),
    )
    return w.crossJoin(F.broadcast(z)).select(
        "token",
        F.col("c").alias("n_occurrences"),
        "w_int",
        (F.col("w_int").cast("double") / F.col("z_total")).alias(
            "neg_sample_prob"
        ),
        F.expr(_KEEP_P).alias("keep_prob"),
    )


# --------------------------------------------------------------------------
# E196: per-source log2 document-length histogram (context planning)
# --------------------------------------------------------------------------


@query(
    "doc_length_log2_histogram",
    oracle="""
        WITH t AS (
          SELECT source,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
          FROM documents
        )
        SELECT source,
               CAST(length(printf('%b', ntok)) - 1 AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(ntok) AS BIGINT) AS n_tokens
        FROM t WHERE ntok >= 1
        GROUP BY 1, 2
    """,
)
def doc_length_log2_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E196: per-source power-of-two token-length histogram — bucket k
    holds 2^k ≤ len < 2^(k+1) — the context-window planning view: what
    share of each source fits a 2k/8k/32k window, and how many tokens a
    truncation cut at each boundary would cost (E25's chunker and the
    packing pack consume exactly this). The bucket index is the length's
    BINARY digit count minus one (Spark ``bin()``, DuckDB
    ``printf('%b')`` — the E97 idiom): pure integer string length, no
    libm log2 to misplace values adjacent to powers of two.

    Scale: one narrow projection and one (source × ~12 buckets)
    map-side-combinable aggregate — nothing else."""
    docs = load_table(spark, sf_dir, "documents")
    ntok = F.size(F.split(F.col("text"), " ")).cast("long")
    t = docs.select("source", ntok.alias("ntok")).where(F.col("ntok") >= 1)
    return t.groupBy(
        "source",
        (F.length(F.bin("ntok")) - 1).cast("long").alias("bucket"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("ntok").cast("long").alias("n_tokens"),
    )


# --------------------------------------------------------------------------
# E197: data-mixture epoch plan (token budget vs source inventory)
# --------------------------------------------------------------------------

#: Target mixture weights per source (fixed contract literals, the
#: DoReMi/Pile-style recipe a run config pins) and the run's total token
#: budget as a multiple of the corpus inventory.
MIXTURE_WEIGHTS = {f"src{i}": (10 - i) for i in range(10)}  # /55 normalized
_MIX_DEN = sum(MIXTURE_WEIGHTS.values())
TOKEN_BUDGET_X = 5  # budget = 5 x total corpus tokens
#: Repetition ceiling: >4 epochs over the same source measurably decays
#: quality (Muennighoff et al. 2023) — flagged, not enforced.
MAX_EPOCHS = 4

_MIX_W_CASE = (
    "CASE "
    + " ".join(
        f"WHEN source = '{s}' THEN {w}"
        for s, w in sorted(MIXTURE_WEIGHTS.items())
    )
    + " ELSE 0 END"
)


@query(
    "mixture_epoch_plan",
    oracle=f"""
        WITH inv AS (
          SELECT source,
                 CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                   AS src_tokens
          FROM documents GROUP BY source
        ), tot AS (
          SELECT CAST(SUM(src_tokens) AS BIGINT) AS all_tokens FROM inv
        )
        SELECT i.source, i.src_tokens,
               CAST({_MIX_W_CASE} AS BIGINT) AS weight_num,
               (CAST({_MIX_W_CASE} AS DOUBLE) / {_MIX_DEN})
                 * ({TOKEN_BUDGET_X} * t.all_tokens) AS target_tokens,
               ((CAST({_MIX_W_CASE} AS DOUBLE) / {_MIX_DEN})
                 * ({TOKEN_BUDGET_X} * t.all_tokens)) / i.src_tokens
                 AS epochs_needed,
               (((CAST({_MIX_W_CASE} AS DOUBLE) / {_MIX_DEN})
                 * ({TOKEN_BUDGET_X} * t.all_tokens)) / i.src_tokens)
                 > {MAX_EPOCHS} AS over_repetition_cap
        FROM inv i CROSS JOIN tot t
    """,
)
def mixture_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E197: the data-budget table a pretraining run is planned from —
    given the pinned mixture weights and a token budget (here 5× the
    corpus inventory), how many tokens each source must contribute and
    how many EPOCHS over that source this implies, flagging sources
    pushed past the ~4-epoch repetition ceiling (Muennighoff et al.
    2023, "Scaling Data-Constrained Language Models"). Pairs with E4's
    mixture SAMPLERS: this plans the recipe, those execute it.

    Exactness: inventory is exact integer token counts; weights and the
    budget are shared contract literals; targets/epochs are per-row
    double chains on identical operands.

    Scale: one token-count aggregate to the |sources| frame + a 1-row
    total crossJoin."""
    docs = load_table(spark, sf_dir, "documents")
    inv = docs.groupBy("source").agg(
        F.sum(F.size(F.split(F.col("text"), " ")))
        .cast("long")
        .alias("src_tokens")
    )
    tot = inv.agg(F.sum("src_tokens").cast("long").alias("all_tokens"))
    w = F.expr(_MIX_W_CASE)
    target = (w.cast("double") / _MIX_DEN) * (
        TOKEN_BUDGET_X * F.col("all_tokens")
    )
    return inv.crossJoin(F.broadcast(tot)).select(
        "source",
        "src_tokens",
        w.cast("long").alias("weight_num"),
        target.alias("target_tokens"),
        (target / F.col("src_tokens")).alias("epochs_needed"),
        ((target / F.col("src_tokens")) > MAX_EPOCHS).alias(
            "over_repetition_cap"
        ),
    )


# --------------------------------------------------------------------------
# E223: per-document bigram surprisal (exact quarter-bit perplexity filter)
# --------------------------------------------------------------------------

#: Mantissa scale for the integer log2 lattice: probabilities are
#: rationals num/den; m = floor(num * 2^31 / den) is the 31-bit fixed
#: point of p, clamped to >= 1 (a clamp only binds when p < 2^-31 —
#: "impossible token", where capping surprisal at 31 bits changes no
#: filtering decision).
_SURP_SCALE = 2_147_483_648  # 2^31
_SURP_SQ2 = 8_589_934_592    # 2^33: (mm/2^16)^2 >= 2  <=>  mm^2 >= 2^33


def _surprisal_steps(engine: str) -> list[tuple[str, str]]:
    """(column, expr) chain computing quarter-bit surprisal from exact
    integer columns num/den (num <= den). All ops are integer compares,
    shifts and one wide floor-division — bit-identical across engines;
    no log is ever evaluated. Error < 1/4 bit (lattice) + 2^-15
    (mantissa truncation) per bigram."""
    if engine == "spark":
        wide_m = (
            f"GREATEST(CAST((CAST(num AS DECIMAL(38,0)) * {_SURP_SCALE})"
            f" div den AS BIGINT), 1)"
        )
        mm = (
            "CASE WHEN e >= 16 THEN shiftright(m, CAST(e - 16 AS INT))"
            " ELSE shiftleft(m, CAST(16 - e AS INT)) END"
        )
        mm2 = "shiftright(mm * mm, CAST(16 + b1 AS INT))"
    else:
        wide_m = (
            f"CAST(GREATEST((CAST(num AS HUGEINT) * {_SURP_SCALE})"
            f" // den, 1) AS BIGINT)"
        )
        mm = "CASE WHEN e >= 16 THEN m >> (e - 16) ELSE m << (16 - e) END"
        mm2 = "(mm * mm) >> (16 + b1)"
    return [
        ("m", wide_m),
        ("e", "LENGTH(BIN(m)) - 1"),
        ("mm", mm),
        ("b1", f"CASE WHEN mm * mm >= {_SURP_SQ2} THEN 1 ELSE 0 END"),
        ("mm2", mm2),
        ("b2", f"CASE WHEN mm2 * mm2 >= {_SURP_SQ2} THEN 1 ELSE 0 END"),
        ("qbits", "4 * (31 - e) - (2 * b1 + b2)"),
    ]


def _surprisal_oracle() -> str:
    steps = _surprisal_steps("duck")
    sel = "SELECT doc_id, k, num, den"
    chain = ""
    prev = "scored0"
    chain += (
        "scored0 AS (SELECT doc_id, k, c + 1 AS num, c1 + v AS den"
        " FROM doc_big JOIN big USING (w1, w2) JOIN uni USING (w1), vocab)"
    )
    for i, (col, expr) in enumerate(steps):
        nxt = f"scored{i + 1}"
        chain += f", {nxt} AS (SELECT *, {expr} AS {col} FROM {prev})"
        prev = nxt
    return f"""
        WITH tok AS (
          SELECT doc_id,
                 unnest(string_split(text, ' ')) AS w,
                 generate_subscripts(string_split(text, ' '), 1) AS ord
          FROM documents
        ), vocab AS (
          SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM tok
        ), doc_big AS (
          SELECT a.doc_id, a.w AS w1, b.w AS w2,
                 CAST(COUNT(*) AS BIGINT) AS k
          FROM tok a JOIN tok b
            ON b.doc_id = a.doc_id AND b.ord = a.ord + 1
          GROUP BY 1, 2, 3
        ), big AS (
          SELECT w1, w2, CAST(SUM(k) AS BIGINT) AS c
          FROM doc_big GROUP BY 1, 2
        ), uni AS (
          SELECT w1, CAST(SUM(c) AS BIGINT) AS c1 FROM big GROUP BY 1
        ), {chain}
        SELECT doc_id,
               CAST(SUM(k) AS BIGINT) AS n_bigrams,
               CAST(SUM(k * qbits) AS BIGINT) AS surprisal_qbits,
               CAST(SUM(k * qbits) AS DOUBLE) / 4.0
                 / SUM(k) AS bits_per_token
        FROM {prev}
        GROUP BY doc_id
    """


@query("doc_bigram_surprisal", oracle=_surprisal_oracle())
def doc_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E223: per-document surprisal under the E157 corpus bigram LM —
    the perplexity-style quality filter (CCNet / FineWeb lineage: score
    each doc by bits-per-token under a cheap LM; gibberish and boilerplate
    sit in the tails). E157 materializes the MODEL; this scores every
    document against it.

    The novelty is EXACT reproducibility: no log is ever evaluated.
    -log2(p) for the rational p = (c+1)/(c1+V) is computed on an integer
    quarter-bit lattice — 31-bit fixed-point mantissa (one wide floor
    division), exponent via LENGTH(BIN(m)), two square-and-compare
    refinement bits — every step an integer op both engines execute
    identically, so per-doc scores hash-gate at any SF (a libm-log
    variant would diverge in the last ulp across engines and even across
    glibc versions — a silent nightmare for reproducible data releases).
    Lattice error < 1/4 bit + 2^-15 per bigram, uniform over documents;
    surprisal clips at 31 bits/token where p < 2^-31.

    Scale: doc-bigrams collapse per (doc, w1, w2) map-side; the model
    join is vocabulary²-bounded on (w1, w2); the only wide frames ever
    shuffled carry counts, never text. Single-token docs have no bigram
    and are excluded (they score under the unigram length gates E4/E11
    instead)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split(F.col("text"), " ").alias("ws"))
    doc_big = scoped_persist(
        toks.select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("ws"), 1, F.size("ws") - 1).alias("w1"),
                    F.slice(F.col("ws"), 2, F.size("ws") - 1).alias("w2"),
                )
            ).alias("p"),
        )
        .select(
            "doc_id",
            F.col("p.w1").alias("w1"),
            F.col("p.w2").alias("w2"),
        )
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("k"))
    )
    big = scoped_persist(
        doc_big.groupBy("w1", "w2").agg(
            F.sum("k").cast("long").alias("c")
        )
    )
    uni = big.groupBy("w1").agg(F.sum("c").cast("long").alias("c1"))
    vocab = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("w"))
        .agg(F.countDistinct("w").cast("long").alias("v"))
    )
    scored = (
        doc_big.join(big, ["w1", "w2"])
        .join(uni, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            "k",
            (F.col("c") + 1).cast("long").alias("num"),
            (F.col("c1") + F.col("v")).cast("long").alias("den"),
        )
    )
    for col, expr in _surprisal_steps("spark"):
        scored = scored.withColumn(col, F.expr(expr))
    return scored.groupBy("doc_id").agg(
        F.sum("k").cast("long").alias("n_bigrams"),
        F.sum(F.col("k") * F.col("qbits")).cast("long").alias(
            "surprisal_qbits"
        ),
        (
            F.sum(F.col("k") * F.col("qbits")).cast("double")
            / 4.0
            / F.sum("k").cast("double")
        ).alias("bits_per_token"),
    )


# --------------------------------------------------------------------------
# E237: RAKE keyphrase extraction (gaps-and-islands + degree/frequency)
# --------------------------------------------------------------------------

#: Candidate phrases are maximal stopword-delimited runs, chunked to at
#: most this many words (the practical RAKE cap — unbounded runs in
#: low-stopword text otherwise blow up phrase strings and scores).
RAKE_MAX_LEN = 4
RAKE_TOPK = 20

_RAKE_STOPSET = ", ".join(f"'{w}'" for w in STOPWORDS)


def _rake_oracle() -> str:
    return f"""
        WITH tok AS (
          SELECT doc_id,
                 unnest(string_split(text, ' ')) AS w,
                 generate_subscripts(string_split(text, ' '), 1) AS ord
          FROM documents
        ), nonstop AS (
          SELECT doc_id, w, ord,
                 ord - ROW_NUMBER() OVER (
                   PARTITION BY doc_id ORDER BY ord
                 ) AS island
          FROM tok WHERE w NOT IN ({_RAKE_STOPSET}) AND w <> ''
        ), chunked AS (
          SELECT doc_id, w, ord, island,
                 (ROW_NUMBER() OVER (
                    PARTITION BY doc_id, island ORDER BY ord
                  ) - 1) // {RAKE_MAX_LEN} AS chunk
          FROM nonstop
        ), sized AS (
          SELECT *, CAST(COUNT(*) OVER (
                   PARTITION BY doc_id, island, chunk
                 ) AS BIGINT) AS plen
          FROM chunked
        ), wstats AS (
          SELECT w, CAST(COUNT(*) AS BIGINT) AS freq,
                 CAST(SUM(plen) AS BIGINT) AS deg
          FROM sized GROUP BY w
        ), wscore AS (
          SELECT w, CAST(FLOOR(CAST(deg AS DOUBLE) / freq * 1000000000
                   + 0.5) AS BIGINT) AS sq
          FROM wstats
        ), occ AS (
          SELECT s.doc_id, s.island, s.chunk,
                 string_agg(s.w, ' ' ORDER BY s.ord) AS phrase,
                 CAST(COUNT(*) AS BIGINT) AS n_words,
                 CAST(SUM(ws.sq) AS BIGINT) AS score_q
          FROM sized s JOIN wscore ws ON s.w = ws.w
          GROUP BY s.doc_id, s.island, s.chunk
        )
        SELECT phrase, MAX(n_words) AS n_words,
               CAST(COUNT(*) AS BIGINT) AS n_occurrences,
               CAST(MAX(score_q) AS DOUBLE) / 1000000000 AS rake_score
        FROM occ
        GROUP BY phrase
        ORDER BY MAX(score_q) DESC, phrase
        LIMIT {RAKE_TOPK}
    """


@query("rake_keyphrases", oracle=_rake_oracle())
def rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E237: RAKE keyphrase extraction (Rose et al. 2010) — the
    stopword-delimited phrase miner every lightweight corpus-exploration
    stack ships: candidate phrases are maximal runs of non-stopwords
    (the SQL gaps-and-islands pattern: ord − row_number is constant
    within a run), capped at RAKE_MAX_LEN words; each word scores
    degree/frequency (degree = Σ lengths of the phrases it appears in —
    words that live in long phrases score higher), and a phrase scores
    the sum of its words' scores.  Complements the retrieval family:
    E39/E40 rank documents for a query, E118 (distinctive tokens)
    ranks single words; this surfaces multi-word candidate TERMS.

    Exactness: freq/deg/phrase lengths are exact integers; each word
    score is ONE double division quantized to 1e-9 integers, so phrase
    scores are exact integer sums (identical text ⇒ identical word
    multiset ⇒ identical score in any engine or order); top-K breaks
    ties on the phrase text.

    Scale: tokens explode map-side; islands/chunks are per-doc windows
    (bounded partitions); word stats collapse to the vocabulary frame;
    the score join is a keyed equi-join on the word; TakeOrdered ships
    K rows per partition."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("ord0", "w"),
    ).select("doc_id", (F.col("ord0") + 1).alias("ord"), "w")
    nonstop = (
        tok.filter(~F.col("w").isin(*STOPWORDS) & (F.col("w") != ""))
        .select(
            "doc_id",
            "w",
            "ord",
            (
                F.col("ord")
                - F.row_number().over(
                    Window.partitionBy("doc_id").orderBy("ord")
                )
            ).alias("island"),
        )
    )
    chunked = nonstop.select(
        "doc_id",
        "w",
        "ord",
        "island",
        (
            (
                F.row_number().over(
                    Window.partitionBy("doc_id", "island").orderBy("ord")
                )
                - 1
            )
            / RAKE_MAX_LEN
        )
        .cast("long")
        .alias("chunk"),
    )
    sized = scoped_persist(
        chunked.select(
            "*",
            F.count(F.lit(1))
            .over(Window.partitionBy("doc_id", "island", "chunk"))
            .cast("long")
            .alias("plen"),
        )
    )
    wscore = (
        sized.groupBy("w")
        .agg(
            F.count(F.lit(1)).cast("long").alias("freq"),
            F.sum("plen").cast("long").alias("deg"),
        )
        .select(
            "w",
            F.floor(
                F.col("deg").cast("double") / F.col("freq") * 1_000_000_000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("sq"),
        )
    )
    occ = (
        sized.join(wscore, "w")
        .groupBy("doc_id", "island", "chunk")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("ord", "w"))),
                    lambda x: x["w"],
                ),
                " ",
            ).alias("phrase"),
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("sq").cast("long").alias("score_q"),
        )
    )
    return (
        occ.groupBy("phrase")
        .agg(
            F.max("n_words").alias("n_words"),
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.max("score_q").alias("sq_max"),
        )
        .orderBy(F.desc("sq_max"), F.asc("phrase"))
        .limit(RAKE_TOPK)
        .select(
            "phrase",
            "n_words",
            "n_occurrences",
            (F.col("sq_max").cast("double") / 1_000_000_000).alias(
                "rake_score"
            ),
        )
    )
