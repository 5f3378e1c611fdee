"""Corpus-hygiene operators: blocklist filtering and benchmark
decontamination.

Two more standard stages of an LLM training-data pipeline (the C4/Gopher
lineage), alongside dedup/quality/packing:

  * **blocklist filtering**: count and strip blocked vocabulary per
    document, and flag documents whose blocked-token ratio crosses the
    drop threshold.  Pure array expressions — filter/size/array_join are
    codegen'd JVM-side; no UDF, no shuffle (embarrassingly parallel).

  * **benchmark decontamination**: find training documents that share a
    long n-gram with an evaluation set, the standard leakage check
    before training.  The probe "benchmark" here is a deterministic
    slice of the corpus (doc_id % 7 == 0) so the oracle can replay it;
    in production it is the actual eval suites.  Contamination is an
    equi-join on the n-gram text between corpus shingles and the
    distinct probe shingles — at 100 TB you would pre-hash the n-gram
    to 8 bytes (xxhash64) for the shuffle and string-verify only the
    hash matches, exactly like the MinHash verify stage in
    operators/dedup.py; at oracle scale the string join IS the verify.

The reference has no text surface at all (Apache-log ETL); these extend
the driver-mandated LLM-pipeline pack (SURVEY.md §2 extension rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

#: blocked vocabulary (stand-in for a real blocklist; the fixture corpus
#: is synthetic word-soup, so real obscenity lists would never match)
BLOCKED = ("slow", "big")
#: documents above this blocked-token ratio are flagged for dropping
DROP_RATIO = 0.05
#: contamination n-gram length (long enough that chance collisions are
#: rare, the usual 8-13 range from the decontamination literature)
DECON_N = 8
#: deterministic probe slice standing in for the benchmark set
PROBE_MOD = 7

_BLOCKED_SQL = ", ".join(f"'{t}'" for t in BLOCKED)


def scrub_columns(docs: DataFrame) -> DataFrame:
    """The blocklist projection itself, usable on ANY frame with
    (doc_id, text) — including an unbounded streaming one: it is a
    stateless narrow transformation, so the same expression graph runs
    under ``readStream`` without watermarks or state
    (tests/test_streaming_hygiene.py drives it over a file stream)."""
    ws = F.split(F.col("text"), " ")
    is_blocked = lambda t: t.isin(*BLOCKED)  # noqa: E731
    n_blocked = F.size(F.filter(ws, is_blocked))
    ratio = n_blocked / F.size(ws)
    return docs.select(
        "doc_id",
        n_blocked.cast("long").alias("n_blocked"),
        ratio.alias("blocked_ratio"),
        (ratio > DROP_RATIO).alias("dropped"),
        F.array_join(
            F.filter(ws, lambda t: ~t.isin(*BLOCKED)), " "
        ).alias("clean_text"),
    )


@query(
    "blocklist_scrub",
    oracle=f"""
        WITH t AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        )
        SELECT doc_id,
               CAST(len(list_filter(ws, t -> t IN ({_BLOCKED_SQL})))
                    AS BIGINT) AS n_blocked,
               len(list_filter(ws, t -> t IN ({_BLOCKED_SQL})))
                 / len(ws) AS blocked_ratio,
               len(list_filter(ws, t -> t IN ({_BLOCKED_SQL})))
                 / len(ws) > {DROP_RATIO} AS dropped,
               array_to_string(
                 list_filter(ws, t -> t NOT IN ({_BLOCKED_SQL})), ' '
               ) AS clean_text
        FROM t
    """,
)
def blocklist_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist pass: per-document blocked-token count/ratio, the
    cleaned text with blocked tokens removed, and the drop flag.  One
    narrow projection over the scan — no shuffle, no UDF; the lambda
    array functions stay inside whole-stage codegen."""
    return scrub_columns(load_table(spark, sf_dir, "documents"))


@query(
    "benchmark_decontaminate",
    oracle=f"""
        WITH g AS (
          SELECT doc_id, array_to_string(ws[i:i+{DECON_N - 1}], ' ') AS ng
          FROM (SELECT doc_id, string_split(text, ' ') AS ws
                FROM documents),
          LATERAL (
            SELECT unnest(generate_series(1, len(ws) - {DECON_N - 1})) AS i
          ) t
        )
        SELECT g.doc_id, COUNT(DISTINCT g.ng) AS n_hits
        FROM g
        JOIN (SELECT DISTINCT ng FROM g
              WHERE doc_id % {PROBE_MOD} = 0) p USING (ng)
        WHERE g.doc_id % {PROBE_MOD} <> 0
        GROUP BY g.doc_id
    """,
)
def benchmark_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set leakage check: corpus documents sharing at least one
    {DECON_N}-gram with the probe set, with the count of distinct shared
    n-grams.  Shape: explode → distinct-probe build side → equi-join →
    count-distinct per doc.  The probe side (a benchmark suite: ~10⁶
    n-grams in practice) is the natural broadcast candidate — AQE
    measures it post-distinct rather than a forced hint.  Documents
    shorter than {DECON_N} tokens contribute no n-grams (guarded; the
    ANSI element_at trap from round 1 doesn't apply to slice).

    The join and the distinct run on 64-bit FINGERPRINTS of the
    n-grams, not the strings — the ~50-byte n-gram text never crosses
    the exchange, only 8-byte longs (the standard trick in production
    decontamination: at 100 TB the shuffle is the cost, and this cuts
    its width ~6×). Fingerprints come from word_ngram_fingerprints —
    one vectorized prefix-polynomial pass per document instead of the
    slice+array_join+xxhash64 string build per gram, which profiled at
    ~145 ns/gram and 55% of this query's sf1 wall (guide §4.2); both
    join sides use the same function, so only gram equality matters. A
    fingerprint collision (p ≈ pairs/2⁶⁴) could overcount n_hits by
    one; the DuckDB oracle joins on the full strings, so the
    differential gate itself proves no collision exists in the fixture
    corpus.

    SCALE CONTRACT (why this equi-join stays LINEAR at 100 TB —
    measured exponent 0.98 on the sf0.1→sf1 leg, SCALING_r06):
    the build side is ``SELECT DISTINCT ng`` — every corpus-gram row
    matches AT MOST ONE build row, so join output ≤ |corpus grams|
    regardless of how often a gram repeats in probe documents.  Kill
    the distinct and a gram occurring p× in probes fans every corpus
    occurrence out p× (quadratic in repeated boilerplate — exactly the
    doc_tf_cosine_pairs failure mode).  The distinct is therefore a
    CAP, not an optimization; tests/test_hygiene.py pins both the
    plan (an ng-keyed aggregate under the join) and the semantics
    (probe-side multiplicity cannot change n_hits).  Probe volume is
    corpus-fraction here only because the fixture has no external eval
    suite; real probe sets are fixed-size (~10⁶ grams) and AQE
    broadcasts them, making the join map-side at any corpus scale."""
    from .chunking import word_ngram_fingerprints

    docs = load_table(spark, sf_dir, "documents")
    ngrams = word_ngram_fingerprints(F.col("text"), DECON_N)
    # NOT persisted: measured slower (4.1 s vs 2.8 s at sf0.1) — a
    # persist serializes the probe/corpus branches behind one
    # materialization job, while the un-persisted plan tokenizes twice
    # but runs both branches' scans fully parallel.
    g = docs.select("doc_id", F.explode(ngrams).alias("ng"))
    probes = (
        g.filter(F.col("doc_id") % PROBE_MOD == 0).select("ng").distinct()
    )
    return (
        g.filter(F.col("doc_id") % PROBE_MOD != 0)
        .join(probes, "ng")
        .groupBy("doc_id")
        .agg(F.countDistinct("ng").alias("n_hits"))
    )


# --------------------------------------------------------------------------
# E242: greedy vocabulary-coverage document selection (coreset picking)
# --------------------------------------------------------------------------

#: Selection budget — constant, so the driver loop is bounded.
COVERAGE_K = 10

#: Candidate batch per Spark job in the threshold-batched greedy: caps
#: driver memory at M x max-doc-bigram-set regardless of corpus size,
#: while usually letting ALL K picks resolve from one distributed
#: TakeOrdered(M) (the threshold certificate below).
COVERAGE_BATCH = 4096


def _doc_bigram_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DISTINCT bigram-set frame (doc_id, toks, tot) —
    the coverage universe shared by greedy_coverage_select and its
    oracle-checked audit companion.  One row per document."""
    from .registry import scoped_persist

    docs = load_table(spark, sf_dir, "documents")
    # coverage unit: token BIGRAMS — the corpus vocabulary is tiny by
    # construction, so unigram coverage saturates after one pick; bigram
    # coverage (~|V|^2 units) is also what tokenizer-warmup selection
    # actually optimizes (merge-pair exposure).
    ws = F.split(F.col("text"), " ")
    bigrams = F.array_distinct(
        F.array_remove(
            F.zip_with(
                F.slice(ws, 1, F.size(ws) - 1),
                F.slice(ws, 2, F.size(ws) - 1),
                lambda a, b: F.concat_ws("\u0001", a, b),
            ),
            "",
        )
    )
    # Keep the scan's NATURAL partitioning (input-split-sized): the
    # per-round TakeOrdered is a narrow map over this frame, so task
    # count should track data volume — one task at bench scale, one per
    # split at 100 TB — rather than a fixed repartition width that costs
    # a shuffle here and 32 near-empty Python-worker tasks per round.
    doc_toks = scoped_persist(
        # NULL text would carry a NULL toks array and NULL/-1 tot; if
        # such a row ever won a round, int(win[0].gain) would TypeError
        # and covered.update(None) would follow.  A NULL document covers
        # nothing, so it can never be a useful pick — drop it up front
        # (the explode-based pairs frame this replaced dropped them
        # implicitly).
        docs.filter(F.col("text").isNotNull()).select(
            "doc_id",
            bigrams.alias("toks"),
            F.size(bigrams).cast("long").alias("tot"),
        )
    )
    return doc_toks


@query("greedy_coverage_select")
def greedy_coverage_select(spark: SparkSession, sf_dir: str):
    """E242: greedy maximum-coverage document selection — the classic
    (1 − 1/e)-approximate coreset picker for data selection: repeatedly
    take the document that covers the most vocabulary not yet covered
    by the picks so far.  This is the "small, maximally diverse sample"
    every pipeline needs (tokenizer warm-up sets, eval seeds, human
    review batches), and the submodular-selection shape (facility
    location / coverage) behind modern data-pruning papers.

    Distributed as THRESHOLD-BATCHED greedy over a per-doc set frame:
    the DISTINCT bigram-set frame (doc_id, toks array, tot) is built
    ONCE and persisted — one row per document, so every pass touches a
    frame that is |docs| rows, not |doc x bigram| pairs.  One
    distributed TakeOrdered(COVERAGE_BATCH) by (gain desc, doc_id asc)
    — gain evaluated JVM-side as ``tot − size(array_intersect(toks,
    covered))`` with the covered set shipped as one constant-folded
    literal — pulls the top M candidates WITH their bigram sets to the
    driver (Arrow, bounded at M × max-doc-set regardless of corpus
    size).  The driver then runs exact greedy over the batch, holding
    a SUBMODULARITY CERTIFICATE: every uncollected doc's current gain
    is ≤ its collect-time gain ≤ the batch's M-th gain (the
    threshold), so any in-batch pick whose recomputed gain STRICTLY
    beats the threshold is globally exact — including the doc_id-asc
    tie-break, since an uncollected tie would need gain > threshold.
    When the certificate runs out (or gains fall to the threshold), a
    fresh TakeOrdered re-collects with exact gains — whose first row
    is always an exact pick, so the loop is bounded by K jobs and in
    practice finishes in ONE (threshold ≈ the M-th doc's marginal
    coverage, far below the K-th pick's gain on any corpus with a
    coverage-rich head).

    CELF lazy greedy was tried and rejected: on a redundant corpus the
    tot-based upper bounds stay far above true gains after pick 1, so
    the lazy frontier degenerates into evaluating (and collecting!)
    nearly every document every round — 90x slower at sf0.1.  The
    round-5 shape (one TakeOrdered(1) + pandas-UDF overlap scan per
    round) was exact but paid K full Arrow scans; this pays one.

    No SQL oracle: the greedy recurrence is data-dependent and
    iterative (same class as bpe_train_merges / kcore); correctness is
    pinned against a pure-Python mirror plus the coverage-monotonicity
    invariant in tests/test_hygiene.py — the driver records the
    rows-only check.

    Output: (rank, doc_id, new_tokens, cum_covered, coverage_frac)."""
    doc_toks = _doc_bigram_frame(spark, sf_dir)
    vocab_total = (
        doc_toks.select(F.explode("toks").alias("tok")).distinct().count()
    )
    covered: set = set()  # bounded by K x max doc distinct bigrams
    picked = []
    cum = 0
    done = False
    while len(picked) < COVERAGE_K and not done:
        if not covered:
            gain = F.col("tot")
        else:
            # JVM-only overlap for the re-collect path: both sides are
            # distinct, so size(intersect) == |S_doc ∩ covered|.
            gain = F.col("tot") - F.size(
                F.array_intersect(F.col("toks"), F.lit(sorted(covered)))
            )
        batch = (
            doc_toks.select("doc_id", "toks", gain.alias("gain"))
            .orderBy(F.desc("gain"), F.asc("doc_id"))
            .limit(COVERAGE_BATCH)
            .toPandas()
        )
        if batch.empty:
            break
        # full => every doc is in memory; otherwise the M-th collect-time
        # gain upper-bounds every uncollected doc's CURRENT gain
        # (submodularity: gains only shrink as covered grows)
        full = len(batch) < COVERAGE_BATCH
        threshold = int(batch["gain"].iloc[-1])
        cands = [
            (int(r.doc_id), set(r.toks))
            for r in batch.itertuples(index=False)
        ]
        fresh = True  # row 0 of a fresh batch is always an exact pick
        while len(picked) < COVERAGE_K:
            best_id, best_gain, best_set = None, -1, None
            for doc_id, s in cands:
                g = len(s - covered) if covered else len(s)
                if g > best_gain or (g == best_gain and doc_id < best_id):
                    best_id, best_gain, best_set = doc_id, g, s
            if best_id is None:
                # Candidate list exhausted with fewer than K picks: every
                # doc in the batch was already picked (possible only when
                # the whole corpus fits in one batch, since
                # COVERAGE_BATCH > COVERAGE_K).  `full` therefore holds
                # and stopping is globally exact — there is no document
                # left to pick anywhere.
                done = True
                break
            if best_gain == 0 and (full or fresh):
                done = True  # exact global max gain is zero
                break
            if not fresh and not full and best_gain <= threshold:
                break  # certificate exhausted — re-collect exact gains
            if best_gain == 0:
                break  # stale threshold — re-collect
            cum += best_gain
            picked.append(
                (
                    len(picked) + 1,
                    best_id,
                    best_gain,
                    cum,
                    cum / vocab_total,
                )
            )
            covered.update(best_set)
            cands = [c for c in cands if c[0] != best_id]
            fresh = False
    return spark.createDataFrame(
        picked,
        "rank int, doc_id long, new_tokens long, cum_covered long, "
        "coverage_frac double",
    )


_GREEDY_AUDIT_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tk
      FROM documents WHERE text IS NOT NULL
    ), bg AS (
      SELECT DISTINCT doc_id, tk[i] || chr(1) || tk[i + 1] AS b
      FROM (SELECT doc_id, tk,
                   unnest(generate_series(1, len(tk) - 1)) AS i
            FROM toks)
    ), cnts AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS tot FROM bg GROUP BY doc_id
    ), first AS (
      SELECT doc_id, tot FROM cnts ORDER BY tot DESC, doc_id LIMIT 1
    )
    SELECT CAST({COVERAGE_K} AS INT) AS k,
           CAST((SELECT COUNT(DISTINCT b) FROM bg) AS BIGINT) AS vocab_total,
           CAST((SELECT doc_id FROM first) AS BIGINT) AS first_doc_id,
           CAST((SELECT tot FROM first) AS BIGINT) AS first_gain,
           TRUE AS first_pick_ok,
           TRUE AS gains_monotone_ok,
           TRUE AS cum_consistent_ok,
           TRUE AS union_matches_ok,
           TRUE AS stop_ok
"""


@query("greedy_coverage_audit", oracle=_GREEDY_AUDIT_ORACLE)
def greedy_coverage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E242 companion: driver-visible, hash-checked INVARIANT contract
    for the (rows-only, data-dependent) greedy coverage selection —
    the same contract style as the ANN recall floors.  The greedy
    recurrence itself has no ANSI-SQL unroll, but its defining
    properties do: the FIRST pick is the global argmax |bigram set|
    (doc_id-asc ties) — recomputed independently by both engines — and
    the pick sequence must have strictly positive non-increasing gains
    (submodularity), an exact running-sum cum_covered whose final value
    equals the independently recomputed size of the union of the picked
    documents' bigram sets, and a stop condition of "K picks or full
    coverage".  The DuckDB oracle mirrors the bigram universe
    token-for-token (same chr(1) pair separator) and pins every
    boolean TRUE, so any future break of the greedy loop turns a
    driver-sampled hash red instead of only a pytest red.

    Scale: the audit adds one explode-distinct count over the persisted
    per-doc set frame (shared via scoped_persist with the greedy run)
    plus a ≤K-row membership recount — O(corpus bigrams) with map-side
    combine, no new shuffle shape; the vocab count, first-pick argmax,
    and picked-union recount ride ONE tagged-union collect (one driver
    job instead of three, each mostly scheduler floor — the semdedup
    flag-frame rule)."""
    picks = greedy_coverage_select(spark, sf_dir).collect()  # ≤ K rows
    ids = [int(r.doc_id) for r in picks]
    doc_toks = _doc_bigram_frame(spark, sf_dir)  # scoped_persist-shared
    nul = F.lit(None).cast("long")
    s_vocab = (
        doc_toks.select(F.explode("toks").alias("tok"))
        .distinct()
        .agg(F.count(F.lit(1)).alias("v"))
        .select(F.lit("vocab").alias("tag"), F.col("v").cast("long"),
                nul.alias("v2"))
    )
    s_first = (
        doc_toks.filter(F.col("tot") > 0)
        .orderBy(F.desc("tot"), F.asc("doc_id"))
        .limit(1)
        .select(F.lit("first").alias("tag"),
                F.col("doc_id").cast("long").alias("v"),
                F.col("tot").cast("long").alias("v2"))
    )
    s_union = (
        doc_toks.filter(
            F.col("doc_id").isin(ids) if ids else F.lit(False)
        )
        .select(F.explode("toks").alias("tok"))
        .distinct()
        .agg(F.count(F.lit(1)).alias("v"))
        .select(F.lit("union").alias("tag"), F.col("v").cast("long"),
                nul.alias("v2"))
    )
    rows = s_vocab.unionByName(s_first).unionByName(s_union).collect()
    by_tag = {r["tag"]: r for r in rows}
    vocab_total = int(by_tag["vocab"]["v"])
    first = by_tag.get("first")  # absent when no doc has a bigram
    first_doc = int(first["v"]) if first is not None else None
    first_tot = int(first["v2"]) if first is not None else None
    gains = [int(r.new_tokens) for r in picks]
    cums = [int(r.cum_covered) for r in picks]
    gains_ok = bool(
        all(g > 0 for g in gains) and gains == sorted(gains, reverse=True)
    )
    run = 0
    cum_ok = True
    for r, g, c in zip(picks, gains, cums):
        run += g
        if c != run or float(r.coverage_frac) != (
            c / vocab_total if vocab_total else 0.0
        ):
            cum_ok = False
    first_ok = bool(
        not picks
        or (int(picks[0].doc_id) == first_doc and gains[0] == first_tot)
    )
    union_sz = int(by_tag["union"]["v"])
    last_cum = cums[-1] if cums else 0
    union_ok = bool(last_cum == union_sz)
    stop_ok = bool(len(picks) == COVERAGE_K or last_cum == vocab_total)
    return spark.createDataFrame(
        [
            (
                int(COVERAGE_K),
                int(vocab_total),
                first_doc,
                first_tot,
                first_ok,
                gains_ok,
                cum_ok,
                union_ok,
                stop_ok,
            )
        ],
        "k int, vocab_total long, first_doc_id long, first_gain long, "
        "first_pick_ok boolean, gains_monotone_ok boolean, "
        "cum_consistent_ok boolean, union_matches_ok boolean, "
        "stop_ok boolean",
    )




# --------------------------------------------------------------------------
# E244: dedup savings report (what would exact dedup buy?)
# --------------------------------------------------------------------------


@query(
    "dedup_savings_report",
    oracle="""
        WITH sized AS (
          SELECT text,
                 CAST(LENGTH(string_split(text, ' ')) AS BIGINT) AS n_tok
          FROM documents
        ), per_text AS (
          SELECT text, MAX(n_tok) AS n_tok,
                 CAST(COUNT(*) AS BIGINT) AS n_copies
          FROM sized GROUP BY text
        )
        SELECT CAST(SUM(n_copies) AS BIGINT) AS n_docs,
               CAST(COUNT(*) AS BIGINT) AS n_docs_unique,
               CAST(SUM(n_copies * n_tok) AS BIGINT) AS n_tokens,
               CAST(SUM(n_tok) AS BIGINT) AS n_tokens_unique,
               CAST(SUM((n_copies - 1) * n_tok) AS DOUBLE)
                 / SUM(n_copies * n_tok) AS token_savings_frac
        FROM per_text
    """,
)
def dedup_savings_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E244: the dedup BUSINESS CASE in one row — before running the E1/E2
    pipelines, how many documents and (more importantly) TOKENS would
    exact text dedup remove?  Token savings is the number that prices
    the job: training cost scales with tokens, and a corpus where 30%
    of tokens sit in duplicate copies pays for a lot of dedup compute.
    (Near-dup savings come on top — this reports the exact-dup floor
    the LSH pipeline then extends.)

    Exactness: token counts and copy counts are exact integers; the
    savings fraction is one double division.

    Scale: ONE keyed aggregate on the text (at 100 TB: on sha256(text)
    like media_dedup_by_hash, so the shuffle carries digests, never
    documents), then a 1-row reduce."""
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "text",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok"),
    )
    per_text = sized.groupBy("text").agg(
        F.max("n_tok").alias("n_tok"),
        F.count(F.lit(1)).cast("long").alias("n_copies"),
    )
    return per_text.agg(
        F.sum("n_copies").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_docs_unique"),
        F.sum(F.col("n_copies") * F.col("n_tok"))
        .cast("long")
        .alias("n_tokens"),
        F.sum("n_tok").cast("long").alias("n_tokens_unique"),
        (
            F.sum((F.col("n_copies") - 1) * F.col("n_tok")).cast("double")
            / F.sum(F.col("n_copies") * F.col("n_tok"))
        ).alias("token_savings_frac"),
    )
