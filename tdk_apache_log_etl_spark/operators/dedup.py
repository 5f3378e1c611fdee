"""E1/E2: deduplication — exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the whole point of these operators):

  * Exact dedup is a hash group-by — one shuffle on the dedup key, with
    min(doc_id) as the deterministic survivor rule (dropDuplicates keeps an
    arbitrary row; that nondeterminism is unacceptable in a reproducible
    training-data pipeline).
  * Near-dup never does the O(n²) cross join. MinHash signatures are computed
    with NATIVE higher-order functions (xxhash64 base hash + k affine
    permutations + array_min), LSH banding turns similarity search into an
    equi-join on (band_id, band_hash) — shuffle-friendly, linear in
    candidates. Candidate pairs are then verified with exact shingle-set
    Jaccard (array_intersect / array_union).
  * SimHash is the one Pandas-UDF operator here (64-bit accumulation is
    numpy's sweet spot); it is Arrow-batched and deterministic (sha256
    token hashes — DuckDB-recomputable — not Python's seeded hash()).

The banded-MinHash index is rows-only for the driver (no practical
ANSI-SQL oracle for probabilistic LSH) and graded by its recall-floor
companion; simhash_neardup and ngram_jaccard_pairs carry FULL value-hashed
oracles (exact banding / exact inverted-index enumeration — round 10).
tests/test_dedup.py pins golden outcomes and verifies LSH candidates ⊇
true near-dups on planted duplicates.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..session import default_parallelism
from ..sources.tables import load_table
from .registry import QUERIES, query, scoped_persist

# -- MinHash parameters ----------------------------------------------------
MINHASH_PERMS = 32
# 16 bands × 2 rows: candidate probability 1-(1-s²)^16 — ≈0.96 at s=0.5,
# ≈0.9995 at s=0.7. 2-row bands admit more false candidates than 4-row
# bands, but every candidate is verified with exact Jaccard anyway; at the
# 0.5 threshold recall is what matters.
MINHASH_BANDS = 16
MINHASH_ROWS = MINHASH_PERMS // MINHASH_BANDS
SHINGLE_N = 3


def shingles_of_tokens(toks: Column, n: int = SHINGLE_N) -> Column:
    """Word n-gram shingles over a MATERIALIZED token-array column.

    ``toks`` must be a plain column reference (not an inline ``split``):
    Catalyst does no common-subexpression elimination inside lambda
    functions, so an inlined split re-executes once per shingle — measured
    ~4× slower on the shingling pass at sf0.1. Documents shorter than n
    tokens yield the whole document as a single shingle: the reads past the
    array end use try_element_at (NULL, never an ANSI INVALID_ARRAY_INDEX
    error) and concat_ws skips NULLs, so the single sequence element
    concatenates exactly the tokens that exist.
    """
    k = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(
                " ", *[F.try_element_at(toks, i + j) for j in range(n)]
            ),
        )
    )


def shingles(col, n: int = SHINGLE_N):
    """Shingles from a raw text column (two-projection form via
    shingle_frame is the fast path; this exists for ad-hoc use)."""
    return shingles_of_tokens(F.split(col, " "), n)


def shingle_frame(docs: DataFrame, n_partitions: int | None = None) -> DataFrame:
    """(doc_id, sh: array<string>) — repartitioned (the fixture is one
    parquet file → one input split; real corpora arrive pre-split) and
    persisted, because both the LSH band join and the Jaccard verification
    reuse it and Spark would otherwise recompute the shingling for every
    consumer (no CSE across self-join branches). Tokenization runs in its
    own projection so the split is evaluated once per document, not once
    per shingle (see shingles_of_tokens). The partition count follows
    spark.sql.shuffle.partitions (no magic constants — the session config
    is the one knob an operator sizes shuffles by)."""
    if n_partitions is None:
        n_partitions = int(
            docs.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    toks = docs.select("doc_id", F.split(F.col("text"), " ").alias("_toks"))
    return scoped_persist(
        toks.select("doc_id", shingles_of_tokens(F.col("_toks")).alias("sh"))
        .repartition(n_partitions, "doc_id")
    )


def minhash_signatures(sh_df: DataFrame) -> DataFrame:
    """(doc_id, m0..m{k-1}) MinHash signature columns.

    sig_i = min over shingles of xxhash64(i, shingle) — seeding each
    permutation by prepending the permutation index gives k genuinely
    independent hash functions. (Affine re-hashes (a_i*h + b_i) mod p of ONE
    shared base hash with structured coefficients are NOT min-wise
    independent: the document's smallest base hash tends to win the min for
    every i at once, and measured pair agreement collapsed to ~0.1 on
    documents with true Jaccard 0.625.)

    Shape: explode shingles → ONE string hash per shingle → k cheap
    long-mix hashes → k min-aggregates in ONE hash aggregation. The string
    is hashed exactly once (xxhash64(i, xxhash64(s)) rather than
    xxhash64(i, s)); re-hashing the 8-byte base through k seeds keeps the
    permutations independent at ~2.6× less cost than k string hashes.
    Deliberately NOT nested higher-order functions (array_min over k
    transform()s): Catalyst inlines the shingle array into every lambda and
    codegen chokes on the tree (measured 540 s at sf0.1). This form is
    fully whole-stage-codegen'd, one shuffle on doc_id, linear at any scale.
    """
    base = sh_df.select("doc_id", F.explode("sh").alias("s")).select(
        "doc_id", F.xxhash64("s").alias("h")
    )
    return base.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64(F.lit(i), F.col("h"))).alias(f"m{i}")
            for i in range(MINHASH_PERMS)
        ]
    )


@query("dedup_exact_docs", oracle="""
    SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
    FROM documents GROUP BY text
""")
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 exact dedup with a deterministic survivor (min doc_id per text).
    One hash-shuffle on the text column; at 100 TB you'd group on
    xxhash64(text) first to shrink shuffle width, then break the (rare)
    hash collisions with a secondary exact comparison."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies")
    ).select("doc_id", "n_copies")


@query("dedup_unique_counts", oracle="""
    SELECT COUNT(DISTINCT text) AS unique_texts, COUNT(*) AS total_docs
    FROM documents
""")
def dedup_unique_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 dedup cardinality report (dup rate = 1 - unique/total)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.agg(
        F.countDistinct("text").alias("unique_texts"),
        F.count(F.lit(1)).alias("total_docs"),
    )


#: span-dedup chunk width (tokens). Newline-free synthetic corpus → the
#: "paragraph" boundary is a fixed token grid; on real web text the same
#: operator runs over split(text, '\n') lines (RefinedWeb/CCNet line
#: dedup) with zero structural change.
SPAN_W = 10


@query(
    "span_dedup_rebuild",
    oracle=f"""
        WITH docs AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ),
        ch AS (
          SELECT doc_id, i AS chunk_idx,
                 array_to_string(ws[i*{SPAN_W}+1 : i*{SPAN_W}+{SPAN_W}], ' ')
                   AS chunk
          FROM docs, LATERAL (
            SELECT unnest(generate_series(
              0, CAST(ceil(len(ws) / {SPAN_W}.0) AS BIGINT) - 1)) AS i
          ) t
        ),
        k AS (
          SELECT doc_id, chunk_idx, chunk,
                 ROW_NUMBER() OVER (PARTITION BY chunk
                                    ORDER BY doc_id, chunk_idx) = 1 AS keep
          FROM ch
        )
        SELECT doc_id,
               COUNT(*) AS n_chunks,
               CAST(COUNT(*) FILTER (WHERE keep) AS BIGINT) AS n_kept,
               COALESCE(string_agg(chunk, ' ' ORDER BY chunk_idx)
                          FILTER (WHERE keep), '') AS new_text
        FROM k GROUP BY doc_id
    """,
)
def span_dedup_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level (sub-document) exact dedup with corpus rebuild — the
    CCNet/RefinedWeb "line dedup" stage: boilerplate repeated ACROSS
    documents (headers, navboxes, license blurbs) survives document-level
    dedup, so documents are split into spans, each span is kept only at
    its globally-first occurrence (min (doc_id, position) — deterministic
    under any partitioning), and the surviving spans are stitched back
    into a cleaned corpus in original order.

    Shape: array-chunk projection (no UDF) → posexplode → ONE shuffle on
    the span for the first-occurrence window → one shuffle back on doc_id
    to rebuild (collect_list + sort_array keeps span order without an
    extra sort pass). At 100 TB the window would key on xxhash64(span) —
    shuffling 8-byte keys instead of span text — with the 2⁻⁶⁴ collision
    risk priced in (or a string tie-break verify, as minhash does); the
    oracle-parity form keys on the text itself.
    """
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    n_chunks = F.ceil(F.size(ws) / F.lit(float(SPAN_W))).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(ws, i * SPAN_W + 1, SPAN_W), " "),
    )
    ch = docs.select(
        "doc_id", F.posexplode(chunks).alias("chunk_idx", "chunk")
    )
    first = Window.partitionBy("chunk").orderBy("doc_id", "chunk_idx")
    k = ch.withColumn("keep", F.row_number().over(first) == 1)
    kept_span = F.when(
        F.col("keep"), F.struct(F.col("chunk_idx"), F.col("chunk"))
    )
    return k.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_span)),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("new_text"),
    )


def minhash_candidate_pairs(sh_df: DataFrame) -> DataFrame:
    """LSH banding → candidate (a, b) doc pairs (a < b), deduped.

    Band hash = xxhash64 over the band's signature columns; candidates come
    from an equi-join on (band_id, band_hash) — the shuffle key is the band
    bucket, so complexity is Σ bucket², not n². The banded frame is
    persisted so the self-join's two branches don't recompute signatures.
    """
    sig = minhash_signatures(sh_df)
    band_hashes = F.array(
        *[
            F.xxhash64(
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"m{b * MINHASH_ROWS + j}").cast("string")
                        for j in range(MINHASH_ROWS)
                    ],
                )
            )
            for b in range(MINHASH_BANDS)
        ]
    )
    banded = scoped_persist(
        sig.select(
            "doc_id", F.posexplode(band_hashes).alias("band_id", "band_hash")
        )
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def exact_jaccard(pairs: DataFrame, sh_df: DataFrame) -> DataFrame:
    """Join shingle sets back onto candidate pairs and compute exact word
    n-gram Jaccard (array_intersect / array_union — native)."""
    out = (
        pairs.join(
            sh_df.withColumnsRenamed({"doc_id": "doc_a", "sh": "sh_a"}), "doc_a"
        )
        .join(sh_df.withColumnsRenamed({"doc_id": "doc_b", "sh": "sh_b"}), "doc_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .select("doc_a", "doc_b", "jaccard")
    )
    return out


@query("minhash_lsh_neardup")  # rows-only: LSH has no ANSI-SQL oracle
def minhash_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 near-duplicate detection: shingle → MinHash → LSH band join →
    exact-Jaccard verification at threshold 0.5. Deterministic (fixed
    permutation coefficients, xxhash64 seed 42 default)."""
    docs = load_table(spark, sf_dir, "documents")
    sh_df = shingle_frame(docs)
    verified = exact_jaccard(minhash_candidate_pairs(sh_df), sh_df)
    return verified.filter(F.col("jaccard") >= 0.5).select(
        "doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard")
    )


#: Looser 'review band' threshold between hard dups and distinct docs.
NGRAM_REVIEW_THRESHOLD = 0.3

_NGRAM_JACCARD_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tk FROM documents
    ), pos AS (
      SELECT doc_id, tk,
             unnest(generate_series(1, greatest(len(tk) - {SHINGLE_N - 1},
                                                1))) AS i
      FROM toks
    ), sh AS (
      SELECT DISTINCT doc_id,
             concat_ws(' ', {", ".join(f"tk[i + {j}]" for j in range(SHINGLE_N))}) AS s
      FROM pos
    ), sizes AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS da, b.doc_id AS db, CAST(COUNT(*) AS BIGINT) AS c
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT da AS doc_a, db AS doc_b,
           CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) AS jaccard
    FROM inter
    JOIN sizes sa ON inter.da = sa.doc_id
    JOIN sizes sb ON inter.db = sb.doc_id
    WHERE CAST(c AS DOUBLE) / (sa.sz + sb.sz - c)
          >= {NGRAM_REVIEW_THRESHOLD}
"""


@query("ngram_jaccard_pairs", oracle=_NGRAM_JACCARD_ORACLE)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 n-gram Jaccard near-dup scoring at the looser review threshold
    (0.3) — COMPLETE, not LSH-sampled: exact_jaccard_pairs enumerates
    every pair with word-trigram Jaccard >= 0.3 via the adaptive
    inverted-index strategy (direct df-priced self-join, or prefix
    filtering when a hot shingle would make a quadratic bucket), recall
    1.0 by construction. That exactness is what upgrades this row from
    rows-only to a full value-hashed DuckDB oracle (round-10): the
    oracle mirrors the shingling token-for-token and recomputes every
    qualifying pair plus its jaccard — both engines divide the same
    exact |A∩B| / |A∪B| BIGINTs, so the DOUBLE is bit-identical.
    The banded-LSH candidate path (the index you'd use when even the
    df-bounded join is too wide) remains minhash_lsh_neardup, graded by
    its own recall-floor companion."""
    docs = load_table(spark, sf_dir, "documents")
    sh_df = shingle_frame(docs)
    return exact_jaccard_pairs(sh_df, NGRAM_REVIEW_THRESHOLD).select(
        "doc_a", "doc_b", "jaccard"
    )


#: E2 companion recall floor — measured recall is 1.0 at both sf0.01
#: (25/25 true pairs found) and sf0.1 (256/256); 0.9 leaves headroom for
#: a future banding retune without ever accepting a broken index.
MINHASH_RECALL_FLOOR = 0.9

_MINHASH_RECALL_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tk FROM documents
    ), pos AS (
      SELECT doc_id, tk,
             unnest(generate_series(1, greatest(len(tk) - {SHINGLE_N - 1},
                                                1))) AS i
      FROM toks
    ), sh AS (
      SELECT DISTINCT doc_id,
             concat_ws(' ', {", ".join(f"tk[i + {j}]" for j in range(SHINGLE_N))}) AS s
      FROM pos
    ), sizes AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS da, b.doc_id AS db, CAST(COUNT(*) AS BIGINT) AS c
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ), true_pairs AS (
      SELECT da, db
      FROM inter
      JOIN sizes sa ON inter.da = sa.doc_id
      JOIN sizes sb ON inter.db = sb.doc_id
      WHERE CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) >= 0.5
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_true_pairs,
           CAST({MINHASH_RECALL_FLOOR} AS DOUBLE) AS floor,
           TRUE AS recall_floor_ok
    FROM true_pairs
"""


@query("minhash_lsh_recall_floor", oracle=_MINHASH_RECALL_ORACLE)
def minhash_lsh_recall_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 companion: hash-checkable recall contract for the MinHash-LSH
    near-dup path.  Ground truth is EXACT: every pair with shingle
    Jaccard >= 0.5 (any such pair shares at least one shingle, so the
    shared-shingle equi-join below enumerates the truth set completely
    — no LSH involved).  The oracle recomputes the truth-set SIZE
    independently in DuckDB (shingling mirrored token-for-token), and
    the boolean asserts the banding finds >= MINHASH_RECALL_FLOOR of it;
    the banded path itself stays sampled rows-only, but its quality
    claim is now value-hashed.

    Scale note: the shared-shingle all-pairs join is the brute-force
    EVAL harness, not the dedup path — at 100 TB you run it on a
    deterministic doc-hash sample (the bpe_sample_filter shape) to
    grade the index, never on the full corpus; the production dedup
    remains the banded Σ bucket² join."""
    docs = load_table(spark, sf_dir, "documents")
    sh_df = shingle_frame(docs)
    ex = sh_df.select("doc_id", F.explode("sh").alias("s"))
    cand = (
        ex.alias("a")
        .join(
            ex.alias("b"),
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    truth = exact_jaccard(cand, sh_df).filter(F.col("jaccard") >= 0.5)
    found = QUERIES["minhash_lsh_neardup"](spark, sf_dir).select(
        "doc_a", "doc_b", F.lit(1).alias("hit")
    )
    return (
        truth.select("doc_a", "doc_b")
        .join(found, ["doc_a", "doc_b"], "left")
        .agg(
            F.count(F.lit(1)).alias("n_true_pairs"),
            # coalesce OUTSIDE the sum too: over an empty truth set SUM
            # yields NULL and the floor boolean would go NULL instead of
            # the vacuous TRUE (0 >= floor*0) the oracle pins
            F.coalesce(
                F.sum(F.coalesce(F.col("hit"), F.lit(0))), F.lit(0)
            ).alias("n_found"),
        )
        .select(
            "n_true_pairs",
            F.lit(float(MINHASH_RECALL_FLOOR)).alias("floor"),
            (
                F.col("n_found").cast("double")
                >= F.lit(float(MINHASH_RECALL_FLOOR))
                * F.col("n_true_pairs").cast("double")
            ).alias("recall_floor_ok"),
        )
    )


# -- SimHash ---------------------------------------------------------------

SIMHASH_BITS = 64
SIMHASH_CHUNKS = 4  # 16-bit chunks; hamming ≤ 3 ⇒ ≥1 identical chunk
#: Token budget per (tokens, 64) bit-matrix expansion inside the simhash
#: UDF — bounds worker memory to ~64 MB per Arrow batch regardless of
#: how much text the batch carries. Module-level so tests can shrink it
#: and pin that chunk boundaries don't change fingerprints (captured at
#: UDF-build time; simhash_column builds a fresh UDF per call).
SIMHASH_UDF_CHUNK_TOKENS = 1 << 17


def simhash_column(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Add a deterministic 64-bit SimHash column via an Arrow-batched
    Pandas UDF (numpy bit accumulation).

    Token hash = first 8 bytes (big-endian) of sha256 — chosen over
    blake2b in round 10 BECAUSE DuckDB ships sha256(): the whole
    fingerprint (majority vote over per-token bit votes) becomes
    recomputable in ANSI-ish SQL, which is what gives simhash_neardup a
    full value-hashed oracle instead of a rows-only verdict. Equally
    deterministic and uniform; null/empty text fingerprints to 0."""
    from pyspark.sql.functions import pandas_udf

    chunk_tokens = SIMHASH_UDF_CHUNK_TOKENS

    @pandas_udf("long")
    def simhash(texts: pd.Series) -> pd.Series:
        import hashlib

        import numpy as np

        # Batch-vectorized: hash each DISTINCT token once per Arrow
        # batch (sha256 is the cheap part; the old per-token numpy
        # round-trip was ~10 µs/token and dominated the 9 s sf0.1
        # wall), expand every doc's token hashes into one flat uint64
        # vector, unpack to a (n_tokens, 64) sign matrix in bulk, and
        # segment-sum per doc with np.add.reduceat. Bit-identical to
        # the per-token fold (integer vote counts are order-free).
        tok_lists = [t.split(" ") if t else [] for t in texts]
        lengths = np.fromiter(
            (len(tl) for tl in tok_lists), dtype=np.int64, count=len(tok_lists)
        )
        cache: dict[str, int] = {}
        flat = np.empty(int(lengths.sum()), dtype=np.uint64)
        i = 0
        for tl in tok_lists:
            for tok in tl:
                h = cache.get(tok)
                if h is None:
                    h = int.from_bytes(
                        hashlib.sha256(tok.encode()).digest()[:8], "big"
                    )
                    cache[tok] = h
                flat[i] = h
                i += 1
        out = np.zeros(len(texts), dtype=np.int64)
        if i:
            shifts = np.arange(SIMHASH_BITS, dtype=np.uint64)
            weights = np.uint64(1) << shifts
            starts = np.zeros(len(tok_lists), dtype=np.int64)
            np.cumsum(lengths[:-1], out=starts[1:])
            # reduceat over only the nonempty docs' start offsets: empty
            # docs own zero-length segments, so consecutive filtered
            # starts are exactly the nonempty segment boundaries. The
            # ±1 vote sum needs no ±1 matrix: Σ(2b−1) = 2·Σb − len.
            # Chunk by docs so the (tokens, 64) bit matrix stays ≤~64 MB
            # however large the Arrow batch's total text is (a one-shot
            # expansion scales with batch TOKENS — unbounded at corpus
            # scale even though rows-per-batch is capped).
            nonempty = np.flatnonzero(lengths > 0)
            lo = 0
            while lo < len(nonempty):
                hi = lo + 1
                tok0 = starts[nonempty[lo]]
                while (
                    hi < len(nonempty)
                    and starts[nonempty[hi]] + lengths[nonempty[hi]] - tok0
                    <= chunk_tokens
                ):
                    hi += 1
                docs_idx = nonempty[lo:hi]
                tok1 = starts[docs_idx[-1]] + lengths[docs_idx[-1]]
                bits = (
                    (flat[tok0:tok1, None] >> shifts) & np.uint64(1)
                ).astype(np.int64)
                seg_sums = np.add.reduceat(
                    bits, starts[docs_idx] - tok0, axis=0
                )
                acc = 2 * seg_sums - lengths[docs_idx, None]
                v = ((acc > 0).astype(np.uint64) * weights).sum(
                    axis=1, dtype=np.uint64
                )
                out[docs_idx] = v.astype(np.int64)  # two's-complement wrap
                lo = hi
        return pd.Series(out)

    return docs.withColumn("simhash", simhash(F.col(text_col)))


#: Hamming radius for simhash near-dups; SIMHASH_CHUNKS=4 chunk banding
#: is EXACT for it by pigeonhole (<= 3 differing bits cannot touch all 4
#: 16-bit chunks), so the banded output equals the brute-force truth set.
SIMHASH_MAX_HAMMING = 3

#: DuckDB mirror of the fingerprint + brute-force hamming pairs. The
#: per-token hash is the same first-8-bytes-of-sha256 (hex prefix ->
#: UBIGINT), the per-bit majority vote is a 64-way generate_series sum,
#: and the >= 2^63 branch reproduces the signed-long wrap. Quadratic
#: all-pairs is fine at oracle scale (the driver runs sf0.01: 500 docs);
#: the ENGINE's banded plan is the one that scales.
_SIMHASH_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents WHERE text IS NOT NULL AND text <> ''
    ), th AS (
      SELECT doc_id,
             CAST(('0x' || substr(sha256(tok), 1, 16)) AS UBIGINT) AS h
      FROM toks
    ), votes AS (
      SELECT doc_id, i,
             SUM(CASE WHEN ((h >> i) & 1) = 1 THEN 1 ELSE -1 END) AS acc
      FROM th, range(0, {SIMHASH_BITS}) t(i)
      GROUP BY doc_id, i
    ), fp0 AS (
      SELECT doc_id,
             SUM(CASE WHEN acc > 0
                      THEN CAST(1 AS HUGEINT) * (CAST(1 AS UBIGINT) << i)
                      ELSE 0 END) AS v
      FROM votes GROUP BY doc_id
    ), fp AS (
      SELECT d.doc_id,
             CAST(CASE WHEN COALESCE(f.v, 0) >= 9223372036854775808
                       THEN COALESCE(f.v, 0) - 18446744073709551616
                       ELSE COALESCE(f.v, 0) END AS BIGINT) AS simhash
      FROM documents d LEFT JOIN fp0 f ON d.doc_id = f.doc_id
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
"""


@query("simhash_neardup", oracle=_SIMHASH_ORACLE)
def simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 SimHash near-dup: 64-bit fingerprints, candidate generation by
    16-bit chunk equality (pigeonhole: hamming ≤ 3 ⇒ some chunk equal),
    verification with native bit_count(xor) ≤ 3. Only the fingerprint step
    touches Python (vectorized); banding/joining/verification are JVM-side.

    Full value-hashed oracle (round-10): the chunk banding is EXACT for
    radius 3 — a brute-force all-pairs hamming scan returns the identical
    pair set (asserted in tests/test_dedup.py) — and sha256 token hashes
    let DuckDB recompute the fingerprints bit-for-bit, so the oracle
    enumerates the same (doc_a, doc_b, hamming) rows by brute force.
    """
    # A one-file corpus scans as ONE partition, which would run the
    # fingerprint UDF single-core — repartition the text first (skinny
    # shuffle, then the Arrow batches fan out across the executor).
    docs = load_table(spark, sf_dir, "documents").repartition(
        max(8, default_parallelism(spark))
    )
    fp = simhash_column(docs).select("doc_id", "simhash")
    chunks = fp.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), c * 16).bitwiseAND(
                        F.lit(0xFFFF)
                    )
                    for c in range(SIMHASH_CHUNKS)
                ]
            )
        ).alias("chunk_id", "chunk_val"),
    )
    a = chunks.alias("a")
    b = chunks.alias("b")
    cand = a.join(
        b,
        (F.col("a.chunk_id") == F.col("b.chunk_id"))
        & (F.col("a.chunk_val") == F.col("b.chunk_val"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.simhash").alias("sh_a"),
        F.col("b.simhash").alias("sh_b"),
    )
    # Verify BEFORE deduping (the embedding_cosine_neardup rule): a
    # multi-chunk collision surfaces the same pair ≤4×, and hamming is
    # a pure function of the pair, so the distinct moves to the (tiny)
    # surviving near-dup set instead of shuffling the full candidate
    # volume. Same rows: distinct on (doc_a, doc_b, sh_a, sh_b) equals
    # distinct on the pair (fingerprints are per-doc constants).
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("int"),
        )
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .select("doc_a", "doc_b", "hamming")
        .distinct()
    )


# -- Duplicate clustering (connected components) ---------------------------


def prefix_candidates(sh_df: DataFrame, threshold: float) -> DataFrame:
    """Candidate pairs (doc_a < doc_b) via PREFIX FILTERING of the inverted
    shingle index — the exact-recall replacement for the naive full index
    self-join, whose cost is Σ posting-list² and explodes on one ubiquitous
    shingle (a boilerplate header shared by millions of docs makes a single
    quadratic bucket).

    Order every document's shingles by ascending global document frequency
    (rarest first, shingle text as tie-break) and index only the first
    ``|d| - ceil(t·|d|) + 1`` of them. Guarantee: J(A,B) ≥ t implies
    |A∩B| ≥ ceil(t·max(|A|,|B|)) (since J ≥ t also forces
    min ≥ t·max on the sizes), and two sets with overlap ≥ α must share an
    element within their (size - α + 1)-prefixes of ANY common total order
    — so every qualifying pair still collides on some indexed shingle:
    recall 1.0, which is what lets dedup_cluster_canonical keep an exact
    recursive-CTE SQL oracle. Ubiquitous shingles sort LAST and fall out
    of every prefix, so posting lists in the self-join are df-bounded by
    construction. Cost: two extra narrow shuffles (df count, per-doc rank)
    — linear, vs the quadratic bucket they prevent."""
    # n rides along from the array (no count-over-partition window pass).
    inv = sh_df.select(
        "doc_id", F.size("sh").alias("n"), F.explode("sh").alias("w")
    )
    df_counts = inv.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    by_rarity = Window.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("w"))
    ranked = inv.join(df_counts, "w").withColumn(
        "rn", F.row_number().over(by_rarity)
    )
    # The 1e-9 guard keeps ceil from overshooting on float artifacts like
    # 0.3*10 = 3.0000000000000004 (an overshoot SHORTENS the prefix and
    # silently costs recall); exact products are unaffected.
    pref = ranked.filter(
        F.col("rn")
        <= F.col("n")
        - F.ceil(F.lit(threshold) * F.col("n") - F.lit(1e-9))
        + 1
    ).select("doc_id", "n", "w")
    a = pref.alias("a")
    b = pref.alias("b")
    # Size-compatibility rides the join: J ≥ t forces t·|B| ≤ |A| ≤ |B|/t,
    # so size-incompatible collisions drop before the distinct.
    return (
        a.join(
            b,
            (F.col("a.w") == F.col("b.w"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("a.n") >= F.lit(threshold) * F.col("b.n") - F.lit(1e-9))
            & (F.col("b.n") >= F.lit(threshold) * F.col("a.n") - F.lit(1e-9)),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


#: Direct-join budget: the full inverted-index self-join emits
#: Σ df·(df-1)/2 candidate rows; allow it while that stays within this
#: factor of the index size (output linear-ish in input), else switch to
#: prefix filtering. 16 rows out per index row is comfortably inside one
#: shuffle's headroom; a single hot shingle (df ~ 10⁵⁺ on a real corpus)
#: blows past it immediately.
PAIR_BUDGET_FACTOR = 16.0


def _direct_jaccard_pairs(sh_df: DataFrame, threshold: float) -> DataFrame:
    """Full inverted-index self-join: |A∩B| aggregated directly from the
    index (one count per co-occurring pair), Jaccard from set sizes —
    2 shuffles total, no array shipping. Fastest when posting lists are
    uniformly small; quadratic in the hottest list otherwise."""
    inv = sh_df.select("doc_id", F.explode("sh").alias("w"))
    sizes = sh_df.select("doc_id", F.size("sh").alias("n"))
    a = inv.alias("a")
    b = inv.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.w") == F.col("b.w"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # Size lookups stay adaptive (no forced broadcast): one row per doc —
    # at corpus scale AQE must be free to pick a shuffle join.
    sa = sizes.withColumnsRenamed({"doc_id": "doc_a", "n": "na"})
    sb = sizes.withColumnsRenamed({"doc_id": "doc_b", "n": "nb"})
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard", F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def exact_jaccard_pairs(sh_df: DataFrame, threshold: float) -> DataFrame:
    """COMPLETE exact-Jaccard pairs (doc_a < doc_b, jaccard ≥ threshold),
    with ADAPTIVE strategy selection — measure, don't guess:

    One cheap stats pass over the document-frequency table prices the
    direct inverted-index self-join (it emits exactly Σ df·(df-1)/2
    rows). Within budget → run it (2 shuffles, no array shipping — the
    fast plan for uniformly small posting lists, e.g. this corpus).
    Over budget (any ubiquitous shingle) → prefix-filtered candidates +
    exact verification (see prefix_candidates), whose join volume is
    df-bounded by construction. Both strategies are exact (recall 1.0),
    so the choice is invisible to results and to the SQL oracle — it is
    the same runtime-statistics re-planning AQE does for join strategies,
    applied to an operator Catalyst can't see into."""
    stats = (
        sh_df.select(F.explode("sh").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("df"))
        .agg(
            F.sum("df").alias("index_rows"),
            F.sum(F.col("df") * (F.col("df") - 1) / 2.0).alias("emitted"),
        )
        .collect()[0]
    )
    if (
        stats.emitted is not None
        and stats.emitted <= PAIR_BUDGET_FACTOR * (stats.index_rows or 0)
    ):
        return _direct_jaccard_pairs(sh_df, threshold)
    return (
        exact_jaccard(prefix_candidates(sh_df, threshold), sh_df)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def connected_components(
    nodes: DataFrame, pairs: DataFrame, max_iter: int = 15
) -> DataFrame:
    """Distributed min-label propagation: (doc_id, canonical_id) where
    canonical_id = min doc_id of the connected component (singletons map
    to themselves).

    Pregel-style driver loop — each iteration is one shuffle-join + one
    aggregation, all data stays on executors (the driver sees only the
    changed-label COUNT used as the convergence test). Rounds needed =
    component diameter; duplicate clusters are near-cliques, so 2-3 rounds
    in practice with a max_iter backstop. Each round's labels are
    ``localCheckpoint``ed: labels feed BOTH the neighbor join and the
    update, so plain persist leaves a lineage that DOUBLES per round
    (measured: a ~500-Exchange plan after convergence at sf0.01) —
    checkpointing truncates the plan to the materialized data, keeping
    compile time and driver memory flat however many rounds run. At
    cluster scale use ``checkpoint()`` (reliable storage) so a lost
    executor replays one round, not the whole history."""
    # The iteration-partitioning rule (operators/graph.py
    # _iter_parallelism): checkpointed per-round frames materialize via
    # the RDD path where AQE never coalesces, so under a vanilla
    # 200-partition session every round otherwise drags 200 near-empty
    # partitions (at ~20 ms/task of pure scheduling overhead on this
    # class of box, that is ~4 s per round before any real work).
    # Pre-partitioning edges on the join key (d) also means each round's
    # join shuffles only the label frame, to match the cached layout.
    p_iter = max(8, default_parallelism(pairs.sparkSession))
    # LAZY checkpoint: the size-probe count below is the action that
    # materializes it — one driver barrier instead of two (the hits
    # lazy-checkpoint+fused-action rule; the frame has exactly one
    # pre-materialization consumer, so nothing can race to rebuild it).
    edges = (
        pairs.select(F.col("doc_a").alias("s"), F.col("doc_b").alias("d"))
        .union(pairs.select(F.col("doc_b").alias("s"), F.col("doc_a").alias("d")))
        .repartition(p_iter, "d")
        .localCheckpoint(eager=False)
    )
    # Size-aware refinement after the (cheap, post-checkpoint) count:
    # the loop only runs over edge-TOUCHED nodes — on a deduplicated-ish
    # corpus a few hundred rows — so a full core-count wave per round is
    # scheduler floor, not parallelism (the graph.py _iter_parallelism
    # rationale). The checkpointed edge relation coalesces narrowly
    # (no new shuffle, no recompute) when the graph is small; at corpus
    # scale the count keeps p_iter at the core cap and this is a no-op.
    from .graph import _iter_parallelism as _graph_iter_p

    n_edges = edges.count()
    p_small = _graph_iter_p(pairs.sparkSession, n_edges)
    if p_small < p_iter:
        p_iter = p_small
        edges = edges.coalesce(p_iter)
    # Only edge-touched nodes can ever change label — the loop runs on
    # that (much smaller) membership and singletons rejoin at the end
    # with label = doc_id. On a deduplicated-ish corpus the duplicate
    # set is a few percent of the nodes, so every per-round join and
    # checkpoint shrinks by that factor (measured ~2× on the sf0.1
    # cluster query; the win grows with corpus cleanliness).
    labels = (
        edges.select(F.col("s").alias("doc_id"))
        .distinct()
        .select("doc_id", F.col("doc_id").alias("label"))
        .coalesce(p_iter)
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges["d"] == labels["doc_id"])
            .groupBy("s")
            .agg(F.min("label").alias("nbr_label"))
        )
        # the update carries its own changed flag, so convergence is a
        # filter-count over the just-materialized checkpoint blocks — a
        # separate old-vs-new join per round would double the joins
        new_labels = (
            labels.join(nbr_min, labels["doc_id"] == nbr_min["s"], "left")
            .select(
                "doc_id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
                (
                    F.coalesce(F.col("nbr_label"), F.col("label"))
                    < F.col("label")
                ).alias("chg"),
            )
            .coalesce(p_iter)
            # lazy: the convergence count below materializes the round's
            # checkpoint as a side effect — one driver barrier per round
            # instead of two (the hits lazy-checkpoint rule; the count is
            # the frame's only pre-materialization consumer)
            .localCheckpoint(eager=False)
        )
        changed = new_labels.filter(F.col("chg")).count()
        labels = new_labels.drop("chg")
        if changed == 0:
            break
    member_labels = labels.withColumnsRenamed(
        {"doc_id": "m_doc_id", "label": "m_label"}
    )
    return nodes.join(
        member_labels, nodes["doc_id"] == member_labels["m_doc_id"], "left"
    ).select(
        "doc_id",
        F.coalesce(F.col("m_label"), F.col("doc_id")).alias("canonical_id"),
    )


@query(
    "dedup_cluster_canonical",
    oracle="""
        WITH RECURSIVE
        docs AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ),
        tok AS (
          SELECT DISTINCT doc_id,
                 CASE WHEN len(ws) < 3 THEN array_to_string(ws, ' ')
                      ELSE ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] END AS w
          FROM docs, LATERAL (
            SELECT unnest(generate_series(1, greatest(len(ws) - 2, 1))) AS i
          ) t
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY 1),
        common AS (
          SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS c
          FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        pairs AS (
          SELECT da, db FROM common
          JOIN sizes sa ON sa.doc_id = da
          JOIN sizes sb ON sb.doc_id = db
          WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.5
        ),
        edges AS (
          SELECT da AS s, db AS d FROM pairs
          UNION
          SELECT db AS s, da AS d FROM pairs
        ),
        reach(s, d) AS (
          SELECT s, d FROM edges
          UNION
          SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
        )
        SELECT d.doc_id,
               LEAST(d.doc_id, COALESCE(MIN(r.d), d.doc_id)) AS canonical_id
        FROM documents d LEFT JOIN reach r ON r.s = d.doc_id
        GROUP BY d.doc_id
    """,
)
def dedup_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 end-state: near-duplicate CLUSTERS, not just pairs — every doc
    mapped to the min doc_id of its connected component at word-3-gram
    Jaccard ≥ 0.5 ("keep one per cluster" is this plus a filter
    doc_id = canonical_id). Pair generation is the complete inverted-index
    join (recall 1.0 — giving this iterative operator an exact recursive-CTE
    SQL oracle); clustering is distributed min-label propagation. The
    LSH-accelerated variant swaps exact_jaccard_pairs for the
    minhash_candidate_pairs + exact_jaccard stack unchanged (same cluster
    stage)."""
    docs = load_table(spark, sf_dir, "documents")
    sh_df = shingle_frame(docs)
    pairs = exact_jaccard_pairs(sh_df, threshold=0.5)
    return connected_components(docs.select("doc_id"), pairs)


@query(
    "fuzzy_part_name_pairs",
    oracle="""
        WITH names AS (
          SELECT DISTINCT p_brand, p_type, p_name FROM part
        )
        SELECT a.p_brand, a.p_type,
               a.p_name AS name_a, b.p_name AS name_b,
               CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
        FROM names a
        JOIN names b
          ON a.p_brand = b.p_brand AND a.p_type = b.p_type
         AND a.p_name < b.p_name
        WHERE levenshtein(a.p_name, b.p_name) <= 2
    """,
)
def fuzzy_part_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution by blocked fuzzy join: near-identical part names
    (edit distance ≤ 2 — typos, OCR slips) found WITHOUT an all-pairs
    levenshtein cross join. Two standard ER moves make it scale: (1)
    collapse to DISTINCT (block, name) before pairing — the quadratic
    step runs on the name VOCABULARY, not the row count, so a 100 TB
    catalog with millions of rows but bounded distinct names pays
    vocabulary², and (2) block on (p_brand, p_type) so the self-join is
    a hash join on the block key with levenshtein as a cheap residual
    predicate on the few within-block candidates — never a broadcast
    nested loop over everything. `a.p_name < b.p_name` emits each
    unordered pair once, deterministically. Complements the token-set
    family (MinHash/SimHash, same module): edit distance catches
    character-level corruption Jaccard can't see."""
    names = (
        load_table(spark, sf_dir, "part")
        .select("p_brand", "p_type", "p_name")
        .distinct()
    )
    a, b = names.alias("a"), names.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_type") == F.col("b.p_type"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .where(dist <= 2)
        .select(
            F.col("a.p_brand").alias("p_brand"),
            F.col("a.p_type").alias("p_type"),
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            dist.cast("long").alias("edit_dist"),
        )
    )


# --------------------------------------------------------------------------
# E138: asymmetric n-gram containment (quote / subsumption detection)
# --------------------------------------------------------------------------

#: Word-gram width for containment (shorter than decontamination's 8 —
#: quotes are short), document-frequency cap pruning ubiquitous grams
#: (bounds the pair join at Σ df² ≤ CAP·Σ df, i.e. linear), and the
#: minimum informative-gram floor below which containment is noise.
CONT_N = 5
CONT_DF_CAP = 64
CONT_MIN_GRAMS = 3


@query(
    "doc_containment_pairs",
    oracle=f"""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ), grams AS (
          SELECT DISTINCT doc_id,
                 array_to_string(ws[i:i + {CONT_N - 1}], ' ') AS ng
          FROM (
            SELECT doc_id, ws,
                   unnest(generate_series(1, len(ws) - {CONT_N - 1})) AS i
            FROM toks WHERE len(ws) >= {CONT_N}
          )
        ), filtered AS (
          SELECT g.doc_id, g.ng FROM grams g
          JOIN (
            SELECT ng FROM grams GROUP BY ng
            HAVING COUNT(*) <= {CONT_DF_CAP}
          ) ok USING (ng)
        ), nsrc AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams
          FROM filtered GROUP BY doc_id
        ), pairs AS (
          SELECT a.doc_id AS src, b.doc_id AS dst,
                 CAST(COUNT(*) AS BIGINT) AS shared
          FROM filtered a
          JOIN filtered b ON b.ng = a.ng AND b.doc_id <> a.doc_id
          GROUP BY 1, 2
        )
        SELECT p.src AS src_doc_id, p.dst AS dst_doc_id,
               p.shared AS shared_ngrams, n.n_grams AS src_ngrams,
               CAST(p.shared AS DOUBLE) / n.n_grams AS containment
        FROM pairs p JOIN nsrc n ON n.doc_id = p.src
        WHERE 2 * p.shared >= n.n_grams AND n.n_grams >= {CONT_MIN_GRAMS}
    """,
)
def doc_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E138: asymmetric containment C(A→B) = |grams(A) ∩ grams(B)| /
    |grams(A)| over word {CONT_N}-grams — the quote/subsumption detector
    (Broder'97 distinguishes *containment* from *resemblance*): a short
    doc pasted inside a long one scores C ≈ 1 while its symmetric
    Jaccard (the E2 family) is near 0, so this is the near-dup angle
    minhash structurally misses. Emits ordered pairs with C ≥ ½.

    Exactness: the threshold is the INTEGER comparison 2·shared ≥
    n_grams (no float compare at the cut); containment itself is one
    int/int division. Spark joins on xxhash64 gram fingerprints (8-byte
    shuffle keys) while the oracle joins full strings — the
    decontamination-style differential gate that also proves no
    collision in the fixture corpus.

    Scale: grams are per-doc DISTINCT before anything wide; the df cap
    bounds the equi-join at Σ df² ≤ {CONT_DF_CAP}·Σ df (linear in
    corpus grams) — the same ubiquitous-shingle guard as the priced
    exact-Jaccard path, here unconditional because a gram in >{CONT_DF_CAP}
    docs carries no subsumption signal; denominators count the SAME
    informative-gram set, mirrored in the oracle."""
    from .chunking import word_ngram_fingerprints

    docs = load_table(spark, sf_dir, "documents")
    # word_ngram_fingerprints: one vectorized prefix-polynomial pass
    # per document instead of a slice+array_join+xxhash64 string build
    # per gram (guide §4.2 — same swap as benchmark_decontaminate;
    # fingerprints are internal join keys computed identically on both
    # sides, results are gram COUNTS, oracle joins full strings).
    ngrams = word_ngram_fingerprints(F.col("text"), CONT_N)
    g = scoped_persist(
        docs.select("doc_id", F.explode(ngrams).alias("ng")).distinct()
    )
    rare = g.groupBy("ng").agg(F.count(F.lit(1)).alias("df")).where(
        F.col("df") <= CONT_DF_CAP
    )
    filtered = scoped_persist(g.join(rare.select("ng"), "ng"))
    nsrc = filtered.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    a = filtered.alias("a")
    b = filtered.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("b.ng") == F.col("a.ng"))
            & (F.col("b.doc_id") != F.col("a.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        pairs.join(nsrc.withColumnRenamed("doc_id", "src"), "src")
        .where(
            (2 * F.col("shared") >= F.col("n_grams"))
            & (F.col("n_grams") >= CONT_MIN_GRAMS)
        )
        .select(
            F.col("src").alias("src_doc_id"),
            F.col("dst").alias("dst_doc_id"),
            F.col("shared").alias("shared_ngrams"),
            F.col("n_grams").alias("src_ngrams"),
            (F.col("shared").cast("double") / F.col("n_grams")).alias(
                "containment"
            ),
        )
    )


# --------------------------------------------------------------------------
# E168: SymSpell deletion-neighborhood fuzzy join (edit distance <= 1)
# --------------------------------------------------------------------------


@query(
    "part_name_deletion_pairs",
    oracle="""
        WITH names AS (
          SELECT p_name, CAST(COUNT(*) AS BIGINT) AS n_parts
          FROM part GROUP BY p_name
        ), keys AS (
          SELECT p_name, p_name AS k FROM names
          UNION ALL
          SELECT p_name,
                 substr(p_name, 1, CAST(i AS INTEGER) - 1)
                 || substr(p_name, CAST(i AS INTEGER) + 1) AS k
          FROM names,
               unnest(generate_series(1, length(p_name))) AS t(i)
        ), cand AS (
          SELECT DISTINCT a.p_name AS name_a, b.p_name AS name_b
          FROM keys a JOIN keys b
            ON a.k = b.k AND a.p_name < b.p_name
        )
        SELECT c.name_a, c.name_b,
               na.n_parts AS n_parts_a, nb.n_parts AS n_parts_b,
               CAST(levenshtein(c.name_a, c.name_b) AS BIGINT)
                 AS edit_distance
        FROM cand c
        JOIN names na ON na.p_name = c.name_a
        JOIN names nb ON nb.p_name = c.name_b
        WHERE levenshtein(c.name_a, c.name_b) <= 1
    """,
)
def part_name_deletion_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E168: SymSpell-style fuzzy join over the DISTINCT name
    vocabulary — every name generates its 1-deletion neighborhood (the
    name itself plus each drop-one-char variant); two names within edit
    distance 1 MUST share a key (one is a deletion of the other, or
    substitutions meet at the common deletion), so the equi-join on
    variants is a COMPLETE candidate generator for d<=1 and the exact
    levenshtein verify never misses. Distance-0 duplicates are E1's
    domain and are deliberately collapsed FIRST: the catalog's name
    vocabulary is tiny relative to rows (64 distinct names across 2000
    parts at sf0.01), and pairing raw rows would square the duplicate
    groups (3.1M identical pairs at sf0.1) — the vocabulary-level join
    is both the correct SymSpell shape (it is a dictionary structure)
    and the 100 TB-safe one. This is the pack's third fuzzy-join
    strategy: exact-distance deletion blocking, vs E14's length/prefix
    blocking (similarity) and E2's LSH (sets).

    Scale: keys per name = len+1 (bounded by the catalog's name-length
    cap); the join runs over the vocabulary, with per-key fan-out equal
    to variant collisions; DISTINCT collapses multi-key hits before the
    exact verify. Counts and distances are exact integers."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    names = scoped_persist(
        part.groupBy("p_name").agg(
            F.count(F.lit(1)).cast("long").alias("n_parts")
        )
    )
    deletions = names.select(
        "p_name",
        F.explode(
            F.expr(
                "transform(sequence(1, length(p_name)), i -> "
                "concat(substr(p_name, 1, i - 1), substr(p_name, i + 1)))"
            )
        ).alias("k"),
    )
    keys = names.select(
        "p_name", F.col("p_name").alias("k")
    ).unionByName(deletions)
    a, b = keys.alias("a"), keys.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
        )
        .distinct()
    )
    na = names.select(
        F.col("p_name").alias("name_a"), F.col("n_parts").alias("n_parts_a")
    )
    nb = names.select(
        F.col("p_name").alias("name_b"), F.col("n_parts").alias("n_parts_b")
    )
    dist = F.levenshtein("name_a", "name_b").cast("long")
    return (
        cand.join(na, "name_a")
        .join(nb, "name_b")
        .where(dist <= 1)
        .select(
            "name_a", "name_b", "n_parts_a", "n_parts_b",
            dist.alias("edit_distance"),
        )
    )


# --------------------------------------------------------------------------
# E199: duplicate-cluster size histogram
# --------------------------------------------------------------------------


@query(
    "dup_cluster_size_histogram",
    oracle="""
        WITH clusters AS (
          SELECT sha256(text) AS h, CAST(COUNT(*) AS BIGINT) AS sz
          FROM documents GROUP BY 1
        )
        SELECT sz AS cluster_size,
               CAST(COUNT(*) AS BIGINT) AS n_clusters,
               CAST(COUNT(*) * sz AS BIGINT) AS n_docs,
               CAST(COUNT(*) * (sz - 1) AS BIGINT) AS n_removable
        FROM clusters GROUP BY sz
    """,
)
def dup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E199: the SHAPE of exact duplication — how many content-hash
    clusters exist at each size, how many docs they hold, and how many
    a keep-one policy would remove. E1 reports the total dup rate; the
    histogram is what decides the POLICY (a fat head of giant clusters
    = boilerplate to hard-drop; a long tail of pairs = mirrors to
    keep-one) and predicts dedup's yield before running it.

    Scale: one hash aggregate (shuffle carries 32-byte digests, never
    text), then a ≤|distinct sizes|-row regroup — the classic
    count-of-counts frame (Good-Turing's input, E139)."""
    docs = load_table(spark, sf_dir, "documents")
    clusters = docs.groupBy(
        F.sha2(F.col("text"), 256).alias("h")
    ).agg(F.count(F.lit(1)).cast("long").alias("sz"))
    return clusters.groupBy(F.col("sz").alias("cluster_size")).agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        (F.count(F.lit(1)) * F.first("sz")).cast("long").alias("n_docs"),
        (F.count(F.lit(1)) * (F.first("sz") - 1))
        .cast("long")
        .alias("n_removable"),
    )


# --------------------------------------------------------------------------
# E200: cross-source duplication matrix
# --------------------------------------------------------------------------


@query(
    "cross_source_duplication",
    oracle="""
        WITH hs AS (
          SELECT DISTINCT sha256(text) AS h, source FROM documents
        ), pairs AS (
          SELECT a.source AS src_a, b.source AS src_b,
                 CAST(COUNT(*) AS BIGINT) AS n_shared_hashes
          FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source
          GROUP BY 1, 2
        ), inv AS (
          SELECT source, CAST(COUNT(DISTINCT sha256(text)) AS BIGINT)
                   AS n_hashes
          FROM documents GROUP BY source
        )
        SELECT p.src_a, p.src_b, p.n_shared_hashes,
               CAST(p.n_shared_hashes AS DOUBLE) / ia.n_hashes
                 AS share_of_a,
               CAST(p.n_shared_hashes AS DOUBLE) / ib.n_hashes
                 AS share_of_b
        FROM pairs p
        JOIN inv ia ON ia.source = p.src_a
        JOIN inv ib ON ib.source = p.src_b
    """,
)
def cross_source_duplication(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E200: which sources copy from which — for every source pair, the
    number of content hashes they SHARE and that overlap as a share of
    each side's distinct inventory. The audit that runs before mixture
    weighting (E197): two sources that are 40% the same corpus must not
    be weighted as independent evidence, and cross-source overlap is
    invisible to E199's global histogram.

    Scale: dedup to (hash, source) — shuffle carries digests; the
    self-join keys on the HASH, so its fan-out per hash is bounded by
    |sources|² (a by-contract-small label set), never by corpus size;
    inventories broadcast back onto the ≤|sources|² pair frame."""
    docs = load_table(spark, sf_dir, "documents")
    hs = scoped_persist(
        docs.select(
            F.sha2(F.col("text"), 256).alias("h"), "source"
        ).distinct()
    )
    a = hs.select("h", F.col("source").alias("src_a"))
    b = hs.select("h", F.col("source").alias("src_b"))
    pairs = (
        a.join(b, "h")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_hashes"))
    )
    inv = hs.groupBy("source").agg(
        F.countDistinct("h").alias("n_hashes")
    )
    ia = inv.select(
        F.col("source").alias("src_a"), F.col("n_hashes").alias("na")
    )
    ib = inv.select(
        F.col("source").alias("src_b"), F.col("n_hashes").alias("nb")
    )
    return (
        pairs.join(F.broadcast(ia), "src_a")
        .join(F.broadcast(ib), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_shared_hashes",
            (F.col("n_shared_hashes").cast("double") / F.col("na")).alias(
                "share_of_a"
            ),
            (F.col("n_shared_hashes").cast("double") / F.col("nb")).alias(
                "share_of_b"
            ),
        )
    )


# --------------------------------------------------------------------------
# E239: sorted-neighborhood entity resolution (SNM blocking)
# --------------------------------------------------------------------------

#: Sorted-neighborhood window: each name is compared to the next W names
#: in lexicographic order. Constant, so candidate pairs are |vocab|·W.
SNM_WINDOW = 5
SNM_MAX_EDIT = 3


@query(
    "snm_part_name_pairs",
    oracle=f"""
        WITH names AS (
          SELECT DISTINCT p_name FROM part
        ), ranked AS (
          SELECT p_name, ROW_NUMBER() OVER (ORDER BY p_name) AS rn
          FROM names
        )
        SELECT a.p_name AS name_a, b.p_name AS name_b,
               CAST(b.rn - a.rn AS BIGINT) AS rank_gap,
               CAST(levenshtein(a.p_name, b.p_name) AS BIGINT)
                 AS edit_dist
        FROM ranked a JOIN ranked b
          ON b.rn > a.rn AND b.rn <= a.rn + {SNM_WINDOW}
        WHERE levenshtein(a.p_name, b.p_name) <= {SNM_MAX_EDIT}
    """,
)
def snm_part_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E239: sorted-neighborhood method (Hernandez & Stolfo 1995) — the
    third blocking strategy in this repo's entity-resolution family:
    E14 blocks on attribute EQUALITY (misses pairs whose block keys
    differ), E2's MinHash-LSH blocks on token-set overlap (misses
    character-level corruption); SNM sorts the name vocabulary and
    compares each name only to its next SNM_WINDOW lexicographic
    neighbors, where near-duplicates cluster.  (Its own documented blind
    spot — a typo in the FIRST character sorts far away — is why
    production ER runs SNM multi-pass over different sort keys; one key
    suffices to exercise the operator.)

    Scale: the quadratic step never exists — distinct names collapse the
    volume to the vocabulary, the global sort order is the repo's
    two-phase distributed ranking (_global_ranks: P parallel local
    sorts + the 32-row offset frame), and the rank-window pairing is a
    CONSTANT W fan-out (each name emits W probe ranks) followed by an
    ordinary hash EQUI-join on the rank — no range join, no nested
    loop.  Levenshtein is a residual on |vocab|·W candidates.

    Exactness: ranks and edit distances are exact integers; ORDER BY
    p_name is a total order (names distinct), so ranks agree across
    engines."""
    from .relational import _global_ranks

    names = (
        load_table(spark, sf_dir, "part").select("p_name").distinct()
    )
    ranked, _ = _global_ranks(names, "p_name")
    ranked = ranked.select(
        F.col("v").alias("p_name"), (F.col("grank") + 1).alias("rn")
    )
    probes = ranked.select(
        F.col("p_name").alias("name_a"),
        F.explode(
            F.array(*[F.lit(d) for d in range(1, SNM_WINDOW + 1)])
        ).alias("rank_gap"),
        (F.col("rn")).alias("rn_a"),
    ).select(
        "name_a",
        "rank_gap",
        (F.col("rn_a") + F.col("rank_gap")).alias("rn_b"),
    )
    pairs = probes.join(
        ranked.select(
            F.col("p_name").alias("name_b"), F.col("rn").alias("rn_b")
        ),
        "rn_b",
    )
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return pairs.filter(dist <= SNM_MAX_EDIT).select(
        "name_a",
        "name_b",
        F.col("rank_gap").cast("long").alias("rank_gap"),
        dist.cast("long").alias("edit_dist"),
    )
