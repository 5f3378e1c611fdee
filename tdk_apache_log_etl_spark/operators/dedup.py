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
    numpy's sweet spot); it is Arrow-batched and deterministic (blake2b
    token hashes, not Python's seeded hash()).

These are rows-only checks for the driver (no practical ANSI-SQL oracle for
LSH), but all are deterministic; tests/test_dedup.py pins golden outcomes
and verifies LSH candidates ⊇ true near-dups on planted duplicates.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# -- MinHash parameters ----------------------------------------------------
MINHASH_PERMS = 32
MINHASH_BANDS = 8  # 8 bands × 4 rows: catches jaccard ≳ 0.5 with high prob.
MINHASH_ROWS = MINHASH_PERMS // MINHASH_BANDS
MERSENNE_P = 2_147_483_647  # 2^31 - 1
SHINGLE_N = 3

# Deterministic affine permutation coefficients (a*h + b) mod p, a != 0.
_PERM_COEF = [
    ((i * 2_654_435_761 + 1) % MERSENNE_P, (i * 40_503 + 7) % MERSENNE_P)
    for i in range(1, MINHASH_PERMS + 1)
]


def shingles(col, n: int = SHINGLE_N):
    """Word n-gram shingles as an array<string> — native expressions only.

    tokens -> sliding windows of n joined with spaces. Documents shorter
    than n tokens yield the whole document as a single shingle.
    """
    toks = F.split(col, " ")
    k = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def minhash_signature(shingle_col):
    """MinHash signature (array<long>, length MINHASH_PERMS), all JVM-side.

    base = xxhash64(shingle) mod p  (one pass over shingles)
    sig[i] = min over shingles of (a_i * base + b_i) mod p
    a_i < p and base < p keep a_i*base < p² < Long.MAX — no ANSI overflow.
    """
    base = F.transform(shingle_col, lambda s: F.pmod(F.xxhash64(s), F.lit(MERSENNE_P)))
    sig = F.array(
        *[
            F.array_min(
                F.transform(base, lambda h: F.pmod(h * a + b, F.lit(MERSENNE_P)))
            )
            for a, b in _PERM_COEF
        ]
    )
    return sig


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


def minhash_candidate_pairs(docs: DataFrame) -> DataFrame:
    """LSH banding → candidate (a, b) doc pairs (a < b), deduped.

    explode(bands) → groupBy-free equi-join on (band_id, band_hash): the
    shuffle key is the band bucket, so complexity is Σ bucket², not n².
    """
    sig = minhash_signature(shingles(F.col("text")))
    banded = docs.select(
        F.col("doc_id"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(MINHASH_BANDS - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(sig, b * MINHASH_ROWS + 1, MINHASH_ROWS),
                            lambda v: v.cast("string"),
                        ),
                    )
                ),
            )
        ).alias("band_id", "band_hash"),
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


def exact_jaccard(pairs: DataFrame, docs: DataFrame) -> DataFrame:
    """Join shingle sets back onto candidate pairs and compute exact word
    n-gram Jaccard (array_intersect / array_union — native)."""
    sh = docs.select(
        F.col("doc_id"), shingles(F.col("text")).alias("sh")
    )
    out = (
        pairs.join(sh.withColumnsRenamed({"doc_id": "doc_a", "sh": "sh_a"}), "doc_a")
        .join(sh.withColumnsRenamed({"doc_id": "doc_b", "sh": "sh_b"}), "doc_b")
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
    cand = minhash_candidate_pairs(docs)
    verified = exact_jaccard(cand, docs)
    return verified.filter(F.col("jaccard") >= 0.5).select(
        "doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard")
    )


@query("ngram_jaccard_pairs")  # rows-only
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 n-gram Jaccard scoring of LSH candidate pairs at a looser
    threshold (0.3) — the 'review band' between hard dups and distinct docs."""
    docs = load_table(spark, sf_dir, "documents")
    cand = minhash_candidate_pairs(docs)
    verified = exact_jaccard(cand, docs)
    return verified.filter(F.col("jaccard") >= 0.3).select(
        "doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard")
    )


# -- SimHash ---------------------------------------------------------------

SIMHASH_BITS = 64
SIMHASH_CHUNKS = 4  # 16-bit chunks; hamming ≤ 3 ⇒ ≥1 identical chunk


def simhash_column(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Add a deterministic 64-bit SimHash column via an Arrow-batched
    Pandas UDF (numpy bit accumulation; blake2b token hashes)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def simhash(texts: pd.Series) -> pd.Series:
        import hashlib

        import numpy as np

        out = np.zeros(len(texts), dtype=np.int64)
        for row, t in enumerate(texts):
            if not t:
                continue
            acc = np.zeros(SIMHASH_BITS, dtype=np.int64)
            for tok in t.split(" "):
                h = np.uint64(
                    int.from_bytes(
                        hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big"
                    )
                )
                bits = (
                    (h >> np.arange(SIMHASH_BITS, dtype=np.uint64)) & np.uint64(1)
                ).astype(np.int64)
                acc += 2 * bits - 1
            v = 0
            for i in range(SIMHASH_BITS):
                if acc[i] > 0:
                    v |= 1 << i
            # wrap to signed 64-bit
            out[row] = v - (1 << 64) if v >= (1 << 63) else v
        return pd.Series(out)

    return docs.withColumn("simhash", simhash(F.col(text_col)))


@query("simhash_neardup")  # rows-only
def simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 SimHash near-dup: 64-bit fingerprints, candidate generation by
    16-bit chunk equality (pigeonhole: hamming ≤ 3 ⇒ some chunk equal),
    verification with native bit_count(xor) ≤ 3. Only the fingerprint step
    touches Python (vectorized); banding/joining/verification are JVM-side.
    """
    docs = load_table(spark, sf_dir, "documents")
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
    cand = (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
        )
        .filter(F.col("hamming") <= 3)
        .select("doc_a", "doc_b", "hamming")
    )
