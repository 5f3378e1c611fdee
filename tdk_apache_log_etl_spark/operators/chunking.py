"""RAG-style document chunking and tokenizer-training primitives over the
``documents`` table (SURVEY.md §2.6 LLM-pipeline pack).

Both operators are pure narrow transformations — split / sequence / slice /
transform higher-order functions, fully codegen'd, no shuffle before the
final (tiny) aggregate — so they scale embarrassingly: at 100 TB every
partition chunks its own documents with zero data movement, and the pair
counter's only shuffle carries (pair, partial_count) rows after map-side
combine, never document text.

No reference citation: the reference (two pandas/boto3 scripts, SURVEY §2.1)
has no text-corpus surface; these extend it per the extension mandate.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import default_parallelism, input_partitions
from ..sources.tables import load_table
from .registry import query

#: Sliding-window geometry: W tokens per chunk, stride S (overlap W-S).
CHUNK_TOKENS = 32
CHUNK_STRIDE = 24

#: 64-bit polynomial base for word_ngram_fingerprints — odd (hence
#: invertible mod 2^64) so substring hashes divide out of the prefix
#: form; the FNV-1a 64-bit prime, a well-mixed standard constant.
_NGRAM_FP_BASE = 1099511628211


def word_ngram_fingerprints(text, n: int):
    """array<long> of 64-bit fingerprints of the word n-grams of
    ``split(text, ' ')`` — the vectorized twin of

        transform(sequence(1, size(ws)-n+1),
                  i -> xxhash64(array_join(slice(ws, i, n), ' ')))

    (empty array when the document has under n tokens, matching the
    expression form's guard; a NULL text also yields the empty array).

    The fingerprint VALUES differ from xxhash64 — they are internal
    join/aggregation keys only: every consumer computes both sides of
    its gram join with this same function and exposes only gram
    COUNTS, so results are identical as long as distinct grams get
    distinct fingerprints, the same p(collision) ≈ pairs/2^64 contract
    the xxhash64 form documented (and the full-string DuckDB oracles
    verify per fixture). Equal grams map to equal fingerprints exactly:
    split-on-space/join-with-space reconstructs the original character
    run, so a gram's fingerprint is a pure function of its token
    sequence, and the space-joined representation is injective (tokens
    cannot contain the separator).

    Why a UDF beats the codegen'd expression here (guide §4.2): the
    expression form builds one ~50-byte string per gram (slice +
    array_join) and hashes it — measured ~145 ns/gram and 55% of
    benchmark_decontaminate's sf1 wall. This form decodes each doc to
    UTF-32 code points ONCE and gets every gram hash from O(1) numpy
    work via prefix polynomials: with pw[k] = BASE^k (mod 2^64,
    uint64 wraparound) and Q[k] = Σ_{j<k} code_j·pw[j], the hash of
    chars [a, b) is (Q[b] − Q[a]) · pw[a]^{-1} — BASE is odd, so pw[a]
    has a modular inverse, itself just invBASE^a. All uint64 vector
    ops, no per-gram strings, no per-gram Python."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    B = np.uint64(_NGRAM_FP_BASE)
    invB = np.uint64(pow(_NGRAM_FP_BASE, -1, 2**64))

    @pandas_udf("array<long>")
    def fps_udf(texts: pd.Series) -> pd.Series:
        # powers grown once per batch to the longest doc, reused across
        # docs (cumprod wraps mod 2^64 natively on uint64)
        cap = 1024
        for t in texts:
            if t is not None:
                cap = max(cap, len(t) + 1)
        pw = np.empty(cap, dtype=np.uint64)
        ipw = np.empty(cap, dtype=np.uint64)
        pw[0] = 1
        ipw[0] = 1
        np.cumprod(np.full(cap - 1, B, dtype=np.uint64), out=pw[1:])
        np.cumprod(np.full(cap - 1, invB, dtype=np.uint64), out=ipw[1:])
        out = []
        for t in texts:
            if t is None:
                out.append([])
                continue
            codes = np.frombuffer(
                t.encode("utf-32-le"), dtype=np.uint32
            ).astype(np.uint64)
            length = len(codes)
            # token starts = 0 and every position after a space; the
            # token COUNT includes empty tokens, exactly like
            # size(split(text, ' ')) with Java's limit=-1 semantics
            starts = np.flatnonzero(codes == 32) + 1
            m = len(starts) + 1
            if m < n:
                out.append([])
                continue
            a = np.empty(m - n + 1, dtype=np.int64)
            a[0] = 0
            a[1:] = starts[: m - n]
            b = np.empty(m - n + 1, dtype=np.int64)
            b[:-1] = starts[n - 1 : m - 1] - 1  # char before the space
            b[-1] = length
            Q = np.empty(length + 1, dtype=np.uint64)
            Q[0] = 0
            np.cumsum(codes * pw[:length], out=Q[1:])
            # bit-reinterpret to int64: Arrow longs are signed
            out.append(((Q[b] - Q[a]) * ipw[a]).view(np.int64))
        return pd.Series(out)

    return fps_udf(text)

_CHUNK_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tk FROM documents
    ), st AS (
      SELECT doc_id, tk, len(tk) AS n,
             unnest(generate_series(1, greatest(len(tk), 1), {CHUNK_STRIDE}))
               AS start
      FROM toks
    )
    SELECT doc_id,
           CAST((start - 1) / {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
           array_to_string(
             list_slice(tk, start, least(start + {CHUNK_TOKENS} - 1, n)), ' '
           ) AS chunk_text,
           CAST(least(start + {CHUNK_TOKENS} - 1, n) - start + 1 AS BIGINT)
             AS n_tokens
    FROM st
    WHERE start = 1 OR start <= n - {CHUNK_TOKENS} + {CHUNK_STRIDE}
"""


@query("doc_chunk_sliding", oracle=_CHUNK_ORACLE)
def doc_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping sliding-window chunks (W=32 tokens, stride 24) for
    retrieval / context-window preparation.

    Start positions 1, 1+S, 1+2S, … ; a start is kept iff it is the first
    or the previous chunk did not already reach the document's end
    (start <= n - W + S), so every token is covered exactly by the minimal
    chunk set and the final chunk may be short. All of it is
    sequence/filter/slice/posexplode — narrow, zero-shuffle, and the
    chunker never materializes more than one document's token array per
    row, so memory is bounded by the longest document, not the corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    w, s = CHUNK_TOKENS, CHUNK_STRIDE
    tk = F.split("text", " ")
    docs = docs.select("doc_id", tk.alias("tk"), F.size(tk).alias("n"))
    starts = F.filter(
        F.sequence(F.lit(1), F.greatest(F.col("n"), F.lit(1)), F.lit(s)),
        lambda st: (st == 1) | (st <= F.col("n") - w + s),
    )
    exploded = docs.select(
        "doc_id", "tk", "n", F.explode(starts).alias("start")
    )
    end = F.least(F.col("start") + w - 1, F.col("n"))
    return exploded.select(
        "doc_id",
        F.floor((F.col("start") - 1) / s).cast("long").alias("chunk_id"),
        F.array_join(
            F.slice("tk", F.col("start"), end - F.col("start") + 1), " "
        ).alias("chunk_text"),
        (end - F.col("start") + 1).cast("long").alias("n_tokens"),
    )


_PAIR_ORACLE = """
    WITH toks AS (
      SELECT string_split(text, ' ') AS tk FROM documents
    ), idx AS (
      SELECT tk, unnest(generate_series(1, len(tk) - 1)) AS i FROM toks
    ), pairs AS (
      SELECT tk[i] || ' ' || tk[i + 1] AS pair FROM idx
    )
    SELECT pair, CAST(COUNT(*) AS BIGINT) AS n
    FROM pairs GROUP BY pair
    ORDER BY n DESC, pair LIMIT 20
"""


@query("bpe_merge_candidates", oracle=_PAIR_ORACLE)
def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE-training iteration: corpus-wide adjacent-token-pair counts,
    top 20 (the pair a tokenizer trainer would merge next, repeated).

    The pair list per document is built with a single indexed ``transform``
    over the token array (codegen, no Python); the only shuffle is the
    pair-count aggregate, which map-side-combines to at most |vocab|²
    observed pairs per partition — at 100 TB the shuffle carries pair
    strings and partial counts, never text. Top-20 with a deterministic
    count-desc / pair-asc tie-break plans as TakeOrderedAndProject (no
    global sort).
    """
    docs = load_table(spark, sf_dir, "documents")
    # Materialize the token array in its own projection FIRST: referencing
    # split(text) inside the transform lambda would re-split the document
    # once per element (quadratic per doc) — lambda bodies don't share
    # subexpressions with the enclosing row.
    toks = docs.select(F.split("text", " ").alias("tk"))
    pairs = toks.select(
        F.explode(
            F.expr(
                "transform(slice(tk, 1, greatest(size(tk) - 1, 0)),"
                " (t, i) -> concat(t, ' ', element_at(tk, i + 2)))"
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(20)
    )


#: Merge rounds for the iterative trainer — enough to exercise the loop
#: (real training runs thousands; the shape per round is identical).
BPE_TRAIN_ROUNDS = 5

#: Rows collected per pair-count job by the certificate-batched trainer
#: (bounded driver transfer: 2 strings + 1 long per row).  Every merge
#: the certificate can prove exact resolves from ONE collected table, so
#: the number of distributed jobs is the number of REWRITES, not the
#: number of merges — the same threshold-batching discipline as
#: operators/hygiene.py's greedy coverage.
BPE_MERGE_BATCH = 4096


def _merge_pair_in_arrays(toks: DataFrame, a: str, b: str, merged: str) -> DataFrame:
    """Rewrite every token array, replacing adjacent (a, b) with the
    merged token, greedy left-to-right and non-overlapping (standard BPE
    apply order: in 'a a a' with pair (a,a) the first two merge, the
    third survives). Pure narrow transformation: each partition rewrites
    its own documents.

    Implemented as an Arrow-batched pandas UDF rather than an
    ``F.aggregate`` fold: Catalyst higher-order functions are
    INTERPRETED (no whole-stage codegen inside the lambda) and the fold
    copies the accumulator array per element — O(len²) per document —
    which made the rewrite the dominant per-round cost of BPE training
    (~2x the pair-count job at sf0.1). The linear single-pass Python
    loop over an Arrow batch is both asymptotically and measurably
    faster, and the semantics are pinned byte-identical to the fold by
    the pure-Python reference in tests/test_chunking.py."""
    return _merge_pairs_in_arrays(toks, [(a, b, merged)])


def _merge_pairs_in_arrays(
    toks: DataFrame, merges: list[tuple[str, str, str]]
) -> DataFrame:
    """Apply a SEQUENCE of merges in one Arrow pass: each (a, b, merged)
    is the same greedy left-to-right non-overlapping rewrite as
    :func:`_merge_pair_in_arrays`, applied in list order inside a single
    pandas-UDF scan.  Callers pass token-DISJOINT merges (the batched
    trainer's certificate guarantees it), so the composed result is
    byte-identical to chaining one rewrite pass per merge — at 1/k the
    Arrow transfers."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def merge_pair(col: pd.Series) -> pd.Series:
        def one(ts):
            if ts is None:
                # preserve the F.aggregate fold's NULL semantics: a NULL
                # token array (NULL text upstream) stays NULL instead of
                # crashing the whole training job on len(None)
                return None
            for a, b, merged in merges:
                out = []
                i = 0
                n = len(ts)
                while i < n:
                    if ts[i] == a and i + 1 < n and ts[i + 1] == b:
                        # merged != a, so a fresh merge can never be the
                        # left half of another merge in the same round
                        out.append(merged)
                        i += 2
                    else:
                        out.append(ts[i])
                        i += 1
                ts = out
            return ts

        return col.map(one)

    return toks.select(merge_pair("tk").alias("tk"))


#: Denominator for the deterministic doc-hash training sample.
BPE_SAMPLE_MOD = 1_000_000


def bpe_sample_filter(sample_fraction: float):
    """Deterministic doc-hash sample predicate: keep documents whose
    xxhash64(doc_id) bucket falls in the first `fraction` of the hash
    space. Hash-based (not doc_id-modulus) so periodic id patterns can't
    bias the sample; deterministic so training is reproducible across
    runs and cluster layouts."""
    if not 0.0 < sample_fraction <= 1.0:
        raise ValueError(f"sample_fraction must be in (0, 1] (got {sample_fraction})")
    return F.pmod(F.xxhash64("doc_id"), F.lit(BPE_SAMPLE_MOD)) < int(
        BPE_SAMPLE_MOD * sample_fraction
    )


def train_bpe_merges(
    spark: SparkSession,
    sf_dir: str,
    rounds: int = BPE_TRAIN_ROUNDS,
    sample_fraction: float = 1.0,
) -> DataFrame:
    """Iterative distributed BPE-style tokenizer training: N rounds of
    (count adjacent pairs) → (pick the most frequent pair, count-desc /
    pair-asc tie-break) → (rewrite the corpus merging that pair), over
    word-level sequences. Returns the learned merge table
    (round, left, right, n_occurrences) — the artifact a tokenizer
    trainer ships.

    ``sample_fraction`` is the production knob (SCALE.md): tokenizer
    statistics converge on a corpus sample, so at 100 TB you train on a
    deterministic doc-hash sample (e.g. 0.01) and the per-round rewrite
    touches 1% of the bytes; the full-corpus default is the sf-bench
    configuration, not the at-scale one. The pure-Python pin in
    tests/test_chunking.py covers the sampled path too.

    Scale shape per round: the pair count is the same map-side-combined
    aggregate as bpe_merge_candidates (shuffle carries pair partials,
    never text); ONLY the single winning pair row crosses to the driver
    (TakeOrderedAndProject limit 1); the rewrite is a narrow per-
    partition fold. Rounds chain through persist()/unpersist() so each
    round reads the previous round's materialized corpus, not a
    re-derivation from round 0 — lineage stays O(1) per round, the
    at-scale requirement for thousands of merge rounds.  Each round is
    ONE job: round t's pair-count scan is also what materializes round
    t's persisted rewrite, so the grandparent corpus is unpersisted
    only AFTER that job returns (deferred release) instead of paying a
    dedicated count() materialization pass per round.

    Deliberately oracle-free (data-dependent iteration is not
    single-SQL-expressible); correctness is pinned against a pure-Python
    reference implementation on a planted fixture in
    tests/test_chunking.py, and determinism comes from the explicit
    tie-break."""
    docs = load_table(spark, sf_dir, "documents")
    if sample_fraction < 1.0:
        docs = docs.filter(bpe_sample_filter(sample_fraction))
    toks = docs.select(F.split("text", " ").alias("tk")).persist()
    results = []
    prev = toks
    grandparent = None  # released only after the job that reads `prev`
    while len(results) < rounds:
        pairs = prev.select(
            F.explode(
                F.expr(
                    "transform(slice(tk, 1, greatest(size(tk) - 1, 0)),"
                    " (t, i) -> struct(t AS l,"
                    " element_at(tk, i + 2) AS r))"
                )
            ).alias("p")
        )
        tbl = (
            pairs.groupBy("p.l", "p.r")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
            .limit(BPE_MERGE_BATCH)
            .collect()
        )
        # the collect above just materialized `prev`'s persisted blocks
        # (it was the first action to touch them), so the corpus it was
        # derived from is now safe to release without a recompute risk
        if grandparent is not None:
            grandparent.unpersist()
            grandparent = None
        if not tbl or tbl[0]["n"] < 2:
            break
        # ---- certificate-batched merge emission ----------------------
        # The first row of a FRESH count table is always the exact next
        # merge (nothing has morphed yet — identical to the old
        # TakeOrdered(1)).  Further rows stay exact while (a) they share
        # no token with any merge already emitted this batch (their own
        # count is then unchanged), and (b) their count strictly exceeds
        # `hazard` — the max OLD count over every pair that a prior
        # in-batch merge can morph (pairs sharing a token with it; any
        # rewritten/new pair's post-merge count is bounded by its
        # parent's old count, and the table's truncation bound covers
        # rows below the collect).  Strict >, so no morphing pair can
        # even tie and lex-steal the round.  When the certificate runs
        # out, rewrite once and recount — the SEQUENTIAL trainer's merge
        # table, at one distributed job per BATCH instead of per merge.
        trunc = tbl[-1]["n"] if len(tbl) == BPE_MERGE_BATCH else 0
        touched: set[str] = set()
        batch_pairs: set[tuple[str, str]] = set()
        hazard = trunc
        batch: list[tuple[str, str, int]] = []
        for row in tbl:
            if len(results) + len(batch) >= rounds:
                break
            l, r, n = row["l"], row["r"], int(row["n"])
            if n < 2:
                break  # below min-support here; the recount decides stop
            if batch:
                if l in touched or r in touched or n <= hazard:
                    break
            batch.append((l, r, n))
            batch_pairs.add((l, r))
            fresh = {l, r} - touched
            touched.update((l, r))
            if l == r:
                # A self-pair merge (a,a)->M leaves LEFTOVER a's whose
                # new neighbors ((M,a),(a,M),(M,M)) are bounded only by
                # THIS pair's own old count — which the batch-pair
                # exclusion below deliberately hides.  Fold n into the
                # hazard; since the table is count-desc no later row can
                # strictly exceed it, so a self-pair closes the batch.
                hazard = max(hazard, n)
            # Incremental hazard: a non-batch row contributes the first
            # time one of its tokens becomes touched (tokens only ever
            # get added, and a row sharing a touched token can never
            # later join the batch — the acceptance check rejects it),
            # so scanning rows matching the NEWLY touched tokens once is
            # equivalent to the full rescan, at O(|tbl|) per accept.
            if fresh:
                hazard = max(
                    [hazard]
                    + [
                        int(q["n"])
                        for q in tbl
                        if (q["l"] in fresh or q["r"] in fresh)
                        and (q["l"], q["r"]) not in batch_pairs
                    ]
                )
        start = len(results) + 1
        results.extend(
            (start + i, l, r, n) for i, (l, r, n) in enumerate(batch)
        )
        if len(results) >= rounds:
            # the final rewrite is never read by anyone — its only
            # consumer would be the next recount. Skipping it cuts one
            # full narrow pass over the corpus.
            break
        # token-disjoint by construction → one composed Arrow pass
        nxt = _merge_pairs_in_arrays(
            prev,
            [(l, r, f"{l}▁{r}") for l, r, _ in batch],  # U+2581 joiner
        ).persist()
        grandparent = prev
        prev = nxt
    if grandparent is not None:
        grandparent.unpersist()
    prev.unpersist()
    return spark.createDataFrame(
        results, "round int, left string, right string, n_occurrences long"
    )


#: Registered/bench sample fraction — the production posture (SCALE.md:
#: tokenizer statistics converge on a corpus sample; at 100 TB you train
#: at ~0.01). 0.25 keeps the sf-bench sample large enough that all
#: BPE_TRAIN_ROUNDS merges clear the min-support guard at every test sf.
BPE_BENCH_SAMPLE = 0.25


@query("bpe_train_merges")
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered configuration of train_bpe_merges: the documented
    deterministic doc-hash sample (BPE_BENCH_SAMPLE), matching how the
    trainer actually runs at scale — per-round rewrites touch the
    sample, never the full corpus. The full-corpus path stays covered
    by the pure-Python pins in tests/test_chunking.py; the sampled path
    is pinned there at two further fractions."""
    return train_bpe_merges(
        spark, sf_dir, sample_fraction=BPE_BENCH_SAMPLE
    )


_FIRST_MERGE_ORACLE = """
    WITH toks AS (
      SELECT string_split(text, ' ') AS tk FROM documents
    ), idx AS (
      SELECT tk, unnest(generate_series(1, len(tk) - 1)) AS i FROM toks
    ), pairs AS (
      SELECT tk[i] AS l, tk[i + 1] AS r FROM idx
    )
    SELECT CAST(1 AS INTEGER) AS round,
           l AS "left", r AS "right",
           CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM pairs GROUP BY l, r
    HAVING COUNT(*) >= 2
    ORDER BY n_occurrences DESC, l, r LIMIT 1
"""


@query("bpe_first_merge", oracle=_FIRST_MERGE_ORACLE)
def bpe_first_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E76 companion: the trainer's FIRST merge decision, hash-checked.

    The full iterative trainer has no single-SQL oracle (each round's
    pair counts depend on the previous round's rewrite), but round 1 is
    closed-form: the globally most frequent adjacent token pair under
    the trainer's exact tie-break (count desc, left asc, right asc).
    Running train_bpe_merges(rounds=1) — the REAL trainer, not a
    reimplementation — and hash-comparing its first row against
    DuckDB's independent pair count pins the decision rule the whole
    merge table grows from; a drifted tokenization, tie-break, or
    count would flip this before it silently skewed all later rounds."""
    return train_bpe_merges(spark, sf_dir, rounds=1)


# --------------------------------------------------------------------------
# E122: content-defined chunking (rolling-hash boundaries, LBFS/rsync)
# --------------------------------------------------------------------------

#: Rolling-hash geometry: window of CDC_W chars, polynomial base CDC_B
#: mod 2^32, boundary where the hash ≡ 0 (mod CDC_MOD) → ~CDC_MOD-char
#: expected chunks.
CDC_W = 16
CDC_B = 31
CDC_MOD = 64
_CDC_M32 = 1 << 32
#: b^(W-1-k) mod 2^32 for k = 0..W-1 — the fixed coefficient of the
#: k-th char in the window ending at position i (char i-W+1+k).
_CDC_COEF = [pow(CDC_B, CDC_W - 1 - k, _CDC_M32) for k in range(CDC_W)]


def _cdc_hash_expr(text_col: str, pos: str, ascii_fn: str = "ascii") -> str:
    """The window hash as ONE engine-neutral SQL expression — the same
    string renders the Spark column and the DuckDB oracle, so the
    boundary rule cannot drift between engines."""
    terms = " + ".join(
        f"CAST({ascii_fn}(substring({text_col}, {pos} - {CDC_W - 1 - k}, 1))"
        f" AS BIGINT) * {c}"
        for k, c in enumerate(_CDC_COEF)
    )
    return f"(({terms}) % {_CDC_M32})"


_CDC_ORACLE = f"""
    WITH pos AS (
      SELECT doc_id, text,
             unnest(generate_series({CDC_W}, length(text))) AS i
      FROM documents WHERE length(text) >= {CDC_W}
    ),
    bounds AS (
      SELECT doc_id, CAST(i AS BIGINT) AS cut FROM pos
      WHERE {_cdc_hash_expr("text", "CAST(i AS INTEGER)")} % {CDC_MOD} = 0
      UNION
      SELECT doc_id, CAST(length(text) AS BIGINT) AS cut FROM documents
      WHERE length(text) >= 1
    ),
    chunks AS (
      SELECT doc_id, cut,
             COALESCE(LAG(cut) OVER (
               PARTITION BY doc_id ORDER BY cut), 0) + 1 AS start,
             ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY cut) AS chunk_idx
      FROM bounds
    )
    SELECT c.doc_id,
           CAST(c.chunk_idx AS BIGINT) AS chunk_idx,
           c.start AS start_pos,
           c.cut - c.start + 1 AS chunk_len,
           md5(substring(d.text, CAST(c.start AS INTEGER),
                         CAST(c.cut - c.start + 1 AS INTEGER))) AS chunk_md5
    FROM chunks c JOIN documents d ON c.doc_id = d.doc_id
"""


@query("cdc_chunk_docs", oracle=_CDC_ORACLE)
def cdc_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E122: content-defined chunking — split each document where the
    CDC_W-char polynomial rolling hash ≡ 0 mod CDC_MOD (the LBFS /
    rsync boundary rule; Muthitacharoen et al., SOSP'01). Unlike
    fixed-size chunking, boundaries ride WITH the content: inserting a
    prefix shifts every fixed-size chunk but leaves all content-defined
    chunks after the edit identical — which is what makes chunk-hash
    dedup robust to shifted/near-duplicate documents (the storage-side
    complement of minhash).

    Plan shape: a vectorized per-doc pandas UDF computes the cut
    positions (UTF-32 decode → int64 code points, the 16-term
    polynomial as 16 vectorized multiply-adds — the SAME algebra the
    oracle's expression string spells out, pinned bit-equal to the
    expression twin `_cdc_chunk_docs_expr` by test), then posexplode +
    element_at pair consecutive cuts into (start, len) chunks and md5
    runs JVM-side per chunk. ONE pass over the text, no per-character
    row explode, no per-doc window shuffle, no text re-join (the old
    expression plan paid all three: 55M exploded rows and two
    corpus-keyed exchanges at 10× scale — measured 11.7 s vs ~2 s for
    identical output). Docs shorter than CDC_W emit one whole-doc
    chunk (no window fits)."""
    docs = load_table(spark, sf_dir, "documents")
    par = default_parallelism(spark)
    _np = input_partitions(docs)
    if _np is None or _np < par:
        docs = docs.repartition(par)
    return _cdc_chunks_from_cuts(
        docs.filter(F.length("text") >= 1).withColumn(
            "cuts", _cdc_cuts_udf()(F.col("text"))
        )
    )


def _cdc_cuts_udf():
    """Vectorized chunk-boundary detector: array<long> of cut positions
    (1-based, ascending, deduped) — every i in [CDC_W, n] whose k-gram
    hash ≡ 0 mod CDC_MOD, plus the end-of-doc cut n. Bit-exact to the
    expression/oracle rule: code points match ascii(substring(..)), and
    the int64 polynomial cannot overflow (16 terms < 2^56.1)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    coef = np.asarray(_CDC_COEF, dtype=np.int64)

    @pandas_udf("array<long>")
    def cuts_udf(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if not t:
                out.append([])
                continue
            codes = np.frombuffer(
                t.encode("utf-32-le"), dtype=np.uint32
            ).astype(np.int64)
            n = len(codes)
            if n < CDC_W:
                out.append([n])
                continue
            H = np.zeros(n - CDC_W + 1, dtype=np.int64)
            for k in range(CDC_W):
                H += codes[k : n - CDC_W + 1 + k] * coef[k]
            H %= _CDC_M32
            cuts = np.flatnonzero(H % CDC_MOD == 0) + CDC_W
            if len(cuts) == 0 or cuts[-1] != n:
                cuts = np.append(cuts, n)
            out.append(cuts.astype(np.int64))
        return pd.Series(out)

    return cuts_udf


def _cdc_chunks_from_cuts(docs_with_cuts: DataFrame) -> DataFrame:
    """(doc_id, text, cuts) → chunk rows. posexplode gives chunk_idx;
    start = previous cut + 1 via element_at on the carried array — no
    per-doc window, no re-join with the text."""
    return (
        docs_with_cuts.select(
            "doc_id",
            "text",
            "cuts",
            F.posexplode("cuts").alias("pos0", "cut"),
        )
        .select(
            "doc_id",
            (F.col("pos0") + 1).cast("long").alias("chunk_idx"),
            F.when(F.col("pos0") == 0, F.lit(1).cast("long"))
            .otherwise(F.element_at("cuts", F.col("pos0")) + 1)
            .alias("start"),
            "cut",
            "text",
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.col("start").alias("start_pos"),
            (F.col("cut") - F.col("start") + 1).alias("chunk_len"),
            F.md5(
                F.encode(
                    F.expr(
                        "substring(text, CAST(start AS INT), "
                        "CAST(cut - start + 1 AS INT))"
                    ),
                    "UTF-8",
                )
            ).alias("chunk_md5"),
        )
    )


def _cdc_chunk_docs_expr(docs: DataFrame) -> DataFrame:
    """Native-expression twin of the cdc_chunk_docs body — the readable
    spec (explode char positions, codegen'd 16-term hash, per-doc
    window to pair cuts), kept as the equality reference for the
    vectorized path and as the line-by-line mirror of the DuckDB
    oracle."""
    pos = (
        docs.filter(F.length("text") >= CDC_W)
        .select(
            "doc_id",
            "text",
            F.explode(
                F.sequence(F.lit(CDC_W), F.length("text"))
            ).alias("i"),
        )
    )
    cuts = pos.filter(
        F.expr(f"{_cdc_hash_expr('text', 'i')} % {CDC_MOD} = 0")
    ).select("doc_id", F.col("i").cast("long").alias("cut"))
    ends = docs.filter(F.length("text") >= 1).select(
        "doc_id", F.length("text").cast("long").alias("cut")
    )
    bounds = cuts.unionByName(ends).distinct()
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("cut")
    chunks = bounds.select(
        "doc_id",
        "cut",
        (F.coalesce(F.lag("cut").over(w), F.lit(0)) + 1).alias("start"),
        F.row_number().over(w).cast("long").alias("chunk_idx"),
    )
    return (
        chunks.join(docs.select("doc_id", "text"), "doc_id")
        .select(
            "doc_id",
            "chunk_idx",
            F.col("start").alias("start_pos"),
            (F.col("cut") - F.col("start") + 1).alias("chunk_len"),
            F.md5(
                F.encode(
                    F.expr(
                        "substring(text, CAST(start AS INT), "
                        "CAST(cut - start + 1 AS INT))"
                    ),
                    "UTF-8",
                )
            ).alias("chunk_md5"),
        )
    )


# --------------------------------------------------------------------------
# E135: winnowing fingerprints (MOSS) — shift-invariant doc signatures
# --------------------------------------------------------------------------

#: Winnowing geometry: k-grams are the same CDC_W-char windows (the hash
#: expression is shared verbatim with E122 and the oracle), winnowed over
#: WINNOW_W consecutive gram hashes → expected density 2/(WINNOW_W+1).
WINNOW_W = 8
#: Position packing: comb = hash·2^21 + (2^21−1−pos) makes ONE BIGINT MIN
#: pick (smallest hash, rightmost position) — the exact SIGMOD'03 tie
#: rule — as a plain window aggregate. Caps docs at 2^21 chars (2 MiB);
#: longer docs would bump the shift to 2^31 with the same algebra.
_WINNOW_PSCALE = 1 << 21


def winnow_fingerprints(docs: DataFrame) -> DataFrame:
    """Selected (doc_id, fp_hash, fp_pos) winnowing fingerprints of a
    documents frame: for every window of WINNOW_W consecutive k-gram
    hashes keep the minimum (rightmost on ties), dedup'd.

    Vectorized per-doc pandas UDF: UTF-32 decode → one int64 vector of
    code points per doc (identical to ascii(substring(..)) — both are
    code points), the 16-term polynomial as 16 vectorized multiply-adds
    (term < 2^52.1, 16 terms < 2^56.1: no int64 overflow even at the
    0x10FFFF code-point ceiling), the winnow MIN as a stride-tricks
    sliding window, np.unique for the per-doc dedup. Exactly the
    algebra of the expression twin below — pinned bit-equal on the
    fixture corpus by tests/test_chunking.py — but ~10× faster: the
    expression form explodes one ROW per character (55M rows at 10×
    scale) and pays per-row codegen+sort overhead ~200 ns/char, where
    the UDF streams each doc once at numpy speed with no explode, no
    sort, and no corpus-sized shuffle at all (fingerprints leave the
    UDF already doc-grouped)."""
    import numpy as np
    from numpy.lib.stride_tricks import sliding_window_view
    from pyspark.sql.functions import pandas_udf

    coef = np.asarray(_CDC_COEF, dtype=np.int64)

    @pandas_udf("array<long>")
    def winnow_udf(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:
                out.append([])
                continue
            codes = np.frombuffer(
                t.encode("utf-32-le"), dtype=np.uint32
            ).astype(np.int64)
            n = len(codes)
            if n - CDC_W + 1 < WINNOW_W:
                out.append([])
                continue
            H = np.zeros(n - CDC_W + 1, dtype=np.int64)
            for k in range(CDC_W):
                H += codes[k : n - CDC_W + 1 + k] * coef[k]
            H %= _CDC_M32
            i = np.arange(CDC_W, n + 1, dtype=np.int64)
            comb = H * _WINNOW_PSCALE + (_WINNOW_PSCALE - 1 - i)
            wm = sliding_window_view(comb, WINNOW_W).min(axis=1)
            out.append(np.unique(wm))
        return pd.Series(out)

    return (
        docs.filter(F.length("text") >= CDC_W)
        .select("doc_id", F.explode(winnow_udf(F.col("text"))).alias("wmin"))
        .select(
            "doc_id",
            F.expr(f"wmin div {_WINNOW_PSCALE}").alias("fp_hash"),
            F.expr(
                f"{_WINNOW_PSCALE} - 1 - (wmin % {_WINNOW_PSCALE})"
            ).alias("fp_pos"),
        )
    )


def _winnow_fingerprints_expr(docs: DataFrame) -> DataFrame:
    """Native-expression twin of winnow_fingerprints — the readable spec
    (narrow explode → one per-doc window pass; the comb packing keeps
    argmin+tie-break inside a single BIGINT MIN), kept as the equality
    reference for the vectorized path and as the line-by-line mirror of
    the DuckDB oracle."""
    pos = (
        docs.filter(F.length("text") >= CDC_W)
        .select(
            "doc_id",
            F.length("text").alias("len"),
            "text",
            F.explode(
                F.sequence(F.lit(CDC_W), F.length("text"))
            ).alias("i"),
        )
        .select(
            "doc_id",
            "len",
            "i",
            F.expr(
                f"({_cdc_hash_expr('text', 'i')}) * {_WINNOW_PSCALE}"
                f" + ({_WINNOW_PSCALE} - 1 - i)"
            ).alias("comb"),
        )
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(0, WINNOW_W - 1)
    )
    wins = pos.select(
        "doc_id", "i", "len", F.min("comb").over(w).alias("wmin")
    ).filter(F.col("i") <= F.col("len") - (WINNOW_W - 1))
    return (
        wins.select("doc_id", "wmin")
        .distinct()
        .select(
            "doc_id",
            F.expr(f"wmin div {_WINNOW_PSCALE}").alias("fp_hash"),
            F.expr(
                f"{_WINNOW_PSCALE} - 1 - (wmin % {_WINNOW_PSCALE})"
            ).alias("fp_pos"),
        )
    )


_WINNOW_ORACLE = f"""
    WITH pos AS (
      SELECT doc_id, length(text) AS len, text,
             unnest(generate_series({CDC_W}, length(text))) AS i
      FROM documents WHERE length(text) >= {CDC_W}
    ), hashed AS (
      SELECT doc_id, len, i,
             ({_cdc_hash_expr("text", "CAST(i AS INTEGER)")})
               * {_WINNOW_PSCALE} + ({_WINNOW_PSCALE} - 1 - i) AS comb
      FROM pos
    ), wins AS (
      SELECT doc_id, i, len,
             MIN(comb) OVER (PARTITION BY doc_id ORDER BY i
               ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING)
               AS wmin
      FROM hashed
      QUALIFY i <= len - {WINNOW_W - 1}
    ), fps AS (
      SELECT DISTINCT doc_id, wmin FROM wins
    ), per_doc AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_fingerprints,
             CAST(SUM(wmin // {_WINNOW_PSCALE}) AS BIGINT) AS fp_hash_sum,
             CAST(bit_xor(wmin // {_WINNOW_PSCALE}) AS BIGINT)
               AS fp_hash_xor
      FROM fps GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(GREATEST(length(d.text) - {CDC_W - 1}, 0) AS BIGINT)
             AS n_grams,
           COALESCE(p.n_fingerprints, 0) AS n_fingerprints,
           p.fp_hash_sum, p.fp_hash_xor
    FROM documents d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
"""


@query("winnow_doc_fingerprints", oracle=_WINNOW_ORACLE)
def winnow_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E135: winnowing fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): from every window of WINNOW_W
    consecutive k-gram hashes keep the minimum (rightmost on ties).
    The guarantee plain every-Nth sampling lacks: any shared substring
    of length ≥ CDC_W + WINNOW_W − 1 between two documents yields at
    least one IDENTICAL selected fingerprint in both — selection
    depends only on content, never on position (shift-invariant), which
    is what makes it the standard plagiarism/near-dup signature.

    Exactness: the k-gram hash is the SAME engine-neutral expression
    string as E122's chunk boundary rule; the (hash, rightmost-pos)
    argmin packs into one BIGINT so selection is a plain MIN window —
    the selected set, per-doc counts, exact fingerprint-hash sums and
    bit_xor digests all hash-gate against the oracle.

    Scale: explode is linear in corpus bytes (same amplification-aware
    widening as E122/E113); ONE per-doc window pass on the doc_id
    exchange; output is the ~2/(WINNOW_W+1)-density summary, never the
    gram stream. fp_hash_sum ≤ n_fp·2^32 keeps BIGINT headroom at any
    doc size the 2^21 position cap admits."""
    docs = load_table(spark, sf_dir, "documents")
    par = default_parallelism(spark)
    # partition BY doc_id (not round-robin): fingerprints leave the UDF
    # doc-grouped, so the per-doc aggregate and the final join reuse
    # this one exchange of raw text — no fingerprint-volume shuffle.
    docs = docs.repartition(par, "doc_id")
    fps = winnow_fingerprints(docs)
    per_doc = fps.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_fingerprints"),
        F.sum("fp_hash").alias("fp_hash_sum"),
        F.expr("bit_xor(fp_hash)").cast("long").alias("fp_hash_xor"),
    )
    return (
        docs.select(
            "doc_id",
            F.greatest(F.length("text") - F.lit(CDC_W - 1), F.lit(0))
            .cast("long")
            .alias("n_grams"),
        )
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce("n_fingerprints", F.lit(0))
            .cast("long")
            .alias("n_fingerprints"),
            "fp_hash_sum",
            "fp_hash_xor",
        )
    )
