"""Properties of the RAG chunker, the BPE pair counter, and the
interval-bucketed IP-range join beyond hash parity (which
test_oracle_parity.py already enforces for all four queries)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tdk_apache_log_etl_spark.operators import QUERIES
from tdk_apache_log_etl_spark.operators.chunking import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
)

from .conftest import SF_DIR_SMOKE


def _docs(tmp_path, texts):
    pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["src0"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


def test_chunks_cover_every_token_exactly(spark, tmp_path):
    # 100 tokens, W=32, S=24 → starts 1,25,49,73 (97 pruned: 73's chunk
    # already reaches token 100). Union of [start, start+len) must be
    # exactly 1..n with overlap W-S between neighbors.
    n = 100
    sf = _docs(tmp_path, [" ".join(f"t{i}" for i in range(1, n + 1))])
    rows = (
        QUERIES["doc_chunk_sliding"](spark, sf)
        .orderBy("chunk_id")
        .collect()
    )
    assert [r.chunk_id for r in rows] == [0, 1, 2, 3]
    covered = set()
    for r in rows:
        toks = r.chunk_text.split(" ")
        assert len(toks) == r.n_tokens
        start = r.chunk_id * CHUNK_STRIDE + 1
        covered.update(range(start, start + r.n_tokens))
    assert covered == set(range(1, n + 1))
    # neighbors overlap by exactly W - S tokens
    for a, b in zip(rows, rows[1:]):
        a_toks, b_toks = a.chunk_text.split(" "), b.chunk_text.split(" ")
        assert a_toks[CHUNK_STRIDE:] == b_toks[: CHUNK_TOKENS - CHUNK_STRIDE]


def test_short_doc_yields_single_exact_chunk(spark, tmp_path):
    sf = _docs(tmp_path, ["alpha beta gamma"])
    rows = QUERIES["doc_chunk_sliding"](spark, sf).collect()
    assert len(rows) == 1
    assert rows[0].chunk_text == "alpha beta gamma"
    assert rows[0].n_tokens == 3


def test_bpe_pair_counts_hand_checked(spark, tmp_path):
    sf = _docs(tmp_path, ["a b a b c", "b a b"])
    got = {
        r.pair: r.n
        for r in QUERIES["bpe_merge_candidates"](spark, sf).collect()
    }
    # doc1 pairs: (a b) (b a) (a b) (b c); doc2: (b a) (a b)
    assert got == {"a b": 3, "b a": 2, "b c": 1}


def test_chunker_plan_has_no_shuffle(spark):
    # The chunker must stay narrow end-to-end: no Exchange node at all.
    plan = (
        QUERIES["doc_chunk_sliding"](spark, SF_DIR_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_ip_range_join_is_hash_not_nested_loop(spark):
    # Interval bucketing must buy a hash join: BroadcastHashJoin on the
    # bucket key with the BETWEEN residual, never BroadcastNestedLoopJoin.
    plan = (
        QUERIES["ip_range_enrich_traffic"](spark, SF_DIR_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan
    # Regression guard: join-key nullability once injected an
    # isnotnull(bucket) filter that inlined the whole regex parse outside
    # the projects' subexpression sharing (~40x slowdown). The parse
    # expression must appear only in Project nodes, never in a Filter.
    for line in plan.splitlines():
        if "Filter" in line:
            assert "regexp_replace" not in line


def test_ip_out_of_range_dropped(spark, tmp_path):
    # 25 blocks of width 2621 cover idx 0..65524; plant one event whose
    # ip_idx = 255*256 + 255 = 65535 (> 65524) → matches no block.
    import datetime

    pd.DataFrame(
        {
            "event_id": [255],
            "ts": [datetime.datetime(2024, 1, 1)],
            "user_id": [255],
            "event_type": ["click"],
            "value": [1.0],
            "props": ["{}"],
        }
    ).to_parquet(tmp_path / "events.parquet")
    pd.DataFrame(
        {
            "n_nationkey": list(range(25)),
            "n_name": [f"N{i}" for i in range(25)],
            "n_regionkey": [0] * 25,
        }
    ).to_parquet(tmp_path / "nation.parquet")
    assert QUERIES["ip_range_enrich_traffic"](spark, str(tmp_path)).count() == 0


def _py_bpe_reference(texts, rounds):
    from collections import Counter

    seqs = [t.split(" ") for t in texts]
    merges = []
    for rnd in range(1, rounds + 1):
        c = Counter()
        for s in seqs:
            for i in range(len(s) - 1):
                c[(s[i], s[i + 1])] += 1
        if not c:
            break
        (a, b), n = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:
            break
        merges.append((rnd, a, b, n))
        merged = f"{a}▁{b}"
        nxt = []
        for s in seqs:
            out = []
            for t in s:
                if out and out[-1] == a and t == b:
                    out[-1] = merged
                else:
                    out.append(t)
            nxt.append(out)
        seqs = [s for s in nxt]
    return merges


def test_bpe_train_matches_reference_on_planted_fixture(spark, tmp_path):
    # full-corpus trainer pin (the registered query runs the sampled
    # configuration; the trainer itself is exercised unsampled here)
    import pandas as pd

    from tdk_apache_log_etl_spark.operators.chunking import train_bpe_merges

    texts = [
        "x y x y x y z",     # (x,y) dominates; overlapping "y x" chains
        "a a a a",           # overlap semantics: 4 a's -> two (a,a) merges
        "x y w a a",
        "w w w",
    ]
    pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s0"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet")

    got = [
        (r["round"], r["left"], r["right"], r["n_occurrences"])
        for r in train_bpe_merges(spark, str(tmp_path)).collect()
    ]
    want = _py_bpe_reference(texts, 5)
    assert got == want
    # the planted corpus must actually exercise the greedy-overlap rule
    assert any(left == "a" and right == "a" for _, left, right, _ in want)


def test_bpe_train_registered_query_matches_sampled_reference(spark):
    # the REGISTERED query trains on the documented deterministic
    # doc-hash sample (BPE_BENCH_SAMPLE) — pin it against the
    # pure-Python reference over exactly the sampled texts
    import duckdb

    from tdk_apache_log_etl_spark.operators import QUERIES
    from tdk_apache_log_etl_spark.operators.chunking import (
        BPE_BENCH_SAMPLE,
        bpe_sample_filter,
    )
    from tdk_apache_log_etl_spark.sources.tables import load_table

    from .conftest import SF_DIR_CORRECT

    docs = load_table(spark, SF_DIR_CORRECT, "documents")
    sampled_ids = sorted(
        r.doc_id
        for r in docs.filter(bpe_sample_filter(BPE_BENCH_SAMPLE))
        .select("doc_id")
        .collect()
    )
    assert 0 < len(sampled_ids) < docs.count()
    all_texts = dict(
        duckdb.sql(
            f"SELECT doc_id, text FROM '{SF_DIR_CORRECT}/documents.parquet'"
        ).fetchall()
    )
    sampled_texts = [all_texts[i] for i in sampled_ids]
    got = [
        (r["round"], r["left"], r["right"], r["n_occurrences"])
        for r in QUERIES["bpe_train_merges"](
            spark, SF_DIR_CORRECT
        ).collect()
    ]
    assert got == _py_bpe_reference(sampled_texts, 5)


@pytest.mark.parametrize("fraction", [0.5, 0.1])
def test_bpe_train_sampled_matches_reference(spark, fraction):
    # The production sample_fraction knob: training on a deterministic
    # doc-hash sample must equal the pure-Python reference run over
    # exactly the sampled texts (sampled doc set derived from the same
    # predicate the trainer applies).
    import duckdb

    from tdk_apache_log_etl_spark.operators.chunking import (
        bpe_sample_filter,
        train_bpe_merges,
    )
    from tdk_apache_log_etl_spark.sources.tables import load_table

    from .conftest import SF_DIR_CORRECT

    docs = load_table(spark, SF_DIR_CORRECT, "documents")
    sampled_ids = sorted(
        r.doc_id
        for r in docs.filter(bpe_sample_filter(fraction)).select("doc_id").collect()
    )
    n_total = docs.count()
    assert 0 < len(sampled_ids) < n_total  # the sample is real and proper

    all_texts = dict(
        duckdb.sql(
            f"SELECT doc_id, text FROM '{SF_DIR_CORRECT}/documents.parquet'"
        ).fetchall()
    )
    sampled_texts = [all_texts[i] for i in sampled_ids]

    got = [
        (r["round"], r["left"], r["right"], r["n_occurrences"])
        for r in train_bpe_merges(
            spark, SF_DIR_CORRECT, sample_fraction=fraction
        ).collect()
    ]
    assert got == _py_bpe_reference(sampled_texts, 5)


def test_cdc_chunks_survive_prefix_insertion(spark, tmp_path):
    # The content-defined property: prepending a prefix re-chunks only
    # the region up to the first boundary AFTER the edit; every later
    # chunk hash must be identical. Fixed-size chunking shares zero.
    import duckdb

    from .conftest import SF_DIR_CORRECT

    base = duckdb.sql(
        f"SELECT text FROM '{SF_DIR_CORRECT}/documents.parquet' "
        "ORDER BY doc_id LIMIT 1"
    ).fetchone()[0]
    sf = _docs(tmp_path, [base, "THE INSERTED PREFIX CHANGES OFFSETS " + base])
    rows = QUERIES["cdc_chunk_docs"](spark, sf).collect()
    h0 = {r.chunk_md5 for r in rows if r.doc_id == 0}
    h1 = {r.chunk_md5 for r in rows if r.doc_id == 1}
    shared = len(h0 & h1)
    assert len(h0) >= 4  # enough boundaries for the property to bite
    assert shared >= len(h0) - 2  # at most the head chunk differs (+slack)
    # ...and a doc shorter than the window emits one whole-doc chunk
    sf2 = _docs(tmp_path, ["tiny"])
    [only] = QUERIES["cdc_chunk_docs"](spark, sf2).collect()
    assert (only.chunk_idx, only.start_pos, only.chunk_len) == (1, 1, 4)


def test_cdc_chunks_partition_concatenation(spark, tmp_path):
    # chunks tile the document exactly: starts/lengths are contiguous,
    # cover 1..len, and the md5s re-hash to the original text
    texts = [
        "the quick brown fox jumps over the lazy dog " * 5,
        "a" * 100,
    ]
    sf = _docs(tmp_path, texts)
    rows = QUERIES["cdc_chunk_docs"](spark, sf).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        expect_start = 1
        for c in chunks:
            assert c.start_pos == expect_start
            expect_start += c.chunk_len
        assert expect_start - 1 == len(texts[doc_id])
        import hashlib

        rebuilt = texts[doc_id]
        pos = 0
        for c in chunks:
            seg = rebuilt[pos : pos + c.chunk_len]
            assert hashlib.md5(seg.encode()).hexdigest() == c.chunk_md5
            pos += c.chunk_len


def test_winnow_shift_invariant_shared_fingerprints(spark, tmp_path):
    # THE winnowing guarantee: a shared substring of length >=
    # CDC_W + WINNOW_W - 1 yields at least one identical fingerprint in
    # both docs, wherever it sits. Plant a 200-char shared block at
    # different offsets inside different junk and require a healthy
    # overlap of selected hashes (interior windows are identical).
    import random

    rng = random.Random(7)
    alpha = "abcdefghijklmnopqrstuvwxyz "
    junk = lambda n: "".join(rng.choice(alpha) for _ in range(n))
    shared = junk(200)
    sf = _docs(tmp_path, [junk(37) + shared + junk(60),
                          junk(113) + shared + junk(11)])
    from tdk_apache_log_etl_spark.operators.chunking import (
        winnow_fingerprints,
    )
    from tdk_apache_log_etl_spark.sources.tables import load_table

    fps = winnow_fingerprints(load_table(spark, sf, "documents")).collect()
    h0 = {r.fp_hash for r in fps if r.doc_id == 0}
    h1 = {r.fp_hash for r in fps if r.doc_id == 1}
    # density ~2/(W+1): the ~177 shared interior grams should contribute
    # tens of common selections; require a conservative floor
    assert len(h0 & h1) >= 10
    # and selection must be content-driven: positions differ, hashes agree
    pos0 = {r.fp_hash: r.fp_pos for r in fps if r.doc_id == 0}
    pos1 = {r.fp_hash: r.fp_pos for r in fps if r.doc_id == 1}
    shifted = [h for h in h0 & h1 if pos1[h] - pos0[h] == 113 - 37]
    assert len(shifted) >= 10


def test_merge_pair_udf_preserves_null_arrays(spark):
    # ADVICE r6: the Arrow-batched rewrite must keep the F.aggregate
    # fold's NULL semantics — a NULL token array (NULL text upstream)
    # propagates as NULL instead of raising TypeError on len(None)
    from tdk_apache_log_etl_spark.operators.chunking import (
        _merge_pair_in_arrays,
    )

    toks = spark.createDataFrame(
        [(["a", "b", "c"],), (None,), (["a", "b", "a", "b"],)],
        "tk array<string>",
    )
    got = [r.tk for r in _merge_pair_in_arrays(toks, "a", "b", "ab").collect()]
    assert got == [["ab", "c"], None, ["ab", "ab"]]


def test_bpe_batched_certificate_adversarial(spark, tmp_path):
    # Adversarial fixture for the certificate-batched trainer: the top
    # pair (a,b) shares tokens with several equal-count runners-up, so
    # every later merge depends on the rewrite (new pairs like (a▁b, c)
    # can win rounds), and equal counts force the strict-> hazard rule.
    # The batched loop must still emit the SEQUENTIAL trainer's table.
    import pandas as pd

    from tdk_apache_log_etl_spark.operators.chunking import train_bpe_merges

    texts = [
        "a b c a b c a b c",   # (a,b)=3, (b,c)=3, (c,a)=2 -> chained
        "p q p q",             # (p,q)=2 ties with (c,a) and (q,p)
        "b c d b c d",         # boosts (b,c), adds (c,d)=2
        "a b a b",             # boosts (a,b); (b,a) appears
    ]
    pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s0"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet")

    got = [
        (r["round"], r["left"], r["right"], r["n_occurrences"])
        for r in train_bpe_merges(spark, str(tmp_path), rounds=8).collect()
    ]
    assert got == _py_bpe_reference(texts, 8)


def test_bpe_batched_certificate_self_pair(spark, tmp_path):
    # ADVICE r8 (high): a SELF-pair merge (a,a)->M leaves leftover a's
    # that spawn new pairs ((M,a),(a,M),(M,M)) bounded by the self-pair's
    # OWN old count, which the batch-pair hazard exclusion hides.  On
    # this corpus the sequential table is [(a,a,10),(a▁a,a,5),(c,d,3)]
    # but the pre-fix batched loop emitted (c,d,3) as round 2 — the
    # self-pair must CLOSE the batch (its own count joins the hazard).
    import pandas as pd

    from tdk_apache_log_etl_spark.operators.chunking import train_bpe_merges

    texts = ["a a a"] * 5 + ["c d"] * 3
    pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s0"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet")

    got = [
        (r["round"], r["left"], r["right"], r["n_occurrences"])
        for r in train_bpe_merges(spark, str(tmp_path), rounds=6).collect()
    ]
    want = _py_bpe_reference(texts, 6)
    assert got == want
    assert want[0][1] == want[0][2] == "a"  # fixture really self-pairs
    assert [w[:3] for w in want[:3]] == [
        (1, "a", "a"),
        (2, "a▁a", "a"),
        (3, "c", "d"),
    ]


def test_winnow_udf_matches_expression_twin(spark, tmp_path):
    """The vectorized winnow UDF must produce EXACTLY the expression
    twin's (doc_id, fp_hash, fp_pos) set — same polynomial, same
    comb-packing tie rule, same short-doc cutoffs — on the fixture
    corpus plus planted edge docs: below-k-gram, exactly at the
    no-window boundary (n = 22), one fingerprint window (n = 23), and
    a non-ASCII doc (code points, not bytes)."""
    import pandas as pd

    from tdk_apache_log_etl_spark.operators.chunking import (
        _winnow_fingerprints_expr,
        winnow_fingerprints,
    )
    from tdk_apache_log_etl_spark.sources.tables import load_table

    from .conftest import SF_DIR_CORRECT

    base = load_table(spark, SF_DIR_CORRECT, "documents").select(
        "doc_id", "text"
    )
    planted = spark.createDataFrame(
        [
            (10**6, "short"),
            (10**6 + 1, "exactly twenty-two ch."),
            (10**6 + 2, "exactly twenty-three ch"),
            (10**6 + 3, "naïve café — żółć über αβγδε " * 4),
            (10**6 + 4, None),
        ],
        "doc_id long, text string",
    )
    docs = base.unionByName(planted)
    fast = {
        (r.doc_id, r.fp_hash, r.fp_pos)
        for r in winnow_fingerprints(docs).collect()
    }
    spec = {
        (r.doc_id, r.fp_hash, r.fp_pos)
        for r in _winnow_fingerprints_expr(docs).collect()
    }
    assert fast == spec
    assert any(d == 10**6 + 3 for d, _, _ in fast)  # non-ASCII fingerprinted
    assert not any(d in (10**6, 10**6 + 1, 10**6 + 4) for d, _, _ in fast)
    assert sum(1 for d, _, _ in fast if d == 10**6 + 2) == 1


def test_cdc_cuts_udf_matches_expression_twin(spark):
    """The vectorized chunk-boundary UDF must produce EXACTLY the
    expression twin's chunk rows — same boundary rule, end-cut dedup,
    sub-k-gram whole-doc chunk — on the fixture corpus plus planted
    edge docs (short, empty-adjacent, non-ASCII)."""
    from tdk_apache_log_etl_spark.operators.chunking import (
        CDC_W,
        _cdc_chunk_docs_expr,
        _cdc_chunks_from_cuts,
        _cdc_cuts_udf,
    )
    from tdk_apache_log_etl_spark.sources.tables import load_table
    from .conftest import SF_DIR_CORRECT

    base = load_table(spark, SF_DIR_CORRECT, "documents").select(
        "doc_id", "text"
    )
    planted = spark.createDataFrame(
        [
            (10**6, "x"),
            (10**6 + 1, "a" * (CDC_W - 1)),
            (10**6 + 2, "naïve café — żółć über αβγδε " * 20),
            (10**6 + 3, None),
        ],
        "doc_id long, text string",
    )
    docs = base.unionByName(planted)
    fast = {
        tuple(r)
        for r in _cdc_chunks_from_cuts(
            docs.filter(F.length("text") >= 1).withColumn(
                "cuts", _cdc_cuts_udf()(F.col("text"))
            )
        ).collect()
    }
    spec = {tuple(r) for r in _cdc_chunk_docs_expr(docs).collect()}
    assert fast == spec
    assert any(d == 10**6 for d, *_ in fast)  # 1-char doc: one chunk
    assert not any(d == 10**6 + 3 for d, *_ in fast)


def test_word_ngram_fingerprints_matches_expression_structure(spark):
    """The vectorized prefix-polynomial gram fingerprints must induce
    EXACTLY the same gram identity structure as the expression form
    they replaced (slice+array_join per gram): same per-doc gram count,
    equal gram strings <=> equal fingerprints — that is the full
    contract its consumers (benchmark_decontaminate,
    doc_containment_pairs) rely on, since they only expose gram counts.
    Exercised on the fixture corpus plus edge docs (NULL text, short
    docs, empty/duplicated tokens from consecutive spaces)."""
    from tdk_apache_log_etl_spark.operators.chunking import (
        word_ngram_fingerprints,
    )
    from tdk_apache_log_etl_spark.sources.tables import load_table
    from .conftest import SF_DIR_CORRECT

    n = 5
    docs = load_table(spark, SF_DIR_CORRECT, "documents").select(
        "doc_id", "text"
    )
    edge = spark.createDataFrame(
        [
            (10_001, None),
            (10_002, ""),
            (10_003, "a b c d"),           # n-1 tokens -> no grams
            (10_004, "a b c d e"),         # exactly one gram
            (10_005, "a  b c d e f"),      # empty token counts
            (10_006, "x y x y x y x y x"), # repeated grams
        ],
        "doc_id long, text string",
    )
    docs = docs.unionByName(edge)
    ws = F.split(F.col("text"), " ")
    idx = F.sequence(F.lit(1), F.size(ws) - (n - 1))
    grams_str = F.when(
        F.size(ws) >= n,
        F.transform(idx, lambda i: F.array_join(F.slice(ws, i, n), " ")),
    ).otherwise(F.array().cast("array<string>"))
    rows = docs.select(
        "doc_id",
        grams_str.alias("gs"),
        word_ngram_fingerprints(F.col("text"), n).alias("fp"),
    ).collect()
    str2fp: dict[str, int] = {}
    fp2str: dict[int, str] = {}
    n_grams = 0
    for r in rows:
        gs = list(r.gs) if r.gs is not None else []
        fp = list(r.fp)
        assert len(gs) == len(fp), r.doc_id
        for s, f in zip(gs, fp):
            n_grams += 1
            assert str2fp.setdefault(s, f) == f, (s, r.doc_id)
            assert fp2str.setdefault(f, s) == s, (f, r.doc_id)
    assert n_grams > 10_000  # the fixture actually exercised the path
