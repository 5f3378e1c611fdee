"""Quality tests for the dedup family: planted near-duplicates must be
found, unrelated documents must not pair, survivors are deterministic."""

from __future__ import annotations

from pyspark.sql import functions as F

from tdk_apache_log_etl_spark.operators import QUERIES
from tdk_apache_log_etl_spark.operators.dedup import (
    exact_jaccard,
    minhash_candidate_pairs,
    shingle_frame,
    simhash_column,
)


def _planted_docs(spark):
    base = (
        "spark group query row data slow small filter customer line the batch "
        "value merge fast key order sort table scan part window hash join "
        "stream agg vector column"
    )
    near = base.replace("slow", "quick").replace("merge", "blend")  # ~0.8 sim
    other = (
        "completely different words about cooking pasta tomatoes basil olive "
        "oil garlic onions peppers mushrooms zucchini eggplant rosemary thyme "
        "oregano sage butter cream parmesan pecorino gnocchi ravioli lasagna"
    )
    rows = [(0, base), (1, near), (2, other), (3, base)]  # 3 = exact dup of 0
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_short_documents_shingle_whole_doc(spark):
    # Documents with fewer than SHINGLE_N tokens must yield the whole doc
    # as one shingle — under Spark 4 ANSI mode a plain element_at past the
    # array end would throw INVALID_ARRAY_INDEX_IN_ELEMENT_AT instead.
    rows = [(0, "single"), (1, "two words"), (2, "now three tokens"),
            (3, "spark query engine test")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    sh = {r.doc_id: r.sh for r in shingle_frame(docs, n_partitions=2).collect()}
    assert sh[0] == ["single"]
    assert sh[1] == ["two words"]
    assert sh[2] == ["now three tokens"]
    assert sh[3] == ["spark query engine", "query engine test"]


def test_minhash_pipeline_survives_short_docs(spark):
    # End-to-end: the whole candidate-pair path runs on a corpus containing
    # 1- and 2-token documents, and identical short docs still pair up.
    rows = [(0, "hi"), (1, "hi"), (2, "ok bye"), (3, "ok bye"),
            (4, "some longer document with many distinct words in it here")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    sh = shingle_frame(docs, n_partitions=2)
    pairs = exact_jaccard(minhash_candidate_pairs(sh), sh)
    found = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    assert (0, 1) in found and (2, 3) in found
    assert all(4 not in p for p in found)


def test_minhash_finds_planted_pairs(spark):
    docs = _planted_docs(spark)
    sh = shingle_frame(docs, n_partitions=4)
    pairs = exact_jaccard(minhash_candidate_pairs(sh), sh)
    found = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in pairs.filter(F.col("jaccard") >= 0.5).collect()
    }
    assert (0, 3) in found and found[(0, 3)] == 1.0  # exact dup
    assert (0, 1) in found  # planted near-dup
    assert all(2 not in p for p in found)  # unrelated doc never pairs


def test_minhash_deterministic(spark):
    docs = _planted_docs(spark)
    runs = []
    for _ in range(2):
        sh = shingle_frame(docs, n_partitions=4)
        pairs = exact_jaccard(minhash_candidate_pairs(sh), sh)
        runs.append(sorted(map(tuple, pairs.collect())))
    assert runs[0] == runs[1]


def test_exact_dedup_survivor_is_min_id(spark):
    docs = _planted_docs(spark)
    surv = (
        docs.groupBy("text")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n"))
    )
    by_id = {r.doc_id: r.n for r in surv.collect()}
    assert by_id[0] == 2  # doc 0 survives its dup (doc 3)
    assert 3 not in by_id


def test_simhash_identical_docs_zero_distance(spark):
    docs = _planted_docs(spark)
    fp = {r.doc_id: r.simhash for r in simhash_column(docs).collect()}
    assert fp[0] == fp[3]
    assert fp[0] != fp[2]
    # near-dup within a few bits, unrelated doc far away
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham(fp[0], fp[1]) < ham(fp[0], fp[2])


def test_connected_components_chain_converges(spark):
    # a 6-node chain (0-1-2-3-4-5) forces label propagation across multiple
    # rounds (diameter 5) — the case a single min-over-neighbors pass gets
    # wrong; plus a disjoint pair and a singleton.
    from tdk_apache_log_etl_spark.operators.dedup import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(9)], ["doc_id"])
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (6, 7)],
        ["doc_a", "doc_b"],
    )
    got = {
        (r.doc_id, r.canonical_id)
        for r in connected_components(nodes, pairs).collect()
    }
    assert got == {(0, 0), (1, 0), (2, 0), (3, 0), (4, 0), (5, 0),
                   (6, 6), (7, 6), (8, 8)}


def test_scoped_cache_reuses_and_stays_bounded(spark):
    # Query-building persist()s (shingle frames, LSH bands) must not
    # accumulate without bound in a long-lived session — but semantically
    # identical frames (same corpus shingled twice by back-to-back
    # queries) must share ONE cached materialization.
    from tdk_apache_log_etl_spark.operators import registry
    from tdk_apache_log_etl_spark.operators.registry import (
        release_scoped_caches,
        scoped_persist,
    )

    release_scoped_caches()
    d1 = scoped_persist(spark.range(10))
    d2 = scoped_persist(spark.range(10))
    assert d1 is d2  # identical plan -> reused, not re-persisted
    assert len(registry._SCOPED_CACHES) == 1
    for i in range(registry._MAX_SCOPED_CACHES + 3):
        scoped_persist(spark.range(1000 + i))
    assert len(registry._SCOPED_CACHES) == registry._MAX_SCOPED_CACHES
    release_scoped_caches()
    assert len(registry._SCOPED_CACHES) == 0


def test_pooled_cache_survives_default_pool_pressure(spark):
    # Round-9: the parsed-CLF staging frame is read by clf_* queries
    # scattered across the whole bench; frames in a named pool must
    # survive arbitrarily many DEFAULT-pool insertions (only same-pool
    # frames may evict them), each pool stays at its own small cap, and
    # release_scoped_caches clears pools too.
    from tdk_apache_log_etl_spark.operators import registry
    from tdk_apache_log_etl_spark.operators.registry import (
        release_scoped_caches,
        scoped_persist,
    )

    release_scoped_caches()
    p1 = scoped_persist(spark.range(7), pool="clf_parse")
    for i in range(registry._MAX_SCOPED_CACHES + 5):
        scoped_persist(spark.range(2000 + i))
    p2 = scoped_persist(spark.range(7), pool="clf_parse")
    assert p1 is p2  # not evicted by default-pool churn
    for i in range(registry._MAX_POOLED_CACHES + 2):
        scoped_persist(spark.range(3000 + i), pool="clf_parse")
    assert (
        len(registry._POOLED_CACHES["clf_parse"])
        == registry._MAX_POOLED_CACHES
    )
    release_scoped_caches()
    assert not registry._POOLED_CACHES
    assert len(registry._SCOPED_CACHES) == 0


def test_prefix_filter_bounds_ubiquitous_shingle_bucket(spark):
    # 40 docs all containing one identical 3-gram ("the quick fox" header)
    # but otherwise pairwise-disjoint. The naive inverted-index self-join
    # makes a 40²/2-pair bucket from that one posting list; the
    # df-ascending prefix filter must rank the ubiquitous shingle last,
    # drop it from every prefix, and emit ZERO candidates — while planted
    # true dups (sharing RARE shingles) must still be found.
    from tdk_apache_log_etl_spark.operators.dedup import (
        exact_jaccard_pairs,
        prefix_candidates,
    )

    n = 40
    rows = [
        (i, f"the quick fox a{i} b{i} c{i} d{i} e{i} f{i} g{i} h{i}")
        for i in range(n)
    ]
    # docs 100/101: exact dups of each other, still carrying the header
    dup = "the quick fox same same2 same3 same4 same5 same6 same7 same8"
    rows += [(100, dup), (101, dup)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    sh = shingle_frame(docs, n_partitions=4)

    cands = {(r.doc_a, r.doc_b) for r in prefix_candidates(sh, 0.5).collect()}
    assert cands == {(100, 101)}  # bounded: not ~800 header-bucket pairs

    pairs = {(r.doc_a, r.doc_b) for r in exact_jaccard_pairs(sh, 0.5).collect()}
    assert pairs == {(100, 101)}


def test_pair_strategies_agree(spark):
    # The adaptive strategy switch must be invisible to results: the
    # direct inverted-index count and the prefix-filter + verify paths
    # produce identical pair sets and identical Jaccard values.
    from tdk_apache_log_etl_spark.operators.dedup import (
        _direct_jaccard_pairs,
        exact_jaccard,
        prefix_candidates,
    )
    from tdk_apache_log_etl_spark.sources.tables import load_table

    from .conftest import SF_DIR_CORRECT

    docs = load_table(spark, SF_DIR_CORRECT, "documents").limit(150)
    sh = shingle_frame(docs)
    direct = {
        (r.doc_a, r.doc_b, round(r.jaccard, 9))
        for r in _direct_jaccard_pairs(sh, 0.5).collect()
    }
    via_prefix = {
        (r.doc_a, r.doc_b, round(r.jaccard, 9))
        for r in exact_jaccard(prefix_candidates(sh, 0.5), sh)
        .filter(F.col("jaccard") >= 0.5)
        .collect()
    }
    assert direct == via_prefix


def test_exact_jaccard_pairs_matches_bruteforce(spark):
    # recall-1.0 claim: the inverted-index pair join must find exactly the
    # pairs a brute-force array_intersect over ALL pairs finds.
    from pyspark.sql import functions as F

    from tdk_apache_log_etl_spark.operators.dedup import exact_jaccard_pairs
    from tdk_apache_log_etl_spark.sources.tables import load_table

    from .conftest import SF_DIR_CORRECT

    docs = load_table(spark, SF_DIR_CORRECT, "documents").limit(120)
    sh_df = shingle_frame(docs)
    got = {
        (r.doc_a, r.doc_b)
        for r in exact_jaccard_pairs(sh_df, 0.5).collect()
    }
    a = sh_df.withColumnsRenamed({"doc_id": "doc_a", "sh": "sh_a"})
    b = sh_df.withColumnsRenamed({"doc_id": "doc_b", "sh": "sh_b"})
    brute = (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn(
            "j",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("j") >= 0.5)
    )
    want = {(r.doc_a, r.doc_b) for r in brute.collect()}
    assert got == want


def test_span_dedup_drops_repeated_span_keeps_first(spark, tmp_path):
    from tdk_apache_log_etl_spark.operators.dedup import SPAN_W
    from tdk_apache_log_etl_spark.sources.tables import load_table

    # doc 0 and doc 1 share an identical first span (exactly SPAN_W
    # tokens); doc 1's copy must drop, doc 0's must survive, and doc 1
    # keeps its distinct tail.
    shared = " ".join(f"s{i}" for i in range(SPAN_W))
    tail = " ".join(f"t{i}" for i in range(SPAN_W))
    import pandas as pd

    pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": [shared, shared + " " + tail],
            "lang": ["en", "en"],
            "source": ["src0", "src0"],
            "n_chars": [len(shared), len(shared) + 1 + len(tail)],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    rows = {
        r.doc_id: r
        for r in QUERIES["span_dedup_rebuild"](spark, str(tmp_path)).collect()
    }
    assert rows[0].n_kept == 1 and rows[0].new_text == shared
    assert rows[1].n_chunks == 2 and rows[1].n_kept == 1
    assert rows[1].new_text == tail


def test_containment_detects_quote_one_direction_only(spark, tmp_path):
    # Doc 1 is a verbatim 10-word quote from the 30-word doc 0: every one
    # of its 6 5-grams appears in doc 0 -> C(1->0) = 1.0; doc 0 shares
    # only those 6 of its 26 grams -> C(0->1) = 6/26 < 1/2, so the
    # reverse pair must NOT appear. Doc 2 never pairs.
    import pandas as pd

    words = [f"w{i}" for i in range(30)]
    texts = {
        0: " ".join(words),
        1: " ".join(words[12:22]),
        2: " ".join(f"z{i}" for i in range(20)),
    }
    pd.DataFrame(
        {
            "doc_id": list(texts),
            "text": list(texts.values()),
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [len(t) for t in texts.values()],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    rows = QUERIES["doc_containment_pairs"](spark, str(tmp_path)).collect()
    by_pair = {(r.src_doc_id, r.dst_doc_id): r for r in rows}
    assert set(by_pair) == {(1, 0)}
    r = by_pair[(1, 0)]
    assert (r.shared_ngrams, r.src_ngrams, r.containment) == (6, 6, 1.0)

    from tdk_apache_log_etl_spark.operators import ORACLES

    from .parity import compare

    ok, detail = compare(
        spark,
        "doc_containment_pairs",
        QUERIES["doc_containment_pairs"],
        ORACLES["doc_containment_pairs"],
        str(tmp_path),
    )
    assert ok, detail


def test_deletion_pairs_substitution_and_suffix(spark, tmp_path):
    # widget/widgit differ by ONE substitution (both delete to "widgt");
    # widget/widgets by one trailing insertion (widgets' deletion IS
    # widget). gadget is >=2 away from everything -> absent. Duplicate
    # "widget" rows collapse into one vocabulary entry with n_parts=2.
    import pandas as pd

    rows = [
        (1, "widget"),
        (2, "widget"),
        (3, "widgit"),
        (4, "widgets"),
        (5, "gadget"),
    ]
    pd.DataFrame(rows, columns=["p_partkey", "p_name"]).to_parquet(
        tmp_path / "part.parquet"
    )
    out = {
        (r.name_a, r.name_b): (r.n_parts_a, r.n_parts_b, r.edit_distance)
        for r in QUERIES["part_name_deletion_pairs"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out == {
        ("widget", "widgets"): (2, 1, 1),
        ("widget", "widgit"): (2, 1, 1),
    }
    from tdk_apache_log_etl_spark.operators import ORACLES

    from .parity import compare

    ok, detail = compare(
        spark,
        "part_name_deletion_pairs",
        QUERIES["part_name_deletion_pairs"],
        ORACLES["part_name_deletion_pairs"],
        str(tmp_path),
    )
    assert ok, detail


def test_snm_pairs_neighbors_within_window(spark, tmp_path):
    import pandas as pd

    # sorted order: [anvil red, anvil rod, zeta box]; only the adjacent
    # anvil pair is within edit distance 3 — found WITHOUT any blocking
    # attribute (SNM's point vs the brand/type-blocked E14 matcher)
    pd.DataFrame(
        {
            "p_partkey": [1, 2, 3, 4],
            "p_name": ["anvil red", "anvil rod", "zeta box", "anvil red"],
            "p_brand": ["B1", "B2", "B3", "B4"],
            "p_type": ["t"] * 4,
        }
    ).to_parquet(tmp_path / "part.parquet")
    from tdk_apache_log_etl_spark.operators import ORACLES, QUERIES

    from .parity import compare

    rows = QUERIES["snm_part_name_pairs"](spark, str(tmp_path)).collect()
    assert [(r.name_a, r.name_b, r.rank_gap, r.edit_dist) for r in rows] == [
        ("anvil red", "anvil rod", 1, 1)
    ]
    ok, detail = compare(
        spark,
        "snm_part_name_pairs",
        QUERIES["snm_part_name_pairs"],
        ORACLES["snm_part_name_pairs"],
        str(tmp_path),
    )
    assert ok, detail


def test_simhash_banding_equals_bruteforce(spark):
    """The 4-chunk banding is EXACT for hamming <= 3 by pigeonhole —
    the full oracle for simhash_neardup rests on this equality, so pin
    it structurally on the planted corpus (dup pair at hamming 0, near
    pair within a few bits)."""
    from tdk_apache_log_etl_spark.operators.dedup import (
        SIMHASH_MAX_HAMMING,
        simhash_column,
    )

    docs = _planted_docs(spark)
    fp = {r.doc_id: r.simhash for r in simhash_column(docs).collect()}
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")
    brute = {
        (a, b): ham(fp[a], fp[b])
        for a in fp
        for b in fp
        if a < b and ham(fp[a], fp[b]) <= SIMHASH_MAX_HAMMING
    }
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        docs.write.parquet(f"{td}/documents.parquet")
        from tdk_apache_log_etl_spark.operators import QUERIES

        got = {
            (r.doc_a, r.doc_b): r.hamming
            for r in QUERIES["simhash_neardup"](spark, td).collect()
        }
    assert got == brute
    assert got[(0, 3)] == 0  # exact text dup -> identical fingerprint


def test_sha256_simhash_matches_pure_python(spark):
    """The DuckDB oracle recomputes the fingerprint from sha256 hex —
    anchor the Spark UDF to the same reference computation in pure
    Python so a quiet UDF change breaks HERE, not at the driver."""
    import hashlib

    from tdk_apache_log_etl_spark.operators.dedup import (
        SIMHASH_BITS,
        simhash_column,
    )

    docs = _planted_docs(spark)
    got = {r.doc_id: r.simhash for r in simhash_column(docs).collect()}

    def ref(text):
        acc = [0] * SIMHASH_BITS
        for tok in text.split(" "):
            h = int.from_bytes(hashlib.sha256(tok.encode()).digest()[:8], "big")
            for i in range(SIMHASH_BITS):
                acc[i] += 1 if (h >> i) & 1 else -1
        v = 0
        for i in range(SIMHASH_BITS):
            if acc[i] > 0:
                v |= 1 << i
        return v - (1 << 64) if v >= (1 << 63) else v

    for r in docs.collect():
        assert got[r.doc_id] == ref(r.text)


def test_simhash_chunked_expansion_invariant(spark, monkeypatch):
    """The UDF expands token hashes to a (tokens, 64) bit matrix in
    memory-bounded doc chunks; fingerprints must not depend on where the
    chunk boundaries fall. Shrink the budget below every planted doc's
    token count (forcing one-doc chunks AND multi-chunk batches) and pin
    equality with the default single-chunk path — include an empty doc
    so zero-length segments cross boundaries too."""
    from tdk_apache_log_etl_spark.operators import dedup as dd

    docs = _planted_docs(spark).unionByName(
        spark.createDataFrame([(99, "")], ["doc_id", "text"])
    )
    base = {r.doc_id: r.simhash for r in simhash_column(docs).collect()}
    monkeypatch.setattr(dd, "SIMHASH_UDF_CHUNK_TOKENS", 3)
    tiny = {r.doc_id: r.simhash for r in dd.simhash_column(docs).collect()}
    assert tiny == base
    assert tiny[99] == 0


def test_ngram_jaccard_pairs_complete_at_threshold(spark, tmp_path):
    """ngram_jaccard_pairs is COMPLETE (exact inverted-index recall 1.0)
    at 0.3 — the planted near pair and the exact dup must both appear,
    the unrelated doc must not."""
    from tdk_apache_log_etl_spark.operators import QUERIES

    docs = _planted_docs(spark)
    docs.write.parquet(f"{tmp_path}/documents.parquet")
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in QUERIES["ngram_jaccard_pairs"](spark, str(tmp_path)).collect()
    }
    assert got[(0, 3)] == 1.0
    assert (0, 1) in got and 0.3 <= got[(0, 1)] < 1.0
    assert not any(2 in p for p in got)
