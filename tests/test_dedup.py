"""Quality tests for the dedup family: planted near-duplicates must be
found, unrelated documents must not pair, survivors are deterministic."""

from __future__ import annotations

from pyspark.sql import functions as F

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
