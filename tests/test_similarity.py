"""Similarity-search quality: LSH recall vs the exact brute-force baseline,
and centroid sanity."""

from __future__ import annotations

from tdk_apache_log_etl_spark.operators import QUERIES

from .conftest import SF_DIR_SMOKE


def test_lsh_results_subset_of_corpus_and_ranked(spark):
    rows = QUERIES["ann_lsh_topk"](spark, SF_DIR_SMOKE).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        ranks = sorted(x.rank for x in rs)
        assert ranks == list(range(1, len(rs) + 1))
        cosines = [x.cosine for x in sorted(rs, key=lambda x: x.rank)]
        assert cosines == sorted(cosines, reverse=True)


def test_lsh_recall_vs_bruteforce(spark):
    exact = QUERIES["cosine_topk_bruteforce"](spark, SF_DIR_SMOKE).collect()
    approx = QUERIES["ann_lsh_topk"](spark, SF_DIR_SMOKE).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    # single-table 16-bit LSH is coarse; require it to find SOME true
    # neighbors overall without ever inventing non-corpus ids
    hits = sum(
        len(exact_sets[q] & approx_sets.get(q, set())) for q in exact_sets
    )
    assert hits >= 1
    corpus_ids = set(range(0, 500))
    assert all(r.neighbor_id in corpus_ids for r in approx)


def test_centroids_cover_all_labels_and_dims(spark):
    rows = QUERIES["embedding_centroid_by_label"](spark, SF_DIR_SMOKE).collect()
    labels = {r.label for r in rows}
    poss = {r.pos for r in rows}
    assert poss == set(range(1, 65))
    assert len(rows) == len(labels) * 64
