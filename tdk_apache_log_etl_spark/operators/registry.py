"""Query/oracle registry backing ``__spark_entry__.queries()`` /
``oracle_sql()``.

Each registered query is a callable ``(spark, sf_dir) -> DataFrame``; the
optional oracle is the equivalent ANSI SQL that DuckDB runs on the same
parquet tables. Column names AND values are designed to match exactly
(see operators/numeric.py for the determinism rules).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

#: Bounded keyed cache for persist()ed intermediates. Several operators
#: persist() frames that multiple plan branches reuse (shingle frames,
#: LSH bands, the Q15 revenue view); the cache must outlive the query
#: function (the caller runs the action), so it can't be
#: try/finally-scoped inside — but without ANY cleanup a long-lived
#: session accumulates cached blocks until executor storage fills.
#: Policy: key by the frame's semantic hash so back-to-back queries over
#: the SAME corpus reuse one materialization (the minhash → cluster
#: sequence re-shingling the identical documents table is pure waste),
#: and evict least-recently-used beyond a small cap so total cached
#: storage stays bounded however many queries the session runs.
_SCOPED_CACHES: dict[object, DataFrame] = {}
#: Raised 4 → 6 in round 3: the graph family (shared edge relation),
#: distributed-quantile selection, and the dedup/similarity pipelines now
#: all hold scoped frames; at 4 the LRU thrashed between back-to-back
#: bench queries. Still bounded — six sf-scale intermediates, not facts.
_MAX_SCOPED_CACHES = 6

#: Named cache pools (round 9): a high-reuse staging frame (the parsed
#: CLF corpus, read by 15 clf_* queries scattered across the bench) was
#: evicted from the shared LRU by the ~270 intervening queries' staging
#: frames, so late readers re-paid the full parse materialization.  A
#: pool gives such a frame its own small LRU that only same-pool frames
#: can evict — still bounded (pool cap × frame size), never global.
_POOLED_CACHES: dict[str, dict[object, DataFrame]] = {}
_MAX_POOLED_CACHES = 2  # per pool: at most (bench sf, correctness sf)


def scoped_persist(df: DataFrame, pool: str | None = None) -> DataFrame:
    """persist() with bounded lifetime: semantically-identical frames
    share one cached materialization; least-recently-used entries are
    unpersisted beyond a small cap (or all at once via
    release_scoped_caches).  ``pool`` names an isolated LRU (own cap)
    for frames that must survive unrelated queries' cache pressure."""
    caches = (
        _POOLED_CACHES.setdefault(pool, {})
        if pool is not None
        else _SCOPED_CACHES
    )
    cap = _MAX_POOLED_CACHES if pool is not None else _MAX_SCOPED_CACHES
    try:
        key: object = df.semanticHash()
    except Exception:  # pragma: no cover - defensive: hash is best-effort
        key = object()
    if key in caches:
        cached = caches.pop(key)
        caches[key] = cached  # re-insert = mark most recent
        return cached
    df = df.persist()
    caches[key] = df
    while len(caches) > cap:
        oldest = next(iter(caches))
        caches.pop(oldest).unpersist()
    return df


def release_scoped_caches() -> None:
    while _SCOPED_CACHES:
        k = next(iter(_SCOPED_CACHES))
        _SCOPED_CACHES.pop(k).unpersist()
    for pool in list(_POOLED_CACHES):
        caches = _POOLED_CACHES.pop(pool)
        while caches:
            k = next(iter(caches))
            caches.pop(k).unpersist()


#: Queries whose DataFrame CONSTRUCTION intentionally runs Spark jobs
#: (driver-coordinated fixpoints, trained quantizers, collected sketch/
#: scalar frames, recursive-CTE seeds) instead of returning a purely
#: lazy plan. Centralized so tooling — plan lints, build-time audits,
#: Connect smokes — can distinguish an expected eager build from a
#: plan-building regression without reading per-function docstrings.
#: Membership is validated against QUERIES in tests/test_coverage_doc.py.
EAGER_BUILD: frozenset[str] = frozenset(
    {
        # iterative graph fixpoints (per-round localCheckpoint + count)
        "bfs_reach_part_graph",
        "lpa_communities_part_graph",
        "kcore_part_graph",
        "kcore_invariant_audit",
        "hits_purchase_graph",
        "weighted_sssp_part_graph",
        "hub_closeness_centrality",
        "ktruss_part_graph",
        # connected-components dedup loop
        "dedup_cluster_canonical",
        # trained quantizers / collected gram or pick frames
        "ann_ivf_topk",
        "ann_pq_topk",
        "ann_ivf_recall_floor",
        "ann_pq_recall_floor",
        "semdedup_prune",
        # corpus count prices the occupancy-adaptive LSH width
        "embedding_cosine_neardup",
        "semdedup_invariant_audit",
        "embedding_neardup_audit",
        "embedding_top_eigenvector",
        "greedy_coverage_select",
        "greedy_coverage_audit",
        # iterative BPE trainer
        "bpe_train_merges",
        "bpe_first_merge",
        # driver-held sketches / collected scalar frames
        "cms_user_frequency",
        "join_size_estimate_cms",
        "heavy_hitter_ngrams",
        "poisson_bootstrap_value_ci",
        "markov_attribution_removal",
        # recursive-CTE seed checkpointing
        "order_chains_recursive_sql",
    }
)


def query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
