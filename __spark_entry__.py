"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's three metrics in
one scan) on sf0.001. ``queries()`` / ``oracle_sql()`` expose every
implemented operator from SURVEY.md §2 with its DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tdk_apache_log_etl_spark.operators import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's whole analytical output — user_count,
    total_successful_requests, total_requests (sree-etl-tdk-glue-job.py:52-63)
    — computed in ONE scan + one aggregate (SURVEY.md §7.2)."""
    return QUERIES["clf_daily_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every SQL-expressible query.

    Keys absent here (minhash_lsh_neardup, simhash_neardup,
    ngram_jaccard_pairs, ann_lsh_topk, ann_ivf_topk,
    embedding_cosine_neardup, image_feature_extract, image_resize,
    media_frame_sample, clf_user_count_approx,
    events_value_percentiles_approx) are genuinely non-SQL-expressible
    (LSH/sketches/iterative k-means/stubs) → driver's rows-only check.
    """
    return dict(ORACLES)
