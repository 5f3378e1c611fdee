"""Cross-query invariants (SURVEY.md §5 property tests): metrics that must
agree with each other regardless of implementation details."""

from __future__ import annotations

from pyspark.sql import functions as F

from tdk_apache_log_etl_spark.operators import QUERIES

from .conftest import SF_DIR_SMOKE


def test_requests_sum_equals_total_count(spark):
    per_user = QUERIES["clf_requests_per_user"](spark, SF_DIR_SMOKE)
    summary = QUERIES["clf_daily_summary"](spark, SF_DIR_SMOKE).collect()[0]
    total = per_user.agg(F.sum("requests_count")).collect()[0][0]
    assert total == summary.total_requests


def test_user_count_equals_distinct_of_groupby(spark):
    per_user = QUERIES["clf_requests_per_user"](spark, SF_DIR_SMOKE)
    summary = QUERIES["clf_daily_summary"](spark, SF_DIR_SMOKE).collect()[0]
    # group-by keys of the per-user frame ARE the distinct users
    assert per_user.count() == summary.user_count


def test_dedup_counts_consistent(spark):
    uniq = QUERIES["dedup_unique_counts"](spark, SF_DIR_SMOKE).collect()[0]
    survivors = QUERIES["dedup_exact_docs"](spark, SF_DIR_SMOKE)
    assert survivors.count() == uniq.unique_texts
    n_copies_total = survivors.agg(F.sum("n_copies")).collect()[0][0]
    assert n_copies_total == uniq.total_docs


def test_dedup_idempotent(spark):
    survivors = QUERIES["dedup_exact_docs"](spark, SF_DIR_SMOKE)
    # dedup of the survivor set changes nothing
    again = survivors.groupBy("doc_id").count().filter("count > 1")
    assert again.count() == 0


def test_histogram_covers_all_rows(spark):
    hist = QUERIES["events_value_histogram"](spark, SF_DIR_SMOKE)
    prof = {r.column_name: r for r in
            QUERIES["events_null_profile"](spark, SF_DIR_SMOKE).collect()}
    assert hist.agg(F.sum("n")).collect()[0][0] == (
        prof["value"].n_rows - prof["value"].n_nulls
    )


def test_cube_marginals_match_base_groupby(spark):
    cube = QUERIES["cube_orders_status_priority"](spark, SF_DIR_SMOKE)
    grand = cube.filter("g_status = 1 AND g_priority = 1").collect()[0]
    base = cube.filter("g_status = 0 AND g_priority = 0")
    assert base.agg(F.sum("n_orders")).collect()[0][0] == grand.n_orders
