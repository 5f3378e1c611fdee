"""Mechanical COVERAGE.md completeness check (round-5 verdict item 5):
every extension-operator label E1..E246 declared in SURVEY.md §2 must
appear in COVERAGE.md, and every query name COVERAGE.md cites in
backticks must exist in the registry — so the row→query→test map the
file promises is actually checkable, and a future SURVEY addition
without a COVERAGE row fails here instead of rotting silently."""

from __future__ import annotations

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _labels(path: str) -> set[int]:
    text = open(os.path.join(REPO, path)).read()
    return set(map(int, re.findall(r"\bE(\d{1,3})\b", text)))


def test_every_survey_e_label_has_a_coverage_row():
    survey = _labels("SURVEY.md")
    coverage = _labels("COVERAGE.md")
    assert survey, "SURVEY.md lost its E-labels?"
    missing = sorted(survey - coverage)
    assert not missing, (
        f"SURVEY.md E-labels with no COVERAGE.md row: {missing}"
    )
    phantom = sorted(coverage - survey)
    assert not phantom, (
        f"COVERAGE.md cites E-labels SURVEY.md never declared: {phantom}"
    )


def test_coverage_cited_queries_exist_in_registry():
    from tdk_apache_log_etl_spark.operators import QUERIES

    text = open(os.path.join(REPO, "COVERAGE.md")).read()
    cited = set(re.findall(r"`([a-z0-9_]+)`", text))
    # only names that LOOK like registry keys (snake_case, no dots) and
    # are not module/file/constant references
    candidates = {c for c in cited if c in QUERIES}
    # sanity: the map is real — a healthy COVERAGE.md cites most of the
    # registry; a gutted rewrite would trip this
    assert len(candidates) >= 200, (
        f"COVERAGE.md cites only {len(candidates)} registered queries"
    )
    # and no cited snake_case name that closely resembles a query is a
    # typo: any cited name ending in a registry-style suffix must be a
    # real query, a registry module, or a known non-query identifier
    suffixes = ("_floor", "_neardup", "_rebuild", "_rollup", "_topk")
    lookalikes = {
        c for c in cited if c.endswith(suffixes) and c not in QUERIES
    }
    assert not lookalikes, f"COVERAGE.md cites unknown queries: {lookalikes}"


def test_eager_build_registry_names_are_real():
    """EAGER_BUILD is the central map of queries whose construction runs
    Spark jobs (ADVICE r9: one place, not per-docstring notes); a rename
    that orphans an entry should fail here, not silently de-annotate."""
    from tdk_apache_log_etl_spark.operators import EAGER_BUILD, QUERIES

    unknown = EAGER_BUILD - set(QUERIES)
    assert not unknown, f"EAGER_BUILD names not in registry: {unknown}"
    # the iterative-core members can't quietly drop out either
    for must in (
        "kcore_part_graph",
        "dedup_cluster_canonical",
        "embedding_top_eigenvector",
        "semdedup_prune",
    ):
        assert must in EAGER_BUILD
