"""Planted-case semantics for the hygiene operators: a known
contaminated document must be flagged (and only it), and the blocklist
scrub must strip exactly the blocked tokens."""

from __future__ import annotations

import pytest

from tdk_apache_log_etl_spark.operators import QUERIES


@pytest.fixture()
def planted_docs_dir(spark, tmp_path):
    """A documents.parquet with one probe doc (id % 7 == 0), one doc
    sharing the probe's 8-gram, and one clean doc."""
    probe_gram = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        # doc 7: probe (7 % 7 == 0)
        (7, f"start {probe_gram} end", "en", "web", 0),
        # doc 8: contains the probe's 8-gram verbatim → contaminated
        (8, f"other words then {probe_gram} trailing", "en", "web", 0),
        # doc 9: same vocabulary, different order → no shared 8-gram
        (9, "theta eta zeta epsilon delta gamma beta alpha pad pad", "en", "web", 0),
        # doc 10: too short for any 8-gram → must not crash, not match
        (10, "tiny doc", "en", "web", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_decontaminate_flags_planted_overlap(spark, planted_docs_dir):
    got = {
        r.doc_id: r.n_hits
        for r in QUERIES["benchmark_decontaminate"](
            spark, planted_docs_dir
        ).collect()
    }
    assert set(got) == {8}
    assert got[8] == 1  # exactly the one planted 8-gram


def test_blocklist_scrub_strips_exactly_blocked_tokens(spark, tmp_path):
    rows = [
        # 2 blocked of 10 tokens → ratio 0.2 > 0.05 → dropped
        (1, "slow query on a big table with eight more words", "en", "w", 0),
        # no blocked tokens → kept, text unchanged
        (2, "fast query on a small table", "en", "w", 0),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {
        r.doc_id: r
        for r in QUERIES["blocklist_scrub"](spark, str(tmp_path)).collect()
    }
    assert got[1].n_blocked == 2
    assert got[1].dropped
    assert got[1].clean_text == "query on a table with eight more words"
    assert got[2].n_blocked == 0
    assert not got[2].dropped
    assert got[2].clean_text == "fast query on a small table"


# --------------------------------------------------------------------------
# E242 greedy coverage selection: python-mirror pin + submodularity
# --------------------------------------------------------------------------


def _coverage_mirror(texts, k):
    sets = {}
    for doc_id, text in texts:
        ws = [w for w in text.split(" ") if w]
        sets[doc_id] = set(zip(ws, ws[1:]))
    covered, out = set(), []
    for rank in range(1, k + 1):
        best = None
        for doc_id in sorted(sets):
            gain = len(sets[doc_id] - covered)
            if best is None or gain > best[1]:
                best = (doc_id, gain)
        if best is None or best[1] == 0:
            break
        covered |= sets[best[0]]
        out.append((rank, best[0], best[1], len(covered)))
    return out


def test_greedy_coverage_matches_python_mirror(spark, tmp_path):
    import pandas as pd

    texts = [
        (1, "a b c d"),          # bigrams {ab, bc, cd}
        (2, "a b c d e f"),      # superset of 1 + {de, ef}
        (3, "x y x y"),          # {xy, yx}
        (4, "c d e f"),          # subset of 2
        (5, "p q"),              # {pq}
    ]
    pd.DataFrame(
        {
            "doc_id": [t[0] for t in texts],
            "text": [t[1] for t in texts],
            "lang": ["en"] * 5,
            "source": ["s"] * 5,
            "n_chars": [len(t[1]) for t in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    from tdk_apache_log_etl_spark.operators import QUERIES

    got = [
        (r.rank, r.doc_id, r.new_tokens, r.cum_covered)
        for r in QUERIES["greedy_coverage_select"](
            spark, str(tmp_path)
        ).collect()
    ]
    assert got == _coverage_mirror(texts, 10)
    # doc 2 first (5 bigrams), then 3 (2 new), then 5 (1); docs 1 and 4
    # add nothing and must never be picked
    assert [g[1] for g in got] == [2, 3, 5]


def test_greedy_coverage_gains_are_submodular(spark):
    from tdk_apache_log_etl_spark.operators import QUERIES

    from .conftest import SF_DIR_SMOKE

    rows = QUERIES["greedy_coverage_select"](spark, SF_DIR_SMOKE).collect()
    gains = [r.new_tokens for r in rows]
    assert gains == sorted(gains, reverse=True)  # diminishing returns
    assert rows[-1].cum_covered == sum(gains)
    for r in rows:
        assert 0 < r.coverage_frac <= 1.0


def test_dedup_savings_hand_computed(spark, tmp_path):
    import pandas as pd

    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["a b", "a b", "c"],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [3, 3, 1],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    from tdk_apache_log_etl_spark.operators import ORACLES, QUERIES

    from .parity import compare

    r = QUERIES["dedup_savings_report"](spark, str(tmp_path)).collect()[0]
    assert (r.n_docs, r.n_docs_unique) == (3, 2)
    assert (r.n_tokens, r.n_tokens_unique) == (5, 3)
    assert r.token_savings_frac == 0.4  # the duplicate "a b" copy
    ok, detail = compare(
        spark,
        "dedup_savings_report",
        QUERIES["dedup_savings_report"],
        ORACLES["dedup_savings_report"],
        str(tmp_path),
    )
    assert ok, detail


def test_greedy_coverage_ignores_null_text_docs(spark, tmp_path):
    # ADVICE r6: NULL text must not surface as a NULL-gain winner (the
    # old explode-based pairs frame dropped such docs implicitly; the
    # per-doc-set frame must drop them explicitly)
    import pandas as pd

    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["a b c", None, "a b"],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [5, 0, 3],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    from tdk_apache_log_etl_spark.operators import QUERIES

    rows = QUERIES["greedy_coverage_select"](spark, str(tmp_path)).collect()
    assert [r.doc_id for r in rows] == [1]  # doc 3's bigram ⊂ doc 1's
    assert all(r.new_tokens > 0 for r in rows)


def test_greedy_coverage_small_corpus_exhausts_cleanly(spark, tmp_path):
    # ADVICE r7: fewer docs than COVERAGE_K, every one with positive
    # gain and pairwise-disjoint bigram sets — the candidate scan must
    # stop when the list is exhausted, not append a (None, -1) pick and
    # crash on covered.update(None).
    import pandas as pd

    texts = [(i, f"w{i}a w{i}b w{i}c") for i in range(1, 6)]  # 5 < K=10
    pd.DataFrame(
        {
            "doc_id": [t[0] for t in texts],
            "text": [t[1] for t in texts],
            "lang": ["en"] * 5,
            "source": ["s"] * 5,
            "n_chars": [len(t[1]) for t in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    from tdk_apache_log_etl_spark.operators import QUERIES

    rows = QUERIES["greedy_coverage_select"](spark, str(tmp_path)).collect()
    got = [(r.rank, r.doc_id, r.new_tokens, r.cum_covered) for r in rows]
    assert got == _coverage_mirror(texts, 10)
    assert len(rows) == 5  # all five picked, then clean stop
    assert rows[-1].coverage_frac == 1.0


def test_decontaminate_probe_multiplicity_capped(spark, tmp_path):
    # SCALE CONTRACT pin: the probe build side is DISTINCT, so a gram
    # occurring in MANY probe docs (and many times within them) must
    # neither fan the join out nor change n_hits — kill the distinct
    # and this corpus would output p x the gram's corpus occurrences.
    gram = "alpha beta gamma delta epsilon zeta eta theta"
    rows = []
    for k in range(10):  # 10 probe docs, each carrying the gram twice
        rows.append((7 * (k + 1), f"{gram} filler{k} {gram}", "en", "w", 0))
    # one corpus doc with the gram 3 times (distinct 8-grams though:
    # only the repeated verbatim gram is shared)
    rows.append((8, f"{gram} x {gram} y {gram}", "en", "w", 0))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    res = QUERIES["benchmark_decontaminate"](spark, str(tmp_path))
    got = {r.doc_id: r.n_hits for r in res.collect()}
    # n_hits counts DISTINCT shared grams; probe multiplicity (10 docs
    # x 2 copies) must not inflate it
    assert got[8] >= 1
    assert got[8] <= 8 * 2 + 1  # bounded by doc 8's own distinct grams
    # and the plan carries the cap: an ng-keyed aggregate (the
    # distinct) sits under the join build side
    plan = res._jdf.queryExecution().executedPlan().toString()
    import re

    assert re.search(r"HashAggregate.*keys=\[ng", plan), plan[:2000]


def test_greedy_coverage_audit_small_and_planted(spark, tmp_path):
    # Same 5-doc disjoint corpus as the exhaustion test: every invariant
    # must hold, first pick is doc 1 (ties broken doc_id-asc at tot=2),
    # and the oracle mirror must hash-match on a planted corpus.
    import pandas as pd

    texts = [(i, f"w{i}a w{i}b w{i}c") for i in range(1, 6)]
    pd.DataFrame(
        {
            "doc_id": [t[0] for t in texts],
            "text": [t[1] for t in texts],
            "lang": ["en"] * 5,
            "source": ["s"] * 5,
            "n_chars": [len(t[1]) for t in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    from tdk_apache_log_etl_spark.operators import ORACLES, QUERIES

    from .parity import compare

    r = QUERIES["greedy_coverage_audit"](spark, str(tmp_path)).collect()[0]
    assert (r.vocab_total, r.first_doc_id, r.first_gain) == (10, 1, 2)
    assert r.first_pick_ok and r.gains_monotone_ok
    assert r.cum_consistent_ok and r.union_matches_ok and r.stop_ok
    ok, detail = compare(
        spark,
        "greedy_coverage_audit",
        QUERIES["greedy_coverage_audit"],
        ORACLES["greedy_coverage_audit"],
        str(tmp_path),
    )
    assert ok, detail
