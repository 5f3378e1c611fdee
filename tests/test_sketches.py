"""HLL sketch rollup contracts: accuracy vs exact distinct counts,
mergeability (union-of-parts == sketch-of-whole), and shape.

These replace a DuckDB oracle — DuckDB's approx_count_distinct is a
different estimator, and "exact" is deliberately not what the operator
computes; the contract that matters is bounded error plus exact
mergeability, which is what makes the sketch-table design sound at
100 TB (merging never loses information relative to sketching the
whole)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tdk_apache_log_etl_spark.operators.sketches import (
    ALL,
    build_hll_sketches,
    hll_user_rollup,
)
from tdk_apache_log_etl_spark.sources.tables import load_table

from .conftest import SF_DIR_CORRECT

#: lgK=12 → ~1.6% RSE; 5% is >3σ, so a failure means a real bug,
#: not estimator noise. (At sf0.01 cardinalities the sketch is in exact
#: sparse mode anyway.)
TOL = 0.05


def _exact_rollup(spark):
    events = load_table(spark, SF_DIR_CORRECT, "events")
    facts = events.filter(F.col("user_id").isNotNull()).select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        "user_id",
    )
    detail = facts.groupBy("event_type", "day").agg(
        F.countDistinct("user_id").alias("exact")
    )
    by_type = facts.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact")
    ).withColumn("day", F.lit(ALL))
    total = facts.agg(F.countDistinct("user_id").alias("exact")).select(
        F.lit(ALL).alias("event_type"), F.lit(ALL).alias("day"), "exact"
    )
    out = {}
    for r in detail.collect() + by_type.collect() + total.collect():
        out[(r["event_type"], r["day"])] = r["exact"]
    return out


def test_hll_rollup_accuracy_all_levels(spark):
    # The query now self-reports the accuracy contract (exact count +
    # within_5pct boolean, hash-gated by the driver); this test
    # independently recomputes the exacts and checks every cell's flag.
    exact = _exact_rollup(spark)
    rows = hll_user_rollup(spark, SF_DIR_CORRECT).collect()
    got = {
        (r["event_type"], r["day"]): (r["exact_users"], r["within_5pct"])
        for r in rows
    }
    assert set(got) == set(exact)
    for cell, e in exact.items():
        exact_users, ok = got[cell]
        assert exact_users == e, (cell, exact_users, e)
        assert ok, cell


def test_hll_union_of_parts_equals_sketch_of_whole(spark):
    """Mergeability: rolling daily sketches up must give the SAME state
    (hence the same estimate) as sketching the whole table directly —
    the property that lets a nightly sketch table answer ad-hoc ranges
    without rescanning facts."""
    events = load_table(spark, SF_DIR_CORRECT, "events")
    facts = events.filter(F.col("user_id").isNotNull()).select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "user_id"
    )
    daily = build_hll_sketches(facts, ["day"], "user_id")
    merged = daily.agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col("hll"), F.lit(False))
        ).alias("est")
    ).collect()[0]["est"]
    direct = facts.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg("user_id", F.lit(12))
        ).alias("est")
    ).collect()[0]["est"]
    assert merged == direct


def test_hll_rollup_partitioning_invariant(spark):
    """Estimates are a function of the value SET, not the layout: a
    repartitioned input must produce identical sketch estimates."""
    events = load_table(spark, SF_DIR_CORRECT, "events")
    facts = events.filter(F.col("user_id").isNotNull()).select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        "user_id",
    )

    def estimates(df):
        sk = build_hll_sketches(df, ["event_type", "day"], "user_id")
        return {
            (r["event_type"], r["day"]): r["est"]
            for r in sk.select(
                "event_type",
                "day",
                F.hll_sketch_estimate("hll").alias("est"),
            ).collect()
        }

    assert estimates(facts) == estimates(facts.repartition(7, "user_id"))


def test_count_min_probe_within_eps_bound(spark):
    # CMS never undercounts, and overcounts by at most eps·N with
    # probability `confidence`; with a fixed seed over a fixed fixture the
    # check is deterministic. Also: building the sketch from each half of
    # the data and merging must equal the single-pass sketch (the property
    # that makes the build map-side combinable).
    from tdk_apache_log_etl_spark.operators.sketches import (
        CMS_EPS,
        build_count_min,
        cms_user_frequency,
        probe_count_min,
    )

    got = cms_user_frequency(spark, SF_DIR_CORRECT).collect()
    assert len(got) > 0
    events = (
        load_table(spark, SF_DIR_CORRECT, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id")
    )
    for r in got:
        assert r.overcount_ok, r  # never undercounts, ≤ eps·N over

    # mergeability: sketch(half1) ⊕ sketch(half2) == sketch(whole)
    whole = build_count_min(events, "user_id")
    h1 = build_count_min(events.filter(F.col("user_id") % 2 == 0), "user_id")
    h2 = build_count_min(events.filter(F.col("user_id") % 2 == 1), "user_id")
    jvm = spark.sparkContext._jvm
    cms1 = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(h1)
    )
    cms2 = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(h2)
    )
    cms1.mergeInPlace(cms2)
    users = [int(r.user_id) for r in got]
    merged = {u: cms1.estimateCount(u) for u in users}
    single = probe_count_min(whole, users)
    assert merged == single


def test_pure_python_probe_matches_jvm(spark):
    # The production probe is pure Python (no _jvm bridge, Spark Connect
    # safe); this test is the one place the JVM implementation is still
    # invoked — as the reference for the binary format + hash replay.
    from tdk_apache_log_etl_spark.operators.sketches import (
        build_count_min,
        probe_count_min,
    )

    events = (
        load_table(spark, SF_DIR_CORRECT, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id")
    )
    sketch = build_count_min(events, "user_id")
    # present keys, absent keys, negative and huge values exercise the
    # signed-overflow corners of the hash replay
    probes = [int(r.user_id) for r in events.limit(20).collect()]
    probes += [-1, 0, 2**62, -(2**62), 999_999_999_999]
    jvm = spark.sparkContext._jvm
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(sketch)
    )
    expected = {p: cms.estimateCount(p) for p in probes}
    assert probe_count_min(sketch, probes) == expected


def test_kll_rollup_merged_row_covers_all_types(spark):
    from tdk_apache_log_etl_spark.operators.sketches import kll_quantile_rollup

    rows = {r.event_type: r for r in kll_quantile_rollup(spark, SF_DIR_CORRECT).collect()}
    assert "ALL" in rows
    # the merged row's n is the sum of the detail rows' n
    assert rows["ALL"].n == sum(r.n for t, r in rows.items() if t != "ALL")
    # every rank check holds, detail and merged alike
    for r in rows.values():
        assert r.p50_ok and r.p90_ok and r.p99_ok, r


def test_theta_set_ops_exact_mode_on_planted(spark, tmp_path):
    # 30 viewers (u0..u29), 20 purchasers (u20..u39): intersection 10,
    # union 40, view-only 20. Below lgK=12 capacity the theta sketches
    # are in exact mode, so the estimates are exact — the booleans must
    # hold with zero slack in play.
    import pandas as pd

    from tdk_apache_log_etl_spark.operators.sketches import theta_user_set_ops

    rows = [(i, "2026-08-03 10:00:00", u, "view", 1.0, "{}")
            for i, u in enumerate(range(30))]
    rows += [(100 + i, "2026-08-03 11:00:00", u, "purchase", 1.0, "{}")
             for i, u in enumerate(range(20, 40))]
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).assign(ts=lambda d: pd.to_datetime(d.ts)).to_parquet(
        tmp_path / "events.parquet"
    )
    [r] = theta_user_set_ops(spark, str(tmp_path)).collect()
    assert (r.exact_view, r.exact_purchase) == (30, 20)
    assert (r.exact_both, r.exact_view_only, r.exact_union) == (10, 20, 40)
    assert r.inter_ok and r.union_ok and r.diff_ok


def test_misra_gries_summary_bound_and_superset():
    # Pure-Python contract of the per-partition summarizer: on an
    # adversarial stream of MG_K+1 times more junk than signal, split
    # into many small batches, the summary stays ≤ MG_K entries and the
    # truly-heavy key (count > n/(MG_K+1)) always survives with
    # est ≥ count − n/(MG_K+1).
    import pandas as pd

    from tdk_apache_log_etl_spark.operators import sketches as sk

    heavy, n_junk = "HEAVY HEAVY HEAVY", 40_000
    stream = [heavy] * 20 + [f"junk {i} x" for i in range(n_junk)]
    # interleave so the heavy key never dominates one batch
    stream = [x for pair in zip(stream[:20], range(20)) for x in
              (pair[0], f"junk {pair[1]} y")] + stream[20:]
    batches = [
        pd.DataFrame({"ngram": stream[i:i + 1000]})
        for i in range(0, len(stream), 1000)
    ]
    [out] = list(sk._mg_partition_summaries(iter(batches))) or [
        pd.DataFrame({"ngram": [], "est": []})
    ]
    n = len(stream)
    assert len(out) <= sk.MG_K
    if 20 > n / (sk.MG_K + 1):  # heavy by the global threshold
        ests = dict(zip(out["ngram"], out["est"]))
        assert heavy in ests
        assert ests[heavy] >= 20 - n / (sk.MG_K + 1)


def test_heavy_hitters_result_partition_invariant(spark):
    # The exact verify pass makes the answer independent of how the MG
    # candidate stage partitions the corpus: compare against the naive
    # full-shuffle plan on the same data.
    from pyspark.sql import functions as F

    from tdk_apache_log_etl_spark.operators import QUERIES
    from tdk_apache_log_etl_spark.operators.sketches import MG_K
    from tdk_apache_log_etl_spark.sources.tables import load_table

    from .conftest import SF_DIR_CORRECT

    got = {
        (r.ngram, r.cnt)
        for r in QUERIES["heavy_hitter_ngrams"](
            spark, SF_DIR_CORRECT
        ).collect()
    }
    docs = load_table(spark, SF_DIR_CORRECT, "documents")
    tok = (
        docs.select(F.split("text", " ").alias("w"))
        .filter(F.size("w") >= 3)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(w) - 3), "
                    "i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))"
                )
            ).alias("ngram")
        )
    )
    n = tok.count()
    naive = {
        (r.ngram, r["count"])
        for r in tok.groupBy("ngram").count().collect()
        if r["count"] * (MG_K + 1) > n
    }
    assert got == naive and got  # non-degenerate at sf0.01


def test_cms_inner_product_estimates_join_size(spark):
    # estimate-level check (the registered query only emits verdicts):
    # AMS/CMS inner product never undercounts and lands within the
    # ε·N₁·N₂ bound on the real corpus.
    from pyspark.sql import functions as F

    from tdk_apache_log_etl_spark.operators.sketches import (
        CMS_EPS,
        build_count_min,
        cms_inner_product,
    )
    from tdk_apache_log_etl_spark.sources.tables import load_table

    from .conftest import SF_DIR_CORRECT

    ev = load_table(spark, SF_DIR_CORRECT, "events").filter(
        F.col("user_id").isNotNull()
    )
    views = ev.filter(F.col("event_type") == "view").select("user_id")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id")
    vc = views.groupBy("user_id").count().withColumnRenamed("count", "vc")
    pc = purchases.groupBy("user_id").count().withColumnRenamed("count", "pc")
    [r] = vc.join(pc, "user_id").agg(
        F.sum(F.col("vc") * F.col("pc")).alias("exact")
    ).collect()
    exact = int(r.exact)
    n_v, n_p = views.count(), purchases.count()
    est = cms_inner_product(
        build_count_min(views, "user_id"),
        build_count_min(purchases, "user_id"),
    )
    assert exact <= est <= exact + CMS_EPS * n_v * n_p
    # mismatched hash families must be refused, not silently combined
    import pytest as _pytest

    with _pytest.raises(ValueError):
        cms_inner_product(
            build_count_min(views, "user_id"),
            build_count_min(purchases, "user_id", seed=7),
        )


def test_bloom_probe_contract_and_planted(spark, tmp_path):
    import datetime as dt

    import pandas as pd

    from tdk_apache_log_etl_spark.operators import ORACLES, QUERIES

    from .parity import compare

    # users 0..20: exactly {0, 7, 14} are blocklisted (u % 7 == 0);
    # two events each for user 0 and user 1
    rows = []
    eid = 0
    for u in list(range(21)) + [0, 1]:
        rows.append(
            (eid, dt.datetime(2026, 5, 1, 9, 0, eid % 60), u, "view", 1.0, "{}")
        )
        eid += 1
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    [r] = QUERIES["bloom_blocklist_probe"](spark, str(tmp_path)).collect()
    assert r.n_probed == 23
    assert r.n_blocked_exact == 4  # user 0 twice + users 7, 14
    assert r.no_false_negatives  # Bloom guarantee, checked per-row
    assert r.fp_rate_ok
    ok, detail = compare(
        spark,
        "bloom_blocklist_probe",
        QUERIES["bloom_blocklist_probe"],
        ORACLES["bloom_blocklist_probe"],
        str(tmp_path),
    )
    assert ok, detail
