"""Behavior tests for the privacy operators (oracle parity is covered by
test_oracle_parity): redaction completeness, pseudonym stability."""

from __future__ import annotations

import re

from tdk_apache_log_etl_spark.operators import QUERIES
from tdk_apache_log_etl_spark.operators.privacy import (
    EMAIL_RX,
    IPV4_RX,
    PHONE_RX,
)

from .conftest import SF_DIR_CORRECT


def test_pii_scrub_removes_every_match(spark):
    rows = QUERIES["pii_scrub"](spark, SF_DIR_CORRECT).collect()
    assert rows
    email = re.compile(EMAIL_RX)
    ipv4 = re.compile(IPV4_RX)
    phone = re.compile(PHONE_RX)
    for r in rows:
        # every planted category was found at least once...
        assert r.n_emails >= 1 and r.n_ips >= 1 and r.n_phones >= 1
        # ...and nothing matchable survives in the clean text
        assert not email.search(r.clean_text)
        assert not ipv4.search(r.clean_text)
        assert not phone.search(r.clean_text)
        assert "<EMAIL>" in r.clean_text and "<IP>" in r.clean_text


def test_log_anonymize_truncates_and_pseudonymizes(spark):
    rows = QUERIES["log_anonymize"](spark, SF_DIR_CORRECT).collect()
    assert rows
    pseudo_by_user: dict[str, set] = {}
    for r in rows:
        assert r.ip_anon.endswith(".0")
    # pseudonyms are stable (same user -> same pseudonym) and never the
    # raw id; NULL users stay NULL
    df = QUERIES["log_anonymize"](spark, SF_DIR_CORRECT)
    from pyspark.sql import functions as F

    events = spark.read.parquet(f"{SF_DIR_CORRECT}/events.parquet")
    joined = df.join(events.select("event_id", "user_id"), "event_id")
    n_bad = joined.filter(
        (F.col("user_id").isNotNull() & F.col("user_pseudo").isNull())
        | (F.col("user_id").isNull() & F.col("user_pseudo").isNotNull())
        | (F.col("user_pseudo") == F.col("user_id").cast("string"))
    ).count()
    assert n_bad == 0
    n_pseudo_per_user = (
        joined.filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.countDistinct("user_pseudo").alias("n"))
        .filter(F.col("n") != 1)
        .count()
    )
    assert n_pseudo_per_user == 0


def test_randomized_response_estimator_accuracy(spark):
    # The unbiased estimator must land within 6 estimator-noise sigmas of
    # the TRUE per-day purchase count (σ = 2·√(n·p(1−p)), p=1/4 flip) —
    # a deterministic check here because the md5 coin is fixed.
    from pyspark.sql import functions as F

    from tdk_apache_log_etl_spark.sources.tables import load_table

    est = {
        r.day: r
        for r in QUERIES["randomized_response_purchase_share"](
            spark, SF_DIR_CORRECT
        ).collect()
    }
    truth = {
        r.day: r.true_purchases
        for r in load_table(spark, SF_DIR_CORRECT, "events")
        .groupBy(F.unix_date(F.to_date("ts")).cast("long").alias("day"))
        .agg(
            F.sum(
                (F.col("event_type") == "purchase").cast("long")
            ).alias("true_purchases")
        )
        .collect()
    }
    assert set(est) == set(truth)
    for day, r in est.items():
        sigma = 2 * (r.n_events * 3 / 16) ** 0.5
        assert abs(r.est_purchases - truth[day]) <= 6 * sigma + 2, (
            day, r.est_purchases, truth[day], sigma
        )
        assert 0 - 6 * sigma / r.n_events <= r.est_share <= 1 + 6 * sigma / r.n_events


def test_dp_histogram_noise_is_deterministic_and_bounded(spark, tmp_path):
    # The geometric noise comes from md5(type), so (a) two runs are
    # bit-identical, (b) the noise depends only on the TYPE, not the
    # data: doubling a type's rows shifts n_released by exactly the
    # added rows. |noise| <= 21 by table truncation.
    import datetime as dt

    import pandas as pd

    from tdk_apache_log_etl_spark.operators import ORACLES

    from .parity import compare

    rows = [
        (i, dt.datetime(2026, 5, 1, 9), i, "view", 1.0, "{}")
        for i in range(50)
    ] + [
        (100 + i, dt.datetime(2026, 5, 1, 9), i, "error", 1.0, "{}")
        for i in range(10)
    ]
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    out1 = {
        r.event_type: r
        for r in QUERIES["dp_type_histogram"](spark, str(tmp_path)).collect()
    }
    out2 = {
        r.event_type: r
        for r in QUERIES["dp_type_histogram"](spark, str(tmp_path)).collect()
    }
    assert {t: (r.n_released, r.noise) for t, r in out1.items()} == {
        t: (r.n_released, r.noise) for t, r in out2.items()
    }
    for r in out1.values():
        assert -21 <= r.noise <= 21
        assert r.n_released == (50 if r.event_type == "view" else 10) + r.noise
    ok, detail = compare(
        spark,
        "dp_type_histogram",
        QUERIES["dp_type_histogram"],
        ORACLES["dp_type_histogram"],
        str(tmp_path),
    )
    assert ok, detail


def test_kanon_planner_picks_cheapest_meeting_point(spark, tmp_path):
    import pandas as pd

    # 10 customers, one nation, balances 0..900 in 100 steps: 100-wide
    # bands are all singletons (k_min = 1, fails), 1000-wide bands put
    # everyone in one group (k = 10).  Cheapest meeting point is
    # (loc L0, bal L1) at cost 1.
    pd.DataFrame(
        {
            "c_custkey": range(10),
            "c_nationkey": [0] * 10,
            "c_acctbal": [100.0 * i for i in range(10)],
        }
    ).to_parquet(tmp_path / "customer.parquet")
    pd.DataFrame(
        {"n_nationkey": [0], "n_regionkey": [0], "n_name": ["X"]}
    ).to_parquet(tmp_path / "nation.parquet")
    out = {
        (r.loc_level, r.bal_level): r
        for r in QUERIES["kanon_generalization_plan"](
            spark, str(tmp_path)
        ).collect()
    }
    assert len(out) == 12
    raw = out[(0, 0)]
    assert (raw.k_min, raw.meets_k, raw.chosen) == (1, False, False)
    win = out[(0, 1)]
    assert (win.n_groups, win.k_min, win.cost) == (1, 10, 1)
    assert win.meets_k and win.chosen
    assert sum(1 for r in out.values() if r.chosen) == 1
    from tdk_apache_log_etl_spark.operators import ORACLES

    from .parity import compare

    ok, detail = compare(
        spark,
        "kanon_generalization_plan",
        QUERIES["kanon_generalization_plan"],
        ORACLES["kanon_generalization_plan"],
        str(tmp_path),
    )
    assert ok, detail
