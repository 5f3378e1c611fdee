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
