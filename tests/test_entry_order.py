"""Driver sampling-order contract for __spark_entry__._sampling_order.

The driver samples a bounded prefix of queries()/oracle_sql() each round;
the order must (1) front anything whose latest driver verdict failed,
(2) then never-driver-checked names, (3) then rotate the passed group by
ascending verdict AGE so the stalest verdicts refresh first (round-9
verdict item) instead of re-sampling the same registration-order prefix
forever. No Spark session needed — pure ordering logic.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod


def _with_records(monkeypatch, records):
    monkeypatch.setattr(
        entry_mod, "_latest_driver_records", lambda: records
    )


def test_failed_then_never_then_stalest(monkeypatch):
    keys = ["a", "b", "c", "d", "e"]
    _with_records(
        monkeypatch,
        {
            "a": (7, {"rows_match": True, "hash_match": True}),
            "b": (2, {"rows_match": True, "hash_match": True}),
            "c": (5, {"rows_match": True, "hash_match": False}),
            # d: never checked
            "e": (4, {"rows_match": True, "hash_match": True}),
        },
    )
    assert entry_mod._sampling_order(keys) == ["c", "d", "b", "e", "a"]


def test_same_round_keeps_registration_order(monkeypatch):
    keys = ["x", "y", "z"]
    _with_records(
        monkeypatch,
        {k: (3, {"rows_match": True, "hash_match": True}) for k in keys},
    )
    assert entry_mod._sampling_order(keys) == keys


def test_err_with_new_oracle_counts_as_fail(monkeypatch):
    from tdk_apache_log_etl_spark.operators import ORACLES

    oracle_name = next(iter(ORACLES))
    keys = [oracle_name, "other"]
    _with_records(
        monkeypatch,
        {
            oracle_name: (6, {"err": "no_oracle"}),
            "other": (1, {"rows_match": True, "hash_match": True}),
        },
    )
    assert entry_mod._sampling_order(keys) == [oracle_name, "other"]


def test_real_registry_order_is_complete_and_stale_first():
    """Against the real CORRECTNESS history: ordering is a permutation
    of the registry, and with every query verdict-carrying (round 9
    closed the board) the head of the passed rotation must be at least
    as stale as the tail."""
    order = list(entry_mod.queries().keys())
    from tdk_apache_log_etl_spark.operators import ORACLES, QUERIES

    assert sorted(order) == sorted(QUERIES)
    latest = entry_mod._latest_driver_records()

    def fronted(name):  # mirrors _sampling_order's fail predicate
        rnd, rec = latest[name]
        checks = (
            rec.get("rows_match"),
            rec.get("schema_match"),
            rec.get("hash_match"),
        )
        return any(c is False for c in checks) or (
            rec.get("err") is not None and name in ORACLES
        )

    passed_rounds = [
        latest[k][0] for k in order if k in latest and not fronted(k)
    ]
    # the rotation puts the stalest verdict first within the passed group
    if passed_rounds:
        assert passed_rounds == sorted(passed_rounds)
