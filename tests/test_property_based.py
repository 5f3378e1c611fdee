"""Hypothesis property tests (SURVEY.md §5's generative tier):

  * the CLF parser round-trips randomly generated well-formed lines —
    every field comes back exactly, for any IP/user/offset/method/size
    combination, not just the golden lines;
  * the greedy packer satisfies its invariants for arbitrary token-count
    sequences (pure-pandas helper — no Spark session in the loop);
  * dec_sum is bit-identical across partitionings for arbitrary doubles
    — the exact property the DuckDB differential gate relies on.
"""

from __future__ import annotations

import datetime

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tdk_apache_log_etl_spark.operators.numeric import dec_sum
from tdk_apache_log_etl_spark.operators.packing import CTX, _pack_group
from tdk_apache_log_etl_spark.sources.apache_log import parse_clf_lines

# ---------------------------------------------------------------------------
# greedy packer: pure-function invariants
# ---------------------------------------------------------------------------

token_counts = st.lists(st.integers(min_value=1, max_value=2 * CTX), max_size=60)


@given(token_counts)
def test_pack_group_invariants(counts):
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(counts)),
            "grp": [0] * len(counts),
            "n_tokens": counts,
        }
    )
    out = _pack_group(pdf)
    assert list(out["doc_id"]) == sorted(out["doc_id"])  # order preserved
    assert len(out) == len(counts)  # nothing dropped or split
    cur_bin, fill, n_in_bin = 0, 0, 0
    for i, r in enumerate(out.itertuples()):
        if i == 0:
            assert r.bin_idx == 0
            fill, n_in_bin = r.n_tokens, 1
        elif r.bin_idx == cur_bin:
            fill += r.n_tokens
            n_in_bin += 1
        else:
            # bins are consecutive, and a new one opens ONLY on overflow
            assert r.bin_idx == cur_bin + 1
            assert fill + r.n_tokens > CTX
            cur_bin, fill, n_in_bin = r.bin_idx, r.n_tokens, 1
        # capacity respected except oversized singletons
        assert fill <= CTX or n_in_bin == 1


# ---------------------------------------------------------------------------
# CLF parser: generative round-trip
# ---------------------------------------------------------------------------

ips = st.tuples(*[st.integers(0, 255)] * 4).map(
    lambda t: ".".join(map(str, t))
)
users = st.one_of(st.none(), st.integers(1, 99999))
offsets = st.integers(-24, 24).map(lambda q: q * 30)  # ±HHMM in 30-min steps
methods = st.sampled_from(["GET", "POST", "PUT", "DELETE", "HEAD"])
resources = st.text(
    alphabet="abcdefghij/_-.0123456789", min_size=1, max_size=20
).map(lambda s: "/" + s)
statuses = st.sampled_from([200, 201, 301, 304, 401, 404, 500])
sizes_ = st.one_of(st.none(), st.integers(0, 10_000_000))
times = st.datetimes(
    min_value=datetime.datetime(1995, 1, 1, 0, 0, 0),
    max_value=datetime.datetime(2030, 12, 31, 23, 59, 59),
).map(lambda d: d.replace(microsecond=0))

line_components = st.tuples(
    ips, users, times, offsets, methods, resources, statuses, sizes_
)

_MONTHS = [
    "Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec",
]


def _fmt_clf(ip, user, t, off_min, method, res, status, size):
    sign = "+" if off_min >= 0 else "-"
    off = f"{sign}{abs(off_min) // 60:02d}{abs(off_min) % 60:02d}"
    ts = (
        f"{t.day:02d}/{_MONTHS[t.month - 1]}/{t.year}:"
        f"{t.hour:02d}:{t.minute:02d}:{t.second:02d} {off}"
    )
    u = "-" if user is None else str(user)
    sz = "-" if size is None else str(size)
    return (
        f'{ip} - {u} [{ts}] "{method} {res} HTTP/1.1" {status} {sz} '
        f'"https://ref.example/" "agent/1.0 (x11)"'
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(line_components, min_size=1, max_size=20))
def test_clf_parser_roundtrips_generated_lines(spark, batch):
    lines = [_fmt_clf(*c) for c in batch]
    rows = parse_clf_lines(
        spark.createDataFrame([(l,) for l in lines], ["value"])
    ).collect()
    assert len(rows) == len(batch)
    for r, (ip, user, t, off_min, method, res, status, size) in zip(
        rows, batch
    ):
        assert r._corrupt is None
        assert r.ip_address == ip
        assert r.user_id == user
        assert r.status_code == status
        assert r.size == size
        assert (r.request_method, r.request_resource) == (method, res)
        # ±HHMM offset normalizes to UTC
        assert r.time == t - datetime.timedelta(minutes=off_min)


# ---------------------------------------------------------------------------
# dec_sum: partitioning invariance (bit-exact)
# ---------------------------------------------------------------------------


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(
        st.floats(
            min_value=-1e6,
            max_value=1e6,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=50,
    )
)
def test_dec_sum_is_partitioning_invariant(spark, values):
    df = spark.createDataFrame([(float(v),) for v in values], "v double")
    one = df.coalesce(1).agg(dec_sum(df.v).alias("s")).collect()[0].s
    many = (
        df.repartition(16).agg(dec_sum(df.v).alias("s")).collect()[0].s
    )
    assert one == many and repr(one) == repr(many)


# ---------------------------------------------------------------------------
# distributed selection: exact quantiles for ANY value multiset
# ---------------------------------------------------------------------------


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.floats(
            min_value=-1e6,
            max_value=1e6,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=80,
    )
)
def test_distributed_quantiles_equal_numpy_for_any_multiset(spark, values):
    # range-partitioned selection must reproduce quantile_cont's simple
    # interpolation lo + (hi-lo)*frac bit-for-bit on arbitrary multisets
    # (duplicates, negatives, singletons, heavy ties). NB: numpy's
    # _lerp is NOT the comparison target — it switches to
    # hi - (hi-lo)*(1-t) at t>=0.5 for extra accuracy, which differs in
    # the last ulp; DuckDB (the oracle) uses the simple form.
    import math

    from tdk_apache_log_etl_spark.operators.relational import (
        _distributed_quantiles,
    )

    qs = [0.1, 0.5, 0.9]
    df = spark.createDataFrame([(float(v),) for v in values], "v double")
    got = _distributed_quantiles(df, "v", qs).collect()[0][0]
    a = sorted(float(v) for v in values)
    expected = []
    for q in qs:
        pos = q * float(len(a) - 1)
        lo, hi = math.floor(pos), math.ceil(pos)
        expected.append(a[lo] + (a[hi] - a[lo]) * (pos - math.floor(pos)))
    assert got == expected


# ---------------------------------------------------------------------------
# CLF parser: total function over ARBITRARY input — parse or quarantine,
# never throw (the reference hard-fails the whole file on one bad line,
# sree-etl-tdk-lambda.py:214-218; ours must degrade row-wise)
# ---------------------------------------------------------------------------


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.text(
            # printable-ish chars incl. quotes/brackets/backslashes that
            # stress the regex, no newlines (one line per row by contract)
            alphabet=st.characters(
                blacklist_categories=("Cs",), blacklist_characters="\n\r"
            ),
            max_size=120,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_clf_parser_never_throws_on_garbage(spark, lines):
    df = spark.createDataFrame([(l,) for l in lines], "value string")
    out = parse_clf_lines(df).collect()  # must not raise
    assert len(out) == len(lines)  # row-wise degradation, no data loss
    # every row is either fully parsed (9-way split) or quarantined
    for r in out:
        assert (r._corrupt is None) or isinstance(r._corrupt, str)


# ---------------------------------------------------------------------------
# growth accounting / streaks: structural identities for ARBITRARY
# activity sets (pure-python reference recomputation per example)
# ---------------------------------------------------------------------------

_activity = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 27)),
    min_size=1,
    max_size=50,
)


def _events_frame(pairs):
    base = datetime.datetime(2026, 8, 3, 12)  # a Monday: day//7 == week idx
    return pd.DataFrame(
        [
            (i, base + datetime.timedelta(days=d), u, "view", 1.0, "{}")
            for i, (u, d) in enumerate(pairs)
        ],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(_activity)
def test_growth_accounting_identities(spark, pairs):
    import tempfile

    from tdk_apache_log_etl_spark.operators import QUERIES

    with tempfile.TemporaryDirectory() as td:
        _events_frame(pairs).to_parquet(td + "/events.parquet")
        out = QUERIES["user_growth_accounting"](spark, td).collect()
    user_weeks = {(u, d // 7) for u, d in pairs}
    users = {u for u, _ in user_weeks}
    # runs of consecutive active weeks, per user
    runs = 0
    for u in users:
        ws = sorted(w for x, w in user_weeks if x == u)
        runs += sum(
            1 for i, w in enumerate(ws) if i == 0 or w != ws[i - 1] + 1
        )
    tot = {
        k: sum(getattr(r, k) for r in out)
        for k in ("n_new", "n_retained", "n_resurrected", "n_churned")
    }
    # every user is new exactly once; every activity run starts with a
    # new/resurrected row and ends with exactly one churn booking
    assert tot["n_new"] == len(users)
    assert tot["n_new"] + tot["n_resurrected"] == runs
    assert tot["n_churned"] == runs
    # weekly balance: active = new + retained + resurrected
    base_day = datetime.date(2026, 8, 3)
    active = {}
    for u, w in user_weeks:
        active[w] = active.get(w, 0) + 1
    for r in out:
        widx = (r.week - base_day).days // 7
        assert r.n_new + r.n_retained + r.n_resurrected == active.get(
            widx, 0
        )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(_activity)
def test_longest_streak_matches_python_reference(spark, pairs):
    import tempfile

    from tdk_apache_log_etl_spark.operators import QUERIES

    with tempfile.TemporaryDirectory() as td:
        _events_frame(pairs).to_parquet(td + "/events.parquet")
        out = {
            r.user_id: r
            for r in QUERIES["user_longest_streak"](spark, td).collect()
        }
    user_days = {(u, d) for u, d in pairs}
    for u in {x for x, _ in user_days}:
        ds = sorted(d for x, d in user_days if x == u)
        streaks, cur = [], 1
        for i in range(1, len(ds)):
            if ds[i] == ds[i - 1] + 1:
                cur += 1
            else:
                streaks.append(cur)
                cur = 1
        streaks.append(cur)
        r = out[u]
        assert r.n_active_days == len(ds)
        assert r.longest_streak == max(streaks)
        assert r.n_streaks == len(streaks)


# ---------------------------------------------------------------------------
# business-day prefix formula: pure-function property vs brute force
# ---------------------------------------------------------------------------


def _wb(d: datetime.date) -> int:
    """The Monday-anchored closed form from temporal.business_day_ship_lag."""
    m = (d - datetime.date(1970, 1, 5)).days
    return 5 * (m // 7) + min(m % 7, 5)


@given(
    st.dates(min_value=datetime.date(1990, 1, 1),
             max_value=datetime.date(2030, 1, 1)),
    st.integers(min_value=0, max_value=400),
)
def test_business_day_formula_matches_brute_force(start, span):
    end = start + datetime.timedelta(days=span)
    brute = sum(
        1
        for k in range(span)
        if (start + datetime.timedelta(days=k)).weekday() < 5
    )
    assert _wb(end) - _wb(start) == brute


# ---------------------------------------------------------------------------
# sliding-distinct delta identity: pure-python model vs interval algebra
# ---------------------------------------------------------------------------

user_day_sets = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),     # user
        st.integers(min_value=0, max_value=40),    # day index
    ),
    min_size=1,
    max_size=60,
)


@given(user_day_sets)
def test_sliding_delta_identity_matches_naive(pairs):
    # the +1/-1 boundary-delta construction used by
    # logmetrics.active_users_7d_sliding, replayed in pure python
    W = 7
    ud = sorted(set(pairs))
    days = [d for _, d in ud]
    lo, hi = min(days), max(days)
    deltas: dict[int, int] = {}
    by_user: dict[int, list[int]] = {}
    for u, d in ud:
        by_user.setdefault(u, []).append(d)
    for u, ds in by_user.items():
        prev = None
        for d in sorted(ds):
            start = d if prev is None or prev + W - 1 < d else prev + W
            deltas[start] = deltas.get(start, 0) + 1
            deltas[d + W] = deltas.get(d + W, 0) - 1
            prev = d
    run = 0
    for e in range(lo, hi + 1):
        run += deltas.get(e, 0)
        naive = len(
            {u for u, d in ud if e - (W - 1) <= d <= e}
        )
        assert run == naive, (e, run, naive)


# ---------------------------------------------------------------------------
# Hodges-Lehmann: engine == pure-python mirror for arbitrary small inputs
# ---------------------------------------------------------------------------


def _hl_mirror(values):
    us = sorted(int(v) for v in values)  # floor of non-negative values
    walsh = []
    for i in range(len(us)):
        for j in range(i, len(us)):
            walsh.append(us[i] + us[j])
    walsh.sort()
    n = len(walsh)
    k1 = (n + 1) // 2
    k2 = n // 2 + 1
    return (walsh[k1 - 1] + walsh[k2 - 1]) / 4.0


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(
        st.integers(min_value=0, max_value=60), min_size=1, max_size=12
    )
)
def test_hodges_lehmann_matches_python_mirror(spark, values):
    import tempfile

    from tdk_apache_log_etl_spark.operators import QUERIES

    d = tempfile.mkdtemp()
    pd.DataFrame(
        {
            "event_id": range(len(values)),
            "ts": pd.to_datetime(["2024-01-01"] * len(values)).astype(
                "datetime64[ms]"
            ),
            "user_id": [1] * len(values),
            "event_type": ["view"] * len(values),
            "value": [float(v) for v in values],
            "props": ["{}"] * len(values),
        }
    ).to_parquet(d + "/events.parquet")
    row = QUERIES["hodges_lehmann_value"](spark, d).collect()[0]
    assert row.hl_estimate == _hl_mirror(values)
    assert row.n_walsh == len(values) * (len(values) + 1) / 2


# ---------------------------------------------------------------------------
# Shapley attribution: unanimity-game conservation for arbitrary journeys
# ---------------------------------------------------------------------------

_journey = st.lists(
    st.sampled_from(["click", "view", "error", "signup", "purchase"]),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(_journey, min_size=1, max_size=5))
def test_shapley_credit_conservation(spark, journeys):
    import datetime as dt
    import tempfile

    from tdk_apache_log_etl_spark.operators import QUERIES

    rows = []
    eid = 0
    base = dt.datetime(2024, 1, 1)
    expected_users = 0
    for uid, journey in enumerate(journeys):
        touched = set()
        converted = False
        for k, etype in enumerate(journey):
            eid += 1
            rows.append(
                (eid, base + dt.timedelta(minutes=k), uid, etype, 1.0, "{}")
            )
            if etype == "purchase" and not converted:
                converted = True
                if touched:
                    expected_users += 1
            if not converted and etype != "purchase":
                touched.add(etype)
    d = tempfile.mkdtemp()
    df = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    df["ts"] = df["ts"].astype("datetime64[ms]")
    df.to_parquet(d + "/events.parquet")
    out = QUERIES["shapley_attribution"](spark, d).collect()
    # every converting user with >=1 prior touch hands out exactly 60
    assert sum(r.credit_60ths for r in out) == 60 * expected_users


# ---------------------------------------------------------------------------
# Haar decomposition: conservation + parent-child identities
# ---------------------------------------------------------------------------


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=15),   # day offset
            st.integers(min_value=0, max_value=10_000),  # cents
        ),
        min_size=1,
        max_size=20,
    )
)
def test_haar_conservation_and_parent_child(spark, orders):
    import datetime as dt
    import tempfile

    from tdk_apache_log_etl_spark.operators import QUERIES

    d = tempfile.mkdtemp()
    df = pd.DataFrame(
        {
            "o_orderkey": range(len(orders)),
            "o_custkey": [7] * len(orders),
            "o_totalprice": [c / 100.0 for _, c in orders],
            "o_orderdate": [
                dt.datetime(1992, 1, 1 + day) for day, _ in orders
            ],
        }
    )
    df["o_orderdate"] = df["o_orderdate"].astype("datetime64[ms]")
    df.to_parquet(d + "/orders.parquet")
    rows = QUERIES["daily_revenue_haar"](spark, d).collect()
    total = sum(c for _, c in orders)
    lv = {}
    for r in rows:
        lv.setdefault(r.level, {})[r.block] = (r.total_cents, r.detail_cents)
    for k in (1, 2, 3):
        assert sum(t for t, _ in lv[k].values()) == total  # conservation
    # parent-child: total2(b) == total1(2b) + total1(2b+1);
    # detail2(b) == total1(2b) - total1(2b+1)  (missing child = 0)
    for b, (t2, d2) in lv[2].items():
        left = lv[1].get(2 * b, (0, 0))[0]
        right = lv[1].get(2 * b + 1, (0, 0))[0]
        assert t2 == left + right
        assert d2 == left - right
