"""Sequence-packing invariants beyond oracle parity: capacity respected,
offsets contiguous, and the prefix sum never funnels the corpus through a
single partition."""

from __future__ import annotations

from collections import defaultdict

from tdk_apache_log_etl_spark.operators import QUERIES
from tdk_apache_log_etl_spark.operators.packing import CTX

from .conftest import SF_DIR_CORRECT


def test_offsets_are_contiguous_and_cover_corpus(spark):
    rows = QUERIES["pack_token_offsets"](spark, SF_DIR_CORRECT).collect()
    # sorted by start_offset, each doc begins exactly where the previous
    # one ended — the packed stream has no gaps and no overlaps
    rows.sort(key=lambda r: r.start_offset)
    pos = 0
    for r in rows:
        assert r.start_offset == pos
        assert r.pack_id == pos // CTX
        assert r.offset_in_pack == pos % CTX
        assert r.spans_boundary == (pos % CTX + r.n_tokens > CTX)
        pos += r.n_tokens


def test_greedy_bins_respect_capacity(spark):
    rows = QUERIES["pack_sequences_greedy"](spark, SF_DIR_CORRECT).collect()
    fills = defaultdict(int)
    sizes = defaultdict(int)
    for r in rows:
        fills[(r.grp, r.bin_idx)] += r.n_tokens
        sizes[(r.grp, r.bin_idx)] += 1
    for key, fill in fills.items():
        # a bin may exceed CTX only as a singleton (oversized document)
        assert fill <= CTX or sizes[key] == 1, (key, fill, sizes[key])


def test_greedy_never_splits_documents(spark):
    rows = QUERIES["pack_sequences_greedy"](spark, SF_DIR_CORRECT).collect()
    assert len({r.doc_id for r in rows}) == len(rows)


def test_prefix_sum_has_no_global_window_over_corpus(spark):
    df = QUERIES["pack_token_offsets"](spark, SF_DIR_CORRECT)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the only empty-partitionBy window runs over the N_GROUPS-row group
    # totals, fed by a hash aggregate — the full corpus is windowed
    # per-group only. If the corpus itself hit a global window, the plan
    # would show windowspecdefinition(doc_id ...) with no partition spec.
    import re

    for line in plan.splitlines():
        m = re.search(r"windowspecdefinition\((\w+)#\d+", line)
        if m is None:
            continue
        # first spec argument is either the partition key (per-group
        # window → 'grp') or, for the global window, the order key —
        # which must be 'grp' (the 32-row group-total frame), never the
        # corpus-wide doc_id
        assert m.group(1) == "grp", line
