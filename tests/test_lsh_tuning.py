"""LSH banding tuner (planning/lsh_tuning.py): the S-curve formula is
pinned on dyadic-exact points, the tuned inflection tracks the requested
threshold, and the FN/FP weights move the choice in the right direction."""

from __future__ import annotations

import pytest

from tdk_apache_log_etl_spark.planning import (
    banding_threshold,
    candidate_prob,
    tune_bands,
)


def test_s_curve_pinned_on_dyadic_points():
    # s=0.5, r=2, b=3: 1 - (1 - 0.25)^3 = 1 - 0.421875 (all dyadic-exact)
    assert candidate_prob(0.5, 3, 2) == 0.578125
    assert candidate_prob(0.0, 8, 4) == 0.0
    assert candidate_prob(1.0, 8, 4) == 1.0
    assert banding_threshold(1, 1) == 1.0


def test_tuned_inflection_tracks_threshold():
    lo = tune_bands(128, 0.3)
    hi = tune_bands(128, 0.9)
    # pushing the threshold right needs more rows per band (steeper,
    # right-shifted curve) and an inflection near the target
    assert hi.rows > lo.rows
    assert abs(lo.threshold_est - 0.3) < 0.15
    assert abs(hi.threshold_est - 0.9) < 0.1
    assert lo.n_hashes_used <= 128 and hi.n_hashes_used <= 128


def test_fn_weight_buys_recall():
    balanced = tune_bands(64, 0.7)
    recall_heavy = tune_bands(64, 0.7, fn_weight=10.0)
    assert recall_heavy.fn_area <= balanced.fn_area
    # recall is bought with a lower effective threshold (catch more)
    assert recall_heavy.threshold_est <= balanced.threshold_est


def test_validation():
    with pytest.raises(ValueError):
        tune_bands(128, 0.0)
    with pytest.raises(ValueError):
        tune_bands(0, 0.5)
