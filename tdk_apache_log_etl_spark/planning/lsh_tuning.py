"""MinHash-LSH banding tuner: choose (bands, rows) before the dedup job
runs.

The banded-LSH near-dup pipeline (operators/dedup.minhash_lsh_neardup)
hashes each document to b bands of r minhash rows; a pair becomes a
candidate iff some band matches, which happens with probability
P(s) = 1 − (1 − s^r)^b for true Jaccard similarity s — the classic
S-curve (Mining of Massive Datasets §3.4).  The (b, r) choice IS the
precision/recall dial: its inflection sits near (1/b)^(1/r), pairs far
below the target threshold still match occasionally (false positives =
wasted exact-verify work), pairs above sometimes miss (false negatives
= surviving duplicates).

``tune_bands`` enumerates every (b, r) with b·r ≤ n_hashes and scores
each by the weighted area of the two failure regions — the integral of
P(s) below the threshold (FP mass, costing verification compute) plus
the integral of 1 − P(s) above it (FN mass, costing corpus quality) —
on a fixed midpoint grid so the choice is deterministic and
reproducible.  Raise ``fn_weight`` when surviving duplicates are
expensive (training-corpus dedup: repeated text degrades the model);
raise ``fp_weight`` when the exact-verify join dominates cost.

Pure Python on scalars — the tuner prices the job, the engine runs it.
"""

from __future__ import annotations

from dataclasses import dataclass


def candidate_prob(s: float, b: int, r: int) -> float:
    """P(pair with Jaccard s becomes a candidate) = 1 − (1 − s^r)^b."""
    return 1.0 - (1.0 - s**r) ** b


def banding_threshold(b: int, r: int) -> float:
    """The S-curve inflection ≈ (1/b)^(1/r) — where P crosses ~0.5."""
    return (1.0 / b) ** (1.0 / r)


@dataclass(frozen=True)
class BandingChoice:
    bands: int
    rows: int
    n_hashes_used: int
    threshold_est: float
    fp_area: float
    fn_area: float
    cost: float


def tune_bands(
    n_hashes: int,
    threshold: float,
    fp_weight: float = 1.0,
    fn_weight: float = 1.0,
    grid: int = 1000,
) -> BandingChoice:
    """Best (bands, rows) with bands·rows ≤ n_hashes for the target
    Jaccard threshold, minimizing fp_weight·FP-area + fn_weight·FN-area
    (midpoint-rule integrals of the S-curve's failure regions)."""
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0, 1) (got {threshold})")
    if n_hashes < 1:
        raise ValueError(f"n_hashes must be >= 1 (got {n_hashes})")
    best: BandingChoice | None = None
    for r in range(1, n_hashes + 1):
        # EVERY b up to the budget, not just the maximal one: with a
        # skewed fp_weight a smaller band count at the same row count
        # can price lower (fewer bands = fewer accidental candidates),
        # and the docstring promises the full (b, r) enumeration.
        # Still tiny scalar work: sum_r n/r = O(n log n) combos.
        for b in range(1, n_hashes // r + 1):
            fp = 0.0
            fn = 0.0
            for i in range(grid):
                s = (i + 0.5) / grid
                p = candidate_prob(s, b, r)
                if s < threshold:
                    fp += p
                else:
                    fn += 1.0 - p
            fp /= grid
            fn /= grid
            cost = fp_weight * fp + fn_weight * fn
            cand = BandingChoice(
                bands=b,
                rows=r,
                n_hashes_used=b * r,
                threshold_est=banding_threshold(b, r),
                fp_area=fp,
                fn_area=fn,
                cost=cost,
            )
            # strict < : ties resolve to the smaller r (cheaper
            # signatures), then the smaller b (iteration order)
            if best is None or cand.cost < best.cost:
                best = cand
    assert best is not None
    return best
