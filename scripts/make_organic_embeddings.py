"""Generate an ORGANIC (fresh-draw, replica-free) embedding fixture for
ANN recall grading.

Usage: python scripts/make_organic_embeddings.py DST_DIR [N]

The driver's make_scaled_sf.py builds larger corpora by replicating the
sf0.1 vectors with +r*0.01 perturbations, which flatters ANN recall:
each query's true top-k then contains its own near-duplicate replicas —
easy targets for every index.  This script instead draws N fresh
vectors from the same generative family as the driver fixtures
(64-dim, unit-norm, 10 labels with a WEAK label-direction signal —
measured cos-to-centroid ~0.07 on the sf0.1 organic data), so recall
measured on it reflects genuine corpus growth.  Deterministic seed:
re-running reproduces the round-8 numbers recorded in
operators/similarity.py's recall-floor table.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

DIM = 64
N_LABELS = 10
#: label-signal strength: normalize(g + ALPHA * dir_label) gives
#: E[cos-to-centroid] ~ ALPHA / sqrt(DIM) ~ 0.07, matching the organic
#: driver fixtures.
ALPHA = 0.56
SEED = 20260816


def main() -> int:
    dst = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 6000
    rng = np.random.default_rng(SEED)
    dirs = rng.standard_normal((N_LABELS, DIM))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    labels = rng.integers(0, N_LABELS, n)
    g = rng.standard_normal((n, DIM))
    v = g + ALPHA * dirs[labels]
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    os.makedirs(dst, exist_ok=True)
    pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [row.astype(np.float32) for row in v],
            "label": labels.astype(np.int32),
        }
    ).to_parquet(os.path.join(dst, "embeddings.parquet"))
    print(f"wrote {n} organic vectors to {dst}/embeddings.parquet")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
