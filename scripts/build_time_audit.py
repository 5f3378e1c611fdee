"""Registry-wide DataFrame BUILD-time audit — finds driver-side fixed
overhead that scaling exponents cannot see.

A query whose wall is flat across scale factors but large is paying a
FIXED cost; when that cost is in building the DataFrame (py4j Column
construction, eager driver loops) it never shrinks on a bigger cluster.
Round 9 used this scan to find and fix the two worst cases:
`jl_project_embeddings` (~4.5 s of py4j building 16x64 Column objects;
rebuilt as SQL strings) and `embedding_top_eigenvector` (8 eager
localCheckpoint jobs over 64-row frames; rebuilt as a driver-local
exact-integer iteration over the once-collected d x d matrix).

Interpretation guide (measured r9):
  * build >> exec with NO eager action in the function body -> py4j
    plan-building; generate SQL text instead of Column algebra.
  * build >> exec WITH eager actions (collect/toPandas inside the
    builder) -> the build time is a real distributed job; judge it by
    its documented design (bounded summaries are fine).

Usage:
    python scripts/build_time_audit.py [SF_DIR] [TOP_N]
Defaults: /root/testdata/sf0.001 (smoke scale - py4j cost is
scale-independent, so small data isolates it), top 20.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    from tdk_apache_log_etl_spark.operators import QUERIES
    from tdk_apache_log_etl_spark.session import get_spark

    spark = get_spark("build-audit")
    spark.sparkContext.setLogLevel("ERROR")
    # Warm-up: registry-name-agnostic (survives renames) and best-effort
    # (a warm-up failure should not kill the audit before it measures).
    try:
        next(iter(QUERIES.values()))(spark, sf).write.format("noop").mode(
            "overwrite"
        ).save()
    except Exception as e:  # pragma: no cover - defensive
        print(f"WARN warm-up failed: {type(e).__name__}: {e}", flush=True)

    walls = []
    for name, fn in QUERIES.items():
        t0 = time.perf_counter()
        try:
            fn(spark, sf)
        except Exception as e:  # keep auditing past one bad query
            print(f"ERR   {name}: {type(e).__name__}: {e}", flush=True)
            continue
        walls.append((time.perf_counter() - t0, name))
    walls.sort(reverse=True)
    from tdk_apache_log_etl_spark.operators import EAGER_BUILD

    print(f"\nslowest {top_n} DataFrame builds at {sf}:")
    print("('eager' = registered in registry.EAGER_BUILD: construction")
    print(" runs Spark jobs by design; unmarked slow builds are suspects)")
    for w, n in walls[:top_n]:
        tag = "  [eager]" if n in EAGER_BUILD else ""
        print(f"{w:7.2f}  {n}{tag}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
