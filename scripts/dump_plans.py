"""Dump ``explain("formatted")`` for named queries to files.

Usage:
    python scripts/dump_plans.py OUTDIR SUFFIX query1 query2 ...

Writes OUTDIR/<query>_<SUFFIX>.txt for each query, using
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1). Queries listed in
EAGER_BUILD run distributed jobs during construction (documented
designs); their plans are still the final returned frame's plan.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from tdk_apache_log_etl_spark.operators import QUERIES
    from tdk_apache_log_etl_spark.session import get_spark

    spark = get_spark("tdk-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(path)
    spark.stop()


if __name__ == "__main__":
    main()
