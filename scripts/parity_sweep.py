"""Full oracle-parity sweep at any scale factor — the round-gate
verification harness (used for the round-6 sf0.01/sf0.1 sweeps and the
round-7 sf1 sweep that caught the Bollinger INT64 overflow and the
DuckDB triples join-order blowup).

Usage:
    python scripts/parity_sweep.py SF_DIR [--resume LOG] [--names a,b,c]

Runs every `oracle_sql()` query on Spark AND DuckDB over the parquet
tables in SF_DIR and compares values row-by-row after column-name sort
(the driver's protocol: floats via repr, dates via isoformat). Details
that earn their keep:

  * non-UTC session (America/Chicago) — catches session-tz leakage;
  * vanilla SparkSession (no engine configs) — what the driver runs;
  * a DuckDB watchdog (con.interrupt after --duck-timeout seconds, then
    a fresh connection) so one pathological oracle plan cannot stall
    the sweep — it is recorded as DUCK_TIMEOUT for triage instead;
  * --resume LOG skips every query already ": OK" in a previous log, so
    a killed sweep continues instead of restarting;
  * per-query wall for both engines, JSON results next to the log.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import threading
import time
from datetime import date, datetime
from decimal import Decimal

os.environ.setdefault("TZ", "America/Chicago")
time.tzset()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


class _DuckTimeout(Exception):
    """Control-flow sentinel for the duck-timeout path: a bare
    RuntimeError here would also catch genuine RuntimeErrors raised
    during the Spark phase (query build/collect) and record a FAIL
    with no error detail."""


def connect(duckdb, sf):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    return con


def canon(v, duck=False):
    """Driver-fidelity canon.  ``duck=True`` reproduces the driver's
    pandas fetch, where DuckDB DECIMAL/HUGEINT arrive as float64; Spark
    DECIMAL stays a Decimal object on the driver, so the two can never
    hash-equal — a decimal-typed output must FAIL here like it fails
    remotely (round-8 ab_sequential_obf).  The duck side is fetched
    through Arrow (HUGEINT surfaces as decimal128(38,0), not a plain
    int as DBAPI fetchall would give), so this branch sees every value
    of the hazard class."""
    if duck and isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    return v


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("--resume", help="prior sweep log; ': OK' lines skip")
    ap.add_argument("--names", help="comma-separated subset")
    ap.add_argument("--duck-timeout", type=int, default=300)
    ap.add_argument("--driver-memory", default="32g")
    ap.add_argument("--out", default="/tmp/parity_sweep_results.json")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", args.driver_memory)
        .getOrCreate()
    )
    import duckdb

    import __spark_entry__ as m

    qs, osql = m.queries(), m.oracle_sql()
    done = set()
    if args.resume and os.path.exists(args.resume):
        for line in open(args.resume):
            mm = re.match(r"\[\d+/\d+\] (\S+): OK", line)
            if mm:
                done.add(mm.group(1))
        print(f"resuming: {len(done)} already OK", flush=True)
    names = sorted(osql)
    if args.names:
        names = [n for n in args.names.split(",") if n in osql]
    names = [n for n in names if n not in done]

    con = connect(duckdb, args.sf_dir)
    results = {}
    t_start = time.time()
    for i, name in enumerate(names):
        rec = {}
        try:
            t0 = time.time()
            sdf = qs[name](spark, args.sf_dir)
            s = sorted(
                [tuple(canon(x) for x in r)
                 for r in sdf.select(sorted(sdf.columns)).collect()],
                key=repr,
            )
            rec["spark_s"] = round(time.time() - t0, 2)
            t0 = time.time()
            timer = threading.Timer(args.duck_timeout, con.interrupt)
            timer.start()
            try:
                # Arrow fetch, not fetchall: DBAPI returns HUGEINT as a
                # plain Python int (indistinguishable from BIGINT here,
                # so the sweep stayed blind to that driver-failure
                # class); Arrow surfaces it as decimal128(38,0), which
                # canon(duck=True) converts to float64 like the driver.
                tbl = con.execute(osql[name]).fetch_arrow_table()
                cols = tbl.column_names
                col_data = [
                    tbl.column(k).to_pylist()
                    for k in range(tbl.num_columns)
                ]
                raw = list(zip(*col_data)) if col_data else []
            except duckdb.InterruptException:
                rec["duck_timeout"] = args.duck_timeout
                rec["match"] = None
                con = connect(duckdb, args.sf_dir)
                raise _DuckTimeout
            finally:
                timer.cancel()
            idx = sorted(range(len(cols)), key=lambda k: cols[k])
            o = sorted(
                [tuple(canon(r[k], duck=True) for k in idx) for r in raw],
                key=repr,
            )
            rec["duck_s"] = round(time.time() - t0, 2)
            rec["rows"] = len(s)
            rec["match"] = s == o
            if not rec["match"]:
                for a, b in zip(s, o):
                    if a != b:
                        rec["first_diff"] = [repr(a)[:200], repr(b)[:200]]
                        break
                else:
                    rec["first_diff"] = [
                        "row-count", f"{len(s)} vs {len(o)}"
                    ]
        except _DuckTimeout:
            pass
        except Exception as e:
            rec["match"] = False
            rec["error"] = f"{type(e).__name__}: {e}"[:300]
        results[name] = rec
        status = (
            "OK" if rec.get("match")
            else ("DUCK_TIMEOUT" if rec.get("duck_timeout") else "FAIL")
        )
        print(
            f"[{i + 1}/{len(names)}] {name}: {status} "
            f"spark={rec.get('spark_s')}s duck={rec.get('duck_s')}s "
            f"rows={rec.get('rows')}",
            flush=True,
        )

    fails = [n for n, r in results.items()
             if not r.get("match") and not r.get("duck_timeout")]
    touts = [n for n, r in results.items() if r.get("duck_timeout")]
    print("TOTAL_WALL: %.0fs" % (time.time() - t_start))
    print("CHECKED:", len(names))
    print("FAILURES:", fails or "none")
    print("DUCK_TIMEOUTS:", touts or "none")
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
