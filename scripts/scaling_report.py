"""Turn bench.py runs at multiple scale factors into per-query scaling
exponents.

Usage:
  python scripts/scaling_report.py sf_a=bench_a.json sf_b=bench_b.json ...

Each arg is `<sf>=<path-to-bench-json>` (ascending sf). For every query
present in consecutive runs, prints exponent = log(t2/t1)/log(sf2/sf1) —
1.0 is perfectly linear scaling, <1 means fixed overhead still dominates,
>1 flags superlinear work growth (the thing that kills a 100× scale-up).
Emits a markdown table on stdout and a JSON artifact if --json PATH is
given.
"""

from __future__ import annotations

import json
import math
import sys


def main() -> int:
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i:i + 2]
    args = argv
    runs = []
    for a in args:
        sf, path = a.split("=", 1)
        with open(path) as f:
            runs.append((float(sf), json.load(f)))
    runs.sort(key=lambda r: r[0])

    pairs = list(zip(runs, runs[1:]))
    names = sorted(
        set.union(*[set(r[1]["queries"]) for r in runs]),
    )
    header = ["query"] + [f"t@sf{r[0]:g}" for r in runs] + [
        f"exp {a[0]:g}→{b[0]:g}" for a, b in pairs
    ]
    print("| " + " | ".join(header) + " |")
    print("|" + "---|" * len(header))
    table = {}
    for name in names:
        row = [name]
        for _, b in runs:
            t = b["queries"].get(name)
            row.append(f"{t:.3f}" if t is not None else "—")
        exps = []
        for (sfa, a), (sfb, b) in pairs:
            ta, tb = a["queries"].get(name), b["queries"].get(name)
            if ta and tb:
                e = math.log(tb / ta) / math.log(sfb / sfa)
                exps.append(round(e, 2))
                row.append(f"{e:.2f}")
            else:
                exps.append(None)
                row.append("—")
        table[name] = {
            "times": {f"{sf:g}": b["queries"].get(name) for sf, b in runs},
            "exponents": exps,
        }
        print("| " + " | ".join(row) + " |")

    worst = sorted(
        ((v["exponents"][-1], k) for k, v in table.items()
         if v["exponents"] and v["exponents"][-1] is not None),
        reverse=True,
    )
    print()
    print("Top exponents at the largest step:")
    for e, k in worst[:10]:
        print(f"  {e:5.2f}  {k}")
    superlinear = [k for e, k in worst if e > 1.15]
    print(f"\nsuperlinear (exp > 1.15): {superlinear or 'none'}")

    if json_out:
        with open(json_out, "w") as f:
            json.dump(
                {
                    "sfs": [sf for sf, _ in runs],
                    "queries": table,
                    "superlinear": superlinear,
                },
                f,
                indent=1,
                sort_keys=True,
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
