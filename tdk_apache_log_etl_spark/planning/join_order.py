"""Join-order advisor: System R / Selinger cardinality estimation over
the E229 column-stats layer.

Spark's CBO reorders joins only when a metastore carries ANALYZE
statistics; pipelines reading bare parquet (this repo's world, and most
lakehouse jobs) run with the optimizer flying blind — join order is
whatever the query author typed.  This module exposes the textbook
estimator so a pipeline can *price* its join orders up front from the
same one-pass stats `tablestats.orders_ndv_profile` computes:

  * |R ⋈ S on R.a = S.b|  ≈  |R| · |S| / max(ndv_R(a), ndv_S(b))
    (the containment-of-values assumption; multiple predicates between
    the same pair multiply their selectivities)
  * NDV propagation: ndv of a column in the join result is capped at
    the estimated result size (and at its own prior NDV).

``best_left_deep`` enumerates left-deep orders (exact for the ≤8-table
graphs pipelines actually write — 8! = 40320 candidate chains, pruned
to connected extensions), scoring by total intermediate cardinality —
the cost every shuffle join actually pays.  ``greedy_order`` is the
O(n²) fallback for wider graphs.  Cross products are only considered
when no connected extension exists (disconnected graphs), mirroring
every serious optimizer's heuristic.

All arithmetic is integer/float Python on tiny stat frames — the
advisor never touches data; collecting the stats is one Expand-planned
pass per table (``collect_table_stats``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class TableStats:
    name: str
    rows: int
    ndv: dict  # column -> distinct count


@dataclass(frozen=True)
class JoinPred:
    left_table: str
    left_col: str
    right_table: str
    right_col: str

    def touches(self, a: str, b: str) -> bool:
        return {self.left_table, self.right_table} == {a, b}


def collect_table_stats(df: DataFrame, name: str, cols) -> TableStats:
    """One Expand-planned pass: row count + exact NDV per join column.
    (At 100 TB swap countDistinct for approx_count_distinct / the HLL
    rollup — the advisor only needs magnitudes.)"""
    aggs = [F.count(F.lit(1)).cast("long").alias("__rows")]
    aggs += [F.countDistinct(c).cast("long").alias(c) for c in cols]
    row = df.agg(*aggs).collect()[0]
    return TableStats(
        name=name, rows=row["__rows"], ndv={c: row[c] for c in cols}
    )


class _Rel:
    """A (possibly joined) relation during enumeration: estimated rows +
    propagated NDVs keyed (table, col)."""

    __slots__ = ("tables", "rows", "ndv")

    def __init__(self, tables: frozenset, rows: float, ndv: dict):
        self.tables = tables
        self.rows = rows
        self.ndv = ndv

    @classmethod
    def base(cls, ts: TableStats) -> "_Rel":
        return cls(
            frozenset([ts.name]),
            float(ts.rows),
            {(ts.name, c): float(n) for c, n in ts.ndv.items()},
        )


def _join_est(rel: _Rel, ts: TableStats, preds) -> float | None:
    """Estimated |rel ⋈ ts| via the max-NDV rule over every predicate
    connecting them; None when no predicate connects (cross product)."""
    right = _Rel.base(ts)
    connecting = [
        p
        for p in preds
        if (
            p.left_table in rel.tables and p.right_table == ts.name
        )
        or (p.right_table in rel.tables and p.left_table == ts.name)
    ]
    if not connecting:
        return None
    est = rel.rows * right.rows
    for p in connecting:
        if p.right_table == ts.name:
            lk, rk = (p.left_table, p.left_col), (ts.name, p.right_col)
        else:
            lk, rk = (p.right_table, p.right_col), (ts.name, p.left_col)
        d = max(rel.ndv.get(lk, 1.0), right.ndv.get(rk, 1.0), 1.0)
        est /= d
    return est


def _extend(rel: _Rel, ts: TableStats, est: float) -> _Rel:
    ndv = {}
    right = _Rel.base(ts)
    for k, v in {**rel.ndv, **right.ndv}.items():
        ndv[k] = min(v, est)
    return _Rel(rel.tables | {ts.name}, est, ndv)


def best_left_deep(stats, preds):
    """Exhaustive left-deep enumeration (connected extensions first;
    cross products only when unavoidable).  Returns (order, step_costs,
    total_intermediate) where step_costs[i] is the estimated
    cardinality AFTER joining order[i+1]."""
    if len(stats) > 8:
        return greedy_order(stats, preds)
    best = None
    for first in stats:
        frontier = [( _Rel.base(first), [first.name], [], 0.0)]
        while frontier:
            rel, order, costs, tot = frontier.pop()
            if len(order) == len(stats):
                if best is None or tot < best[2]:
                    best = (order, costs, tot)
                continue
            remaining = [s for s in stats if s.name not in rel.tables]
            ests = [(s, _join_est(rel, s, preds)) for s in remaining]
            connected = [(s, e) for s, e in ests if e is not None]
            if connected:
                cands = connected
            else:  # disconnected graph: forced cross product
                cands = [
                    (s, rel.rows * s.rows) for s, _ in ests
                ]
            for s, e in cands:
                # prune: partial cost already worse than the best total
                if best is not None and tot + e >= best[2]:
                    continue
                frontier.append(
                    (_extend(rel, s, e), order + [s.name],
                     costs + [e], tot + e)
                )
    assert best is not None
    return best


def greedy_order(stats, preds):
    """Smallest-intermediate-first greedy chain for wide graphs."""
    remaining = {s.name: s for s in stats}
    start = min(stats, key=lambda s: s.rows)
    rel = _Rel.base(start)
    order, costs, tot = [start.name], [], 0.0
    del remaining[start.name]
    while remaining:
        best_s, best_e = None, None
        for s in remaining.values():
            e = _join_est(rel, s, preds)
            if e is None:
                continue
            if best_e is None or e < best_e:
                best_s, best_e = s, e
        if best_s is None:  # forced cross product
            best_s = min(remaining.values(), key=lambda s: s.rows)
            best_e = rel.rows * best_s.rows
        rel = _extend(rel, best_s, best_e)
        order.append(best_s.name)
        costs.append(best_e)
        tot += best_e
        del remaining[best_s.name]
    return order, costs, tot


#: Spark's default spark.sql.autoBroadcastJoinThreshold.
BROADCAST_THRESHOLD_BYTES = 10 * 1024 * 1024


def annotate_strategies(
    order,
    stats,
    row_bytes: dict,
    threshold: int = BROADCAST_THRESHOLD_BYTES,
):
    """Physical-strategy advice for a chosen left-deep order: at each
    step, broadcast the incoming table when its estimated bytes
    (rows · row_bytes[name]) fit the threshold, else shuffle (SMJ/SHJ —
    Spark's pick).  Returns [(table, strategy, est_bytes)] for steps
    1..n-1.  This is the explicit form of the decision AQE makes at
    runtime — useful when writing the query, to know which joins to
    hint and which dimension tables to keep denormalization-free."""
    by_name = {s.name: s for s in stats}
    out = []
    for name in order[1:]:
        est = by_name[name].rows * row_bytes.get(name, 64)
        out.append(
            (
                name,
                "broadcast" if est <= threshold else "shuffle",
                est,
            )
        )
    return out
