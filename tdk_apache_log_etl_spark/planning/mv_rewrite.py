"""Materialized-view rewrite: answer aggregate queries from a persisted
rollup instead of rescanning the fact table.

The reference recomputes its three summary metrics from raw logs on
every run (sree-etl-tdk-glue-job.py:52-63); a warehouse keeps a small
set of MATERIALIZED rollups and answers any query at a coarser grain
from them — the aggregate-rewrite every serious engine ships (Oracle
query rewrite, BigQuery MVs, Druid rollups, Pinot star-tree).

This module implements the decomposable-aggregate core of that rewrite:

  * An ``AggQuery`` declares grouping keys (SQL exprs over the base
    table) and measures (sum / count / min / max / avg of exprs).
  * A ``MaterializedView`` is an AggQuery (avg-free — storage must be
    mergeable) plus the parquet path where ``build_mv`` wrote it.
  * ``try_rewrite`` matches a query against an MV: every query key must
    be an MV key (rename allowed) or a strictly-coarser ``date_trunc``
    of one (hour→day→week→month→quarter→year lattice; re-truncating an
    already-truncated timestamp is exact, so the rollup is lossless);
    every measure must decompose over the MV's stored measures
    (sum-of-sums, sum-of-counts, min-of-mins, max-of-maxes,
    avg = stored-sum / stored-count — the count must be COUNT(expr) of
    the SAME expr, because COUNT(*) over-counts when the measure is
    nullable).  On a match it returns a plan
    that scans ONLY the MV; at the exact MV grain it skips the
    re-aggregation entirely (pure projection).
  * ``answer`` tries each MV in order and falls back to the base table.

Correct-by-construction notes: the match is EXACT expression equality
(whitespace/case-normalized), not semantic equivalence — a conservative
matcher never rewrites wrongly, it only misses opportunities.  Rewrites
require the MV to be built over the same unfiltered base relation
(filter-aware rewrites need predicate subsumption, deliberately out of
scope).

Scale: this is precisely the 100 TB lever — a (day × status) rollup of
a 10¹² -row fact table is ~10⁵ rows, and every month/quarter/year
roll-up of it touches kilobytes instead of the fact table's terabytes.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: date_trunc granularity lattice — a query unit can be answered from
#: any strictly-finer-or-equal stored unit.  (week omitted from the
#: month chain: weeks straddle month boundaries, so week only rolls up
#: from day/hour.)
_COARSER_OK = {
    "hour": {"hour"},
    "day": {"hour", "day"},
    "week": {"hour", "day", "week"},
    "month": {"hour", "day", "month"},
    "quarter": {"hour", "day", "month", "quarter"},
    "year": {"hour", "day", "month", "quarter", "year"},
}

_AGGS = {"sum", "count", "min", "max", "avg"}


def _norm(expr: str) -> str:
    return re.sub(r"\s+", " ", expr.strip().lower())


_TRUNC_RE = re.compile(r"^date_trunc\(\s*'(\w+)'\s*,\s*(.+)\)$")


@dataclass(frozen=True)
class AggQuery:
    """table + {out_key: SQL expr over base} + {out_measure: (agg, expr)}.
    count uses expr '*' (COUNT(*))."""

    table: str
    keys: dict[str, str]
    measures: dict[str, tuple[str, str]]

    def __post_init__(self):
        for out, (agg, _) in self.measures.items():
            if agg not in _AGGS:
                raise ValueError(f"{out}: unknown aggregate {agg!r}")


@dataclass(frozen=True)
class MaterializedView:
    name: str
    query: AggQuery
    path: str

    def __post_init__(self):
        if any(a == "avg" for a, _ in self.query.measures.values()):
            raise ValueError(
                f"{self.name}: store sum+count, not avg — averages do "
                "not merge"
            )


def rollup_frame(base: DataFrame, q: AggQuery) -> DataFrame:
    """The MV's aggregate frame for any slice of the base relation —
    used by build_mv (full build) and by streaming maintenance (per
    micro-batch partials, merged additively downstream)."""
    keyed = base.select(
        *[F.expr(e).alias(k) for k, e in q.keys.items()],
        *[
            F.expr(e if e != "*" else "1").alias(f"__m_{out}")
            for out, (_, e) in q.measures.items()
        ],
    )
    aggs = []
    for out, (agg, e) in q.measures.items():
        col = F.col(f"__m_{out}")
        if agg == "count":
            aggs.append(
                (F.count(F.lit(1)) if e == "*" else F.count(col))
                .cast("long")
                .alias(out)
            )
        else:
            aggs.append(getattr(F, agg)(col).alias(out))
    return keyed.groupBy(*q.keys).agg(*aggs)


def build_mv(base: DataFrame, mv: MaterializedView) -> None:
    """Compute the rollup and persist it at mv.path (overwrite)."""
    rollup_frame(base, mv.query).write.mode("overwrite").parquet(mv.path)


def _match_key(q_expr: str, mv_keys: dict[str, str]) -> "F.Column | None":
    """Return the expression (over MV columns) that reproduces the query
    key, or None."""
    qn = _norm(q_expr)
    for mk, me in mv_keys.items():
        if _norm(me) == qn:
            return F.col(mk)
    m = _TRUNC_RE.match(qn)
    if not m:
        return None
    unit, inner = m.group(1), _norm(m.group(2))
    for mk, me in mv_keys.items():
        mm = _TRUNC_RE.match(_norm(me))
        if (
            mm
            and _norm(mm.group(2)) == inner
            and mm.group(1) in _COARSER_OK.get(unit, ())
        ):
            return F.date_trunc(unit, F.col(mk))
    return None


def _match_measure(
    out: str, agg: str, expr: str, mv_measures: dict[str, tuple[str, str]]
) -> "F.Column | None":
    """Merged aggregate over MV columns reproducing agg(expr), or None."""
    en = _norm(expr)

    def stored(want_agg: str) -> str | None:
        for mo, (ma, me) in mv_measures.items():
            if ma == want_agg and _norm(me) == en:
                return mo
        return None

    if agg == "sum" and (c := stored("sum")):
        return F.sum(c).alias(out)
    if agg == "count" and (c := stored("count")):
        return F.sum(c).cast("long").alias(out)
    if agg == "min" and (c := stored("min")):
        return F.min(c).alias(out)
    if agg == "max" and (c := stored("max")):
        return F.max(c).alias(out)
    if agg == "avg":
        s = stored("sum")
        n = stored("count")
        if s and n:
            return (
                F.sum(s).cast("double") / F.sum(F.col(n).cast("long"))
            ).alias(out)
    return None


def try_rewrite(
    spark: SparkSession, q: AggQuery, mv: MaterializedView
) -> DataFrame | None:
    """The MV-backed plan for q, or None if this MV can't answer it."""
    if q.table != mv.query.table:
        return None
    key_cols: dict[str, F.Column] = {}
    for k, e in q.keys.items():
        col = _match_key(e, mv.query.keys)
        if col is None:
            return None
        key_cols[k] = col
    measure_cols = []
    for out, (agg, e) in q.measures.items():
        col = _match_measure(out, agg, e, mv.query.measures)
        if col is None:
            return None
        measure_cols.append(col)
    scan = spark.read.parquet(mv.path)
    exact_grain = sorted(_norm(e) for e in q.keys.values()) == sorted(
        _norm(e) for e in mv.query.keys.values()
    )
    if exact_grain and all(
        agg != "avg" for agg, _ in q.measures.values()
    ):
        # pure projection — no re-aggregation needed
        sel = [key_cols[k].alias(k) for k in q.keys]
        for out, (agg, e) in q.measures.items():
            mo = next(
                mo
                for mo, (ma, me) in mv.query.measures.items()
                if ma == agg and _norm(me) == _norm(e)
            )
            sel.append(F.col(mo).alias(out))
        return scan.select(*sel)
    keyed = scan.select(
        *[key_cols[k].alias(k) for k in q.keys],
        *[F.col(mo) for mo in mv.query.measures],
    )
    return keyed.groupBy(*q.keys).agg(*measure_cols)


def answer(
    spark: SparkSession,
    q: AggQuery,
    mvs: list[MaterializedView],
    base: DataFrame,
) -> tuple[DataFrame, str | None]:
    """(result, name of the MV used — None means the base table)."""
    for mv in mvs:
        df = try_rewrite(spark, q, mv)
        if df is not None:
            return df, mv.name
    keyed = base.select(
        *[F.expr(e).alias(k) for k, e in q.keys.items()],
        *[
            F.expr(e if e != "*" else "1").alias(f"__m_{out}")
            for out, (_, e) in q.measures.items()
        ],
    )
    aggs = []
    for out, (agg, e) in q.measures.items():
        col = F.col(f"__m_{out}")
        if agg == "count":
            aggs.append(
                (F.count(F.lit(1)) if e == "*" else F.count(col))
                .cast("long")
                .alias(out)
            )
        elif agg == "avg":
            aggs.append(
                (F.sum(col).cast("double") / F.count(col)).alias(out)
            )
        else:
            aggs.append(getattr(F, agg)(col).alias(out))
    return keyed.groupBy(*q.keys).agg(*aggs), None
