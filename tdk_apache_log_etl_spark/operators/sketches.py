"""Mergeable-sketch operators: HLL distinct-count rollups.

The 100 TB pattern for distinct counts is NOT ``COUNT(DISTINCT ...)``
over raw facts at query time — it is: build tiny MERGEABLE binary
sketches at the finest grain once, persist them as a sketch table
(kilobytes per cell), and answer every coarser question by merging
sketches, never rescanning the fact table. This is the hypertable /
materialized-rollup design: a day×type sketch table answers per-day,
per-type, and grand-total distinct-user questions with a union that
touches only the sketch rows. ``COUNT(DISTINCT)`` does not compose this
way (distinct counts are not additive across groups); sketches do.

Spark 4 ships Apache DataSketches HLL natively (`hll_sketch_agg`,
`hll_union_agg`, `hll_sketch_estimate` — JVM-side, codegen-friendly
aggregates), so the whole operator stays in whole-stage codegen with no
UDF. Count-min-sketch exists too (`F.count_min_sketch`): Spark exposes
no SQL-side probe of the binary, but the sketch is a bounded driver
artifact (width×depth counters, ~100 KB at eps=1e-3), so the correct
scale pattern is: build the sketch DISTRIBUTED (one map-side-combinable
aggregate over the facts), ship the one binary to the driver, and probe
it there through the JVM's ``CountMinSketch.readFrom`` — the same
bounded-driver-data shape as the IVF centroid matrix in similarity.py.
``cms_user_frequency`` does exactly that; its ε·N overcount bound is
asserted against exact counts in tests/test_sketches.py.

Scale notes:

  * The fine-grain sketch build is ONE shuffle keyed on the grain
    (map-side partial sketches merge before the exchange — sketches are
    commutative monoids, so Spark's partial-aggregation machinery
    applies exactly as it does to SUM).
  * Every rollup level reads the persisted sketch table (rows = number
    of grain cells, not number of facts). At petabyte scale the sketch
    table is what you'd write to the lake nightly; here scoped_persist
    keeps it materialized across the three rollup branches.
  * Estimates are deterministic functions of the observed value SET
    (order- and partitioning-independent), so results are stable across
    cluster layouts — asserted by tests/test_sketches.py, which also
    checks union-of-parts equals sketch-of-whole (mergeability) and
    accuracy vs exact distinct counts.

No DuckDB oracle: DuckDB's approx_count_distinct is a different
algorithm with different estimates, and the exact answer is
intentionally not what this operator computes. The registry entry is
rows-only; the accuracy contract lives in the test suite.

Reference parity: the reference counts distinct users per day with
pandas ``nunique`` (sree-etl-tdk-glue-job.py:55-63); this is that same
question asked the way a 1000-executor cluster can afford to answer it
repeatedly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query, scoped_persist

#: DataSketches lgConfigK: 2^12 registers ≈ 1.6% relative standard error,
#: 4 KB per sketch — the standard accuracy/size trade for rollup tables.
HLL_LGK = 12

ALL = "ALL"  # rollup marker for merged-out dimensions


def build_hll_sketches(
    df: DataFrame, dims: list[str], key: str, lgk: int = HLL_LGK
) -> DataFrame:
    """Fine-grain sketch table: one row per grain cell, one binary HLL
    sketch of ``key`` per row. This is the only pass over the facts."""
    return df.groupBy(*dims).agg(
        F.hll_sketch_agg(F.col(key), F.lit(lgk)).alias("hll")
    )


def merge_hll_sketches(sketches: DataFrame, dims: list[str]) -> DataFrame:
    """Roll the sketch table up to ``dims`` by unioning sketches —
    touches sketch rows only, never the facts."""
    agg = F.hll_union_agg(F.col("hll"), F.lit(False)).alias("hll")
    if dims:
        return sketches.groupBy(*dims).agg(agg)
    return sketches.agg(agg)


@query("hll_user_rollup")
def hll_user_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-level distinct-user rollup from ONE (event_type, day) sketch
    table: detail cells, per-type totals, grand total — the per-type and
    grand rows are sketch unions, not rescans. Columns use the ALL
    marker for merged-out dimensions (grouping-sets shape)."""
    events = load_table(spark, sf_dir, "events")
    facts = events.filter(F.col("user_id").isNotNull()).select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        "user_id",
    )
    sk = scoped_persist(build_hll_sketches(facts, ["event_type", "day"], "user_id"))
    est = F.hll_sketch_estimate(F.col("hll")).alias("est_users")
    detail = sk.select("event_type", "day", est)
    by_type = merge_hll_sketches(sk, ["event_type"]).select(
        "event_type", F.lit(ALL).alias("day"), est
    )
    total = merge_hll_sketches(sk, []).select(
        F.lit(ALL).alias("event_type"), F.lit(ALL).alias("day"), est
    )
    return detail.unionByName(by_type).unionByName(total)


#: Count-min parameters: eps bounds the overcount at eps·N (N = total
#: items) with probability `confidence`; the seed fixes the hash family
#: so estimates are deterministic across runs and cluster layouts.
CMS_EPS = 0.001
CMS_CONFIDENCE = 0.99
CMS_SEED = 42
CMS_TOPK = 10


def build_count_min(
    df: DataFrame,
    col: str,
    eps: float = CMS_EPS,
    confidence: float = CMS_CONFIDENCE,
    seed: int = CMS_SEED,
) -> bytes:
    """One distributed pass over the facts → one ~100 KB sketch binary.
    The aggregate is a commutative monoid, so Spark's partial-aggregation
    (map-side combine) applies; only the final merged binary reaches the
    driver."""
    row = df.agg(
        F.count_min_sketch(
            F.col(col), F.lit(eps), F.lit(confidence), F.lit(seed)
        ).alias("cms")
    ).head()
    return bytes(row["cms"])


_CMS_MASK64 = (1 << 64) - 1
_CMS_PRIME_MODULUS = (1 << 31) - 1  # Spark's CountMinSketchImpl.PRIME_MODULUS


def parse_count_min(sketch: bytes) -> tuple[int, list[int], list[list[int]]]:
    """Parse Spark's serialized CountMinSketch (format V1, written by
    ``CountMinSketchImpl#writeTo`` — a DataOutputStream stream: version
    int, totalCount long, depth int, width int, then the per-row hash
    coefficients and the depth×width counter table, all big-endian).
    Pure Python: no JVM handle, so the probe works identically under
    Spark Connect or from a process with no gateway at all."""
    import struct

    version, total_count, depth, width = struct.unpack_from(">iqii", sketch, 0)
    if version != 1:
        raise ValueError(f"unsupported CountMinSketch version {version}")
    off = 20
    hash_a = list(struct.unpack_from(f">{depth}q", sketch, off))
    off += 8 * depth
    table = []
    for _ in range(depth):
        table.append(list(struct.unpack_from(f">{width}q", sketch, off)))
        off += 8 * width
    return total_count, hash_a, table


def _cms_bucket_long(item: int, a: int, width: int) -> int:
    """Replicate CountMinSketchImpl#hash for long items with Java 64-bit
    two's-complement semantics: h = a*item (wrapping); h += h >> 32
    (arithmetic shift); h &= PRIME_MODULUS; bucket = h % width."""
    u = (a * item) & _CMS_MASK64
    s = u - (1 << 64) if u >= (1 << 63) else u  # signed view
    t = (s + (s >> 32)) & _CMS_MASK64  # Python >> on signed == Java >>
    return (t & _CMS_PRIME_MODULUS) % width


def probe_count_min(sketch: bytes, items) -> dict:
    """Driver-side frequency probe of a serialized Spark CountMinSketch —
    pure Python (no ``_jvm`` bridge): parses the public V1 binary format
    and replays the long-item hash, returning min-over-rows counters
    exactly as ``CountMinSketch.estimateCount`` would (cross-checked
    against the JVM implementation in tests/test_sketches.py). O(depth)
    per probe, no executor work. `items` must be a BOUNDED query list of
    ints; unbounded per-key frequencies belong in an exact groupBy, not
    a sketch probe."""
    _total, hash_a, table = parse_count_min(sketch)
    width = len(table[0])
    out = {}
    for item in items:
        if not isinstance(item, int):
            raise TypeError(
                f"probe_count_min supports long items only (got {type(item)})"
            )
        out[item] = min(
            row[_cms_bucket_long(item, a, width)]
            for a, row in zip(hash_a, table)
        )
    return out


@query("cms_user_frequency")  # rows-only: probes a Spark-format binary
def cms_user_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-sketch probe: how often do the top-K users appear in the
    event stream, answered from a count-min sketch instead of a second
    fact scan. The exact top-K (one aggregate) supplies the bounded probe
    list; the sketch estimate rides next to the exact count so the ε·N
    error contract is visible in the output. At 100 TB the sketch is
    built once per ingest window and probed for any ad-hoc key without
    touching the facts again. No DuckDB oracle: the estimate depends on
    Spark's CMS hash family; the error bound is tested instead."""
    events = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id")
    )
    events = scoped_persist(events)
    top = (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .orderBy(F.desc("n_exact"), F.asc("user_id"))
        .limit(CMS_TOPK)
        .collect()
    )
    sketch = build_count_min(events, "user_id")
    est = probe_count_min(sketch, [int(r["user_id"]) for r in top])
    return spark.createDataFrame(
        [
            (int(r["user_id"]), int(r["n_exact"]), int(est[int(r["user_id"])]))
            for r in top
        ],
        "user_id bigint, n_exact bigint, n_est bigint",
    )
