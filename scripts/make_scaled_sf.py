"""Generate a K×-scaled copy of a fixture dir for scaling studies.

Usage: python scripts/make_scaled_sf.py SRC_DIR DST_DIR K

Replicates every fact table K times with CONSISTENT key shifts so join
topology is preserved exactly (each replica is a disjoint TPC-H-ish
universe; nation/region stay fixed like real bounded dims):

  * customer.c_custkey and orders.o_custkey shift together;
  * orders.o_orderkey and lineitem.l_orderkey shift together;
  * part.p_partkey / supplier.s_suppkey shift with lineitem's FKs;
  * events.event_id/user_id shift (user_id shares the customer shift so
    events↔orders joins keep matching);
  * documents: doc_id shifts AND every 3rd word is tagged with the
    replica id — replicas land below near-dup thresholds (one prepended
    token would leave shingle overlap ~99% and collapse the corpus into
    K-clusters, inflating dedup work instead of scaling it);
  * embeddings: vec_id shifts and deterministic per-(replica,
    component) SIGN FLIPS — norm-preserving, and replicas land
    near-orthogonal to their source and to each other (the old
    +r·0.01 shift left replicas near-parallel, planting ~86k true
    near-dup pairs at 10× that quadratically inflated every
    cosine/LSH query's real work).

The result is a dataset whose per-query work grows ~K× with realistic
key cardinalities — the third point for per-query scaling exponents
(SCALE.md "Measured scaling" section).
"""

from __future__ import annotations

import shutil
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: per-table (column -> shift-group) map; columns in one group shift by
#: the same per-replica offset so FKs keep resolving within a replica.
SHIFT_GROUPS = {
    "customer": {"c_custkey": "cust"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part",
                 "l_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "supplier": {"s_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "cust"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
FIXED_TABLES = ["nation", "region"]


def _group_extents(spark: SparkSession, src: str) -> dict[str, int]:
    """offset unit per shift group = max(key)+1 across every column in
    the group (one tiny agg per table)."""
    extents: dict[str, int] = {}
    for table, cols in SHIFT_GROUPS.items():
        df = spark.read.parquet(f"{src}/{table}.parquet")
        row = df.agg(
            *[F.max(F.col(c)).alias(c) for c in cols]
        ).head()
        for c, grp in cols.items():
            v = row[c]
            if v is not None:
                extents[grp] = max(extents.get(grp, 0), int(v) + 1)
    return extents


def _replicate(df: DataFrame, k: int) -> DataFrame:
    """K replicas via a 1-row-per-replica broadcast cross join — the
    standard explode-free fan-out."""
    reps = df.sparkSession.range(k).select(F.col("id").alias("_rep"))
    return df.crossJoin(F.broadcast(reps))


def scale_table(
    spark: SparkSession, src: str, table: str, k: int,
    extents: dict[str, int],
) -> DataFrame:
    df = spark.read.parquet(f"{src}/{table}.parquet")
    out = _replicate(df, k)
    for col, grp in SHIFT_GROUPS[table].items():
        out = out.withColumn(
            col, (F.col(col) + F.col("_rep") * F.lit(extents[grp])).cast(
                df.schema[col].dataType
            )
        )
    if table == "documents":
        # tag every 3rd word with the replica id: any 5-word shingle
        # overlaps >=1 tagged word, so cross-replica Jaccard collapses
        # and near-dup work scales with the corpus instead of exploding
        # into K-sized exact-dup clusters.
        words = F.split(F.col("text"), " ")
        mutated = F.transform(
            words,
            lambda w, i: F.when(
                (i % 3 == 0) & (F.col("_rep") > 0),
                F.concat(w, F.lit("~"), F.col("_rep").cast("string")),
            ).otherwise(w),
        )
        out = out.withColumn("text", F.array_join(mutated, " "))
        out = out.withColumn("n_chars", F.length("text"))
    if table == "embeddings":
        # Replica vectors must be ANGULARLY distinct, not just distinct
        # values: the original +r·0.01 shift left replicas near-parallel
        # to their source (cosine ≈ 1), so a 10× corpus contained ~86k
        # TRUE near-dup pairs (cosine ≥ 0.85) where the source corpus
        # has none — every cosine/LSH query then pays quadratically more
        # REAL work and the scaling exponent measures the planted
        # duplicates, not the engine (the embeddings twin of the
        # documents every-3rd-word rule above). Deterministic per-
        # (replica, component) sign flips keep norms EXACTLY and scatter
        # replicas across the hypersphere: expected cosine to the source
        # and to other replicas ≈ 0.
        out = out.withColumn(
            "embedding",
            F.transform(
                F.col("embedding"),
                lambda x, i: F.when(
                    (F.col("_rep") > 0)
                    # xxhash64 of (component index, replica) → fair,
                    # pairwise-INDEPENDENT flip patterns. (A first cut
                    # used (a·i + c·rep) mod m < m/2 — a constant shift
                    # per replica, so close shifts shared most of their
                    # flip set and same-source replicas stayed
                    # correlated enough to leave 43k cosine ≥ 0.85
                    # pairs at 10×.)
                    & (F.pmod(F.xxhash64(i, F.col("_rep")), F.lit(2)) == 0),
                    -x,
                ).otherwise(x),
            ),
        )
    return out.drop("_rep")


def main() -> int:
    src, dst, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "32")
        .appName("make-scaled-sf")
        .getOrCreate()
    )
    extents = _group_extents(spark, src)
    print("shift extents:", extents)
    for table in FIXED_TABLES:
        shutil.copy(f"{src}/{table}.parquet", f"{dst}/{table}.parquet")
    for table in SHIFT_GROUPS:
        scaled = scale_table(spark, src, table, k, extents)
        # K files per table (one per replica of the source file), NOT
        # coalesce(1): a single-file write lands ONE parquet row group,
        # and a one-row-group file is unsplittable — every split beyond
        # the first reads zero rows, so all map-side work at the big
        # fixtures silently ran single-core (measured: the 10M-row
        # events local sort took 34 s at sf10 with 21 of 22 "splits"
        # empty; the round-10 sf3→sf10 exponent inflation to ~1.1-1.16
        # was exactly this). Real corpora are many files; the scaled
        # fixture must preserve that property to measure scaling.
        scaled.repartition(max(k, 4)).write.mode("overwrite").parquet(
            f"{dst}/{table}.parquet"
        )
        print(f"{table}: x{k} written")
    spark.stop()
    return 0


if __name__ == "__main__":
    import os

    os.makedirs(sys.argv[2], exist_ok=True)
    raise SystemExit(main())
