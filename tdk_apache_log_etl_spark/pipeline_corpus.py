"""End-to-end training-corpus preparation pipeline.

``pipeline.py`` composes the reference's log flow (ingest → staging →
daily analytics); this is its twin for the driver-mandated LLM-data
extension pack: one function that chains the hygiene, dedup, and packing
operators into the standard corpus-preparation sequence —

    filter (blocklist + quality floor)
      → exact dedup
      → near-dup canonical filter (keep one doc per cluster)
      → concat-and-cut pack assignment
      → partitioned parquet manifest

Every stage is the already-tested operator applied to the previous
stage's frame (no re-implementation), and the whole chain is ONE lazy
plan until the final write: Catalyst sees through the composition, so
column pruning and filter pushdown cross stage boundaries — e.g. the
blocklist ratio computes inside the same scan that reads the text for
shingling.

Scale posture is inherited from the parts: the dedup stages shuffle
digests/shingle hashes (never raw text twice), packing's prefix sum is
the two-phase scan, and the manifest write partitions by ``source`` so
downstream mixture sampling prunes partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators.dedup import (
    connected_components,
    exact_jaccard_pairs,
    shingle_frame,
)
from .operators.hygiene import scrub_columns
from .operators.packing import CTX, N_GROUPS
from .sources.tables import load_table

#: survivors must clear this many whitespace tokens (quality floor)
MIN_TOKENS = 8


def prepare_corpus(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str | None = None,
) -> DataFrame:
    """Run the full corpus-preparation chain over ``documents``;
    returns the packed manifest (doc_id, source, n_tokens, pack_id,
    offset_in_pack) and, if ``out_dir`` is given, writes it as parquet
    partitioned by ``source``."""
    docs = load_table(spark, sf_dir, "documents")

    # 1. hygiene: blocklist drop-flag + token floor, one projection
    scrubbed = scrub_columns(docs).filter(~F.col("dropped"))
    kept = (
        docs.join(scrubbed.select("doc_id"), "doc_id", "left_semi")
        .filter(F.size(F.split(F.col("text"), " ")) >= MIN_TOKENS)
    )

    # 2. exact dedup: one survivor per identical text (min doc_id —
    # deterministic), digests shuffle, not text
    exact_canon = (
        kept.groupBy(F.sha2(F.col("text"), 256).alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    exact_survivors = kept.join(exact_canon, "doc_id", "left_semi")

    # 3. near-dup clustering at Jaccard >= 0.5; keep cluster canonicals
    sh = shingle_frame(exact_survivors)
    pairs = exact_jaccard_pairs(sh, threshold=0.5)
    clusters = connected_components(
        exact_survivors.select("doc_id"), pairs
    )
    canon = clusters.filter(
        F.col("doc_id") == F.col("canonical_id")
    ).select("doc_id")
    survivors = exact_survivors.join(canon, "doc_id", "left_semi")

    # 4. pack assignment: concat-and-cut offsets over the survivor set
    # (same two-phase prefix sum as operators/packing.py, applied to the
    # filtered frame rather than the raw table)
    t = survivors.select(
        "doc_id",
        "source",
        (F.col("doc_id") % N_GROUPS).alias("grp"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    w_local = (
        Window.partitionBy("grp")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = t.withColumn(
        "local_before", F.coalesce(F.sum("n_tokens").over(w_local), F.lit(0))
    )
    group_offsets = (
        t.groupBy("grp")
        .agg(F.sum("n_tokens").alias("grp_total"))
        .withColumn(
            "grp_before",
            F.coalesce(
                F.sum("grp_total").over(
                    Window.orderBy("grp").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("grp", "grp_before")
    )
    manifest = (
        local.join(F.broadcast(group_offsets), "grp")
        .withColumn(
            "start_offset", F.col("grp_before") + F.col("local_before")
        )
        .select(
            "doc_id",
            "source",
            "n_tokens",
            F.floor(F.col("start_offset") / CTX).alias("pack_id"),
            (F.col("start_offset") % CTX).alias("offset_in_pack"),
        )
    )

    if out_dir is not None:
        manifest.write.mode("overwrite").partitionBy("source").parquet(
            out_dir
        )
    return manifest
