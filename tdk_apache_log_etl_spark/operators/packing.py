"""Sequence packing for LLM training-data pipelines.

Before training, documents are packed into fixed-length context windows.
Two industry-standard strategies, each in its scale-right Spark form:

  * **concat-and-cut** (``pack_token_offsets``): concatenate the corpus
    in a deterministic order and slice at every ``CTX`` tokens — the
    GPT-style packing where documents may straddle window boundaries.
    The only hard part at scale is the global prefix sum of token
    counts; a naive single-partition window is the classic scale bug.
    This uses the textbook two-phase distributed scan: per-group running
    sums (parallel windows over ``doc_id % P`` groups), then a P-row
    cumulative offset frame joined back by broadcast.  Nothing wider
    than P rows ever passes through a single partition.

  * **greedy next-fit** (``pack_sequences_greedy``): documents never
    straddle windows; a bin closes when the next document would overflow
    it.  The fill state is inherently sequential, so it runs per group
    via ``applyInPandas`` — groups pack independently and in parallel,
    which is exactly how production packers shard the problem (per-shard
    packing, shard count scales with the cluster).  Per-task state is
    one integer; the Python loop touches each row once over Arrow
    batches.  The DuckDB oracle replays the same recurrence as a
    recursive CTE, making even the stateful variant hash-checkable.

The reference has no packing surface (it is an Apache-log ETL); this is
part of the driver-mandated LLM-pipeline extension pack, alongside
dedup/similarity/text (SURVEY.md §2 extension rows).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

#: number of independent packing groups — on a real cluster this is
#: O(total cores), here fixed so the oracle can replay the grouping
N_GROUPS = 32
#: context window length in whitespace tokens
CTX = 512


def _with_tokens(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id",
        (F.col("doc_id") % N_GROUPS).alias("grp"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )


@query(
    "pack_token_offsets",
    oracle=f"""
        WITH t AS (
          SELECT doc_id,
                 CAST(doc_id % {N_GROUPS} AS BIGINT) AS grp,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
          FROM documents
        )
        SELECT doc_id, n_tokens,
               CAST(COALESCE(SUM(n_tokens) OVER (
                 ORDER BY grp, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS start_offset,
               CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (
                 ORDER BY grp, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) / {CTX}) AS BIGINT) AS pack_id,
               CAST(COALESCE(SUM(n_tokens) OVER (
                 ORDER BY grp, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) % {CTX} AS BIGINT) AS offset_in_pack,
               (COALESCE(SUM(n_tokens) OVER (
                 ORDER BY grp, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) % {CTX}) + n_tokens > {CTX} AS spans_boundary
        FROM t
    """,
)
def pack_token_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-cut packing via a two-phase distributed prefix sum.

    Phase 1: running token sums within each of the {N_GROUPS} groups —
    parallel windows, no global ordering.  Phase 2: group totals (a
    {N_GROUPS}-row frame) get their own cumulative window — bounded
    input, safe on one partition — and rejoin by broadcast as each
    group's starting offset.  The resulting global offset is identical
    to a single ORDER BY (grp, doc_id) scan, which is exactly what the
    oracle computes with one flat window.

    Output: where each document lands in the packed token stream — its
    window (``pack_id``), position (``offset_in_pack``), and whether it
    straddles into the next window."""
    t = _with_tokens(load_table(spark, sf_dir, "documents"))
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
    start = (F.col("grp_before") + F.col("local_before")).alias(
        "start_offset"
    )
    return (
        local.join(F.broadcast(group_offsets), "grp")
        .select("doc_id", "n_tokens", start)
        .select(
            "doc_id",
            "n_tokens",
            "start_offset",
            F.floor(F.col("start_offset") / CTX).alias("pack_id"),
            (F.col("start_offset") % CTX).alias("offset_in_pack"),
            (
                (F.col("start_offset") % CTX) + F.col("n_tokens") > CTX
            ).alias("spans_boundary"),
        )
    )


_GREEDY_SCHEMA = (
    "doc_id long, grp long, n_tokens long, bin_idx long"
)


def _pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Next-fit within one group: one sequential pass, O(1) state."""
    pdf = pdf.sort_values("doc_id").reset_index(drop=True)
    bin_idx, fill = 0, 0
    out = []
    for i, n in enumerate(pdf["n_tokens"]):
        if i == 0:
            fill = n
        elif fill + n <= CTX:
            fill += n
        else:
            bin_idx += 1
            fill = n
        out.append(bin_idx)
    pdf["bin_idx"] = pd.Series(out, dtype="int64")
    return pdf[["doc_id", "grp", "n_tokens", "bin_idx"]]


@query(
    "pack_sequences_greedy",
    oracle=f"""
        WITH RECURSIVE t AS (
          SELECT doc_id,
                 CAST(doc_id % {N_GROUPS} AS BIGINT) AS grp,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                 ROW_NUMBER() OVER (
                   PARTITION BY doc_id % {N_GROUPS} ORDER BY doc_id
                 ) AS rn
          FROM documents
        ),
        rec AS (
          SELECT grp, rn, doc_id, n_tokens,
                 CAST(0 AS BIGINT) AS bin_idx,
                 n_tokens AS fill
          FROM t WHERE rn = 1
          UNION ALL
          SELECT t.grp, t.rn, t.doc_id, t.n_tokens,
                 CASE WHEN rec.fill + t.n_tokens <= {CTX}
                      THEN rec.bin_idx ELSE rec.bin_idx + 1 END,
                 CASE WHEN rec.fill + t.n_tokens <= {CTX}
                      THEN rec.fill + t.n_tokens ELSE t.n_tokens END
          FROM rec JOIN t ON t.grp = rec.grp AND t.rn = rec.rn + 1
        )
        SELECT doc_id, grp, n_tokens, bin_idx FROM rec
    """,
)
def pack_sequences_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy next-fit packing: documents stay whole; a bin closes when
    the next document would overflow CTX tokens (oversized documents get
    a bin of their own).  The fill recurrence is sequential by nature,
    so each group packs independently in one Arrow-batched
    ``applyInPandas`` pass — the legitimate use of the Python escape
    hatch (no built-in expresses a data-dependent running reset; DuckDB
    needs a recursive CTE for the same recurrence, which is the oracle).

    ``bin_idx`` is local to the group; a global bin id is just
    ``grp * max_bins + bin_idx`` and intentionally NOT materialized — at
    100 TB the consumer addresses shards by (grp, bin_idx) anyway."""
    t = _with_tokens(load_table(spark, sf_dir, "documents"))
    return t.groupBy("grp").applyInPandas(_pack_group, _GREEDY_SCHEMA)
