"""End-to-end corpus-preparation pipeline: stage consistency against the
individual operators, packing invariants on the survivor set, and the
partitioned manifest round-trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from tdk_apache_log_etl_spark.operators import QUERIES
from tdk_apache_log_etl_spark.pipeline_corpus import MIN_TOKENS, prepare_corpus
from tdk_apache_log_etl_spark.sources.tables import load_table

from .conftest import SF_DIR_SMOKE


def test_manifest_consistent_with_operators(spark):
    manifest = prepare_corpus(spark, SF_DIR_SMOKE)
    rows = manifest.collect()
    # survivors are a subset of the corpus, non-empty, unique
    ids = [r.doc_id for r in rows]
    assert len(ids) == len(set(ids)) > 0
    docs = load_table(spark, SF_DIR_SMOKE, "documents")
    assert len(ids) <= docs.count()

    # no survivor is blocklist-dropped or under the token floor
    dropped = {
        r.doc_id
        for r in QUERIES["blocklist_scrub"](spark, SF_DIR_SMOKE)
        .filter("dropped")
        .collect()
    }
    assert not dropped.intersection(ids)
    short = {
        r.doc_id
        for r in docs.filter(
            F.size(F.split("text", " ")) < MIN_TOKENS
        ).collect()
    }
    assert not short.intersection(ids)

    # survivors of the standalone near-dup clustering that also pass the
    # hygiene stage all appear (the pipeline drops only cluster
    # non-canonicals among them)
    canon = {
        r.doc_id
        for r in QUERIES["dedup_cluster_canonical"](spark, SF_DIR_SMOKE)
        .filter("doc_id = canonical_id")
        .collect()
    }
    eligible = canon - dropped - short
    # every manifest doc is canonical in SOME clustering of the filtered
    # set; at minimum the sets overlap heavily
    assert len(eligible.intersection(ids)) >= 0.9 * len(ids)

    # pack offsets are contiguous over the survivor stream
    rows.sort(key=lambda r: (r.pack_id, r.offset_in_pack))
    from tdk_apache_log_etl_spark.operators.packing import CTX

    pos = 0
    for r in rows:
        assert r.pack_id == pos // CTX
        assert r.offset_in_pack == pos % CTX
        pos += r.n_tokens


def test_manifest_write_partitions_by_source(spark, tmp_path):
    out = str(tmp_path / "manifest")
    prepare_corpus(spark, SF_DIR_SMOKE, out_dir=out)
    back = spark.read.parquet(out)
    assert back.count() > 0
    assert set(back.columns) == {
        "doc_id", "source", "n_tokens", "pack_id", "offset_in_pack",
    }
    # partition pruning on source reads a subset
    one_source = back.select("source").first().source
    pruned = spark.read.parquet(out).filter(F.col("source") == one_source)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
