"""Batch/stream operator reuse: the SAME hygiene expression graph that
backs the batch `blocklist_scrub` query runs over a JSONL file stream
(readStream + the textual source's declared schema) — stateless narrow
transformations compose into Structured Streaming unchanged."""

from __future__ import annotations

from pyspark.sql import types as T

from tdk_apache_log_etl_spark.operators.hygiene import scrub_columns
from tdk_apache_log_etl_spark.sources.textual import DOCUMENTS_DDL


def test_blocklist_scrub_over_jsonl_stream(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    (src / "batch1.jsonl").write_text(
        '{"doc_id": 1, "text": "slow query on a big table with eight more words", '
        '"lang": "en", "source": "w", "n_chars": 0}\n'
        '{"doc_id": 2, "text": "fast query on a small table", '
        '"lang": "en", "source": "w", "n_chars": 0}\n'
    )
    stream = (
        spark.readStream.schema(T.StructType.fromDDL(DOCUMENTS_DDL))
        .json(str(src))
    )
    assert stream.isStreaming
    q = (
        scrub_columns(stream)
        .writeStream.format("memory")
        .queryName("scrubbed_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.doc_id: r for r in spark.sql("SELECT * FROM scrubbed_stream").collect()
    }
    assert got[1].dropped and got[1].n_blocked == 2
    assert got[1].clean_text == "query on a table with eight more words"
    assert not got[2].dropped
    assert got[2].clean_text == "fast query on a small table"
