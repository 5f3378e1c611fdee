"""Text-analysis edge cases the sf fixtures never exercise: the driver's
documents corpus has a 10-token minimum, so short documents (the ANSI
element_at out-of-bounds class) get their own planted parquet fixture,
checked with FULL Spark-vs-DuckDB parity, not just "doesn't crash".
"""

from __future__ import annotations

import pandas as pd
import pytest

from tdk_apache_log_etl_spark.operators import ORACLES, QUERIES

from .parity import compare


@pytest.fixture(scope="module")
def short_doc_dir(tmp_path_factory):
    texts = [
        "single",
        "two words",
        "now three tokens",
        "a a a",
        "w x y z w x y z",
        "the quick brown fox jumps over the lazy dog again and again",
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["planted"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    d = tmp_path_factory.mktemp("shortdocs")
    pdf.to_parquet(d / "documents.parquet")
    return str(d)


@pytest.mark.parametrize(
    "name",
    [
        "doc_repetition_scores",
        "text_quality_scores",
        "bpe_token_stats",
        "top_tokens_global",
    ],
)
def test_text_queries_short_doc_parity(spark, short_doc_dir, name):
    ok, detail = compare(spark, name, QUERIES[name], ORACLES[name], short_doc_dir)
    assert ok, f"{name} on short docs: {detail}"
