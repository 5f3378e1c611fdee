"""Real image decode through the production mapInPandas contract.

Skipped wherever pillow isn't installed (this container ships without
image libraries — ``pip install .[media]`` enables it); the point is
that the REAL decoder and the deterministic stub share one schema,
batch shape, and 1:1 row contract, so swapping them is a one-line
change, not a re-plumb.
"""

from __future__ import annotations

import io

import pytest

PIL = pytest.importorskip("PIL")

from PIL import Image  # noqa: E402

from tdk_apache_log_etl_spark.operators.multimodal import (  # noqa: E402
    extract_image_features,
    extract_image_features_real,
)


def _png_bytes(w, h, color):
    buf = io.BytesIO()
    Image.new("RGB", (w, h), color).save(buf, format="PNG")
    return buf.getvalue()


def test_real_decode_same_contract_as_stub(spark):
    payloads = [
        (1, _png_bytes(8, 4, (255, 255, 255))),
        (2, _png_bytes(16, 16, (0, 0, 0))),
        (3, _png_bytes(3, 5, (255, 0, 0))),
    ]
    images = spark.createDataFrame(payloads, "doc_id long, payload binary")

    real = extract_image_features_real(images)
    stub = extract_image_features(images)
    # one schema, both paths
    assert real.schema == stub.schema
    rows = {r.doc_id: r for r in real.collect()}
    assert len(rows) == 3  # 1:1 per input row

    assert (rows[1].width, rows[1].height) == (8, 4)
    assert (rows[2].width, rows[2].height) == (16, 16)
    assert (rows[3].width, rows[3].height) == (3, 5)
    assert rows[1].channels == 3
    assert rows[1].mean_intensity == pytest.approx(1.0)
    assert rows[2].mean_intensity == pytest.approx(0.0)
    assert 0.0 < rows[3].mean_intensity < 1.0

