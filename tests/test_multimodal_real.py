"""Real image decode through the production mapInPandas contract.

``extract_image_features`` (BMP, library-free) always runs here; the
PIL-backed general-format path (``extract_image_features_real``) is
skipped wherever pillow isn't installed (this container ships without
image libraries — ``pip install .[media]`` enables it). Both share one
schema, batch shape, and 1:1 row contract, so swapping decoders is a
one-line change, not a re-plumb — proven by decoding the SAME BMP bytes
through both paths where PIL exists.
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


def _bmp_bytes(w, h, color):
    buf = io.BytesIO()
    Image.new("RGB", (w, h), color).save(buf, format="BMP")
    return buf.getvalue()


def test_real_decode_same_contract_as_bmp_codec(spark):
    payloads = [
        (1, _bmp_bytes(8, 4, (255, 255, 255))),
        (2, _bmp_bytes(16, 16, (0, 0, 0))),
        (3, _bmp_bytes(3, 5, (255, 0, 0))),
    ]
    images = spark.createDataFrame(payloads, "doc_id long, payload binary")

    real = extract_image_features_real(images)
    ours = extract_image_features(images)
    # one schema, both paths
    assert real.schema == ours.schema

    real_rows = {r.doc_id: r for r in real.collect()}
    our_rows = {r.doc_id: r for r in ours.collect()}
    assert len(our_rows) == 3  # 1:1 per input row

    # PIL's decode and the struct/numpy codec agree on the same bytes
    for doc_id in (1, 2, 3):
        a, b = real_rows[doc_id], our_rows[doc_id]
        assert (a.width, a.height, a.channels) == (b.width, b.height, b.channels)
        assert a.mean_intensity == pytest.approx(b.mean_intensity)

    assert (our_rows[1].width, our_rows[1].height) == (8, 4)
    assert (our_rows[2].width, our_rows[2].height) == (16, 16)
    assert (our_rows[3].width, our_rows[3].height) == (3, 5)
    assert our_rows[1].mean_intensity == pytest.approx(1.0)
    assert our_rows[2].mean_intensity == pytest.approx(0.0)
    assert 0.0 < our_rows[3].mean_intensity < 1.0
