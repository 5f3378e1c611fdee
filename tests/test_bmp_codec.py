"""Pure-numpy BMP codec tests — REAL image decode with no external
libraries, so unlike test_multimodal_real.py (PIL-gated) these run in
THIS container unconditionally."""

from __future__ import annotations


# ---------------------------------------------------------------------------
# Pure-numpy BMP codec — REAL decode with no external libraries, so these
# run in THIS container (no importorskip).
# ---------------------------------------------------------------------------


def test_bmp_roundtrip_pixel_exact_with_padding():
    import numpy as np

    from tdk_apache_log_etl_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
    )

    rng = np.random.default_rng(42)
    # widths 1..6 exercise every row-padding remainder (3w mod 4)
    for w in range(1, 7):
        for h in (1, 3, 5):
            arr = rng.integers(0, 256, size=(h, w, 3), dtype="uint8")
            assert (decode_bmp(encode_bmp(arr)) == arr).all(), (w, h)


def test_bmp_decoder_rejects_non_bmp_and_unsupported():
    import pytest

    from tdk_apache_log_etl_spark.operators.multimodal import decode_bmp

    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"\x89PNG----------------------------------------------")


def test_bmp_resize_real_nearest_neighbor(spark):
    import numpy as np

    from tdk_apache_log_etl_spark.operators.multimodal import (
        RESIZE_TARGET,
        decode_bmp,
        encode_bmp,
        resize_images_bmp,
    )

    # a 2x2 checkerboard upscaled keeps only the four source colors in
    # their quadrants under nearest-neighbor
    arr = np.zeros((2, 2, 3), dtype="uint8")
    arr[0, 0] = (255, 0, 0)
    arr[0, 1] = (0, 255, 0)
    arr[1, 0] = (0, 0, 255)
    arr[1, 1] = (255, 255, 255)
    df = spark.createDataFrame(
        [(1, bytearray(encode_bmp(arr)))], "doc_id long, payload binary"
    )
    out = resize_images_bmp(df).collect()[0]
    w, h = RESIZE_TARGET
    assert (out.width, out.height) == (w, h)
    resized = decode_bmp(bytes(out.payload))
    assert resized.shape == (h, w, 3)
    assert tuple(resized[0, 0]) == (255, 0, 0)
    assert tuple(resized[0, w - 1]) == (0, 255, 0)
    assert tuple(resized[h - 1, 0]) == (0, 0, 255)
    assert tuple(resized[h - 1, w - 1]) == (255, 255, 255)


def test_bmp_feature_extract_matches_direct_computation(spark):
    from tdk_apache_log_etl_spark.operators.multimodal import (
        decode_bmp,
        make_synthetic_bmp,
    )
    from tdk_apache_log_etl_spark.operators import QUERIES

    from .conftest import SF_DIR_SMOKE

    rows = QUERIES["bmp_feature_extract"](spark, SF_DIR_SMOKE).limit(20).collect()
    assert rows
    for r in rows:
        arr = decode_bmp(make_synthetic_bmp(r.doc_id))
        h, w, c = arr.shape
        assert (r.width, r.height, r.channels) == (w, h, c)
        assert r.mean_intensity == float(int(arr.sum(dtype="int64"))) / (
            w * h * c
        ) / 255


# ---------------------------------------------------------------------------
# WAV codec — same library-free discipline for audio.
# ---------------------------------------------------------------------------


def test_wav_roundtrip_sample_exact():
    import numpy as np

    from tdk_apache_log_etl_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    rng = np.random.default_rng(7)
    for n in (1, 2, 255, 1024):
        samples = rng.integers(-32768, 32768, size=n, dtype="int16")
        rate, back = decode_wav(encode_wav(samples, rate=16000))
        assert rate == 16000
        assert (back == samples).all()


def test_wav_decoder_walks_extra_chunks():
    import struct

    import numpy as np

    from tdk_apache_log_etl_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    samples = np.arange(-5, 5, dtype="int16")
    raw = encode_wav(samples)
    # splice a LIST chunk (odd size -> exercises word alignment) between
    # fmt and data
    extra = struct.pack("<4sI", b"LIST", 3) + b"abc\x00"
    spliced = raw[:36] + extra + raw[36:]
    spliced = spliced[:4] + struct.pack(
        "<I", len(spliced) - 8
    ) + spliced[8:]
    rate, back = decode_wav(spliced)
    assert (back == samples).all()


def test_wav_decoder_rejects_non_wav():
    import pytest

    from tdk_apache_log_etl_spark.operators.multimodal import decode_wav

    with pytest.raises(ValueError, match="not a WAV"):
        decode_wav(b"OggS" + b"\x00" * 64)


def test_wav_feature_extract_matches_direct_computation(spark):
    from tdk_apache_log_etl_spark.operators import QUERIES
    from tdk_apache_log_etl_spark.operators.multimodal import (
        decode_wav,
        make_synthetic_wav,
    )

    from .conftest import SF_DIR_SMOKE

    rows = (
        QUERIES["wav_feature_extract"](spark, SF_DIR_SMOKE).limit(20).collect()
    )
    assert rows
    for r in rows:
        rate, s = decode_wav(make_synthetic_wav(r.doc_id))
        s64 = s.astype("int64")
        assert r.sample_rate == rate
        assert r.n_samples == len(s)
        assert r.mean_square == float(int((s64 * s64).sum())) / len(s)
        assert r.zero_crossings == int(
            ((s64[:-1] >= 0) != (s64[1:] >= 0)).sum()
        )


# ---------------------------------------------------------------------------
# Y4M codec — the video member of the library-free trio.
# ---------------------------------------------------------------------------


def test_y4m_roundtrip_frame_exact():
    import numpy as np

    from tdk_apache_log_etl_spark.operators.multimodal import (
        decode_y4m,
        encode_y4m,
    )

    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, size=(5, 4, 7), dtype="uint8")
    w, h, fps, back = decode_y4m(encode_y4m(frames, fps=(30, 1)))
    assert (w, h, fps) == (7, 4, (30, 1))
    assert (back == frames).all()


def test_y4m_rejects_bad_marker_and_signature():
    import numpy as np
    import pytest

    from tdk_apache_log_etl_spark.operators.multimodal import (
        decode_y4m,
        encode_y4m,
    )

    with pytest.raises(ValueError, match="not a YUV4MPEG2"):
        decode_y4m(b"RIFFxxxx\n" + b"\x00" * 32)
    raw = bytearray(encode_y4m(np.zeros((2, 2, 2), dtype="uint8")))
    nl = bytes(raw).index(b"\n")
    raw[nl + 1 : nl + 6] = b"FRAMX"  # corrupt the first frame marker
    with pytest.raises(ValueError, match="bad FRAME marker"):
        decode_y4m(bytes(raw))


def test_y4m_frame_sampler_strides_and_averages(spark):
    from tdk_apache_log_etl_spark.operators import QUERIES
    from tdk_apache_log_etl_spark.operators.multimodal import (
        Y4M_FRAME_STRIDE,
        decode_y4m,
        make_synthetic_y4m,
    )

    from .conftest import SF_DIR_SMOKE

    rows = QUERIES["y4m_frame_sample"](spark, SF_DIR_SMOKE).limit(40).collect()
    assert rows
    for r in rows:
        assert r.frame_idx % Y4M_FRAME_STRIDE == 0
        w, h, _fps, frames = decode_y4m(make_synthetic_y4m(r.doc_id))
        arr = frames[r.frame_idx].astype("int64")
        assert r.mean_intensity == float(int(arr.sum())) / (w * h) / 255


def test_wav_frame_features_framing_and_tail(spark, tmp_path):
    """E246: frame boundaries, the 1-sample tail frame, and the
    intra-frame crossing convention, against a direct decode."""
    import pandas as pd

    from tdk_apache_log_etl_spark.operators import ORACLES, QUERIES
    from tdk_apache_log_etl_spark.operators.multimodal import (
        WAV_FRAME,
        decode_wav,
        make_synthetic_wav,
    )

    from .parity import compare

    # doc 0 -> n=256 (exactly 4 frames); doc 1 -> n=257 (1-sample tail)
    pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": ["x", "y"],
            "lang": ["en"] * 2,
            "source": ["s"] * 2,
            "n_chars": [1, 1],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    rows = {
        (r.doc_id, r.frame_idx): r
        for r in QUERIES["wav_frame_features"](spark, str(tmp_path)).collect()
    }
    assert sorted(k for k in rows if k[0] == 0) == [(0, f) for f in range(4)]
    assert sorted(k for k in rows if k[0] == 1) == [(1, f) for f in range(5)]
    tail = rows[(1, 4)]
    assert (tail.n_in_frame, tail.zero_crossings) == (1, 0)
    # spot-check one frame against a direct decode
    _r, s = decode_wav(make_synthetic_wav(0))
    seg = s.astype("int64")[:WAV_FRAME]
    f0 = rows[(0, 0)]
    assert f0.mean_square == float(int((seg * seg).sum())) / WAV_FRAME
    assert f0.zero_crossings == int(
        ((seg[:-1] >= 0) != (seg[1:] >= 0)).sum()
    )
    ok, detail = compare(
        spark,
        "wav_frame_features",
        QUERIES["wav_frame_features"],
        ORACLES["wav_frame_features"],
        str(tmp_path),
    )
    assert ok, detail
