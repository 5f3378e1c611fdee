"""Multimodal binary columns: treat image/audio/video payloads as opaque
``binary`` columns with typed metadata, processed via Arrow-batched
``mapInPandas``.

The container has no image/audio libraries, so the DECODE step is stubbed —
``decode_image_real`` raises NotImplementedError unless PIL is importable —
but everything Spark-side is real and tested: the binary column plumbing,
the mapInPandas schema/batch shape, deterministic fake feature extraction,
and the partitioning story (binary payloads stay distributed; only derived
scalar metadata is ever aggregated).

At 100 TB: binary payloads dominate bytes → keep them in their own parquet
column (never in shuffle keys), size spark.sql.files.maxPartitionBytes so a
task's batch of payloads fits executor memory, and extract features early so
downstream stages carry only scalars.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query


@query(
    "multimodal_binary_meta",
    oracle="""
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               sha256(text) AS payload_sha256
        FROM documents
    """,
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata, all native: byte length + content hash of the
    payload (here synthesized by UTF-8-encoding ``documents.text``; in a real
    corpus this is the stored blob). The point: typed metadata derives from
    binary without Python."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        F.length(payload).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("payload_sha256"),
    )


IMAGE_FEATURE_SCHEMA = (
    "doc_id long, n_bytes int, width int, height int, channels int, "
    "mean_intensity double"
)


def extract_image_features(images: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over (doc_id, payload binary).

    The decode is a STUB: a real pipeline would replace ``_fake_decode``
    with PIL/libvips/ffmpeg. Deterministic fake: dimensions and intensity
    derive from the payload's sha256, so outputs are stable across runs and
    engines. The Spark-side contract (Arrow batches in, typed rows out,
    1:1 per input row) is the real, tested part.
    """
    import hashlib

    import pandas as pd

    def _fake_decode(payload: bytes) -> tuple[int, int, int, float]:
        d = hashlib.sha256(payload).digest()
        width = 64 + d[0] * 4
        height = 64 + d[1] * 4
        channels = 3
        mean_intensity = d[2] / 255.0
        return width, height, channels, mean_intensity

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "channels": [d[2] for d in decoded],
                    "mean_intensity": [d[3] for d in decoded],
                }
            )

    return images.mapInPandas(feats, IMAGE_FEATURE_SCHEMA)


def decode_image_real(payload: bytes):
    """Real image decode — requires PIL (``pip install .[media]``)."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "image decoding requires PIL/pillow; this environment ships "
            "without image libraries — use extract_image_features (stub)"
        ) from exc
    import io

    from PIL import Image

    return Image.open(io.BytesIO(payload))  # pragma: no cover


def extract_image_features_real(images: DataFrame) -> DataFrame:
    """The REAL decoder behind the exact same contract as
    ``extract_image_features``: Arrow-batched ``mapInPandas`` over
    (doc_id, payload binary) → IMAGE_FEATURE_SCHEMA, 1:1 per input row.
    Requires PIL on the EXECUTORS (``pip install .[media]``); the
    import lives inside the batch fn so the driver can build the plan
    without it and only tasks fail fast when the library is missing.
    tests/test_multimodal_real.py exercises this end-to-end wherever
    pillow is installable (importorskip elsewhere)."""
    import pandas as pd

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        import numpy as np
        from PIL import Image

        for pdf in batches:
            rows = {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": [len(p) for p in pdf["payload"]],
                "width": [],
                "height": [],
                "channels": [],
                "mean_intensity": [],
            }
            for payload in pdf["payload"]:
                img = Image.open(io.BytesIO(payload))
                rows["width"].append(img.width)
                rows["height"].append(img.height)
                rows["channels"].append(len(img.getbands()))
                rows["mean_intensity"].append(
                    float(np.asarray(img.convert("L"), dtype="float64").mean())
                    / 255.0
                )
            yield pd.DataFrame(rows)

    return images.mapInPandas(feats, IMAGE_FEATURE_SCHEMA)


@query("image_feature_extract")  # rows-only: stubbed decode, no SQL oracle
def image_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E-multimodal: binary payload → mapInPandas → typed features. Payloads
    synthesized from documents.text; decode stubbed (see
    extract_image_features)."""
    docs = load_table(spark, sf_dir, "documents")
    images = docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return extract_image_features(images)


@query("media_frame_sample")  # rows-only
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E-multimodal: frame sampling plumbing — given per-asset metadata
    (duration derived deterministically from the payload), emit one row per
    sampled frame offset via native sequence+explode. The decode of actual
    frames is the stubbed step; the fan-out (1 asset → k frame rows) is the
    real distributed pattern (explode, not driver loops)."""
    docs = load_table(spark, sf_dir, "documents")
    duration_s = (F.crc32(F.col("text").cast("binary")) % 30 + 1).cast("int")
    frames = docs.select(
        "doc_id",
        duration_s.alias("duration_s"),
        F.explode(
            F.sequence(F.lit(0), duration_s - 1, F.lit(5))
        ).alias("frame_offset_s"),
    )
    return frames


RESIZE_SCHEMA = "doc_id long, width int, height int, payload binary"
RESIZE_TARGET = (32, 32)


def resize_images(images: DataFrame, target=RESIZE_TARGET) -> DataFrame:
    """mapInPandas resize plumbing: (doc_id, payload) → (doc_id, w, h,
    resized payload). The pixel resample is the stubbed step (real:
    PIL.Image.resize); the stub emits a deterministic fixed-size payload
    (sha256-seeded) so schema, batch shape, and byte budget are real. The
    contract that matters at scale: output payload size is BOUNDED
    (target w*h*3), so downstream stages can size partitions statically
    even when input images vary wildly."""
    import hashlib

    import pandas as pd

    w, h = target
    out_len = w * h * 3

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for p in pdf["payload"]:
                seed = hashlib.sha256(p).digest()
                reps = out_len // len(seed) + 1
                payloads.append((seed * reps)[:out_len])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": w,
                    "height": h,
                    "payload": payloads,
                }
            )

    return images.mapInPandas(_resize, RESIZE_SCHEMA)


@query("image_resize")  # rows-only: stubbed resample, no SQL oracle
def image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E-multimodal: bounded-size resize. Output drops the raw payload and
    reports sizes only (the driver's value-hash would otherwise carry 3 KB
    of binary per row through the compare)."""
    docs = load_table(spark, sf_dir, "documents")
    images = docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    resized = resize_images(images)
    return resized.select(
        "doc_id", "width", "height", F.length("payload").alias("n_bytes")
    )


@query(
    "media_dedup_by_hash",
    oracle="""
        SELECT sha256(text) AS payload_sha256,
               MIN(doc_id) AS doc_id,
               COUNT(*) AS n_copies,
               MIN(octet_length(encode(text))) AS n_bytes
        FROM documents GROUP BY 1
    """,
)
def media_dedup_by_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 for media: exact dedup of binary payloads by content digest with
    a deterministic survivor (min doc_id). The groupBy key is the 32-byte
    sha256, computed scan-side — at 100 TB the shuffle carries digests and
    counts, NEVER the payloads (grouping multi-MB blobs directly would move
    the whole corpus through the exchange). Same survivor rule as
    dedup_exact_docs; collision risk at 2^-128 is below hardware error."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return (
        docs.select(
            F.sha2(payload, 256).alias("payload_sha256"),
            "doc_id",
            F.length(payload).cast("long").alias("n_bytes"),
        )
        .groupBy("payload_sha256")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.min("n_bytes").alias("n_bytes"),
        )
    )
