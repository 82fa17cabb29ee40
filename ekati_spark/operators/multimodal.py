"""Multimodal column conventions: image/audio/video as opaque ``binary``
columns with a typed metadata struct, plus Pandas-UDF plumbing for
decode / feature-extract / resize / frame-sample.

The container has no image/audio libraries, so the *decode* step is a
clearly-marked stub (``decode_image`` raises NotImplementedError unless
``fake=True``, which produces a deterministic fake decode); everything
Spark-side — schema, partitioning, Arrow batch shape, UDF signatures — is
real and tested (tests/test_multimodal.py).

Column convention:
    content      binary            raw bytes (opaque)
    media        struct<mime string, width int, height int,
                        duration_ms long, codec string>
At 100 TB binary payloads dominate row size: keep them in their own
parquet column (column pruning skips them unless referenced), size
``spark.sql.files.maxPartitionBytes`` so a task's batch of blobs fits in
executor memory, and never groupBy/shuffle the content column itself.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("codec", T.StringType(), True),
    ]
)


def with_media_columns(
    df: DataFrame, payload_col: str, mime: str = "application/octet-stream"
) -> DataFrame:
    """Attach the standard (content, media) multimodal column pair from an
    existing binary/string payload column."""
    content = F.col(payload_col).cast("binary")
    return df.withColumn("content", content).withColumn(
        "media",
        F.struct(
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("string").alias("codec"),
        ),
    )


def content_stats(df: DataFrame) -> DataFrame:
    """Cheap JVM-side stats over the binary payload (no decode)."""
    return df.withColumn("n_bytes", F.octet_length("content")).withColumn(
        "content_md5", F.md5("content")
    )


def decode_image(data: bytes, fake: bool = False) -> list[float]:
    """Decode an image payload into a feature vector.

    STUB: real decoding needs an image library absent from this container.
    ``fake=True`` produces a deterministic 8-float vector from the bytes
    (for plumbing tests); otherwise raises.
    """
    if not fake:
        raise NotImplementedError(
            "image decode requires an image library not present in this "
            "environment; pass fake=True for the deterministic test stub"
        )
    import hashlib

    h = hashlib.sha256(data or b"").digest()
    return [b / 255.0 for b in h[:8]]


def extract_features(
    df: DataFrame, fake: bool = True, batch_col: str = "content"
) -> DataFrame:
    """mapInPandas feature extraction: content binary → features array<double>.

    Arrow-batched; each batch decodes independently, so the operator scales
    linearly with partitions. The decode call is the stub above.
    """
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != batch_col]
        + [T.StructField("features", T.ArrayType(T.DoubleType()), True)]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_image(b, fake=fake) for b in pdf[batch_col]]
            out = pdf.drop(columns=[batch_col])
            out["features"] = feats
            yield out

    return df.mapInPandas(op, schema=out_schema)


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    id_col: str = "doc_id",
) -> DataFrame:
    """Frame-sampling plumbing: one row per sampled frame timestamp based on
    media.duration_ms (decode stubbed — emits frame offsets only).

    posexplode of a JVM-generated sequence: no Python in the hot path.
    """
    return (
        # NULL/zero-duration assets contribute zero frames — without the
        # filter, sequence(0, 0) emits a phantom frame at offset 0
        df.filter(F.col("media.duration_ms") > 0)
        .withColumn(
            "frame_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.col("media.duration_ms") - 1,
                    F.lit(every_ms),
                )
            ),
        )
        .select(id_col, "frame_ms", "media")
    )


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    fake: bool = True,
    batch_col: str = "content",
) -> DataFrame:
    """Resize plumbing: content binary -> resized binary + updated typed
    metadata (media.width/height reflect the target size).

    mapInPandas with the real Arrow batch shape; the pixel work is the
    container-stub (deterministic size-proportional truncate/pad when
    ``fake``, NotImplementedError otherwise — a deployment drops in
    PIL/cv2 here without touching the Spark plumbing). Per-row
    independent, so it scales linearly with partitions at 100 TB.
    """
    out_schema = df.schema

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = max(1, (width * height) // 64)
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image resizing needs an image library absent "
                    "from this environment; pass fake=True for the "
                    "deterministic stub"
                )
            out = pdf.copy()
            out[batch_col] = [
                (b or b"")[:target].ljust(target, b"\0")
                for b in pdf[batch_col]
            ]
            out["media"] = [
                {**(m or {}), "width": width, "height": height}
                for m in pdf["media"]
            ]
            yield out

    return df.mapInPandas(op, schema=out_schema)
