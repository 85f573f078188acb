"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct.
The Spark-side plumbing — schema, Arrow batch shape, ``mapInPandas``
UDF signatures, partitioning — is real and tested; the actual codec
step is STUBBED (the decode libraries are not in this container):
:func:`decode_image_batches` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake decoder derives
width/height/channel stats purely from the bytes (so tests exercise
the full distributed path).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), True),       # image|audio|video
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("mime", T.StringType(), True),
])

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("byte_len", T.LongType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("channels", T.IntegerType(), True),
    T.StructField("mean_luma", T.DoubleType(), True),
])


def media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap JVM-side metadata — no Python, no decode: byte length,
    md5 digest, magic-byte sniffing."""
    p = F.col(payload_col)
    return df.withColumn("byte_len", F.length(p).cast("long")).withColumn(
        "digest", F.md5(p)
    ).withColumn(
        "sniffed_mime",
        F.when(F.hex(F.substring(p, 1, 3)) == "FFD8FF", "image/jpeg")
        .when(F.hex(F.substring(p, 1, 4)) == "89504E47", "image/png")
        .otherwise(F.lit("application/octet-stream")),
    )


def _fake_decode(payload: bytes | None) -> tuple[int, int, int, int, float]:
    """Deterministic fake 'decode': dimensions/stats derived from md5
    of the bytes. Stands in for PIL/ffmpeg so the distributed plumbing
    (schema, batching, skew) is testable in this container."""
    if payload is None:
        return (0, 0, 0, 0, 0.0)
    d = hashlib.md5(bytes(payload)).digest()
    width = 64 + d[0] % 192
    height = 64 + d[1] % 192
    channels = 1 + d[2] % 3
    mean_luma = d[3] / 255.0
    return (len(payload), width, height, channels, mean_luma)


def decode_image_batches(df: DataFrame, fake: bool = False) -> DataFrame:
    """mapInPandas image decode -> feature rows.

    Real implementation would decode with PIL inside the batch loop;
    this container has no codec libs, so ``fake=False`` raises
    (clearly-marked stub per the build contract)."""
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/ffmpeg (not in this container); "
            "pass fake=True for the deterministic stub decoder"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = [
                (int(mid),) + _fake_decode(payload)
                for mid, payload in zip(pdf["media_id"], pdf["payload"])
            ]
            yield pd.DataFrame(
                out, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields]
            )

    return df.select("media_id", "payload").mapInPandas(
        batches, schema=IMAGE_FEATURES_SCHEMA
    )


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stub: passes payload through and records intent columns;
    a real kernel swaps into the same mapInPandas shape."""
    return df.withColumn("target_width", F.lit(width)).withColumn(
        "target_height", F.lit(height)
    )


def frame_sample_plan(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: one output row per planned frame
    (posexplode over a sequence sized by payload length — the
    partition-explosion shape real frame extraction has), decode
    stubbed."""
    n_frames = F.greatest(
        (F.length("payload") / 1000).cast("int"), F.lit(1)
    )
    return df.select(
        "media_id", n_frames.alias("est_frames"),
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
