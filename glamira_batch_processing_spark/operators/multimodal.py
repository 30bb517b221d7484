"""Multimodal column plumbing: binary payloads + typed metadata.

Images/audio/video are opaque ``binary`` columns with typed metadata
structs. The Spark-side plumbing — schemas, Arrow batch shapes,
mapInPandas signatures, partitioning — is real and tested; the actual
codec work is stubbed (the image/audio libraries are not available in
this environment) behind ``_decode_image_real`` raising
NotImplementedError, with a deterministic fake used instead so the
pipeline is end-to-end testable.

At scale: mapInPandas streams Arrow record batches through Python once
per partition (not per row); decode cost dominates, so parallelism is
set by input partitioning — repartition by a size-balanced key before
decode when payload sizes are skewed.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

IMAGE_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("checksum", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("format", StringType()),
    ]
)

FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("frame_bytes", BinaryType()),
        StructField("frame_checksum", StringType()),
    ]
)


def _decode_image_real(payload: bytes) -> tuple[int, int, str]:
    """Real codec hook — requires an image library (PIL/opencv).

    STUB: not available in this environment.
    """
    raise NotImplementedError("image codecs not available in this build")


def _decode_image_fake(payload: bytes) -> tuple[int, int, str]:
    """Deterministic fake decode: dimensions derived from payload size.

    Keeps every downstream stage (schema, grouping, resize math)
    exercised without a codec.
    """
    n = len(payload)
    return 64 + n % 64, 64 + (n * 7) % 64, "fake"


def decode_images(df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """binary payload -> typed image metadata via mapInPandas.

    One Arrow batch in, one out; constant memory per partition.
    """

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            payloads = pdf[payload_col]
            rows = []
            for doc_id, payload in zip(pdf[id_col], payloads):
                b = bytes(payload)
                w, h, fmt = _decode_image_fake(b)
                rows.append(
                    (
                        int(doc_id),
                        len(b),
                        hashlib.md5(b).hexdigest(),
                        w,
                        h,
                        fmt,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_META_SCHEMA.fields]
            )

    return df.select(id_col, payload_col).mapInPandas(fn, IMAGE_META_SCHEMA)


def resize_plan(meta: DataFrame, max_side: int = 96) -> DataFrame:
    """Pure-Column resize math over decoded metadata: target dims
    preserving aspect ratio, capped at ``max_side`` (integer floor)."""
    scale_num = F.lit(max_side)
    longest = F.greatest("width", "height")
    tw = F.floor(F.col("width") * scale_num / longest).cast("int")
    th = F.floor(F.col("height") * scale_num / longest).cast("int")
    return meta.withColumn(
        "target_width", F.when(longest <= max_side, F.col("width")).otherwise(tw)
    ).withColumn(
        "target_height", F.when(longest <= max_side, F.col("height")).otherwise(th)
    )


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    frame_size: int = 32,
    stride: int = 96,
) -> DataFrame:
    """Frame sampling stub for video-ish payloads: every ``stride`` bytes
    emit a ``frame_size``-byte 'frame'. Demonstrates the 1->N mapInPandas
    shape (output rows != input rows)."""

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                for k, off in enumerate(range(0, len(b), stride)):
                    frame = b[off : off + frame_size]
                    rows.append(
                        (int(doc_id), k, frame, hashlib.md5(frame).hexdigest())
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SAMPLE_SCHEMA.fields]
            )

    return df.select(id_col, payload_col).mapInPandas(fn, FRAME_SAMPLE_SCHEMA)


FEATURE_DIM = 8

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def extract_features(df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """binary payload -> fixed-dim float feature vector via mapInPandas.

    The embedding-model stand-in (audio MFCC / image CNN feature hook):
    deterministic fake features from the payload's md5 digest bytes,
    scaled to [-1, 1). Real extractors slot into the same Arrow-batched
    signature; the output column is a first-class embedding usable by
    operators/similarity.py.
    """

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                digest = hashlib.md5(bytes(payload)).digest()
                feat = [
                    (int.from_bytes(digest[2 * i : 2 * i + 2], "big") - 32768) / 32768.0
                    for i in range(FEATURE_DIM)
                ]
                rows.append((int(doc_id), feat))
            yield pd.DataFrame(rows, columns=["doc_id", "feature"])

    return df.select(id_col, payload_col).mapInPandas(fn, FEATURE_SCHEMA)


def with_text_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach a binary payload column derived from text (the test stand-in
    for real image/audio bytes)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))
