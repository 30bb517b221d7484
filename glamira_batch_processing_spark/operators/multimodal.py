"""Multimodal column plumbing: binary payloads + typed metadata.

Images/audio/video are opaque ``binary`` columns with typed metadata
structs, decoded via Arrow-batched ``mapInPandas``.

Codec status (no third-party image/audio libraries ship in this
environment, so everything here is pure stdlib):
- image metadata decode (width/height/format) is REAL for PNG, GIF,
  BMP and JPEG containers — header/segment parsing with ``struct``,
  which is all the declared ``IMAGE_META_SCHEMA`` requires;
- audio metadata decode (channels/sample-rate/frames/duration) is REAL
  for WAV via the stdlib ``wave`` module;
- pixel/sample-level transforms (rasterize, resample) remain stubbed:
  ``_decode_pixels_real`` raises NotImplementedError, and unknown
  containers fall back to a clearly-labeled deterministic fake
  (``format='fake'``) so text-derived test payloads stay end-to-end
  runnable.

At scale: mapInPandas streams Arrow record batches through Python once
per partition (not per row); decode cost dominates, so parallelism is
set by input partitioning — repartition by a size-balanced key before
decode when payload sizes are skewed.
"""

from __future__ import annotations

import hashlib
import struct
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


# JPEG start-of-frame markers (C0-CF minus C4/C8/CC which are not SOF).
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def _decode_image_real(payload: bytes) -> tuple[int, int, str]:
    """Real container-header decode: (width, height, format).

    Pure stdlib ``struct`` parsing of the four ubiquitous containers —
    exactly the fields IMAGE_META_SCHEMA declares. Raises ValueError on
    anything unrecognized/truncated (callers choose fake-fallback or
    strict null).
    """
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        if len(payload) < 24 or payload[12:16] != b"IHDR":
            raise ValueError("png: truncated/missing IHDR")
        w, h = struct.unpack(">II", payload[16:24])
        return w, h, "png"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        if len(payload) < 10:
            raise ValueError("gif: truncated header")
        w, h = struct.unpack("<HH", payload[6:10])
        return w, h, "gif"
    if payload[:2] == b"BM":
        if len(payload) < 26:
            raise ValueError("bmp: truncated DIB header")
        w, h = struct.unpack("<ii", payload[18:26])
        return w, abs(h), "bmp"  # negative height = top-down rows
    if payload[:2] == b"\xff\xd8":
        i = 2
        while i + 9 <= len(payload):
            if payload[i] != 0xFF:
                break
            marker = payload[i + 1]
            if marker in _JPEG_SOF:
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return w, h, "jpeg"
            (seg_len,) = struct.unpack(">H", payload[i + 2 : i + 4])
            i += 2 + seg_len
        raise ValueError("jpeg: no SOF segment found")
    raise ValueError("unrecognized image container")


def _decode_pixels_real(payload: bytes):
    """Pixel-level rasterization hook — requires an image library
    (PIL/opencv). STUB: not available in this environment."""
    raise NotImplementedError("pixel codecs not available in this build")


def _decode_image_fake(payload: bytes) -> tuple[int, int, str]:
    """Deterministic fake decode: dimensions derived from payload size.

    Keeps every downstream stage (schema, grouping, resize math)
    exercised without a codec.
    """
    n = len(payload)
    return 64 + n % 64, 64 + (n * 7) % 64, "fake"


def decode_images(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    strict: bool = False,
) -> DataFrame:
    """binary payload -> typed image metadata via mapInPandas.

    Real header decode for PNG/GIF/BMP/JPEG containers; unrecognized
    payloads fall back to the deterministic fake (``format='fake'``)
    unless ``strict``, in which case they surface as NULL dims with
    ``format='error'``. One Arrow batch in, one out; constant memory
    per partition.
    """

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            payloads = pdf[payload_col]
            rows = []
            for doc_id, payload in zip(pdf[id_col], payloads):
                b = bytes(payload)
                try:
                    w, h, fmt = _decode_image_real(b)
                except ValueError:
                    if strict:
                        w, h, fmt = None, None, "error"
                    else:
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


def image_bytes(fmt: str, width: int, height: int) -> bytes:
    """Render a genuine image container of the given dimensions — the
    image test/oracle payload generator (pure stdlib).

    - ``png``: complete valid PNG (signature, IHDR, zlib IDAT with
      per-row filter bytes, IEND, real CRCs);
    - ``bmp``: complete valid 24bpp BITMAPINFOHEADER file;
    - ``gif``: GIF89a container with logical screen descriptor and
      trailer (no frames — structurally valid, header-true).
    """
    import zlib

    if fmt == "png":
        sig = b"\x89PNG\r\n\x1a\n"

        def chunk(tag: bytes, data: bytes) -> bytes:
            return (
                struct.pack(">I", len(data))
                + tag
                + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
        raw = (b"\x00" + b"\x7f" * (width * 3)) * height
        return (
            sig
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 9))
            + chunk(b"IEND", b"")
        )
    if fmt == "gif":
        return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00" + b"\x3b"
    if fmt == "bmp":
        row = (width * 3 + 3) & ~3
        pix = b"\x7f" * (row * height)
        return (
            b"BM"
            + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
            + struct.pack(
                "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pix), 2835, 2835, 0, 0
            )
            + pix
        )
    raise ValueError(f"unsupported render format: {fmt}")


AUDIO_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", LongType()),
        StructField("duration_ms", LongType()),
        StructField("format", StringType()),
    ]
)


def wav_bytes(
    n_frames: int, sample_rate: int = 8000, n_channels: int = 1, seed: int = 0
) -> bytes:
    """Render a real PCM16 WAV container with deterministic samples —
    the audio test/oracle payload generator (stdlib ``wave``)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        frames = bytearray()
        x = (seed * 2654435761 + 1) & 0xFFFFFFFF
        for _ in range(n_frames * n_channels):
            x = (x * 1103515245 + 12345) & 0xFFFFFFFF
            frames += struct.pack("<h", (x >> 16) - 32768)
        w.writeframes(bytes(frames))
    return buf.getvalue()


def decode_audio(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """binary payload -> typed audio metadata via mapInPandas.

    REAL decode for WAV containers (stdlib ``wave``): channel count,
    sample rate, frame count, duration. Non-WAV payloads surface as
    NULL metadata with ``format='error'`` — audio pipelines filter on
    ``format`` rather than crashing mid-scan on one bad object.
    """

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import io
        import wave

        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                try:
                    with wave.open(io.BytesIO(b), "rb") as w:
                        nch = w.getnchannels()
                        rate = w.getframerate()
                        nfr = w.getnframes()
                    rows.append(
                        (
                            int(doc_id),
                            len(b),
                            nch,
                            rate,
                            nfr,
                            nfr * 1000 // rate if rate else None,
                            "wav",
                        )
                    )
                except (wave.Error, EOFError):
                    rows.append((int(doc_id), len(b), None, None, None, None, "error"))
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_META_SCHEMA.fields]
            )

    return df.select(id_col, payload_col).mapInPandas(fn, AUDIO_META_SCHEMA)


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
