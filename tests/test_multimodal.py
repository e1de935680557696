"""Multimodal plumbing: schema, Arrow batch shape, REAL PPM decode."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from grobid_clinical_report_spark import multimodal

SF = "/root/testdata/sf0.001"


def test_media_table_schema(spark):
    m = multimodal.media_table(spark, SF)
    assert dict(m.dtypes)["payload"] == "binary"
    assert dict(m.dtypes)["width"] == "int"


def test_media_table_payloads_are_valid_containers(spark):
    """Every synthesized payload must be REAL and type-correct: P6 images
    the decoder (or any netpbm reader) opens with dims matching the
    metadata columns, Y4M streams the video probe walks end-to-end, and
    RIFF/WAVE PCM files the audio probe parses."""
    rows = multimodal.media_table(spark, SF).limit(16).collect()
    seen = set()
    for r in rows:
        mt = r["media_type"]
        if mt.startswith("video/"):
            info = multimodal.probe_y4m(bytes(r["payload"]))
            assert (info.width, info.height) == (r["width"], r["height"])
            assert (info.fps_num, info.fps_den) == multimodal._Y4M_FPS
            assert info.n_frames >= 8
            assert (
                info.duration_ms
                == info.n_frames * multimodal._FRAME_MS
            )
        elif mt.startswith("audio/"):
            ai = multimodal.probe_wav(bytes(r["payload"]))
            assert ai.channels in (1, 2)
            assert (ai.sample_rate, ai.bits) == (multimodal._WAV_RATE, 8)
            assert ai.data_size == r["width"] * r["height"] * 3
            assert (
                ai.duration_ms
                == ai.n_frames * 1000 // multimodal._WAV_RATE
            )
        else:
            w, h, maxval, px = multimodal.decode_ppm(bytes(r["payload"]))
            assert (w, h) == (r["width"], r["height"])
            assert maxval == 255
            assert px.shape == (h, w, 3) and px.dtype == np.uint8
        seen.add(mt.split("/")[0])
    assert seen == {"image", "audio", "video"}


def test_feature_extraction_shape_and_determinism(spark):
    feats = multimodal.extract_media_features(
        multimodal.media_table(spark, SF)
    )
    pdf = feats.limit(20).toPandas()
    assert len(pdf) == 20
    assert all(len(f) == 8 for f in pdf["feature"])
    assert (pdf["thumb_w"] <= 32).all()
    # determinism across runs
    pdf2 = feats.limit(20).toPandas()
    assert pdf[["doc_id", "n_bytes"]].equals(pdf2[["doc_id", "n_bytes"]])


def test_decode_ppm_known_pixels():
    """Hand-built 2×2 P6 with known RGB values → exact decoded plane and
    exact channel means through the feature path."""
    px = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])
    raw = b"P6\n2 2\n255\n" + px
    w, h, maxval, plane = multimodal.decode_ppm(raw)
    assert (w, h, maxval) == (2, 2, 255)
    assert plane.tolist() == [
        [[255, 0, 0], [0, 255, 0]],
        [[0, 0, 255], [10, 20, 30]],
    ]
    feats, dims = multimodal._decode_features(
        pd.Series([raw]), pd.Series(["image/png"])
    )
    assert dims.tolist() == [[2, 2]]
    # mean_R = (255+0+0+10)/4, mean_all = sum/12
    assert feats[0].tolist() == [
        2, 2, 255, 265 / 4, 275 / 4, 285 / 4, sum(px) / 12, 4
    ]


def test_probe_y4m_known_stream():
    """Hand-built C444 stream: 2×2, 4:1 fps, 3 frames → exact probe values
    and exact per-plane means through the feature path."""
    f0 = bytes(range(12))  # planes: Y=0..3, U=4..7, V=8..11
    raw = (
        b"YUV4MPEG2 W2 H2 F4:1 Ip A1:1 C444\n"
        + b"".join(b"FRAME\n" + f0 for _ in range(3))
    )
    info = multimodal.probe_y4m(raw)
    assert (info.width, info.height) == (2, 2)
    assert (info.fps_num, info.fps_den) == (4, 1)
    assert info.n_frames == 3
    assert info.duration_ms == 750
    assert info.frame_bytes == 12
    assert raw[info.first_frame_offset : info.first_frame_offset + 12] == f0
    feats, dims = multimodal._decode_features(
        pd.Series([raw]), pd.Series(["video/y4m"])
    )
    assert dims.tolist() == [[2, 2]]
    assert feats[0].tolist() == [
        2, 2, 255, 6 / 4, 22 / 4, 38 / 4, 66 / 12, 4
    ]


def _wav_bytes(ch, rate, bits, data, extra_chunk=b""):
    import struct

    fmt = struct.pack(
        "<HHIIHH", 1, ch, rate, rate * ch * (bits // 8), ch * (bits // 8),
        bits,
    )
    body = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + extra_chunk
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_probe_wav_known_file():
    """Hand-built stereo 8-bit PCM file (with an unknown odd-length chunk
    the walker must word-align past) → exact probe values and exact
    3-phase byte means through the feature path."""
    data = bytes(range(12))
    raw = _wav_bytes(2, 1000, 8, data, extra_chunk=b"LIST\x03\x00\x00\x00abc\x00")
    info = multimodal.probe_wav(raw)
    assert (info.channels, info.sample_rate, info.bits) == (2, 1000, 8)
    assert info.n_frames == 6
    assert info.duration_ms == 6
    assert raw[info.data_offset : info.data_offset + info.data_size] == data
    feats, dims = multimodal._decode_features(
        pd.Series([raw]), pd.Series(["audio/wav"])
    )
    # phases: 0+3+6+9, 1+4+7+10, 2+5+8+11 over 4 rows each
    assert feats[0].tolist() == [
        2, 1000, 255, 18 / 4, 22 / 4, 26 / 4, 66 / 12, 6
    ]
    assert dims.tolist() == [[2, 1000]]


def test_probe_wav_rejects():
    import struct

    with pytest.raises(ValueError, match="magic"):
        multimodal.probe_wav(b"RIFX\x00\x00\x00\x00WAVE")
    with pytest.raises(ValueError, match="missing fmt or data"):
        multimodal.probe_wav(b"RIFF\x04\x00\x00\x00WAVE")
    # non-PCM format code is an explicit error
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 8000, 1, 8)
    raw = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt)) + b"WAVE"
           + b"fmt " + struct.pack("<I", len(fmt)) + fmt)
    with pytest.raises(ValueError, match="PCM only"):
        multimodal.probe_wav(raw)
    # truncated data chunk is clamped, not overread
    raw = _wav_bytes(1, 100, 8, bytes(10))
    info = multimodal.probe_wav(raw[:-4])
    assert info.data_size == 6 and info.n_frames == 6


def test_probe_y4m_colorspaces_and_rejects():
    """Frame byte counts follow the header colorspace; malformed streams
    are explicit errors, not silent misreads."""
    for cs, fb in ((b"C420jpeg", 6), (b"C422", 8), (b"C444", 12),
                   (b"Cmono", 4)):
        raw = (b"YUV4MPEG2 W2 H2 F30:1 " + cs + b"\n"
               + b"FRAME\n" + bytes(fb))
        info = multimodal.probe_y4m(raw)
        assert (info.frame_bytes, info.n_frames) == (fb, 1)
    # default colorspace is 420
    raw = b"YUV4MPEG2 W2 H2 F30:1\nFRAME\n" + bytes(6)
    assert multimodal.probe_y4m(raw).frame_bytes == 6
    with pytest.raises(ValueError, match="magic"):
        multimodal.probe_y4m(b"JUNK")
    with pytest.raises(ValueError, match="missing W/H"):
        multimodal.probe_y4m(b"YUV4MPEG2 F30:1\n")
    with pytest.raises(ValueError, match="truncated"):
        multimodal.probe_y4m(b"YUV4MPEG2 W4 H4 C444\nFRAME\n\x00\x00")
    with pytest.raises(ValueError, match="frame marker"):
        multimodal.probe_y4m(b"YUV4MPEG2 W2 H2 C444\nBOGUS\n" + bytes(12))
    with pytest.raises(ValueError, match="colorspace"):
        multimodal.probe_y4m(b"YUV4MPEG2 W2 H2 C411\nFRAME\n" + bytes(6))


def test_decode_ppm_header_tolerance():
    """Spec coverage: '#' comments and arbitrary whitespace in the header."""
    raw = b"P6 # comment\n# full line comment\n 3\t1 # dims\n255\n" + bytes(9)
    w, h, maxval, plane = multimodal.decode_ppm(raw)
    assert (w, h) == (3, 1)
    assert plane.sum() == 0


def test_decode_ppm_rejects_malformed():
    with pytest.raises(ValueError, match="P6 magic"):
        multimodal.decode_ppm(b"P5\n1 1\n255\n\x00")
    with pytest.raises(ValueError, match="truncated"):
        multimodal.decode_ppm(b"P6\n4 4\n255\n\x00\x00")
    with pytest.raises(ValueError, match="maxval"):
        multimodal.decode_ppm(b"P6\n1 1\n65535\n" + bytes(6))
    with pytest.raises(ValueError, match="malformed"):
        multimodal.decode_ppm(b"P6\nabc\n")


# ---------------------------------------------------------------------------
# Byte-flip fuzz (VERDICT r5 next #7): a single mutated byte must either
# still parse — to a structurally sane result — or raise ValueError. Any
# other exception (unhandled struct/numpy/index error) or a result whose
# fields contradict the buffer is a parser bug. Matches the adversarial-
# robustness bar the string parsers already meet.
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


def _sane_y4m(info, raw: bytes) -> None:
    assert info.width > 0 and info.height > 0
    assert info.fps_num > 0 and info.fps_den > 0
    assert info.n_frames >= 0
    assert info.duration_ms == info.n_frames * 1000 * info.fps_den // info.fps_num
    assert info.frame_bytes > 0
    if info.n_frames:
        assert 0 <= info.first_frame_offset <= len(raw) - info.frame_bytes


def _sane_wav(info, raw: bytes) -> None:
    assert info.channels > 0 and info.sample_rate > 0
    assert 0 <= info.data_size <= len(raw) - info.data_offset
    assert info.n_frames * 1000 // info.sample_rate == info.duration_ms
    block = info.channels * max(info.bits // 8, 1)
    assert info.n_frames == info.data_size // block


@settings(max_examples=300, deadline=None)
@given(data=st.data())
def test_probe_y4m_byte_flip_fuzz(data):
    f0 = bytes(range(12))
    raw = bytearray(
        b"YUV4MPEG2 W2 H2 F4:1 Ip A1:1 C444\n"
        + b"".join(b"FRAME\n" + f0 for _ in range(3))
    )
    i = data.draw(st.integers(0, len(raw) - 1))
    v = data.draw(st.integers(0, 255))
    orig = multimodal.probe_y4m(bytes(raw))
    raw[i] = v
    try:
        info = multimodal.probe_y4m(bytes(raw))
    except ValueError:
        return
    _sane_y4m(info, bytes(raw))
    # a flip strictly inside frame payload bytes never changes the probe
    if i >= orig.first_frame_offset and all(
        not (s <= i < s + 6)  # the FRAME\n markers between payloads
        for s in range(orig.first_frame_offset + 12, len(raw), 18)
    ):
        assert info == orig


@settings(max_examples=300, deadline=None)
@given(data=st.data())
def test_probe_wav_byte_flip_fuzz(data):
    raw = bytearray(_wav_bytes(2, 8000, 8, bytes(range(64))))
    i = data.draw(st.integers(0, len(raw) - 1))
    v = data.draw(st.integers(0, 255))
    orig = multimodal.probe_wav(bytes(raw))
    raw[i] = v
    try:
        info = multimodal.probe_wav(bytes(raw))
    except ValueError:
        return
    _sane_wav(info, bytes(raw))
    # a flip inside the sample payload never changes the probe
    if i >= orig.data_offset:
        assert info == orig
