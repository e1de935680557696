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


def test_media_table_payloads_are_valid_ppm(spark):
    """The synthesized payloads must be REAL P6 images the decoder (or any
    netpbm reader) opens, with dims matching the metadata columns."""
    rows = multimodal.media_table(spark, SF).limit(10).collect()
    for r in rows:
        w, h, maxval, px = multimodal.decode_ppm(bytes(r["payload"]))
        assert (w, h) == (r["width"], r["height"])
        assert maxval == 255
        assert px.shape == (h, w, 3) and px.dtype == np.uint8


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
    feats, dims = multimodal._decode_features(pd.Series([raw]))
    assert dims.tolist() == [[2, 2]]
    # mean_R = (255+0+0+10)/4, mean_all = sum/12
    assert feats[0].tolist() == [
        2, 2, 255, 265 / 4, 275 / 4, 285 / 4, sum(px) / 12, 4
    ]


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
