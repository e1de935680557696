"""Multimodal plumbing: schema, Arrow batch shape, stub-decode determinism."""

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


def test_fake_decode_rejects_non_bytes():
    with pytest.raises(NotImplementedError):
        multimodal._fake_decode(pd.Series([123, None]))


def test_fake_decode_feature_values():
    out = multimodal._fake_decode(pd.Series([b"abcdefgh" * 4, b""]))
    assert out.shape == (2, 8)
    assert np.all(out[1] == 0.0)
    assert out[0].mean() > 0
