"""Span-sequence equality gate (FIXTURES.md §5, BASELINE.md correctness gate):
for every fixture document, pipeline output must equal the expected ordered
(kind, text, media_ref) list exactly — first at the pandas kernel level, then
through the Spark mapInPandas path (identical by construction, verified)."""

from __future__ import annotations

import pytest

from grobid_clinical_report_spark import datagen
from grobid_clinical_report_spark.pipeline import PANDAS_MODES, run_mode
from grobid_clinical_report_spark.schema import DOCUMENTS_SCHEMA

CASES = [
    (mode, doc_id, exp)
    for mode, m in datagen.FIXTURE_EXPECTED.items()
    for doc_id, exp in m.items()
]


def _triples(spans) -> list[tuple]:
    return [(s["kind"], s["text"], s["media_ref"]) for s in spans]


@pytest.mark.parametrize("mode,doc_id,expected", CASES)
def test_fixture_pandas(fixture_docs_pdf, mode, doc_id, expected):
    pdf = fixture_docs_pdf[fixture_docs_pdf.doc_id == doc_id].reset_index(
        drop=True
    )
    out = PANDAS_MODES[mode](pdf)
    assert _triples(out.spans.iloc[0]) == [tuple(e) for e in expected]


@pytest.mark.parametrize("mode", sorted(datagen.FIXTURE_EXPECTED))
def test_fixture_spark(spark, fixture_docs_pdf, mode):
    df = spark.createDataFrame(fixture_docs_pdf, schema=DOCUMENTS_SCHEMA)
    rows = {r["doc_id"]: r["spans"] for r in run_mode(df, mode).collect()}
    for doc_id, expected in datagen.FIXTURE_EXPECTED[mode].items():
        got = [(s["kind"], s["text"], s["media_ref"]) for s in rows[doc_id]]
        assert got == [tuple(e) for e in expected], f"{mode}/{doc_id}"


def test_offsets_strictly_increasing(fixture_docs_pdf):
    """Property: output spans stay ordered by offset; media never reordered
    relative to neighbors (FIXTURES.md §5 / SURVEY.md §5.2.4)."""
    out = PANDAS_MODES["extract_full"](fixture_docs_pdf)
    for spans in out.spans:
        offs = [s["offset"] for s in spans]
        assert offs == sorted(offs)


def test_output_kinds_in_vocabulary(fixture_docs_pdf):
    from grobid_clinical_report_spark.kernels.labels import (
        BODY_LABELS,
        SEG_LABELS,
    )

    vocab = set(BODY_LABELS) | set(SEG_LABELS)
    out = PANDAS_MODES["extract_full"](fixture_docs_pdf)
    for spans in out.spans:
        assert {s["kind"] for s in spans} <= vocab


def test_determinism_same_input_twice(fixture_docs_pdf):
    a = PANDAS_MODES["extract_full"](fixture_docs_pdf)
    b = PANDAS_MODES["extract_full"](fixture_docs_pdf)
    assert a.equals(b)
