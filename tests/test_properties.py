"""Property tests over the seeded synthetic corpus (SURVEY.md §5.2.4):
invariants that must hold for ANY document, plus exact Spark-vs-pandas path
parity (the Arrow flatten/regroup path must be observationally identical to
the test-path explode/regroup)."""

from __future__ import annotations

import pandas as pd

from grobid_clinical_report_spark import datagen
from grobid_clinical_report_spark.kernels.labels import BODY_LABELS, SEG_LABELS
from grobid_clinical_report_spark.pipeline import PANDAS_MODES, run_mode
from grobid_clinical_report_spark.schema import DOCUMENTS_SCHEMA

_VOCAB = set(BODY_LABELS) | set(SEG_LABELS)


def _synth(n=60, seed=7):
    return datagen.synthetic_documents_pdf(n, seed=seed)


def test_output_invariants_on_synthetic_corpus():
    pdf = _synth()
    out = PANDAS_MODES["extract_full"](pdf)
    assert len(out) == len(pdf)  # cardinality preserved
    in_media = {
        s["media_ref"]
        for spans in pdf.spans
        for s in spans
        if s["kind"] == "media"
    }
    out_media = set()
    for spans in out.spans:
        offs = [s["offset"] for s in spans]
        assert offs == sorted(offs)  # order preserved
        assert {s["kind"] for s in spans} <= _VOCAB
        out_media |= {s["media_ref"] for s in spans if s["media_ref"]}
    # media refs that survive are real input refs, and most media survives
    # into figure spans (never fabricated)
    assert out_media <= in_media
    assert len(out_media) >= 0.8 * len(in_media)


def test_spark_and_pandas_paths_identical(spark):
    pdf = pd.concat(
        [datagen.fixture_documents_pdf(), _synth(40)], ignore_index=True
    )
    for mode in ["extract_full", "extract_header", "ner"]:
        want = {
            r.doc_id: [
                (s["kind"], s["text"], s["media_ref"], s["offset"])
                for s in r.spans
            ]
            for r in PANDAS_MODES[mode](pdf).itertuples()
        }
        df = spark.createDataFrame(pdf, schema=DOCUMENTS_SCHEMA)
        got = {
            r["doc_id"]: [
                (s["kind"], s["text"], s["media_ref"], s["offset"])
                for s in r["spans"]
            ]
            for r in run_mode(df, mode).collect()
        }
        assert got == want, mode


def test_generator_is_deterministic():
    a = _synth(20, seed=3)
    b = _synth(20, seed=3)
    assert a.doc_id.tolist() == b.doc_id.tolist()
    assert all(x == y for x, y in zip(a.spans, b.spans))


def test_tokenizer_roundtrip_property():
    """Property (hypothesis): for ANY text, gap-prefixed token concatenation
    reconstructs the exact source prefix up to the last token — the
    invariant tokens_to_spans relies on for verbatim span text."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from grobid_clinical_report_spark.kernels.tokenize import (
        TOKEN_RE,
        explode_tokens,
    )

    # the engine's tokenizer is RE2 (Arrow); RE2's \s is exactly
    # [\t\n\f\r ] while Python's additionally covers \x0b and \x1c-\x1f,
    # so the reference mirror pins RE2's class
    py_token_re = TOKEN_RE.replace(r"\s", r" \t\n\f\r")

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.text(
                alphabet=st.characters(
                    blacklist_categories=("Cs",), blacklist_characters="\x00"
                ),
                max_size=60,
            ),
            min_size=1,
            max_size=4,
        )
    )
    def check(texts):
        lines = pd.DataFrame(
            {
                "doc_id": [0] * len(texts),
                "seq": range(len(texts)),
                "text": texts,
            }
        )
        out = explode_tokens(lines)
        for i, t in enumerate(texts):
            rows = out[out["seq"] == i]
            rebuilt = "".join(
                (g or "") + tok for g, tok in zip(rows["gap"], rows["tok"])
            )
            matches = re.findall(py_token_re, t)
            if not matches:
                assert len(rows) == 0
                continue
            # rebuilt must be an exact prefix of the source ending at the
            # last token
            assert t.startswith(rebuilt)
            assert rebuilt.endswith(matches[-1])
            assert rows["tok"].tolist() == matches

    check()
