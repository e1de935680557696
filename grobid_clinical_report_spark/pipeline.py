"""The extraction cascade as vectorized Spark stages (SURVEY.md §2.5 C1, §3.4).

Reference lifecycle (FullMedicalTextParser.java:106-206): segmenter →
header+leftnote → body featurize/label → figures/tables → callouts → TEI.
Here the whole cascade is ONE shuffle-free `mapInPandas` pass: each Arrow
batch of document rows is exploded to a flat lines frame, run through the
pure-pandas kernels, and regrouped to `(doc_id, spans)` rows. No groupBy is
needed because one row already holds a whole document — the JVM↔Python Arrow
hop is the only process boundary (vs. the reference's per-document
pdfalto subprocess + Wapiti JNI hops).

Public modes (API parity with §2.6: EngineMedical.process* / REST endpoints):
  extract_full     — /api/processFullMedicalText  (body structure + notes)
  extract_header   — /api/processHeaderDocument   (header field spans)
  extract_leftnote — /api/processLeftNoteDocument (left-note field spans)
  ner              — /api/processFrenchMedicalNER (entity spans)
  parse_dateline / parse_medic / parse_patient — string endpoints
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd

from .kernels import body as body_k
from .kernels import header as header_k
from .kernels import leftnote as leftnote_k
from .kernels import ner as ner_k
from .kernels import subparsers as sub_k
from .kernels.cluster import dedup_notes
from .kernels.features import featurize_lines
from .kernels.normalize import normalize_text
from .kernels.segmenter import segment_lines
from .kernels.tokenize import assign_blocks_pages, explode_tokens, sanitize_lines
from .schema import EXTRACTED_DDL

_EMPTY_SPANS = pd.DataFrame(
    columns=["doc_id", "kind", "text", "media_ref", "offset"]
)


def explode_docs(pdf: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, spans[]) rows → flat featurized lines frame."""
    if pdf.empty:
        return pd.DataFrame(
            columns=["doc_id", "seq", "kind", "text", "media_ref", "offset"]
        )
    ex = pdf[["doc_id", "spans"]].explode("spans", ignore_index=True)
    ex = ex[ex["spans"].notna()]
    cols = pd.DataFrame(ex["spans"].tolist(), index=ex.index)
    lines = pd.concat([ex[["doc_id"]], cols], axis=1).reset_index(drop=True)
    lines["media_ref"] = lines.get("media_ref", pd.Series(dtype=object))
    lines["seq"] = lines.groupby("doc_id", sort=False).cumcount()
    lines = sanitize_lines(lines)
    lines = assign_blocks_pages(lines)
    return lines


def _prep(pdf: pd.DataFrame) -> pd.DataFrame:
    lines = explode_docs(pdf)
    if lines.empty:
        return lines
    return featurize_lines(lines)


def _regroup(pdf_in: pd.DataFrame, flat: pd.DataFrame) -> pd.DataFrame:
    """Flat spans → one (doc_id, spans[]) row per input doc (empty list when
    a doc produced nothing, so output cardinality == input cardinality)."""
    if flat.empty:
        return pd.DataFrame(
            {"doc_id": pdf_in["doc_id"], "spans": [[] for _ in range(len(pdf_in))]}
        )
    flat = flat.sort_values(["doc_id", "offset"], kind="stable")
    flat["offset"] = flat["offset"].astype("int64")
    recs = pd.DataFrame(
        {
            "doc_id": flat["doc_id"],
            "span": [
                {"kind": k, "text": t, "media_ref": m, "offset": int(o)}
                for k, t, m, o in zip(
                    flat["kind"], flat["text"], flat["media_ref"], flat["offset"]
                )
            ],
        }
    )
    grouped = recs.groupby("doc_id", sort=False)["span"].agg(list).rename("spans")
    out = pdf_in[["doc_id"]].merge(
        grouped, left_on="doc_id", right_index=True, how="left"
    )
    out["spans"] = [s if isinstance(s, list) else [] for s in out["spans"]]
    return out


# ---------------------------------------------------------------------------
# pandas-level modes (pure; unit-testable without Spark)
# ---------------------------------------------------------------------------


def extract_full_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """C1 full cascade → body-structure spans + deduped note spans."""
    lines = _prep(pdf)
    if lines.empty:
        return _regroup(pdf, _EMPTY_SPANS)
    lines = lines.assign(zone=segment_lines(lines))

    body_lines = lines[lines["zone"].isin(["body", "annex"])].copy()
    if not body_lines.empty:
        body_lines["label"] = body_k.label_body_lines(body_lines)
        spans_body = body_k.body_spans(body_lines)
    else:
        spans_body = _EMPTY_SPANS

    notes = lines[
        lines["zone"].isin(["footnote", "headnote"])
        & ~(lines["is_blank"] | lines["is_page_break"])
    ].copy()
    if not notes.empty:
        spans_notes = pd.DataFrame(
            {
                "doc_id": notes["doc_id"],
                "kind": notes["zone"],
                "text": normalize_text(notes["text"]),
                "media_ref": None,
                "offset": notes["offset"],
            }
        )
        spans_notes = dedup_notes(spans_notes)
    else:
        spans_notes = _EMPTY_SPANS

    flat = pd.concat([spans_body, spans_notes], ignore_index=True)
    return _regroup(pdf, flat)


def extract_header_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    lines = _prep(pdf)
    if lines.empty:
        return _regroup(pdf, _EMPTY_SPANS)
    lines = lines.assign(zone=segment_lines(lines))
    hdr = lines[lines["zone"].eq("header")].copy()
    if hdr.empty:
        return _regroup(pdf, _EMPTY_SPANS)
    hdr["label"] = header_k.label_header_lines(hdr)
    return _regroup(pdf, header_k.merge_header_fields(hdr))


def extract_leftnote_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    lines = _prep(pdf)
    if lines.empty:
        return _regroup(pdf, _EMPTY_SPANS)
    lines = lines.assign(zone=segment_lines(lines))
    ln = lines[lines["zone"].eq("leftnote")].copy()
    if ln.empty:
        return _regroup(pdf, _EMPTY_SPANS)
    ln["label"] = leftnote_k.label_leftnote_lines(ln)
    return _regroup(pdf, leftnote_k.merge_leftnote_fields(ln))


def _token_mode(pdf: pd.DataFrame, labeler: Callable) -> pd.DataFrame:
    lines = _prep(pdf)
    if lines.empty:
        return _regroup(pdf, _EMPTY_SPANS)
    content = lines[
        ~(lines["is_blank"] | lines["is_page_break"] | lines["is_media"])
    ]
    toks = explode_tokens(content)
    if toks.empty:
        return _regroup(pdf, _EMPTY_SPANS)
    toks = sub_k.token_features(toks)
    toks["label"] = labeler(toks)
    return _regroup(pdf, sub_k.tokens_to_spans(toks))


def ner_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    lines = _prep(pdf)
    if lines.empty:
        return _regroup(pdf, _EMPTY_SPANS)
    content = lines[
        ~(lines["is_blank"] | lines["is_page_break"] | lines["is_media"])
    ]
    toks = explode_tokens(content)
    if toks.empty:
        return _regroup(pdf, _EMPTY_SPANS)
    toks = sub_k.token_features(toks)
    flat = ner_k.ner_spans(toks)
    return _regroup(pdf, flat)


def parse_dateline_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    return _token_mode(pdf, sub_k.parse_dateline_tokens)


def parse_medic_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    return _token_mode(pdf, sub_k.parse_medic_tokens)


def parse_patient_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    return _token_mode(pdf, sub_k.parse_patient_tokens)


PANDAS_MODES: dict[str, Callable[[pd.DataFrame], pd.DataFrame]] = {
    "extract_full": extract_full_pdf,
    "extract_header": extract_header_pdf,
    "extract_leftnote": extract_leftnote_pdf,
    "ner": ner_pdf,
    "parse_dateline": parse_dateline_pdf,
    "parse_medic": parse_medic_pdf,
    "parse_patient": parse_patient_pdf,
}


# ---------------------------------------------------------------------------
# Spark layer
# ---------------------------------------------------------------------------


def run_mode(df, mode: str):
    """documents DataFrame → extracted-spans DataFrame, one vectorized
    mapInPandas pass (no shuffle: one row = one document; partitioning is
    whatever the scan/repartition upstream chose — see runner.salt_partition).
    """
    fn = PANDAS_MODES[mode]

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield fn(pdf)

    return df.mapInPandas(mapper, schema=EXTRACTED_DDL)
