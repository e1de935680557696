"""Header model: header-zone lines → field labels → merged field spans
(SURVEY.md §2.3 F3, §2.4 L4, §2.5 C2).

Reference: `HeaderMedicalParser` featurizes header-zone tokens
(HeaderMedicalParser.java:410-813), CRF-labels them (:255), clusters, then
fills a `HeaderMedicalItem` with merge quirks (resultExtraction :1229-1349):
  - `isDifferentContent` — case/whitespace-insensitive dedup (:1355-1370),
  - keep-longest for dates (:1261-1266), first-wins for times (:1267-1270),
  - repeats concatenated with separators,
and enrichment (:96-213): ISO date normalization (:174-181, 394-409).

Rebuild: line-level linear emissions + Viterbi, then a vectorized
field-merge. Output: one span per populated field, ordered by first
occurrence (FIXTURES.md fx-hdr-0002).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .labels import HEADER_LABELS, label_index, sticky_transitions
from .normalize import normalize_text, to_iso_date
from .viterbi import viterbi_batch
from .segmenter import _doc_slices

_IX = label_index(HEADER_LABELS)


def header_emissions(df: pd.DataFrame) -> np.ndarray:
    n = len(df)
    em = np.zeros((n, len(HEADER_LABELS)), dtype=np.float64)
    all_caps = df["all_caps"].to_numpy()
    long_line = (df["line_len"] > 25).to_numpy()

    em[:, _IX["docnum"]] += 5.0 * df["has_docnum"].to_numpy()
    em[:, _IX["doctype"]] += 4.0 * (all_caps & df["has_doctype_word"].to_numpy())
    em[:, _IX["date"]] += 3.0 * (df["has_date"] & ~df["has_person_title"]
                                 & ~df["has_birth"]).to_numpy()
    em[:, _IX["time"]] += 1.0 * df["has_time"].to_numpy()
    em[:, _IX["medic"]] += 4.0 * df["has_medic_title"].to_numpy()
    em[:, _IX["medic"]] += 1.0 * df["has_role_word"].to_numpy()
    em[:, _IX["patient"]] += 5.0 * (
        df["has_patient_title"] | df["has_ipp"] | df["has_birth"]
    ).to_numpy()
    em[:, _IX["affiliation"]] += 4.0 * df["has_org_word"].to_numpy()
    em[:, _IX["address"]] += 3.0 * df["has_street_word"].to_numpy()
    em[:, _IX["address"]] += 2.0 * df["has_postcode"].to_numpy()
    em[:, _IX["address"]] += 1.0 * df["has_city_word"].to_numpy()
    em[:, _IX["email"]] += 5.0 * df["has_email"].to_numpy()
    em[:, _IX["phone"]] += 4.0 * (df["has_phone"] & ~df["has_fax_word"]).to_numpy()
    em[:, _IX["fax"]] += 5.0 * df["has_fax_word"].to_numpy()
    em[:, _IX["web"]] += 5.0 * df["has_web"].to_numpy()
    # title: early capitalized mixed-case line with no stronger cue
    title_like = (
        df["starts_upper"]
        & ~df["all_caps"]
        & ~df["has_date"]
        & ~df["has_person_title"]
        & ~df["has_street_word"]
        & ~df["has_org_word"]
        & ~df["has_phone"]
        & ~df["has_email"]
        & (df["rel_pos"] < 0.5)
    ).to_numpy()
    em[:, _IX["title"]] += 2.5 * title_like
    em[:, _IX["note"]] += 0.5  # weak fallback
    em[(df["is_blank"] | df["is_page_break"]).to_numpy(), :] = 0.0
    _ = long_line
    return em


def label_header_lines(df: pd.DataFrame) -> pd.Series:
    em = header_emissions(df)
    trans = sticky_transitions(HEADER_LABELS, stay=1.0)
    _, starts = _doc_slices(df["doc_id"].to_numpy())
    seqs = [em[s:e] for s, e in zip(starts[:-1], starts[1:])]
    flat = np.concatenate(viterbi_batch(seqs, trans)) if seqs else np.zeros(0, int)
    return pd.Series(
        np.array(HEADER_LABELS, dtype=object)[flat], index=df.index, name="label"
    )


def merge_header_fields(df: pd.DataFrame) -> pd.DataFrame:
    """L4 field aggregation over labeled header lines.

    Returns flat spans [doc_id, kind, text, media_ref, offset]: one span per
    populated field per document, offset = first contributing line's offset.
    Merge semantics per HeaderMedicalParser.java:1229-1349:
      * dedup case/space-insensitive repeats (isDifferentContent),
      * date: keep the longest raw value, emit ISO-normalized,
      * time: first wins,
      * other fields: distinct values joined with ' ; '.
    Entirely groupby/agg — no per-row Python.
    """
    d = df[~(df["is_blank"] | df["is_page_break"]) & ~df["is_media"]].copy()
    if d.empty:
        return pd.DataFrame(
            columns=["doc_id", "kind", "text", "media_ref", "offset"]
        )
    d["text_n"] = normalize_text(d["text"])
    d = d[d["text_n"].ne("")]
    d["canon"] = d["text_n"].str.lower().str.replace(r"\s+", "", regex=True)
    # isDifferentContent dedup: first occurrence of (doc, field, canon) wins
    d = d[~d.duplicated(subset=["doc_id", "label", "canon"], keep="first")]

    # keep-longest for dates / first-wins for time, vectorized by ranking
    tlen = d["text_n"].str.len()
    d["rank"] = np.where(
        d["label"].eq("date"), -tlen, d.groupby(["doc_id", "label"]).cumcount()
    )
    d = d.sort_values(["doc_id", "label", "rank"], kind="stable")
    keep_one = d["label"].isin(["date", "time"])
    first_of_field = ~d.duplicated(subset=["doc_id", "label"], keep="first")
    d = d[~keep_one | first_of_field]

    agg = (
        d.sort_values(["doc_id", "offset"], kind="stable")
        .groupby(["doc_id", "label"], sort=False)
        .agg(text=("text_n", " ; ".join), offset=("offset", "min"))
        .reset_index()
        .rename(columns={"label": "kind"})
    )
    # ISO-normalize the merged date (C2 enrichment)
    is_date = agg["kind"].eq("date")
    iso = to_iso_date(agg.loc[is_date, "text"])
    agg.loc[is_date, "text"] = iso.where(iso.ne(""), agg.loc[is_date, "text"])
    agg["media_ref"] = None
    return agg.sort_values(["doc_id", "offset"], kind="stable")[
        ["doc_id", "kind", "text", "media_ref", "offset"]
    ].reset_index(drop=True)
