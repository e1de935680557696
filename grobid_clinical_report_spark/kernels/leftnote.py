"""Left-note model: organization contact block → field spans
(SURVEY.md §2.3 F5, §2.4 L5).

Reference: `LeftNoteMedicalParser` runs header-like features over the left
margin zone (LeftNoteMedicalParser.java:174-573) and aggregates clusters into
organization fields (resultExtraction :981-1129).

Rebuild shares the header model's machinery with the left-note vocabulary.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .labels import LEFTNOTE_LABELS, label_index, sticky_transitions
from .normalize import normalize_text
from .segmenter import _doc_slices
from .viterbi import viterbi_segments

_IX = label_index(LEFTNOTE_LABELS)


def leftnote_emissions(df: pd.DataFrame) -> np.ndarray:
    n = len(df)
    # f32: weights are 0.5-multiples with tiny path sums — exact (see body)
    em = np.zeros((n, len(LEFTNOTE_LABELS)), dtype=np.float32)
    em[:, _IX["organization"]] += 4.0 * (
        df["all_caps"] & df["has_org_word"]
    ).to_numpy()
    em[:, _IX["organization"]] += 1.0 * df["has_org_word"].to_numpy()
    # specialty-suffix service names without an ORG_WORDS hit (F5 depth —
    # same token-shape class the header model uses)
    em[:, _IX["organization"]] += 3.5 * df["has_specialty_word"].to_numpy()
    em[:, _IX["medic"]] += 4.0 * df["has_medic_title"].to_numpy()
    # profession-suffix descriptors without a Dr/Pr title (F5 depth —
    # per-token suffix class, FeaturesVectorLeftNoteMedical.java:61-71)
    em[:, _IX["medic"]] += 3.5 * (
        df["suf_profession_word"] & ~df["has_org_word"]
    ).to_numpy()
    em[:, _IX["phone"]] += 4.0 * (df["has_phone"] & ~df["has_fax_word"]).to_numpy()
    em[:, _IX["fax"]] += 5.0 * df["has_fax_word"].to_numpy()
    em[:, _IX["email"]] += 5.0 * df["has_email"].to_numpy()
    em[:, _IX["web"]] += 5.0 * df["has_web"].to_numpy()
    em[:, _IX["address"]] += 3.0 * (
        df["has_street_word"] | df["has_postcode"]
    ).to_numpy()
    em[:, _IX["idno"]] += 4.0 * df["has_docnum"].to_numpy()
    em[:, _IX["note"]] += 0.5
    em[(df["is_blank"] | df["is_page_break"]).to_numpy(), :] = 0.0
    return em


def label_leftnote_lines(df: pd.DataFrame) -> pd.Series:
    em = leftnote_emissions(df)
    trans = sticky_transitions(LEFTNOTE_LABELS, stay=1.0)
    _, starts = _doc_slices(df["doc_id"].to_numpy())
    flat = viterbi_segments(em, starts[:-1], trans)
    return pd.Series(
        np.array(LEFTNOTE_LABELS, dtype=object)[flat], index=df.index,
        name="label"
    )


def merge_leftnote_fields(df: pd.DataFrame) -> pd.DataFrame:
    """L5 aggregation: one span per populated field, dedup + ' ; ' join —
    same merge semantics as the header model (LeftNoteMedicalParser mirrors
    HeaderMedicalParser's resultExtraction pattern)."""
    d = df[~(df["is_blank"] | df["is_page_break"]) & ~df["is_media"]].copy()
    if d.empty:
        return pd.DataFrame(
            columns=["doc_id", "kind", "text", "media_ref", "offset"]
        )
    d["text_n"] = normalize_text(d["text"])
    d = d[d["text_n"].ne("")]
    d["canon"] = d["text_n"].str.lower().str.replace(r"\s+", "", regex=True)
    d = d[~d.duplicated(subset=["doc_id", "label", "canon"], keep="first")]
    agg = (
        d.sort_values(["doc_id", "offset"], kind="stable")
        .groupby(["doc_id", "label"], sort=False)
        .agg(text=("text_n", " ; ".join), offset=("offset", "min"))
        .reset_index()
        .rename(columns={"label": "kind"})
    )
    agg["media_ref"] = None
    return agg.sort_values(["doc_id", "offset"], kind="stable")[
        ["doc_id", "kind", "text", "media_ref", "offset"]
    ].reset_index(drop=True)
