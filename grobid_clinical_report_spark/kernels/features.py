"""Vectorized line/token featurizers (SURVEY.md §2.3 F1-F7).

The reference builds tab-separated string feature matrices per line (segmenter,
FeaturesVectorMedical.java:56-226) or per token (all other models,
FeaturesVectorFullMedicalText.java:56-155, FeaturesVectorMedic.java:196-330…)
and feeds them to Wapiti. Here the same feature inventory becomes numeric
columns on the flat lines/tokens DataFrame — one numpy tensor per Arrow batch,
no string round-trip (the headline perf win, SURVEY.md §4.1 last row).

Layout-derived features (font deltas, x/y indentation, main-area) have no
source in the span model; they are surrogated from span structure — offsets,
block/page position, media adjacency — per SURVEY.md §7.3.

Binning constants mirror MedicalReportSegmenterParser.java:69-78:
NBBINS_POSITION=12, NBBINS_SPACE=5, NBBINS_DENSITY=5, LINESCALE=10.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import lexicon as lx
from .cluster import repeated_pattern_flags

NBBINS_POSITION = 12
NBBINS_SPACE = 5
NBBINS_DENSITY = 5
LINESCALE = 10

_BULLET_RE = r"^\s*(?:[-•*·]|\d{1,2}[.)]\s)"


def _word_flag(first_words: pd.Series, vocab: set[str]) -> pd.Series:
    return first_words.isin(vocab)


def _contains_any(lower: pd.Series, vocab: set[str]) -> pd.Series:
    """Vectorized 'line contains a vocab word' via one alternation regex."""
    import re

    pat = r"\b(?:" + "|".join(re.escape(w) for w in sorted(vocab)) + r")\b"
    return lower.str.contains(pat, regex=True, na=False)


def featurize_lines(lines: pd.DataFrame) -> pd.DataFrame:
    """Add the shared feature columns used by segmenter/header/body emission
    models. Input must already carry block/page structure
    (tokenize.assign_blocks_pages). Entirely column-wise pandas/numpy.
    """
    df = lines.copy()
    txt = df["text"].fillna("")
    lower = txt.str.lower()

    n_lines = df.groupby("doc_id", sort=False)["seq"].transform("size")
    line_idx = df.groupby("doc_id", sort=False).cumcount()
    df["rel_pos"] = line_idx / n_lines.clip(lower=1)
    df["pos_bin"] = np.minimum(
        (df["rel_pos"] * NBBINS_POSITION).astype(np.int64), NBBINS_POSITION - 1
    )

    page_lines = df.groupby(["doc_id", "page_id"], sort=False)["seq"].transform(
        "size"
    )
    page_idx = df.groupby(["doc_id", "page_id"], sort=False).cumcount()
    df["rel_pos_page"] = page_idx / page_lines.clip(lower=1)

    letters = txt.str.count(r"[A-Za-zÀ-ÖØ-öø-ÿ]")
    uppers = txt.str.count(r"[A-ZÀ-ÖØ]")
    digits = txt.str.count(r"\d")
    length = txt.str.len().clip(lower=1)
    df["line_len"] = txt.str.len()
    df["len_bin"] = np.minimum(
        (txt.str.len() / 80.0 * LINESCALE).astype(np.int64), LINESCALE
    )
    df["caps_ratio"] = (uppers / letters.clip(lower=1)).astype(np.float64)
    df["digit_ratio"] = (digits / length).astype(np.float64)
    df["punct_ratio"] = (txt.str.count(r"[^\w\s]") / length).astype(np.float64)
    df["all_caps"] = (letters >= 3) & (df["caps_ratio"] > 0.9)
    df["starts_upper"] = txt.str.match(r"^[A-ZÀ-ÖØ]")
    df["ends_colon"] = txt.str.rstrip().str.endswith(":")
    df["ends_period"] = txt.str.rstrip().str.endswith(".")
    df["is_bullet"] = txt.str.match(_BULLET_RE)
    df["single_token"] = txt.str.strip().str.count(r"\s+").eq(0) & txt.str.strip().ne("")
    df["n_tokens"] = txt.str.count(r"\S+")
    df["starts_lower"] = txt.str.match(r"^[a-zà-öø-ÿ]")

    # regex/dictionary flags (F8 lexicon; FeatureFactory email/http/month/year)
    df["has_date"] = txt.str.contains(lx.RE_DATE, na=False)
    df["has_time"] = txt.str.contains(lx.RE_TIME, na=False)
    df["has_phone"] = txt.str.contains(lx.RE_PHONE, na=False)
    df["has_email"] = txt.str.contains(lx.RE_EMAIL, na=False)
    df["has_web"] = txt.str.contains(lx.RE_WEB, na=False)
    df["has_postcode"] = txt.str.contains(lx.RE_POSTCODE, na=False)
    df["has_year"] = txt.str.contains(lx.RE_YEAR, na=False)
    df["has_ipp"] = txt.str.contains(lx.RE_IPP, na=False)
    df["has_dose"] = txt.str.contains(lx.RE_DOSE, na=False)
    df["has_month_word"] = _contains_any(lower, set(lx.MONTHS_FR))
    df["has_medic_title"] = lower.str.contains(
        r"\b(?:dr|pr|docteur|professeur)\b\.?", regex=True, na=False
    )
    df["has_patient_title"] = lower.str.contains(
        r"\b(?:madame|monsieur|mme|mlle|mademoiselle|patiente?)\b",
        regex=True,
        na=False,
    )
    df["has_person_title"] = df["has_medic_title"] | df["has_patient_title"]
    df["has_fax_word"] = lower.str.contains(r"\bfax\b", regex=True, na=False)
    df["has_docnum"] = txt.str.match(r"^\s*N°\s*[\d-]+\s*$")
    df["has_birth"] = lower.str.contains(r"\bnée?\s+le\b", regex=True, na=False)
    df["has_role_word"] = _contains_any(lower, lx.ROLE_WORDS)
    df["has_org_word"] = _contains_any(lower, lx.ORG_WORDS)
    df["has_doctype_word"] = _contains_any(lower, lx.DOCTYPE_WORDS)
    df["has_street_word"] = _contains_any(lower, lx.STREET_WORDS)
    df["has_city_word"] = _contains_any(lower, lx.CITIES_FR)
    df["is_page_number"] = txt.str.match(r"^\s*(?:page\s+)?\d+\s*(?:/\s*\d+)?\s*$", case=False)

    # block-edge status (FeaturesVectorMedical block status features)
    df["block_first"] = df["line_in_block"].eq(0)
    df["block_last"] = df["line_in_block"].eq(df["block_len"] - 1)
    df["first_page"] = df["page_id"].eq(0)

    # media adjacency (bitmapAround/vectorAround surrogate,
    # MedicalReportSegmenterParser.java:342-351)
    med = df["is_media"].to_numpy()
    doc = df["doc_id"].to_numpy()
    prev_media = np.roll(med, 1) & (np.roll(doc, 1) == doc)
    next_media = np.roll(med, -1) & (np.roll(doc, -1) == doc)
    if len(df):
        prev_media[0] = False
        next_media[-1] = False
    df["media_before"] = prev_media
    df["media_after"] = next_media

    # F1 boilerplate
    df["repeated_pattern"] = repeated_pattern_flags(df).to_numpy()
    return df


def feature_matrix(df: pd.DataFrame, cols: list[str]) -> np.ndarray:
    """Stack selected feature columns into an (N, F) float64 tensor."""
    return np.column_stack(
        [df[c].astype(np.float64).to_numpy() for c in cols]
    )
