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


import re as _re

from . import arrowtext as at


def _any_re(vocab: set[str]) -> str:
    return at.word_bounded("|".join(_re.escape(w) for w in sorted(vocab)))


def featurize_lines(
    lines: pd.DataFrame, profile: str = "all"
) -> pd.DataFrame:
    """Add the shared feature columns used by segmenter/header/body emission
    models. Input must already carry block/page structure
    (tokenize.assign_blocks_pages).

    String features run on Arrow compute kernels (kernels/arrowtext.py) —
    one RE2 pass per feature over the whole column, no per-row Python.

    ``profile``: 'body' skips the header/left-note-only lexicon passes
    (time/email/web/city/month/year/dose — ~7 full-column RE2 scans) for the
    extract_full hot path; 'all' computes everything.
    """
    df = lines.copy(deep=False)
    txt = at.arr_of(df["text"])
    low = at.lower(txt)
    stripped = at.strip(txt)

    from .segments import seg_position, seg_size_transform, seg_starts

    n = len(df)
    doc = df["_doc_code"].to_numpy()
    dstarts = seg_starts(doc)
    df["rel_pos"] = seg_position(dstarts, n) / np.maximum(
        seg_size_transform(dstarts, n), 1
    )
    df["pos_bin"] = np.minimum(
        (df["rel_pos"] * NBBINS_POSITION).astype(np.int64), NBBINS_POSITION - 1
    )

    page_key = doc * (1 << 20) + df["page_id"].to_numpy()
    pstarts = seg_starts(page_key)
    df["rel_pos_page"] = seg_position(pstarts, n) / np.maximum(
        seg_size_transform(pstarts, n), 1
    )

    letters = at.count(txt, r"[A-Za-zÀ-ÖØ-öø-ÿ]")
    uppers = at.count(txt, r"[A-ZÀ-ÖØ]")
    digits = at.count(txt, r"\d")
    raw_len = at.length(txt)
    length = np.maximum(raw_len, 1)
    df["line_len"] = raw_len
    df["len_bin"] = np.minimum(
        (raw_len / 80.0 * LINESCALE).astype(np.int64), LINESCALE
    )
    df["caps_ratio"] = uppers / np.maximum(letters, 1)
    df["digit_ratio"] = digits / length
    df["punct_ratio"] = at.count(txt, r"[^\w\s]") / length
    df["all_caps"] = (letters >= 3) & (df["caps_ratio"] > 0.9)
    df["starts_upper"] = at.match(txt, r"[A-ZÀ-ÖØ]")
    df["ends_colon"] = at.contains(stripped, r":$")
    df["ends_period"] = at.contains(stripped, r"\.$")
    df["is_bullet"] = at.match(txt, _BULLET_RE)
    df["n_tokens"] = at.count(txt, r"\S+")
    df["single_token"] = (df["n_tokens"] == 1)
    df["starts_lower"] = at.match(txt, r"[a-zà-öø-ÿ]")

    # regex/dictionary flags (F8 lexicon; FeatureFactory email/http/month/year)
    df["has_date"] = at.contains(txt, lx.RE_DATE.pattern)
    df["has_phone"] = at.contains(txt, lx.RE_PHONE.pattern)
    df["has_postcode"] = at.contains(txt, lx.RE_POSTCODE.pattern)
    df["has_ipp"] = at.contains(
        txt, at.word_bounded(r"IPP|NIP|N°\s*dossier")
    )
    if profile == "all":
        df["has_time"] = at.contains(txt, lx.RE_TIME.pattern)
        df["has_email"] = at.contains(txt, lx.RE_EMAIL.pattern)
        df["has_web"] = at.contains(txt, lx.RE_WEB.pattern)
        df["has_year"] = at.contains(txt, lx.RE_YEAR.pattern)
        df["has_dose"] = at.contains(
            low, at.word_bounded(r"\d+(?:[.,]\d+)?\s*(?:mg|g|ml|ui|µg|mcg)")
        )
        df["has_month_word"] = at.contains(low, _any_re(set(lx.MONTHS_FR)))
        df["has_city_word"] = at.contains(low, _any_re(lx.CITIES_FR))
    df["has_medic_title"] = at.contains(
        low, at.word_bounded(r"dr|pr|docteur|professeur")
    )
    df["has_patient_title"] = at.contains(
        low,
        at.word_bounded(r"madame|monsieur|mme|mlle|mademoiselle|patiente?"),
    )
    df["has_person_title"] = df["has_medic_title"] | df["has_patient_title"]
    df["has_fax_word"] = at.contains(low, at.word_bounded("fax"))
    df["has_docnum"] = at.match(txt, r"\s*N°\s*[\d-]+\s*$")
    df["has_birth"] = at.contains(low, at.word_bounded(r"née?\s+le"))
    df["has_role_word"] = at.contains(low, _any_re(lx.ROLE_WORDS))
    df["has_org_word"] = at.contains(low, _any_re(lx.ORG_WORDS))
    df["has_doctype_word"] = at.contains(low, _any_re(lx.DOCTYPE_WORDS))
    df["has_street_word"] = at.contains(low, _any_re(lx.STREET_WORDS))
    df["is_page_number"] = at.match(
        low, r"\s*(?:page\s+)?\d+\s*(?:/\s*\d+)?\s*$"
    )

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
