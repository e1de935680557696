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
from .viterbi import viterbi_segments
from .segmenter import _doc_slices

_IX = label_index(HEADER_LABELS)


def header_emissions(df: pd.DataFrame) -> np.ndarray:
    n = len(df)
    # f32: weights are 0.5-multiples with tiny path sums — exact (see body)
    em = np.zeros((n, len(HEADER_LABELS)), dtype=np.float32)
    all_caps = df["all_caps"].to_numpy()
    long_line = (df["line_len"] > 25).to_numpy()

    em[:, _IX["docnum"]] += 5.0 * df["has_docnum"].to_numpy()
    # 'Réf : 7301-884' / 'Dossier 12-X' — document numbers without the N°
    # shape, recognized by the token-prefix class (F3 depth)
    em[:, _IX["docnum"]] += 5.0 * df["has_ref_num"].to_numpy()
    em[:, _IX["doctype"]] += 4.0 * (all_caps & df["has_doctype_word"].to_numpy())
    dateish = df["has_date"] | df["has_text_date"]
    em[:, _IX["date"]] += 3.0 * (dateish & ~df["has_person_title"]
                                 & ~df["has_birth"]).to_numpy()
    # dateline: a date co-occurring with a place ('Fait à Paris, le 20.9.2018')
    # — the reference header model's <dateline> field, later re-parsed by the
    # DatelineParser for fallback doctype/date/place enrichment
    # (HeaderMedicalParser.java:153-172)
    em[:, _IX["dateline"]] += 6.0 * (
        dateish
        & (df["has_city_word"] | df["suf_city_like"])
        & ~df["has_birth"]
    ).to_numpy()
    em[:, _IX["time"]] += 1.0 * df["has_time"].to_numpy()
    em[:, _IX["medic"]] += 4.0 * df["has_medic_title"].to_numpy()
    em[:, _IX["medic"]] += 1.0 * df["has_role_word"].to_numpy()
    em[:, _IX["patient"]] += 5.0 * (
        df["has_patient_title"] | df["has_ipp"] | df["has_birth"]
    ).to_numpy()
    em[:, _IX["affiliation"]] += 4.0 * df["has_org_word"].to_numpy()
    # token-shape classes (F3 depth, HeaderMedicalParser.java:410-813):
    # out-of-gazetteer specialty names are affiliations; bare
    # ALLCAPS-surname lines without any title/birth cue are medics (the
    # signing physician — patients in headers virtually always carry a
    # civility title or birth line)
    em[:, _IX["affiliation"]] += 3.5 * df["has_specialty_word"].to_numpy()
    em[:, _IX["medic"]] += 3.0 * (
        df["name_shaped"]
        & ~df["has_patient_title"]
        & ~df["has_birth"]
        & ~df["has_specialty_word"]
        & ~df["has_org_word"]
    ).to_numpy()
    # profession-suffix morphology ('C. LEROY, Cardiologue'): a physician
    # descriptor with no Dr/Pr title — per-token suffix class (F3 depth)
    em[:, _IX["medic"]] += 3.5 * (
        df["suf_profession_word"]
        & ~df["has_patient_title"]
        & ~df["has_birth"]
        & ~df["has_org_word"]
    ).to_numpy()
    em[:, _IX["address"]] += 3.0 * df["has_street_word"].to_numpy()
    em[:, _IX["address"]] += 2.0 * df["has_postcode"].to_numpy()
    em[:, _IX["address"]] += 1.0 * (
        df["has_city_word"] | df["suf_city_like"]
    ).to_numpy()
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
    flat = viterbi_segments(em, starts[:-1], trans)
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

    # ' ; ' concatenation via Arrow group_join over contiguous
    # (doc, label) groups (the former .agg(" ; ".join) was a per-group
    # Python call — the header merge's profiled hotspot). Each group's
    # first row after the (doc, label, offset) sort carries min(offset),
    # and the final offset sort below restores the emission order (field
    # first-offsets are distinct lines, so the order is total).
    from .cluster import group_join

    d = d.sort_values(["doc_id", "label", "offset"], kind="stable")
    first = (~d.duplicated(subset=["doc_id", "label"])).to_numpy()
    grp = np.cumsum(first) - 1
    agg = (
        d.loc[first, ["doc_id", "label", "offset"]]
        .rename(columns={"label": "kind"})
        .reset_index(drop=True)
    )
    agg["text"] = group_join(
        d["text_n"].to_numpy(), grp, sep=" ; "
    )
    # ISO-normalize the merged date (C2 enrichment)
    is_date = agg["kind"].eq("date")
    iso = to_iso_date(agg.loc[is_date, "text"])
    agg.loc[is_date, "text"] = iso.where(iso.ne(""), agg.loc[is_date, "text"])
    agg["media_ref"] = None
    return agg.sort_values(["doc_id", "offset"], kind="stable")[
        ["doc_id", "kind", "text", "media_ref", "offset"]
    ].reset_index(drop=True)


# ---------------------------------------------------------------------------
# C2 enrichment cascade (HeaderMedicalParser.java:110-198)
# ---------------------------------------------------------------------------

_EMPTY = pd.DataFrame(columns=["doc_id", "kind", "text", "media_ref", "offset"])

# language-id markers for the 200-char body sample
# (HeaderMedicalParser.java:121-147; the reference defaults to 'fr' and its
# languageUtilities call never overrides it — we keep the fr default but make
# the sample-based id real)
_FR_MARKERS = r"\b(?:le|la|les|de|des|du|et|une?|est|pour|avec|dans)\b"
_EN_MARKERS = r"\b(?:the|and|of|to|is|are|for|with|was|this)\b"


def _subparse_fields(fields: pd.DataFrame, labeler, prefix: str) -> pd.DataFrame:
    """Run a token sub-model over merged field texts → prefixed sub-spans.

    The reference splits medics on ';' and parses each chunk
    (HeaderMedicalParser.java:184-190); here the sub-model's own boundary
    features (';' and sentence periods are hard 'other' breaks,
    subparsers.parse_medic_tokens) produce the same clusters over the joined
    string in one vectorized pass, so no explicit split is needed.
    """
    if fields.empty:
        return _EMPTY
    from . import subparsers as sub_k
    from .tokenize import assign_blocks_pages, explode_tokens

    sub = pd.DataFrame(
        {
            "doc_id": fields["doc_id"].to_numpy(),
            "kind": "text",
            "text": fields["text"].to_numpy(),
            "media_ref": None,
            "offset": fields["offset"].to_numpy(),
        }
    )
    sub = assign_blocks_pages(sub)
    toks = explode_tokens(sub)
    if toks.empty:
        return _EMPTY
    toks = sub_k.token_features(toks)
    toks["label"] = labeler(toks)
    out = sub_k.tokens_to_spans(toks)
    if out.empty:
        return _EMPTY
    out["kind"] = prefix + out["kind"]
    return out


def _dateline_fallback(spans: pd.DataFrame) -> pd.DataFrame:
    """DatelineParser fallback: docs with a <dateline> field get missing
    doctype/date/place filled from parsing it (HeaderMedicalParser.java:
    153-172). Emitted at the dateline's offset so the fills sit next to it.
    """
    dl = spans[spans["kind"].eq("dateline")]
    if dl.empty:
        return _EMPTY
    from . import subparsers as sub_k

    parsed = _subparse_fields(dl, sub_k.parse_dateline_tokens, "")
    if parsed.empty:
        return _EMPTY
    # only the FIRST cluster of each kind per doc fills the field
    parsed = parsed[~parsed.duplicated(subset=["doc_id", "kind"], keep="first")]
    have = spans[["doc_id", "kind"]].drop_duplicates()
    fills = []
    for kind, out_kind in [("doctype", "doctype"), ("date", "date"),
                           ("place", "place")]:
        cand = parsed[parsed["kind"].eq(kind)]
        if cand.empty:
            continue
        cand = cand[
            ~cand["doc_id"].isin(
                have.loc[have["kind"].eq(out_kind), "doc_id"]
            )
        ]
        if cand.empty:
            continue
        cand = cand.assign(kind=out_kind)
        if out_kind == "date":
            iso = to_iso_date(cand["text"])
            cand = cand.assign(text=iso.where(iso.ne(""), cand["text"]))
        fills.append(cand)
    if not fills:
        return _EMPTY
    return pd.concat(fills, ignore_index=True)


def scalar_enrichment_spans(
    lines: pd.DataFrame, spans: pd.DataFrame
) -> pd.DataFrame:
    """Per-document scalar enrichment shared by the header and left-note
    parsers (HeaderMedicalParser.java:120-150, LeftNoteMedicalParser.java:
    121-155): language id over a 200-char body sample (fr default — the
    reference never overrides it) + page count. Emitted as `lang` /
    `page_count` spans after the document's last line."""
    from .cluster import group_join

    doc_ids = np.sort(spans["doc_id"].unique())
    last_off = lines.groupby("doc_id")["offset"].max()

    body = lines[
        lines["zone"].eq("body")
        & ~(lines["is_blank"] | lines["is_page_break"] | lines["is_media"])
    ]
    if body.empty:
        sample = pd.Series("", index=pd.Index(doc_ids, name="doc_id"))
    else:
        body = body.sort_values(["doc_id", "offset"], kind="stable")
        joined = pd.Series(
            group_join(
                body["text"].astype(str).to_numpy(),
                pd.factorize(body["doc_id"])[0],
                sep=" ",
            ),
            index=body.loc[~body.duplicated("doc_id"), "doc_id"].to_numpy(),
        )
        sample = joined.str.slice(0, 200).reindex(doc_ids, fill_value="")
    fr = sample.str.lower().str.count(_FR_MARKERS)
    en = sample.str.lower().str.count(_EN_MARKERS)
    lang = np.where(en > fr, "en", "fr")  # fr default, as the reference

    breaks = lines[lines["is_page_break"]].groupby("doc_id").size()
    n_pages = (
        breaks.reindex(doc_ids, fill_value=0).to_numpy(dtype=np.int64) + 1
    )
    tail_off = last_off.reindex(doc_ids).to_numpy(dtype=np.int64)
    return pd.DataFrame(
        {
            "doc_id": np.repeat(doc_ids, 2),
            "kind": np.tile(["lang", "page_count"], len(doc_ids)),
            "text": np.stack([lang, n_pages.astype(str)], axis=1).ravel(),
            "media_ref": None,
            "offset": np.stack([tail_off + 1, tail_off + 2], axis=1).ravel(),
        }
    )


def enrich_header_fields(
    lines: pd.DataFrame, spans: pd.DataFrame
) -> pd.DataFrame:
    """C2 header enrichment cascade over merged field spans.

    Reference (HeaderMedicalParser.java:110-198):
      1. dateline fallback — missing doctype/date/place filled by running the
         dateline sub-model on the <dateline> field (:153-172),
      2. medics re-parsed through the medic sub-model (split on ';', :184-190)
         → `medic_*` sub-spans; patients through the patient sub-model
         (:191-198) → `patient_*` sub-spans,
      3. language id over a 200-char body sample, default 'fr' (:120-147)
         → `lang` span,
      4. page count (:150) → `page_count` span.

    ``lines`` must carry the zone column (for the body language sample and
    page counting); ``spans`` is merge_header_fields output. Everything is
    column-vectorized; the sub-models reuse the exact token kernels the
    string endpoints use (composition, not reimplementation).
    """
    if spans.empty:
        return spans
    from . import subparsers as sub_k
    from .cluster import group_join

    parts = [spans, _dateline_fallback(spans)]
    parts.append(
        _subparse_fields(
            spans[spans["kind"].eq("medic")],
            sub_k.parse_medic_tokens,
            "medic_",
        )
    )
    parts.append(
        _subparse_fields(
            spans[spans["kind"].eq("patient")],
            sub_k.parse_patient_tokens,
            "patient_",
        )
    )

    parts.append(scalar_enrichment_spans(lines, spans))
    out = pd.concat([p for p in parts if not p.empty], ignore_index=True)
    # stable by offset: sub-spans share their parent's offset and were
    # concatenated after it, so they sort immediately after the parent
    return out.sort_values(["doc_id", "offset"], kind="stable")[
        ["doc_id", "kind", "text", "media_ref", "offset"]
    ].reset_index(drop=True)
