"""Tokenization / line handling kernels (SURVEY.md §2.2 T1-T3, T5).

Reference parity:
- T1 `GrobidAnalyzer.tokenizeWithLayoutToken` (used e.g. MedicParser.java:63,
  FrenchMedicalNERParser.java:186) → vectorized regex tokenizer,
- T2 line splitting on [\\n\\r] (MedicalReportSegmenterParser.java:377-388),
- T3 sanitization: drop empties / junk sentinels
  (MedicalReportSegmenterParser.java:430-437, FullMedicalTextParser.java:445-473),
- T5 contiguous piece building by offset continuity
  (FullMedicalTextParser.java:212-317 processShortNew/processShort) →
  run-length segmentation on offset deltas.

Everything operates on whole pandas columns (str.findall / explode), not rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# GROBID's analyzer splits on whitespace and keeps punctuation as separate
# tokens; this regex reproduces that token shape for French clinical text.
# Dates and clock times are kept as single tokens (the reference re-joins them
# downstream via its date parser; single-token form keeps the kernels flat).
TOKEN_RE = (
    r"\d{1,2}[./-]\d{1,2}[./-]\d{2,4}"      # numeric date
    r"|\d{1,2}[hH:]\d{2}\b"                  # clock time
    r"|[A-Za-zÀ-ÖØ-öø-ÿ]+(?:['’][A-Za-zÀ-ÖØ-öø-ÿ]+)?"
    r"|\d+(?:[.,]\d+)?"
    r"|[^\sA-Za-zÀ-ÖØ-öø-ÿ\d]"
)

# junk sentinels the reference filters via TextUtilities.filterLine
JUNK_TOKENS = {"@PAGE", "@IMAGE", "\x00", "�"}


def tokenize_column(text: pd.Series) -> pd.Series:
    """Each element → list[str] of tokens (vectorized str.findall)."""
    return text.fillna("").str.findall(TOKEN_RE)


def explode_tokens(
    lines: pd.DataFrame, text_col: str = "text", drop_text: bool = False
) -> pd.DataFrame:
    """Flat lines DataFrame → flat tokens DataFrame.

    Input columns: at least [doc_id, seq, text]; output adds:
      tok      — the token string,
      gap      — the raw text between the previous token and this one (so any
                 token-range span can reconstruct its exact source substring:
                 first tok + Σ(gap_i + tok_i) — no per-row slicing needed),
      tok_idx  — position within the line.

    Fully Arrow-vectorized: every token match is bracketed with a \\x00
    sentinel (one RE2 replace), the line splits on the sentinel into an
    alternating [gap, tok, gap, tok, …, gap] list, and list_flatten /
    list_parent_indices explode it in C++ — position parity separates
    tokens from gaps (pandas str.findall was a per-row Python re loop, the
    former tokenizer hotspot). tok/gap come back ARROW-BACKED (no object
    materialization; downstream arr_of calls are zero-copy).

    ``drop_text``: skip replicating the line-text column onto every token
    row — the extraction token models never read it (pipeline's
    _content_tokens audit), and carrying it through the per-token take +
    later frame rebuilds was pure waste. Default False: corpus_import and
    the tests rely on the pass-through.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from . import arrowtext as at
    from .segments import seg_position, seg_starts

    arr = at.arr_of(lines[text_col])
    arr = pc.coalesce(arr, "")
    # dictionary-encode first: the TOKEN_RE bracketing pass (the big RE2
    # alternation, this kernel's dominant cost) runs over the ~60%-unique
    # line dictionary; the per-row token lists are then replicated by one
    # C++ list take in codes order — identical output rows
    enc = arr.dictionary_encode()
    codes = enc.indices
    uniq = enc.dictionary
    # \x00 is the bracketing sentinel below, but NULs are also legal input
    # (dirty PDF text — JUNK_TOKENS lists '\x00'). Map them to U+FFFD first:
    # '�' matches TOKEN_RE's punctuation alternative and is junk-filtered,
    # which is exactly what the old findall path did with the NUL token —
    # adjacent tokens stay separate and the sentinel is guaranteed absent.
    uniq = pc.replace_substring(uniq, pattern="\x00", replacement="�")
    marked = pc.replace_substring_regex(
        uniq, f"({TOKEN_RE})", "\x00\\1\x00"
    )
    parts = pc.split_pattern(marked, "\x00").take(codes)
    flat = pc.list_flatten(parts)
    parent = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
    n_flat = len(flat)
    pos = seg_position(seg_starts(parent), n_flat)
    is_tok = (pos % 2) == 1  # odd positions are the bracketed matches

    tok_idx_flat = np.flatnonzero(is_tok)
    # codepoint lengths in Arrow (pandas .str.len over object arrays is a
    # per-row Python map — profiled at ~1/3 of this kernel)
    flat_lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    toks_arr = flat.take(pa.array(tok_idx_flat))
    keep_a = pc.invert(
        pc.is_in(
            toks_arr,
            value_set=pa.array(sorted(JUNK_TOKENS), type=pa.string()),
        )
    )
    keep = keep_a.to_numpy(zero_copy_only=False)
    kept_idx = tok_idx_flat[keep]
    toks_arr = toks_arr.filter(keep_a)
    gaps_arr = flat.take(pa.array(kept_idx - 1))  # element before = gap
    parents = parent[kept_idx]

    src = lines.drop(columns=[text_col]) if drop_text else lines
    out = src.reset_index(drop=True).take(parents).reset_index(drop=True)
    out["tok"] = at.series_of(toks_arr, index=out.index)
    out["gap"] = at.series_of(gaps_arr, index=out.index)
    doc = out["doc_id"].to_numpy()
    if not np.issubdtype(doc.dtype, np.integer):
        doc = pd.factorize(doc)[0]
    out["line_key"] = doc.astype(np.int64) * (1 << 22) + out["seq"].to_numpy()

    from .segments import seg_cumsum, seg_position, seg_starts

    lstarts = seg_starts(out["line_key"].to_numpy())
    out["tok_idx"] = seg_position(lstarts, len(out))
    # char offsets within the line (entity spans report start/end,
    # FrenchMedicalNERParser.java:560-797). The cumsum runs over ALL flat
    # parts — gaps, tokens, AND junk-filtered tokens — then indexes at the
    # kept positions: a kept-only cumsum (the former code) silently
    # dropped each junk token's length and its preceding gap, drifting
    # every later offset in the line. The extraction cascade never sees
    # the difference (prepare_lines sanitizes junk out of the text first),
    # but corpus_import labels tokens by offsets in the ORIGINAL document
    # text, where a NUL/@PAGE before an entity must still be counted.
    ends_all = seg_cumsum(flat_lens, seg_starts(parent))
    out["tok_end"] = ends_all[kept_idx]
    out["tok_start"] = ends_all[kept_idx] - flat_lens[kept_idx]
    return out


_JUNK_RE = "|".join(
    {"@PAGE": "@PAGE", "@IMAGE": "@IMAGE", "\x00": "\\x00", "�": "�"}.values()
)


def sanitize_lines(lines: pd.DataFrame) -> pd.DataFrame:
    """T3: strip junk sentinels from line text; keep blank lines (they are
    block separators, consumed by block/page segmentation). One RE2 pass;
    skipped entirely when the batch is clean (the common case)."""
    from . import arrowtext as at

    arr = at.arr_of(lines["text"])
    if not at.contains(arr, _JUNK_RE).any():
        return lines.assign(text=at.series_of(arr, index=lines.index))
    clean = at.replace(arr, _JUNK_RE, "")
    return lines.assign(text=at.series_of(clean, index=lines.index))


def contiguous_pieces(offsets: np.ndarray, max_gap: int) -> np.ndarray:
    """T5: group sorted offsets into contiguous pieces; returns piece ids.

    A new piece opens when the offset delta exceeds ``max_gap`` — the numpy
    equivalent of DocumentPiece construction over token-pointer continuity
    (FullMedicalTextParser.java:216-251).
    """
    if len(offsets) == 0:
        return np.zeros(0, dtype=np.int64)
    gaps = np.diff(offsets, prepend=offsets[0]) > max_gap
    return np.cumsum(gaps)


def assign_blocks_pages(lines: pd.DataFrame) -> pd.DataFrame:
    """Derive block_id / page_id / line-in-block structure from the span
    stream: blank text spans ('') delimit blocks, form-feed spans ('\\f')
    delimit pages (FIXTURES.md §1). Vectorized via groupby-cumsum over
    integer composite keys (doc_id is expected to be a batch-local int code
    in the hot path — see pipeline._lines_from_batch; string doc_ids are
    factorized on the fly for the test path).

    Adds: is_blank, is_page_break, is_media, block_id, page_id,
    line_in_block, block_len, block_key (doc⊕block int composite).
    """
    from . import arrowtext as at

    import pyarrow.compute as pc

    from .segments import (
        seg_cumsum,
        seg_position,
        seg_starts,
        seg_sum_transform,
    )

    df = lines.copy(deep=False)
    n = len(df)
    txt_arr = at.arr_of(df["text"])
    kind_arr = at.arr_of(df["kind"])
    df["is_media"] = pc.equal(kind_arr, "media").to_numpy(zero_copy_only=False)
    df["is_page_break"] = pc.equal(txt_arr, "\f").to_numpy(
        zero_copy_only=False
    )
    df["is_blank"] = (
        ~at.contains(txt_arr, r"\S") & ~df["is_media"] & ~df["is_page_break"]
    )

    doc = df["doc_id"].to_numpy()
    if not np.issubdtype(doc.dtype, np.integer):
        doc = pd.factorize(doc)[0]
    doc = doc.astype(np.int64)
    df["_doc_code"] = doc

    # lines arrive grouped by document → every grouping below is a
    # contiguous-segment aggregation (kernels/segments.py), no hash groupby
    dstarts = seg_starts(doc)
    if "seq" not in df.columns:
        df["seq"] = seg_position(dstarts, n)
    sep = (df["is_blank"] | df["is_page_break"]).to_numpy().astype(np.int64)
    df["block_id"] = seg_cumsum(sep, dstarts) - sep
    pb = df["is_page_break"].to_numpy().astype(np.int64)
    df["page_id"] = seg_cumsum(pb, dstarts) - pb

    block_key = doc * (1 << 22) + df["block_id"].to_numpy()
    df["block_key"] = block_key
    bstarts = seg_starts(block_key)
    content = (~(df["is_blank"] | df["is_page_break"])).to_numpy().astype(
        np.int64
    )
    df["line_in_block"] = seg_cumsum(content, bstarts) - content
    df["block_len"] = seg_sum_transform(content, bstarts)
    return df
