"""The extraction cascade as vectorized Spark stages (SURVEY.md §2.5 C1, §3.4).

Reference lifecycle (FullMedicalTextParser.java:106-206): segmenter →
header+leftnote → body featurize/label → figures/tables → callouts → TEI.
Here the whole cascade is ONE shuffle-free `mapInArrow` pass: each Arrow batch
of document rows is flattened to a lines frame with Arrow list kernels (no
Python dicts at the boundary), run through the pure-pandas/numpy kernels, and
regrouped to `(doc_id, spans)` list<struct> rows, again directly in Arrow.
No groupBy is needed because one row already holds a whole document — the
JVM↔Python Arrow hop is the only process boundary (vs. the reference's
per-document pdfalto subprocess + Wapiti JNI hops).

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
import pyarrow as pa
import pyarrow.compute as pc

from .kernels import body as body_k
from .kernels import callouts as callouts_k
from .kernels import header as header_k
from .kernels import leftnote as leftnote_k
from .kernels import ner as ner_k
from .kernels import subparsers as sub_k
from .kernels.cluster import dedup_notes
from .kernels.features import featurize_extras, featurize_lines
from .kernels.normalize import normalize_text
from .kernels.segmenter import segment_lines
from .kernels.tokenize import assign_blocks_pages, explode_tokens, sanitize_lines
from .schema import EXTRACTED_DDL

_EMPTY_SPANS = pd.DataFrame(
    columns=["doc_id", "kind", "text", "media_ref", "offset"]
)
_LINE_COLS = ["doc_id", "seq", "kind", "text", "media_ref", "offset"]


# which feature passes each mode needs: token modes only need structure,
# extract_full skips the header-only lexicon scans. Header/leftnote modes
# are TWO-PASS: segmentation on the 'body' profile over every line, the
# 'all'-only extras (featurize_extras) computed on the zone subset only —
# ~10 lines per ~150-line document instead of the whole corpus
_MODE_PROFILE = {
    "extract_full": "body",
    "extract_header": "body",
    "extract_leftnote": "body",
    # token-level modes need only block/page structure, no line features
    "ner": "minimal",
    "parse_dateline": "minimal",
    "parse_medic": "minimal",
    "parse_patient": "minimal",
    "parse_name": "minimal",
    "parse_address": "minimal",
    "parse_org": "minimal",
}

# Preferred input-split size per mode (spark.sql.files.maxPartitionBytes, a
# RUNTIME SQL conf — settable per job, unlike spark.task.cpus). The token
# models cost ~3× the line cascade per document, so their ideal split is
# ~1/3 the bytes: at local[32] on the 20k-doc corpus, 4m splits give the
# NER pass only 43 tasks (11 workers run 2 batches → wall = 2 batches),
# while 1m gives 172 and halves the wall (measured 7.7-13.1s → 4.0-4.4s);
# the extraction cascade is fastest at 2-4m (1m reads 4.9s vs 3.7-4.3s —
# per-task overhead outweighs the balance win). Consumers (runner CLI,
# bench) apply this before the scan; on a cluster the submitter scales it
# with executor count.
MODE_SPLIT_BYTES = {
    "ner": "1m",
    "parse_dateline": "1m",
    "parse_medic": "1m",
    "parse_patient": "1m",
    "parse_name": "1m",
    "parse_address": "1m",
    "parse_org": "1m",
}


def apply_split_hint(spark, mode: str) -> None:
    """Set the mode's preferred scan-split size on the session (no-op for
    modes without a hint). Call before building the scan DataFrame.

    SCOPE CONSTRAINT (VERDICT r6 'what's wrong #4'): this mutates a
    SESSION-GLOBAL SQL conf, so a session must run ONE mode at a time —
    two modes with different hints planned concurrently on one session
    would race the conf. All current consumers satisfy this: __main__
    sets it once per process before the job, the bench restores the
    default after every leg, and runner's concurrent bucket pool runs one
    mode per job (its threads share a scan conf set before the pool
    starts). A future mixed-mode service must plan each mode on its own
    session (SparkSession.newSession() shares the context but isolates
    SQL confs)."""
    hint = MODE_SPLIT_BYTES.get(mode)
    if hint is not None:
        spark.conf.set("spark.sql.files.maxPartitionBytes", hint)


def prepare_lines(lines: pd.DataFrame, profile: str = "all") -> pd.DataFrame:
    """Raw flat lines → sanitized, block/page-structured, featurized lines.
    `doc_id` must be a batch-local integer code (kernels group on ints —
    string doc_ids stay out of the per-line hot path entirely)."""
    if lines.empty:
        return lines
    lines = sanitize_lines(lines)
    lines = assign_blocks_pages(lines)  # adds seq/block/page structure
    if profile == "minimal":
        return lines
    return featurize_lines(lines, profile=profile)


def explode_docs(pdf: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, spans[]) pandas rows → raw flat lines frame (test path; the
    Spark path flattens in Arrow, see _lines_from_batch)."""
    if pdf.empty:
        return pd.DataFrame(columns=_LINE_COLS)
    ex = pdf[["doc_id", "spans"]].explode("spans", ignore_index=True)
    ex = ex[ex["spans"].notna()]
    cols = pd.DataFrame(ex["spans"].tolist(), index=ex.index)
    lines = pd.concat([ex[["doc_id"]], cols], axis=1).reset_index(drop=True)
    if "media_ref" not in lines:
        lines["media_ref"] = None
    return lines


# ---------------------------------------------------------------------------
# flat stage functions: featurized lines → flat spans
# ---------------------------------------------------------------------------


def flat_extract_full(lines: pd.DataFrame) -> pd.DataFrame:
    """C1 full cascade → body-structure spans + annex/acknowledgement spans
    + deduped note spans."""
    lines = lines.assign(zone=segment_lines(lines))

    body_lines = lines[lines["zone"].eq("body")].copy()
    if not body_lines.empty:
        body_lines["label"] = body_k.label_body_lines(body_lines)
        # processShort analog: split trailing prose out of caption clusters
        body_lines["label"] = body_k.relabel_caption_tails(body_lines)
        spans_body = body_k.body_spans(body_lines)
        spans_body = callouts_k.reconcile_markers(spans_body)  # C4
    else:
        spans_body = _EMPTY_SPANS

    # trailing zones: consecutive same-zone lines merge into one span per
    # block (reference: back-matter <div type=annex|acknowledgement>)
    # (both tail subsets pruned to consumed columns — the full featurized
    # frame is ~40 columns wide)
    tail = lines.loc[
        lines["zone"].isin(["annex", "acknowledgement"])
        & ~(lines["is_blank"] | lines["is_page_break"]),
        ["doc_id", "seq", "text", "media_ref", "offset", "zone",
         "block_id", "is_media", "is_blank", "is_page_break"],
    ].copy()
    if not tail.empty:
        tail["label"] = tail["zone"]
        spans_tail = body_k.zone_block_spans(tail)
    else:
        spans_tail = _EMPTY_SPANS

    notes = lines.loc[
        lines["zone"].isin(["footnote", "headnote"])
        & ~(lines["is_blank"] | lines["is_page_break"]),
        ["doc_id", "zone", "text", "offset"],
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
    return pd.concat(
        [spans_body, spans_tail, spans_notes], ignore_index=True
    )


def flat_extract_header(lines: pd.DataFrame) -> pd.DataFrame:
    lines = lines.assign(zone=segment_lines(lines))
    hdr = lines[lines["zone"].eq("header")].copy()
    if hdr.empty:
        return _EMPTY_SPANS
    hdr = featurize_extras(hdr)  # pass 2: zone subset only
    hdr["label"] = header_k.label_header_lines(hdr)
    spans = header_k.merge_header_fields(hdr)
    # C2 enrichment: dateline fallback, medic/patient sub-models, langid,
    # page count (HeaderMedicalParser.java:110-198)
    return header_k.enrich_header_fields(lines, spans)


def flat_extract_leftnote(lines: pd.DataFrame) -> pd.DataFrame:
    lines = lines.assign(zone=segment_lines(lines))
    ln = lines[lines["zone"].eq("leftnote")].copy()
    if ln.empty:
        return _EMPTY_SPANS
    ln = featurize_extras(ln)  # pass 2: zone subset only
    ln["label"] = leftnote_k.label_leftnote_lines(ln)
    spans = leftnote_k.merge_leftnote_fields(ln)
    if spans.empty:
        return spans
    # langid + page-count enrichment (LeftNoteMedicalParser.java:121-155 —
    # the same scalar pass the header parser runs)
    scalars = header_k.scalar_enrichment_spans(lines, spans)
    out = pd.concat([spans, scalars], ignore_index=True)
    return out.sort_values(["doc_id", "offset"], kind="stable").reset_index(
        drop=True
    )


def _content_tokens(lines: pd.DataFrame) -> pd.DataFrame:
    content = lines[
        ~(lines["is_blank"] | lines["is_page_break"] | lines["is_media"])
    ]
    # prune to the 4 columns the token path consumes BEFORE the per-token
    # gather: explode_tokens row-replicates its input frame (one row per
    # token), and carrying the ~40 line-feature columns through that take
    # was the single largest NER cost (profiled: 2000 docs / 2M tokens,
    # 7.0s → 2.4s for the explode; the token models use only token-level
    # features, never line features — verified by column-usage audit)
    content = content[["doc_id", "seq", "text", "offset"]]
    # drop_text: the token models never read the line text again — without
    # it the per-token replication take and every later frame rebuild are
    # 3 int columns + the Arrow tok/gap arrays, no string column
    toks = explode_tokens(content, drop_text=True)
    if toks.empty:
        return toks
    return sub_k.token_features(toks)


def flat_ner(lines: pd.DataFrame) -> pd.DataFrame:
    toks = _content_tokens(lines)
    if toks.empty:
        return _EMPTY_SPANS
    return ner_k.ner_spans(toks)


def _flat_token_mode(labeler: Callable, pojo: bool = False) -> Callable:
    def fn(lines: pd.DataFrame) -> pd.DataFrame:
        toks = _content_tokens(lines)
        if toks.empty:
            return _EMPTY_SPANS
        toks["label"] = labeler(toks)
        spans = sub_k.tokens_to_spans(toks)
        # medic/patient string endpoints fill ONE POJO per input string —
        # repeated field clusters merge (MedicParser.java:103-228)
        return sub_k.pojo_merge_spans(spans) if pojo else spans

    return fn


# string endpoints whose reference parser fills a single POJO per input
_POJO_MODES = {"parse_medic", "parse_patient"}

FLAT_MODES: dict[str, Callable[[pd.DataFrame], pd.DataFrame]] = {
    "extract_full": flat_extract_full,
    "extract_header": flat_extract_header,
    "extract_leftnote": flat_extract_leftnote,
    "ner": flat_ner,
}
for _name, _labeler in sub_k.SUBPARSERS.items():
    FLAT_MODES[_name] = _flat_token_mode(_labeler, pojo=_name in _POJO_MODES)


# ---------------------------------------------------------------------------
# pandas-level modes (pure; unit-testable without Spark)
# ---------------------------------------------------------------------------


def _prep_for_test(pdf: pd.DataFrame, profile: str = "minimal") -> pd.DataFrame:
    """Test helper: explode + prepare keeping string doc_ids."""
    return prepare_lines(explode_docs(pdf), profile=profile)


def _run_pdf(pdf: pd.DataFrame, mode: str) -> pd.DataFrame:
    raw = explode_docs(pdf)
    if raw.empty:
        return _regroup(pdf, _EMPTY_SPANS)
    codes, uniques = pd.factorize(raw["doc_id"])
    raw["doc_id"] = codes
    lines = prepare_lines(raw, profile=_MODE_PROFILE.get(mode, "all"))
    flat = FLAT_MODES[mode](lines)
    if not flat.empty:
        # concat with the empty sentinel frame may upcast codes to object
        codes_out = flat["doc_id"].to_numpy().astype(np.int64)
        flat = flat.assign(doc_id=uniques.to_numpy()[codes_out])
    return _regroup(pdf, flat)


def _regroup(pdf_in: pd.DataFrame, flat: pd.DataFrame) -> pd.DataFrame:
    """Flat spans → one (doc_id, spans[]) row per input doc (empty list when
    a doc produced nothing, so output cardinality == input cardinality)."""
    if flat.empty:
        return pd.DataFrame(
            {"doc_id": pdf_in["doc_id"], "spans": [[] for _ in range(len(pdf_in))]}
        )
    flat = flat.sort_values(["doc_id", "offset"], kind="stable")
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


def extract_full_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    return _run_pdf(pdf, "extract_full")


def extract_header_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    return _run_pdf(pdf, "extract_header")


def extract_leftnote_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    return _run_pdf(pdf, "extract_leftnote")


def ner_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    return _run_pdf(pdf, "ner")


def parse_dateline_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    return _run_pdf(pdf, "parse_dateline")


def parse_medic_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    return _run_pdf(pdf, "parse_medic")


def parse_patient_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    return _run_pdf(pdf, "parse_patient")


PANDAS_MODES: dict[str, Callable[[pd.DataFrame], pd.DataFrame]] = {
    "extract_full": extract_full_pdf,
    "extract_header": extract_header_pdf,
    "extract_leftnote": extract_leftnote_pdf,
    "ner": ner_pdf,
    "parse_dateline": parse_dateline_pdf,
    "parse_medic": parse_medic_pdf,
    "parse_patient": parse_patient_pdf,
}
for _m in ("parse_name", "parse_address", "parse_org"):
    PANDAS_MODES[_m] = (lambda mode: lambda pdf: _run_pdf(pdf, mode))(_m)


# ---------------------------------------------------------------------------
# Spark layer: Arrow-native flatten → kernels → Arrow-native regroup
# ---------------------------------------------------------------------------


# kernel-batch coalescing: the spans corpus ships 256-doc parquet row
# groups so SCAN splits fan out at high core counts (round-6 row-group
# finding), but the Python kernels amortize fixed cost with batch height —
# the padded Viterbi DP's per-timestep loop runs once per batch, and taller
# buckets cost the same number of steps for 4× the lanes. Interleaved
# same-process A/B at 256 vs 1024 docs/batch: 63-67s vs 47-54s CPU for the
# full 20k-doc cascade (~20-25%). 2048 measured flat vs 1024 (49.2 vs
# 50.4s), so 1024 takes the memory low ground. Scan parallelism is
# untouched: coalescing happens INSIDE the task, and a task whose split
# holds a single row group sees exactly one batch either way. The span cap
# bounds memory against whale documents (a 21k-span doc alone fills a
# quarter of the cap).
_COALESCE_DOCS = 1024
_COALESCE_SPANS = 1 << 18


def _coalesced(
    batches: Iterator[pa.RecordBatch],
) -> Iterator[pa.RecordBatch]:
    buf: list[pa.RecordBatch] = []
    docs = spans = 0
    for b in batches:
        if b.num_rows == 0:
            continue
        buf.append(b)
        docs += b.num_rows
        s = pc.sum(pc.list_value_length(b.column("spans"))).as_py()
        spans += int(s or 0)
        if docs >= _COALESCE_DOCS or spans >= _COALESCE_SPANS:
            yield (
                buf[0]
                if len(buf) == 1
                else pa.Table.from_batches(buf).combine_chunks().to_batches()[0]
            )
            buf, docs, spans = [], 0, 0
    if buf:
        yield (
            buf[0]
            if len(buf) == 1
            else pa.Table.from_batches(buf).combine_chunks().to_batches()[0]
        )


def _lines_from_batch(batch: pa.RecordBatch) -> tuple[pa.Array, pd.DataFrame]:
    """Arrow batch (doc_id, spans list<struct>) → (doc_id array, raw lines
    frame). pc.list_flatten/list_parent_indices do the explode in C++ —
    no per-span Python objects."""
    doc_ids = batch.column("doc_id")
    spans = batch.column("spans")
    parent = pc.list_parent_indices(spans)
    flat = pc.list_flatten(spans)
    from .kernels.arrowtext import series_of

    lines = pd.DataFrame(
        {
            # batch-local int code = row index of the parent document; the
            # string doc_id never materializes per line. text/kind stay
            # Arrow-backed — object-dtype strings never materialize either.
            "doc_id": parent.to_numpy(zero_copy_only=False).astype(np.int64),
            "kind": series_of(flat.field("kind")),
            "text": series_of(flat.field("text")),
            "media_ref": flat.field("media_ref").to_numpy(zero_copy_only=False),
            "offset": flat.field("offset").to_numpy(zero_copy_only=False),
        }
    )
    return doc_ids, lines


_OUT_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),
    ]
)


def _batch_from_flat(doc_ids: pa.Array, flat: pd.DataFrame) -> pa.RecordBatch:
    """Flat spans → (doc_id, spans list<struct>) Arrow batch aligned with the
    input doc order (empty lists for docs with no spans)."""
    n_docs = len(doc_ids)
    if flat.empty:
        counts = np.zeros(n_docs, dtype=np.int64)
        struct = pa.array([], type=_OUT_STRUCT)
    else:
        codes = flat["doc_id"].to_numpy().astype(np.int64)
        order = np.lexsort((flat["offset"].to_numpy(), codes))
        flat = flat.iloc[order]
        codes = codes[order]
        counts = np.bincount(codes, minlength=n_docs)

        def _str_col(s: pd.Series) -> pa.Array:
            # Arrow-backed columns (token-mode span text since r8) export
            # without the object round-trip; never-null by construction
            if isinstance(s.dtype, pd.ArrowDtype):
                return _arr_str(s)
            return pa.array(s.astype(str), type=pa.string())

        mref = flat["media_ref"]
        if mref.isna().all():
            mref_arr = pa.nulls(len(flat), pa.string())
        else:
            mref_arr = pa.array(
                mref.astype(object).where(mref.notna(), None).to_numpy(),
                type=pa.string(),
            )
        struct = pa.StructArray.from_arrays(
            [
                _str_col(flat["kind"]),
                _str_col(flat["text"]),
                mref_arr,
                pa.array(
                    flat["offset"].to_numpy().astype(np.int32), type=pa.int32()
                ),
            ],
            fields=list(_OUT_STRUCT),
        )
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    spans = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), struct)
    return pa.RecordBatch.from_arrays([doc_ids, spans], names=["doc_id", "spans"])


def _arr_str(s: pd.Series) -> pa.Array:
    """Series → Arrow string array, zero-copy for Arrow-backed columns."""
    from .kernels.arrowtext import arr_of

    return arr_of(s)


TRAINING_DDL = "doc_id string, seq int, text string, label string"
TRAINING_NER_DDL = (
    "doc_id string, seq int, tok_idx int, text string, label string"
)


def run_training_ner(df):
    """createTrainingFrenchMedicalNER analog: per-TOKEN supervision pairs —
    every content token with its decoded NER label (incl. 'other'
    negatives, which the CRF refit needs). Same zero-shuffle mapInArrow
    shape as run_mode."""

    def mapper(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in _coalesced(batches):
            if batch.num_rows == 0:
                continue
            doc_ids, raw = _lines_from_batch(batch)
            lines = prepare_lines(raw, profile="body")
            if lines.empty:
                continue
            toks = _content_tokens(lines)
            if toks.empty:
                continue
            toks = toks.assign(label=ner_k.label_ner_tokens(toks))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(
                        np.asarray(doc_ids)[toks["doc_id"].to_numpy()],
                        type=pa.string(),
                    ),
                    pa.array(
                        toks["seq"].to_numpy().astype(np.int32), type=pa.int32()
                    ),
                    pa.array(
                        toks["tok_idx"].to_numpy().astype(np.int32),
                        type=pa.int32(),
                    ),
                    _arr_str(toks["tok"]),
                    _arr_str(toks["label"]),
                ],
                names=["doc_id", "seq", "tok_idx", "text", "label"],
            )

    return df.mapInArrow(mapper, schema=TRAINING_NER_DDL)


def run_training(df, model: str = "segmenter"):
    """A2 training-data generation (SURVEY.md §2.7; the reference's
    createTraining* family — FullMedicalTextParser.createTraining,
    HeaderMedicalParser.createTrainingHeaderMedical): emit the per-line
    labeled table a model refit consumes. `segmenter` yields every content
    line with its decoded zone; `header` yields the header-zone lines with
    their decoded field label (the header model's supervision pairs). Same
    single mapInArrow shape as run_mode; features are recomputable from
    `text` by featurize_lines."""
    if model not in ("segmenter", "header", "leftnote"):
        raise ValueError(f"unknown training model: {model}")

    def mapper(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from .kernels.segmenter import segment_lines

        for batch in _coalesced(batches):
            if batch.num_rows == 0:
                continue
            doc_ids, raw = _lines_from_batch(batch)
            # segmentation consumes only the 'body' feature profile
            lines = prepare_lines(raw, profile="body")
            if lines.empty:
                continue
            lines = lines.assign(zone=segment_lines(lines))
            if model in ("header", "leftnote"):
                zone = lines[lines["zone"].eq(model)].copy()
                if zone.empty:
                    continue
                zone = featurize_extras(zone)
                zone = zone.rename(columns={"zone": "_zone"})
                labeler = (
                    header_k.label_header_lines
                    if model == "header"
                    else leftnote_k.label_leftnote_lines
                )
                zone["zone"] = labeler(zone)
                lines = zone
            content = lines[
                ~(lines["is_blank"] | lines["is_page_break"])
            ]
            ids = pa.array(
                np.asarray(doc_ids)[content["doc_id"].to_numpy()],
                type=pa.string(),
            )
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array(
                        content["seq"].to_numpy().astype(np.int32),
                        type=pa.int32(),
                    ),
                    pa.array(content["text"].astype(str), type=pa.string()),
                    pa.array(content["zone"].astype(str), type=pa.string()),
                ],
                names=["doc_id", "seq", "text", "label"],
            )

    return df.mapInArrow(mapper, schema=TRAINING_DDL)


def run_mode(df, mode: str):
    """documents DataFrame → extracted-spans DataFrame, one vectorized
    mapInArrow pass (no shuffle: one row = one document; partitioning is
    whatever the scan/repartition upstream chose — see runner.salt_partition).
    """
    flat_fn = FLAT_MODES[mode]
    profile = _MODE_PROFILE.get(mode, "all")

    def mapper(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in _coalesced(batches):
            if batch.num_rows == 0:
                continue
            doc_ids, raw = _lines_from_batch(batch)
            lines = prepare_lines(raw, profile=profile)
            flat = flat_fn(lines) if not lines.empty else _EMPTY_SPANS
            yield _batch_from_flat(doc_ids, flat)

    return df.mapInArrow(mapper, schema=EXTRACTED_DDL)
