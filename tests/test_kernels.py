"""Per-stage unit tests for the pure pandas/numpy kernels (SURVEY.md §5.2.2)."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pytest

from grobid_clinical_report_spark.kernels import normalize
from grobid_clinical_report_spark.kernels.cluster import (
    dedup_notes,
    rle_cluster_ids,
)
from grobid_clinical_report_spark.kernels.tokenize import (
    assign_blocks_pages,
    contiguous_pieces,
    explode_tokens,
)
from grobid_clinical_report_spark.kernels.viterbi import viterbi_batch


# --- viterbi -----------------------------------------------------------------

def _brute(em, trans):
    T, L = em.shape
    best, bp = -1e18, None
    for path in itertools.product(range(L), repeat=T):
        s = em[0, path[0]] + sum(
            trans[path[i - 1], path[i]] + em[i, path[i]] for i in range(1, T)
        )
        if s > best:
            best, bp = s, path
    return np.array(bp)


def test_viterbi_matches_bruteforce():
    rng = np.random.default_rng(7)
    trans = rng.normal(size=(3, 3))
    ems = [rng.normal(size=(t, 3)) for t in [1, 2, 4, 6, 5, 3]]
    got = viterbi_batch(ems, trans)
    for e, g in zip(ems, got):
        assert np.array_equal(g, _brute(e, trans))


def test_viterbi_empty_and_batching():
    trans = np.zeros((2, 2))
    out = viterbi_batch([np.zeros((0, 2)), np.ones((3, 2))], trans)
    assert len(out[0]) == 0 and len(out[1]) == 3


def _rand_transitions(rng, L, kind):
    """kind 0: scalar sticky, 1: column-structured (per-label entry cost,
    the body-model shape), 2: general (the segmenter shape)."""
    if kind == 0:
        tr = np.full((L, L), -1.0)
        np.fill_diagonal(tr, float(rng.integers(0, 3)))
    elif kind == 1:
        tr = np.tile(rng.integers(-3, 4, size=(1, L)).astype(float), (L, 1))
        np.fill_diagonal(tr, rng.integers(-3, 4, size=L))
    else:
        tr = rng.integers(-3, 4, size=(L, L)).astype(float)
    return tr


def test_viterbi_structured_shapes_optimal_and_consistent():
    """All three transition structures hit distinct decode branches
    (scalar top-2, vector-move top-2, general scores tensor); each must be
    score-optimal vs brute force, and the segments decoder (dense short /
    bucketed-padded long) must agree exactly with viterbi_batch."""
    from grobid_clinical_report_spark.kernels.viterbi import (
        viterbi_segments,
        viterbi_single,
    )

    rng = np.random.default_rng(11)
    for trial in range(24):
        L = int(rng.integers(2, 5))
        T = int(rng.integers(1, 6))
        em = rng.integers(-4, 5, size=(T, L)).astype(float)
        tr = _rand_transitions(rng, L, trial % 3)
        got = viterbi_single(em, tr)
        ts = np.arange(T)
        gs = em[ts, got].sum() + sum(tr[got[t - 1], got[t]] for t in range(1, T))
        want = _brute(em, tr)
        ws = em[ts, want].sum() + sum(
            tr[want[t - 1], want[t]] for t in range(1, T)
        )
        assert gs == ws, (trial, got, want)
    for trial in range(12):
        L = int(rng.integers(2, 16))
        lens = rng.choice(
            [0, 1, 3, 7, 40, 64, 65, 90, 150, 300],
            size=int(rng.integers(1, 30)),
        )
        n = int(lens.sum())
        em = rng.integers(-8, 9, size=(n, L)).astype(
            rng.choice([np.float32, np.float64])
        )
        tr = _rand_transitions(rng, L, trial % 3)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
        got = viterbi_segments(em, starts, tr)
        seqs = [
            em[s : s + ln].astype(np.float64) for s, ln in zip(starts, lens)
        ]
        want = (
            np.concatenate(viterbi_batch(seqs, tr))
            if n
            else np.zeros(0, int)
        )
        assert np.array_equal(got, want), (trial, trial % 3)


def test_viterbi_int16_long_segment_no_overflow():
    """ADVICE r6 (medium): int16 emissions must NOT accumulate the DP in
    int16 — dp grows ~9-16/token, wrapping past ~2-3k tokens on a single
    long line (nothing upstream caps tokens-per-line). The decoder now
    accumulates in int32; int16 and float64 decodes must agree at T=5000
    (they diverged at T=5000 while matching at T=300 before the fix)."""
    from grobid_clinical_report_spark.kernels.viterbi import viterbi_segments

    rng = np.random.default_rng(7)
    L = 12
    trans = np.full((L, L), -2, dtype=np.float64)
    np.fill_diagonal(trans, 4)  # sticky shape, like the NER kernel
    for T in (300, 5000):
        em_f = rng.integers(0, 17, size=(T, L)).astype(np.float64)
        starts = np.array([0], dtype=np.int64)
        lab_f = viterbi_segments(em_f, starts, trans)
        lab_i = viterbi_segments(
            em_f.astype(np.int16), starts, trans.astype(np.int16)
        )
        assert np.array_equal(lab_f, lab_i), T
    # mixed segment lengths cross the dense/padded split too
    em2 = rng.integers(-8, 17, size=(6000, L)).astype(np.float64)
    st2 = np.array([0, 40, 4040, 5000], dtype=np.int64)
    assert np.array_equal(
        viterbi_segments(em2, st2, trans),
        viterbi_segments(em2.astype(np.int16), st2, trans.astype(np.int16)),
    )


def test_viterbi_int64_emissions_not_narrowed():
    """_acc_dtype must PROMOTE, not flat-map to int32: int64 emissions with
    values past 2^31 would wrap if the DP were narrowed to int32 — the same
    silent-wrap bug as the int16 finding, one size up. No current caller
    ships int64, but the kernel API accepts it."""
    from grobid_clinical_report_spark.kernels.viterbi import (
        _acc_dtype, viterbi_segments,
    )

    assert _acc_dtype(np.dtype(np.int16)) == np.int32
    assert _acc_dtype(np.dtype(np.int64)) == np.int64
    rng = np.random.default_rng(11)
    L, T = 5, 300
    em = rng.integers(-(2**33), 2**33, size=(T, L)).astype(np.int64)
    trans = rng.integers(-(2**20), 2**20, size=(L, L)).astype(np.int64)
    starts = np.array([0, 120], dtype=np.int64)
    # float64 reference is exact here (values ≪ 2^53)
    assert np.array_equal(
        viterbi_segments(em, starts, trans),
        viterbi_segments(
            em.astype(np.float64), starts, trans.astype(np.float64)
        ),
    )


# --- normalization -----------------------------------------------------------

def test_iso_dates():
    s = pd.Series(
        ["Le 29.04.2000", "01/01/1990", "le 3 mars 2018", "29-04-00", "rien"]
    )
    assert normalize.to_iso_date(s).tolist() == [
        "2000-04-29", "1990-01-01", "2018-03-03", "2000-04-29", "",
    ]


def test_normalize_text_dehyphenize():
    s = pd.Series(["anti-\nbiothérapie  adaptée", "  a   b "])
    assert normalize.normalize_text(s).tolist() == [
        "antibiothérapie adaptée", "a b",
    ]


# --- RLE clustering ----------------------------------------------------------

def test_rle_cluster_ids_label_doc_and_iob_breaks():
    doc = pd.Series(["d1", "d1", "d1", "d2", "d2"])
    lab = pd.Series(["a", "a", "b", "b", "I-b"])
    assert rle_cluster_ids(doc, lab).tolist() == [0, 0, 1, 2, 3]


def test_dedup_notes_keeps_first_and_drops_short():
    spans = pd.DataFrame(
        {
            "doc_id": ["d"] * 4,
            "kind": ["footnote", "footnote", "footnote", "paragraph"],
            "text": ["Confidentiel - Hôpital", "Confidentiel - Hôpital", "ab", "x"],
            "media_ref": [None] * 4,
            "offset": [1, 2, 3, 4],
        }
    )
    out = dedup_notes(spans)
    assert out["kind"].tolist() == ["footnote", "paragraph"]
    assert out["offset"].tolist() == [1, 4]


# --- tokenization ------------------------------------------------------------

def test_explode_tokens_exact_reconstruction():
    lines = pd.DataFrame(
        {
            "doc_id": ["d"],
            "seq": [0],
            "text": ["Pr. Abagael ZOSIMA, 14/03/2017 10h30"],
        }
    )
    t = explode_tokens(lines)
    assert t["tok"].tolist() == [
        "Pr", ".", "Abagael", "ZOSIMA", ",", "14/03/2017", "10h30",
    ]
    # gap+tok reconstruction reproduces the source text
    rebuilt = "".join(
        (g if i else "") + k
        for i, (g, k) in enumerate(zip(t["gap"], t["tok"]))
    )
    assert rebuilt == "Pr. Abagael ZOSIMA, 14/03/2017 10h30"


def test_explode_tokens_nul_in_text():
    """A NUL in dirty PDF text must not collide with the bracketing sentinel:
    adjacent tokens stay separate and following tokens survive (ADVICE r2 —
    'Dr\\x00MARTIN 12/05/2019' used to lose MARTIN and the date)."""
    lines = pd.DataFrame(
        {"doc_id": ["d"], "seq": [0], "text": ["Dr\x00MARTIN 12/05/2019"]}
    )
    t = explode_tokens(lines)
    assert t["tok"].tolist() == ["Dr", "MARTIN", "12/05/2019"]


def test_explode_tokens_offsets_count_junk():
    """tok_start/tok_end are offsets in the ORIGINAL line text: a dropped
    junk token (NUL, @PAGE) still contributes its length and preceding gap
    to the cumsum. The former kept-only cumsum drifted every offset after
    a junk token ('foo \\x00 bar baz' reported bar at 4 instead of 6),
    silently mislabeling corpus_import's offset-contained NER supervision
    on dirty documents."""
    lines = pd.DataFrame(
        {
            "doc_id": ["d", "d"],
            "seq": [0, 1],
            "text": ["foo \x00 bar baz", "a �� bb"],
        }
    )
    t = explode_tokens(lines)
    for _, r in t.iterrows():
        src = lines["text"][lines["seq"] == r["seq"]].iloc[0]
        # NULs are remapped to U+FFFD pre-split (same codepoint count)
        assert src.replace("\x00", "�")[r["tok_start"]:r["tok_end"]] == r["tok"]
    assert t["tok"].tolist() == ["foo", "bar", "baz", "a", "bb"]
    assert t["tok_start"].tolist() == [0, 6, 10, 0, 5]


def test_n_tokens_counts_separator_runs():
    """Column-aligned table lines (multi-space / tab separators) count one
    token per field, not one per space (ADVICE r2)."""
    from grobid_clinical_report_spark.kernels.features import featurize_lines
    from grobid_clinical_report_spark.kernels.tokenize import (
        assign_blocks_pages,
    )

    lines = pd.DataFrame(
        {
            "doc_id": ["d"] * 3,
            "seq": range(3),
            "kind": ["text"] * 3,
            "text": ["Na  140", "K\t4.1\tmmol", "one two"],
        }
    )
    out = featurize_lines(assign_blocks_pages(lines))
    assert out["n_tokens"].tolist() == [2, 3, 2]


def test_count_sep_runs_matches_regex_count():
    """The numpy byte-buffer run counter is byte-exact vs the RE2
    `[ \\t]+` count it replaced (r8 optimization), including multibyte
    UTF-8, NULs, slices, and null-bearing fallback inputs."""
    import random

    import pyarrow as pa
    import pyarrow.compute as pc

    from grobid_clinical_report_spark.kernels import arrowtext as at

    cases = [
        "", " ", "  ", "\t", " \t ", "a", "a b", "a  b", "a\tb",
        "a \t b", "  a", "a  ", "é è ü", "mot\tmot mot", "\n \n",
        " a b ", "αβ γ\tδ", "🎉 🎊", "a\x00b c", "x" * 300 + " y",
    ]
    rng = random.Random(7)
    alphabet = " \ta béà \n🎉:.-0123456789"
    cases += [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))
        for _ in range(500)
    ]
    arr = pa.array(cases, type=pa.string())
    want = pc.count_substring_regex(arr, "[ \t]+").to_numpy(
        zero_copy_only=False
    )
    assert (at.count_sep_runs(arr) == want).all()
    sl = arr.slice(3, 200)  # non-zero offset view
    want_sl = pc.count_substring_regex(sl, "[ \t]+").to_numpy(
        zero_copy_only=False
    )
    assert (at.count_sep_runs(sl) == want_sl).all()
    withnull = pa.array(["a b", None, " \t"], type=pa.string())
    assert at.count_sep_runs(withnull).tolist() == [1, 0, 1]
    assert at.count_sep_runs(pa.array([], type=pa.string())).tolist() == []


def test_contiguous_pieces():
    off = np.array([0, 5, 11, 40, 46])
    assert contiguous_pieces(off, max_gap=10).tolist() == [0, 0, 0, 1, 1]


def test_blocks_pages():
    lines = pd.DataFrame(
        {
            "doc_id": ["d"] * 6,
            "seq": range(6),
            "kind": ["text"] * 6,
            "text": ["a", "", "b", "c", "\f", "e"],
            "media_ref": [None] * 6,
            "offset": range(6),
        }
    )
    out = assign_blocks_pages(lines)
    assert out["block_id"].tolist() == [0, 0, 1, 1, 1, 2]
    assert out["page_id"].tolist() == [0, 0, 0, 0, 0, 1]
    assert out["is_blank"].tolist() == [False, True, False, False, False, False]
    assert out["is_page_break"].tolist()[4]


# --- property tests (hypothesis) ----------------------------------------------

hyp = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402


@given(
    st.lists(
        st.tuples(st.integers(1, 8), st.integers(2, 5)), min_size=1, max_size=6
    )
)
@settings(max_examples=25, deadline=None)
def test_viterbi_path_is_valid_shape(shapes):
    rng = np.random.default_rng(0)
    n_lab = shapes[0][1]
    ems = [rng.normal(size=(t, n_lab)) for t, _ in shapes]
    out = viterbi_batch(ems, np.zeros((n_lab, n_lab)))
    for e, g in zip(ems, out):
        assert g.shape == (e.shape[0],)
        assert ((g >= 0) & (g < n_lab)).all()
        # with zero transitions the decode is the pointwise argmax
        assert np.array_equal(g, e.argmax(axis=1))


def test_segmenter_new_zones(fixture_docs_pdf):
    """titlePage / rightnote / marginnote (MedicalLabels.java:15-25): the
    cover page of fx-cover-0011 is titlePage (header moves to page 2);
    recipient blocks and NB-annotations get their margin zones."""
    import pandas as pd

    from grobid_clinical_report_spark.kernels.segmenter import segment_lines
    from grobid_clinical_report_spark.pipeline import _prep_for_test

    cover = fixture_docs_pdf[
        fixture_docs_pdf.doc_id == "fx-cover-0011"
    ].reset_index(drop=True)
    lines = _prep_for_test(cover, profile="all")
    lines["zone"] = segment_lines(lines)
    by_text = dict(zip(lines["text"], lines["zone"]))
    assert by_text["COMPTE RENDU D'HOSPITALISATION"] == "titlePage"
    assert by_text["Hôpital de Créteil"] == "titlePage"
    assert by_text["N° 2021-000123"] == "header"
    assert by_text["Dr Luc MOREAU"] == "header"
    assert by_text["SYNTHÈSE MÉDICALE"] == "body"

    margins = pd.DataFrame(
        [
            {
                "doc_id": "m1",
                "spans": [
                    {"kind": "text", "text": t, "media_ref": None, "offset": i}
                    for i, t in enumerate(
                        [
                            "COMPTE RENDU OPÉRATOIRE",
                            "Le 29.04.2000",
                            "",
                            "Destinataire : Dr Jean KOVAC",
                            "Service de Radiologie",
                            "",
                            "OBSERVATIONS :",
                            "Les constantes du patient restent normales ce jour.",
                            "NB : résultat à confirmer au prochain contrôle.",
                        ]
                    )
                ],
            }
        ]
    )
    lines = _prep_for_test(margins, profile="all")
    lines["zone"] = segment_lines(lines)
    by_text = dict(zip(lines["text"], lines["zone"]))
    assert by_text["Destinataire : Dr Jean KOVAC"] == "rightnote"
    assert by_text["Service de Radiologie"] == "rightnote"
    assert by_text["OBSERVATIONS :"] == "body"
    assert by_text["NB : résultat à confirmer au prochain contrôle."] == "marginnote"


def test_ner_keyword_window_stays_on_its_line():
    """Fax/Tel keyword windows are line-local: a keyword ending one line
    must not label digits at the start of the NEXT line, and the window
    expires past 8 tokens."""
    import pandas as pd

    from grobid_clinical_report_spark import pipeline as pl

    from grobid_clinical_report_spark import datagen

    lines = [
        ("text", "Envoyez le document par Fax", None),
        ("text", "01 45 17 80 01 est le code du dossier", None),
        ("text", "Fax du service : joindre un deuxieme exemplaire du "
                 "document avant 01 45 17 80 02", None),
    ]
    pdf = pd.DataFrame(
        [{"doc_id": "kw", "spans": datagen._with_offsets(lines)}]
    )
    out = pl._run_pdf(pdf, "ner")
    kinds = [(s["kind"], s["text"]) for s in out["spans"].iloc[0]]
    assert ("fax", "01 45 17 80 01") not in kinds  # next line: no window
    # >8 tokens after the keyword: window expired, digits unlabeled
    assert not any(k == "fax" for k, _ in kinds)


def test_coalesced_batches_merge_and_cap():
    """_coalesced merges small scan batches up to the doc target, caps on
    span volume (whale protection), drops empties, and passes a single
    batch through without copying — and the merged stream carries exactly
    the input rows in order."""
    import pyarrow as pa

    from grobid_clinical_report_spark import pipeline as pl

    span_t = pa.list_(
        pa.struct(
            [
                pa.field("kind", pa.string()),
                pa.field("text", pa.string()),
                pa.field("media_ref", pa.string()),
                pa.field("offset", pa.int32()),
            ]
        )
    )

    def mk(n_docs, spans_per_doc, tag):
        ids = [f"{tag}-{i:04d}" for i in range(n_docs)]
        spans = [
            [
                {"kind": "text", "text": f"l{j}", "media_ref": None,
                 "offset": j}
                for j in range(spans_per_doc)
            ]
            for _ in range(n_docs)
        ]
        return pa.RecordBatch.from_arrays(
            [pa.array(ids), pa.array(spans, type=span_t)],
            names=["doc_id", "spans"],
        )

    # 6 × 256-doc batches → one 1024-doc batch + one 512-doc tail
    batches = [mk(256, 3, f"b{k}") for k in range(6)]
    out = list(pl._coalesced(iter(batches)))
    assert [b.num_rows for b in out] == [1024, 512]
    got = [i for b in out for i in b.column("doc_id").to_pylist()]
    want = [i for b in batches for i in b.column("doc_id").to_pylist()]
    assert got == want  # order preserved exactly

    # span cap: a whale-heavy batch flushes early even far below the doc cap
    whale = mk(2, pl._COALESCE_SPANS, "w")  # 2 docs, cap-sized span volume
    out = list(pl._coalesced(iter([mk(10, 3, "a"), whale, mk(10, 3, "z")])))
    assert [b.num_rows for b in out] == [12, 10]

    # empties dropped; single batch passes through as the same object
    single = mk(7, 2, "s")
    out = list(pl._coalesced(iter([mk(0, 0, "e"), single])))
    assert len(out) == 1 and out[0] is single


def test_viterbi_general_tiling_exact(monkeypatch):
    """The general-transition row tiling (serving-scale trained matrices:
    the (B, L, L) scores buffer is kept cache-resident) must be
    bit-identical to the unsplit decode — rows are independent — across
    both the dense and the padded-bucket paths, including argmax
    tie-breaks (low-entropy integer scores force ties), and int32/int64
    emissions must agree."""
    from grobid_clinical_report_spark.kernels import viterbi as V

    rng = np.random.default_rng(23)
    for trial in range(6):
        L = int(rng.integers(3, 9))
        # mixed lengths: ≤64 exercises dense blocks, >64 padded buckets
        lens = rng.choice([1, 2, 5, 17, 17, 17, 70, 90], size=700)
        n = int(lens.sum())
        em64 = rng.integers(-3, 4, size=(n, L)).astype(np.int64)
        tr = rng.integers(-2, 3, size=(L, L)).astype(np.int64)
        # make sure the matrix is NOT column-structured (general branch)
        tr[0, 1] += 5
        tr[1, 1] -= 5
        assert V._col_move(tr)[0] is None
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
        whole = V.viterbi_segments(em64, starts, tr)
        monkeypatch.setattr(V, "_GENERAL_TILE_BYTES", 1)  # tile every row
        tiled64 = V.viterbi_segments(em64, starts, tr)
        tiled32 = V.viterbi_segments(em64.astype(np.int32), starts, tr)
        monkeypatch.undo()
        np.testing.assert_array_equal(tiled64, whole)
        np.testing.assert_array_equal(tiled32, whole)


def test_byte_kernels_match_re2():
    """The r8 numpy byte-buffer kernels are byte-exact vs the pc/RE2
    kernels they replace, over randomized inputs covering multibyte UTF-8
    (Latin-1 C3 pairs, Œ/œ at lead 0xC5, µ at 0xC2, ’ at 0xE2, emoji),
    NULs, empties, whitespace variants (incl. \\v, which RE2's \\s does
    NOT match), slices, and null-bearing fallback inputs."""
    import random

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from grobid_clinical_report_spark.kernels import arrowtext as at

    cases = [
        "", " ", "  \t\n x ", "\v", "a\vb", "A B", "àÉç", "Œuf", "cœur",
        "HÉMATO", "ß", "µmol", "N° 12-34", "a'b'c'd", "l’hôpital",
        "x" * 300, "1.2.34", "  multi   runs\t\t\nhere ", "\x00nul",
        "à ö ÷ ×", "ÿStart", "øk", "…", "№", "ＡＢ", "Ñoño",
    ]
    rng = random.Random(13)
    alphabet = " \t\n\v\f\rabzAZÉé'’àöø ÿŒœßµ0159#.:-\x00…x"
    cases += [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 60)))
        for _ in range(800)
    ]
    arr = pa.array(cases, type=pa.string())
    variants = [arr, arr.slice(5, 700)]
    for a in variants:
        assert pc.replace_substring_regex(a, r"[\s ]+", " ").equals(
            at.collapse_ws_runs(a)
        )
        assert pc.replace_substring_regex(a, r"\d+", "#").equals(
            at.mask_digit_runs(a)
        )
        np.testing.assert_array_equal(
            at.any_digit(a), at.contains(a, r"\d")
        )
        nl_want = pc.match_substring(a, "\n").to_numpy(zero_copy_only=False)
        np.testing.assert_array_equal(at.contains_byte(a, 0x0A), nl_want)
        np.testing.assert_array_equal(
            at.starts_upper_letter(a), at.match(a, r"[A-ZÀ-ÖØ]")
        )
        np.testing.assert_array_equal(
            at.starts_lower_letter(a), at.match(a, r"[a-zà-öø-ÿ]")
        )
        np.testing.assert_array_equal(
            at.no_lowercase(a),
            pc.equal(pc.utf8_upper(a), a).to_numpy(zero_copy_only=False),
        )
    # null-bearing inputs take the pc fallback and stay equivalent
    wn = pa.array(["A b", None, "12", "ŒUF"], type=pa.string())
    assert at.mask_digit_runs(wn).to_pylist() == ["A b", None, "#", "ŒUF"]
    assert at.collapse_ws_runs(wn).to_pylist() == ["A b", None, "12", "ŒUF"]
    empty = pa.array([], type=pa.string())
    assert at.collapse_ws_runs(empty).to_pylist() == []
    assert at.any_digit(empty).tolist() == []


def test_np_parts_matches_re2():
    """The numpy TOKEN_RE tokenization kernel (digit-free fast path of
    explode_tokens) produces part lists identical to RE2
    bracket-then-split, over apostrophe-chain torture cases, multibyte
    codepoints (Latin-1, Œ/œ, NBSP, emoji), \\v (a token — RE2 \\s does
    not match it), and sliced arrays."""
    import random

    import pyarrow as pa
    import pyarrow.compute as pc

    from grobid_clinical_report_spark.kernels import tokenize as tk

    def re2_mark(a):
        return pc.replace_substring_regex(
            a, f"({tk.TOKEN_RE})", "\x00\\1\x00"
        )

    cases = [
        "", " ", "mot mot", "l'hôpital", "l’hôpital", "a'b'c'd", "'a'b",
        "fin'", "’seul", "cœur", "Œuf", "…", "a\vb", "mot-clé",
        "M. DUPONT", "eà'é’o", "'''", "’’’", "a'’b", "a’'b", "x" * 300,
        " •🎉 ", "d’emblée l’état",
    ]
    rng = random.Random(41)
    for alphabet in ("a'’b", " a'’ é🎉•øß… b", "ab AZé'’.:-()« "):
        cases += [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 80)))
            for _ in range(1200)
        ]
    arr = pa.array(cases, type=pa.string())

    def re2_parts(a):
        return pc.split_pattern(re2_mark(a), "\x00")

    assert re2_parts(arr).equals(tk._np_parts(arr))
    sl = arr.slice(7, 2000)
    assert re2_parts(sl).equals(tk._np_parts(sl))
    allempty = pa.array(["", "", ""], type=pa.string())
    assert re2_parts(allempty).equals(tk._np_parts(allempty))
    # the hybrid split inside explode_tokens: mixed digit / digit-free
    # lines produce identical token frames vs the pure-RE2 bracketing
    import pandas as pd

    mixed = pd.DataFrame(
        {
            "doc_id": [0] * 6,
            "seq": range(6),
            "text": [
                "le 29.04.2000 à 10h30", "l'état stable", "",
                "dose 2,5 mg/j", "d’emblée…", "12/05/99 13:00",
            ],
        }
    )
    got = tk.explode_tokens(mixed)
    want_toks = [
        "le", "29.04.2000", "à", "10h30", "l'état", "stable",
        "dose", "2,5", "mg", "/", "j", "d’emblée", "…",
        "12/05/99", "13:00",
    ]
    assert got["tok"].tolist() == want_toks
