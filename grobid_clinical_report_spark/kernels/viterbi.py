"""Batched linear-chain Viterbi decoder (SURVEY.md §2.4 L1).

The reference runs Wapiti CRF Viterbi decoding through JNI once per model per
zone (`AbstractParser.label`, call sites MedicalReportSegmenterParser.java:144,
HeaderMedicalParser.java:111, FullMedicalTextParser.java:139, MedicParser.java:96).
Its binary models are unavailable (private training data — README.md:143), so
sequence labeling is rebuilt as deterministic feature-driven emissions plus a
real linear-chain Viterbi decode in numpy, with transition/emission weights fit
offline against the fixture corpus (SURVEY.md §7.0).

Vectorization contract ("never per-row Python", BASELINE.json north_star):
sequences from a whole Arrow batch of documents are padded into one
(n_seqs, max_len, n_labels) tensor; the only Python loop is over *time steps*
(bounded by the longest sequence in a length-bucket, not by row count). Docs
are bucketed by length so one pathological 50k-line document doesn't force
50k iterations on the ~120-line median docs (skew guardrails cap length
upstream — MedicalReportSegmenterParser.java:250-253 analogue).
"""

from __future__ import annotations

import numpy as np

_LEN_BUCKETS = (16, 64, 256, 1024, 4096, 16384, 65536, 1 << 30)

# viterbi_segments: lengths up to this decode dense (zero padding); longer
# segments decode in padded geometric buckets (see the docstring's cost
# model — the crossover is where per-length numpy call overhead on small
# (B, L) blocks outgrows the ≤2× padded-work bound of factor-2 buckets)
_DENSE_MAX_T = 64


def _acc_dtype(em_dtype: np.dtype) -> np.dtype:
    """DP accumulator dtype for a given emission dtype.

    Integer emissions (the NER kernel ships int16 doubled-weight scores for
    memory bandwidth) must NOT accumulate in int16: dp grows ~9-16 per token,
    so a single segment beyond ~2000-3600 tokens silently wraps int16 and
    decodes wrong labels. The DP runs in AT LEAST int32 — emission GATHERS
    stay int16 (that is where the bandwidth win lives; the (B, L) dp tensor
    is tiny), and int32 holds ~10^8 tokens of worst-case real emissions
    (2^31 / 16), far past any guardrail-passing document. promote_types
    (not a flat int32) so hypothetical int64 emissions keep their width
    instead of being narrowed into the same wrap bug one size up."""
    if np.issubdtype(em_dtype, np.integer):
        return np.promote_types(em_dtype, np.int32)
    return np.dtype(em_dtype)


def viterbi_single(emissions: np.ndarray, transitions: np.ndarray) -> np.ndarray:
    """Decode one sequence: emissions (T, L), transitions (L, L) → labels (T,)."""
    return viterbi_batch([emissions], transitions)[0]


def viterbi_batch(
    emission_list: list[np.ndarray], transitions: np.ndarray
) -> list[np.ndarray]:
    """Decode many sequences with shared transitions.

    emission_list: per-sequence (T_i, L) float arrays.
    Returns per-sequence int label-index arrays (argmax path).
    """
    n = len(emission_list)
    if n == 0:
        return []
    lengths = np.array([e.shape[0] for e in emission_list], dtype=np.int64)
    out: list[np.ndarray | None] = [None] * n

    # group into length buckets so padding waste stays bounded
    buckets = np.searchsorted(np.array(_LEN_BUCKETS), lengths, side="left")
    for b in np.unique(buckets):
        idx = np.where((buckets == b) & (lengths > 0))[0]
        if idx.size == 0:
            continue
        max_t = int(lengths[idx].max())
        labs = _decode_padded([emission_list[i] for i in idx], max_t, transitions)
        for j, i in enumerate(idx):
            out[i] = labs[j][: lengths[i]]
    for i in range(n):
        if out[i] is None:  # zero-length sequences
            out[i] = np.zeros(0, dtype=np.int64)
    return out  # type: ignore[return-value]


def viterbi_segments(
    em: np.ndarray, starts: np.ndarray, transitions: np.ndarray
) -> np.ndarray:
    """Decode contiguous segments of ONE emission matrix.

    em: (N, L) — all tokens' emissions, segments contiguous; starts: segment
    start offsets (seg_starts form). Returns flat (N,) label indices aligned
    with em rows.

    Hybrid decode, picked per length, not per call (both regions of one
    sorted gather):

    - lengths ≤ _DENSE_MAX_T run DENSE: equal-length runs reshape into
      (B, T, L) blocks — zero padding, no mask. This is the token-model
      shape (millions of short per-line sequences, few distinct lengths);
      switching NER to it measured 14.5s → ~5s at local[32].
    - longer lengths run PADDED in greedy geometric buckets (factor-2
      growth, so padded work ≤ 2× the live work — see the cap comment
      below): the line-model shape (tens of thousands of ~50-400
      line documents, hundreds of DISTINCT lengths) would otherwise decode
      as thousands of tiny per-length numpy steps where call overhead
      dominates — measured 5.9s → 9.2s on the extraction cascade when
      everything ran dense. Buckets are built by one vectorized scatter
      (no per-sequence Python fill, unlike viterbi_batch).
    """
    n, n_lab = em.shape
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    # adopt the caller's emission dtype end-to-end: a mixed f32-emissions /
    # f64-transitions DP silently promotes every step (measured 1.47s →
    # 2.02s on the corpus-NER segment set)
    transitions = np.asarray(transitions, dtype=em.dtype)
    starts = np.asarray(starts, dtype=np.int64)
    lengths = np.diff(np.append(starts, n))
    order = np.argsort(lengths, kind="stable")
    s_starts = starts[order]
    s_lens = lengths[order]
    # gather index: rows of each sorted segment, concatenated
    ends = np.cumsum(s_lens)
    seg_of_row = np.repeat(np.arange(len(s_lens)), s_lens)
    intra = np.arange(n) - np.repeat(ends - s_lens, s_lens)
    gather = s_starts[seg_of_row] + intra
    em2 = em[gather]

    out_sorted = np.empty(n, dtype=np.int64)
    pos = 0
    seg0 = 0
    uniq, counts = np.unique(s_lens, return_counts=True)
    j = 0
    while j < len(uniq):
        t_len, k = int(uniq[j]), int(counts[j])
        if t_len == 0:
            seg0 += k  # zero-length segments sort first and emit no rows
            j += 1
            continue
        if t_len <= _DENSE_MAX_T:
            width = t_len * k
            block = em2[pos : pos + width].reshape(k, t_len, n_lab)
            out_sorted[pos : pos + width] = _decode_dense(
                block, transitions
            ).ravel()
            pos += width
            seg0 += k
            j += 1
            continue
        # greedy geometric bucket: extend while padding waste stays ≤ 2×.
        # At line-model widths (B ≈ 50-150 docs, L ≈ 12, f32) a DP step's
        # numpy call overhead dominates its B×L arithmetic, so fewer,
        # taller buckets win: factor-2 growth (~5-10 buckets per batch)
        # measured ~15-20% faster than a 1.25 cap in both A/B run orders,
        # while still bounding worst-case padded work at 2× (one bucket
        # per batch would let a single long document pad everything).
        cap = 2 * t_len
        j2 = j
        while j2 + 1 < len(uniq) and uniq[j2 + 1] <= cap:
            j2 += 1
        k = int(counts[j : j2 + 1].sum())
        t_max = int(uniq[j2])
        width = int((uniq[j : j2 + 1] * counts[j : j2 + 1]).sum())
        rows = slice(pos, pos + width)
        local_seg = seg_of_row[rows] - seg0
        intra_b = intra[rows]
        pad = np.full((k, t_max, n_lab), _neg_sentinel(em.dtype), em.dtype)
        pad[local_seg, intra_b] = em2[rows]
        live = np.zeros((k, t_max), dtype=bool)
        live[local_seg, intra_b] = True
        labs = _dp_padded(pad, live, transitions)
        out_sorted[rows] = labs[local_seg, intra_b]
        pos += width
        seg0 += k
        j = j2 + 1
    out = np.empty(n, dtype=np.int64)
    out[gather] = out_sorted
    return out


def _neg_sentinel(dtype: np.dtype):
    """A 'minus infinity' that survives a few additions without wrapping:
    integer emissions (the NER kernel ships doubled-weight int16 scores —
    half the memory traffic of f32 on a bandwidth-bound box) have no inf."""
    if np.issubdtype(dtype, np.integer):
        return np.iinfo(dtype).min >> 1
    return -np.inf


def _col_move(transitions: np.ndarray):
    """(move, scalar) for column-structured transitions, else (None, False).

    Column-structured: trans[p, c] == move[c] for every p != c — the max
    over predecessors then decomposes to max(top-other + move[c],
    dp[c] + diag[c]), O(L) per step instead of the O(L²) scores tensor.
    The sticky_transitions matrices are the constant-vector special case
    (`scalar` True keeps their best-other candidate at (B, 1) instead of
    materializing (B, L) — the NER hot loop); body_transitions is the
    genuine vector case (each label has its own entry cost)."""
    n_lab = transitions.shape[0]
    if n_lab < 2:
        return None, False
    probe = transitions.copy()
    idx = np.arange(n_lab)
    # overwrite the diagonal with another off-diagonal value from the same
    # column, then column-structure ⇔ every column is constant
    probe[idx, idx] = transitions[(idx + 1) % n_lab, idx]
    if not np.array_equiv(probe, probe[0:1, :]):
        return None, False
    move = probe[0].copy()
    return move, bool(np.all(move == move[0]))


# Row-tile budget for the general O(L²) step's (B, L, L) scores buffer.
# At serving scale (trained general transition matrices over a corpus) a
# full-batch buffer runs to hundreds of MB and every step streams it
# through memory three times (fill, argmax, gather); tiling rows so the
# buffer sits in cache turned a 32.7s sf0.1 trained-NER decode into the
# numbers in BENCH/TRAINER.md. Structured matrices never tile — their
# step materializes no (B, L, L) tensor to begin with.
_GENERAL_TILE_BYTES = 4 << 20


def _general_rows(n_lab: int, itemsize: int) -> int:
    return max(256, _GENERAL_TILE_BYTES // (n_lab * n_lab * itemsize))


def _step_structured(dp, mv, scalar, diag, col, rows, neg):
    """One structured Viterbi step: (best_score, best_prev) before emission
    add / masking. Tie resolution replicates np.argmax's first-index rule.

    Materializes no (B, L) candidate tensors beyond the score update
    itself: the best/second-best predecessors are the top-2 of dp, every
    column's off-diagonal candidate is (m1, i1), and only the single i1
    column per row needs the (m2, i2) fallback — one fancy-index fix-up
    instead of three full `where` passes."""
    i1 = dp.argmax(axis=1)
    m1 = dp[rows, i1].copy()
    # top-2 via poke/restore: overwrite the winners in place, argmax again,
    # put the winners back — two (B,)-sized writes instead of a full (B, L)
    # copy per step (the copy dominated the step at line-model shapes,
    # B ≈ 50-150 · L = 12, where per-op overhead ≫ arithmetic)
    dp[rows, i1] = neg
    i2 = dp.argmax(axis=1).astype(np.int32)
    m2 = dp[rows, i2]
    dp[rows, i1] = m1
    self_val = dp + diag
    if scalar:
        m1b = (m1 + mv[0])[:, None]
        m2c = m2 + mv[0]
    else:
        m1b = m1[:, None] + mv[None, :]
        m2c = m2 + mv[i1]
    i1c = i1[:, None].astype(np.int32)
    take_self = (self_val > m1b) | ((self_val == m1b) & (col < i1c))
    best_prev = np.where(take_self, col, i1c)
    best = np.maximum(self_val, m1b)
    # per-row fix of the i1 column, where the off-diagonal candidate is
    # the runner-up (m2, i2) instead of (m1, i1)
    sv1 = self_val[rows, i1]
    ts1 = (sv1 > m2c) | ((sv1 == m2c) & (i1 < i2))
    best_prev[rows, i1] = np.where(ts1, i1.astype(np.int32), i2)
    best[rows, i1] = np.maximum(sv1, m2c)
    return best, best_prev


def _decode_dense(emis: np.ndarray, transitions: np.ndarray) -> np.ndarray:
    """Batched Viterbi over a dense (B, T, L) tensor — no padding/mask.
    Shares the structured (sticky-transition) O(L) fast path with
    _decode_padded; tie resolution is argmax-first-index in both.

    The structured step is _step_structured (top-2 of dp + one fix-up
    column); column-structured matrices (body model: per-label entry
    costs) take it too, with a vector move."""
    b, max_t, n_lab = emis.shape
    # general-transition blocks decode in row tiles (rows are independent;
    # bit-identical to the unsplit decode) so the per-step scores buffer
    # stays cache-resident — see _GENERAL_TILE_BYTES
    if _col_move(transitions)[0] is None:
        tile = _general_rows(n_lab, emis.dtype.itemsize)
        if b > tile:
            out = np.empty((b, max_t), dtype=np.int64)
            for lo in range(0, b, tile):
                out[lo : lo + tile] = _decode_dense(
                    emis[lo : lo + tile], transitions
                )
            return out
    # Integer emissions: dp may keep the narrow int16 dtype ONLY when a
    # per-block bound proves it cannot wrap — |dp| ≤ max_t · (max|em| +
    # max|trans|), checked against the sentinel headroom (2^14). The dense
    # path handles ≤64-step blocks (the NER corpus shape), so the check
    # almost always passes and the int16 dp bandwidth win is kept; blocks
    # that could overflow accumulate in int32 (_acc_dtype). The bound
    # costs two allocation-free reduction passes over a block about to be
    # read max_t times.
    acc = emis.dtype
    if np.issubdtype(emis.dtype, np.integer):
        step = max(int(emis.max()), -int(emis.min()), 0) + max(
            int(np.max(transitions)), -int(np.min(transitions)), 0
        )
        safe16 = emis.dtype == np.int16 and max_t * step < (1 << 14) - 64
        acc = emis.dtype if safe16 else _acc_dtype(emis.dtype)
    dp = emis[:, 0, :].astype(acc, copy=True)
    # int8 backpointers when labels fit (all current models: L ≤ 27):
    # back is the largest tensor the DP touches ((B, T, L), written every
    # step, read back once) — quartering its bytes matters on a
    # bandwidth-bound box. Values are label indices < 128; identical.
    back = np.empty(
        (b, max_t, n_lab), dtype=np.int8 if n_lab <= 127 else np.int32
    )
    neg = _neg_sentinel(dp.dtype)

    mv, scalar = _col_move(transitions)
    if mv is not None:
        diag = np.diag(transitions)[None, :]
        col = np.arange(n_lab, dtype=np.int32)[None, :]
        rows = np.arange(b)
        for t in range(1, max_t):
            best, bt = _step_structured(dp, mv, scalar, diag, col, rows, neg)
            back[:, t, :] = bt
            dp = best + emis[:, t, :]
    else:
        # general O(L²) step: preallocated scores buffer + direct fancy
        # gather (np.take_along_axis builds its index tuple in Python per
        # call — profiled at ~0.8s over a 54k-step cascade decode).
        # (B, dest, prev) layout: argmax runs over the CONTIGUOUS last
        # axis — ~25% faster than the strided middle-axis argmax, with an
        # identical first-predecessor tie-break (randomized-tie pytest)
        trans_t = np.ascontiguousarray(transitions.T)[None, :, :]
        scores = np.empty((b, n_lab, n_lab), dtype=dp.dtype)
        rows_ix = np.arange(b)[:, None]
        cols_ix = np.arange(n_lab)[None, :]
        for t in range(1, max_t):
            np.add(dp[:, None, :], trans_t, out=scores)
            best_prev = scores.argmax(axis=2)
            dp = scores[rows_ix, cols_ix, best_prev] + emis[:, t, :]
            back[:, t, :] = best_prev

    labels = np.empty((b, max_t), dtype=np.int64)
    cur = dp.argmax(axis=1)
    labels[:, max_t - 1] = cur
    rows = np.arange(b)
    for t in range(max_t - 1, 0, -1):
        cur = back[rows, t, cur]
        labels[:, t - 1] = cur
    return labels


def _decode_padded(
    seqs: list[np.ndarray], max_t: int, transitions: np.ndarray
) -> np.ndarray:
    """Pad to (B, max_t, L), run batched Viterbi, return (B, max_t) labels."""
    b = len(seqs)
    n_lab = transitions.shape[0]
    neg = -1e30
    # np.empty + per-row fill: each cell written once (np.full pre-fills
    # the whole (B, T, L) tensor and the real rows overwrite it; measured
    # ~1% of single-thread kernel wall — small, but strictly fewer writes)
    emis = np.empty((b, max_t, n_lab), dtype=np.float64)
    mask = np.zeros((b, max_t), dtype=bool)
    for i, e in enumerate(seqs):
        t = e.shape[0]
        emis[i, :t] = e
        emis[i, t:] = neg
        mask[i, :t] = True
    return _dp_padded(emis, mask, transitions)


def _dp_padded(
    emis: np.ndarray, mask: np.ndarray, transitions: np.ndarray
) -> np.ndarray:
    """Batched masked Viterbi over a prebuilt (B, max_t, L) tensor; padding
    lanes (mask False) neither move dp nor write backpointers. Returns
    (B, max_t) labels (padding positions hold arbitrary values — callers
    gather only live cells)."""
    b, max_t, n_lab = emis.shape
    # transitions + dp in the accumulator dtype (== emis dtype for floats;
    # int32 for integer emissions, whose int16 dp would wrap on long
    # segments). Emission gathers keep the caller's dtype.
    acc = _acc_dtype(emis.dtype)
    transitions = np.asarray(transitions, dtype=acc)

    # general-transition row tiling, as in _decode_dense (exact: rows are
    # independent; per-tile min_len only ever masks MORE conservatively)
    if _col_move(transitions)[0] is None:
        tile = _general_rows(emis.shape[2], np.dtype(acc).itemsize)
        if b > tile:
            out = np.empty((b, max_t), dtype=np.int64)
            for lo in range(0, b, tile):
                out[lo : lo + tile] = _dp_padded(
                    emis[lo : lo + tile], mask[lo : lo + tile], transitions
                )
            return out

    # forward max-product
    dp = emis[:, 0, :].astype(acc, copy=True)  # (B, L)
    # int8 backpointers when labels fit — see _decode_dense
    back = np.zeros(
        (b, max_t, n_lab), dtype=np.int8 if n_lab <= 127 else np.int32
    )

    # structured fast path (_step_structured): constant-move (sticky) and
    # column-structured (body model) matrices decompose the prev→next max
    # to O(L) per step — the token-models-at-corpus-scale hot loop.
    # steps below the shortest live length need no masking at all — every
    # lane is alive, so dp/backpointer writes are unconditional. Factor-2
    # buckets guarantee min_len ≥ max_t/2, so this skips the two
    # np.where passes for at least half of all steps (and for ALL steps
    # of equal-length buckets, e.g. the whale documents).
    min_len = int(mask.sum(axis=1).min()) if b else max_t

    mv, scalar = _col_move(transitions)
    if mv is not None:
        diag = np.diag(transitions)[None, :]  # (1, L)
        col = np.arange(n_lab, dtype=np.int32)[None, :]
        rows = np.arange(b)
        neg = _neg_sentinel(transitions.dtype)
        for t in range(1, max_t):
            best_score, best_prev = _step_structured(
                dp, mv, scalar, diag, col, rows, neg
            )
            if t < min_len:
                dp = best_score + emis[:, t, :]
                back[:, t, :] = best_prev
                continue
            ndp = best_score + emis[:, t, :]
            alive = mask[:, t]
            dp = np.where(alive[:, None], ndp, dp)
            back[:, t, :] = np.where(alive[:, None], best_prev, 0)
    else:
        # general O(L²) step (segmenter: zone-order constraints make a few
        # columns non-constant): preallocated scores buffer + direct fancy
        # gather instead of np.take_along_axis's per-call Python indexing.
        # (B, dest, prev) layout — contiguous-last-axis argmax, identical
        # first-predecessor tie-break (see _decode_dense)
        trans_t = np.ascontiguousarray(transitions.T)[None, :, :]
        scores = np.empty((b, n_lab, n_lab), dtype=dp.dtype)
        rows_ix = np.arange(b)[:, None]
        cols_ix = np.arange(n_lab)[None, :]
        for t in range(1, max_t):
            np.add(dp[:, None, :], trans_t, out=scores)
            best_prev = scores.argmax(axis=2)  # (B, L)
            ndp = scores[rows_ix, cols_ix, best_prev] + emis[:, t, :]
            if t < min_len:
                dp = ndp
                back[:, t, :] = best_prev
                continue
            alive = mask[:, t]
            dp = np.where(alive[:, None], ndp, dp)
            back[:, t, :] = np.where(alive[:, None], best_prev, 0)

    # backtrace (batched across sequences; loop is over time steps only)
    labels = np.zeros((b, max_t), dtype=np.int64)
    last_t = mask.sum(axis=1) - 1  # (B,)
    t_idx = np.arange(b)
    cur_lab = dp.argmax(axis=1)
    labels[t_idx, last_t] = cur_lab
    for t in range(max_t - 1, 0, -1):
        active = last_t >= t
        prev_lab = back[t_idx, t, cur_lab]
        new_lab = np.where(active, prev_lab, cur_lab)
        labels[t_idx, t - 1] = np.where(active, new_lab, labels[t_idx, t - 1])
        cur_lab = new_lab
    return labels
