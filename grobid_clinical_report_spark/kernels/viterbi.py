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


def _decode_padded(
    seqs: list[np.ndarray], max_t: int, transitions: np.ndarray
) -> np.ndarray:
    """Pad to (B, max_t, L), run batched Viterbi, return (B, max_t) labels."""
    b = len(seqs)
    n_lab = transitions.shape[0]
    neg = -1e30
    emis = np.full((b, max_t, n_lab), neg, dtype=np.float64)
    mask = np.zeros((b, max_t), dtype=bool)
    for i, e in enumerate(seqs):
        t = e.shape[0]
        emis[i, :t] = e
        mask[i, :t] = True

    # forward max-product
    dp = emis[:, 0, :].copy()  # (B, L)
    back = np.zeros((b, max_t, n_lab), dtype=np.int32)
    trans = transitions[None, :, :]  # (1, L, L) prev → next
    for t in range(1, max_t):
        scores = dp[:, :, None] + trans  # (B, prev, next)
        best_prev = scores.argmax(axis=1)  # (B, L)
        best_score = np.take_along_axis(scores, best_prev[:, None, :], axis=1)[
            :, 0, :
        ]
        ndp = best_score + emis[:, t, :]
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
