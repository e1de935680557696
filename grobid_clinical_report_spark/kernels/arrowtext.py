"""Arrow-compute string kernels — the vectorized fast path for featurization.

pandas object-dtype `.str` ops dispatch a Python `re.search` per row; Arrow's
compute kernels (RE2, C++) are ~7× faster and allocation-light, which is what
keeps the extraction cascade memory-bandwidth-friendly when 32 workers share
one socket (bench profiling note in BENCH/BASELINE.md).

RE2 caveats honored here: no lookarounds/backrefs in any pattern passed in;
`\\b` is ASCII-ish — patterns that must respect accented word chars spell the
boundary out explicitly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def arr_of(s: pd.Series) -> pa.Array:
    """pandas Series → Arrow string array. Zero-copy when the Series is
    already Arrow-backed (the pipeline keeps text columns as ArrowDtype so
    the megabytes of document text are never re-encoded per feature pass)."""
    if isinstance(s.dtype, pd.ArrowDtype):
        arr = s.array._pa_array  # ChunkedArray
        arr = arr.combine_chunks() if arr.num_chunks != 1 else arr.chunk(0)
        if arr.null_count:
            arr = pc.fill_null(arr, "")
        return arr
    return pa.array(s.fillna("").astype(str), type=pa.string())


def series_of(arr: pa.Array, index=None) -> pd.Series:
    """Arrow string array → Arrow-backed pandas Series (no object dtype)."""
    return pd.Series(
        pd.arrays.ArrowExtensionArray(pa.chunked_array([arr])), index=index
    )


def word_bounded(core: str) -> str:
    """Unicode-safe word boundary for RE2: `\\b` in RE2 is ASCII, so 'pr'
    would match inside 'présente'. RE2 has no lookarounds either, so the
    boundary is an explicit consumed character class (fine for boolean
    contains, not for extraction offsets)."""
    w = r"\p{L}\p{N}_"
    return rf"(?:^|[^{w}])(?:{core})(?:$|[^{w}])"


def contains(arr: pa.Array, pattern: str) -> np.ndarray:
    return pc.match_substring_regex(arr, pattern).to_numpy(
        zero_copy_only=False
    )


def match(arr: pa.Array, pattern: str) -> np.ndarray:
    """Anchored-at-start match (pandas .str.match semantics)."""
    p = pattern if pattern.startswith("^") else "^(?:" + pattern + ")"
    return contains(arr, p)


def count_sep_runs(arr: pa.Array) -> np.ndarray:
    """Maximal [ \\t]+ runs per string — numpy over the raw UTF-8 buffer.

    Byte-exact equivalent of ``count(arr, "[ \\t]+")`` (pinned by a
    randomized parity test): space/tab are single-byte UTF-8 and
    continuation bytes are ≥ 0x80, so the byte-level mask can't split or
    invent runs inside multibyte codepoints. The RE2 count was the single
    most expensive featurizer scan (~6× any boolean contains — it must
    walk every match, not stop at the first); three vectorized passes over
    the byte buffer + a sparse bincount replace it. Falls back to the RE2
    kernel for null-bearing or non-string inputs."""
    n = len(arr)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    if arr.null_count or not pa.types.is_string(arr.type):
        return (
            pc.fill_null(pc.count_substring_regex(arr, "[ \t]+"), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + n + 1
    ].astype(np.int64)
    databuf = arr.buffers()[2]
    if databuf is None or offs[-1] == offs[0]:
        return np.zeros(n, dtype=np.int64)
    data = np.frombuffer(databuf, dtype=np.uint8)[offs[0] : offs[-1]]
    offs = offs - offs[0]
    sep = (data == 0x20) | (data == 0x09)
    run_start = sep.copy()
    run_start[1:] &= ~sep[:-1]
    # string boundaries: a sep at a string's first byte opens a run even
    # when the previous string's last byte was a sep
    starts = offs[:-1]
    vs = starts[starts < offs[1:]]  # non-empty strings only
    run_start[vs] = sep[vs]
    pos = np.flatnonzero(run_start)
    idx = np.searchsorted(offs, pos, side="right") - 1
    return np.bincount(idx, minlength=n).astype(np.int64)


def count(arr: pa.Array, pattern: str) -> np.ndarray:
    return (
        pc.count_substring_regex(arr, pattern)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )


def length(arr: pa.Array) -> np.ndarray:
    return pc.utf8_length(arr).to_numpy(zero_copy_only=False).astype(np.int64)


def lower(arr: pa.Array) -> pa.Array:
    return pc.utf8_lower(arr)


def replace(arr: pa.Array, pattern: str, repl: str) -> pa.Array:
    return pc.replace_substring_regex(arr, pattern, repl)


def strip(arr: pa.Array) -> pa.Array:
    return pc.utf8_trim_whitespace(arr)


def lstrip(arr: pa.Array) -> pa.Array:
    return pc.utf8_ltrim_whitespace(arr)
