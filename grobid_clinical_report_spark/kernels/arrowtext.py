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
