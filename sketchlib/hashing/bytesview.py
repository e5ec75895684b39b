"""Zero-copy-ish conversion of string/binary columns into numpy form.

The vectorized kernels want a dense ``(n, max_len) uint8`` matrix plus a
length vector. Arrow already stores variable-length binary as one
contiguous data buffer + offsets, so we go values → pyarrow →
(offsets, data) → padded matrix with a single boolean-mask scatter.
This is the Arrow/numpy re-expression of the reference's batch hash
processors (SURVEY.md §2.1 #16-19): the "SIMD" is numpy columns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["as_binary_array", "to_offsets", "padded_matrix"]


def as_binary_array(values) -> pa.Array:
    """Normalize a column of str/bytes into a pyarrow large_binary array.

    Accepts pandas Series, numpy object arrays, lists, or pyarrow arrays.
    Strings become their UTF-8 bytes (zero-copy reinterpretation). Nulls
    hash as empty byte strings.
    """
    if isinstance(values, pa.ChunkedArray):
        arr = values.combine_chunks()
    elif isinstance(values, pa.Array):
        arr = values
    else:
        arr = pa.array(values)
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.large_binary())
    elif pa.types.is_binary(arr.type) or pa.types.is_fixed_size_binary(arr.type):
        arr = arr.cast(pa.large_binary())
    elif not pa.types.is_large_binary(arr.type):
        # last resort: stringify (callers hashing non-string key columns
        # should cast explicitly upstream)
        arr = arr.cast(pa.large_string()).cast(pa.large_binary())
    if arr.null_count:
        arr = arr.fill_null(b"")
    return arr


def to_offsets(values) -> tuple[np.ndarray, np.ndarray]:
    """Return (lens[int64], flat_data[uint8]) for a column of str/bytes."""
    arr = as_binary_array(values)
    n = len(arr)
    offsets = np.frombuffer(arr.buffers()[1], np.int64)[arr.offset : arr.offset + n + 1]
    data_buf = arr.buffers()[2]
    data = (
        np.frombuffer(data_buf, np.uint8)[offsets[0] : offsets[-1]]
        if data_buf is not None
        else np.empty(0, np.uint8)
    )
    lens = np.diff(offsets)
    return lens, data


def padded_matrix(
    lens: np.ndarray, data: np.ndarray, pad_to: int = 1
) -> tuple[np.ndarray, np.ndarray]:
    """Build (n, ceil(max_len/pad_to)*pad_to) uint8 matrix, rows zero-padded.

    The mask scatter relies on row-major order matching the concatenated
    data layout. ``pad_to=8`` lets callers reinterpret rows as uint64
    little-endian words.
    """
    n = len(lens)
    max_len = int(lens.max()) if n else 0
    width = max(((max_len + pad_to - 1) // pad_to) * pad_to, pad_to)
    mat = np.zeros((n, width), np.uint8)
    if max_len:
        mask = np.arange(max_len)[None, :] < lens[:, None]
        mat[:, :max_len][mask] = data
    return mat, lens


# (an earlier length_sorted_chunks generator lived here; hash64_batch
# in kernels.py superseded it with a radix-sorted, Arrow-take variant
# whose chunks slice the contiguous data buffer directly — the unused
# generator was deleted rather than kept as a second chunking policy)
