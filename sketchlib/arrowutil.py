"""Arrow <-> NumPy helpers for zero-copy-ish batch access inside
``mapInArrow`` workers. The corpus contract (BASELINE.json:15) is
``tokens: array<int32>`` — list arrays are flattened to one contiguous NumPy
array plus per-row segment starts, so kernels never see per-row Python."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def list_to_flat(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(flat_values, starts) for a (Large)ListArray; starts has one entry per
    row (segment begin in flat_values). Handles sliced arrays."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not (pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type)):
        raise TypeError(f"expected list array, got {arr.type}")
    flat = arr.flatten()  # slice-aware
    offsets = arr.offsets.to_numpy(zero_copy_only=False)
    starts = (offsets[:-1] - offsets[0]).astype(np.int64)
    if flat.null_count:
        # null ELEMENTS inside lists: to_numpy would promote the whole batch
        # to float64 with NaNs — garbage keys once a builder casts to int.
        # Drop them and remap the per-row starts to the compacted coordinates
        # (cumsum of the validity mask; exact for empty rows too).
        valid = flat.is_valid().to_numpy(zero_copy_only=False)
        values = flat.drop_null().to_numpy(zero_copy_only=False)
        cum = np.concatenate(([0], np.cumsum(valid, dtype=np.int64)))
        starts = cum[starts]
    else:
        values = flat.to_numpy(zero_copy_only=False)
    return values, starts


def column_values(arr: pa.Array) -> np.ndarray:
    """Numeric scalar column -> NumPy (nulls dropped — sketch inputs are
    non-null by contract; droppable for robustness)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        arr = arr.drop_null()
    return arr.to_numpy(zero_copy_only=False)


def sketch_values(arr: pa.Array) -> np.ndarray:
    """Values to feed a sketch from either a list<int> column (flattened) or a
    numeric scalar column."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
        flat, _ = list_to_flat(arr)
        return flat
    return column_values(arr)
