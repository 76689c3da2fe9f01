"""Capacity padding: the shape discipline that keeps XLA compiles bounded.

Everything under jit compiles once per distinct shape. Assembly data is
ragged (read batches, k-mer tables, graphs shrink as they are cleaned), so
raw shapes would force a recompile at every step. All device entry points
therefore pad leading axes to power-of-two capacities and carry the true
length as a traced scalar — log-many compiled variants total (SURVEY §7
hard part (e): "bucketing + padding discipline").
"""

from __future__ import annotations

import numpy as np

MIN_CAPACITY = 1024


def next_pow2(n: int, minimum: int = MIN_CAPACITY) -> int:
    n = max(int(n), minimum)
    return 1 << (n - 1).bit_length()


def pad_rows(arr: np.ndarray, capacity: int, fill) -> np.ndarray:
    """Pad axis 0 of a host array to `capacity` with `fill`."""
    n = arr.shape[0]
    if n == capacity:
        return arr
    if n > capacity:
        raise ValueError(f"array rows {n} exceed capacity {capacity}")
    pad_shape = (capacity - n,) + arr.shape[1:]
    return np.concatenate([arr, np.full(pad_shape, fill, dtype=arr.dtype)])


def pad_pow2(arr: np.ndarray, fill, minimum: int = MIN_CAPACITY) -> np.ndarray:
    return pad_rows(arr, next_pow2(arr.shape[0], minimum), fill)
