"""Batched alignment primitives (VPU-friendly DP over base codes).

edit_distance_batch reproduces the bubble pairwise alignment of the
reference (graph.h:713-746 pairwiseAlignment: plain Levenshtein with unit
costs over the bubble middle sections) but vmapped over many pairs at once:
one lax.scan over rows, all pairs advancing in lockstep on the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

BIG = np.int32(1 << 28)


@functools.partial(jax.jit, static_argnames=())
def edit_distance_batch(a: jnp.ndarray, alen: jnp.ndarray,
                        b: jnp.ndarray, blen: jnp.ndarray) -> jnp.ndarray:
    """Levenshtein distance for each row pair.

    a: (P, La) uint8 codes, alen: (P,) true lengths (rest ignored)
    b: (P, Lb) uint8 codes, blen: (P,) true lengths
    Returns (P,) int32 distances d(a[:alen], b[:blen]).
    """
    P, La = a.shape
    Lb = b.shape[1]
    cols = jnp.arange(Lb + 1, dtype=jnp.int32)
    # row 0: j for j<=blen else clamp (won't be selected)
    row0 = jnp.broadcast_to(cols, (P, Lb + 1))

    def step(row, m):
        # row: (P, Lb+1) DP row for prefix length m of a
        am = a[:, m]  # (P,)
        active = (m < alen)
        sub = row[:, :-1] + jnp.where(b[:, :Lb] == am[:, None], 0, 1)
        new_first = jnp.full((P,), m + 1, dtype=jnp.int32)
        # compute with running min over the insert dimension via scan-free
        # approach: new[j+1] = min(sub[j], row[j+1]+1, new[j]+1)
        cand = jnp.minimum(sub, row[:, 1:] + 1)
        # prefix-min with +1 accumulation (associative scan)
        # new[j+1] = min over t<=j of (cand[t] + (j - t)), plus new_first+j+1
        # use lax.associative_scan on (value - index) trick:
        idx = jnp.arange(Lb, dtype=jnp.int32)
        shifted = cand - idx[None, :]
        runmin = jax.lax.associative_scan(jnp.minimum, shifted, axis=1)
        new_rest = jnp.minimum(runmin + idx[None, :],
                               new_first[:, None] + idx[None, :] + 1)
        new_row = jnp.concatenate([new_first[:, None], new_rest], axis=1)
        row = jnp.where(active[:, None], new_row, row)
        return row, None

    row, _ = jax.lax.scan(step, row0, jnp.arange(La))
    return jnp.take_along_axis(row, blen[:, None].astype(jnp.int32), axis=1)[:, 0]


def edit_distance_np(s1: np.ndarray, s2: np.ndarray) -> int:
    """Host oracle for tests."""
    n, m = len(s1), len(s2)
    d = np.arange(m + 1)
    for i in range(1, n + 1):
        prev = d.copy()
        d[0] = i
        for j in range(1, m + 1):
            d[j] = min(prev[j] + 1, d[j - 1] + 1,
                       prev[j - 1] + (0 if s1[i - 1] == s2[j - 1] else 1))
    return int(d[m])
