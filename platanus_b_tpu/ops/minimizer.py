"""Minimizer sketching on device (minimap2 sketch.c equivalent).

For every window of w consecutive k-mers, the canonical k-mer with the
smallest mixed hash is a minimizer (Roberts et al.; minimap2/sketch.c:143).
All windows of a padded read batch are evaluated in parallel: canonical
k-mer extraction (ops.kmer) -> per-position hash -> sliding-window minimum
via a reduce-window -> positions whose hash equals their window minimum.

Strand convention matches minimap2: a minimizer records whether the
canonical (smaller) form was the forward or reverse-complement k-mer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .kmer import extract_canonical_kmers
from .multiword import mw_eq, mw_hash, revcomp

HASH_INVALID = np.uint32(0xFFFFFFFF)


@functools.partial(jax.jit, static_argnames=("k", "w"))
def minimizer_positions(codes: jnp.ndarray, k: int, w: int):
    """Minimizer mask over a padded read batch.

    codes: (R, L) uint8. Returns (hash (R, P) uint32, is_min (R, P) bool,
    strand (R, P) uint8 0=fwd/1=rev, valid (R, P) bool) with P = L - k + 1.
    A position is a minimizer iff its hash equals the minimum of ANY
    w-window containing it (the standard "robust winnowing" selection).
    """
    keys, valid = extract_canonical_kmers(codes, k)
    R, P, W = keys.shape
    # strand: did the canonical (min) form come from the forward k-mer?
    from .kmer import extract_forward_kmers
    fkeys, _ = extract_forward_kmers(codes, k)
    strand = jnp.where(mw_eq(keys, fkeys), jnp.uint8(0), jnp.uint8(1))

    h = mw_hash(keys)
    h = jnp.where(valid, h, HASH_INVALID)
    if P < w:
        is_min = valid
        return h, is_min, strand, valid
    # window minima: for each window start s, min over [s, s+w)
    wmin = jax.lax.reduce_window(
        h, HASH_INVALID, jax.lax.min,
        window_dimensions=(1, w), window_strides=(1, 1), padding="VALID")
    # position p is a minimizer if h[p] == wmin[s] for some window s
    # containing p; mark with one shifted comparison per offset (w is
    # small: 5..19)
    S = wmin.shape[1]
    marks = jnp.zeros((R, P), dtype=jnp.bool_)
    for off in range(w):
        cmp = h[:, off: off + S] == wmin
        marks = marks.at[:, off: off + S].set(
            marks[:, off: off + S] | cmp)
    is_min = marks & valid
    return h, is_min, strand, valid


def sketch(codes: np.ndarray, lengths: np.ndarray, k: int, w: int):
    """Host wrapper: per-read minimizer lists.

    Returns list of (hash (M,), pos (M,), strand (M,)) numpy arrays.
    """
    h, is_min, strand, valid = minimizer_positions(jnp.asarray(codes), k, w)
    h = np.asarray(h)
    is_min = np.asarray(is_min)
    strand = np.asarray(strand)
    out = []
    P = h.shape[1]
    for r in range(codes.shape[0]):
        n = max(int(lengths[r]) - k + 1, 0)
        sel = np.nonzero(is_min[r, :n])[0]
        out.append((h[r, sel], sel.astype(np.int32), strand[r, sel]))
    return out
