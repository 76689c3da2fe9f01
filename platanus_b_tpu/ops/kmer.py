"""Vectorized canonical k-mer extraction from read batches.

Replaces the per-read rolling loop of the reference's hot path
(counter.h:391-434: prime k-1 bases, then fwd<<=2|base, rev>>=2|~base,
key = min(fwd, rev), skipping windows containing N). Here every window of
every read in a batch is materialized in parallel with pure slicing —
no gathers, no scans — so XLA fuses the whole extraction into a handful
of vector ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .multiword import U32, mw_le, num_words

SENTINEL = np.uint32(0xFFFFFFFF)  # invalid-key filler; never a canonical k-mer


@functools.partial(jax.jit, static_argnames=("k",))
def extract_canonical_kmers(codes: jnp.ndarray, k: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """All canonical k-mers of a padded read batch.

    codes: (R, L) uint8, 0..3 = bases, >=4 = N / padding.
    Returns (keys, valid): keys (R, P, W) uint32 with P = L-k+1, word 0 most
    significant; valid (R, P) bool — False where the window touches an N or
    padding. Invalid key rows are set to the all-ones SENTINEL so they sort
    last (counter.h:413-429 skips N windows by resetting the rolling state).
    """
    R, L = codes.shape
    P = L - k + 1
    if P <= 0:
        W = num_words(k)
        return (jnp.full((R, 0, W), SENTINEL, dtype=U32),
                jnp.zeros((R, 0), dtype=bool))
    W = num_words(k)

    u = codes.astype(U32)
    fwd = [jnp.zeros((R, P), dtype=U32) for _ in range(W)]
    rev = [jnp.zeros((R, P), dtype=U32) for _ in range(W)]
    for i in range(k):
        win = u[:, i:i + P]
        # forward: base i sits at bit 2(k-1-i) of the 2k-bit value
        g = 2 * (k - 1 - i)
        fwd[W - 1 - g // 32] = fwd[W - 1 - g // 32] | ((win & 3) << np.uint32(g % 32))
        # reverse complement: base i contributes (3-b) at bit 2i
        g = 2 * i
        rev[W - 1 - g // 32] = rev[W - 1 - g // 32] | (((win ^ 3) & 3) << np.uint32(g % 32))

    f = jnp.stack(fwd, axis=-1)
    r = jnp.stack(rev, axis=-1)
    canon = jnp.where(mw_le(f, r)[..., None], f, r)

    # validity: no N (code > 3) anywhere in the window
    is_n = (codes > 3).astype(jnp.int32)
    csum = jnp.concatenate([jnp.zeros((R, 1), jnp.int32),
                            jnp.cumsum(is_n, axis=1)], axis=1)
    valid = (csum[:, k:] - csum[:, :-k]) == 0

    keys = jnp.where(valid[..., None], canon, jnp.full_like(canon, SENTINEL))
    return keys, valid


@functools.partial(jax.jit, static_argnames=("k",))
def extract_forward_kmers(codes: jnp.ndarray, k: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Forward-strand (non-canonical) k-mers of every window.

    Used where orientation matters (mapper seeds, unitig re-k-merization).
    Same shapes/validity rules as extract_canonical_kmers.
    """
    R, L = codes.shape
    P = L - k + 1
    W = num_words(k)
    if P <= 0:
        return (jnp.full((R, 0, W), SENTINEL, dtype=U32),
                jnp.zeros((R, 0), dtype=bool))
    u = codes.astype(U32)
    fwd = [jnp.zeros((R, P), dtype=U32) for _ in range(W)]
    for i in range(k):
        win = u[:, i:i + P]
        g = 2 * (k - 1 - i)
        fwd[W - 1 - g // 32] = fwd[W - 1 - g // 32] | ((win & 3) << np.uint32(g % 32))
    f = jnp.stack(fwd, axis=-1)

    is_n = (codes > 3).astype(jnp.int32)
    csum = jnp.concatenate([jnp.zeros((R, 1), jnp.int32),
                            jnp.cumsum(is_n, axis=1)], axis=1)
    valid = (csum[:, k:] - csum[:, :-k]) == 0
    keys = jnp.where(valid[..., None], f, jnp.full_like(f, SENTINEL))
    return keys, valid


@jax.jit
def unpack_codes(words: jnp.ndarray, nmask: jnp.ndarray) -> jnp.ndarray:
    """Inverse of ReadBatch.packed(): (R, L//16) u32 words + (R, L//32)
    u32 N-bitmask -> (R, L) uint8 codes with 4 at N/padding positions.
    Pure shifts/selects — the upload stays at 2.25 bits/base and the
    byte-per-base layout the extraction kernels consume is materialized
    device-side."""
    R, WW = words.shape
    base = jnp.stack([(words >> np.uint32(30 - 2 * i)) & 3
                      for i in range(16)], axis=-1).astype(jnp.uint8)
    base = base.reshape(R, WW * 16)
    nb = jnp.stack([(nmask >> np.uint32(31 - i)) & 1
                    for i in range(32)], axis=-1).astype(jnp.uint8)
    nb = nb.reshape(R, WW * 16)
    return jnp.where(nb != 0, jnp.uint8(4), base)


@jax.jit
def unpack_codes_lens(words: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """unpack_codes for N-free reads: the mask derives from lengths alone
    (cols >= length are padding), so the nmask upload — a third of the
    wire bytes over the device tunnel — is skipped entirely."""
    R, WW = words.shape
    base = jnp.stack([(words >> np.uint32(30 - 2 * i)) & 3
                      for i in range(16)], axis=-1).astype(jnp.uint8)
    base = base.reshape(R, WW * 16)
    pad = jnp.arange(WW * 16, dtype=jnp.int32)[None, :] >= lengths[:, None]
    return jnp.where(pad, jnp.uint8(4), base)


def kmer_to_codes(keys: jnp.ndarray, k: int) -> jnp.ndarray:
    """Unpack (..., W) keys into (..., k) uint8 base codes (device-side)."""
    W = keys.shape[-1]
    outs = []
    for i in range(k):
        g = 2 * (k - 1 - i)
        outs.append(((keys[..., W - 1 - g // 32] >> np.uint32(g % 32)) & 3)
                    .astype(jnp.uint8))
    return jnp.stack(outs, axis=-1)
