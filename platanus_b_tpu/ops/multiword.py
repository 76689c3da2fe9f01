"""Multi-word (W x uint32) big-integer helpers for packed k-mers.

The reference spans six key regimes — Kmer31 (one u64, kmer.h:84-191) and
KmerN over Binstr63/95/127/159/binstr_t (kmer.h:193-310, binstr.h) — chosen
by if/else ladders at every call site (assemble.cpp:174-207). Here a k-mer
is one ``(..., W)`` uint32 array with word 0 the most significant; W =
ceil(2k/32). TPUs have no native 64-bit lanes, so u32 is the natural word.

All helpers are shape-polymorphic over leading axes and jit-safe.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32
FULL = np.uint32(0xFFFFFFFF)


def num_words(k: int) -> int:
    """Words needed for a k-mer: ceil(2k/32)."""
    return -(-2 * k // 32)


def top_word_mask(k: int) -> np.uint32:
    """Mask of the used bits in word 0 (value is right-aligned 2k bits)."""
    w = num_words(k)
    used = 2 * k - 32 * (w - 1)
    return FULL if used == 32 else np.uint32((1 << used) - 1)


def mw_shl2(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """(x << 2) within 2k bits — rolling k-mer update (kmer.h:100 fwd<<=2)."""
    hi = jnp.concatenate([x[..., 1:] >> 30, jnp.zeros_like(x[..., :1])], axis=-1)
    out = (x << 2) | hi
    return out.at[..., 0].set(out[..., 0] & top_word_mask(k))


def mw_shr2(x: jnp.ndarray) -> jnp.ndarray:
    """x >> 2 across words (kmer.h reverse-strand update rev>>=2)."""
    lo = jnp.concatenate([jnp.zeros_like(x[..., :1]), x[..., :-1] << 30], axis=-1)
    return (x >> 2) | lo


def mw_or_low(x: jnp.ndarray, base: jnp.ndarray) -> jnp.ndarray:
    """OR a 2-bit value into the least-significant position."""
    return x.at[..., -1].set(x[..., -1] | base.astype(U32))


def mw_or_high(x: jnp.ndarray, base: jnp.ndarray, k: int) -> jnp.ndarray:
    """OR a 2-bit value into bit position 2(k-1) (the first-base slot)."""
    w = num_words(k)
    g = 2 * (k - 1)
    wi = w - 1 - g // 32
    sh = np.uint32(g % 32)
    return x.at[..., wi].set(x[..., wi] | (base.astype(U32) << sh))


def mw_lt(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Lexicographic a < b over the word axis (= numeric big-int compare)."""
    lt = jnp.zeros(a.shape[:-1], dtype=bool)
    eq = jnp.ones(a.shape[:-1], dtype=bool)
    for w in range(a.shape[-1]):
        lt = lt | (eq & (a[..., w] < b[..., w]))
        eq = eq & (a[..., w] == b[..., w])
    return lt


def mw_le(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    lt = jnp.zeros(a.shape[:-1], dtype=bool)
    eq = jnp.ones(a.shape[:-1], dtype=bool)
    for w in range(a.shape[-1]):
        lt = lt | (eq & (a[..., w] < b[..., w]))
        eq = eq & (a[..., w] == b[..., w])
    return lt | eq


def mw_eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    eq = jnp.ones(a.shape[:-1], dtype=bool)
    for w in range(a.shape[-1]):
        eq = eq & (a[..., w] == b[..., w])
    return eq


def mw_min(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise big-int min — the canonical-k-mer rule (counter.h:429)."""
    le = mw_le(a, b)
    return jnp.where(le[..., None], a, b)


def mw_select(pred: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(pred[..., None], a, b)


def _rev2_u32(x: jnp.ndarray) -> jnp.ndarray:
    """Reverse the sixteen 2-bit groups inside each uint32 lane."""
    m2 = np.uint32(0x33333333)
    m4 = np.uint32(0x0F0F0F0F)
    m8 = np.uint32(0x00FF00FF)
    x = ((x >> 2) & m2) | ((x & m2) << 2)
    x = ((x >> 4) & m4) | ((x & m4) << 4)
    x = ((x >> 8) & m8) | ((x & m8) << 8)
    x = (x >> 16) | (x << 16)
    return x


def mw_shr(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """Right shift by a static 0 <= s < 32 across words."""
    if s == 0:
        return x
    lo = jnp.concatenate([jnp.zeros_like(x[..., :1]),
                          x[..., :-1] << np.uint32(32 - s)], axis=-1)
    return (x >> np.uint32(s)) | lo


def revcomp(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Reverse complement of a packed k-mer.

    The u64 bit trick of the reference (binstr.h:272-279 revCom_u64) in u32
    lanes: complement (~b is 3-b per 2-bit group), reverse groups per word,
    reverse word order, re-align to the low 2k bits.
    """
    w = num_words(k)
    comp = ~x
    rev = _rev2_u32(comp)[..., ::-1]
    rev = mw_shr(rev, (32 * w - 2 * k) % 32)
    return rev.at[..., 0].set(rev[..., 0] & top_word_mask(k))


def canonical(x: jnp.ndarray, k: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(min(x, revcomp(x)), was_forward) — counter.h:429 canonical rule."""
    rc = revcomp(x, k)
    le = mw_le(x, rc)
    return jnp.where(le[..., None], x, rc), le


def mw_hash(x: jnp.ndarray) -> jnp.ndarray:
    """Mix words into one uint32 for sharding / bucketing.

    Murmur3-style finalizer per word, XOR-combined. Only used to pick
    shards/buckets (replaces doubleHash.h:118-130 makeHashKey); never as a
    key, so collisions are harmless.
    """
    h = jnp.zeros(x.shape[:-1], dtype=U32)
    for w in range(x.shape[-1]):
        v = x[..., w]
        v = v ^ (v >> 16)
        v = v * np.uint32(0x85EBCA6B)
        v = v ^ (v >> 13)
        v = v * np.uint32(0xC2B2AE35)
        v = v ^ (v >> 16)
        h = (h * np.uint32(0x9E3779B1)) ^ v
    return h


def pack_kmer_np(codes: np.ndarray, k: int) -> np.ndarray:
    """Host-side scalar packer (for tests / tiny inputs): codes (k,) -> (W,)."""
    w = num_words(k)
    val = 0
    for c in codes:
        val = (val << 2) | int(c)
    out = np.zeros(w, dtype=np.uint32)
    for i in range(w - 1, -1, -1):
        out[i] = val & 0xFFFFFFFF
        val >>= 32
    return out


def unpack_kmer_np(words: np.ndarray, k: int) -> np.ndarray:
    """Host-side inverse of pack_kmer_np: (W,) -> (k,) base codes."""
    val = 0
    for wd in words:
        val = (val << 32) | int(wd)
    return np.array([(val >> (2 * (k - 1 - i))) & 3 for i in range(k)],
                    dtype=np.uint8)
