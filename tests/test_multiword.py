"""Golden-unit tests for multi-word k-mer primitives vs naive Python."""

import numpy as np
import pytest

from platanus_b_tpu.ops import multiword as mw


def naive_pack(codes, k):
    v = 0
    for c in codes:
        v = (v << 2) | int(c)
    return v


def naive_revcomp_value(codes, k):
    rc = [3 - int(c) for c in codes[::-1]]
    return naive_pack(rc, k)


def words_to_value(words):
    v = 0
    for w in np.asarray(words):
        v = (v << 32) | int(w)
    return v


@pytest.mark.parametrize("k", [4, 15, 16, 17, 31, 32, 33, 48, 63, 80, 100])
def test_pack_unpack_roundtrip(k, rng):
    codes = rng.integers(0, 4, size=k).astype(np.uint8)
    words = mw.pack_kmer_np(codes, k)
    assert words.shape == (mw.num_words(k),)
    assert words_to_value(words) == naive_pack(codes, k)
    back = mw.unpack_kmer_np(words, k)
    np.testing.assert_array_equal(back, codes)


@pytest.mark.parametrize("k", [4, 16, 31, 32, 33, 63, 80])
def test_revcomp(k, rng):
    import jax.numpy as jnp
    for _ in range(5):
        codes = rng.integers(0, 4, size=k).astype(np.uint8)
        words = mw.pack_kmer_np(codes, k)
        rc = mw.revcomp(jnp.asarray(words)[None, :], k)[0]
        assert words_to_value(rc) == naive_revcomp_value(codes, k)


@pytest.mark.parametrize("k", [16, 31, 33, 48])
def test_shifts_and_compare(k, rng):
    import jax.numpy as jnp
    codes = rng.integers(0, 4, size=k).astype(np.uint8)
    words = jnp.asarray(mw.pack_kmer_np(codes, k))[None, :]
    mask = (1 << (2 * k)) - 1
    v = naive_pack(codes, k)
    assert words_to_value(mw.mw_shl2(words, k)[0]) == (v << 2) & mask
    assert words_to_value(mw.mw_shr2(words)[0]) == v >> 2

    codes2 = rng.integers(0, 4, size=k).astype(np.uint8)
    w2 = jnp.asarray(mw.pack_kmer_np(codes2, k))[None, :]
    v2 = naive_pack(codes2, k)
    assert bool(mw.mw_lt(words, w2)[0]) == (v < v2)
    assert bool(mw.mw_le(words, w2)[0]) == (v <= v2)
    assert bool(mw.mw_eq(words, words)[0])
    assert words_to_value(mw.mw_min(words, w2)[0]) == min(v, v2)


@pytest.mark.parametrize("k", [16, 31, 33])
def test_canonical_matches_reference_rule(k, rng):
    import jax.numpy as jnp
    codes = rng.integers(0, 4, size=(20, k)).astype(np.uint8)
    packed = np.stack([mw.pack_kmer_np(c, k) for c in codes])
    canon, was_fwd = mw.canonical(jnp.asarray(packed), k)
    for i, c in enumerate(codes):
        v = naive_pack(c, k)
        r = naive_revcomp_value(c, k)
        assert words_to_value(canon[i]) == min(v, r)
        assert bool(was_fwd[i]) == (v <= r)
