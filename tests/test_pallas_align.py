"""Pallas banded edit-distance kernel vs the host Levenshtein oracle.

Runs in Pallas interpret mode on the CPU test backend (conftest forces
jax_platforms=cpu); on TPU the same code path compiles the Mosaic kernel.
"""

import numpy as np
import pytest

from platanus_b_tpu.ops.align import edit_distance_np
from platanus_b_tpu.ops.pallas_align import banded_edit_distance


def _mutate(rng, s, n_sub, n_ins, n_del):
    s = list(s)
    for _ in range(n_sub):
        i = rng.integers(0, len(s))
        s[i] = (s[i] + rng.integers(1, 4)) % 4
    for _ in range(n_ins):
        i = rng.integers(0, len(s) + 1)
        s.insert(i, rng.integers(0, 4))
    for _ in range(n_del):
        i = rng.integers(0, len(s))
        del s[i]
    return np.array(s, np.uint8)


def test_exact_match_and_simple_edits():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 4, size=200, dtype=np.uint8)
    b = a.copy()
    b[50] = (b[50] + 1) % 4
    c = np.delete(a, 100)
    d = banded_edit_distance([a, a, a], [a, b, c], band=64)
    assert list(d) == [0, 1, 1]


def test_vs_oracle_random_pairs():
    rng = np.random.default_rng(1)
    qs, ts, want = [], [], []
    for _ in range(13):   # deliberately not a multiple of PB=8
        n = int(rng.integers(20, 150))
        a = rng.integers(0, 4, size=n, dtype=np.uint8)
        b = _mutate(rng, a, int(rng.integers(0, 6)),
                    int(rng.integers(0, 3)), int(rng.integers(0, 3)))
        qs.append(a)
        ts.append(b)
        want.append(edit_distance_np(a, b))
    got = banded_edit_distance(qs, ts, band=64)
    assert list(got) == want


def test_unrelated_sequences_within_band():
    rng = np.random.default_rng(2)
    a = rng.integers(0, 4, size=60, dtype=np.uint8)
    b = rng.integers(0, 4, size=60, dtype=np.uint8)
    got = banded_edit_distance([a], [b], band=128)[0]
    assert got == edit_distance_np(a, b)


def test_length_skew_inside_band():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 4, size=300, dtype=np.uint8)
    b = a[40:260]   # query has 40-bp and 40-bp overhangs
    got = banded_edit_distance([a], [b], band=192)[0]
    assert got == edit_distance_np(a, b) == 80


def test_n_codes_always_mismatch():
    a = np.full(30, 4, np.uint8)   # all N
    b = np.zeros(30, np.uint8)
    got = banded_edit_distance([a], [b], band=64)[0]
    assert got == 30


def test_empty_inputs():
    a = np.zeros(0, np.uint8)
    b = np.arange(4, dtype=np.uint8) % 4
    got = banded_edit_distance([a, b, a], [b, a, a], band=64)
    assert list(got) == [4, 4, 0]


def test_band_is_upper_bound_when_too_narrow():
    # optimal path leaves a tiny band: result must still be >= true distance
    rng = np.random.default_rng(4)
    a = rng.integers(0, 4, size=400, dtype=np.uint8)
    b = np.concatenate([rng.integers(0, 4, size=100, dtype=np.uint8), a])
    true = edit_distance_np(a, b)
    got = int(banded_edit_distance([a], [b], band=128)[0])
    assert got >= true
