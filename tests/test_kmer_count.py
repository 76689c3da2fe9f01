"""K-mer extraction + counting vs a naive Python oracle."""

import collections

import numpy as np
import pytest

from platanus_b_tpu.io.reads import pack_reads
from platanus_b_tpu.ops import count as cnt
from platanus_b_tpu.ops import multiword as mw
from platanus_b_tpu.ops.kmer import extract_canonical_kmers, extract_forward_kmers
from platanus_b_tpu.ops.search import lookup

BASES = "ACGT"
COMP = str.maketrans("ACGTN", "TGCAN")


def revcomp_str(s):
    return s.translate(COMP)[::-1]


def naive_canonical_kmers(seqs, k):
    out = collections.Counter()
    for s in seqs:
        for i in range(len(s) - k + 1):
            w = s[i:i + k]
            if "N" in w:
                continue
            out[min(w, revcomp_str(w))] += 1
    return out


def key_to_str(words, k):
    return "".join(BASES[c] for c in mw.unpack_kmer_np(np.asarray(words), k))


def random_seqs(rng, n, lo, hi, n_prob=0.0):
    seqs = []
    for _ in range(n):
        L = int(rng.integers(lo, hi + 1))
        chars = rng.choice(list("ACGT"), size=L)
        if n_prob:
            mask = rng.random(L) < n_prob
            chars[mask] = "N"
        seqs.append("".join(chars))
    return seqs


@pytest.mark.parametrize("k", [5, 16, 31, 32, 33])
def test_extract_canonical_matches_oracle(k, rng):
    seqs = random_seqs(rng, 30, k, 3 * k, n_prob=0.05)
    batch = pack_reads(seqs)
    keys, valid = extract_canonical_kmers(batch.codes, k)
    got = collections.Counter()
    keys = np.asarray(keys)
    valid = np.asarray(valid)
    for r in range(len(seqs)):
        for p in range(keys.shape[1]):
            if valid[r, p]:
                got[key_to_str(keys[r, p], k)] += 1
    assert got == naive_canonical_kmers(seqs, k)


def test_extract_forward(rng):
    k = 21
    seqs = random_seqs(rng, 10, k, 60)
    batch = pack_reads(seqs)
    keys, valid = extract_forward_kmers(batch.codes, k)
    keys, valid = np.asarray(keys), np.asarray(valid)
    for r, s in enumerate(seqs):
        for p in range(len(s) - k + 1):
            assert valid[r, p]
            assert key_to_str(keys[r, p], k) == s[p:p + k]


@pytest.mark.parametrize("k", [16, 31, 33])
def test_count_batch_matches_oracle(k, rng):
    seqs = random_seqs(rng, 50, k, 4 * k, n_prob=0.02)
    batch = pack_reads(seqs)
    ukeys, ucounts, n_unique = cnt.count_batch(batch.codes, k)
    ukeys, ucounts = cnt.compact_host(ukeys, ucounts, n_unique)
    oracle = naive_canonical_kmers(seqs, k)
    got = {key_to_str(kk, k): int(c) for kk, c in zip(ukeys, ucounts)}
    assert got == dict(oracle)
    # sortedness
    vals = [int.from_bytes(np.asarray(kk)[::-1].tobytes(), "little")
            for kk in ukeys]
    assert vals == sorted(vals)


def test_merge_counts(rng):
    k = 16
    seqs_a = random_seqs(rng, 20, k, 3 * k)
    seqs_b = random_seqs(rng, 20, k, 3 * k)
    ka, ca, na = cnt.count_batch(pack_reads(seqs_a).codes, k)
    kb, cb, nb = cnt.count_batch(pack_reads(seqs_b).codes, k)
    km, cm, nm = cnt.merge_counts(ka, ca, kb, cb)
    km, cm = cnt.compact_host(km, cm, nm)
    oracle = naive_canonical_kmers(seqs_a + seqs_b, k)
    got = {key_to_str(kk, k): int(c) for kk, c in zip(km, cm)}
    assert got == dict(oracle)


def test_histogram_and_cutoff():
    counts = np.array([1, 1, 1, 5, 5, 9, 9, 9, 9], dtype=np.uint32)
    hist = np.asarray(cnt.occurrence_histogram(counts))
    assert hist[1] == 3 and hist[5] == 2 and hist[9] == 4
    # error peak at occ=1, valley, signal peak at 9
    h = np.zeros(20, dtype=np.int64)
    h[1], h[2], h[3], h[9], h[10] = 100, 30, 2, 50, 40
    # reference semantics (counter.h:243-266): window sums stop strictly
    # decreasing first at occ=4 (hist 2 -> 0 -> 0), so the local min is 4
    lm = cnt.left_local_minimal_value(h, 1)
    assert lm == 4
    assert cnt.coverage_cutoff(h) == 2
    assert cnt.coverage_cutoff(h, repeat_mode=True) == 4
    assert cnt.coverage_cutoff(h, manual=7) == 7


def test_lookup(rng):
    k = 16
    seqs = random_seqs(rng, 30, k, 3 * k)
    ukeys, ucounts, n = cnt.count_batch(pack_reads(seqs).codes, k)
    ukeys_h, _ = cnt.compact_host(ukeys, ucounts, n)
    n = len(ukeys_h)
    # every table key finds itself
    idx = np.asarray(lookup(ukeys_h, ukeys_h, n))
    np.testing.assert_array_equal(idx, np.arange(n))
    # random absent keys return -1
    absent = rng.integers(0, 2**32, size=(50, ukeys_h.shape[1]), dtype=np.uint32)
    present = {tuple(r) for r in ukeys_h}
    idx2 = np.asarray(lookup(ukeys_h, absent.astype(np.uint32), n))
    for row, i in zip(absent, idx2):
        if tuple(row) not in present:
            assert i == -1


def test_occ_table_binary_roundtrip(tmp_path, rng):
    k = 32
    keys = np.sort(rng.integers(0, 2**32, size=(10, 2), dtype=np.uint32), axis=0)
    counts = rng.integers(1, 100, size=10).astype(np.uint32)
    p = str(tmp_path / "occ.bin")
    cnt.write_occurrence_table_binary(p, keys, counts, k)
    k2, keys2, counts2 = cnt.read_occurrence_table_binary(p)
    assert k2 == k
    np.testing.assert_array_equal(keys2, keys)
    np.testing.assert_array_equal(counts2, counts)


def test_partitioned_counting_matches_plain(rng):
    """Prefix-partitioned multi-pass counting (the -m out-of-core
    equivalent, counter.h:341-364) equals single-pass counting."""
    import simdata
    from platanus_b_tpu.io.reads import pack_reads
    from platanus_b_tpu.models.assemble_core import count_reads
    from platanus_b_tpu.ops.count import count_reads_partitioned

    genome = simdata.random_genome(rng, 3000)
    batch = pack_reads(simdata.shotgun_reads(rng, genome, 80, 10.0))
    for k in (21, 48):
        table, _ = count_reads([batch], k)
        pk, pc = count_reads_partitioned([batch], k, 4)
        np.testing.assert_array_equal(pk, table.keys)
        np.testing.assert_array_equal(pc, table.counts)


def test_dedup_max_value_correctness(rng):
    """Regression: the run max must win regardless of input order —
    dedup_max once relied on payload stability instead of sorting by
    value, silently keeping the FIRST value per key."""
    import jax.numpy as jnp

    pool = rng.integers(0, 50, size=(300, 2)).astype(np.uint32)
    idx = rng.integers(0, 300, size=5000)
    keys = pool[idx]
    vals = rng.integers(1, 1000, size=5000).astype(np.uint32)
    sent = np.full((64, 2), 0xFFFFFFFF, np.uint32)
    keys = np.vstack([keys, sent])
    vals = np.concatenate([vals, np.zeros(64, np.uint32)])
    order = np.lexsort((keys[:, 1], keys[:, 0]))
    uk, uv, n = cnt.dedup_max(jnp.asarray(keys[order]),
                              jnp.asarray(vals[order]))
    n = int(n)
    expect: dict = {}
    for kk, vv in zip(map(tuple, keys.tolist()), vals.tolist()):
        if kk != (0xFFFFFFFF, 0xFFFFFFFF):
            expect[kk] = max(expect.get(kk, 0), vv)
    got = {tuple(map(int, k)): int(v)
           for k, v in zip(np.asarray(uk[:n]), np.asarray(uv[:n]))}
    assert got == expect
