"""Vectorized extended_unitig_sequences_flat vs the scalar oracle.

The vectorized form must reproduce the scalar per-unitig walk
(graph.h:1678-1751 semantics) byte-for-byte on graphs with junctions,
since save_contig_next_k parity (and hence contig-set parity with the
reference) rests on these exact bytes.
"""

import numpy as np
import pytest

from platanus_b_tpu.io.reads import pack_reads
from platanus_b_tpu.models.assemble_core import (
    _extended_unitig_sequences_ref, extended_unitig_sequences_flat,
    save_contig_next_k)
from platanus_b_tpu.models.dbg import DBG
from platanus_b_tpu.ops import count as cnt

BASES = "ACGT"


def build_dbg(seqs, k, cutoff=0):
    batch = pack_reads(seqs)
    keys, counts, n = cnt.count_batch(batch.codes, k)
    keys_h, counts_h = cnt.compact_host(keys, counts, n)
    keep = counts_h > cutoff
    return DBG(k, keys_h[keep], counts_h[keep])


def _flatten_ref(dbg, diff):
    seqs, _cov = _extended_unitig_sequences_ref(dbg, diff)
    return seqs


def _assert_equal(dbg, diff):
    ref = _flatten_ref(dbg, diff)
    flat, offs, lens, _cov = extended_unitig_sequences_flat(dbg, diff)
    assert len(ref) == len(lens)
    for i, r in enumerate(ref):
        got = flat[offs[i]: offs[i] + lens[i]]
        assert np.array_equal(got, r), (
            f"unitig {i}: ref len {len(r)} got len {lens[i]}")


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_vectorized_matches_scalar_random(seed):
    rng = np.random.default_rng(seed)
    k = 15
    genome = "".join(rng.choice(list(BASES), size=800))
    # mutate copies to create bubbles/branches -> junctions
    g2 = list(genome)
    for p in rng.integers(50, 750, size=6):
        g2[p] = BASES[(BASES.index(g2[p]) + 1) % 4]
    g2 = "".join(g2)
    reads = [genome[i:i + 60] for i in range(0, len(genome) - 60, 3)]
    reads += [g2[i:i + 60] for i in range(0, len(g2) - 60, 7)]
    dbg = build_dbg(reads, k)
    assert np.asarray(dbg.topo[4]).any(), "expected junctions"
    for diff in (5, 10, 40):
        _assert_equal(dbg, diff)


def test_vectorized_matches_scalar_repeat_genome():
    rng = np.random.default_rng(42)
    k = 15
    core = "".join(rng.choice(list(BASES), size=120))
    a = "".join(rng.choice(list(BASES), size=200))
    b = "".join(rng.choice(list(BASES), size=200))
    c = "".join(rng.choice(list(BASES), size=200))
    d = "".join(rng.choice(list(BASES), size=200))
    genome = a + core + b + c + core + d  # a genuine repeat -> junctions
    reads = [genome[i:i + 50] for i in range(0, len(genome) - 50, 2)]
    dbg = build_dbg(reads, k)
    for diff in (5, 20):
        _assert_equal(dbg, diff)


def test_save_contig_next_k_table_unchanged():
    # the rewritten (vectorized) chopping must produce the identical
    # max-merged next-k table the old list-based path produced: verify
    # against a straightforward recount over the ref-flattened sequences
    rng = np.random.default_rng(9)
    k, next_k = 15, 25
    genome = "".join(rng.choice(list(BASES), size=600))
    reads = [genome[i:i + 60] for i in range(0, len(genome) - 60, 2)]
    dbg = build_dbg(reads, k)
    tab = save_contig_next_k(dbg, next_k, 0.5).host()
    # oracle: brute-force canonical next_k-mer max-occurrence map
    seqs, ucov = _extended_unitig_sequences_ref(dbg, next_k - k)
    occs = np.minimum((ucov * 0.5 + 0.5).astype(np.uint32),
                      cnt.MAX_OCCURRENCE)
    from platanus_b_tpu.ops.multiword import pack_kmer_np
    best = {}
    for s, occ in zip(seqs, occs):
        st = "".join(BASES[c] for c in s)
        for i in range(len(st) - next_k + 1):
            sub = st[i:i + next_k]
            rcs = sub.translate(str.maketrans("ACGT", "TGCA"))[::-1]
            codes = np.array([BASES.index(c) for c in min(sub, rcs)],
                             np.uint8)
            key = tuple(pack_kmer_np(codes, next_k))
            best[key] = max(best.get(key, 0), int(occ))
    got = {tuple(tab.keys[i]): int(tab.counts[i])
           for i in range(len(tab.keys))}
    assert got == best
