"""End-to-end `assemble` pipeline on simulated genomes."""

import numpy as np
import pytest

import simdata
from platanus_b_tpu.io import fasta as fa
from platanus_b_tpu.io.reads import pack_reads
from platanus_b_tpu.models.assemble_core import (AssembleOptions, assemble,
                                                 extend_kmer_schedule,
                                                 get_left_minimal)


def contigs_as_strings(result):
    out = []
    for c in result.contigs:
        s = fa.codes_to_seq(np.asarray(c))
        out.append(simdata.canon(s))
    return sorted(out)


def test_extend_kmer_schedule_monotone():
    ks, cuts = extend_kmer_schedule(
        min_log_p_join=np.log(1 - 1e-10), average_coverage=60.0,
        average_length=100.0, min_coverage=1, k0=32, cutoff0=4,
        length_step=10, max_kmer_ratio=0.5)
    assert ks[0] == 32
    assert all(b > a for a, b in zip(ks, ks[1:]))
    assert all(c >= 1 for c in cuts)
    assert ks[-1] <= 100
    # default config on 100bp reads reaches ~0.5*readlen
    assert ks[-1] >= 45


def test_get_left_minimal():
    d = np.zeros(20, dtype=np.int64)
    d[2], d[3], d[4], d[10] = 50, 10, 3, 40
    # decreasing 50,10,3 then rise at 5 (0 vs 3? 0<3 keeps falling) ...
    # values: idx2=50 idx3=10 idx4=3 idx5..9=0 idx10=40: first non-decrease
    # is idx6 (0 >= 0) -> returns 5
    assert get_left_minimal(d) == 5


def test_assemble_error_free_single_k(rng):
    genome = simdata.random_genome(rng, 2000)
    reads = simdata.shotgun_reads(rng, genome, 80, 40.0)
    batch = pack_reads(reads)
    opts = AssembleOptions(k=25, step=0, min_coverage=2)
    res = assemble([batch], opts)
    strs = contigs_as_strings(res)
    # error-free reads of a repeat-free genome -> one contig = genome
    # (edges may lose a few bases where coverage thins)
    assert len(strs) >= 1
    best = max(strs, key=len)
    assert len(best) >= len(genome) - 2 * 25
    assert best in genome or simdata.rc(best) in genome


def test_assemble_with_errors_and_extension(rng):
    genome = simdata.random_genome(rng, 3000)
    reads = simdata.shotgun_reads(rng, genome, 100, 50.0, error_rate=0.005)
    batch = pack_reads(reads)
    opts = AssembleOptions(k=25, step=10)
    res = assemble([batch], opts)
    strs = contigs_as_strings(res)
    assert res.max_k > 25  # extension actually ran
    best = max(strs, key=len)
    # the dominant contig covers nearly the whole genome
    assert len(best) >= 0.9 * len(genome)
    assert (best in genome or simdata.rc(best) in genome
            or _aligned_identity(best, genome) > 0.98)


def _aligned_identity(a: str, b: str) -> float:
    """Quick containment check via shared 31-mers."""
    k = 31
    sa = {a[i:i + k] for i in range(len(a) - k + 1)}
    sb = {min(b[i:i + k], simdata.rc(b[i:i + k])) for i in range(len(b) - k + 1)}
    sa = {min(s, simdata.rc(s)) for s in sa}
    return len(sa & sb) / max(len(sa), 1)


def test_assemble_kmer_occ_only(rng, tmp_path):
    genome = simdata.random_genome(rng, 1000)
    reads = simdata.shotgun_reads(rng, genome, 80, 30.0)
    batch = pack_reads(reads)
    opts = AssembleOptions(k=25, kmer_occ_only=True)
    res = assemble([batch], opts)
    assert res.kmer_table is not None
    assert len(res.kmer_table) > 900
    assert res.contigs == []
