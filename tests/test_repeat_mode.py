"""`assemble -repeat` multi-pass flow (assemble.cpp:148-261).

The reference's repeat mode targets REPETITIVE sequence: every pass
deletes unitigs below REPEAT_MODE_CUTOFF_FACTOR (1.75) x average
coverage regardless of length (assemble.cpp:385-388, ULONG_MAX length
cut), so even the factor-0 pass keeps only repeat-grade coverage; the
whole assembly then re-runs at coverageCutoffFactor 0, 1, 2 — later
passes raise the initial k-mer cutoff to averageCoverage * factor
(assemble.cpp:324-325) — and the accumulated contig sets merge through
a contig-sourced DBG (mergeContig, assemble.cpp:238-296). These tests
pin that structure on a tandem-repeat genome; reference-binary parity
is recorded separately in parity/PARITY_repeat_*.json.
"""

import numpy as np
import pytest

import simdata
from platanus_b_tpu.io.reads import ReadBatch
from platanus_b_tpu.models.assemble_core import (AssembleOptions, assemble,
                                                 assemble_repeat)


def _batches_from_reads(reads):
    L = max(len(r) for r in reads)
    codes = np.full((len(reads), L), 4, np.uint8)
    lens = np.zeros(len(reads), np.int32)
    m = {c: i for i, c in enumerate("ACGT")}
    for i, r in enumerate(reads):
        codes[i, : len(r)] = [m.get(c, 4) for c in r]
        lens[i] = len(r)
    return [ReadBatch(codes, lens)]


def _kmer_recall(seqs_codes, target: str, k: int = 25) -> float:
    """Fraction of the target's canonical k-mers present in the contigs."""
    m = "ACGT"
    have = set()
    for c in seqs_codes:
        s = "".join(m[b] for b in c if b < 4)
        for i in range(len(s) - k + 1):
            have.add(simdata.canon(s[i: i + k]))
    want = [simdata.canon(target[i: i + k])
            for i in range(len(target) - k + 1)]
    return sum(1 for w in want if w in have) / max(len(want), 1)


@pytest.fixture(scope="module")
def repeat_dataset():
    """35 kb genome containing a 2 kb unit repeated 4x (spaced), 60x
    reads — the repeat unit sits at ~4x the single-copy coverage, which
    is what -repeat's coverage thresholds key on."""
    rng = np.random.default_rng(11)
    unit = simdata.random_genome(rng, 2000)
    parts = []
    for _ in range(4):
        parts.append(simdata.random_genome(rng, 6000))
        parts.append(unit)
    parts.append(simdata.random_genome(rng, 3000))
    genome = "".join(parts)
    reads = simdata.shotgun_reads(rng, genome, 100, 60.0, error_rate=0.002)
    return genome, unit, _batches_from_reads(reads)


def test_repeat_pass_keeps_repeat_grade_only(repeat_dataset):
    """Normal mode assembles the whole genome; a repeat-mode pass (factor
    0) keeps only the high-coverage repeat unit (the 1.75x-average
    deleteErroneous sweep, assemble.cpp:385-388); factor 2 additionally
    raises the initial k-mer cutoff (assemble.cpp:324-325) and must not
    RE-ADMIT anything beyond repeat-grade sequence."""
    genome, unit, batches = repeat_dataset
    from dataclasses import replace
    normal = assemble(batches, AssembleOptions(k=25, step=10))
    bp_n = sum(len(c) for c in normal.contigs)
    assert bp_n > 25000

    opts = AssembleOptions(k=25, step=10, repeat_mode=True)
    r0 = assemble(batches, replace(opts, coverage_cutoff_factor=0.0))
    bp0 = sum(len(c) for c in r0.contigs)
    assert 0 < bp0 < 10000                    # repeat-grade subset only
    assert _kmer_recall(r0.contigs, unit) > 0.9   # the unit survived

    r2 = assemble(batches, replace(opts, coverage_cutoff_factor=2.0))
    bp2 = sum(len(c) for c in r2.contigs)
    assert bp2 <= bp0 * 1.2


def test_assemble_repeat_end_to_end(repeat_dataset):
    """The merged 3-pass output reproduces the repeat unit, stays
    genome-true, and emits no junction records (assemble.cpp:238-242)."""
    genome, unit, batches = repeat_dataset
    res = assemble_repeat(batches, AssembleOptions(k=25, step=10,
                                                   repeat_mode=True))
    assert res.junctions == []
    assert len(res.contigs) > 0
    assert _kmer_recall(res.contigs, unit) > 0.9
    m = "ACGT"
    n_in = 0
    for c in res.contigs:
        s = "".join(m[b] for b in c if b < 4)
        if s in genome or simdata.rc(s) in genome:
            n_in += 1
    # merged contigs are genuine genome sequence (boundary joins across
    # repeat copies may create genome-absent junctions; require majority)
    assert n_in >= len(res.contigs) * 0.75
