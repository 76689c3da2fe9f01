"""Scaffolder: overlaps, links, greedy layout, result sequences."""

import numpy as np
import simdata

from platanus_b_tpu.commands.solve_dbg_cmd import (join_unambiguous_overlaps,
                                                   run_unphase)
from platanus_b_tpu.io.fasta import seq_to_codes
from platanus_b_tpu.io.reads import pack_reads
from platanus_b_tpu.models import seqlib
from platanus_b_tpu.models.mapper import ContigIndex
from platanus_b_tpu.models.scaffold import ScaffoldGraph


def _graph(seqs, covs=None, **kw):
    codes = [seq_to_codes(s) for s in seqs]
    covs = covs if covs is not None else np.full(len(seqs), 40.0)
    return ScaffoldGraph(codes, covs, **kw), codes


def test_save_overlap_detects_end_overlap(rng):
    genome = simdata.random_genome(rng, 2000)
    a, b = genome[:1050], genome[1000:]  # 50bp overlap
    g, codes = _graph([a, b], min_overlap=31, hash_overlap=49)
    idx = ContigIndex(codes, key_length=32)
    g.save_overlap(idx, cutoff_length=50)
    assert g.get_overlap(1, 2) == 50
    # reverse-strand overlap: rc(b) then rc(a)
    assert g.get_overlap(-2, -1) == 50


def test_short_overlap_below_key_length(rng):
    genome = simdata.random_genome(rng, 1000)
    a, b = genome[:520], genome[500:]  # 20bp overlap < min_overlap 31
    g, codes = _graph([a, b], min_overlap=15, hash_overlap=31)
    idx = ContigIndex(codes, key_length=32)
    g.save_overlap(idx, cutoff_length=50)
    assert g.get_overlap(1, 2) == 20


def test_unphase_scaffolds_two_contigs(rng, tmp_path):
    genome = simdata.random_genome(rng, 6000)
    contigs = [genome[:2900], genome[3100:]]  # 200bp gap
    cfa = tmp_path / "c.fa"
    with open(cfa, "w") as f:
        for i, c in enumerate(contigs):
            f.write(f">seq{i+1}_len{len(c)}_cov40_read100_maxK50\n{c}\n")
    fwd, rev = simdata.paired_reads(rng, genome, read_len=100, insert=500,
                                    sd=50, coverage=30.0)
    f1, f2 = tmp_path / "1.fa", tmp_path / "2.fa"
    simdata.write_fasta(f1, fwd)
    simdata.write_fasta(f2, rev)

    from platanus_b_tpu.commands.libparse import extract_library_args
    _rest, specs = extract_library_args(["-IP1", str(f1), str(f2)])
    results, _g = run_unphase([str(cfa)], specs, str(tmp_path / "out"))
    seqs = [r for r in results if not r.redundant]
    assert len(seqs) == 1
    s = "".join("ACGTN"[b] for b in seqs[0].seq)
    # scaffold = contig1 + N gap + contig2 (either orientation)
    assert len(s) > 5500
    assert "N" in s
    left, right = s.split("N")[0], s.rstrip("N").split("N")[-1]
    ok_fwd = contigs[0].endswith(left[-500:]) or contigs[1].startswith(right[:500])
    s_rc = simdata.rc(s.replace("N", "A")).replace("A", "", 0)
    assert ok_fwd or (contigs[1][:500] in s) or (simdata.rc(contigs[0])[:500] in s)
    # gap estimate within tolerance of true 200
    n_run = s.count("N")
    assert 50 <= n_run <= 400


def test_unphase_joins_overlapping_contigs(rng, tmp_path):
    genome = simdata.random_genome(rng, 4000)
    contigs = [genome[:2050], genome[2000:]]  # 50bp exact overlap
    cfa = tmp_path / "c.fa"
    with open(cfa, "w") as f:
        for i, c in enumerate(contigs):
            f.write(f">seq{i+1}_len{len(c)}_cov40_read100_maxK50\n{c}\n")
    fwd, rev = simdata.paired_reads(rng, genome, read_len=100, insert=400,
                                    sd=40, coverage=25.0)
    f1, f2 = tmp_path / "1.fa", tmp_path / "2.fa"
    simdata.write_fasta(f1, fwd)
    simdata.write_fasta(f2, rev)
    from platanus_b_tpu.commands.libparse import extract_library_args
    _rest, specs = extract_library_args(["-IP1", str(f1), str(f2)])
    results, _g = run_unphase([str(cfa)], specs, str(tmp_path / "out"),
                              reduce_redundancy=True)
    seqs = [r for r in results if not r.redundant]
    assert len(seqs) == 1
    s = "".join("ACGTN"[b] for b in seqs[0].seq)
    assert s == genome or s == simdata.rc(genome)


def test_detect_repeat_flags_high_coverage(rng):
    seqs = [simdata.random_genome(rng, 500) for _ in range(3)]
    g, _ = _graph(seqs, covs=np.array([40.0, 40.0, 200.0]))
    g.detect_repeat(g.average_coverage)
    from platanus_b_tpu.models.scaffold import SC_REP
    assert g.node[2].state & SC_REP
    assert not (g.node[0].state & SC_REP)
