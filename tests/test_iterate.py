"""End-to-end iterate pipeline on a small simulated genome (CPU)."""

import os

import numpy as np
import simdata

from platanus_b_tpu.commands.main import main as cli_main
from platanus_b_tpu.io.fasta import iter_fasta


def test_iterate_e2e(rng, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    genome = simdata.random_genome(rng, 8000)
    # fragmented starting contigs with gaps between them
    contigs = [genome[0:2500], genome[2700:5200], genome[5400:8000]]
    with open("start_contig.fa", "w") as f:
        for i, c in enumerate(contigs):
            f.write(f">seq{i+1}_len{len(c)}_cov40_read100_maxK32\n{c}\n")
    fwd, rev = simdata.paired_reads(rng, genome, read_len=100, insert=500,
                                    sd=50, coverage=40.0, error_rate=0.002)
    simdata.write_fasta("r1.fa", fwd)
    simdata.write_fasta("r2.fa", rev)

    rc = cli_main(["iterate", "-o", "it", "-c", "start_contig.fa",
                   "-i", "2", "-IP1", "r1.fa", "r2.fa"])
    assert rc == 0
    assert os.path.exists("it_iterativeAssembly.fa")
    recs = list(iter_fasta("it_iterativeAssembly.fa"))
    assert recs
    seqs = sorted((s for _n, s in recs), key=len, reverse=True)
    total = sum(len(s) for s in seqs)
    # the three fragments must be united into one near-complete sequence
    assert len(seqs[0]) > 7000
    assert total < 9500
    body = seqs[0].replace("N", " ")
    for part in body.split():
        if len(part) >= 100:
            assert part in genome or simdata.rc(part) in genome


def test_iterate_forwards_long_reads(rng, tmp_path, monkeypatch):
    """-p/-ont/-gc must reach the solve_dbg rounds with times >= i//2 and
    the final divide (iterate.cpp:359-368,418-426)."""
    monkeypatch.chdir(tmp_path)
    genome = simdata.random_genome(rng, 6000)
    contigs = [genome[0:2800], genome[3000:6000]]
    with open("start_contig.fa", "w") as f:
        for i, c in enumerate(contigs):
            f.write(f">seq{i+1}_len{len(c)}_cov40_read100_maxK32\n{c}\n")
    fwd, rev = simdata.paired_reads(rng, genome, read_len=100, insert=500,
                                    sd=50, coverage=40.0, error_rate=0.002)
    simdata.write_fasta("r1.fa", fwd)
    simdata.write_fasta("r2.fa", rev)
    longs = simdata.long_reads(rng, genome, mean_len=3000, coverage=6.0,
                               error_rate=0.02)
    simdata.write_fasta("lr.fa", longs)

    calls = []
    import platanus_b_tpu.commands.iterate_cmd as ic
    orig = ic._call

    def spy(argv, stage):
        calls.append((list(argv), stage))
        return orig(argv, stage)

    monkeypatch.setattr(ic, "_call", spy)
    rc = cli_main(["iterate", "-o", "it", "-c", "start_contig.fa",
                   "-i", "2", "-IP1", "r1.fa", "r2.fa", "-ont", "lr.fa"])
    assert rc == 0
    scaf_calls = [a for a, s in calls if a[0] == "solve_dbg"
                  and "-unphase" in a]
    assert len(scaf_calls) == 2
    # i=2: round 1 >= 2//2 -> BOTH rounds carry -ont here
    for a in scaf_calls:
        assert "-ont" in a and "lr.fa" in a
    div_calls = [a for a, s in calls if a[0] == "solve_dbg"
                 and "-divide_only" in a]
    assert len(div_calls) == 1 and "-ont" in div_calls[0]
