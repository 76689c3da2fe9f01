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
