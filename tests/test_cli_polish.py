"""End-to-end polish CLI on simulated data (CPU)."""

import os

import numpy as np
import simdata

from platanus_b_tpu.commands.main import main as cli_main
from platanus_b_tpu.io.fasta import iter_fasta


def test_polish_cli_roundtrip(rng, tmp_path):
    genome = simdata.random_genome(rng, 3000)
    fwd, rev = simdata.paired_reads(rng, genome, read_len=100, insert=400,
                                    sd=30, coverage=30.0)
    f1 = tmp_path / "r1.fa"
    f2 = tmp_path / "r2.fa"
    simdata.write_fasta(f1, fwd)
    simdata.write_fasta(f2, rev)
    cfa = tmp_path / "out_contig.fa"
    with open(cfa, "w") as f:
        f.write(f">seq1_len{len(genome)}_cov40_read100_maxK50\n{genome}\n")

    prefix = str(tmp_path / "out")
    rc = cli_main(["polish", "-o", prefix, "-c", str(cfa),
                   "-IP1", str(f1), str(f2)])
    assert rc == 0
    outs = [p for p in os.listdir(tmp_path) if "_polished_" in p]
    assert len(outs) == 1
    recs = list(iter_fasta(str(tmp_path / outs[0])))
    assert len(recs) == 1
    name, seq = recs[0]
    assert seq == genome
    assert "_cov40" in name and "_read100" in name


def test_polish_cli_errors(tmp_path):
    rc = cli_main(["polish", "-o", str(tmp_path / "x")])
    assert rc != 0
