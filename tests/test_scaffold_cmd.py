"""scaffold command + gap_close -extend paths."""

import numpy as np
import simdata

from platanus_b_tpu.commands.main import main as cli_main
from platanus_b_tpu.io.fasta import iter_fasta


def test_scaffold_cmd_e2e(rng, tmp_path):
    genome = simdata.random_genome(rng, 8000)
    contigs = [genome[:3900], genome[4100:]]
    cfa = tmp_path / "c.fa"
    with open(cfa, "w") as f:
        for i, c in enumerate(contigs):
            f.write(f">seq{i+1}_len{len(c)}_cov40_read100_maxK50\n{c}\n")
    fwd, rev = simdata.paired_reads(rng, genome, read_len=100, insert=500,
                                    sd=50, coverage=30.0)
    f1, f2 = tmp_path / "1.fa", tmp_path / "2.fa"
    simdata.write_fasta(f1, fwd)
    simdata.write_fasta(f2, rev)
    rc = cli_main(["scaffold", "-o", str(tmp_path / "out"), "-c", str(cfa),
                   "-IP1", str(f1), str(f2)])
    assert rc == 0
    recs = list(iter_fasta(str(tmp_path / "out_scaffold.fa")))
    lens = sorted((len(s) for _n, s in recs), reverse=True)
    assert lens[0] > 7500


def test_gap_close_extend_grows_edges(rng, tmp_path):
    genome = simdata.random_genome(rng, 6000)
    # scaffold misses 400bp at each end
    scaffold = genome[400:5600]
    cfa = tmp_path / "scaf.fa"
    with open(cfa, "w") as f:
        f.write(f">scaffold1_len{len(scaffold)}_cov40_read100_maxK50\n{scaffold}\n")
    fwd, rev = simdata.paired_reads(rng, genome, read_len=100, insert=400,
                                    sd=30, coverage=40.0)
    f1, f2 = tmp_path / "1.fa", tmp_path / "2.fa"
    simdata.write_fasta(f1, fwd)
    simdata.write_fasta(f2, rev)
    rc = cli_main(["gap_close", "-extend", "-o", str(tmp_path / "gcx"),
                   "-c", str(cfa), "-IP1", str(f1), str(f2)])
    assert rc == 0
    outs = [p for p in tmp_path.iterdir() if "_gapClosed_" in p.name]
    recs = list(iter_fasta(str(outs[0])))
    seq = recs[0][1]
    assert len(seq) > len(scaffold) + 200  # extended both ways
    assert seq in genome or simdata.rc(seq) in genome
