"""Combinatorial gap close, redundancy removal, solve_dbg long reads/combine."""

import numpy as np
import simdata

from platanus_b_tpu.io.fasta import seq_to_codes
from platanus_b_tpu.models import combinatorial as comb


def test_extract_gap_flanks(rng):
    g = simdata.random_genome(rng, 3000)
    s = seq_to_codes(g[:1400] + "N" * 100 + g[1500:])
    flanks = comb.extract_gap_flanks([s], ["x"], 500)
    assert len(flanks) == 2
    names = sorted(n.rsplit(";", 1)[1] for n, _ in flanks)
    assert names == ["L", "R"]
    ln, ls = [f for f in flanks if f[0].endswith(";L")][0]
    assert "".join("ACGTN"[b] for b in ls) == g[900:1400]


def test_combinatorial_gap_close_fills_gap(rng):
    genome = simdata.random_genome(rng, 30000)
    base = seq_to_codes(genome[:14000] + "N" * 500 + genome[14800:])
    compl = seq_to_codes(genome[9000:21000])  # spans the gap region
    closed, n = comb.combinatorial_gap_close(
        [base], ["base1_len30000"], [compl], ["comp1"],
        flank_lengths=(500, 1000, 5000))
    assert n >= 1
    s = "".join("ACGTN"[b] for b in closed[0])
    assert "N" not in s
    assert s == genome


def test_remove_redundant(rng):
    genome = simdata.random_genome(rng, 20000)
    full = seq_to_codes(genome)
    contained = seq_to_codes(genome[4000:12000])
    other = seq_to_codes(simdata.random_genome(rng, 9000))
    red = comb.remove_redundant([full, contained, other],
                                ["full", "contained", "other"])
    assert red == [False, True, False]


def test_solve_dbg_long_reads_scaffold(rng, tmp_path):
    genome = simdata.random_genome(rng, 24000)
    contigs = [genome[:7500], genome[8500:15500], genome[16500:]]
    cfa = tmp_path / "c.fa"
    with open(cfa, "w") as f:
        for i, c in enumerate(contigs):
            f.write(f">seq{i+1}_len{len(c)}_cov40_read100_maxK50\n{c}\n")
    # only long reads, no PE: long-read links must scaffold the contigs
    lreads = simdata.long_reads(rng, genome, mean_len=6000, coverage=15.0,
                                error_rate=0.03)
    lfa = tmp_path / "lr.fa"
    simdata.write_fasta(lfa, lreads, prefix="lr")

    from platanus_b_tpu.commands.main import main as cli_main
    rc = cli_main(["solve_dbg", "-unphase", "-reduce_redundancy",
                   "-o", str(tmp_path / "out"), "-c", str(cfa),
                   "-ont", str(lfa)])
    assert rc == 0
    from platanus_b_tpu.io.fasta import iter_fasta
    recs = list(iter_fasta(str(tmp_path / "out_consensusScaffold.fa")))
    lens = sorted((len(s) for _n, s in recs), reverse=True)
    assert lens[0] > 20000  # three contigs united


def test_solve_dbg_combine(rng, tmp_path):
    genome = simdata.random_genome(rng, 60000)
    # assembly: two pieces with a junction missing
    contigs = [genome[:29000], genome[30000:]]
    cfa = tmp_path / "c.fa"
    with open(cfa, "w") as f:
        for i, c in enumerate(contigs):
            f.write(f">seq{i+1}_len{len(c)}_cov40_read100_maxK50\n{c}\n")
    # guide assembly covers the junction
    gfa = tmp_path / "g.fa"
    with open(gfa, "w") as f:
        f.write(f">g1_len40000_cov40\n{genome[10000:50000]}\n")
    from platanus_b_tpu.commands.main import main as cli_main
    rc = cli_main(["solve_dbg", "-combine", "-o", str(tmp_path / "out"),
                   "-c", str(cfa), "-gc", str(gfa)])
    assert rc == 0
    from platanus_b_tpu.io.fasta import iter_fasta
    recs = list(iter_fasta(str(tmp_path / "out_combined.fa")))
    lens = sorted((len(s) for _n, s in recs), reverse=True)
    assert lens[0] > 55000  # two pieces combined across the junction
