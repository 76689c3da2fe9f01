"""merge and kmer_divide CLI flows."""

import numpy as np
import simdata

from platanus_b_tpu.commands.main import main as cli_main
from platanus_b_tpu.io.fasta import iter_fasta


def _write_contigs(path, pieces, cov=40, read=100, maxk=50):
    with open(path, "w") as f:
        for i, c in enumerate(pieces):
            f.write(f">seq{i+1}_len{len(c)}_cov{cov}_read{read}_maxK{maxk}\n{c}\n")


def test_merge_joins_overlapping_contig_sets(rng, tmp_path):
    genome = simdata.random_genome(rng, 3000)
    # two contig sets with substantial overlaps; merge k = 1.0*read = 100
    set1 = [genome[:1800]]
    set2 = [genome[1500:]]
    f1, f2 = tmp_path / "a.fa", tmp_path / "b.fa"
    _write_contigs(f1, set1)
    _write_contigs(f2, set2)
    rc = cli_main(["merge", "-o", str(tmp_path / "m"), "-f", str(f1), str(f2)])
    assert rc == 0
    recs = list(iter_fasta(str(tmp_path / "m_merged.fa")))
    seqs = [s for _n, s in recs]
    longest = max(seqs, key=len)
    assert longest == genome or longest == simdata.rc(genome)


def test_kmer_divide_breaks_chimera(rng, tmp_path):
    # genome A reads -> k-mer occ table; chimeric contig A1+junk+A2
    ga = simdata.random_genome(rng, 4000)
    reads = simdata.shotgun_reads(rng, ga, 100, 40.0)
    rfa = tmp_path / "reads.fa"
    simdata.write_fasta(rfa, reads)
    rc = cli_main(["assemble", "-o", str(tmp_path / "occ"), "-f", str(rfa),
                   "-k", "32", "-kmer_occ_only"])
    assert rc == 0

    junk = simdata.random_genome(rng, 300)
    chimera = ga[:2000] + junk + ga[2000:]
    cfa = tmp_path / "c.fa"
    _write_contigs(cfa, [chimera])
    rc = cli_main(["kmer_divide", "-o", str(tmp_path / "d"),
                   "-f", str(cfa), "-k", str(tmp_path / "occ_kmer_occ.bin")])
    assert rc == 0
    recs = list(iter_fasta(str(tmp_path / "d_kmerDivided.fa")))
    seqs = [s for _n, s in recs]
    assert len(seqs) >= 2
    # junk must be gone; pieces must be genuine genome substrings
    for s in seqs:
        assert junk not in s
        assert s in ga or simdata.rc(s) in ga or len(s) < 64


def test_kmer_divide_keeps_clean_contig(rng, tmp_path):
    ga = simdata.random_genome(rng, 3000)
    reads = simdata.shotgun_reads(rng, ga, 100, 40.0)
    rfa = tmp_path / "reads.fa"
    simdata.write_fasta(rfa, reads)
    cli_main(["assemble", "-o", str(tmp_path / "occ"), "-f", str(rfa),
              "-k", "32", "-kmer_occ_only"])
    cfa = tmp_path / "c.fa"
    _write_contigs(cfa, [ga])
    cli_main(["kmer_divide", "-o", str(tmp_path / "d"), "-f", str(cfa),
              "-k", str(tmp_path / "occ_kmer_occ.bin")])
    recs = list(iter_fasta(str(tmp_path / "d_kmerDivided.fa")))
    assert len(recs) == 1
    # contig ends may be trimmed (shotgun coverage drops below r*median at
    # the very edges, as in the reference), but the body must survive intact
    assert recs[0][1] in ga
    assert len(recs[0][1]) >= len(ga) - 60
