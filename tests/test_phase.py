"""Phasing: solve_dbg default flow classification + phase pipeline."""

import os

import numpy as np
import simdata

from platanus_b_tpu.commands.main import main as cli_main
from platanus_b_tpu.io.fasta import iter_fasta, seq_to_codes
from platanus_b_tpu.models.phasing import classify_phase_blocks
from platanus_b_tpu.models.scaffold import ResultSeq


def _res(seq_str, cov, i):
    return ResultSeq(seq=seq_to_codes(seq_str),
                     name=f"scaffold{i}_len{len(seq_str)}_cov{cov}"
                          f"_read100_maxK32",
                     component="")


def test_classify_phase_blocks_pairs_haplotypes(rng):
    homo = simdata.random_genome(rng, 30000)
    hap1 = simdata.random_genome(rng, 15000)
    hap2 = simdata.mutate(rng, hap1, 0.003)
    results = [_res(homo, 40, 1), _res(hap1, 21, 2), _res(hap2, 19, 3)]
    pairs, hetero, other, blocks = classify_phase_blocks(results, [], 30.0)
    assert len(pairs) == 1
    p, s = pairs[0]
    assert blocks[p].coverage == 21 and blocks[s].coverage == 19
    assert len(other) == 1 and blocks[other[0]].coverage == 40
    assert not hetero


def test_classify_phase_blocks_input_bubbles(rng):
    homo = simdata.random_genome(rng, 20000)
    prim = simdata.random_genome(rng, 8000)
    bub = simdata.mutate(rng, prim[2000:6000], 0.003)
    results = [_res(homo, 40, 1), _res(prim, 38, 2)]
    bubbles = [(20.0, seq_to_codes(bub))]
    pairs, hetero, other, blocks = classify_phase_blocks(results, bubbles,
                                                         39.0)
    # the -b bubble pairs with the containing primary sequence
    assert len(pairs) == 1
    p, s = pairs[0]
    assert blocks[s].is_bubble_input
    assert blocks[p].coverage == 38
    assert len(other) == 1


def test_solve_dbg_default_writes_phase_outputs(rng, tmp_path):
    homo = simdata.random_genome(rng, 25000)
    hap1 = simdata.random_genome(rng, 12000)
    hap2 = simdata.mutate(rng, hap1, 0.003)
    cfa = tmp_path / "c.fa"
    with open(cfa, "w") as f:
        f.write(f">seq1_len{len(homo)}_cov40_read100_maxK50\n{homo}\n")
        f.write(f">seq2_len{len(hap1)}_cov21_read100_maxK50\n{hap1}\n")
        f.write(f">seq3_len{len(hap2)}_cov19_read100_maxK50\n{hap2}\n")
    out = str(tmp_path / "out")
    rc = cli_main(["solve_dbg", "-c", str(cfa), "-o", out])
    assert rc == 0
    for suffix in ("_primaryBubble.fa", "_secondaryBubble.fa",
                   "_nonBubbleHetero.fa", "_nonBubbleOther.fa",
                   "_bubbleRelation.tsv", "_phasedScaffoldComponent.bed"):
        assert os.path.exists(out + suffix), suffix
    prim = list(iter_fasta(out + "_primaryBubble.fa"))
    sec = list(iter_fasta(out + "_secondaryBubble.fa"))
    assert len(prim) == 1 and len(sec) == 1
    assert prim[0][0].startswith("primary_bubble1_len")
    assert sec[0][0].startswith("secondary_bubble1_len")
    rel = open(out + "_bubbleRelation.tsv").read().strip().split("\t")
    assert rel[0] == prim[0][0] and rel[1] == sec[0][0]
    other = list(iter_fasta(out + "_nonBubbleOther.fa"))
    assert len(other) == 1 and len(other[0][1]) == len(homo)


def test_phase_pipeline(rng, tmp_path):
    # diploid: one homozygous stretch + a heterozygous region
    homo = simdata.random_genome(rng, 16000)
    het1 = simdata.random_genome(rng, 8000)
    het2 = simdata.mutate(rng, het1, 0.004)
    cfa = tmp_path / "c.fa"
    with open(cfa, "w") as f:
        f.write(f">seq1_len{len(homo)}_cov40_read100_maxK50\n{homo}\n")
        f.write(f">seq2_len{len(het1)}_cov20_read100_maxK50\n{het1}\n")
        f.write(f">seq3_len{len(het2)}_cov20_read100_maxK50\n{het2}\n")
    fwd, rev = simdata.paired_reads(rng, homo + het1, 100, 300, 30, 30.0)
    f2, r2 = simdata.paired_reads(rng, homo + het2, 100, 300, 30, 30.0)
    ffa, rfa = tmp_path / "f.fa", tmp_path / "r.fa"
    simdata.write_fasta(ffa, fwd + f2, prefix="f")
    simdata.write_fasta(rfa, rev + r2, prefix="r")

    os.chdir(tmp_path)
    rc = cli_main(["phase", "-o", "ph", "-i", "1", "-c", str(cfa),
                   "-IP1", str(ffa), str(rfa)])
    assert rc == 0
    for out in ("ph_allPhaseBlock.fa", "ph_primaryBubble.fa",
                "ph_secondaryBubble.fa", "ph_nonBubbleHetero.fa",
                "ph_nonBubbleHomoCandidate.fa"):
        assert os.path.exists(out), out
    all_blocks = list(iter_fasta("ph_allPhaseBlock.fa"))
    assert sum(len(s) for _n, s in all_blocks) > 20000
