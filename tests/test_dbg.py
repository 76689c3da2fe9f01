"""DBG construction, unitig labeling, and cleaning on synthetic genomes."""

import numpy as np
import pytest

from platanus_b_tpu.io.reads import pack_reads
from platanus_b_tpu.models import clean
from platanus_b_tpu.models.dbg import DBG
from platanus_b_tpu.ops import count as cnt

BASES = "ACGT"
COMP = str.maketrans("ACGT", "TGCA")


def rc(s):
    return s.translate(COMP)[::-1]


def random_genome(rng, n):
    return "".join(rng.choice(list(BASES), size=n))


def reads_from(genome, read_len, step, circular=False):
    g = genome + genome[:read_len] if circular else genome
    out = [g[i:i + read_len] for i in range(0, len(g) - read_len + 1, step)]
    return out


def build_dbg(seqs, k, cutoff=0):
    batch = pack_reads(seqs)
    keys, counts, n = cnt.count_batch(batch.codes, k)
    keys_h, counts_h = cnt.compact_host(keys, counts, n)
    keep = counts_h > cutoff
    return DBG(k, keys_h[keep], counts_h[keep])


def unitig_strings(dbg):
    seqs, lens = dbg.unitig_sequences()
    out = []
    for i in range(len(lens)):
        s = "".join(BASES[c] for c in seqs[i, : lens[i]])
        out.append(min(s, rc(s)))
    return sorted(out)


def canon(s):
    return min(s, rc(s))


def test_single_unitig_linear_genome(rng):
    k = 15
    genome = random_genome(rng, 300)
    dbg = build_dbg(reads_from(genome, 60, 1), k)
    u = dbg.label_unitigs()
    # a random 300bp genome at k=15 is almost surely repeat-free
    assert u.num_unitigs == 1
    assert u.ulen[0] == 300 - k + 1
    assert unitig_strings(dbg) == [canon(genome)]


def test_coverage_average(rng):
    k = 15
    genome = random_genome(rng, 200)
    dbg = build_dbg(reads_from(genome, 50, 1), k)
    u = dbg.label_unitigs()
    # interior k-mers occur in ~read_len-k+1 windows; average is ~36
    assert 20 <= u.ucov[0] <= 36


def test_circular_genome(rng):
    k = 15
    genome = random_genome(rng, 250)
    dbg = build_dbg(reads_from(genome, 60, 1, circular=True), k)
    u = dbg.label_unitigs()
    # circular chain is broken at one point -> one unitig with all k-mers
    assert u.num_unitigs == 1
    assert u.ulen[0] == 250


def test_junction_detection(rng):
    k = 15
    # two genomes sharing a middle segment -> X structure with junctions
    shared = random_genome(rng, 80)
    a1, a2 = random_genome(rng, 80), random_genome(rng, 80)
    b1, b2 = random_genome(rng, 80), random_genome(rng, 80)
    # force the divergence to sit exactly at the shared-segment boundary
    # (matching flank boundary bases would shift the junction k-mer)
    a1, b1 = a1[:-1] + "A", b1[:-1] + "C"
    a2, b2 = "A" + a2[1:], "C" + b2[1:]
    g1 = a1 + shared + a2
    g2 = b1 + shared + b2
    dbg = build_dbg(reads_from(g1, 60, 1) + reads_from(g2, 60, 1), k)
    u = dbg.label_unitigs()
    ji, jc = dbg.junction_info()
    # shared segment forms its own unitig; 4 flanks + 1 shared = 5 unitigs
    assert u.num_unitigs == 5
    assert len(ji) == 2
    # the boundary k-mers of the shared segment are junction nodes (two
    # predecessors / two successors), so the shared unitig is trimmed by one
    # k-mer (= one base) on each side
    assert canon(shared[1:-1]) in unitig_strings(dbg)


def test_cut_branch_removes_low_coverage_tip(rng):
    k = 15
    genome = random_genome(rng, 300)
    good = reads_from(genome, 60, 1)
    # an erroneous tip: branches off position 100, 20bp of junk, low cov
    tip = genome[80:100] + random_genome(rng, 10)
    bad = [tip, tip]
    dbg = build_dbg(good + bad, k)
    u0 = dbg.label_unitigs()
    assert u0.num_unitigs > 1
    n = clean.cut_branch_iterative(dbg, branch_threshold=0.5)
    assert n >= 1
    u1 = dbg.label_unitigs()
    assert u1.num_unitigs == 1
    assert unitig_strings(dbg) == [canon(genome)]


def test_delete_erroneous(rng):
    k = 15
    genome = random_genome(rng, 200)
    junk = random_genome(rng, 40)  # disconnected low-coverage noise
    dbg = build_dbg(reads_from(genome, 60, 1) + [junk], k)
    assert dbg.label_unitigs().num_unitigs == 2
    n = clean.delete_erroneous_iterative(dbg, length_cut=2 * k, coverage_cut=2)
    assert n == 1
    assert unitig_strings(dbg) == [canon(genome)]


def test_crush_bubble(rng):
    k = 15
    left = random_genome(rng, 100)
    mid = random_genome(rng, 40)
    right = random_genome(rng, 100)
    # SNP bubble: one base differs in the middle
    mid2 = mid[:20] + ("A" if mid[20] != "A" else "C") + mid[21:]
    g_major = left + mid + right
    g_minor = left + mid2 + right
    reads = reads_from(g_major, 60, 1) * 3 + reads_from(g_minor, 60, 1)
    dbg = build_dbg(reads, k)
    assert dbg.label_unitigs().num_unitigs == 4  # left, right, 2 bubble arms
    crushed = []
    n = clean.crush_bubble_iterative(dbg, average_coverage=200.0,
                                     bubble_threshold=0.1, crushed=crushed)
    assert n == 1
    assert len(crushed) == 1
    u = dbg.label_unitigs()
    assert u.num_unitigs == 1
    assert unitig_strings(dbg) == [canon(g_major)]


def test_edit_distance_batch_oracle(rng):
    from platanus_b_tpu.ops.align import edit_distance_batch, edit_distance_np
    P, La, Lb = 20, 30, 25
    a = rng.integers(0, 4, size=(P, La)).astype(np.uint8)
    b = rng.integers(0, 4, size=(P, Lb)).astype(np.uint8)
    la = rng.integers(1, La + 1, size=P).astype(np.int32)
    lb = rng.integers(1, Lb + 1, size=P).astype(np.int32)
    got = np.asarray(edit_distance_batch(a, la, b, lb))
    for i in range(P):
        assert got[i] == edit_distance_np(a[i, : la[i]], b[i, : lb[i]])


def test_divide_straight_node(rng):
    """divideStraightNode (graph.h:1150-1372) at node level: k-mer nodes
    not covered by any fully-mapping read are deleted, cutting/trimming
    unitigs."""
    import simdata
    from platanus_b_tpu.io.fasta import seq_to_codes
    from platanus_b_tpu.io.reads import ReadBatch
    from platanus_b_tpu.models.assemble_core import (count_reads,
                                                     divide_straight_node)
    from platanus_b_tpu.models.dbg import DBG

    k = 21
    genome = simdata.random_genome(rng, 600)
    # table from the full genome (one long unitig)
    full = seq_to_codes(genome)
    batch_full = ReadBatch(full[None, :].copy(),
                           np.array([len(full)], np.int32))
    table, _ = count_reads([batch_full], k)
    dbg = DBG(k, table.keys, table.counts)
    before = dbg.num_alive()
    u0 = dbg.label_unitigs()
    assert u0.num_unitigs == 1

    # reads cover only [0,250) and [350,600): the middle is uncovered
    reads = []
    for lo, hi in ((0, 250), (350, 600)):
        for st in range(lo, hi - 60, 20):
            reads.append(seq_to_codes(genome[st: st + 60]))
    mat = np.full((len(reads), 60), 4, np.uint8)
    for i, r in enumerate(reads):
        mat[i, : len(r)] = r
    rb = ReadBatch(mat, np.full(len(reads), 60, np.int32))

    n_kill = divide_straight_node(dbg, [rb])
    assert n_kill > 0
    assert dbg.num_alive() < before
    u1 = dbg.label_unitigs()
    assert u1.num_unitigs == 2   # cut at the uncovered middle


def test_average_coverage_excludes_bubbles(rng):
    """getAverageCoverageExcludingBubble (graph.h:2375-2431): a SNP
    bubble's branch unitigs do not skew the average."""
    import simdata
    from platanus_b_tpu.io.fasta import seq_to_codes
    from platanus_b_tpu.io.reads import ReadBatch
    from platanus_b_tpu.models.assemble_core import count_reads
    from platanus_b_tpu.models.clean import (_bubble_unitig_mask,
                                             average_coverage_excluding_bubble)
    from platanus_b_tpu.models.dbg import DBG

    k = 21
    genome = simdata.random_genome(rng, 800)
    variant = genome[:400] + ("A" if genome[400] != "A" else "C") \
        + genome[401:]

    def batch(s, copies):
        codes = seq_to_codes(s)
        mat = np.tile(codes, (copies, 1))
        return ReadBatch(mat, np.full(copies, len(codes), np.int32))

    # 10 copies of hap1, 10 of hap2 -> shared arms at 20x, branches at 10x
    table, _ = count_reads([batch(genome, 10), batch(variant, 10)], k)
    dbg = DBG(k, table.keys, table.counts)
    u = dbg.label_unitigs()
    bubble = _bubble_unitig_mask(dbg, u)
    assert bubble.sum() == 2    # the two SNP branches
    avg = average_coverage_excluding_bubble(dbg)
    assert avg > 15             # near 20x, not dragged toward 10x
