"""Mapper: seed-vote-extend semantics + pair mapping + insert-size stats."""

import numpy as np
import pytest
import simdata

from platanus_b_tpu.io.fasta import seq_to_codes
from platanus_b_tpu.io.reads import pack_reads
from platanus_b_tpu.models import seqlib
from platanus_b_tpu.models.mapper import ContigIndex, map_reads, map_reads_ungap


def _index_from_seqs(seqs, key_length=32):
    return ContigIndex([seq_to_codes(s) for s in seqs], key_length=key_length)


def test_map_reads_exact_forward_and_reverse(rng):
    genome = simdata.random_genome(rng, 4000)
    contigs = [genome[:2500], genome[2500:]]
    idx = _index_from_seqs(contigs)

    reads, truth = [], []
    for _ in range(60):
        c = int(rng.integers(0, 2))
        start = int(rng.integers(0, len(contigs[c]) - 100))
        r = contigs[c][start:start + 100]
        if rng.random() < 0.5:
            reads.append(r)
            truth.append((c + 1, start))
        else:
            reads.append(simdata.rc(r))
            # reverse mapping offset = contig position of read base 0 =
            # start + len - 1 in reference convention
            truth.append((-(c + 1), start + 100 - 1))
    batch = pack_reads(reads)
    ids, offs = map_reads(idx, batch.codes, batch.lengths)
    n_ok = sum(1 for i, (tid, toff) in enumerate(truth)
               if ids[i] == tid and offs[i] == toff)
    assert n_ok == len(truth)


def test_map_reads_unmapped_on_repeat(rng):
    unit = simdata.random_genome(rng, 200)
    genome = unit + simdata.random_genome(rng, 500) + unit
    idx = _index_from_seqs([genome])
    # a read entirely inside the repeated unit maps ambiguously -> unmapped
    read = unit[50:150]
    batch = pack_reads([read])
    ids, offs = map_reads(idx, batch.codes, batch.lengths)
    assert ids[0] == 0


def test_map_reads_with_mismatch_still_votes(rng):
    genome = simdata.random_genome(rng, 3000)
    idx = _index_from_seqs([genome])
    start = 1000
    read = list(genome[start:start + 96])
    read[40] = "A" if read[40] != "A" else "C"  # one mismatch mid-read
    batch = pack_reads(["".join(read)])
    ids, offs = map_reads(idx, batch.codes, batch.lengths)
    # seeds not covering position 40 still agree on (1, start)
    assert ids[0] == 1 and offs[0] == start


def test_map_pairs_and_insert_size(rng):
    genome = simdata.random_genome(rng, 8000)
    idx = _index_from_seqs([genome])
    fwd, rev = simdata.paired_reads(rng, genome, read_len=100, insert=400,
                                    sd=30, coverage=20.0)
    fb, rb = pack_reads(fwd), pack_reads(rev)
    lib = seqlib.PairLibrary(fb.codes, fb.lengths, rb.codes, rb.lengths)
    mp = seqlib.map_pairs(idx, lib)
    assert len(mp.insert_lengths) > len(fwd) * 0.5
    dist = seqlib.insert_distribution(mp.insert_lengths)
    avg, sd = seqlib.estimate_ins_size(dist)
    assert abs(avg - 400) < 25
    assert 0 < sd < 80


def test_map_pairs_cross_contig_links(rng):
    genome = simdata.random_genome(rng, 6000)
    contigs = [genome[:3000], genome[3000:]]
    idx = _index_from_seqs(contigs)
    fwd, rev = simdata.paired_reads(rng, genome, read_len=100, insert=500,
                                    sd=40, coverage=15.0)
    fb, rb = pack_reads(fwd), pack_reads(rev)
    lib = seqlib.PairLibrary(fb.codes, fb.lengths, rb.codes, rb.lengths)
    mp = seqlib.map_pairs(idx, lib)
    # pairs straddling position 3000 produce cross-contig link records
    assert len(mp.link_fwd_id) > 0
    assert np.all(np.abs(mp.link_fwd_id) != np.abs(mp.link_rev_id))


def test_ungap_mapping_identity(rng):
    genome = simdata.random_genome(rng, 3000)
    idx = _index_from_seqs([genome])
    start = 700
    read = list(genome[start:start + 100])
    for p in (10, 55):  # 2 mismatches -> identity 0.98
        read[p] = "A" if read[p] != "A" else "C"
    batch = pack_reads(["".join(read)])
    ids, offs, ident = map_reads_ungap(idx, batch.codes, batch.lengths,
                                       min_identity=0.95)
    assert ids[0] == 1 and offs[0] == start
    assert abs(ident[0] - 0.98) < 1e-6


def test_ungap_rejects_low_identity(rng):
    genome = simdata.random_genome(rng, 3000)
    idx = _index_from_seqs([genome])
    start = 700
    read = list(genome[start:start + 100])
    # seed region [68, 100) intact; mutate 8 bases elsewhere -> identity 0.92
    for p in range(8):
        q = 2 + p * 8
        read[q] = "A" if read[q] != "A" else "C"
    batch = pack_reads(["".join(read)])
    ids, offs, ident = map_reads_ungap(idx, batch.codes, batch.lengths,
                                       min_identity=0.97)
    assert ids[0] == 0


def test_find_distribution_peak():
    dist = np.zeros(1000, dtype=np.int64)
    x = np.arange(1000)
    dist += np.maximum(0, 500 - np.abs(x - 420) * 5).astype(np.int64)
    assert abs(seqlib.find_distribution_peak(dist) - 420) <= 2


def test_map_reads_multi_reports_all_positions(rng):
    """mapReadMultiReportsMultiSeed (mapper.cpp:415-536): a read present
    in two contigs reports both positions."""
    import simdata
    from platanus_b_tpu.io.fasta import seq_to_codes
    from platanus_b_tpu.models.mapper import ContigIndex, map_reads_multi

    shared = simdata.random_genome(rng, 300)
    c1 = seq_to_codes(simdata.random_genome(rng, 200) + shared)
    c2 = seq_to_codes(shared + simdata.random_genome(rng, 250))
    index = ContigIndex([c1, c2], key_length=32)
    read = seq_to_codes(shared[100:200])
    codes = read[None, :].copy()
    lens = np.array([100], np.int32)
    ridx, ids, offs = map_reads_multi(index, codes, lens, (32,))
    got = {(int(i), int(o)) for i, o in zip(ids, offs)}
    assert (1, 300) in got   # inside c1 (200 + 100)
    assert (2, 100) in got   # inside c2
    assert (ridx == 0).all()
