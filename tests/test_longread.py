"""Long-read aligner: minimizers, chaining, PAF records."""

import numpy as np
import simdata

from platanus_b_tpu.io.fasta import seq_to_codes
from platanus_b_tpu.models.longread import (LongReadAligner,
                                            alignments_to_read_records)
from platanus_b_tpu.ops.minimizer import sketch


def test_minimizer_sketch_basic(rng):
    s = seq_to_codes(simdata.random_genome(rng, 500))
    mat = np.full((1, 512), 4, np.uint8)
    mat[0, :500] = s
    (h, pos, strand), = sketch(mat, np.array([500]), k=15, w=10)
    # density ~ 2/(w+1): expect roughly 90 minimizers for 486 windows
    assert 40 < len(h) < 180
    assert (np.diff(pos) > 0).all()
    assert (np.diff(pos) <= 10).all()  # winnowing guarantee


def test_minimizer_strand_symmetry(rng):
    g = simdata.random_genome(rng, 400)
    fwd = seq_to_codes(g)
    rev = seq_to_codes(simdata.rc(g))
    mat = np.full((2, 416), 4, np.uint8)
    mat[0, :400] = fwd
    mat[1, :400] = rev
    sk = sketch(mat, np.array([400, 400]), k=15, w=10)
    # canonical hashing: the two strands share most minimizer hashes
    h0, h1 = set(sk[0][0].tolist()), set(sk[1][0].tolist())
    inter = len(h0 & h1)
    assert inter / max(len(h0), 1) > 0.85


def test_align_exact_substring(rng):
    genome = simdata.random_genome(rng, 20000)
    aligner = LongReadAligner([seq_to_codes(genome)], ["t1"], "map-ont")
    read = genome[5000:8000]
    alns = aligner.align_batch([seq_to_codes(read)], ["r1"])
    assert alns
    best = max(alns, key=lambda a: a.score)
    assert best.strand == "+"
    assert abs(best.t_start - 5000) < 50
    assert abs(best.t_end - 8000) < 50
    assert best.identity > 0.5


def test_align_reverse_and_errors(rng):
    genome = simdata.random_genome(rng, 15000)
    aligner = LongReadAligner([seq_to_codes(genome)], ["t1"], "map-ont")
    read = simdata.mutate(rng, simdata.rc(genome[3000:7000]), 0.05)
    alns = aligner.align_batch([seq_to_codes(read)], ["r1"])
    assert alns
    best = max(alns, key=lambda a: a.score)
    assert best.strand == "-"
    assert abs(best.t_start - 3000) < 200
    assert abs(best.t_end - 7000) < 200


def test_no_alignment_on_unrelated(rng):
    g1 = simdata.random_genome(rng, 8000)
    g2 = simdata.random_genome(rng, 3000)
    aligner = LongReadAligner([seq_to_codes(g1)], ["t1"], "map-ont")
    alns = aligner.align_batch([seq_to_codes(g2)], ["r1"])
    assert len(alns) == 0


def test_read_records_reduction(rng):
    # read spanning two contigs -> two records after filtering
    genome = simdata.random_genome(rng, 12000)
    c1, c2 = genome[:6000], genome[6000:]
    aligner = LongReadAligner([seq_to_codes(c1), seq_to_codes(c2)],
                              ["c1", "c2"], "map-ont")
    read = genome[4000:9000]
    alns = aligner.align_batch([seq_to_codes(read)], ["r1"])
    recs = alignments_to_read_records(alns, {"c1": 0, "c2": 1},
                                      min_alignment_length=1000)
    assert "r1" in recs
    rl, rlist = recs["r1"]
    ids = sorted(abs(r.position_id) for r in rlist)
    assert ids == [1, 2]


def test_identity_is_measured_not_estimated(rng):
    """Base-level verification: matches reflect true error rate
    (verify_alignments_batched; VERDICT item 5)."""
    genome = simdata.random_genome(rng, 9000)
    aligner = LongReadAligner([seq_to_codes(genome)], ["t1"], "map-ont")
    # exact read -> identity ~ 1.0
    exact = genome[1000:6000]
    a0 = max(aligner.align_batch([seq_to_codes(exact)], ["r0"]),
             key=lambda a: a.score)
    assert a0.identity > 0.995
    # 5% mutated read -> identity measured near 0.95, NOT near the
    # anchor-estimate (which collapses toward anchor density)
    noisy = simdata.mutate(rng, exact, 0.05)
    alns = aligner.align_batch([seq_to_codes(noisy)], ["r1"])
    assert alns
    a1 = max(alns, key=lambda a: a.score)
    assert 0.88 <= a1.identity <= 0.975
    # reverse strand exact read also verifies cleanly
    a2 = max(aligner.align_batch([seq_to_codes(simdata.rc(exact))], ["r2"]),
             key=lambda a: a.score)
    assert a2.strand == "-" and a2.identity > 0.995


def test_zdrop_splits_at_divergent_region(rng):
    """A query whose middle third is unrelated sequence must NOT come out
    as one long low-identity block: the z-drop split breaks it at the
    divergent segments and each piece aligns at high identity
    (verify_alignments_batched; VERDICT r4 item 5)."""
    left = simdata.random_genome(rng, 4000)
    right = simdata.random_genome(rng, 4000)
    junk = simdata.random_genome(rng, 4000)
    target = left + junk + right
    aligner = LongReadAligner([seq_to_codes(target)], ["t1"], "map-ont")
    query = left + simdata.random_genome(rng, 4000) + right
    alns = aligner.align_batch([seq_to_codes(query)], ["rq"])
    assert alns
    # no alignment may span the divergent middle at low identity
    for a in alns:
        assert a.identity > 0.8, (a.q_start, a.q_end, a.identity)
    # both flanks recovered as separate pieces
    spans = sorted((a.q_start, a.q_end) for a in alns)
    assert any(e <= 4600 for s, e in spans)       # left-side piece
    assert any(s >= 7400 for s, e in spans)       # right-side piece
