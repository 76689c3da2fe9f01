"""Gap close: gap table, DBG/OLC closers, end-to-end CLI."""

import numpy as np
import simdata

from platanus_b_tpu.commands.main import main as cli_main
from platanus_b_tpu.io.fasta import iter_fasta, seq_to_codes
from platanus_b_tpu.models import gap_close as gc


def test_make_gap_table(rng):
    s = seq_to_codes("ACGT" * 50 + "N" * 30 + "TGCA" * 50)
    gaps = gc.make_gap_table([s])
    assert len(gaps) == 1
    g = gaps[0]
    assert g.start == 200 and g.end == 230
    assert len(g.head) == 150 and len(g.tail) == 150
    assert not (g.head == 4).any() and not (g.tail == 4).any()


def test_dbg_close_gap_exact(rng):
    genome = simdata.random_genome(rng, 800)
    gap_start, gap_end = 380, 420
    scaffold = genome[:gap_start] + "N" * (gap_end - gap_start) + genome[gap_end:]
    s = seq_to_codes(scaffold)
    gaps = gc.make_gap_table([s])
    g = gaps[0]
    # reads tiling the gap region, forward orientation
    for st in range(gap_start - 140, gap_end + 40, 7):
        g.reads.append(seq_to_codes(genome[st:st + 100]))
    ok = gc.dbg_close_gap(g)
    assert ok and g.state == gc.CLOSED
    closed = gc.generate_gap_closed_seqs([s], [g])[0]
    assert "".join("ACGTN"[b] for b in closed) == genome


def test_olc_close_gap(rng):
    genome = simdata.random_genome(rng, 700)
    gap_start, gap_end = 330, 360
    scaffold = genome[:gap_start] + "N" * 30 + genome[gap_end:]
    s = seq_to_codes(scaffold)
    g = gc.make_gap_table([s])[0]
    # few reads (not enough k-mer coverage for DBG min_cov=2 everywhere)
    for st in (250, 280, 310, 335):
        g.reads.append(seq_to_codes(genome[st:st + 100]))
    ok = gc.olc_close_gap(g)
    assert ok and g.state == gc.CLOSED
    closed = gc.generate_gap_closed_seqs([s], [g])[0]
    assert "".join("ACGTN"[b] for b in closed) == genome


def test_gap_close_cli_e2e(rng, tmp_path):
    genome = simdata.random_genome(rng, 5000)
    scaffold = genome[:2400] + "N" * 200 + genome[2600:]
    cfa = tmp_path / "scaf.fa"
    with open(cfa, "w") as f:
        f.write(f">scaffold1_len{len(scaffold)}_cov40_read100_maxK50\n{scaffold}\n")
    fwd, rev = simdata.paired_reads(rng, genome, read_len=100, insert=400,
                                    sd=30, coverage=40.0)
    f1, f2 = tmp_path / "1.fa", tmp_path / "2.fa"
    simdata.write_fasta(f1, fwd)
    simdata.write_fasta(f2, rev)
    rc = cli_main(["gap_close", "-o", str(tmp_path / "gc"), "-c", str(cfa),
                   "-IP1", str(f1), str(f2)])
    assert rc == 0
    outs = [p for p in tmp_path.iterdir() if "_gapClosed_" in p.name]
    assert len(outs) == 1
    recs = list(iter_fasta(str(outs[0])))
    assert len(recs) == 1
    seq = recs[0][1]
    # the 200bp gap must be fully closed with the true sequence
    assert "N" not in seq
    assert seq == genome


def test_map_small_gap_and_close(rng):
    """mapSmallGap (mapper.cpp:1039) + closeSmallGaps (gapClose.cpp:872,
    disabled at the reference call site): single reads spanning a small
    gap close it by consensus."""
    import simdata
    from platanus_b_tpu.io.fasta import seq_to_codes
    from platanus_b_tpu.models import gap_close as gc

    genome = simdata.random_genome(rng, 2000)
    true_fill = genome[900:950]   # 50bp gap
    scaf = seq_to_codes(genome[:900] + "N" * 50 + genome[950:])
    scaffolds = [scaf]
    gaps = gc.make_gap_table(scaffolds)
    assert len(gaps) == 1

    # single reads spanning the gap (150bp centered)
    reads = []
    for st in range(800, 880, 10):
        reads.append(seq_to_codes(genome[st: st + 200]))
    mat = np.full((len(reads), 200), 4, np.uint8)
    lens = np.zeros(len(reads), np.int32)
    for i, r in enumerate(reads):
        mat[i, : len(r)] = r
        lens[i] = len(r)
    records = gc.map_small_gap(scaffolds, mat, lens, seed_length=32)
    assert len(records) >= 4
    # every record's segment is the true fill
    for sid, off, seg, seg_len in records:
        assert sid == 1 and seg_len == 50
        assert "".join("ACGT"[b] for b in seg) == true_fill

    n = gc.close_small_gaps(gaps, scaffolds, records, consensus_rate=0.9)
    assert n == 1
    closed = gc.generate_gap_closed_seqs(scaffolds, gaps)
    assert "".join("ACGTN"[b] for b in closed[0]) == genome


def test_self_overlap_and_circular(rng):
    """selfOverlap / findCircularGapClosedSeq (gapClose.cpp:1169-1198,
    disabled at the reference call site)."""
    import simdata
    from platanus_b_tpu.io.fasta import seq_to_codes
    from platanus_b_tpu.models import gap_close as gc

    core = simdata.random_genome(rng, 800)
    circ = seq_to_codes(core + core[:150])   # 150bp self-overlap
    lin = seq_to_codes(simdata.random_genome(rng, 700))
    assert gc.self_overlap(circ) == 150
    assert gc.self_overlap(lin) == 0
    seqs = [circ, lin]
    flags = gc.find_circular_seqs(seqs)
    assert flags == [True, False]
    assert len(seqs[0]) == 800 and len(seqs[1]) == 700
