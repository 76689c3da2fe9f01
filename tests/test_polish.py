"""Polish: odd-read pileup masking + short-run masking + edge trim."""

import numpy as np
import simdata

from platanus_b_tpu.io.fasta import seq_to_codes
from platanus_b_tpu.io.reads import pack_reads
from platanus_b_tpu.models.polish import (PolishOptions, mask_short_runs,
                                          polish, trim_edge_n)
from platanus_b_tpu.models.seqlib import PairLibrary


def _lib(rng, genome, coverage=30.0, insert=400, read_len=100, err=0.0):
    fwd, rev = simdata.paired_reads(rng, genome, read_len=read_len,
                                    insert=insert, sd=30, coverage=coverage,
                                    error_rate=err)
    fb, rb = pack_reads(fwd), pack_reads(rev)
    return PairLibrary(fb.codes, fb.lengths, rb.codes, rb.lengths)


def test_polish_clean_assembly_unchanged(rng):
    genome = simdata.random_genome(rng, 4000)
    lib = _lib(rng, genome)
    contig = seq_to_codes(genome)
    out, kept = polish([contig], [lib], PolishOptions(), contig_max_k=32)
    assert kept[0]
    np.testing.assert_array_equal(out[0], contig)


def test_polish_masks_chimeric_junction(rng):
    # contig = genomeA[:2000] + genomeB junk (500bp) + genomeA[2000:]
    # reads come only from genomeA -> junk region has odd/zero coverage
    ga = simdata.random_genome(rng, 4000)
    junk = simdata.random_genome(rng, 500)
    chimera = ga[:2000] + junk + ga[2000:]
    lib = _lib(rng, ga, coverage=40.0)
    out, kept = polish([seq_to_codes(chimera)], [lib],
                       PolishOptions(min_contig_length=100), contig_max_k=32)
    joined = "".join("ACGTN"[b] for b in out[0]) if kept[0] else ""
    assert junk not in joined


def test_mask_short_runs():
    seq = np.array([0, 1, 4, 2, 3, 1, 4, 0] , dtype=np.uint8)
    out = mask_short_runs(seq, 3)
    np.testing.assert_array_equal(out, [4, 4, 4, 2, 3, 1, 4, 4])


def test_trim_edge_n():
    seq = np.array([4, 4, 1, 2, 4, 3, 4], dtype=np.uint8)
    np.testing.assert_array_equal(trim_edge_n(seq), [1, 2, 4, 3])
    assert len(trim_edge_n(np.array([4, 4], np.uint8))) == 0


def test_ungap_identity_multi_contig(rng):
    """Exact reads from a NON-FIRST contig must measure identity 1.0 —
    the ungapped mapper once indexed the concatenated pool with the
    contig-LOCAL offset, so any contig after the first compared reads
    against the wrong bases (identity ~0.25) and polish masked entire
    assemblies inside iterate (round-4 regression)."""
    import numpy as np
    from platanus_b_tpu.io.reads import pack_reads
    from platanus_b_tpu.models.mapper import ContigIndex, map_reads_ungap

    contigs = [rng.integers(0, 4, size=L, dtype=np.uint8)
               for L in (150, 130, 20000)]
    g = contigs[2]
    reads = [g[s:s + 100] for s in rng.integers(0, len(g) - 100, 50)]
    rb = pack_reads(reads)
    index = ContigIndex(contigs, key_length=32)
    ids, offs, ident = map_reads_ungap(index, rb.codes, rb.lengths,
                                       min_identity=0.0, seed_length=32)
    m = ids != 0
    assert m.mean() > 0.9
    assert (ident[m] > 0.999).all()
    assert (np.abs(ids[m]) == 3).all()
