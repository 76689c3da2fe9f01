"""IO layer: FASTA/FASTQ parsing, compression, header codec."""

import bz2
import gzip

import numpy as np

from platanus_b_tpu.io import fasta as fa
from platanus_b_tpu.io.reads import load_paired_batches, load_read_batches, pack_reads


def test_fasta_roundtrip(tmp_path):
    recs = [("a", "ACGT" * 50), ("b", "TTTNNA"), ("c", "")]
    p = str(tmp_path / "x.fa")
    fa.write_fasta(p, recs)
    got = list(fa.iter_fasta(p))
    assert got == recs
    # 80-column wrapping (common.cpp:30 OUTPUT_LINE_LENGTH)
    lines = open(p).read().splitlines()
    assert max(len(l) for l in lines) <= 80


def test_fastq_and_compression(tmp_path):
    fq = "@r1\nACGTACGT\n+\nIIIIIIII\n@r2\nTTTT\n+\nIIII\n"
    for name, opener in [("p.fq", open), ("p.fq.gz", gzip.open), ("p.fq.bz2", bz2.open)]:
        p = str(tmp_path / name)
        with opener(p, "wt") as f:
            f.write(fq)
        assert fa.sniff_format(p) == "fastq"
        got = list(fa.iter_reads(p))
        assert got == [("r1", "ACGTACGT"), ("r2", "TTTT")]


def test_char2bin_matches_reference():
    # common.h:256: A->0 C->1 G->2 T->3, else N->4
    assert fa.seq_to_codes("ACGTNacgtX").tolist() == [0, 1, 2, 3, 4, 0, 1, 2, 3, 4]
    assert fa.codes_to_seq(np.array([0, 1, 2, 3, 4], dtype=np.uint8)) == "ACGTN"


def test_header_codec():
    # printContig format (common.h:334) and findCoverageFromHeader parsing
    h = fa.format_contig_header("seq", 3, 1234, 41.6, 1.0, 100, 52)
    assert h == "seq3_len1234_cov42_read100_maxK52"
    assert fa.parse_cov(h) == 42
    assert fa.parse_read_length(h) == 100
    assert fa.parse_max_k(h) == 52
    # absent keys default to 1 / 100 (common.h:670,697)
    assert fa.parse_cov("plain_name") == 1
    assert fa.parse_read_length("plain_name") == 100
    # cov rounding: static_cast<u16>(cov*ratio + 0.5)
    assert fa.format_contig_header("s", 1, 5, 10.0, 0.55) == "s1_len5_cov6"


def test_write_contigs_skips_deleted(tmp_path):
    p = str(tmp_path / "c.fa")
    n = fa.write_contigs(p, ["ACGT", "GGGG", "TTTT"], [10, 0xFFFF, 3],
                         coverage_ratio=1.0, read_length=100, max_k=32)
    assert n == 2
    got = list(fa.iter_fasta(p))
    assert [s for _, s in got] == ["ACGT", "TTTT"]
    assert got[0][0] == "seq1_len4_cov10_read100_maxK32"
    assert got[1][0] == "seq2_len4_cov3_read100_maxK32"


def test_pack_reads_and_batches(tmp_path):
    batch = pack_reads(["ACGT", "AC", "ACGTACGT"])
    assert batch.codes.shape == (3, 8)
    assert batch.lengths.tolist() == [4, 2, 8]
    assert batch.codes[1].tolist() == [0, 1, 4, 4, 4, 4, 4, 4]

    p = str(tmp_path / "r.fa")
    fa.write_fasta(p, [(f"r{i}", "ACGT" * (i + 1)) for i in range(5)])
    batches = list(load_read_batches([p], batch_size=2))
    assert [b.num_reads for b in batches] == [2, 2, 1]
    assert sum(b.total_bases for b in batches) == 4 * (1 + 2 + 3 + 4 + 5)


def test_paired_batches(tmp_path):
    f1, f2 = str(tmp_path / "1.fa"), str(tmp_path / "2.fa")
    fa.write_fasta(f1, [("a/1", "AAAA"), ("b/1", "CCCC")])
    fa.write_fasta(f2, [("a/2", "GGGG"), ("b/2", "TTTT")])
    pairs = list(load_paired_batches(f1, f2))
    assert len(pairs) == 1
    fwd, rev = pairs[0]
    assert fwd.num_reads == rev.num_reads == 2
    # interleaved layout (-ip syntax, baseCommand.h:52-68)
    fi = str(tmp_path / "il.fa")
    fa.write_fasta(fi, [("a/1", "AAAA"), ("a/2", "GGGG"), ("b/1", "CCCC"), ("b/2", "TTTT")])
    pairs2 = list(load_paired_batches(fi, None))
    f2b, r2b = pairs2[0]
    assert f2b.codes.tolist() == fwd.codes.tolist()
    assert r2b.codes.tolist() == rev.codes.tolist()
