"""Native C++ IO decoder parity with the Python parsers."""

import numpy as np
import pytest
import simdata

from platanus_b_tpu import native
from platanus_b_tpu.io.fasta import iter_reads, load_codes, seq_to_codes
from platanus_b_tpu.io.reads import load_read_batches


def test_native_available():
    assert native.available(), "g++ build of io_native.cpp failed"


def test_decode_fasta_parity(rng, tmp_path):
    seqs = [simdata.random_genome(rng, int(rng.integers(50, 300)))
            for _ in range(40)]
    seqs[3] = seqs[3][:20] + "NNN" + seqs[3][23:]
    p = tmp_path / "x.fa"
    with open(p, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">r{i} extra comment\n")
            # wrap lines to exercise multi-line records
            for j in range(0, len(s), 60):
                f.write(s[j:j + 60] + "\n")
    codes, starts = load_codes(str(p))
    assert len(starts) == len(seqs) + 1
    for i, s in enumerate(seqs):
        np.testing.assert_array_equal(codes[starts[i]: starts[i + 1]],
                                      seq_to_codes(s))


def test_decode_fastq_parity(rng, tmp_path):
    seqs = [simdata.random_genome(rng, 100) for _ in range(25)]
    p = tmp_path / "x.fq"
    with open(p, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f"@r{i}\n{s}\n+\n{'I' * len(s)}\n")
    codes, starts = load_codes(str(p))
    assert len(starts) == len(seqs) + 1
    for i, s in enumerate(seqs):
        np.testing.assert_array_equal(codes[starts[i]: starts[i + 1]],
                                      seq_to_codes(s))


def test_load_read_batches_native(rng, tmp_path):
    seqs = [simdata.random_genome(rng, 80) for _ in range(300)]
    p = tmp_path / "r.fa"
    simdata.write_fasta(p, seqs)
    batches = list(load_read_batches([str(p)], batch_size=128))
    assert sum(b.num_reads for b in batches) == 300
    got = []
    for b in batches:
        for r in range(b.num_reads):
            got.append("".join("ACGTN"[c] for c in
                               b.codes[r, : b.lengths[r]]))
    assert got == seqs


def test_gzip_path_still_works(rng, tmp_path):
    import gzip
    seqs = [simdata.random_genome(rng, 70) for _ in range(10)]
    p = tmp_path / "r.fa.gz"
    with gzip.open(p, "wt") as f:
        for i, s in enumerate(seqs):
            f.write(f">r{i}\n{s}\n")
    codes, starts = load_codes(str(p))
    assert len(starts) == 11
    np.testing.assert_array_equal(codes[: starts[1]], seq_to_codes(seqs[0]))
