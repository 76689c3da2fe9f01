"""Byte-range record reading (io.fasta.load_codes ranges) — the
multi-host ingest partition unit (multihost.host_read_plan)."""

import gzip

import numpy as np
import pytest

from platanus_b_tpu.io import fasta as fa
from platanus_b_tpu.io.reads import load_read_batches
from platanus_b_tpu.parallel import multihost as mh


def _write_fasta(path, seqs):
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">r{i}\n{s}\n")


def _write_fastq(path, seqs):
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f"@r{i}\n{s}\n+\n{'@' * len(s)}\n")


def _decode_all(path, ranges):
    seqs = []
    for (p, b0, b1) in ranges:
        codes, starts = fa.load_codes(p, b0, b1)
        for j in range(len(starts) - 1):
            seqs.append(fa.codes_to_seq(codes[starts[j]: starts[j + 1]]))
    return seqs


@pytest.mark.parametrize("writer", [_write_fasta, _write_fastq])
def test_ranges_partition_records(tmp_path, writer):
    rng = np.random.default_rng(3)
    seqs = ["".join("ACGT"[b] for b in rng.integers(0, 4, size=L))
            for L in rng.integers(30, 90, size=50)]
    path = str(tmp_path / "reads.x")
    writer(path, seqs)
    for n_hosts in (2, 3, 5):
        plan = [r for i in range(n_hosts)
                for r in mh.host_read_plan([path], min_chunk=100,
                                           index=i, count=n_hosts)]
        got = _decode_all(path, plan)
        assert sorted(got) == sorted(seqs), n_hosts


def test_range_quality_at_signs_not_confused(tmp_path):
    # FASTQ quality lines full of '@' must not be taken as record starts
    path = str(tmp_path / "q.fq")
    seqs = ["ACGTACGTAC"] * 20
    _write_fastq(path, seqs)
    plan = [r for i in range(4)
            for r in mh.host_read_plan([path], min_chunk=50,
                                       index=i, count=4)]
    got = _decode_all(path, plan)
    assert got == seqs or sorted(got) == sorted(seqs)


def test_whole_file_range_equals_plain_load(tmp_path):
    path = str(tmp_path / "r.fa")
    _write_fasta(path, ["ACGTN", "GGGG"])
    c0, s0 = fa.load_codes(path)
    c1, s1 = fa.load_codes(path, 0, -1)
    assert np.array_equal(c0, c1) and np.array_equal(s0, s1)


def test_compressed_range_rejected(tmp_path):
    path = str(tmp_path / "r.fa.gz")
    with gzip.open(path, "wt") as f:
        f.write(">a\nACGT\n")
    with pytest.raises(Exception):
        fa.load_codes(path, 10, 20)


def test_loader_accepts_plan_tuples(tmp_path):
    path = str(tmp_path / "r.fa")
    seqs = ["ACGTACGTACGTACGT"] * 8
    _write_fasta(path, seqs)
    batches = list(load_read_batches([(path, 0, -1)]))
    assert sum(b.num_reads for b in batches) == 8
