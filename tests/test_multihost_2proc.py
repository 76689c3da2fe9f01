"""Real 2-process jax.distributed integration test (VERDICT round-2 #5).

Spawns two CPU worker processes under a jax.distributed coordinator and
drives the actual multi-process paths: byte-range ingest sharding, the
per-host count -> global_count_merge pipeline, the key-range sharded
merge (no host holds the full table), and the histogram psum. The
identity-path unit tests in test_multihost.py cannot catch cross-process
bugs; this is the only test that executes process_count() == 2.
"""

import hashlib
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def worker_results(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mh2")
    # simulated reads: 200 x 60 bp from a 2 kb genome (big enough that
    # host_read_plan byte-splits the FASTA with min_chunk=1 KiB)
    rng = np.random.default_rng(11)
    genome = rng.integers(0, 4, size=2000, dtype=np.uint8)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    fasta = tmp / "reads.fa"
    with open(fasta, "w") as f:
        for i in range(200):
            s = int(rng.integers(0, 2000 - 60))
            f.write(f">r{i}\n{bases[genome[s:s+60]].tobytes().decode()}\n")

    port = _free_port()
    procs = []
    outs = []
    for pid in range(2):
        out = tmp / f"result_{pid}.json"
        outs.append(out)
        env = dict(os.environ)
        env.update({
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
        })
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "mh_worker.py"),
             str(out), str(fasta)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process workers timed out")
        logs.append(stdout.decode(errors="replace"))
    results = []
    for out, log in zip(outs, logs):
        if not os.path.exists(out):
            pytest.fail(f"worker wrote no result; log:\n{log[-2000:]}")
        with open(out) as f:
            results.append(json.load(f))
    for r, log in zip(results, logs):
        if not r.get("ok"):
            if "did not initialize" in r.get("error", ""):
                pytest.skip(f"jax.distributed unavailable: {r['error']}")
            pytest.fail(f"worker failed: {r.get('error')}\n{log[-2000:]}")
    return results, fasta


def test_ingest_partitions_reads(worker_results):
    results, _fasta = worker_results
    assert results[0]["n"] == results[1]["n"] == 2
    # byte-range split: both hosts got a nonempty slice; no read counted
    # twice (sum == total)
    assert results[0]["local_reads"] > 0
    assert results[1]["local_reads"] > 0
    assert results[0]["local_reads"] + results[1]["local_reads"] == 200


def test_global_merge_identical_on_all_hosts(worker_results):
    results, fasta = worker_results
    assert results[0]["table_sha"] == results[1]["table_sha"]
    assert results[0]["hist_sha"] == results[1]["hist_sha"]
    # cross-check against a single-process ground-truth count
    sys.path.insert(0, REPO)
    from platanus_b_tpu.io.reads import load_read_batches
    from platanus_b_tpu.models.assemble_core import count_reads
    batches = list(load_read_batches([str(fasta)]))
    table, _hist = count_reads(batches, 15)
    sha = hashlib.sha256(table.keys.tobytes()
                         + table.counts.tobytes()).hexdigest()
    assert results[0]["table_sha"] == sha
    assert results[0]["n_unique"] == len(table.keys)


def test_sharded_merge_partitions_table(worker_results):
    results, _fasta = worker_results
    total = results[0]["n_unique"]
    rows0, rows1 = results[0]["shard_rows"], results[1]["shard_rows"]
    # the two key-range shards partition the global table
    assert rows0 + rows1 == total
    assert results[0]["shard_sha"] != results[1]["shard_sha"]
    # contiguous ranges: host 0's top words all below host 1's
    if rows0 and rows1:
        assert results[0]["shard_top_max"] < results[1]["shard_top_min"]
    # no host held the whole table
    assert max(rows0, rows1) < total


def test_histogram_psum(worker_results):
    results, _fasta = worker_results
    # host0 sends [1,2,3], host1 [2,4,6] -> sum [3,6,9] everywhere
    assert results[0]["psum"] == [3, 6, 9]
    assert results[1]["psum"] == [3, 6, 9]


def test_assemble_2proc_matches_single_process(worker_results):
    """The PRODUCTION assemble() path at process_count()==2 (sharded
    merge + psum histogram + filtered gather) must produce the exact
    contig set of a single-process run (VERDICT r3 task 4)."""
    results, fasta = worker_results
    assert results[0]["contig_sha"] == results[1]["contig_sha"]
    sys.path.insert(0, REPO)
    from platanus_b_tpu.io.reads import load_read_batches
    from platanus_b_tpu.models.assemble_core import (AssembleOptions,
                                                     assemble)
    batches = list(load_read_batches([str(fasta)]))
    res = assemble(batches, AssembleOptions(k=15))
    canon = sorted(min(bytes(c), bytes((3 - c)[::-1]))
                   for c in res.contigs)
    sha = hashlib.sha256(b"|".join(canon)).hexdigest()
    assert results[0]["n_contigs"] == len(canon) > 0
    assert results[0]["contig_sha"] == sha
