"""Worker process for the 2-process jax.distributed integration test.

Launched by tests/test_multihost_2proc.py with JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID set. Exercises the REAL multi-process
paths (process_count() > 1): DCN ingest sharding (host_read_plan), the
per-host count -> global_count_merge pipeline inside count_reads, the
key-range sharded merge, and the histogram psum. Writes a JSON result
for the parent to compare across processes.
"""

import json
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import hashlib

import numpy as np


def main():
    out_path = sys.argv[1]
    fasta_path = sys.argv[2]
    result = {}
    try:
        from platanus_b_tpu.parallel import multihost as mh
        assert mh.initialize(), "jax.distributed did not initialize"
        result["pid"] = mh.process_index()
        result["n"] = mh.process_count()
        assert result["n"] == 2

        # --- DCN ingest -> per-host count -> global merge (count_reads)
        from platanus_b_tpu.io.reads import load_read_batches
        from platanus_b_tpu.models.assemble_core import count_reads
        plan = mh.host_read_plan([fasta_path], min_chunk=1 << 10)
        result["plan"] = [[p, int(a), int(b)] for p, a, b in plan]
        batches = list(load_read_batches(plan))
        result["local_reads"] = int(sum(b.num_reads for b in batches))
        table, hist = count_reads(batches, 15)
        result["table_sha"] = hashlib.sha256(
            table.keys.tobytes() + table.counts.tobytes()).hexdigest()
        result["n_unique"] = int(len(table.keys))
        result["hist_sha"] = hashlib.sha256(
            np.asarray(hist).tobytes()).hexdigest()

        # --- key-range sharded merge: this host keeps only its range
        sk, sc = mh.global_count_merge_sharded(table.keys, table.counts, k=15)
        result["shard_rows"] = int(len(sk))
        result["shard_sha"] = hashlib.sha256(
            sk.tobytes() + sc.astype(np.uint32).tobytes()).hexdigest()
        # shards must butt up against the range boundary
        if len(sk):
            result["shard_top_min"] = int(sk[:, 0].min())
            result["shard_top_max"] = int(sk[:, 0].max())

        # --- histogram psum
        h = mh.psum_histogram(np.asarray([1, 2, 3], np.int64)
                              * (mh.process_index() + 1))
        result["psum"] = [int(x) for x in h]

        # --- REAL production assemble() at process_count()==2: sharded
        # merge + psum histogram + filtered gather, then the replicated
        # graph pipeline. Contig set must equal the single-process run.
        from platanus_b_tpu.models.assemble_core import (AssembleOptions,
                                                         assemble)
        res = assemble(batches, AssembleOptions(k=15))
        canon = sorted(
            min(bytes(c), bytes((3 - c)[::-1])) for c in res.contigs)
        result["n_contigs"] = len(canon)
        result["contig_sha"] = hashlib.sha256(b"|".join(canon)).hexdigest()
        result["ok"] = True
    except Exception as e:  # surfaced to the parent for skip/fail decision
        result["ok"] = False
        result["error"] = f"{type(e).__name__}: {e}"
    with open(out_path, "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()
