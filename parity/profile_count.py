"""Stage-level profile of the k-mer counting pipeline on the real TPU.

Breaks bench.py's workload into its device stages and times each in
steady state (post-compile), so perf work targets the real bottleneck.
Run: python parity/profile_count.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(label, fn, reps=3):
    fn()  # compile/warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{label:45s} {best*1e3:10.1f} ms")
    return best


def main():
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/platanus_b_tpu_jax_cache")

    from bench import BATCH_READS, K, READ_LEN, make_reads
    from platanus_b_tpu.io.reads import ReadBatch
    from platanus_b_tpu.models.assemble_core import (_pad_codes,
                                                     count_reads_device)
    from platanus_b_tpu.ops import count as cnt
    from platanus_b_tpu.ops.kmer import extract_canonical_kmers

    reads = make_reads()
    n_reads = reads.shape[0]
    n_windows = n_reads * (READ_LEN - K + 1)
    batches = [ReadBatch(reads[i: i + BATCH_READS],
                         np.full(min(BATCH_READS, n_reads - i), READ_LEN,
                                 np.int32))
               for i in range(0, n_reads, BATCH_READS)]
    print(f"{len(batches)} batches, {n_windows/1e6:.1f}M windows")

    b0 = batches[0]
    padded = _pad_codes(b0.codes)
    n_batches = len(batches)

    # stage 1: host pad + transfer
    t0 = time.perf_counter()
    for b in batches:
        jax.block_until_ready(_pad_codes(b.codes))
    print(f"{'pad+transfer (all batches)':45s} "
          f"{(time.perf_counter()-t0)*1e3:10.1f} ms")

    # stage 2: extraction only
    def ex():
        return extract_canonical_kmers(padded, K)
    t = timeit("extract_canonical_kmers (1 batch)", ex)
    print(f"{'  -> all batches':45s} {t*n_batches*1e3:10.1f} ms")

    keys, valid = extract_canonical_kmers(padded, K)
    W = keys.shape[-1]
    flat = jax.block_until_ready(keys.reshape(-1, W))
    print(f"  flat windows per batch: {flat.shape[0]/1e6:.1f}M  W={W}")

    # stage 3: sort only
    def so():
        return cnt.sort_by_key(flat)
    t = timeit("sort (1 batch, keys only)", so)
    print(f"{'  -> all batches':45s} {t*n_batches*1e3:10.1f} ms")

    (skeys,) = jax.block_until_ready(cnt.sort_by_key(flat))

    # stage 4: dedup only
    from platanus_b_tpu.ops.multiword import mw_eq

    def dd():
        scounts = (~mw_eq(skeys, jnp.full_like(skeys, cnt.SENTINEL))
                   ).astype(jnp.uint32)
        return cnt.dedup_sum(skeys, scounts)
    t = timeit("dedup_sum (1 batch)", dd)
    print(f"{'  -> all batches':45s} {t*n_batches*1e3:10.1f} ms")

    uk, uc, un = jax.block_until_ready(dd())
    print(f"  unique per batch: {int(un)/1e6:.2f}M")

    # stage 5: full count_batch
    def cb():
        return cnt.count_batch(padded, K)
    t = timeit("count_batch (1 batch, fused)", cb)
    print(f"{'  -> all batches':45s} {t*n_batches*1e3:10.1f} ms")

    # stage 6: fold of 4 batch tables
    n = int(un)
    from platanus_b_tpu.ops.padding import next_pow2
    cap = min(next_pow2(n), uk.shape[0])
    tbl = (uk[:cap], uc[:cap], n)

    def fold4():
        return cnt.fold_tables([tbl, tbl, tbl, tbl])
    timeit("fold_tables (4 batch tables)", fold4)

    # stage 7: end-to-end
    def full():
        return count_reads_device(batches, K)
    t_full = timeit("count_reads_device (end-to-end)", full, reps=2)
    print(f"\nTHROUGHPUT: {n_windows/t_full/1e6:.1f}M kmers/s  "
          f"(baseline 6.78M => {n_windows/t_full/6.78e6:.1f}x)")


if __name__ == "__main__":
    main()
