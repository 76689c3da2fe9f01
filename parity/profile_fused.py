"""Stage profile of the fused single-sort counting path (round 4).

Run: python parity/profile_fused.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "shape") and getattr(leaf, "size", 0):
            np.asarray(leaf.ravel()[0])


def timeit(label, fn, reps=3):
    _sync(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn())
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{label:52s} {best*1e3:10.1f} ms", flush=True)
    return best


def main():
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/platanus_b_tpu_jax_cache")
    from bench import BATCH_READS, K, READ_LEN, make_reads
    from platanus_b_tpu.io.reads import ReadBatch
    from platanus_b_tpu.models.assemble_core import count_reads_device
    from platanus_b_tpu.ops import count as cnt
    from platanus_b_tpu.ops.padding import next_pow2

    reads = make_reads()
    n_reads = reads.shape[0]
    n_windows = n_reads * (READ_LEN - K + 1)
    batches = [ReadBatch(reads[i: i + BATCH_READS],
                         np.full(min(BATCH_READS, n_reads - i), READ_LEN,
                                 np.int32))
               for i in range(0, n_reads, BATCH_READS)]
    for b in batches:
        b.packed()  # host packing paid up front (cached), as in bench warmup

    # stage 1: transfer + extract, all batches
    def extract_all():
        outs = []
        for b in batches:
            words, nmask = b.packed()
            outs.append(cnt.extract_lanes_packed(jnp.asarray(words),
                                                 jnp.asarray(nmask), K))
        return outs
    timeit("transfer+extract lanes (all batches)", extract_all)

    items = extract_all()
    total = sum(it[0].shape[0] for it in items)
    cap = next_pow2(total)
    print(f"  total rows {total/1e6:.1f}M -> cap {cap/1e6:.1f}M")

    def concat():
        lanes = []
        for w in range(2):
            parts = [it[w] for it in items]
            parts.append(jnp.full((cap - total,), np.uint32(0xFFFFFFFF),
                                  jnp.uint32))
            lanes.append(jnp.concatenate(parts, axis=0))
        return tuple(lanes)
    timeit("concat+pad lanes", concat)
    lanes = concat()
    _sync(lanes)

    timeit("count_lanes_fused (both sorts)", lambda: cnt.count_lanes_fused(lanes))

    # split: main sort alone
    @jax.jit
    def main_sort(lns):
        return jax.lax.sort(lns, num_keys=2)
    timeit("  main 2-lane sort alone", lambda: main_sort(lanes))
    slanes = jax.jit(lambda l: jax.lax.sort(l, num_keys=2))(lanes)
    _sync(slanes)

    @jax.jit
    def marks_runlen(slanes):
        n = slanes[0].shape[0]
        valid = cnt._lane_valid(slanes)
        neq = cnt._lane_neq_prev(slanes)
        is_end = valid & jnp.concatenate([neq, jnp.ones((1,), bool)])
        pos = jnp.arange(1, n + 1, dtype=jnp.uint32)
        endpos = jnp.where(is_end, pos, 0)
        prev = jnp.concatenate([jnp.zeros((1,), jnp.uint32),
                                jax.lax.cummax(endpos)[:-1]])
        counts = jnp.where(is_end, pos - prev, 0)
        masked = tuple(jnp.where(is_end, ln, jnp.uint32(0xFFFFFFFF))
                       for ln in slanes)
        return masked, counts, jnp.sum(is_end.astype(jnp.int32))
    timeit("  marks+runlen+mask alone", lambda: marks_runlen(slanes))
    masked, counts, nu = marks_runlen(slanes)
    _sync((masked, counts))
    print(f"  n_unique = {int(nu)/1e6:.2f}M")

    @jax.jit
    def compact_sort(masked, counts):
        return jax.lax.sort(masked + (counts,), num_keys=2)
    timeit("  compact 3-op sort alone", lambda: compact_sort(masked, counts))

    n = int(nu)
    cap2 = min(next_pow2(max(n, 1)), cap)
    out = compact_sort(masked, counts)
    ucounts = out[2][:cap2]
    _sync(ucounts)
    timeit("hist at cap2", lambda: cnt.occurrence_histogram(ucounts))

    def e2e():
        return count_reads_device(batches, K)
    t = timeit("count_reads_device e2e", e2e, reps=2)
    print(f"\nTHROUGHPUT {n_windows/t/1e6:.1f}M/s  ({n_windows/t/6.78e6:.2f}x)")


if __name__ == "__main__":
    main()
