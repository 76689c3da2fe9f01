"""Micro-profile: chunk-scale sort/dedup variants on the real TPU.

Times the pieces of count_sorted_chunk at the production chunk size
(64M rows) to pick the round-4 perf lever from data:
  - 2-lane u32 sort (current) vs single-lane u64 sort (x64)
  - dedup with second _compact_ends sort (current) vs no compaction
Run: python parity/profile_sort2.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    """block_until_ready is a no-op over the axon tunnel; force a real
    device->host readback of one element of every output leaf."""
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "shape") and leaf.size:
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
    N = 64 << 20
    rng = np.random.default_rng(0)
    hi = jnp.asarray(rng.integers(0, 1 << 32, size=N, dtype=np.uint32))
    lo = jnp.asarray(rng.integers(0, 1 << 32, size=N, dtype=np.uint32))
    payload = jnp.asarray(rng.integers(0, 1 << 16, size=N, dtype=np.uint32))
    jax.block_until_ready((hi, lo, payload))
    print(f"N = {N/1e6:.0f}M rows", flush=True)

    @jax.jit
    def sort2(hi, lo):
        return jax.lax.sort((hi, lo), num_keys=2)

    @jax.jit
    def sort2p(hi, lo, p):
        return jax.lax.sort((hi, lo, p), num_keys=2)

    @jax.jit
    def sort1(hi):
        return jax.lax.sort((hi,), num_keys=1)

    @jax.jit
    def sort1p(hi, p):
        return jax.lax.sort((hi, p), num_keys=1)

    timeit("sort 2-lane u32 (num_keys=2)", lambda: sort2(hi, lo))
    timeit("sort 2-lane u32 + payload", lambda: sort2p(hi, lo, payload))
    timeit("sort 1-lane u32 (num_keys=1)", lambda: sort1(hi))
    timeit("sort 1-lane u32 + payload", lambda: sort1p(hi, payload))

    # u64 path (needs x64)
    try:
        with jax.enable_x64(True):
            k64 = (hi.astype(jnp.uint64) << np.uint64(32)) | lo.astype(jnp.uint64)
            k64 = jax.block_until_ready(k64)

            @jax.jit
            def sort64(k):
                return jax.lax.sort((k,), num_keys=1)

            @jax.jit
            def sort64p(k, p):
                return jax.lax.sort((k, p), num_keys=1)

            timeit("sort 1-lane u64", lambda: sort64(k64))
            timeit("sort 1-lane u64 + u32 payload", lambda: sort64p(k64, payload))
    except Exception as e:
        print(f"u64 path failed: {type(e).__name__}: {e}")

    # cumsum at chunk scale
    @jax.jit
    def csum(p):
        return jnp.cumsum(p)
    timeit("cumsum u32", lambda: csum(payload))

    # run-marks + where-mask (the non-sort parts of dedup)
    from platanus_b_tpu.ops import count as cnt
    skeys = jnp.stack(sort2(hi, lo)[:2], axis=-1)
    skeys = jax.block_until_ready(skeys)

    @jax.jit
    def marks(sk):
        return cnt._run_marks(sk)
    timeit("_run_marks (2-word)", lambda: marks(skeys))

    @jax.jit
    def compact(sk, p):
        v, nw, ie = cnt._run_marks(sk)
        return cnt._compact_ends(sk, ie, p)
    timeit("_compact_ends (2nd sort, 2-word)", lambda: compact(skeys, payload))

    @jax.jit
    def dedup(sk, p):
        return cnt.dedup_sum(sk, p)
    timeit("dedup_sum total (2-word)", lambda: dedup(skeys, payload))

    @jax.jit
    def full_chunk(flat):
        return cnt.count_sorted_chunk(flat)
    flat = jax.block_until_ready(jnp.stack([hi, lo], axis=-1))
    timeit("count_sorted_chunk (sorted path e2e)", lambda: full_chunk(flat))

    # scatter-based compaction alternative: unique dst indices
    @jax.jit
    def scatter_compact(sk, p):
        v, nw, ie = cnt._run_marks(sk)
        dst = jnp.cumsum(ie.astype(jnp.int32)) - 1
        n = sk.shape[0]
        dst = jnp.where(ie, dst, n)  # drop non-ends
        out_k = jnp.full((n + 1, sk.shape[1]), cnt.SENTINEL, jnp.uint32)
        out_p = jnp.zeros((n + 1,), p.dtype)
        out_k = out_k.at[dst].set(sk, mode="drop")
        out_p = out_p.at[dst].set(p, mode="drop")
        return out_k[:n], out_p[:n]
    timeit("scatter compaction (alt)", lambda: scatter_compact(skeys, payload))


if __name__ == "__main__":
    main()
