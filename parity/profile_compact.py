"""Micro-profile: stream-compaction variants, 1-D lane layout.

TPU lesson from round 4: a (N,2) u32 array in tiled layout T(8,128) pads
the minor dim 2 -> 128 (64x memory blowup, instant OOM at 67M rows), so
keys must travel as SEPARATE 1-D lanes through any gather/scatter.
Candidates for compacting run-end rows of a sorted key stream:
  A. sort-based masked re-sort (current _compact_ends, per-lane ops)
  B. permutation sort: 1-lane (flag|idx) sort -> 1-D takes
  C. scatter: dst = cumsum(is_end)-1, per-lane at[dst].set drop-mode
  D. plain monotonic 1-D take (gather cost floor)
  E. bincount scatter-add (histogram path)
Run: python parity/profile_compact.py [N_M]
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


SENT = np.uint32(0xFFFFFFFF)


def main():
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/platanus_b_tpu_jax_cache")
    N = (int(sys.argv[1]) if len(sys.argv) > 1 else 64) << 20
    rng = np.random.default_rng(0)
    hi_np = np.repeat(np.sort(rng.integers(0, 1 << 32, size=N // 4,
                                           dtype=np.uint32)), 4)[:N]
    hi = jnp.asarray(hi_np)
    lo = jnp.asarray(np.sort(rng.integers(0, 1 << 32, size=N,
                                          dtype=np.uint32)))
    payload = jnp.asarray(rng.integers(0, 1 << 16, size=N, dtype=np.uint32))
    _sync((hi, lo, payload))
    print(f"N = {N/1e6:.0f}M rows", flush=True)

    @jax.jit
    def marks(hi, lo):
        neq = (hi[1:] != hi[:-1]) | (lo[1:] != lo[:-1])
        valid = ~((hi == SENT) & (lo == SENT))
        is_end = valid & jnp.concatenate([neq, jnp.ones((1,), bool)])
        return valid, is_end
    _, is_end = jax.block_until_ready(marks(hi, lo))
    _sync(is_end)
    timeit("run marks (1-D lanes)", lambda: marks(hi, lo))

    @jax.jit
    def variant_a(hi, lo, ie, p):
        mhi = jnp.where(ie, hi, SENT)
        mlo = jnp.where(ie, lo, SENT)
        return jax.lax.sort((mhi, mlo, p), num_keys=2)
    timeit("A: masked 2-lane re-sort", lambda: variant_a(hi, lo, is_end, payload))

    @jax.jit
    def variant_b(hi, lo, ie, p):
        n = hi.shape[0]
        idx = jnp.arange(n, dtype=jnp.uint32)
        flagged = jnp.where(ie, idx, idx | jnp.uint32(0x80000000))
        (perm,) = jax.lax.sort((flagged,), num_keys=1)
        perm = (perm & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
        return jnp.take(hi, perm), jnp.take(lo, perm), jnp.take(p, perm)
    timeit("B: 1-lane perm sort + 3x 1-D take",
           lambda: variant_b(hi, lo, is_end, payload))

    @jax.jit
    def variant_c(hi, lo, ie, p):
        n = hi.shape[0]
        dst = jnp.cumsum(ie.astype(jnp.int32)) - 1
        dst = jnp.where(ie, dst, n)
        ohi = jnp.full((n + 1,), SENT, jnp.uint32).at[dst].set(hi, mode="drop")
        olo = jnp.full((n + 1,), SENT, jnp.uint32).at[dst].set(lo, mode="drop")
        op_ = jnp.zeros((n + 1,), p.dtype).at[dst].set(p, mode="drop")
        return ohi[:n], olo[:n], op_[:n]
    timeit("C: cumsum + 3x 1-D scatter", lambda: variant_c(hi, lo, is_end, payload))

    perm_np = np.sort(rng.choice(N, size=N // 4, replace=False)).astype(np.int32)
    perm = jnp.asarray(np.pad(perm_np, (0, N - len(perm_np))))
    _sync(perm)

    @jax.jit
    def variant_d(hi, pm):
        return jnp.take(hi, pm)
    timeit("D: single monotonic 1-D take", lambda: variant_d(hi, perm))

    @jax.jit
    def variant_e(p, ie):
        v = jnp.where(ie, jnp.minimum(p, 0xFFFE), 0xFFFF)
        return jnp.zeros((0x10000,), jnp.int32).at[v].add(1, mode="drop")
    timeit("E: 64K-bin bincount scatter-add", lambda: variant_e(payload, is_end))

    @jax.jit
    def variant_e2(p, ie):
        v = jnp.where(ie, jnp.minimum(p, 0xFFFE).astype(jnp.uint32),
                      jnp.uint32(0xFFFF))
        (sv,) = jax.lax.sort((v,), num_keys=1)
        bounds = jnp.searchsorted(sv, jnp.arange(0x10000 + 1, dtype=jnp.uint32))
        return bounds[1:] - bounds[:-1]
    timeit("E2: hist via 1-lane sort + searchsorted",
           lambda: variant_e2(payload, is_end))

    # exclusive-cummax runlength trick
    @jax.jit
    def runlens(ie):
        n = ie.shape[0]
        pos = jnp.arange(1, n + 1, dtype=jnp.uint32)
        endpos = jnp.where(ie, pos, 0)
        prev = jnp.concatenate([jnp.zeros((1,), jnp.uint32),
                                jax.lax.cummax(endpos)[:-1]])
        return jnp.where(ie, pos - prev, 0)
    timeit("runlens via cummax", lambda: runlens(is_end))

    M = 2 * N
    bhi = jnp.asarray(rng.integers(0, 1 << 32, size=M, dtype=np.uint32))
    blo = jnp.asarray(rng.integers(0, 1 << 32, size=M, dtype=np.uint32))
    _sync((bhi, blo))

    @jax.jit
    def bigsort(a, b):
        return jax.lax.sort((a, b), num_keys=2)
    timeit(f"2-lane sort at {M/1e6:.0f}M rows", lambda: bigsort(bhi, blo))


if __name__ == "__main__":
    main()
