"""Bisect count_batch's 2.8s: which jitted sub-stage is slow?"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def t(label, fn, reps=3):
    jax.block_until_ready(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    print(f"{label:50s} {min(ts)*1e3:10.1f} ms", flush=True)
    return min(ts)


def main():
    from bench import BATCH_READS, K, make_reads
    from platanus_b_tpu.models.assemble_core import _pad_codes
    from platanus_b_tpu.ops import count as cnt
    from platanus_b_tpu.ops.kmer import SENTINEL, extract_canonical_kmers
    from platanus_b_tpu.ops.multiword import mw_eq

    reads = make_reads()
    padded = _pad_codes(reads[:BATCH_READS])
    print(f"padded {padded.shape}", flush=True)

    @functools.partial(jax.jit, static_argnames=("k",))
    def ex_reshape_sort(codes, k):
        keys, valid = extract_canonical_kmers(codes, k)
        W = keys.shape[-1]
        flat = keys.reshape(-1, W)
        return cnt.sort_by_key(flat)

    @functools.partial(jax.jit, static_argnames=("k",))
    def ex_reshape(codes, k):
        keys, valid = extract_canonical_kmers(codes, k)
        W = keys.shape[-1]
        return keys.reshape(-1, W)

    t("jit(extract+reshape)", lambda: ex_reshape(padded, K))
    t("jit(extract+reshape+sort)", lambda: ex_reshape_sort(padded, K))

    (skeys,) = jax.block_until_ready(ex_reshape_sort(padded, K))

    @jax.jit
    def marks(sk):
        return cnt._run_marks(sk)

    t("jit(_run_marks)", lambda: marks(skeys))

    @jax.jit
    def dd(sk):
        sc = (~mw_eq(sk, jnp.full_like(sk, SENTINEL))).astype(jnp.uint32)
        return cnt.dedup_sum(sk, sc)

    t("jit(dedup_sum)", lambda: dd(skeys))

    @jax.jit
    def compact_only(sk):
        valid, is_new, is_end = cnt._run_marks(sk)
        csum = jnp.cumsum(jnp.where(valid, 1, 0).astype(jnp.uint32))
        return cnt._compact_ends(sk, is_end, csum)

    t("jit(marks+cumsum+_compact_ends)", lambda: compact_only(skeys))

    @jax.jit
    def cumsum_only(sk):
        valid = ~mw_eq(sk, jnp.full_like(sk, SENTINEL))
        return jnp.cumsum(valid.astype(jnp.uint32))

    t("jit(cumsum)", lambda: cumsum_only(skeys))

    @jax.jit
    def ss_only(sk):
        valid, is_new, is_end = cnt._run_marks(sk)
        ends_cum = jnp.cumsum(is_end.astype(jnp.int32))
        n = sk.shape[0]
        tgt = jnp.searchsorted(ends_cum,
                               jnp.arange(1, n + 1, dtype=jnp.int32),
                               side="left")
        return tgt

    t("jit(marks+cumsum+searchsorted)", lambda: ss_only(skeys))

    @jax.jit
    def gather_only(sk):
        n = sk.shape[0]
        idx = (jnp.arange(n, dtype=jnp.int32) * 7919) % n
        return sk[idx]

    t("jit(random gather of rows)", lambda: gather_only(skeys))

    t("count_batch (full)", lambda: cnt.count_batch(padded, K))


if __name__ == "__main__":
    main()
