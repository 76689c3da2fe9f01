"""Bisect count_batch with HONEST timing: force a host readback of a
reduction of each stage's output (block_until_ready does not truly sync
on the tunneled axon platform)."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def t(label, fn, reps=3):
    float(fn())  # warm/compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn())  # host readback forces completion
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
    padded = jax.block_until_ready(_pad_codes(reads[:BATCH_READS]))
    print(f"padded {padded.shape}", flush=True)

    @functools.partial(jax.jit, static_argnames=("k",))
    def ex_sum(codes, k):
        keys, valid = extract_canonical_kmers(codes, k)
        return jnp.sum(keys[:, :, 0].astype(jnp.float32))

    t("extract (+sum)", lambda: ex_sum(padded, K))

    @functools.partial(jax.jit, static_argnames=("k",))
    def ex_sort_sum(codes, k):
        keys, valid = extract_canonical_kmers(codes, k)
        flat = keys.reshape(-1, keys.shape[-1])
        (sk,) = cnt.sort_by_key(flat)
        return jnp.sum(sk[:, 0].astype(jnp.float32))

    t("extract+sort (+sum)", lambda: ex_sort_sum(padded, K))

    @functools.partial(jax.jit, static_argnames=("k",))
    def cb_sum(codes, k):
        uk, uc, un = cnt.count_batch.__wrapped__(codes, k)
        return un.astype(jnp.float32)

    t("count_batch (+n readback)", lambda: cb_sum(padded, K))

    # now the merge: two batch tables
    uk, uc, un = cnt.count_batch(padded, K)
    n = int(un)
    print(f"unique: {n/1e6:.2f}M", flush=True)
    from platanus_b_tpu.ops.padding import next_pow2
    cap = min(next_pow2(n), uk.shape[0])
    tbl = (jax.block_until_ready(uk[:cap]), jax.block_until_ready(uc[:cap]), n)

    def fold2():
        fk, fc, fn = cnt.fold_tables([tbl, tbl])
        return fn  # fold_tables already does int(un) readback

    t("fold_tables (2 tables, 8M rows)", fold2)

    def fold4():
        fk, fc, fn = cnt.fold_tables([tbl, tbl, tbl, tbl])
        return fn

    t("fold_tables (4 tables, 16M rows)", fold4)


if __name__ == "__main__":
    main()
