"""Device-mesh scale-out for the k-mer data plane.

The reference's parallelism is OpenMP threads over per-thread temporary
files plus a 1024-way lock-striped shared hash (counter.h:276-383,459-476).
The TPU-native design replaces both:

- reads are DATA-PARALLEL over the mesh ("shard" axis): each device
  extracts canonical k-mers from its own read slice;
- the k-mer table is KEY-SPACE-SHARDED by a hash of the key (the moral
  equivalent of the reference's 1024 hash stripes, counter.h:209-212), so
  each device owns a disjoint slice of k-mer space;
- the shuffle from read-order to owner-order is ONE `lax.all_to_all`
  over ICI per batch — replacing lock contention and the out-of-core
  "spill to unmappedFP and re-pass" loop (counter.h:341-364);
- the occurrence histogram / cutoff statistics are `lax.psum` reductions.

Everything is deterministic: sort + segment-sum per shard, no locks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.count import dedup_sum, sort_by_key
from ..ops.kmer import SENTINEL, extract_canonical_kmers
from ..ops.multiword import mw_hash, num_words

AXIS = "shard"


def make_mesh(devices=None) -> Mesh:
    """1-D device mesh over all local devices (or an explicit list)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, (AXIS,))


def _shuffle_to_owners(keys_flat: jnp.ndarray, valid_flat: jnp.ndarray,
                       n_shards: int, cap_per_dest: int):
    """Bucket local k-mers by owner shard and exchange via all_to_all.

    Returns (recv_keys (n*cap, W), n_dropped). Keys whose destination
    bucket overflows cap_per_dest are counted in n_dropped (callers size
    cap so this is ~never; tests assert 0).
    """
    W = keys_flat.shape[-1]
    owner = (mw_hash(keys_flat) % np.uint32(n_shards)).astype(jnp.int32)
    owner = jnp.where(valid_flat, owner, n_shards)
    ops = (owner,) + tuple(keys_flat[:, w] for w in range(W))
    srt = jax.lax.sort(ops, num_keys=1)
    sowner = srt[0]
    skeys = jnp.stack(srt[1:], axis=-1)
    m = sowner.shape[0]
    counts = jnp.zeros((n_shards + 1,), jnp.int32).at[sowner].add(1)
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(counts)[:-1]])
    col = jnp.arange(m, dtype=jnp.int32) - starts[sowner]
    in_range = (sowner < n_shards) & (col < cap_per_dest)
    n_dropped = jnp.sum(((sowner < n_shards) & ~in_range).astype(jnp.int32))
    row = jnp.where(in_range, sowner, n_shards)
    send = jnp.full((n_shards, cap_per_dest, W), SENTINEL, dtype=jnp.uint32)
    send = send.at[row, jnp.clip(col, 0, cap_per_dest - 1)].set(
        skeys, mode="drop")
    recv = jax.lax.all_to_all(send, AXIS, split_axis=0, concat_axis=0)
    return recv.reshape(n_shards * cap_per_dest, W), n_dropped


def sharded_count_fn(mesh: Mesh, k: int, reads_per_shard: int, read_len: int,
                     slack: float = 2.0):
    """Build the jitted sharded counting step for one batch geometry.

    Input: codes (n_shards * reads_per_shard, read_len) uint8, sharded over
    rows. Output (all per-shard, sharded over the leading axis):
      keys    (n, cap) — each shard's sorted unique canonical k-mers
      counts  (n, cap)
      n_unique(n,)     — valid rows per shard
      hist    (65535,) — replicated global occurrence histogram
      dropped ()       — total overflowed k-mers (0 in practice)
    """
    n = mesh.devices.size
    windows = reads_per_shard * max(read_len - k + 1, 0)
    cap_per_dest = max(int(windows / n * slack), 64)
    cap = n * cap_per_dest
    W = num_words(k)

    def step(codes):
        keys, valid = extract_canonical_kmers(codes, k)
        flat = keys.reshape(-1, W)
        vflat = valid.reshape(-1)
        recv, n_dropped = _shuffle_to_owners(flat, vflat, n, cap_per_dest)
        ones = (~jnp.all(recv == jnp.uint32(SENTINEL), axis=-1)).astype(jnp.uint32)
        skeys, scounts = sort_by_key(recv, ones)
        ukeys, ucounts, n_unique = dedup_sum(skeys, scounts)
        occ = jnp.clip(ucounts, 0, 0xFFFE).astype(jnp.int32)
        hist_local = jnp.zeros((0xFFFF,), jnp.int32).at[occ].add(
            jnp.where(ucounts > 0, 1, 0))
        hist = jax.lax.psum(hist_local, AXIS)
        dropped = jax.lax.psum(n_dropped, AXIS)
        return (ukeys[None], ucounts[None], n_unique[None], hist, dropped)

    mapped = jax.shard_map(
        step, mesh=mesh,
        in_specs=P(AXIS),
        out_specs=(P(AXIS), P(AXIS), P(AXIS), P(), P()),
        check_vma=False)
    return jax.jit(mapped), cap


def count_reads_sharded(mesh: Mesh, codes: np.ndarray, k: int):
    """Host convenience wrapper: count one padded read batch on the mesh.

    Pads the row count to a multiple of the mesh size with all-N rows and
    returns host-side (keys, counts) merged across shards (concatenation of
    disjoint key-space slices, re-sorted for the global table order).
    """
    n = mesh.devices.size
    r, l = codes.shape
    r2 = -(-r // n) * n
    if r2 != r:
        pad = np.full((r2 - r, l), 4, np.uint8)
        codes = np.concatenate([codes, pad], axis=0)
    fn, cap = sharded_count_fn(mesh, k, r2 // n, l)
    keys, counts, n_unique, hist, dropped = fn(jnp.asarray(codes))
    keys = np.asarray(keys)
    counts = np.asarray(counts)
    n_unique = np.asarray(n_unique)
    parts_k = [keys[s, : n_unique[s]] for s in range(n)]
    parts_c = [counts[s, : n_unique[s]] for s in range(n)]
    all_k = np.concatenate(parts_k, axis=0)
    all_c = np.concatenate(parts_c, axis=0)
    order = np.lexsort(tuple(all_k[:, w] for w in
                             range(all_k.shape[1] - 1, -1, -1)))
    return all_k[order], all_c[order], np.asarray(hist), int(dropped)
