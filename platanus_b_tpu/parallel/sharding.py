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
    # flat 1-D scatter: a (m, 2) scatter-index tensor tiles to T(8,128)
    # on TPU with ~64x padding; row*cap+col keeps indices compact
    flat_idx = jnp.where(in_range & (sowner < n_shards),
                         sowner * cap_per_dest
                         + jnp.clip(col, 0, cap_per_dest - 1),
                         n_shards * cap_per_dest)
    send = jnp.full((n_shards * cap_per_dest + 1, W), SENTINEL,
                    dtype=jnp.uint32)
    send = send.at[flat_idx].set(skeys, mode="drop")
    send = send[:-1].reshape(n_shards, cap_per_dest, W)
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


# ---------------------------------------------------------------------------
# sharded DBG adjacency — key-space halo exchange
# ---------------------------------------------------------------------------

def sharded_adjacency_fn(mesh: Mesh, k: int, cap: int, slack: float = 2.5):
    """Adjacency of a key-space-sharded DBG table (SURVEY §2.10 rows 2/4:
    per-shard graph construction with neighbor-key "halo" exchange).

    Each shard owns a sorted slice of canonical k-mer space (the output of
    sharded_count_fn). For every owned k-mer it must test the existence of
    8 extension neighbors (2 orientations x 4 bases, graph.h makeInitial
    semantics via models.dbg._adjacency_kernel) — but a neighbor's owner
    is `hash % n_shards`, usually a DIFFERENT shard. Instead of
    replicating the table, the lookup itself is exchanged:

      1. every shard generates its 8 canonical neighbor queries;
      2. queries route to their owner shard with ONE all_to_all;
      3. owners answer membership by local binary search;
      4. answers ride the inverse all_to_all back (the (n_shards, cap_q)
         slot layout makes the second all_to_all exactly the inverse
         permutation — each answer lands at its query's recorded slot).

    Returns a jitted fn: (keys (n, cap, W), counts (n, cap),
    n_unique (n,)) -> (out (n, cap, 2) uint8 nibbles,
    is_junction (n, cap) bool, n_junction (), n_edge ()).
    """
    from ..ops.multiword import revcomp, mw_shl2, mw_le as _mw_le
    from ..ops.search import _lookup_jit

    n = mesh.devices.size
    W = num_words(k)
    cap_q = max(int(8 * cap / n * slack), 64)

    def step(keys, counts, n_unique):
        keys = keys[0]          # (cap, W) local slice
        counts = counts[0]
        n_u = n_unique[0]
        alive = counts > 0
        dead_key = jnp.full_like(keys, SENTINEL)

        # 1. neighbor queries (models.dbg._adjacency_kernel lines 63-78)
        queries = []
        for o in (0, 1):
            ok = keys if o == 0 else revcomp(keys, k)
            shifted = mw_shl2(ok, k)
            for b in range(4):
                q = shifted.at[..., -1].set(shifted[..., -1]
                                            | np.uint32(b))
                rc = revcomp(q, k)
                canon = jnp.where(_mw_le(q, rc)[..., None], q, rc)
                queries.append(jnp.where(alive[:, None], canon, dead_key))
        q_all = jnp.concatenate(queries, axis=0)          # (8cap, W)
        q_valid = ~jnp.all(q_all == jnp.uint32(SENTINEL), axis=-1)

        # 2. route to owners, remembering each query's slot
        owner = (mw_hash(q_all) % np.uint32(n)).astype(jnp.int32)
        owner = jnp.where(q_valid, owner, n)
        m = q_all.shape[0]
        order = jnp.argsort(owner)                         # stable
        sowner = owner[order]
        sq = q_all[order]
        cnts = jnp.zeros((n + 1,), jnp.int32).at[sowner].add(1)
        starts = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                  jnp.cumsum(cnts)[:-1]])
        col = jnp.arange(m, dtype=jnp.int32) - starts[sowner]
        in_range = (sowner < n) & (col < cap_q)
        flat_idx = jnp.where(in_range, sowner * cap_q
                             + jnp.clip(col, 0, cap_q - 1), n * cap_q)
        send = jnp.full((n * cap_q + 1, W), SENTINEL, dtype=jnp.uint32)
        send = send.at[flat_idx].set(sq, mode="drop")
        send = send[:-1].reshape(n, cap_q, W)
        recv = jax.lax.all_to_all(send, AXIS, split_axis=0, concat_axis=0)

        # 3. answer membership locally
        rq = recv.reshape(n * cap_q, W)
        idx = _lookup_jit(keys, rq, n_u)
        found = (idx >= 0) & alive[jnp.clip(idx, 0, cap - 1)]
        ans = found.reshape(n, cap_q).astype(jnp.int8)

        # 4. inverse exchange + scatter to query order
        back = jax.lax.all_to_all(ans, AXIS, split_axis=0, concat_axis=0)
        flat_back = back.reshape(-1)[jnp.clip(flat_idx, 0, n * cap_q - 1)]
        found_sorted = (flat_back > 0) & in_range
        found_all = jnp.zeros((m,), bool).at[order].set(found_sorted)

        exists = found_all.reshape(2, 4, cap).transpose(2, 0, 1)
        out = jnp.sum(jnp.where(exists,
                                jnp.uint8(1) << jnp.arange(4,
                                                           dtype=jnp.uint8),
                                0), axis=-1).astype(jnp.uint8)
        outdeg = ((out & 1) + ((out >> 1) & 1) + ((out >> 2) & 1)
                  + ((out >> 3) & 1)).astype(jnp.int32)
        is_junction = alive & ((outdeg[:, 0] >= 2) | (outdeg[:, 1] >= 2))
        n_junction = jax.lax.psum(jnp.sum(is_junction.astype(jnp.int32)),
                                  AXIS)
        n_edge = jax.lax.psum(
            jnp.sum(jnp.where(alive[:, None], outdeg, 0)), AXIS)
        return (out[None], is_junction[None], n_junction, n_edge)

    mapped = jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS)),
        out_specs=(P(AXIS), P(AXIS), P(), P()),
        check_vma=False)
    return jax.jit(mapped)


# ---------------------------------------------------------------------------
# data-parallel read mapping (SURVEY §2.10 row 5: per-shard mapping with
# gathered/reduced link statistics)
# ---------------------------------------------------------------------------

def sharded_map_fn(mesh: Mesh, index, key_len: int, word_len: int,
                   reads_per_shard: int, read_len: int,
                   max_candidates: int = 16):
    """Build a jitted data-parallel mapping step: reads shard over the
    mesh rows, the contig index replicates (contigs are tiny next to the
    read set), and each device runs the seed-vote map kernel on its
    slice. Returns per-read (id, offset) sharded over the mesh plus a
    psum'd per-contig mapped-read histogram (the link-statistic
    reduction)."""
    from ..models.mapper import _map_votes

    kt, kp, pool, starts, clens, tl = index.device_arrays()
    n = mesh.devices.size
    S = max(-(-read_len // word_len) + 1, 1)
    C = index.num_contigs

    def step(codes, lengths):
        # codes: (reads_per_shard, read_len) local block
        R = codes.shape[0]
        vote_id, vote_off, seed_valid, _cands = _map_votes(
            kt, kp, pool, starts, clens, tl, codes, lengths,
            key_len, word_len, S, max_candidates)
        eq = ((vote_id[:, :, None] == vote_id[:, None, :])
              & (vote_off[:, :, None] == vote_off[:, None, :])
              & seed_valid[:, None, :])
        c = jnp.sum(eq.astype(jnp.int32), axis=-1) * seed_valid
        m1 = jnp.max(c, axis=-1)
        n_top = jnp.sum((c == m1[:, None]) & seed_valid, axis=-1)
        mapped = (m1 > 0) & (n_top == m1)
        best = jnp.argmax(c, axis=-1)
        bid = jnp.take_along_axis(vote_id, best[:, None], 1)[:, 0]
        boff = jnp.take_along_axis(vote_off, best[:, None], 1)[:, 0]
        ids = jnp.where(mapped, bid, 0).astype(jnp.int32)
        offs = jnp.where(mapped, boff, 0).astype(jnp.int32)
        # per-contig mapped-read histogram, all-reduced over the mesh
        ci = jnp.where(ids != 0, jnp.abs(ids) - 1, C)
        hist_local = jnp.zeros((C + 1,), jnp.int32).at[ci].add(1)
        hist = jax.lax.psum(hist_local[:C], AXIS)
        return ids, offs, hist

    mapped_fn = jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS)),
        out_specs=(P(AXIS), P(AXIS), P()),
        check_vma=False)
    return jax.jit(mapped_fn)
