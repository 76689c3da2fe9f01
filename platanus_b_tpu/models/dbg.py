"""De Bruijn graph as flat device arrays + pointer-doubling unitig labeling.

The reference builds its graph by a sequential DFS over a hash table
(graph.h:290-579 makeInitialBruijnGraph) into Straight (unitig) and
Junction node maps. Here the graph IS the sorted k-mer table:

- node i = i-th canonical k-mer (sorted keys from ops.count)
- oriented node (i, o): o=0 the stored (canonical) orientation, o=1 its
  reverse complement
- adjacency out[i, o] = 4-bit flags over extension bases, computed by bulk
  canonical lookups of all shifted k-mers (replaces per-extension hash
  probes)
- a node is a *junction* iff it branches in either orientation
  (popcount(out) >= 2), exactly the reference's Junction criterion
- unitigs = maximal chains of non-junction nodes, labeled with
  pointer-doubling list ranking (O(log N) bulk rounds instead of DFS)

Straight.length in the reference counts K-MERS, not bases
(graph.h:52 comment: actual seq length = length + k - 1); `ulen` here
follows the same convention so every threshold (cutBranch's
length <= kmerLength, deleteErroneousStraightNode's lengthCut) carries
over unchanged.

Shape discipline: the key table is padded to a power-of-two capacity
(SENTINEL rows, alive=False), so adjacency + labeling compile once per
(capacity, k) pair; all iteration counts derive from the capacity.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.kmer import SENTINEL, kmer_to_codes
from ..ops.multiword import revcomp
from ..ops.padding import next_pow2, pad_rows
from ..ops.search import _lookup_jit

INVALID = np.int32(-1)


def popcount4(x: jnp.ndarray) -> jnp.ndarray:
    return ((x & 1) + ((x >> 1) & 1) + ((x >> 2) & 1) + ((x >> 3) & 1)).astype(jnp.int32)


# ---------------------------------------------------------------------------
# adjacency (jitted once per (capacity, k))
# ---------------------------------------------------------------------------

@jax.jit
def _mask_topo_kernel(succ_idx, succ_orient, alive_new):
    """Incremental adjacency after node deletion: edges to dead targets
    (and rows of dead sources) vanish; junction status recomputes from
    the new degrees. NO key lookups — deletion can only REMOVE edges, so
    the expensive binary-search adjacency build runs once per graph and
    cleaning rounds update it by masking."""
    return _mask_topo_core(succ_idx, succ_orient, alive_new)


def _ln_shl2(lanes, k: int):
    """mw_shl2 on separate u32 lanes (word 0 most significant)."""
    from ..ops.multiword import top_word_mask
    W = len(lanes)
    out = []
    for w in range(W):
        v = lanes[w] << 2
        if w + 1 < W:
            v = v | (lanes[w + 1] >> 30)
        out.append(v)
    out[0] = out[0] & top_word_mask(k)
    return out


def _ln_revcomp(lanes, k: int):
    """revcomp on separate u32 lanes."""
    from ..ops.multiword import _rev2_u32, top_word_mask
    W = len(lanes)
    rev = [_rev2_u32(~x) for x in lanes][::-1]
    s = (32 * W - 2 * k) % 32
    if s:
        out = []
        for w in range(W):
            v = rev[w] >> np.uint32(s)
            if w > 0:
                v = v | (rev[w - 1] << np.uint32(32 - s))
            out.append(v)
        rev = out
    rev[0] = rev[0] & top_word_mask(k)
    return rev


def _ln_le(a, b):
    lt = jnp.zeros(a[0].shape, bool)
    eq = jnp.ones(a[0].shape, bool)
    for x, y in zip(a, b):
        lt = lt | (eq & (x < y))
        eq = eq & (x == y)
    return lt | eq


@functools.partial(jax.jit, static_argnames=("k",))
def _adjacency_kernel(keys: jnp.ndarray, alive: jnp.ndarray,
                      n: jnp.ndarray, k: int):
    cap = keys.shape[0]
    W = keys.shape[-1]
    # LANE discipline: every elementwise intermediate is a separate 1-D
    # u32 array. A (9N, W) row matrix flowing through elementwise ops
    # takes the tiled T(8,128) layout — the minor dim W pads to 128, a
    # 64x HBM blowup that OOMed the 4.6 Mbp graph build (cap 8.4M:
    # 4.3 GB per temp).
    klanes = [keys[:, w] for w in range(W)]
    # all 8 extension queries (2 orientations x 4 bases)
    q_lanes = [[] for _ in range(W)]   # per word: list of 9 segments
    orients = []
    tlanes = [jnp.where(alive, ln, jnp.uint32(SENTINEL)) for ln in klanes]
    for w in range(W):
        q_lanes[w].append(tlanes[w])
    for o in (0, 1):
        ok = klanes if o == 0 else _ln_revcomp(klanes, k)
        shifted = _ln_shl2(ok, k)
        for b in range(4):
            q = list(shifted)
            q[-1] = q[-1] | np.uint32(b)
            rc = _ln_revcomp(q, k)
            is_fwd = _ln_le(q, rc)
            for w in range(W):
                canon = jnp.where(is_fwd, q[w], rc[w])
                q_lanes[w].append(jnp.where(alive, canon,
                                            jnp.uint32(SENTINEL)))
            orients.append(jnp.where(is_fwd, 0, 1).astype(jnp.uint8))
    # SORT-JOIN instead of binary search: XLA's TPU sort runs near
    # bandwidth while a 25-round binary search is 25 giant random
    # gathers (~10x slower measured). Table rows and query rows sort
    # together by (key, tag); within an equal-key run the unique table
    # row sorts first (smaller tag) and a cummax forward-fill hands its
    # index to every query in the run.
    m = 9 * cap
    all_lanes = [jnp.concatenate(q_lanes[w], axis=0) for w in range(W)]
    tag = jnp.arange(m, dtype=jnp.uint32)             # table rows first
    ops = tuple(all_lanes) + (tag,)
    out_s = jax.lax.sort(ops, num_keys=W + 1)
    slanes = out_s[:W]
    stag = out_s[W]
    is_table = stag < cap
    pos = jnp.arange(m, dtype=jnp.int32)
    neq = slanes[0][1:] != slanes[0][:-1]
    for w in range(1, W):
        neq = neq | (slanes[w][1:] != slanes[w][:-1])
    is_new = jnp.concatenate([jnp.ones((1,), bool), neq])
    # a run's table row (unique keys) sorts FIRST in its run, so it sits
    # exactly at the run start; and since the table itself is key-sorted,
    # table tags are MONOTONE in sorted position — three int32 cummaxes
    # recover, for every row, its run's table index (if any)
    run_start = jax.lax.cummax(jnp.where(is_new, pos, -1))
    tbl_start = jax.lax.cummax(jnp.where(is_new & is_table, pos, -1))
    tbl_tag = jax.lax.cummax(
        jnp.where(is_new & is_table, stag.astype(jnp.int32), -1))
    ok_match = tbl_start >= run_start
    ans = jnp.where(ok_match, tbl_tag, INVALID)
    # route answers back to query order: sort by tag
    back = jax.lax.sort((stag, ans), num_keys=1)
    idx_all = back[1][cap:]
    idx_all = jnp.where(
        (idx_all >= 0) & (idx_all < n)
        & alive[jnp.clip(idx_all, 0, cap - 1)], idx_all, INVALID)
    # TOPO LAYOUT: (2, 4, cap) with the node axis MINOR-MOST. The former
    # (cap, 2, 4) form tiled to T(2,128) — minor dim 4 padded to 128, a
    # 32x HBM blowup (8 GB per tensor at the 4.6 Mbp cap of 8.4M).
    succ_idx = idx_all.reshape(2, 4, cap)
    succ_orient = jnp.stack(orients, axis=0).reshape(2, 4, cap)
    exists = succ_idx >= 0
    out = jnp.sum(jnp.where(exists,
                            (jnp.uint8(1)
                             << jnp.arange(4, dtype=jnp.uint8))[None, :,
                                                                None],
                            0), axis=1).astype(jnp.uint8)     # (2, cap)
    outdeg = popcount4(out)
    is_junction = alive & ((outdeg[0] >= 2) | (outdeg[1] >= 2))
    return succ_idx, succ_orient, out, outdeg, is_junction


# ---------------------------------------------------------------------------
# labeling kernel (jitted once per capacity)
# ---------------------------------------------------------------------------

def _doubling_rank(ptr, rank, anchor, iters):
    """Adaptive pointer-doubling list ranking: early-exits once every
    chain pointer has died (gathers are the TPU's weakest op — measured
    68 ms PER 4M-row gather — so doubling rounds beyond log2(longest
    chain) are pure waste; `iters` is only the safety cap). Cycle nodes
    never die, so with cycles present the loop runs to the cap."""
    m = ptr.shape[0]

    def cond(state):
        it, ptr, rank, anchor = state
        return (it < iters) & jnp.any(ptr >= 0)

    def body(state):
        it, ptr, rank, anchor = state
        has = ptr >= 0
        p = jnp.clip(ptr, 0, m - 1)
        rank = jnp.where(has, rank + rank[p], rank)
        anchor = jnp.where(has, anchor[p], anchor)
        ptr = jnp.where(has, ptr[p], ptr)
        return it + 1, ptr, rank, anchor

    _, ptr, rank, anchor = jax.lax.while_loop(
        cond, body, (jnp.int32(0), ptr, rank, anchor))
    return ptr, rank, anchor


def _interleave2(a, b):
    """[a0, b0, a1, b1, ...] from two (n,) arrays via 1-D gathers (a
    stack+reshape materializes an (n, 2) minor-2 temp — the layout trap)."""
    n = a.shape[0]
    idx = jnp.arange(2 * n, dtype=jnp.int32)
    half = idx >> 1
    return jnp.where((idx & 1) == 0, a[half], b[half])


def _label_core(succ_idx, succ_orient, outdeg, is_junction, alive, counts,
                iters: int):
    cap = alive.shape[0]
    m = 2 * cap

    # chain-next over oriented nodes: link (i,o) -> (s,p) iff i alive
    # non-junction with outdeg(i,o)==1 and s alive non-junction.
    # Topo is (2, 4, cap) node-minor; per-orientation work stays 1-D.
    nxt_o = []
    for o in (0, 1):
        uniq = outdeg[o] == 1
        row = succ_idx[o]                      # (4, cap)
        bsel = jnp.argmax(row >= 0, axis=0)    # (cap,)
        nidx = jnp.arange(cap, dtype=jnp.int32)
        s = row[bsel, nidx]
        p = succ_orient[o][bsel, nidx]
        s_ok = (s >= 0) & ~is_junction[jnp.clip(s, 0, cap - 1)]
        src_ok = alive & ~is_junction & uniq
        nxt_o.append(jnp.where(src_ok & s_ok,
                               2 * s + p.astype(jnp.int32), INVALID))
    nxt = _interleave2(nxt_o[0], nxt_o[1])  # (2N,) oriented id 2i+o

    arange = jnp.arange(m, dtype=jnp.int32)
    twin = arange ^ 1
    nt = nxt[twin]
    prv = jnp.where(nt >= 0, nt ^ 1, INVALID)

    # ONE ranking pass handles the common (cycle-free) graph: leftover
    # live pointers afterwards ARE the cycle members, and only then does
    # the cut-and-rerank branch run (lax.cond). The former structure paid
    # 4 full doubling passes (cycle detect, min-pair, rank, tail) every
    # labeling — ~60% of end-to-end `assemble` wall clock at round 3.
    rank0 = jnp.where(prv >= 0, 1, 0).astype(jnp.int32)
    anchor0 = jnp.where(prv >= 0, prv, arange)
    ptr_rem, rank_nc, head_nc = _doubling_rank(prv, rank0, anchor0, iters)
    has_cycle = jnp.any(ptr_rem >= 0)

    def cut_and_rerank(_):
        # mirror-consistent canonical cut: edge (j -> nxt[j]) and its
        # strand mirror share the sorted id pair {j, nxt[j]^1}; cutting
        # the lexicographically smallest pair picks the same physical cut
        # on both strands so cycles reduce to ordinary twin chains.
        in_cycle = ptr_rem >= 0
        ea = jnp.where(nxt >= 0, jnp.minimum(arange, nxt ^ 1), m)
        eb = jnp.where(nxt >= 0, jnp.maximum(arange, nxt ^ 1), m)
        cyc_ptr = jnp.where(in_cycle, prv, INVALID)

        def minpair_body(_, state):
            ptr, a, bb = state
            has = ptr >= 0
            pp = jnp.clip(ptr, 0, m - 1)
            ap, bp = a[pp], bb[pp]
            better = has & ((ap < a) | ((ap == a) & (bp < bb)))
            a = jnp.where(better, ap, a)
            bb = jnp.where(better, bp, bb)
            ptr = jnp.where(has, ptr[pp], ptr)
            return ptr, a, bb

        _, ma, mb = jax.lax.fori_loop(0, iters, minpair_body,
                                      (cyc_ptr, ea, eb))
        cut_here = in_cycle & (ea == ma) & (eb == mb)
        nxt2 = jnp.where(cut_here, INVALID, nxt)
        nt2 = nxt2[twin]
        prv2 = jnp.where(nt2 >= 0, nt2 ^ 1, INVALID)
        r0 = jnp.where(prv2 >= 0, 1, 0).astype(jnp.int32)
        a0 = jnp.where(prv2 >= 0, prv2, arange)
        _, rank2, head2 = _doubling_rank(prv2, r0, a0, iters)
        return nxt2, prv2, rank2, head2

    def no_cycle(_):
        return nxt, prv, rank_nc, head_nc

    nxt, prv, rank, head = jax.lax.cond(has_cycle, cut_and_rerank,
                                        no_cycle, None)
    # chain tail via twin symmetry: the twin chain (prv-mirror) of i's
    # chain starts at (tail of i's chain)^1, so tail = head[twin] ^ 1 —
    # this replaces a third full doubling pass with one gather.
    tail = head[twin] ^ 1

    node_alive_nonj = alive & ~is_junction
    oriented_valid = jnp.repeat(node_alive_nonj, 2)
    is_head = oriented_valid & (prv == INVALID)
    rep = is_head & (arange <= (tail ^ 1))

    rep_i = jnp.cumsum(rep.astype(jnp.int32)) - 1
    num_u = jnp.sum(rep.astype(jnp.int32))
    head_uid = jnp.where(rep, rep_i, INVALID)

    uid_o = head_uid[head]
    twin_head = tail ^ 1
    uid_t = head_uid[twin_head]
    use_twin = (uid_o < 0) & (uid_t >= 0)
    uid_j = jnp.where(use_twin, uid_t, uid_o)
    chain_len = rank[tail] + 1
    pos_j = jnp.where(use_twin, chain_len - 1 - rank, rank)
    orient_j = jnp.where(use_twin, (arange ^ 1) & 1, arange & 1)

    # per-node pick of the oriented slot carrying a uid: strided 1-D
    # slices (a reshape to (cap, 2) materializes minor-2 padded temps)
    uid_e, uid_d = uid_j[0::2], uid_j[1::2]
    pos_e, pos_d = pos_j[0::2], pos_j[1::2]
    ori_e, ori_d = orient_j[0::2], orient_j[1::2]
    use_e = uid_e >= 0
    uid = jnp.where(use_e, uid_e, uid_d)
    upos = jnp.where(use_e, pos_e, pos_d)
    uorient = jnp.where(use_e, ori_e, ori_d)
    uid = jnp.where(node_alive_nonj, uid, INVALID)

    # per-unitig stats (capacity-sized, trimmed on host)
    seg = jnp.where(uid >= 0, uid, cap)
    ulen = jnp.zeros((cap,), jnp.int32).at[seg].add(
        jnp.where(uid >= 0, 1, 0), mode="drop")
    csum = jnp.zeros((cap,), jnp.float32).at[seg].add(
        jnp.where(uid >= 0, counts.astype(jnp.float32), 0.0), mode="drop")
    ucov = jnp.floor(csum / jnp.maximum(ulen, 1) + 0.5).astype(jnp.uint32)

    heads_idx = jnp.nonzero(rep, size=cap, fill_value=0)[0].astype(jnp.int32)
    utail = tail[heads_idx]

    return uid, upos, uorient, num_u, ulen, ucov, heads_idx, utail


_label_kernel = functools.partial(jax.jit,
                                  static_argnames=("iters",))(_label_core)


def _mask_topo_core(succ_idx, succ_orient, alive_new):
    """Traceable body of _mask_topo_kernel. Topo arrays are (2, 4, cap)
    node-minor (see _adjacency_kernel)."""
    cap = alive_new.shape[0]
    tgt_ok = (succ_idx >= 0) & alive_new[jnp.clip(succ_idx, 0, cap - 1)]
    ok = tgt_ok & alive_new[None, None, :]
    si = jnp.where(ok, succ_idx, INVALID)
    so = jnp.where(ok, succ_orient, 0)
    out = jnp.sum(jnp.where(si >= 0,
                            (jnp.uint8(1)
                             << jnp.arange(4, dtype=jnp.uint8))[None, :,
                                                                None],
                            0), axis=1).astype(jnp.uint8)
    outdeg = popcount4(out)
    is_junction = alive_new & ((outdeg[0] >= 2) | (outdeg[1] >= 2))
    return si, so, out, outdeg, is_junction


@dataclass
class Unitigs:
    """Unitig labeling of the alive node set (host-side handles).

    uid/upos/uorient: per NODE (k-mer): unitig id (-1 for junctions/dead),
      k-mer position within the unitig, orientation of the node as traversed.
    ulen: (U,) k-mer count per unitig (reference Straight.length semantics).
    ucov: (U,) coverage = floor(sum(counts)/ulen + 0.5) (graph.h:571).
    uhead/utail: (U,) oriented-node id (2*i+o) of first/last k-mer.
    is_junction: per-node junction mask.
    """

    uid: np.ndarray
    upos: np.ndarray
    uorient: np.ndarray
    ulen: np.ndarray
    ucov: np.ndarray
    uhead: np.ndarray
    utail: np.ndarray
    is_junction: np.ndarray
    num_unitigs: int


# ---------------------------------------------------------------------------
# sequence materialization kernel
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("k", "lmax", "rows"))
def _sequence_kernel(keys, uid, upos, uorient, k: int, lmax: int,
                     rows: int):
    """Materialize unitig sequences into a (rows, lmax) buffer.

    rows = padded UNITIG count (not node capacity — a clean assembly has
    few long unitigs, so (cap, lmax) would explode). Last bases scatter
    per node; the k-1 head bases come from a per-unitig GATHER of the
    head node (a (N, k-1, 2) scatter-index tensor tiles to T(8,128) on
    TPU with ~64x padding — 16 GB at 1M nodes). The oriented-key
    computation runs lane-wise (a (cap, W) elementwise temp pads W->128)."""
    cap = keys.shape[0]
    W = keys.shape[-1]
    klanes = [keys[:, w] for w in range(W)]
    rlanes = _ln_revcomp(klanes, k)
    fwd = uorient == 0
    olanes = [jnp.where(fwd, klanes[w], rlanes[w]) for w in range(W)]
    last_base = (olanes[-1] & 3).astype(jnp.uint8)
    member = (uid >= 0) & (uid < rows)
    seg_u = jnp.where(member, uid, rows)
    col = jnp.clip(upos + k - 1, 0, lmax - 1)
    seqs = jnp.full((rows + 1, lmax), 4, dtype=jnp.uint8)
    seqs = seqs.at[seg_u, col].set(last_base, mode="drop")
    # head node index per unitig, then gather its first k-1 bases
    # (per-lane gathers; only the SMALL (rows+1, W) result is stacked)
    head_slot = jnp.where(member & (upos == 0), uid, rows)
    hn = jnp.zeros((rows + 1,), jnp.int32).at[head_slot].set(
        jnp.arange(cap, dtype=jnp.int32), mode="drop")
    head_words = jnp.stack([ol[hn] for ol in olanes], axis=-1)
    head_codes = kmer_to_codes(head_words, k)        # (rows+1, k)
    seqs = seqs.at[:, : k - 1].set(head_codes[:, : k - 1])
    return seqs[:rows]


@functools.partial(jax.jit, static_argnames=("k", "flatcap"))
def _sequence_flat_kernel(keys, uid, upos, uorient, offsets, num_u,
                          k: int, flatcap: int):
    """Materialize ALL unitig sequences into one flat base buffer
    (offsets[u] = start of unitig u, length = ulen[u] + k - 1).

    The padded (U, lmax) matrix form transferred mostly padding — up to
    hundreds of MB per k step over the device tunnel; the flat buffer is
    exactly total-bases bytes."""
    cap = keys.shape[0]
    ucap = offsets.shape[0]
    W = keys.shape[-1]
    # lane-wise orientation (a (cap, W) elementwise temp pads W->128)
    klanes = [keys[:, w] for w in range(W)]
    rlanes = _ln_revcomp(klanes, k)
    fwd = uorient == 0
    olanes = [jnp.where(fwd, klanes[w], rlanes[w]) for w in range(W)]
    last_base = (olanes[-1] & 3).astype(jnp.uint8)
    member = uid >= 0
    base = offsets[jnp.clip(uid, 0, ucap - 1)]
    flat_pos = jnp.where(member, base + upos + (k - 1), flatcap)
    flat = jnp.full((flatcap + 1,), 4, dtype=jnp.uint8)
    flat = flat.at[flat_pos].set(last_base, mode="drop")
    # heads: first k-1 bases per unitig written at its offset
    head_slot = jnp.where(member & (upos == 0), uid, ucap)
    hn = jnp.zeros((ucap + 1,), jnp.int32).at[head_slot].set(
        jnp.arange(cap, dtype=jnp.int32), mode="drop")
    head_words = jnp.stack([ol[hn[:ucap]] for ol in olanes], axis=-1)
    head_codes = kmer_to_codes(head_words, k)            # (ucap, k)
    in_u = jnp.arange(ucap) < num_u
    hpos = jnp.where(in_u[:, None],
                     offsets[:, None] + jnp.arange(k - 1)[None, :],
                     flatcap)
    flat = flat.at[hpos.reshape(-1)].set(
        head_codes[:, : k - 1].reshape(-1), mode="drop")
    return flat[:flatcap]


class DBG:
    """The graph state: sorted canonical k-mer table + alive mask.

    Mutation = flipping `alive` bits (the reference deletes by writing
    UINT16_MAX coverage, graph.h:95); topology/labeling are recomputed in
    bulk after each cleaning round — the functional equivalent of
    concatinateNodes (graph.h:934-1033).
    """

    def __init__(self, k: int, keys, counts, n: int | None = None):
        self.k = k
        if (isinstance(keys, jax.Array) and n is not None
                and keys.shape[0] >= next_pow2(int(n))):
            # device-resident input (e.g. from ops.count.filter_by_count):
            # tails are already SENTINEL/0, so slicing to capacity avoids a
            # host round trip of the whole table
            self.n = int(n)
            cap = next_pow2(self.n)
            self.keys = keys[:cap]
            self.counts = counts[:cap].astype(jnp.uint32)
        else:
            keys = np.asarray(keys)
            counts = np.asarray(counts, dtype=np.uint32)
            self.n = int(n if n is not None else keys.shape[0])
            cap = next_pow2(self.n)
            self.keys = jnp.asarray(pad_rows(keys[: self.n],
                                             cap, np.uint32(0xFFFFFFFF)))
            self.counts = jnp.asarray(pad_rows(counts[: self.n], cap, 0))
        self.alive = jnp.arange(cap) < self.n
        self._topo = None
        self._unitigs = None

    @property
    def capacity(self) -> int:
        return int(self.keys.shape[0])

    def invalidate(self):
        self._topo = None
        self._unitigs = None
        self._unitigs_dev = None

    @property
    def topo(self):
        """(succ_idx (2,4,cap), succ_orient (2,4,cap), out (2,cap) u8,
        outdeg (2,cap) i32, is_junction (cap,)) — node axis minor-most
        (see _adjacency_kernel's layout note)."""
        if self._topo is None:
            self._topo = _adjacency_kernel(self.keys, self.alive,
                                           jnp.int32(self.n), self.k)
        return self._topo

    def topo_host(self):
        """Host copies in the node-major convention host code indexes:
        (si (cap,2,4), so (cap,2,4), out (cap,2), outdeg (cap,2),
        is_junction (cap,))."""
        si, so, out, od, isj = self.topo
        return (np.asarray(si).transpose(2, 0, 1),
                np.asarray(so).transpose(2, 0, 1),
                np.asarray(out).T, np.asarray(od).T, np.asarray(isj))

    def label_unitigs_device(self):
        """Raw device labeling tuple (uid, upos, uorient, num_u_dev, ulen,
        ucov, uhead, utail) — cached; device-side consumers (cut_branch)
        use this directly so no capacity-sized array crosses the host
        boundary per cleaning round."""
        if getattr(self, "_unitigs_dev", None) is None:
            succ_idx, succ_orient, out, outdeg, is_junction = self.topo
            iters = max(1, math.ceil(math.log2(max(self.capacity, 2))) + 1)
            self._unitigs_dev = _label_kernel(
                succ_idx, succ_orient, outdeg, is_junction, self.alive,
                self.counts, iters)
        return self._unitigs_dev

    def label_unitigs(self) -> Unitigs:
        if self._unitigs is not None:
            return self._unitigs
        uid, upos, uorient, num_u, ulen, ucov, uhead, utail = \
            self.label_unitigs_device()
        _, _, _, _, is_junction = self.topo
        num_u = int(num_u)
        self._unitigs = Unitigs(
            uid=np.asarray(uid), upos=np.asarray(upos),
            uorient=np.asarray(uorient), ulen=np.asarray(ulen)[:num_u],
            ucov=np.asarray(ucov)[:num_u], uhead=np.asarray(uhead)[:num_u],
            utail=np.asarray(utail)[:num_u],
            is_junction=np.asarray(is_junction), num_unitigs=num_u)
        return self._unitigs

    # -- sequences ---------------------------------------------------------
    def unitig_sequences_flat(self):
        """(flat uint8 buffer, offsets (U,) int64, base_lens (U,) int64):
        unitig u's bases are flat[offsets[u]: offsets[u] + base_lens[u]].
        Only total-bases bytes cross the host boundary."""
        uid, upos, uorient, num_u_d, ulen, ucov, uhead, utail = \
            self.label_unitigs_device()
        k = self.k
        num_u = int(num_u_d)
        if num_u == 0:
            return (np.zeros((0,), np.uint8), np.zeros((0,), np.int64),
                    np.zeros((0,), np.int64))
        base_lens = np.asarray(ulen[:num_u]).astype(np.int64) + k - 1
        offs = np.zeros(num_u, np.int64)
        offs[1:] = np.cumsum(base_lens)[:-1]
        total = int(base_lens.sum())
        flatcap = next_pow2(total, minimum=1024)
        ucap = ulen.shape[0]
        offs_dev = np.zeros(ucap, np.int64)
        offs_dev[:num_u] = offs
        flat = _sequence_flat_kernel(self.keys, uid, upos, uorient,
                                     jnp.asarray(offs_dev), num_u_d,
                                     k, flatcap)
        return np.asarray(flat[:total]), offs, base_lens

    def unitig_sequences(self) -> tuple[np.ndarray, np.ndarray]:
        """(seqs (U, lmax) uint8 padded with 4, base lengths (U,) =
        ulen + k - 1). Head contributes its first k-1 bases; every node its
        last base in traversal orientation. Built host-side from the flat
        buffer (the padded matrix never crosses the device boundary)."""
        flat, offs, base_lens = self.unitig_sequences_flat()
        num_u = len(base_lens)
        if num_u == 0:
            return np.zeros((0, 0), np.uint8), np.zeros((0,), np.int64)
        lmax = next_pow2(int(base_lens.max()), minimum=64)
        seqs = np.full((num_u, lmax), 4, dtype=np.uint8)
        for i in range(num_u):
            seqs[i, : base_lens[i]] = flat[offs[i]: offs[i] + base_lens[i]]
        return seqs, base_lens

    def junction_info(self):
        """(indices, counts) of alive junction k-mers. Gathers on device
        so only the (small) junction rows cross the host boundary."""
        _, _, _, _, is_junction = self.topo
        idx = np.nonzero(np.asarray(is_junction))[0]
        if len(idx) == 0:
            return idx, np.zeros(0, np.uint32)
        return idx, np.asarray(self.counts[jnp.asarray(idx)])

    # -- mutation ----------------------------------------------------------
    def delete_nodes(self, node_mask) -> None:
        """Kill nodes (the bulk analog of deleteStraight, graph.h:934+).

        When a topology snapshot exists, it updates INCREMENTALLY
        (edges to dead nodes vanish, junction status recomputes) — no
        re-lookup of the whole key table per cleaning round. Labeling
        still recomputes (chains merge)."""
        self.alive = self.alive & ~jnp.asarray(node_mask)
        if self._topo is not None:
            si, so, _out, _od, _isj = self._topo
            self._topo = _mask_topo_kernel(si, so, self.alive)
            self._unitigs = None
            self._unitigs_dev = None
        else:
            self.invalidate()

    def delete_unitigs(self, unitig_mask: np.ndarray) -> None:
        u = self.label_unitigs()
        umask = np.asarray(unitig_mask)
        node_kill = np.zeros(self.capacity, dtype=bool)
        sel = u.uid >= 0
        node_kill[sel] = umask[u.uid[sel]]
        self.delete_nodes(node_kill)

    def num_alive(self) -> int:
        return int(jnp.sum(self.alive.astype(jnp.int32)))
