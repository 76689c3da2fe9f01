"""Graph simplification: masked bulk rounds iterated to fixed point.

Functional equivalents of the reference's OpenMP table sweeps:
- cut_branch            <- BruijnGraph::cutBranch (graph.h:830-926)
- delete_erroneous      <- deleteErroneousStraightNode (graph.h:2033-2082)
- crush_bubble          <- crushBubble (graph.h:592-681)
- *_iterative drivers   <- cutBranchIterative / crushBubbleIterative /
                           deleteErroneousStraightNodeIterative
                           (graph.h:1830-1870, 2086-2106)

Each pass computes delete/crush decisions from one immutable snapshot of
the graph and applies them at once; relabeling after each round plays the
role of concatinateNodes (graph.h:934-1033). The reference's in-pass
mutation order can differ on ties — parity is defined on the converged
fixed point (SURVEY §4 determinism caveat).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..ops.align import edit_distance_batch
from ..utils.log import LOG
from .dbg import DBG

BUBBLE_COVERAGE_RATE = 1.5  # graph.h:283


@dataclass
class CrushedBubble:
    """A crushed bubble record for the _bubble.fa output and HeteroMapper
    (graph.h:667-676 bubbleFP writes: base length, coverage, seq)."""

    seq: np.ndarray  # base codes, full branch (ulen + k - 1 bases)
    coverage: int


def _unitig_ends(dbg: DBG):
    """Per-unitig end attachments.

    Returns dict with, for each side (0=head, 1=tail):
      junc[side]  (U,) int32 node index of the attached junction, -1 if free
      jorient[side] (U,) orientation of the junction node as entered
    A chain end's unique extension always lands on a junction (chain_next
    would have absorbed a non-junction neighbor).
    """
    u = dbg.label_unitigs()
    si, so, _out, od, _isj = dbg.topo_host()

    res = {}
    for side, ends in ((0, u.uhead), (1, u.utail)):
        i = ends >> 1
        o = ends & 1
        # head side looks backwards: orientation o^1; tail side forwards: o
        look = (1 - o) if side == 0 else o
        deg = od[i, look]
        b = np.argmax(si[i, look] >= 0, axis=-1)
        tgt = si[i, look, b]
        tgt_or = so[i, look, b]
        attached = (deg == 1) & (tgt >= 0)
        res[side] = (np.where(attached, tgt, -1),
                     np.where(attached, tgt_or, 0))
    return res


def _sibling_max_coverage(dbg: DBG, j_nodes: np.ndarray, j_orient: np.ndarray,
                          exclude_uid: np.ndarray) -> np.ndarray:
    """For each (junction, orientation) pair: max coverage over its branches
    excluding branches that lead into unitig `exclude_uid`.

    Branch coverage = the branch unitig's coverage if it leads to a chain,
    or the branch junction k-mer's count (graph.h:866-877).
    """
    u = dbg.label_unitigs()
    si, _so, _out, _od, isj = dbg.topo_host()
    counts = np.asarray(dbg.counts)
    uid = u.uid

    # NOTE: junction orientation here: the tip enters junction J with
    # orientation q; the sibling branches of the tip are the *other* edges
    # of J on the side the tip came from, i.e. out[J, 1-q].
    q = 1 - j_orient
    maxcov = np.zeros(len(j_nodes), dtype=np.int64)
    for b in range(4):
        tgt = si[j_nodes, q, b]
        has = tgt >= 0
        t = np.clip(tgt, 0, len(isj) - 1)
        cov_j = counts[t]
        cov_u = np.where(uid[t] >= 0, u.ucov[np.clip(uid[t], 0, max(u.num_unitigs - 1, 0))], 0)
        cov = np.where(isj[t], cov_j, cov_u)
        cov = np.where(has & (np.where(uid[t] >= 0, uid[t], -2) != exclude_uid), cov, 0)
        maxcov = np.maximum(maxcov, cov)
    return maxcov


import functools

import jax
import jax.numpy as jnp


def _cut_branch_kernel_core(succ_idx, succ_orient, outdeg, is_junction,
                            counts, uid, ulen, ucov, uhead, utail, num_u,
                            k, branch_threshold):
    """Device tip-clipping decision (graph.h:830-926): returns
    (node_kill mask over capacity, n_killed unitigs). Everything stays in
    HBM — the former host version pulled three capacity-sized label
    arrays over the device tunnel EVERY cleaning round, which dominated
    end-to-end assemble wall clock."""
    ucap = ulen.shape[0]
    cap = uid.shape[0]
    in_range = jnp.arange(ucap) < num_u

    def pick2(slab, look, i):
        """slab is (2, 4, cap) node-minor; select [look_j, b, i_j] per
        element as 1-D gathers (no (U, 4) row materialization in the
        padded node-major layout)."""
        return [jnp.where(look == 0, slab[0, b][i], slab[1, b][i])
                for b in range(4)]

    def end_attach(ends, side):
        i = ends >> 1
        o = ends & 1
        look = (1 - o) if side == 0 else o
        deg = jnp.where(look == 0, outdeg[0][i], outdeg[1][i])
        rows = pick2(succ_idx, look, i)
        ors = pick2(succ_orient, look, i)
        tgt = jnp.full_like(ends, -1)
        tor = jnp.zeros_like(ends)
        found = jnp.zeros(ends.shape, bool)
        for b in range(4):
            take = ~found & (rows[b] >= 0)
            tgt = jnp.where(take, rows[b], tgt)
            tor = jnp.where(take, ors[b], tor)
            found = found | (rows[b] >= 0)
        attached = (deg == 1) & (tgt >= 0)
        return jnp.where(attached, tgt, -1), jnp.where(attached, tor, 0)

    head_j, head_q = end_attach(uhead, 0)
    tail_j, tail_q = end_attach(utail, 1)
    short = ulen <= k
    one_side = (head_j >= 0) ^ (tail_j >= 0)
    tip = short & one_side & in_range

    jn = jnp.clip(jnp.where(head_j >= 0, head_j, tail_j), 0, cap - 1)
    jq = jnp.where(head_j >= 0, head_q, tail_q)
    q = 1 - jq
    uidx = jnp.arange(ucap)
    maxcov = jnp.zeros(ucap, dtype=jnp.int64)
    sib_rows = pick2(succ_idx, q, jn)
    for b in range(4):
        tgt = sib_rows[b]
        has = tgt >= 0
        t = jnp.clip(tgt, 0, cap - 1)
        cov_j = counts[t].astype(jnp.int64)
        tu = jnp.clip(uid[t], 0, ucap - 1)
        cov_u = jnp.where(uid[t] >= 0, ucov[tu].astype(jnp.int64), 0)
        cov = jnp.where(is_junction[t], cov_j, cov_u)
        cov = jnp.where(has & (jnp.where(uid[t] >= 0, uid[t], -2) != uidx),
                        cov, 0)
        maxcov = jnp.maximum(maxcov, cov)

    kill_u = tip & (ucov.astype(jnp.float32)
                    <= maxcov.astype(jnp.float32) * branch_threshold)
    n_kill = jnp.sum(kill_u.astype(jnp.int32))
    node_uid = jnp.clip(uid, 0, ucap - 1)
    node_kill = (uid >= 0) & kill_u[node_uid]
    return node_kill, n_kill


_cut_branch_kernel = functools.partial(
    jax.jit, static_argnames=("k",))(_cut_branch_kernel_core)


def cut_branch(dbg: DBG, branch_threshold: float = 0.5) -> int:
    """One tip-clipping round (graph.h:830-926), fully device-side.

    A tip is a unitig with <= k k-mers, attached to a junction on exactly
    one side, dead-ended on the other; it is deleted when its coverage <=
    branch_threshold * (max sibling branch coverage at that junction).
    """
    succ_idx, succ_orient, out, outdeg, is_junction = dbg.topo
    uid, upos, uorient, num_u, ulen, ucov, uhead, utail = \
        dbg.label_unitigs_device()
    node_kill, n_kill = _cut_branch_kernel(
        succ_idx, succ_orient, outdeg, is_junction, dbg.counts,
        uid, ulen, ucov, uhead, utail, num_u, dbg.k,
        jnp.float32(branch_threshold))
    n_kill = int(n_kill)
    if n_kill:
        dbg.delete_nodes(node_kill)
    return n_kill


@jax.jit
def _delete_erroneous_kernel(uid, ulen, ucov, num_u, length_cut,
                             coverage_cut):
    ucap = ulen.shape[0]
    in_range = jnp.arange(ucap) < num_u
    kill_u = in_range & (ulen < length_cut) \
        & (ucov.astype(jnp.float32) < coverage_cut)
    n_kill = jnp.sum(kill_u.astype(jnp.int32))
    node_kill = (uid >= 0) & kill_u[jnp.clip(uid, 0, ucap - 1)]
    return node_kill, n_kill


def delete_erroneous(dbg: DBG, length_cut: int, coverage_cut: float) -> int:
    """deleteErroneousStraightNode (graph.h:2033-2082): kill unitigs with
    ulen < length_cut AND coverage < coverage_cut (device-side)."""
    uid, upos, uorient, num_u, ulen, ucov, uhead, utail = \
        dbg.label_unitigs_device()
    node_kill, n_kill = _delete_erroneous_kernel(
        uid, ulen, ucov, num_u, jnp.int32(min(length_cut, 2**31 - 1)),
        jnp.float32(min(coverage_cut, 3.4e38)))
    n_kill = int(n_kill)
    if n_kill:
        dbg.delete_nodes(node_kill)
    return n_kill


def cut_branch_iterative(dbg: DBG, branch_threshold: float = 0.5) -> int:
    """cutBranchIterative (graph.h:1830-1845): fixed point of tip clipping.

    ONE device labeling feeds a host-side element-level replay
    (_ChainSim): each round's relabel-after-merge happens on the ~100x
    smaller unitig/junction graph instead of re-running the full
    pointer-doubling kernel (which cost 4-5 s/round at 1 Mbp scale)."""
    LOG.info("removing branches...")
    sim = _ChainSim(dbg)
    total = 0
    while True:
        n = sim.cut_branch_round(branch_threshold)
        if n == 0:
            break
        total += n
    LOG.counter("NUM_CUT", total)
    if total:
        sim.apply()
    return total


def delete_erroneous_iterative(dbg: DBG, length_cut: int, coverage_cut: float,
                               branch_threshold: float = 0.5) -> int:
    """deleteErroneousStraightNodeIterative (graph.h:2086-2106): alternate
    cutBranch + deleteErroneousStraightNode until quiescent — replayed on
    the element-level chain graph like cut_branch_iterative."""
    LOG.info("removing erroneous nodes...")
    sim = _ChainSim(dbg)
    total = 0
    while True:
        n1 = sim.cut_branch_round(branch_threshold)
        n2 = sim.delete_erroneous_round(min(length_cut, 2**62),
                                        min(coverage_cut, 3.4e38))
        if n1 + n2 == 0:
            break
        total += n1 + n2
    LOG.counter("TOTAL_NUM_REMOVED_NODES", total)
    if total:
        sim.apply()
    return total


def crush_bubble(dbg: DBG, average_coverage: float,
                 bubble_threshold: float = 0.1,
                 crushed: list[CrushedBubble] | None = None) -> int:
    """One bubble-crush round (graph.h:592-681).

    Branch pairs that start and end at the same junction pair, whose summed
    coverage <= average_coverage * 1.5 + 0.5, and whose middle sections are
    within edit distance (max_len + k - 1) * bubble_threshold + 0.5 are
    clustered; the max-coverage member of each cluster survives and absorbs
    the crushed members' coverage (graph.h:660-663).
    """
    k = dbg.k
    u = dbg.label_unitigs()
    if u.num_unitigs == 0:
        return 0
    ends = _unitig_ends(dbg)
    head_j, _head_q = ends[0]
    tail_j, _tail_q = ends[1]

    both = (head_j >= 0) & (tail_j >= 0)
    cand = np.nonzero(both)[0]
    if len(cand) == 0:
        return 0

    cov_threshold = min(int(average_coverage * BUBBLE_COVERAGE_RATE + 0.5), 0xFFFF)
    if average_coverage >= 0xFFFF:
        cov_threshold = 0xFFFF

    # group candidate branches by unordered junction pair
    ja = np.minimum(head_j[cand], tail_j[cand])
    jb = np.maximum(head_j[cand], tail_j[cand])
    order = np.lexsort((jb, ja))
    cand = cand[order]
    ja, jb = ja[order], jb[order]
    grp_new = np.ones(len(cand), dtype=bool)
    grp_new[1:] = (ja[1:] != ja[:-1]) | (jb[1:] != jb[:-1])
    grp_id = np.cumsum(grp_new) - 1

    # sequences (only materialize once per round)
    seqs, base_lens = dbg.unitig_sequences()

    # orient every branch from the smaller junction (ja) to the larger: if
    # the stored traversal enters from tail_j == ja, flip
    def branch_seq(ui):
        s = seqs[ui, : base_lens[ui]]
        if min(head_j[ui], tail_j[ui]) != head_j[ui]:
            s = (3 - s[::-1]) % 5
            s = np.where(s > 3, 4, s)
        return s

    # pairwise bubble test inside each group
    pairs_a, pairs_b = [], []
    for g in range(grp_id[-1] + 1 if len(grp_id) else 0):
        members = cand[grp_id == g]
        if len(members) < 2:
            continue
        for x in range(len(members) - 1):
            for y in range(x + 1, len(members)):
                u1, u2 = members[x], members[y]
                if int(u.ucov[u1]) + int(u.ucov[u2]) > cov_threshold:
                    continue
                pairs_a.append(u1)
                pairs_b.append(u2)
    if not pairs_a:
        return 0
    pairs_a = np.array(pairs_a)
    pairs_b = np.array(pairs_b)

    len_a = u.ulen[pairs_a].astype(np.int64)
    len_b = u.ulen[pairs_b].astype(np.int64)
    thr = ((np.maximum(len_a, len_b) + k - 1) * bubble_threshold + 0.5).astype(np.int64)

    # short rule (graph.h:627-636): min length + 1 <= k -> compare lengths
    short = np.minimum(len_a, len_b) + 1 <= k
    ok_short = short & (np.abs(len_a - len_b) <= thr)

    # long rule: edit distance of middle sections, base positions
    # [k-1, ulen) of the ja->jb oriented branch (alignment length ulen-k+1)
    need_align = ~short
    ok_align = np.zeros(len(pairs_a), dtype=bool)
    if need_align.any():
        ai = np.nonzero(need_align)[0]
        mida = [branch_seq(pairs_a[i])[k - 1: u.ulen[pairs_a[i]]] for i in ai]
        midb = [branch_seq(pairs_b[i])[k - 1: u.ulen[pairs_b[i]]] for i in ai]
        from ..ops.padding import next_pow2
        la = np.array([len(s) for s in mida], dtype=np.int32)
        lb = np.array([len(s) for s in midb], dtype=np.int32)
        rows = next_pow2(len(ai), minimum=16)
        ma = next_pow2(int(la.max()), minimum=32)
        mb = next_pow2(int(lb.max()), minimum=32)
        A = np.zeros((rows, ma), dtype=np.uint8)
        B = np.zeros((rows, mb), dtype=np.uint8)
        for r, s in enumerate(mida):
            A[r, : len(s)] = s
        for r, s in enumerate(midb):
            B[r, : len(s)] = s
        lap = np.zeros(rows, np.int32)
        lbp = np.zeros(rows, np.int32)
        lap[: len(ai)], lbp[: len(ai)] = la, lb
        dist = np.asarray(edit_distance_batch(A, lap, B, lbp))[: len(ai)]
        ok_align[ai] = dist <= thr[ai]

    ok = ok_short | ok_align
    if not ok.any():
        return 0

    # union-find clustering of ok pairs
    parent = np.arange(u.num_unitigs)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs_a[ok], pairs_b[ok]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    roots = np.array([find(x) for x in range(u.num_unitigs)])
    clustered = np.nonzero(roots != np.arange(u.num_unitigs))[0]
    involved = np.unique(np.concatenate([clustered, roots[clustered]]))

    kill = np.zeros(u.num_unitigs, dtype=bool)
    cov_add = np.zeros(u.num_unitigs, dtype=np.float64)
    n_crush = 0
    for r in np.unique(roots[involved]):
        members = involved[roots[involved] == r]
        if len(members) < 2:
            continue
        winner = members[np.argmax(u.ucov[members])]
        for mbr in members:
            if mbr == winner:
                continue
            # winner absorbs: cov += cov_m * len_m / len_winner (graph.h:660)
            cov_add[winner] += u.ucov[mbr] * u.ulen[mbr] / u.ulen[winner]
            kill[mbr] = True
            if crushed is not None:
                crushed.append(CrushedBubble(
                    seq=seqs[mbr, : base_lens[mbr]].copy(),
                    coverage=int(u.ucov[mbr])))
            n_crush += 1

    if n_crush:
        # propagate absorbed coverage into member k-mer counts so the next
        # labeling reproduces the boosted average
        add_per_node = np.zeros(dbg.keys.shape[0], dtype=np.float64)
        sel = u.uid >= 0
        add_per_node[sel] = cov_add[u.uid[sel]]
        if add_per_node.any():
            import jax.numpy as jnp
            new_counts = np.asarray(dbg.counts).astype(np.float64) + add_per_node
            dbg.counts = jnp.asarray(np.minimum(np.round(new_counts), 0xFFFF - 1)
                                     .astype(np.uint32))
        dbg.delete_unitigs(kill)
    return n_crush


def crush_bubble_iterative(dbg: DBG, average_coverage: float,
                           bubble_threshold: float = 0.1,
                           crushed: list[CrushedBubble] | None = None) -> int:
    """crushBubbleIterative (graph.h:1852-1870)."""
    LOG.info("removing bubbles...")
    total = 0
    while True:
        n = crush_bubble(dbg, average_coverage, bubble_threshold, crushed)
        LOG.counter("NUM_REMOVED_BUBBLES", n)
        if n == 0:
            break
        total += n
    return total


def _bubble_unitig_mask(dbg: DBG, u) -> np.ndarray:
    """Unitigs that form a parallel pair between one source junction and
    one sink junction (searchBubbleStructure grouping,
    graph.h:2386-2406): group unitigs by their (predecessor junction,
    successor junction) node pair; any group of >= 2 is a bubble set."""
    succ_idx, succ_orient, out, outdeg, is_junction = dbg.topo_host()
    num_u = u.num_unitigs
    mask = np.zeros(num_u, dtype=bool)
    if num_u == 0:
        return mask

    def single_junction_neighbor(oriented):
        i = oriented // 2
        o = oriented % 2
        if outdeg[i, o] != 1:
            return -1
        b = int(np.argmax(succ_idx[i, o] >= 0))
        s = int(succ_idx[i, o, b])
        return s if s >= 0 and is_junction[s] else -1

    pair_groups: dict[tuple[int, int], list[int]] = {}
    for r in range(num_u):
        # predecessors of the head = successors of its reverse orientation
        src = single_junction_neighbor(int(u.uhead[r]) ^ 1)
        snk = single_junction_neighbor(int(u.utail[r]))
        if src < 0 or snk < 0:
            continue
        pair_groups.setdefault((src, snk), []).append(r)
        # canonical both directions (a bubble reads the same reversed)
        pair_groups.setdefault((snk, src), []).append(r)
    for (a, b), members in pair_groups.items():
        uniq = set(members)
        if len(uniq) >= 2:
            for r in uniq:
                mask[r] = True
    return mask


def average_coverage_excluding_bubble(dbg: DBG) -> float:
    """getAverageCoverageExcludingBubble (graph.h:2375-2431):
    length-weighted mean coverage over non-bubble unitigs plus junction
    coverages (weight 1 each); bubble unitigs — parallel pairs between a
    shared source and sink junction — are excluded."""
    u = dbg.label_unitigs()
    if u.num_unitigs == 0:
        return 0.0
    bubble = _bubble_unitig_mask(dbg, u)
    keep = ~bubble
    if not keep.any():
        keep = np.ones_like(keep)
    w = u.ulen[keep].astype(np.float64)
    s = float((u.ucov[keep] * w).sum())
    num = float(w.sum())
    _ji, jc = dbg.junction_info()
    s += float(np.asarray(jc, dtype=np.float64).sum())
    num += float(len(jc))
    return s / max(num, 1.0)


# ---------------------------------------------------------------------------
# element-level chain simulation: ONE device labeling feeds a host-side
# replay of the cutBranch / deleteErroneous fixed points
# ---------------------------------------------------------------------------

@jax.jit
def _chain_pull_kernel(succ_idx, succ_orient, outdeg, is_junction, counts,
                       uid, uhead, utail):
    """Device half of the chain-sim pull: per-unitig coverage SUMS (the
    labeling only exposes the rounded mean) and end attachments
    (end_attach of _cut_branch_kernel_core, for ALL unitigs)."""
    cap = uid.shape[0]
    ucap = uhead.shape[0]
    seg = jnp.where(uid >= 0, uid, ucap)
    csum = jnp.zeros((ucap + 1,), jnp.float32).at[seg].add(
        jnp.where(uid >= 0, counts.astype(jnp.float32), 0.0),
        mode="drop")[:ucap]

    def end_attach(ends, side):
        i = ends >> 1
        o = ends & 1
        look = (1 - o) if side == 0 else o
        deg = jnp.where(look == 0, outdeg[0][i], outdeg[1][i])
        tgt = jnp.full_like(ends, -1)
        tor = jnp.zeros_like(ends)
        found = jnp.zeros(ends.shape, bool)
        for b in range(4):
            vb = jnp.where(look == 0, succ_idx[0, b][i], succ_idx[1, b][i])
            ob = jnp.where(look == 0, succ_orient[0, b][i],
                           succ_orient[1, b][i])
            take = ~found & (vb >= 0)
            tgt = jnp.where(take, vb, tgt)
            tor = jnp.where(take, ob, tor)
            found = found | (vb >= 0)
        attached = (deg == 1) & (tgt >= 0)
        return jnp.where(attached, tgt, -1), jnp.where(attached, tor, 0)

    hj, hq = end_attach(uhead, 0)
    tj, tq = end_attach(utail, 1)
    return csum, hj, hq, tj, tq


def _numpy_rank(prv):
    """Pointer-doubling list ranking in numpy over the (small) element
    graph: returns (rank, head, leftover_live) like _doubling_rank."""
    m = len(prv)
    rank = np.where(prv >= 0, 1, 0).astype(np.int64)
    anchor = np.where(prv >= 0, prv, np.arange(m))
    ptr = prv.copy()
    for _ in range(max(int(np.ceil(np.log2(max(m, 2)))) + 1, 1)):
        if not (ptr >= 0).any():
            break
        has = ptr >= 0
        p = np.clip(ptr, 0, m - 1)
        rank = np.where(has, rank + rank[p], rank)
        anchor = np.where(has, anchor[p], anchor)
        ptr = np.where(has, ptr[p], ptr)
    return rank, anchor, ptr


class _ChainSim:
    """Host replay of the node-level cleaning fixed points at ELEMENT
    granularity (elements = initial unitigs + junction k-mers). Each
    device round of the former fused kernels re-ran the full
    pointer-doubling labeling (~4-5 s/round at 1 Mbp scale); the element
    graph is ~100x smaller, so the same bulk-synchronous rounds replay
    in milliseconds with identical decisions (same thresholds, same
    snapshot semantics, same coverage arithmetic in float32)."""

    def __init__(self, dbg: DBG):
        self.dbg = dbg
        self.k = dbg.k
        uid, _up, _uo, num_u_d, ulen, _ucov, uhead, utail = \
            dbg.label_unitigs_device()
        si, so, _out, od, isj = dbg.topo
        csum, hj, hq, tj, tq = _chain_pull_kernel(
            si, so, od, isj, dbg.counts, uid, uhead, utail)
        nu = int(num_u_d)
        self.nu = nu
        self.ulen = np.asarray(ulen[:nu]).astype(np.int64)
        self.ucsum = np.asarray(csum[:nu]).astype(np.float64)
        isj_h = np.asarray(isj)
        self.j_nodes = np.nonzero(isj_h)[0].astype(np.int64)
        nj = len(self.j_nodes)
        self.nj = nj
        jn = jnp.asarray(self.j_nodes)
        self.jcount = np.asarray(dbg.counts[jn]).astype(np.float64)
        jsi = np.asarray(si[:, :, jn]).transpose(2, 0, 1)  # (nj, 2, 4)
        jso = np.asarray(so[:, :, jn]).transpose(2, 0, 1)
        # element ids: unitigs [0, nu), junctions [nu, nu+nj)
        node2j = np.full(dbg.capacity, -1, np.int64)
        node2j[self.j_nodes] = np.arange(nj)
        uid_h = np.asarray(uid)
        uhead_h = np.asarray(uhead[:nu]).astype(np.int64)
        utail_h = np.asarray(utail[:nu]).astype(np.int64)

        def node_entry_to_elem(t, p):
            """(target node, entry orientation) -> (element, entry slot d);
            for unitigs d=0 means entering at the head (forward
            traversal), d=1 at the tail (reverse)."""
            t = np.asarray(t, np.int64)
            p = np.asarray(p, np.int64)
            je = node2j[np.clip(t, 0, dbg.capacity - 1)]
            uu = uid_h[np.clip(t, 0, dbg.capacity - 1)].astype(np.int64)
            oriented = 2 * t + p
            is_head = (uu >= 0) & (oriented == uhead_h[np.clip(uu, 0, max(nu - 1, 0))])
            elem = np.where(t < 0, -1,
                            np.where(je >= 0, nu + je, uu))
            d = np.where(je >= 0, p, np.where(is_head, 0, 1))
            return elem, d

        # junction adjacency (element level)
        self.jadj_e = np.full((nj, 2, 4), -1, np.int64)
        self.jadj_d = np.zeros((nj, 2, 4), np.int64)
        e, d = node_entry_to_elem(jsi.reshape(-1), jso.reshape(-1))
        self.jadj_e = np.where(jsi.reshape(-1) >= 0, e, -1).reshape(nj, 2, 4)
        self.jadj_d = d.reshape(nj, 2, 4)
        # unitig end attachments -> element refs (targets are junctions)
        hj_h = np.asarray(hj[:nu]).astype(np.int64)
        tj_h = np.asarray(tj[:nu]).astype(np.int64)
        self.uadj_e = np.full((nu, 2), -1, np.int64)   # [:,0] head, [:,1] tail
        self.uadj_d = np.zeros((nu, 2), np.int64)
        hj_e = node2j[np.clip(hj_h, 0, dbg.capacity - 1)]
        tj_e = node2j[np.clip(tj_h, 0, dbg.capacity - 1)]
        self.uadj_e[:, 0] = np.where((hj_h >= 0) & (hj_e >= 0), nu + hj_e, -1)
        self.uadj_d[:, 0] = np.asarray(hq[:nu]).astype(np.int64)
        self.uadj_e[:, 1] = np.where((tj_h >= 0) & (tj_e >= 0), nu + tj_e, -1)
        self.uadj_d[:, 1] = np.asarray(tq[:nu]).astype(np.int64)

        self.ne = nu + nj
        self.alive = np.ones(self.ne, bool)
        self.total_killed = 0

    # -- per-round structure ------------------------------------------------
    def _branching(self):
        """Live branching (junction-status) mask per element."""
        br = np.zeros(self.ne, bool)
        if self.nj:
            tgt_alive = (self.jadj_e >= 0) & \
                self.alive[np.clip(self.jadj_e, 0, self.ne - 1)]
            deg = tgt_alive.sum(axis=2)          # (nj, 2)
            br[self.nu:] = self.alive[self.nu:] & ((deg[:, 0] >= 2)
                                                   | (deg[:, 1] >= 2))
        return br

    def _chains(self, br):
        """Label chains over oriented element slots. Returns dict with
        per-slot chain ids and per-chain stats (len in k-mers, covsum,
        end attachments)."""
        ne, nu = self.ne, self.nu
        m = 2 * ne
        nxt = np.full(m, -1, np.int64)
        # unitig slots: (u, 0) leaves via tail, (u, 1) via head
        if nu:
            for d, side in ((0, 1), (1, 0)):
                te = self.uadj_e[:, side]
                td = self.uadj_d[:, side]
                ok = (te >= 0) & self.alive[np.clip(te, 0, ne - 1)] \
                    & ~br[np.clip(te, 0, ne - 1)] & self.alive[:nu]
                nxt[2 * np.arange(nu) + d] = np.where(ok, 2 * te + td, -1)
        # junction (non-branching) slots: unique live target per orientation
        if self.nj:
            tgt_alive = (self.jadj_e >= 0) & \
                self.alive[np.clip(self.jadj_e, 0, ne - 1)]
            deg = tgt_alive.sum(axis=2)
            b = np.argmax(tgt_alive, axis=2)                    # (nj, 2)
            te = np.take_along_axis(self.jadj_e, b[:, :, None],
                                    axis=2)[:, :, 0]
            td = np.take_along_axis(self.jadj_d, b[:, :, None],
                                    axis=2)[:, :, 0]
            src_ok = self.alive[nu:] & ~br[nu:]
            ok = src_ok[:, None] & (deg == 1) & (te >= 0) \
                & self.alive[np.clip(te, 0, ne - 1)] \
                & ~br[np.clip(te, 0, ne - 1)]
            idx = 2 * (nu + np.arange(self.nj))
            nxt[idx] = np.where(ok[:, 0], 2 * te[:, 0] + td[:, 0], -1)
            nxt[idx + 1] = np.where(ok[:, 1], 2 * te[:, 1] + td[:, 1], -1)
        # element alive & non-branching slots only participate
        slot_alive = np.repeat(self.alive & ~br, 2)
        nxt = np.where(slot_alive, nxt, -1)
        # links into dead/branching targets already filtered; prv = twin trick
        arange = np.arange(m)
        twin = arange ^ 1
        nt = nxt[twin]
        prv = np.where(nt >= 0, nt ^ 1, -1)
        prv = np.where(slot_alive, prv, -1)

        rank, head, leftover = _numpy_rank(prv)
        if (leftover >= 0).any():
            # cycles: deterministic cut (smallest oriented-pair id), then
            # re-rank — mirrors dbg._label_core's cut_and_rerank
            in_cycle = leftover >= 0
            ea = np.where(nxt >= 0, np.minimum(arange, nxt ^ 1), m)
            eb = np.where(nxt >= 0, np.maximum(arange, nxt ^ 1), m)
            cyc_ptr = np.where(in_cycle, prv, -1)
            ma, mb = ea.copy(), eb.copy()
            ptr = cyc_ptr.copy()
            for _ in range(max(int(np.ceil(np.log2(max(m, 2)))) + 1, 1)):
                if not (ptr >= 0).any():
                    break
                has = ptr >= 0
                p = np.clip(ptr, 0, m - 1)
                better = has & ((ma[p] < ma) | ((ma[p] == ma)
                                                & (mb[p] < mb)))
                ma = np.where(better, ma[p], ma)
                mb = np.where(better, mb[p], mb)
                ptr = np.where(has, ptr[p], ptr)
            cut = in_cycle & (ea == ma) & (eb == mb)
            nxt2 = np.where(cut, -1, nxt)
            nt2 = nxt2[twin]
            prv = np.where(nt2 >= 0, nt2 ^ 1, -1)
            prv = np.where(slot_alive, prv, -1)
            rank, head, _left = _numpy_rank(prv)
            nxt = nxt2

        tail = head[twin] ^ 1
        is_head = slot_alive & (prv == -1)
        rep = is_head & (arange <= (tail ^ 1))
        chain_of = np.full(m, -1, np.int64)
        heads = np.nonzero(rep)[0]
        cid_of_head = np.full(m, -1, np.int64)
        cid_of_head[heads] = np.arange(len(heads))
        cid = cid_of_head[head]
        use_twin = (cid < 0)
        cid = np.where(use_twin, cid_of_head[tail ^ 1], cid)
        chain_of = np.where(slot_alive, cid, -1)

        nch = len(heads)
        elem_len = np.concatenate([self.ulen,
                                   np.ones(self.nj, np.int64)])
        elem_cov = np.concatenate([self.ucsum, self.jcount])
        # per-chain stats: each ELEMENT contributes once (use slot d=0)
        e_cid = chain_of[2 * np.arange(ne)]
        # element's chain id: one of its two slots (both map to same chain)
        e_cid = np.where(e_cid >= 0, e_cid, chain_of[2 * np.arange(ne) + 1])
        ch_len = np.zeros(nch + 1, np.int64)
        ch_cov = np.zeros(nch + 1, np.float64)
        sel = e_cid >= 0
        np.add.at(ch_len, np.where(sel, e_cid, nch), np.where(sel, elem_len, 0))
        np.add.at(ch_cov, np.where(sel, e_cid, nch), np.where(sel, elem_cov, 0.0))
        ch_len = ch_len[:nch]
        ch_cov = ch_cov[:nch]

        # chain end attachments: head slot's twin's outgoing raw target,
        # and tail slot's outgoing raw target — attachment exists iff the
        # raw target is a live BRANCHING junction reached with degree 1
        def raw_out(slots):
            """outgoing (elem, d) from oriented slots, ignoring the
            non-branching-target restriction (end_attach semantics:
            deg==1 & target exists)."""
            e = slots >> 1
            d = slots & 1
            te = np.full(len(slots), -1, np.int64)
            td = np.zeros(len(slots), np.int64)
            uu = e < nu
            if uu.any():
                side = np.where(d[uu] == 0, 1, 0)
                te[uu] = self.uadj_e[e[uu], side]
                td[uu] = self.uadj_d[e[uu], side]
            jj = ~uu
            if jj.any():
                jl = e[jj] - nu
                tgt_alive = (self.jadj_e[jl, d[jj]] >= 0) & \
                    self.alive[np.clip(self.jadj_e[jl, d[jj]], 0, ne - 1)]
                deg = tgt_alive.sum(axis=1)
                b = np.argmax(tgt_alive, axis=1)
                t_e = self.jadj_e[jl, d[jj], b]
                t_d = self.jadj_d[jl, d[jj], b]
                one = deg == 1
                te[jj] = np.where(one, t_e, -1)
                td[jj] = np.where(one, t_d, 0)
            ok = (te >= 0) & self.alive[np.clip(te, 0, ne - 1)]
            return np.where(ok, te, -1), td

        ch_head_slot = heads
        ch_tail_slot = tail[heads]
        # head-side attachment: look backwards = outgoing of twin(head)
        h_e, h_d = raw_out(ch_head_slot ^ 1)
        t_e, t_d = raw_out(ch_tail_slot)
        br_ok_h = (h_e >= 0) & br[np.clip(h_e, 0, ne - 1)]
        br_ok_t = (t_e >= 0) & br[np.clip(t_e, 0, ne - 1)]
        return {
            "nch": nch, "chain_of_elem": e_cid,
            "len": ch_len, "cov": ch_cov,
            "head_j": np.where(br_ok_h, h_e, -1), "head_q": h_d,
            "tail_j": np.where(br_ok_t, t_e, -1), "tail_q": t_d,
        }

    def _sibling_maxcov(self, ch, br, jn_elem, jq, exclude_chain):
        """Max branch coverage at junction element jn_elem on the side
        facing the tip (orientation 1-jq), excluding branches into the
        tip's own chain (graph.h:866-877 / _cut_branch_kernel_core)."""
        maxcov = np.zeros(len(jn_elem), np.float64)
        if self.nj == 0:
            return maxcov
        jl = np.clip(jn_elem - self.nu, 0, self.nj - 1)
        q = 1 - jq
        ucov_chain = np.floor(ch["cov"] / np.maximum(ch["len"], 1) + 0.5)
        for b in range(4):
            te = self.jadj_e[jl, q, b]
            has = (te >= 0) & self.alive[np.clip(te, 0, self.ne - 1)]
            tcl = np.clip(te, 0, self.ne - 1)
            t_br = br[tcl]
            # branching junction target: its own k-mer count; chain
            # target: the chain's rounded mean coverage
            cov_j = np.where(te >= self.nu,
                             self.jcount[np.clip(te - self.nu, 0,
                                                 max(self.nj - 1, 0))], 0.0)
            t_chain = ch["chain_of_elem"][tcl]
            cov_u = np.where(t_chain >= 0,
                             ucov_chain[np.clip(t_chain, 0,
                                                max(ch["nch"] - 1, 0))], 0.0)
            cov = np.where(t_br, cov_j, cov_u)
            excl = (~t_br) & (t_chain == exclude_chain)
            cov = np.where(has & ~excl, cov, 0.0)
            maxcov = np.maximum(maxcov, cov)
        return maxcov

    def _kill_chains(self, ch, kill_mask):
        """Mark all member elements of killed chains dead."""
        e_cid = ch["chain_of_elem"]
        sel = (e_cid >= 0) & kill_mask[np.clip(e_cid, 0,
                                               max(ch["nch"] - 1, 0))]
        n = int(sel.sum())
        if n:
            self.alive[sel] = False
        return int(kill_mask.sum())

    def cut_branch_round(self, branch_threshold: float) -> int:
        """One cutBranch decision+apply on the current element graph."""
        br = self._branching()
        ch = self._chains(br)
        if ch["nch"] == 0:
            return 0
        short = ch["len"] <= self.k
        one_side = (ch["head_j"] >= 0) ^ (ch["tail_j"] >= 0)
        tip = short & one_side
        jn = np.where(ch["head_j"] >= 0, ch["head_j"], ch["tail_j"])
        jq = np.where(ch["head_j"] >= 0, ch["head_q"], ch["tail_q"])
        maxcov = self._sibling_maxcov(ch, br, np.clip(jn, self.nu, None),
                                      jq, np.arange(ch["nch"]))
        ucov = np.floor(ch["cov"] / np.maximum(ch["len"], 1) + 0.5)
        kill = tip & (ucov.astype(np.float32)
                      <= (maxcov.astype(np.float32)
                          * np.float32(branch_threshold)))
        self._kill_chains(ch, kill)
        return int(kill.sum())

    def delete_erroneous_round(self, length_cut, coverage_cut) -> int:
        br = self._branching()
        ch = self._chains(br)
        if ch["nch"] == 0:
            return 0
        ucov = np.floor(ch["cov"] / np.maximum(ch["len"], 1) + 0.5)
        kill = (ch["len"] < length_cut) \
            & (ucov.astype(np.float32) < np.float32(coverage_cut))
        self._kill_chains(ch, kill)
        return int(kill.sum())

    def apply(self) -> int:
        """Push accumulated element deaths down to the node level (one
        device op) and refresh the DBG topology snapshot."""
        from .dbg import _mask_topo_kernel
        dbg = self.dbg
        kill_u = ~self.alive[:self.nu]
        dead_j = self.j_nodes[~self.alive[self.nu:]]
        if not kill_u.any() and len(dead_j) == 0:
            return 0
        uid = dbg.label_unitigs_device()[0]
        ucap = dbg.label_unitigs_device()[4].shape[0]
        kill_u_dev = jnp.asarray(np.concatenate(
            [kill_u, np.zeros(ucap - self.nu, bool)]))
        node_kill = (uid >= 0) & kill_u_dev[jnp.clip(uid, 0, ucap - 1)]
        if len(dead_j):
            node_kill = node_kill.at[jnp.asarray(dead_j)].set(True)
        dbg.alive = dbg.alive & ~node_kill
        si0, so0, _o, _od, _isj = dbg.topo
        dbg._topo = _mask_topo_kernel(si0, so0, dbg.alive)
        dbg._unitigs = None
        dbg._unitigs_dev = None
        return 1
