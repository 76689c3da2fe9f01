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
    succ_idx, succ_orient, out, outdeg, is_junction = dbg.topo
    si = np.asarray(succ_idx)
    so = np.asarray(succ_orient)
    od = np.asarray(outdeg)

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
    succ_idx, succ_orient, out, outdeg, is_junction = dbg.topo
    si = np.asarray(succ_idx)
    isj = np.asarray(is_junction)
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

    def end_attach(ends, side):
        i = ends >> 1
        o = ends & 1
        look = (1 - o) if side == 0 else o
        deg = outdeg[i, look]
        row = succ_idx[i, look]
        b = jnp.argmax(row >= 0, axis=-1)
        tgt = jnp.take_along_axis(row, b[:, None], axis=-1)[:, 0]
        tor = jnp.take_along_axis(succ_orient[i, look], b[:, None],
                                  axis=-1)[:, 0]
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
    for b in range(4):
        tgt = succ_idx[jn, q, b]
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


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def _cut_branch_fixed_point(si0, so0, alive0, counts, k: int,
                            branch_threshold, iters: int):
    """The WHOLE cutBranchIterative fixed point in one executable: each
    device round re-masks the original adjacency by the surviving alive
    set, relabels (pointer doubling), and applies the tip decision —
    zero host round trips between rounds (each dispatch+sync costs
    ~0.5-1 s over the device link and clipping takes 2-3 rounds per k
    step)."""
    from .dbg import _label_core, _mask_topo_core

    def cond(state):
        return state[2] > 0

    def body(state):
        alive, total, _ = state
        si, so, _out, od, isj = _mask_topo_core(si0, so0, alive)
        uid, _upos, _uo, num_u, ulen, ucov, _uh, utail = _label_core(
            si, so, od, isj, alive, counts, iters)
        # uhead for the kernel: heads_idx output (=_uh) is per-unitig
        node_kill, n_kill = _cut_branch_kernel_core(
            si, so, od, isj, counts, uid, ulen, ucov, _uh, utail,
            num_u, k, branch_threshold)
        return alive & ~node_kill, total + n_kill, n_kill

    alive, total, _ = jax.lax.while_loop(
        cond, body, (alive0, jnp.int32(0), jnp.int32(1)))
    return alive, total


def cut_branch_iterative(dbg: DBG, branch_threshold: float = 0.5) -> int:
    """cutBranchIterative (graph.h:1830-1845): fixed point of tip clipping.
    Relabeling between rounds merges chains like concatinateNodes."""
    import math as _math

    from .dbg import _mask_topo_kernel

    LOG.info("removing branches...")
    si0, so0, _o, _od, _isj = dbg.topo
    iters = max(1, _math.ceil(_math.log2(max(dbg.capacity, 2))) + 1)
    alive, total = _cut_branch_fixed_point(
        si0, so0, dbg.alive, dbg.counts, dbg.k,
        jnp.float32(branch_threshold), iters)
    total = int(total)
    LOG.counter("NUM_CUT", total)
    if total:
        dbg.alive = alive
        dbg._topo = _mask_topo_kernel(si0, so0, alive)
        dbg._unitigs = None
        dbg._unitigs_dev = None
    return total


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def _delete_erroneous_fixed_point(si0, so0, alive0, counts, k: int,
                                  branch_threshold, length_cut,
                                  coverage_cut, iters: int):
    """deleteErroneousStraightNodeIterative as ONE executable: each round
    = cutBranch decision + apply + relabel + deleteErroneous decision +
    apply (the reference alternates the two per round)."""
    from .dbg import _label_core, _mask_topo_core

    def one_label(alive):
        si, so, _o, od, isj = _mask_topo_core(si0, so0, alive)
        return (si, so, od, isj), _label_core(si, so, od, isj, alive,
                                              counts, iters)

    def cond(state):
        return state[2] > 0

    def body(state):
        alive, total, _ = state
        (si, so, od, isj), lab = one_label(alive)
        uid, _up, _uo, num_u, ulen, ucov, uh, ut = lab
        kill1, n1 = _cut_branch_kernel_core(
            si, so, od, isj, counts, uid, ulen, ucov, uh, ut,
            num_u, k, branch_threshold)
        alive1 = alive & ~kill1
        _topo2, lab2 = one_label(alive1)
        uid2, _up2, _uo2, num_u2, ulen2, ucov2, _uh2, _ut2 = lab2
        ucap = ulen2.shape[0]
        in_range = jnp.arange(ucap) < num_u2
        kill_u = in_range & (ulen2 < length_cut) \
            & (ucov2.astype(jnp.float32) < coverage_cut)
        n2 = jnp.sum(kill_u.astype(jnp.int32))
        kill2 = (uid2 >= 0) & kill_u[jnp.clip(uid2, 0, ucap - 1)]
        return alive1 & ~kill2, total + n1 + n2, n1 + n2

    alive, total, _ = jax.lax.while_loop(
        cond, body, (alive0, jnp.int32(0), jnp.int32(1)))
    return alive, total


def delete_erroneous_iterative(dbg: DBG, length_cut: int, coverage_cut: float,
                               branch_threshold: float = 0.5) -> int:
    """deleteErroneousStraightNodeIterative (graph.h:2086-2106): alternate
    cutBranch + deleteErroneousStraightNode until quiescent — fused on
    device like cut_branch_iterative."""
    import math as _math

    from .dbg import _mask_topo_kernel

    LOG.info("removing erroneous nodes...")
    si0, so0, _o, _od, _isj = dbg.topo
    iters = max(1, _math.ceil(_math.log2(max(dbg.capacity, 2))) + 1)
    alive, total = _delete_erroneous_fixed_point(
        si0, so0, dbg.alive, dbg.counts, dbg.k,
        jnp.float32(branch_threshold),
        jnp.int32(min(length_cut, 2**31 - 1)),
        jnp.float32(min(coverage_cut, 3.4e38)), iters)
    total = int(total)
    LOG.counter("TOTAL_NUM_REMOVED_NODES", total)
    if total:
        dbg.alive = alive
        dbg._topo = _mask_topo_kernel(si0, so0, alive)
        dbg._unitigs = None
        dbg._unitigs_dev = None
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
    succ_idx, succ_orient, out, outdeg, is_junction = [
        np.asarray(x) for x in dbg.topo]
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
