"""Guide-graph division (divideUsingGuideGraph, pairedDBG.cpp:3905-3993)."""

import numpy as np

from platanus_b_tpu.models.divide import (divide_using_guide_graph,
                                          set_corresponding_node_position,
                                          smooth_node_id_vector)
from platanus_b_tpu.models.scaffold import ScaffoldGraph


def _graph(layouts, n_contigs=6, clen=100):
    rng = np.random.default_rng(0)
    contigs = [rng.integers(0, 4, size=clen).astype(np.uint8)
               for _ in range(n_contigs)]
    g = ScaffoldGraph(contigs, np.full(n_contigs, 30.0))
    g._remake(layouts)
    return g


def _layout(*cids, clen=100):
    return [(cid, i * clen, (i + 1) * clen) for i, cid in enumerate(cids)]


def test_smooth_fills_minority_island():
    ids = [1, 1, 2, 1, 1]
    smooth_node_id_vector(ids, np.array([500, 200]))
    assert ids == [1, 1, 1, 1, 1]


def test_smooth_keeps_clean_runs():
    ids = [1, 1, 1, 2]
    smooth_node_id_vector(ids, np.array([300, 100]))
    assert ids == [1, 1, 1, 2]


def test_corresponding_position_follows_contig_pos():
    g = _graph([_layout(1, 2, 3, 4), _layout(5, 6)])
    pos = set_corresponding_node_position(g, _layout(2, -6))
    assert pos[0] == (1, 1)        # contig 2 sits in node 1 at offset 1
    assert pos[1] == (-2, 1)       # contig 6 reversed -> -node2, offset 1

def test_corresponding_position_opposite_bubble_fallback():
    g = _graph([_layout(1, 2, 3, 4), _layout(5, 6)])
    # contig 6 excluded from scaffolds; its opposite bubble is contig 2
    g.contig_pos_id[5] = 0
    g.opposite_bubble_contig_id[5] = 2
    pos = set_corresponding_node_position(g, _layout(6))
    assert pos[0] == (1, 1)


def test_divide_splits_at_guide_disagreement():
    g = _graph([_layout(1, 2, 3, 4), _layout(5, 6)])
    # guide says contig 6 (scaffold 2, offset 1) belongs between 2 and 3
    # of scaffold 1 -> smoothed majority id is scaffold 1 -> breakpoint
    # inside scaffold 2 before contig 6
    guide = _graph([_layout(1, 2, 6, 3, 4)])
    n_break = divide_using_guide_graph(g, guide)
    assert n_break >= 1
    layouts = [[cid for cid, _s, _e in n.contigs] for n in g.node]
    assert [1, 2, 3, 4] in layouts        # scaffold 1 intact
    assert [5] in layouts and [6] in layouts  # scaffold 2 split


def test_divide_no_disagreement_is_noop():
    g = _graph([_layout(1, 2, 3, 4), _layout(5, 6)])
    guide = _graph([_layout(1, 2, 3), _layout(5, 6)])
    n_break = divide_using_guide_graph(g, guide)
    assert n_break == 0
    layouts = sorted([cid for cid, _s, _e in n.contigs] for n in g.node)
    assert layouts == [[1, 2, 3, 4], [5, 6]]


def test_divide_bubble_contig_protected():
    g = _graph([_layout(1, 2, 3, 4), _layout(5, 6)])
    # mark contig 6 as a bubble pair -> breakpoint suppressed unless
    # bubble_divide=True
    g.opposite_bubble_contig_id[5] = 3
    guide = _graph([_layout(1, 2, 6, 3, 4)])
    n_break = divide_using_guide_graph(g, guide, bubble_divide=False)
    assert n_break == 0

    g2 = _graph([_layout(1, 2, 3, 4), _layout(5, 6)])
    g2.opposite_bubble_contig_id[5] = 3
    n2 = divide_using_guide_graph(g2, guide, bubble_divide=True)
    assert n2 >= 1


def test_fill_majority_score_factor_nonzero():
    """Pin the fillMajorityIDRun trim recurrence at score_factor != 0
    against a literal port of pairedDBG.cpp:2987-3021: maxScore stays 0
    (score > 0 clamps back to 0 and records the cut)."""
    from platanus_b_tpu.models.divide import _fill_majority_id_run

    def oracle(ids, lens, ends, sf):
        # literal transcription of the reference recurrence
        acc = {}
        for i in range(ends[0], ends[1]):
            v = ids[i]
            if v:
                acc[v] = acc.get(v, 0) + int(lens[abs(v) - 1])
        max_id = 0
        best = 0
        for v, c in acc.items():
            if c > best:
                max_id, best = v, c
        if max_id == 0:
            return ends
        lo, hi = ends
        for i in range(ends[0], ends[1]):
            if ids[i] == max_id:
                lo = i
                break
        for i in range(ends[1] - 1, ends[0] - 1, -1):
            if ids[i] == max_id:
                hi = i + 1
                break
        score = max_score = 0
        cut = lo
        for i in range(lo, hi):
            if score > max_score:
                score = max_score
                cut = i
            if ids[i]:
                if ids[i] == max_id:
                    score -= int(lens[abs(ids[i]) - 1])
                else:
                    score += int(lens[abs(ids[i]) - 1] * sf)
        lo = cut
        score = max_score = 0
        cut = hi - 1
        for i in range(hi - 1, lo, -1):
            if score > max_score:
                score = max_score
                cut = i
            if ids[i]:
                if ids[i] == max_id:
                    score -= int(lens[abs(ids[i]) - 1])
                else:
                    score += int(lens[abs(ids[i]) - 1] * sf)
        hi = cut + 1
        for i in range(lo, hi):
            ids[i] = max_id
        return lo, hi

    rng = np.random.default_rng(3)
    for _ in range(50):
        n = int(rng.integers(3, 20))
        lens = rng.integers(50, 1000, size=8)
        ids = [int(v) for v in rng.integers(-4, 5, size=n)]
        for sf in (0.0, 0.5, 1.0, 2.0):
            a, b = list(ids), list(ids)
            ra = _fill_majority_id_run(a, lens, (0, n), sf)
            rb = oracle(b, lens, (0, n), sf)
            assert ra == rb and a == b
