"""Base-level erroneous-node division (models/divide.py vs
pairedDBG.cpp:6480-7294 semantics)."""

import numpy as np
import pytest

from platanus_b_tpu.models.divide import (
    compensate_gap_rate, detect_breakpoints, divide_erroneous_node,
    divide_erroneous_node_base_level, gap_flags)
from platanus_b_tpu.models.scaffold import ScaffoldGraph
from platanus_b_tpu.models.seqlib import MappedPairs, PairLibrary


def _lib(avg_ins=200, sd=20, avg_len=100):
    lib = PairLibrary(np.zeros((0, 4), np.uint8), np.zeros(0, np.int64),
                      np.zeros((0, 4), np.uint8), np.zeros(0, np.int64))
    lib.average_insert = avg_ins
    lib.sd_insert = sd
    lib.average_length = avg_len
    return lib


def _pairs(recs):
    """recs: list of (fid, foff, rid, roff)."""
    a = np.array(recs, dtype=np.int64).reshape(-1, 4)
    return MappedPairs(
        fwd_id=a[:, 0], fwd_off=a[:, 1], rev_id=a[:, 2], rev_off=a[:, 3],
        insert_lengths=np.zeros(0, np.int64),
        link_fwd_id=a[:, 0], link_fwd_off=a[:, 1],
        link_rev_id=a[:, 2], link_rev_off=a[:, 3])


def _chimera_graph(rng):
    """Three contigs; node0 wrongly joins c1+c2; node1 holds c3 (the true
    continuation of c1)."""
    c1 = rng.integers(0, 4, 3000).astype(np.uint8)
    c2 = rng.integers(0, 4, 3000).astype(np.uint8)
    c3 = rng.integers(0, 4, 1000).astype(np.uint8)
    g = ScaffoldGraph([c1, c2, c3], np.array([30.0, 30.0, 30.0]))
    # hand-build the chimeric node (as if a bad scaffolding round joined it)
    g._remake([[(1, 0, 3000), (2, 3000, 6000)], [(3, 0, 1000)]])
    return g


def test_base_level_division_splits_chimera():
    rng = np.random.default_rng(0)
    g = _chimera_graph(rng)
    lib = _lib()
    recs = []
    # proper pairs inside c1 and inside c2 (support both halves)
    for x in range(0, 2801, 10):
        recs.append((1, x, -1, x + 199))
        recs.append((2, x, -2, x + 199))
    # conflicting pairs: c1 end pairs with c3 (the true neighbor) — their
    # mate-expectation window crosses the chimeric junction
    for x in range(2700, 2911, 30):
        recs.append((1, x, -3, 500))
    mp = _pairs(recs)
    n = divide_erroneous_node_base_level(g, [lib], [mp])
    assert n == 1
    assert len(g.node) == 3
    assert all(len(node.contigs) == 1 for node in g.node)
    # the divided pair is unlinked so a rebuilt graph cannot re-join it
    assert (0 * g.num_contig + 1) in g.contig_unlink
    assert g.contig_prev_parent[0] == 1 and g.contig_prev_parent[1] == 1


def test_base_level_division_keeps_supported_node():
    rng = np.random.default_rng(1)
    g = _chimera_graph(rng)
    lib = _lib()
    recs = []
    for x in range(0, 2801, 10):
        recs.append((1, x, -1, x + 199))
        recs.append((2, x, -2, x + 199))
    # spanning pairs across the junction: node is genuine
    for x in range(2700, 2991, 10):
        recs.append((1, x, -2, x + 199 - 3000))
    mp = _pairs(recs)
    n = divide_erroneous_node_base_level(g, [lib], [mp])
    assert n == 0
    assert len(g.node) == 2


def test_detect_breakpoints_thresholds():
    phys = np.full(1000, 10, np.int64)
    diff = np.zeros(1000, np.int64)
    phys[500:510] = 1
    diff[500:510] = 4
    bp = detect_breakpoints(phys, diff, edge=100)
    assert bp[500:510].all()
    assert not bp[:500].any() and not bp[510:].any()
    # low diff coverage: no breakpoint even with a coverage dip
    bp2 = detect_breakpoints(phys, np.zeros(1000, np.int64), edge=100)
    assert not bp2.any()
    # short node: no interior
    assert not detect_breakpoints(phys[:150], diff[:150], edge=100).any()


def test_gap_flags_and_compensation():
    c1 = np.zeros(100, np.uint8)
    c1[40:60] = 4  # N run
    g = ScaffoldGraph([c1], np.array([10.0]))
    flags = gap_flags(g)
    assert flags[40:60].all() and not flags[:40].any()
    phys = np.full(100, 50, np.int64)
    compensate_gap_rate(g, phys, window=20)
    # coverage inside/near the N run is scaled up, far bases less so
    assert phys[50] > phys[20]


def test_junction_division_requires_erroneous_excess():
    rng = np.random.default_rng(2)
    g = _chimera_graph(rng)
    lib = _lib()
    recs = [(1, x, -1, x + 199) for x in range(0, 2801, 10)]
    recs += [(1, x, -2, x + 199 - 3000) for x in range(2850, 2991, 10)]
    mp = _pairs(recs)
    # spanning pairs exist and no erroneous evidence: no division
    n = divide_erroneous_node(g, [lib], [mp], min_link=3)
    assert n == 0
    assert len(g.node) == 2
