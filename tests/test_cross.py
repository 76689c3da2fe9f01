"""Cross-structure resolution (solveSimpleCrossStructure equivalent)."""

import numpy as np
import simdata

from platanus_b_tpu.io.fasta import seq_to_codes
from platanus_b_tpu.models.scaffold import GraphEdge, ScaffoldGraph


def _graph(rng):
    # contigs: A=1, B=2 (left externals), X=3 (high-cov center),
    # C=4, D=5 (right externals)
    contigs = [seq_to_codes(simdata.random_genome(rng, 1000))
               for _ in range(5)]
    g = ScaffoldGraph(contigs, np.array([40.0, 40.0, 80.0, 40.0, 40.0]),
                      min_overlap=32, hash_overlap=32)
    g.min_link = 3
    g.tolerence = 100
    # contig-end overlaps: A->X, B->X, X->C, X->D
    for key in ((1, 3), (2, 3), (3, 4), (3, 5)):
        g.overlap_table[key] = 32
    return g


def test_solve_cross_structure_splits_center(rng):
    g = _graph(rng)
    # PE link evidence: A-C and B-D
    g.node[0].edges = [GraphEdge(direction=1, end=4, length=950, num_link=10)]
    g.node[3].edges = [GraphEdge(direction=-1, end=1, length=950, num_link=10)]
    g.node[1].edges = [GraphEdge(direction=1, end=5, length=950, num_link=10)]
    g.node[4].edges = [GraphEdge(direction=-1, end=2, length=950, num_link=10)]
    n = g.solve_simple_cross_structure()
    assert n == 1
    assert len(g.node) == 2
    sets = sorted(sorted(abs(c[0]) for c in nd.contigs) for nd in g.node)
    assert sets == [[1, 3, 4], [2, 3, 5]]
    # chains overlap-merge: 3 x 1000 bp minus two 32 bp overlaps
    assert all(nd.length == 2936 for nd in g.node)


def test_solve_cross_structure_ambiguous_keeps_nodes(rng):
    g = _graph(rng)
    # equal evidence on both pairings -> ambiguous, no split
    g.node[0].edges = [GraphEdge(direction=1, end=4, length=950, num_link=5),
                       GraphEdge(direction=1, end=5, length=950, num_link=5)]
    g.node[1].edges = [GraphEdge(direction=1, end=4, length=950, num_link=5),
                       GraphEdge(direction=1, end=5, length=950, num_link=5)]
    n = g.solve_simple_cross_structure()
    assert n == 0
    assert len(g.node) == 5


def test_solve_cross_structure_needs_min_link(rng):
    g = _graph(rng)
    g.node[0].edges = [GraphEdge(direction=1, end=4, length=950, num_link=1)]
    g.node[1].edges = [GraphEdge(direction=1, end=5, length=950, num_link=1)]
    n = g.solve_simple_cross_structure()
    assert n == 0  # max evidence below min_link


def test_solve_cross_structure_low_cov_center_skipped(rng):
    g = _graph(rng)
    g.coverage[2] = 30.0  # center no longer above the hetero threshold
    g.node[0].edges = [GraphEdge(direction=1, end=4, length=950, num_link=10)]
    g.node[1].edges = [GraphEdge(direction=1, end=5, length=950, num_link=10)]
    assert g.solve_simple_cross_structure() == 0


def test_solve_gapped_cross_structure(rng):
    """solveSimpleGappedCrossStructure (pairedDBG.cpp:1641-1739): PE-link
    cross with gaps resolves along the dominant pairing."""
    g = _graph(rng)
    g.average_coverage = 40.0
    # link edges with gaps: A-X, B-X, X-C, X-D (conflicting pairs on both
    # sides of X) + haplotype evidence A-C, B-D
    g.node[2].edges = [
        GraphEdge(direction=-1, end=1, length=50, num_link=10),
        GraphEdge(direction=-1, end=2, length=50, num_link=10),
        GraphEdge(direction=1, end=4, length=50, num_link=10),
        GraphEdge(direction=1, end=5, length=50, num_link=10),
    ]
    g.node[0].edges = [GraphEdge(1, 3, 50, 10),
                       GraphEdge(1, 4, 1100, 8)]
    g.node[1].edges = [GraphEdge(1, 3, 50, 10),
                       GraphEdge(1, 5, 1100, 8)]
    g.node[3].edges = [GraphEdge(-1, 3, 50, 10),
                       GraphEdge(-1, 1, 1100, 8)]
    g.node[4].edges = [GraphEdge(-1, 3, 50, 10),
                       GraphEdge(-1, 2, 1100, 8)]
    n = g.solve_simple_gapped_cross_structure(0.25, "link")
    assert n == 1
    assert len(g.node) == 2
    sets = sorted(sorted(abs(c[0]) for c in nd.contigs) for nd in g.node)
    assert sets == [[1, 3, 4], [2, 3, 5]]
    # gapped layout: 1000 + 50 gap + 1000 + 50 gap + 1000
    assert all(nd.length == 3100 for nd in g.node)


def test_join_unambiguous_node_pair_gapped(rng):
    """joinUnambiguousNodePairGapped (pairedDBG.cpp:2517-2566)."""
    contigs = [seq_to_codes(simdata.random_genome(rng, 500))
               for _ in range(3)]
    g = ScaffoldGraph(contigs, np.array([30.0, 30.0, 30.0]))
    g.min_link = 3
    g.node[0].edges = [GraphEdge(1, 2, 80, 6)]
    g.node[1].edges = [GraphEdge(-1, 1, 80, 6)]
    n = g.join_unambiguous_node_pair_gapped()
    assert n == 1
    assert len(g.node) == 2
    joined = max(g.node, key=lambda nd: len(nd.contigs))
    assert sorted(abs(c[0]) for c in joined.contigs) == [1, 2]
    assert joined.length == 1080   # 500 + 80 gap + 500
