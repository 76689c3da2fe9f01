"""Round-3 phasing-flow primitives: SCORE-mode cross resolution,
AllLibraries pooled graphs, trim/divide helpers, and the bubble-tracked
node-division machinery (models.bubble)."""

import numpy as np
import simdata

from platanus_b_tpu.io.fasta import seq_to_codes
from platanus_b_tpu.models import bubble as bb
from platanus_b_tpu.models.scaffold import (DBG_PRIMARY_BUBBLE,
                                            DBG_SECONDARY_BUBBLE, GraphEdge,
                                            GraphNode, ScaffoldGraph)


def _cross_graph(rng):
    contigs = [seq_to_codes(simdata.random_genome(rng, 1000))
               for _ in range(5)]
    g = ScaffoldGraph(contigs, np.array([40.0, 40.0, 80.0, 40.0, 40.0]),
                      min_overlap=32, hash_overlap=32)
    g.min_link = 3
    g.tolerence = 100
    for key in ((1, 3), (2, 3), (3, 4), (3, 5)):
        g.overlap_table[key] = 32
    return g


def test_solve_cross_structure_score_mode(rng):
    """SCORE resolution (pairedDBG.cpp:1597-1607): long-read edge scores
    decide the pairing; the min_link gate does NOT apply."""
    g = _cross_graph(rng)
    # score-carrying long-read edges A-C and B-D, below min_link counts
    g.node[0].edges = [GraphEdge(1, 4, 950, 1, None, score=500)]
    g.node[3].edges = [GraphEdge(-1, 1, 950, 1, None, score=500)]
    g.node[1].edges = [GraphEdge(1, 5, 950, 1, None, score=480)]
    g.node[4].edges = [GraphEdge(-1, 2, 950, 1, None, score=480)]
    n = g.solve_simple_cross_structure(0.5, "score")
    assert n == 1
    sets = sorted(sorted(abs(c[0]) for c in nd.contigs) for nd in g.node)
    assert sets == [[1, 3, 4], [2, 3, 5]]


def test_solve_cross_structure_score_ambiguous(rng):
    g = _cross_graph(rng)
    # both pairings equally scored -> ambiguous under 0.5 rate threshold
    g.node[0].edges = [GraphEdge(1, 4, 950, 1, None, score=500),
                       GraphEdge(1, 5, 950, 1, None, score=500)]
    g.node[1].edges = [GraphEdge(1, 4, 950, 1, None, score=500),
                       GraphEdge(1, 5, 950, 1, None, score=500)]
    assert g.solve_simple_cross_structure(0.5, "score") == 0


def _mk_lib(rng, ins=400):
    from platanus_b_tpu.models.seqlib import PairLibrary
    empty = np.zeros((0, 4), np.uint8)
    zl = np.zeros((0,), np.int32)
    return PairLibrary(fwd_codes=empty, fwd_lengths=zl, rev_codes=empty,
                       rev_lengths=zl, average_insert=ins, sd_insert=40,
                       average_length=100, average_coverage=30.0)


def test_make_graph_all_libraries_pools_links(rng):
    """makeGraphAllLibraries (pairedDBG.cpp:674): edges sum numLink across
    libraries; a link set below min_link in each single library passes the
    pooled gate."""
    from platanus_b_tpu.models.seqlib import MappedPairs

    contigs = [seq_to_codes(simdata.random_genome(rng, 2000))
               for _ in range(2)]
    g = ScaffoldGraph(contigs, np.array([30.0, 30.0]))
    g.min_link = 4
    g.tolerence = 200

    def pairs_linking(n_pairs):
        # forward end of contig 1 -> reverse end of contig 2
        fid = np.full(n_pairs, 1, np.int64)
        foff = np.full(n_pairs, 1800, np.int64)
        rid = np.full(n_pairs, -2, np.int64)
        roff = np.full(n_pairs, 100, np.int64)
        return MappedPairs(
            fwd_id=fid, fwd_off=foff, rev_id=rid, rev_off=roff,
            link_fwd_id=fid, link_fwd_off=foff,
            link_rev_id=rid, link_rev_off=roff,
            insert_lengths=np.array([], np.int64))

    lib1, lib2 = _mk_lib(rng), _mk_lib(rng)
    mp1, mp2 = pairs_linking(3), pairs_linking(3)

    # single library: 3 links < min_link 4 -> no edge
    g.lib, g.pairs = lib1, mp1
    g.make_graph()
    assert not g.node[0].edges

    # pooled: 6 links >= 4 -> edge appears with summed count
    g.make_graph_all_libraries([(lib1, mp1), (lib2, mp2)])
    assert g.node[0].edges and g.node[0].edges[0].num_link == 6


def test_trim_sparse_end(rng):
    contigs = [seq_to_codes(simdata.random_genome(rng, L))
               for L in (100, 1000, 1000)]
    g = ScaffoldGraph(contigs, np.full(3, 20.0))
    # one node: [big1, big2, tiny far away]
    g.node = [GraphNode(length=2550, contigs=[
        (1, 2450, 2550), (2, 0, 1000), (3, 1050, 2050)])]
    g.node[0].contigs = [(2, 0, 1000), (3, 1050, 2050), (1, 2450, 2550)]
    g.contig_pos_id[:] = [1, 1, 1]
    g.trim_sparse_end()
    # the 100 bp tail, 400 bp away (> its own length), is trimmed off
    sizes = sorted(len(nd.contigs) for nd in g.node)
    assert sizes == [1, 2]


def test_divide_gapped_node(rng):
    contigs = [seq_to_codes(simdata.random_genome(rng, 500))
               for _ in range(2)]
    g = ScaffoldGraph(contigs, np.full(2, 20.0))
    g.node = [GraphNode(length=1300, contigs=[(1, 0, 500), (2, 800, 1300)])]
    g.contig_pos_id[:] = [1, 1]
    g.divide_gapped_node(min_gap_size=200)
    assert len(g.node) == 2


def test_delete_long_edge(rng):
    contigs = [seq_to_codes(simdata.random_genome(rng, 500))
               for _ in range(2)]
    g = ScaffoldGraph(contigs, np.full(2, 20.0))
    g.node[0].edges = [GraphEdge(1, 2, 5000, 10)]
    g.node[1].edges = [GraphEdge(-1, 1, 5000, 10)]
    g.delete_long_edge(1000)
    assert not g.node[0].edges and not g.node[1].edges


def test_end_match_bubble_pairing(rng):
    """setOppositeBubbleContigIDByEndMatch (pairedDBG.cpp:6105): bubble
    contigs sharing both end (maxK-1)-mers pair up."""
    flank = simdata.random_genome(rng, 31)
    tail = simdata.random_genome(rng, 31)
    mid1 = simdata.random_genome(rng, 200)
    mid2 = simdata.random_genome(rng, 200)
    c0 = seq_to_codes(simdata.random_genome(rng, 300))
    b1 = seq_to_codes(flank + mid1 + tail)
    b2 = seq_to_codes(flank + mid2 + tail)
    g = ScaffoldGraph([c0, b1, b2], np.array([40.0, 20.0, 18.0]))
    g.contig_max_k = 32
    bb.set_opposite_bubble_contig_id_by_end_match(g, first_bubble_contig=1)
    assert g.opposite_bubble_contig_id[1] == 3
    assert g.opposite_bubble_contig_id[2] == 2
    assert g.opposite_bubble_contig_id[0] == 0


def _paired_nodes_graph(rng):
    """Chimeric scaffold mixing contigs from both haplotypes:
    contigs a1(1) b1(2) a2(3) b2(4), opposite pairs (a1,b1), (a2,b2);
    node1 = [a1, b2] (chimera), node2 = [b1], node3 = [a2] — node1's
    opposite-node vote switches (node2 -> node3) mid-scaffold and
    divide_node_using_bubble_contig_pair must split it."""
    contigs = [seq_to_codes(simdata.random_genome(rng, 400))
               for _ in range(4)]   # a1 b1 a2 b2 -> ids 1 2 3 4
    g = ScaffoldGraph(contigs, np.array([20.0, 18.0, 20.0, 18.0]))
    g.hetero_coverage = 20.0
    g.node = [GraphNode(length=800, contigs=[(1, 0, 400), (4, 400, 800)]),
              GraphNode(length=400, contigs=[(2, 0, 400)]),
              GraphNode(length=400, contigs=[(3, 0, 400)])]
    g.contig_pos_id[:] = [1, 2, 3, 1]
    g.contig_pos_off[:] = [0, 0, 0, 1]
    g.opposite_bubble_contig_id[:] = [2, 1, 4, 3]
    return g


def test_divide_node_using_bubble_contig_pair(rng):
    g = _paired_nodes_graph(rng)
    n = bb.divide_node_using_bubble_contig_pair(g)
    assert n == 1
    assert len(g.node) == 4
    assert all(len(nd.contigs) == 1 for nd in g.node)


def test_divide_node_based_on_bubbles_pairs_nodes(rng):
    g = _paired_nodes_graph(rng)
    bb.divide_node_based_on_bubbles_iterative(g, True)
    bb.set_opposite_bubble_node_id_and_state_for_each_node(g)
    # after division each haplotype contig sits in its own node and the
    # opposite tracking pairs them mutually
    n_primary = sum(1 for nd in g.node if nd.state & DBG_PRIMARY_BUBBLE)
    n_secondary = sum(1 for nd in g.node if nd.state & DBG_SECONDARY_BUBBLE)
    assert n_primary == 2 and n_secondary == 2
    for nd in g.node:
        if nd.opposite_bubble_node_id:
            other = g.node[abs(nd.opposite_bubble_node_id) - 1]
            assert abs(other.opposite_bubble_node_id) - 1 == g.node.index(nd)


def test_delete_secondary_bubble_node_and_edge(rng):
    g = _paired_nodes_graph(rng)
    bb.divide_node_using_bubble_contig_pair(g)
    n_del = bb.delete_secondary_bubble_node_and_edge(g)
    assert n_del == 2
    from platanus_b_tpu.models.scaffold import SC_DEL
    alive = [nd for nd in g.node if not (nd.state & SC_DEL)]
    assert len(alive) == 2


def test_recover_secondary_bubble(rng):
    g = _paired_nodes_graph(rng)
    bb.divide_node_using_bubble_contig_pair(g)
    bb.set_opposite_bubble_node_id_and_state_for_each_node(g)
    snap = bb.copy_all_nodes(g)
    bb.delete_secondary_bubble_node_and_edge(g)
    from platanus_b_tpu.models.scaffold import SC_DEL
    assert sum(1 for nd in g.node if not (nd.state & SC_DEL)) == 2
    bb.remake_graph_recovering_secondary_bubble(g, snap)
    assert len(g.node) == 4


def test_strict_dbg_overlap_gate(rng):
    """-strict_phase bubble criterion: getOverlappedNode follows only
    DBG_OVERLAP-flagged edges, which exist solely for overlaps EQUAL to
    minOverlap (storeGraphLinkFromOverlap's gap == -minOverlap test,
    pairedDBG.cpp:92; gate at :1051-1059). Default mode accepts any
    overlap >= minOverlap (the documented superset criterion)."""
    from platanus_b_tpu.models.hetero import get_overlapped_node

    contigs = [seq_to_codes(simdata.random_genome(rng, 500))
               for _ in range(4)]
    g = ScaffoldGraph(contigs, np.full(4, 20.0), min_overlap=32,
                      hash_overlap=32)
    # source 1 -> branches 2,3 -> sink 4; branch overlaps 61 (dbg-join
    # grade), source/sink overlaps exactly 32
    g.overlap_table[(1, 2)] = 32
    g.overlap_table[(1, 3)] = 32
    g.overlap_table[(2, 4)] = 61
    g.overlap_table[(3, 4)] = 61

    adj = g._node_overlap_adjacency()
    assert sorted(get_overlapped_node(adj, 1)) == [2, 3]
    assert get_overlapped_node(adj, 2) == [4]

    g.strict_dbg_overlap = True
    adj = g._node_overlap_adjacency()
    assert sorted(get_overlapped_node(adj, 1)) == [2, 3]
    assert get_overlapped_node(adj, 2) == []    # 61 != minOverlap: gated
    assert get_overlapped_node(adj, 3) == []

    # with minOverlap raised to the dbg grade, the strict gate admits the
    # 61-base overlaps and drops the 32s (minOverlap toggles through the
    # flow exactly as the reference's setMinOverlap calls do)
    g.min_overlap = 61
    adj = g._node_overlap_adjacency()
    assert get_overlapped_node(adj, 1) == []
    assert get_overlapped_node(adj, 2) == [4]
