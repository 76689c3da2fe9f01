"""10x tag libraries: barcode parsing, counting, tag-rate edge cleaning."""

import numpy as np
import simdata

from platanus_b_tpu.io.fasta import seq_to_codes
from platanus_b_tpu.models import seqlib
from platanus_b_tpu.models.mapper import ContigIndex
from platanus_b_tpu.models.scaffold import GraphEdge, ScaffoldGraph


def test_extract_tag():
    assert seqlib.extract_tag("read1 BX:Z:ACGT12-1 extra") == "ACGT12"
    assert seqlib.extract_tag("read1 BX:Z:AAAA") == "AAAA"
    assert seqlib.extract_tag("read1 no tag here") == ""


def test_load_tag_library_interleaved(rng, tmp_path):
    g = simdata.random_genome(rng, 400)
    path = tmp_path / "tagged.fq"
    with open(path, "w") as f:
        for i, bc in enumerate(["AAAA", "AAAA", "CCCC"]):
            r1, r2 = g[i * 50: i * 50 + 40], simdata.rc(g[i * 50 + 60: i * 50 + 100])
            f.write(f"@p{i}/1 BX:Z:{bc}\n{r1}\n+\n{'I' * len(r1)}\n")
            f.write(f"@p{i}/2 BX:Z:{bc}\n{r2}\n+\n{'I' * len(r2)}\n")
    lib = seqlib.load_tag_library([str(path)], [])
    assert lib.num_pairs == 3
    assert lib.num_tags == 2
    # sorted barcode rank ids: AAAA->1, CCCC->2
    assert list(lib.tags) == [1, 1, 2]


def test_count_mapped_tag_for_each_contig(rng):
    g1 = simdata.random_genome(rng, 3000)
    g2 = simdata.random_genome(rng, 3000)
    index = ContigIndex([seq_to_codes(g1), seq_to_codes(g2)], key_length=32)
    fwd, rev, tags = [], [], []
    # barcode 1 reads on contig 1; barcode 2 reads on contig 2
    for i in range(6):
        fwd.append(seq_to_codes(g1[i * 300: i * 300 + 100]))
        rev.append(seq_to_codes(simdata.rc(g1[i * 300 + 150: i * 300 + 250])))
        tags.append(1)
    for i in range(4):
        fwd.append(seq_to_codes(g2[i * 300: i * 300 + 100]))
        rev.append(seq_to_codes(simdata.rc(g2[i * 300 + 150: i * 300 + 250])))
        tags.append(2)
    from platanus_b_tpu.io.reads import pack_reads
    fb, rb = pack_reads(fwd), pack_reads(rev)
    lib = seqlib.TagLibrary(fb.codes, fb.lengths, rb.codes, rb.lengths,
                            np.array(tags), num_tags=2)
    tag_ids, cidx, counts = seqlib.count_mapped_tag_for_each_contig(index, lib)
    got = {(int(t), int(c)): int(n) for t, c, n in zip(tag_ids, cidx, counts)}
    assert got[(1, 0)] == 12   # 6 pairs x 2 ends
    assert got[(2, 1)] == 8


def test_delete_erroneous_edge_num_tag_rate(rng):
    # node1 conflicts: edge to node2 (tag-supported) vs node3 (no tags)
    contigs = [seq_to_codes(simdata.random_genome(rng, 1000))
               for _ in range(3)]
    g = ScaffoldGraph(contigs, np.full(3, 40.0))
    g.tolerence = 10
    g.node[0].edges = [GraphEdge(direction=1, end=2, length=100, num_link=5),
                       GraphEdge(direction=1, end=3, length=100, num_link=5)]
    g.node[1].edges = [GraphEdge(direction=-1, end=1, length=100, num_link=5)]
    g.node[2].edges = [GraphEdge(direction=-1, end=1, length=100, num_link=5)]
    # tag 7 maps heavily on contigs 0 and 1, never on 2
    g.set_contig_tag_counts(np.array([7, 7]), np.array([0, 1]),
                            np.array([20, 20]))
    n = g.delete_erroneous_edge_num_tag_rate()
    assert n == 1
    assert [e.end for e in g.node[0].edges] == [2]
    assert g.node[2].edges == []
