"""Top-level `combine` command (combine.cpp:91-135 equivalent)."""

import os

import simdata

from platanus_b_tpu.commands.main import main as cli_main
from platanus_b_tpu.io.fasta import iter_fasta


def test_combine_command_joins_and_closes(rng, tmp_path):
    genome = simdata.random_genome(rng, 60000)
    # assembly: two pieces around a missing junction, plus an N gap
    piece1 = genome[:24000] + "N" * 400 + genome[24500:29000]
    piece2 = genome[30000:]
    cfa = tmp_path / "c.fa"
    with open(cfa, "w") as f:
        f.write(f">seq1_len{len(piece1)}_cov40_read100_maxK50\n{piece1}\n")
        f.write(f">seq2_len{len(piece2)}_cov40_read100_maxK50\n{piece2}\n")
    gfa = tmp_path / "g.fa"
    with open(gfa, "w") as f:
        f.write(f">g1_len50000_cov40\n{genome[5000:55000]}\n")

    os.chdir(tmp_path)
    rc = cli_main(["combine", "-o", "out", "-c", str(cfa), "-gc", str(gfa)])
    assert rc == 0
    recs = list(iter_fasta("out_combined.fa"))
    assert recs
    longest = max((s for _n, s in recs), key=len)
    assert len(longest) > 50000          # pieces united via the guide
    assert "N" not in longest            # interior gap closed by the guide
    # intermediates removed without -keep_file (combine.cpp:124)
    assert not os.path.exists("out_combineIntermediateResults")


def test_combine_no_gap_close(rng, tmp_path):
    genome = simdata.random_genome(rng, 40000)
    cfa = tmp_path / "c.fa"
    with open(cfa, "w") as f:
        f.write(f">seq1_len19000_cov40_read100_maxK50\n{genome[:19000]}\n")
        f.write(f">seq2_len19500_cov40_read100_maxK50\n{genome[20500:]}\n")
    gfa = tmp_path / "g.fa"
    with open(gfa, "w") as f:
        f.write(f">g1_len30000_cov40\n{genome[5000:35000]}\n")
    os.chdir(tmp_path)
    rc = cli_main(["combine", "-o", "ngc", "-no_gap_close", "-keep_file",
                   "-c", str(cfa), "-gc", str(gfa)])
    assert rc == 0
    assert os.path.exists("ngc_combined.fa")
    assert os.path.exists("ngc_combineIntermediateResults")
