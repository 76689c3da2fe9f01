"""gap_close wall-clock bench: reference binary vs platanus_b_tpu on a
1000-gap simulated scaffold (VERDICT r4 weak #7 / next #9).

Simulates a genome, punches N-gaps into a scaffold copy, simulates PE
reads from the true genome, runs `gap_close -c scaffold -IP1 r1 r2` on
both sides (ours on the CPU backend — the per-gap local assemblies are
host work by design), and records walls + closure counts in
parity/GAPCLOSE_bench.json.

Run: python parity/gapclose_bench.py [--n-gaps 1000] [--profile]
"""

import argparse
import cProfile
import json
import os
import pstats
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-gaps", type=int, default=1000)
    ap.add_argument("--gap-len", type=int, default=150)
    ap.add_argument("--segment", type=int, default=1200,
                    help="bases between gaps")
    ap.add_argument("--coverage", type=float, default=40.0)
    ap.add_argument("--read-len", type=int, default=100)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--ref-bin", default="/tmp/refbuild/platanus_b")
    ap.add_argument("--workdir", default="/tmp/gapclose_bench")
    ap.add_argument("--profile", action="store_true",
                    help="cProfile our side and print the top 25")
    ap.add_argument("--skip-ref", action="store_true")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import simdata
    os.makedirs(args.workdir, exist_ok=True)
    wd = args.workdir
    rng = np.random.default_rng(args.seed)

    n_seg = args.n_gaps + 1
    genome = simdata.random_genome(rng, n_seg * args.segment)
    # scaffold: replace the middle gap_len bases at each segment boundary
    # with Ns
    scaf = list(genome)
    gap_positions = []
    for g in range(args.n_gaps):
        mid = (g + 1) * args.segment - args.gap_len // 2
        for i in range(mid, mid + args.gap_len):
            scaf[i] = "N"
        gap_positions.append(mid)
    scaffold = "".join(scaf)
    with open(os.path.join(wd, "scaffold.fa"), "w") as f:
        f.write(f">scaf1_len{len(scaffold)}_cov40_read{args.read_len}"
                f"_maxK62\n")
        for i in range(0, len(scaffold), 80):
            f.write(scaffold[i: i + 80] + "\n")
    fwd, rev = simdata.paired_reads(rng, genome, args.read_len, 400, 40,
                                    args.coverage, error_rate=0.002)
    simdata.write_fasta(os.path.join(wd, "r1.fa"), fwd)
    simdata.write_fasta(os.path.join(wd, "r2.fa"), rev)
    n_pairs = len(fwd)

    def count_n(path):
        seq = "".join(line.strip() for line in open(path)
                      if not line.startswith(">"))
        return seq.count("N")

    out = {"n_gaps": args.n_gaps, "n_pairs": n_pairs,
           "gap_len": args.gap_len}
    if not args.skip_ref:
        t0 = time.perf_counter()
        with open(os.path.join(wd, "ref.log"), "w") as log:
            subprocess.run(
                [args.ref_bin, "gap_close", "-c", "scaffold.fa",
                 "-IP1", "r1.fa", "r2.fa", "-t", "2", "-o", "ref"],
                cwd=wd, stderr=log, stdout=log, check=True)
        ref_wall = time.perf_counter() - t0
        out["reference"] = {
            "wall_s": round(ref_wall, 2), "threads": 2,
            "n_left": count_n(os.path.join(wd, "ref_gapClosed_scaffold.fa"))}

    from platanus_b_tpu.commands.main import main as cli_main
    cwd0 = os.getcwd()
    os.chdir(wd)
    prof = cProfile.Profile() if args.profile else None
    t0 = time.perf_counter()
    try:
        if prof:
            prof.enable()
        rc = cli_main(["gap_close", "-c", "scaffold.fa",
                       "-IP1", "r1.fa", "r2.fa", "-o", "tpu"])
        if prof:
            prof.disable()
    finally:
        os.chdir(cwd0)
    tpu_wall = time.perf_counter() - t0
    assert rc == 0
    out["platanus_b_tpu"] = {
        "wall_s": round(tpu_wall, 2), "backend": "cpu",
        "n_left": count_n(os.path.join(wd, "tpu_gapClosed_scaffold.fa"))}
    if prof:
        pstats.Stats(prof).sort_stats("cumulative").print_stats(25)

    path = os.path.join(REPO, "parity", "GAPCLOSE_bench.json")
    prev = {}
    if os.path.exists(path):
        prev = json.load(open(path))
    out["notes"] = prev.get("notes", "")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
