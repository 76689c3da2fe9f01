"""Phasing end-to-end parity: reference solve_DBG default flow + phase
vs platanus_b_tpu on a simulated diploid genome (VERDICT r3 task 7).

Simulates two haplotypes (SNPs + short indels), assembles contigs with
the REFERENCE binary (so both sides phase the identical contig input),
then runs the default (phasing) solve_DBG flow on both sides and records
the primary/secondary/nonBubble partition stats plus haplotype-recovery
metrics in parity/PARITY_phase_<size>.json.

Run: python parity/phase_parity.py [--genome-size 300000]
"""

import argparse
import hashlib
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

BASES = "ACGT"


def make_diploid(rng, n, snp_rate=0.005, indel_rate=0.0005):
    hap_a = "".join(rng.choice(list(BASES), size=n))
    out = []
    i = 0
    a = list(hap_a)
    while i < len(a):
        r = rng.random()
        if r < snp_rate:
            out.append(BASES[(BASES.index(a[i]) + int(rng.integers(1, 4))) % 4])
            i += 1
        elif r < snp_rate + indel_rate:
            if rng.random() < 0.5:  # deletion of 1-3 bases
                i += int(rng.integers(1, 4))
            else:  # insertion of 1-3 bases
                out.append(a[i])
                out.extend(rng.choice(list(BASES),
                                      size=int(rng.integers(1, 4))))
                i += 1
        else:
            out.append(a[i])
            i += 1
    return hap_a, "".join(out)


def pe_reads(rng, genome, read_len, insert, sd, coverage, error):
    n_pairs = int(len(genome) * coverage / (2 * read_len))
    fwd, rev = [], []
    comp = str.maketrans("ACGT", "TGCA")
    for _ in range(n_pairs):
        ins = max(int(rng.normal(insert, sd)), read_len + 10)
        start = int(rng.integers(0, max(len(genome) - ins, 1)))
        frag = genome[start:start + ins]
        r1 = frag[:read_len]
        r2 = frag[-read_len:].translate(comp)[::-1]

        def mutate(s):
            out = list(s)
            for j in range(len(out)):
                if rng.random() < error:
                    out[j] = BASES[(BASES.index(out[j])
                                    + int(rng.integers(1, 4))) % 4]
            return "".join(out)
        fwd.append(mutate(r1))
        rev.append(mutate(r2))
    return fwd, rev


def write_fasta(path, seqs, prefix="r"):
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">{prefix}{i}\n{s}\n")


def fasta_stats(path, hap_a, hap_b):
    comp = str.maketrans("ACGT", "TGCA")
    seqs = []
    cur = []
    if os.path.exists(path):
        for line in open(path):
            line = line.strip()
            if line.startswith(">"):
                if cur:
                    seqs.append("".join(cur))
                cur = []
            else:
                cur.append(line)
        if cur:
            seqs.append("".join(cur))
    lens = sorted((len(s) for s in seqs), reverse=True)
    total = sum(lens)
    n50 = 0
    acc = 0
    for L in lens:
        acc += L
        if acc * 2 >= total:
            n50 = L
            break

    def in_hap(s, hap):
        return s in hap or s.translate(comp)[::-1] in hap
    in_a = sum(1 for s in seqs if in_hap(s, hap_a))
    in_b = sum(1 for s in seqs if in_hap(s, hap_b))
    either = sum(1 for s in seqs if in_hap(s, hap_a) or in_hap(s, hap_b))
    return {"num_seqs": len(seqs), "total_bp": total, "n50": n50,
            "in_hap_a": in_a, "in_hap_b": in_b, "in_either": either,
            "sorted_set_sha256": hashlib.sha256(
                "|".join(sorted(min(s, s.translate(comp)[::-1])
                                for s in seqs)).encode()).hexdigest()}


SUFFIXES = ("_primaryBubble.fa", "_secondaryBubble.fa",
            "_nonBubbleHetero.fa", "_nonBubbleOther.fa")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome-size", type=int, default=300_000)
    ap.add_argument("--seed", type=int, default=77)
    ap.add_argument("--ref-bin", default="/tmp/refbuild/platanus_b")
    ap.add_argument("--workdir", default="/tmp/phase_parity")
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)
    wd = args.workdir

    rng = np.random.default_rng(args.seed)
    hap_a, hap_b = make_diploid(rng, args.genome_size)
    open(os.path.join(wd, "hap_a.txt"), "w").write(hap_a)
    open(os.path.join(wd, "hap_b.txt"), "w").write(hap_b)
    fa_list, fb_list = [], []
    for hap in (hap_a, hap_b):
        f, b = pe_reads(rng, hap, read_len=125, insert=400, sd=40,
                        coverage=20.0, error=0.002)
        fa_list.extend(f)
        fb_list.extend(b)
    # shuffle pairs together
    order = rng.permutation(len(fa_list))
    write_fasta(os.path.join(wd, "r1.fa"), [fa_list[i] for i in order])
    write_fasta(os.path.join(wd, "r2.fa"), [fb_list[i] for i in order])

    # Two variants:
    #  crushed:   assemble -u 1 (bubbles crushed into contigs, branches in
    #             _contigBubble.fa) + solve_DBG -c ... -b bubbles
    #  structural: assemble default (-u 0, NO crush: het sites stay as
    #             branches in the contig graph) + solve_DBG -c only —
    #             bubbles found structurally (extractDBGBubbleInformation)
    import jax
    jax.config.update("jax_platforms", "cpu")
    from platanus_b_tpu.commands.main import main as cli_main

    out = {"dataset": {"genome_bp": args.genome_size, "snp_rate": 0.005,
                       "indel_rate": 0.0005, "read_len": 125,
                       "coverage_per_hap": 20.0, "error_rate": 0.002,
                       "seed": args.seed}}
    for variant, asm_args, use_b in (
            ("crushed", ["-u", "1"], True),
            ("structural", [], False)):
        asm_prefix = f"asm_{variant}"
        t0 = time.time()
        with open(os.path.join(wd, f"ref_asm_{variant}.log"), "w") as log:
            subprocess.run([args.ref_bin, "assemble", "-f",
                            os.path.join(wd, "r1.fa"),
                            os.path.join(wd, "r2.fa"),
                            "-t", "2", "-m", "4", "-o", asm_prefix]
                           + asm_args, cwd=wd, stderr=log, check=True)
        print(f"[{variant}] reference assemble: {time.time()-t0:.1f} s",
              flush=True)
        bargs = (["-b", f"{asm_prefix}_contigBubble.fa"] if use_b else [])

        t0 = time.time()
        with open(os.path.join(wd, f"ref_phase_{variant}.log"), "w") as log:
            subprocess.run([args.ref_bin, "solve_DBG",
                            "-c", f"{asm_prefix}_contig.fa"] + bargs
                           + ["-IP1", "r1.fa", "r2.fa",
                              "-t", "2", "-tmp", ".", "-o",
                              f"ref_{variant}"],
                           cwd=wd, stderr=log, check=True)
        ref_wall = time.time() - t0
        print(f"[{variant}] reference solve_DBG: {ref_wall:.1f} s",
              flush=True)

        cwd0 = os.getcwd()
        os.chdir(wd)
        t0 = time.time()
        try:
            rc = cli_main(["solve_dbg", "-c", f"{asm_prefix}_contig.fa"]
                          + bargs + ["-IP1", "r1.fa", "r2.fa",
                                     "-tmp", ".", "-o", f"tpu_{variant}"])
        finally:
            os.chdir(cwd0)
        tpu_wall = time.time() - t0
        assert rc == 0, "platanus_b_tpu solve_dbg failed"
        print(f"[{variant}] platanus_b_tpu solve_dbg: {tpu_wall:.1f} s",
              flush=True)

        # strict-parity mode: DBG_OVERLAP-gated diamonds + heteroCoverage
        # preset — must reproduce the reference's partition (0 bubbles on
        # these inputs); the default mode keeps the documented superset
        # behavior that actively pairs haplotypes
        cwd0 = os.getcwd()
        os.chdir(wd)
        t0 = time.time()
        try:
            rc = cli_main(["solve_dbg", "-c", f"{asm_prefix}_contig.fa"]
                          + bargs + ["-IP1", "r1.fa", "r2.fa",
                                     "-strict_phase",
                                     "-tmp", ".", "-o",
                                     f"tpustrict_{variant}"])
        finally:
            os.chdir(cwd0)
        strict_wall = time.time() - t0
        assert rc == 0, "platanus_b_tpu solve_dbg -strict_phase failed"
        print(f"[{variant}] platanus_b_tpu strict: {strict_wall:.1f} s",
              flush=True)

        out[variant] = {
            "reference": {"wall_s": round(ref_wall, 2)},
            "platanus_b_tpu": {"wall_s": round(tpu_wall, 2)},
            "platanus_b_tpu_strict": {"wall_s": round(strict_wall, 2)}}
        for suf in SUFFIXES:
            out[variant]["reference"][suf] = fasta_stats(
                os.path.join(wd, f"ref_{variant}" + suf), hap_a, hap_b)
            out[variant]["platanus_b_tpu"][suf] = fasta_stats(
                os.path.join(wd, f"tpu_{variant}" + suf), hap_a, hap_b)
            out[variant]["platanus_b_tpu_strict"][suf] = fasta_stats(
                os.path.join(wd, f"tpustrict_{variant}" + suf),
                hap_a, hap_b)
        sp = all(
            out[variant]["reference"][s]["sorted_set_sha256"] ==
            out[variant]["platanus_b_tpu_strict"][s]["sorted_set_sha256"]
            for s in SUFFIXES)
        out[variant]["strict_set_parity_all_files"] = sp
    out["known_divergence"] = (
        "Default mode phases aggressively while the reference classifies "
        "0 primary/secondary bubbles on both variants: the reference's "
        "bubble diamonds are sought only over PairedDBG edges flagged "
        "DBG_OVERLAP (pairedDBG.cpp:866-913 via getOverlappedNode "
        ":1051-1059), which exist solely for overlaps EXACTLY equal to "
        "minOverlap (storeGraphLinkFromOverlap :92), with heteroCoverage "
        "preset to contigAverage/2 (solveDBG.cpp:807) — on contigs whose "
        "dbg joins overlap by maxK-1 != minOverlap the gate admits "
        "nothing, so the flow is vestigial for Platanus_B's own "
        "toolchain (it descends from Platanus-allee). The "
        "platanus_b_tpu_strict records above run with -strict_phase, "
        "which mirrors that gate and preset exactly; default mode keeps "
        "the quality win (it recovers haplotype pairs the reference "
        "leaves unpaired).")
    path = os.path.join(REPO, "parity",
                        f"PARITY_phase_{args.genome_size}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
