"""Long-read aligner fidelity oracle vs the vendored minimap2 binary.

VERDICT round-2 #6: the minimap2 replacement (models.longread) feeds
scaffolding decisions that the reference feeds from real minimap2 PAF
(solveDBG.cpp:44-46 filters identity >= 0.8, len >= 1000; combine uses
asm10-grade alignments). This harness runs BOTH aligners on the same
inputs and records recovery/identity metrics:

1. simulated ONT-like reads (10% indel-heavy error) vs a simulated
   4-contig assembly, preset map-ont;
2. the vendored test genomes MT-human vs MT-orang
   (/root/reference/minimap2/test), preset asm10.

Recovery = fraction of minimap2's scaffolding-grade records (filtered as
above) for which our aligner reports a record with the same
target/strand and overlapping coordinates (+-30% of block length).

Usage:
  cp -r /root/reference/minimap2 /tmp/mm2build && make -C /tmp/mm2build
  python parity/longread_oracle.py          # writes parity/LONGREAD_*.json
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MM2 = "/tmp/mm2build/minimap2"
BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def write_fasta(path, names, seq_codes):
    with open(path, "w") as f:
        for n, c in zip(names, seq_codes):
            f.write(f">{n}\n{BASES[c].tobytes().decode()}\n")


def simulate_ont(rng, contigs, n_reads, mean_len=6000):
    """ONT-ish reads: ~5% substitutions + ~5% indels."""
    reads, names, true_src = [], [], []
    total = sum(len(c) for c in contigs)
    for i in range(n_reads):
        # pick contig weighted by length
        r = rng.integers(0, total)
        acc = 0
        for ci, c in enumerate(contigs):
            acc += len(c)
            if r < acc:
                break
        L = max(1000, int(rng.normal(mean_len, mean_len / 4)))
        L = min(L, len(c) - 1)
        s = int(rng.integers(0, len(c) - L))
        seq = c[s: s + L].copy()
        # substitutions
        m = rng.random(len(seq)) < 0.05
        seq[m] = (seq[m] + rng.integers(1, 4, size=int(m.sum()))) % 4
        # indels: delete ~2.5%, insert ~2.5%
        keep = rng.random(len(seq)) >= 0.025
        seq = seq[keep]
        ins_pos = np.flatnonzero(rng.random(len(seq)) < 0.025)
        seq = np.insert(seq, ins_pos,
                        rng.integers(0, 4, size=len(ins_pos)).astype(np.uint8))
        if rng.random() < 0.5:
            seq = (3 - seq)[::-1]
            strand = "-"
        else:
            strand = "+"
        reads.append(seq.astype(np.uint8))
        names.append(f"read{i}")
        true_src.append((ci, s, strand))
    return reads, names, true_src


def run_minimap2(preset, target_fa, query_fa):
    out = subprocess.run([MM2, "-x", preset, "-c", "--secondary=no",
                          target_fa, query_fa],
                         capture_output=True, check=True)
    recs = []
    for line in out.stdout.decode().splitlines():
        f = line.split("\t")
        if len(f) < 11:
            continue
        recs.append({
            "q": f[0], "qlen": int(f[1]), "qs": int(f[2]), "qe": int(f[3]),
            "strand": f[4], "t": f[5], "ts": int(f[7]), "te": int(f[8]),
            "matches": int(f[9]), "block": int(f[10]),
        })
    return recs


def scaffold_grade(recs, min_len=1000, min_identity=0.8):
    return [r for r in recs
            if r["block"] >= min_len
            and r["matches"] / max(r["block"], 1) >= min_identity]


def ours_records(contigs, cnames, reads, rnames, preset):
    from platanus_b_tpu.models.longread import LongReadAligner
    aligner = LongReadAligner(contigs, cnames, preset)
    alns = aligner.align_batch(reads, rnames)
    return [{
        "q": a.q_name, "qlen": a.q_len, "qs": a.q_start, "qe": a.q_end,
        "strand": a.strand, "t": a.t_name, "ts": a.t_start, "te": a.t_end,
        "matches": a.matches, "block": a.block_len,
    } for a in alns]


def recovery_linkage(mm2_recs, our_recs):
    """Fraction of minimap2 records whose target AND query intervals are
    >= 90% covered by the UNION of our colinear same-target/strand
    records: two adjacent colinear pieces split at a divergent patch
    carry the same linking information to scaffolding/combine consumers
    as minimap2's single bridged record (the patch itself aligns to
    nothing else), so a piece boundary inside an otherwise-recovered
    span is not a lost link."""
    ours_by_q = {}
    for r in our_recs:
        ours_by_q.setdefault(r["q"], []).append(r)
    n_hit = 0
    for m in mm2_recs:
        cov_t = np.zeros(m["te"] - m["ts"], bool)
        cov_q = np.zeros(m["qe"] - m["qs"], bool)
        for r in ours_by_q.get(m["q"], []):
            if r["t"] != m["t"] or r["strand"] != m["strand"]:
                continue
            a, b = max(r["ts"], m["ts"]), min(r["te"], m["te"])
            if b > a:
                cov_t[a - m["ts"]: b - m["ts"]] = True
            a, b = max(r["qs"], m["qs"]), min(r["qe"], m["qe"])
            if b > a:
                cov_q[a - m["qs"]: b - m["qs"]] = True
        if cov_t.mean() >= 0.9 and cov_q.mean() >= 0.9:
            n_hit += 1
    return n_hit / max(len(mm2_recs), 1)


def recovery(mm2_recs, our_recs, tol_frac=0.3):
    """Fraction of minimap2 records matched by ours (same query/target/
    strand, coordinates within tol_frac * block length)."""
    ours_by_q = {}
    for r in our_recs:
        ours_by_q.setdefault(r["q"], []).append(r)
    n_hit = 0
    deltas = []
    for m in mm2_recs:
        tol = max(200, int(tol_frac * m["block"]))
        hit = None
        for r in ours_by_q.get(m["q"], []):
            if r["t"] != m["t"] or r["strand"] != m["strand"]:
                continue
            if abs(r["ts"] - m["ts"]) <= tol and abs(r["te"] - m["te"]) <= tol:
                hit = r
                break
            # containment also recovers the record: our chain may span a
            # larger region than minimap2's (e.g. asm10 splits divergent
            # regions; scaffolding only consumes the linking interval)
            ov_t = min(r["te"], m["te"]) - max(r["ts"], m["ts"])
            ov_q = min(r["qe"], m["qe"]) - max(r["qs"], m["qs"])
            if ov_t >= 0.9 * (m["te"] - m["ts"]) and \
                    ov_q >= 0.9 * (m["qe"] - m["qs"]):
                hit = r
                break
        if hit is not None:
            n_hit += 1
            deltas.append(hit["matches"] / max(hit["block"], 1)
                          - m["matches"] / max(m["block"], 1))
    return (n_hit / max(len(mm2_recs), 1),
            float(np.mean(deltas)) if deltas else 0.0,
            float(np.std(deltas)) if deltas else 0.0)


def case_ont(tmp):
    rng = np.random.default_rng(42)
    contigs = [rng.integers(0, 4, size=L, dtype=np.uint8)
               for L in (120_000, 80_000, 50_000, 30_000)]
    cnames = [f"contig{i}" for i in range(len(contigs))]
    reads, rnames, _src = simulate_ont(rng, contigs, 150)
    t_fa = os.path.join(tmp, "asm.fa")
    q_fa = os.path.join(tmp, "ont.fa")
    write_fasta(t_fa, cnames, contigs)
    write_fasta(q_fa, rnames, reads)
    mm2 = scaffold_grade(run_minimap2("map-ont", t_fa, q_fa))
    ours = ours_records(contigs, cnames, reads, rnames, "map-ont")
    ours_f = scaffold_grade(ours)
    rec, d_mean, d_sd = recovery(mm2, ours)
    rec_f, _, _ = recovery(mm2, ours_f)
    return {
        "preset": "map-ont", "n_reads": len(reads),
        "mm2_scaffold_grade_records": len(mm2),
        "ours_records": len(ours), "ours_scaffold_grade": len(ours_f),
        "recovery_any": round(rec, 4),
        "recovery_scaffold_grade": round(rec_f, 4),
        "identity_delta_mean": round(d_mean, 4),
        "identity_delta_sd": round(d_sd, 4),
    }


def case_mt(tmp):
    from platanus_b_tpu.io import fasta as fa
    t_fa = "/root/reference/minimap2/test/MT-human.fa"
    q_fa = "/root/reference/minimap2/test/MT-orang.fa"
    tn, ts = zip(*[(n, fa.seq_to_codes(s)) for n, s in fa.iter_fasta(t_fa)])
    qn, qs = zip(*[(n, fa.seq_to_codes(s)) for n, s in fa.iter_fasta(q_fa)])
    mm2 = run_minimap2("asm10", t_fa, q_fa)
    ours = ours_records(list(ts), list(tn), list(qs), list(qn), "asm10")
    rec, d_mean, d_sd = recovery(mm2, ours)
    return {
        "preset": "asm10", "inputs": "MT-human vs MT-orang",
        "mm2_records": len(mm2), "ours_records": len(ours),
        "recovery_any": round(rec, 4),
        "identity_delta_mean": round(d_mean, 4),
        "identity_delta_sd": round(d_sd, 4),
        "mm2_best": max(mm2, key=lambda r: r["block"]) if mm2 else None,
        "ours_best": max(ours, key=lambda r: r["block"]) if ours else None,
    }


def _mutate(rng, seq, sub, indel):
    seq = seq.copy()
    m = rng.random(len(seq)) < sub
    seq[m] = (seq[m] + rng.integers(1, 4, size=int(m.sum()))) % 4
    keep = rng.random(len(seq)) >= indel / 2
    seq = seq[keep]
    ins = np.flatnonzero(rng.random(len(seq)) < indel / 2)
    return np.insert(seq, ins, rng.integers(0, 4, size=len(ins))
                     .astype(np.uint8))


def case_asm10_corpus(tmp):
    """Assembly-vs-assembly corpus (the combine-mode input shape,
    scripts/combinatorial_gap_close.pl:55): a 500 kb genome assembled two
    ways — target contigs exact, query contigs diverged 3-8% with
    different boundaries, some reversed, plus unrelated contigs and one
    chimera with an unrelated middle (the z-drop case)."""
    rng = np.random.default_rng(7)
    genome = rng.integers(0, 4, size=500_000, dtype=np.uint8)

    def split(points):
        return [genome[a:b].copy() for a, b in zip(points[:-1], points[1:])]

    t_cuts = [0] + sorted(rng.integers(20_000, 480_000, size=9).tolist()) \
        + [500_000]
    targets = split(t_cuts)
    tnames = [f"t{i}" for i in range(len(targets))]

    q_cuts = [0] + sorted(rng.integers(20_000, 480_000, size=14).tolist()) \
        + [500_000]
    queries, qnames = [], []
    for i, (a, b) in enumerate(zip(q_cuts[:-1], q_cuts[1:])):
        div = float(rng.uniform(0.02, 0.06))
        q = _mutate(rng, genome[a:b], div, div / 2)
        if rng.random() < 0.3:
            q = (3 - q)[::-1]
        queries.append(q.astype(np.uint8))
        qnames.append(f"q{i}")
    # unrelated contigs + a chimera with unrelated middle
    queries.append(rng.integers(0, 4, size=30_000, dtype=np.uint8))
    qnames.append("junk0")
    chim = np.concatenate([
        _mutate(rng, genome[100_000:115_000], 0.04, 0.02),
        rng.integers(0, 4, size=15_000, dtype=np.uint8),
        _mutate(rng, genome[115_000:130_000], 0.04, 0.02)])
    queries.append(chim.astype(np.uint8))
    qnames.append("chimera0")

    t_fa = os.path.join(tmp, "asmA.fa")
    q_fa = os.path.join(tmp, "asmB.fa")
    write_fasta(t_fa, tnames, targets)
    write_fasta(q_fa, qnames, queries)
    mm2 = run_minimap2("asm10", t_fa, q_fa)
    mm2_g = scaffold_grade(mm2)
    ours = ours_records(targets, tnames, queries, qnames, "asm10")
    ours_g = scaffold_grade(ours)
    rec, d_mean, d_sd = recovery(mm2_g, ours)
    # block-extent agreement on matched scaffold-grade records
    ours_by_q = {}
    for r in ours_g:
        ours_by_q.setdefault(r["q"], []).append(r)
    extent_deltas = []
    for m in mm2_g:
        best = None
        for r in ours_by_q.get(m["q"], []):
            if r["t"] != m["t"] or r["strand"] != m["strand"]:
                continue
            ov = min(r["te"], m["te"]) - max(r["ts"], m["ts"])
            if ov > 0 and (best is None or ov > best[0]):
                best = (ov, r)
        if best:
            r = best[1]
            extent_deltas.append(
                (abs(r["ts"] - m["ts"]) + abs(r["te"] - m["te"]))
                / max(m["block"], 1))
    # false chimera bridging: no scaffold-grade record of ours may span
    # the chimera's unrelated middle at low identity
    chim_bad = sum(1 for r in ours_g
                   if r["q"] == "chimera0" and r["qe"] - r["qs"] > 20_000
                   and r["matches"] / max(r["block"], 1) < 0.8)
    return {
        "preset": "asm10", "inputs": "two 500kb assemblies, 3-8% diverged",
        "mm2_records": len(mm2), "mm2_scaffold_grade_records": len(mm2_g),
        "ours_records": len(ours), "ours_scaffold_grade": len(ours_g),
        "recovery_scaffold_grade": round(rec, 4),
        "recovery_linkage": round(recovery_linkage(mm2_g, ours), 4),
        "identity_delta_mean": round(d_mean, 4),
        "identity_delta_sd": round(d_sd, 4),
        "extent_delta_mean_frac": round(float(np.mean(extent_deltas)), 4)
        if extent_deltas else None,
        "n_extent_matched": len(extent_deltas),
        "low_identity_chimera_spans": chim_bad,
    }


def main():
    assert os.path.exists(MM2), f"build minimap2 first: {MM2}"
    import jax
    jax.config.update("jax_platforms", "cpu")  # fidelity run, not a race
    tmp = "/tmp/longread_oracle"
    os.makedirs(tmp, exist_ok=True)
    out = {"ont": case_ont(tmp), "mt": case_mt(tmp),
           "asm10_corpus": case_asm10_corpus(tmp)}
    path = os.path.join(REPO, "parity", "LONGREAD_fidelity.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
