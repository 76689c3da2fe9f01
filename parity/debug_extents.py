"""Per-record extent comparison vs minimap2 on the asm10 corpus.

Debug aid for VERDICT r4 #6 (extent_delta_mean_frac <= 0.15): prints each
matched scaffold-grade record's mm2 vs ours coordinates so the trimming
divergences can be localized. Not part of the recorded artifact.
"""
from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from parity.longread_oracle import (  # noqa: E402
    run_minimap2, scaffold_grade, ours_records, write_fasta, _mutate)


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
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
    queries.append(rng.integers(0, 4, size=30_000, dtype=np.uint8))
    qnames.append("junk0")
    chim = np.concatenate([
        _mutate(rng, genome[100_000:115_000], 0.04, 0.02),
        rng.integers(0, 4, size=15_000, dtype=np.uint8),
        _mutate(rng, genome[115_000:130_000], 0.04, 0.02)])
    queries.append(chim.astype(np.uint8))
    qnames.append("chimera0")

    tmp = "/tmp/longread_dbg"
    os.makedirs(tmp, exist_ok=True)
    t_fa = os.path.join(tmp, "asmA.fa")
    q_fa = os.path.join(tmp, "asmB.fa")
    write_fasta(t_fa, tnames, targets)
    write_fasta(q_fa, qnames, queries)
    mm2_g = scaffold_grade(run_minimap2("asm10", t_fa, q_fa))
    ours = ours_records(targets, tnames, queries, qnames, "asm10")
    ours_g = scaffold_grade(ours)
    ours_by_q = {}
    for r in ours_g:
        ours_by_q.setdefault(r["q"], []).append(r)
    deltas = []
    for m in sorted(mm2_g, key=lambda r: (r["q"], r["ts"])):
        best = None
        for r in ours_by_q.get(m["q"], []):
            if r["t"] != m["t"] or r["strand"] != m["strand"]:
                continue
            ov = min(r["te"], m["te"]) - max(r["ts"], m["ts"])
            if ov > 0 and (best is None or ov > best[0]):
                best = (ov, r)
        if best is None:
            print(f"UNMATCHED {m['q']}->{m['t']}{m['strand']} "
                  f"t[{m['ts']},{m['te']}] q[{m['qs']},{m['qe']}] "
                  f"blk={m['block']}")
            continue
        r = best[1]
        d = (abs(r["ts"] - m["ts"]) + abs(r["te"] - m["te"])) \
            / max(m["block"], 1)
        deltas.append(d)
        flag = " <<<" if d > 0.15 else ""
        print(f"{m['q']}->{m['t']}{m['strand']} "
              f"mm2 t[{m['ts']},{m['te']}] q[{m['qs']},{m['qe']}] "
              f"blk={m['block']} | ours t[{r['ts']},{r['te']}] "
              f"q[{r['qs']},{r['qe']}] blk={r['block']} "
              f"dts={r['ts']-m['ts']} dte={r['te']-m['te']} "
              f"frac={d:.3f}{flag}")
    print(f"\nmean extent_delta_frac = {np.mean(deltas):.4f} "
          f"over {len(deltas)} records")


if __name__ == "__main__":
    main()
