"""`kmer_divide` command: break chimeric contigs at low-occurrence k-mers.

Re-design of ContigDivider (kmer_divide.cpp): per-position k-mer
occurrences come from the `assemble -kmer_occ_only` binary table; contigs
are broken where occ < -r * per-contig-median (decideContigBreakPoint
:200-224); only pieces whose majority of k-mers clear the cutoff are kept
(judgeMajorityGreaterOrEqualCoverage :360-372); `-mask` Ns out k-mers
above -R * overall median instead; `-recalc_cov` only re-stamps coverage.
"""

from __future__ import annotations

import os

import numpy as np

from ..io import fasta as fa
from ..ops import count as cnt
from ..ops.kmer import extract_canonical_kmers
from ..ops.padding import pad_pow2
from ..ops.search import lookup
from ..utils.errors import ArgError, IOError_
from ..utils.log import LOG


def add_parser(sub) -> None:
    p = sub.add_parser("kmer_divide",
                       help="divide sequences by k-mer occurrence")
    p.add_argument("-o", default="out", help="output prefix")
    p.add_argument("-f", nargs="+", default=[], help="contig FASTA files")
    p.add_argument("-k", default="", help="k-mer occurrence binary file")
    p.add_argument("-r", type=float, default=0.1,
                   help="divide if cov < r * median")
    p.add_argument("-R", type=float, default=2.0,
                   help="mask if cov > R * overall median (-mask)")
    p.add_argument("-recalc_cov", action="store_true")
    p.add_argument("-mask", action="store_true")
    p.add_argument("-t", type=int, default=1, help="threads (parity)")
    p.add_argument("-tmp", default=".", help="tmp dir (parity)")
    p.set_defaults(func=run)


def occurrence_per_position(codes: np.ndarray, k: int, table_dev, table):
    """Per-position canonical k-mer occurrence over one contig (N windows
    and absent k-mers -> 0), getOccurrenceArray (kmer_divide.cpp:150-197)."""
    import jax.numpy as jnp
    keys_h, counts_h = table
    if len(codes) < k:
        return np.zeros(0, dtype=np.int64)
    L = -(-len(codes) // 32) * 32
    mat = np.full((1, L), 4, dtype=np.uint8)
    mat[0, : len(codes)] = codes
    keys, valid = extract_canonical_kmers(jnp.asarray(mat), k)
    W = keys.shape[-1]
    idx = np.asarray(lookup(table_dev, keys.reshape(-1, W), len(keys_h)))
    occ = np.where(idx >= 0, counts_h[np.clip(idx, 0, len(counts_h) - 1)], 0)
    occ = occ.reshape(valid.shape)[0]
    occ = np.where(np.asarray(valid)[0], occ, 0)
    return occ[: len(codes) - k + 1].astype(np.int64)


def run(args) -> int:
    if not args.f:
        raise ArgError("kmer_divide: not specified contig file!! (-f)")
    if not args.k or not os.path.exists(args.k):
        raise IOError_(f"cannot open k-mer occurrence file: {args.k}")

    import jax.numpy as jnp
    k, keys, counts = cnt.read_occurrence_table_binary(args.k)
    tk = jnp.asarray(pad_pow2(keys, np.uint32(0xFFFFFFFF)))
    tc = (keys, counts)

    recs = []
    read_len = max_k = 0
    for path in args.f:
        if not os.path.exists(path):
            raise IOError_(f"cannot open file: {path}")
        for name, s in fa.iter_fasta(path):
            recs.append((name, fa.seq_to_codes(s)))
            if read_len == 0:
                read_len = fa.parse_read_length(name)
                max_k = fa.parse_max_k(name)

    occs = [occurrence_per_position(c, k, tk, tc) for _n, c in recs]

    if args.mask:
        allocc = np.concatenate([o for o in occs if len(o)]) if occs else np.zeros(1)
        med_all = int(np.sort(allocc)[len(allocc) // 2]) if len(allocc) else 0
        threshold = med_all * args.R
        LOG.counter("OVERALL_MEDIAN_COVERAGE", med_all)
        LOG.counter("COVERAGE_THRESHOLD", threshold)
        out = []
        for (name, c), o in zip(recs, occs):
            c = c.copy()
            for j in np.nonzero(o > threshold)[0]:
                c[j: j + k] = 4
            out.append((name, fa.codes_to_seq(c)))
        fa.write_fasta(f"{args.o}_kmerMasked.fa", out)
        LOG.info("divide completed")
        return 0

    rate = float("inf") if args.recalc_cov else args.r
    out_name = (f"{args.o}_recalc.fa" if args.recalc_cov
                else f"{args.o}_kmerDivided.fa")
    out = []
    seq_id = 0
    for (name, c), o in zip(recs, occs):
        seq_id += 1
        if len(o) == 0:
            continue
        med = int(np.sort(o)[len(o) // 2])
        cutoff = med * rate if not args.recalc_cov else 0.0
        bps = {0, len(o)}
        if cutoff > 0:
            low = np.nonzero(o < cutoff)[0]
            for j in low:
                bps.add(int(j))
                bps.add(int(j) + 1)
        bps = sorted(bps)
        maj_cut = max(med * (args.r if not args.recalc_cov else 1.0), 1.0)
        for st, ed in zip(bps[:-1], bps[1:]):
            if ed - st <= 0:
                continue
            if not args.recalc_cov:
                n_ok = int((o[st:ed] >= maj_cut).sum())
                if n_ok < (ed - st) / 2:
                    continue
            kmer_cov = float(o[st:ed].mean())
            read_cov = int(kmer_cov * read_len / max(read_len - k + 1, 1) + 0.5)
            piece = c[st: ed + k - 1]
            hdr = (f"seq{seq_id}_len{len(piece)}_cov{read_cov}"
                   f"_read{read_len}_maxK{max_k}")
            out.append((hdr, fa.codes_to_seq(piece)))
    fa.write_fasta(out_name, out)
    LOG.info("divide completed")
    LOG.report_memory()
    return 0
