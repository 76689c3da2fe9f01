"""`merge` command: re-assemble contig sets through a long-k DBG.

Re-design of ContigMerger (merge.cpp:70-147): contigs (split at N runs,
length-filtered) are re-k-merized at k = factor * read_length, each k-mer
keeps the MAX of max(contig coverage, -c) over its sources
(counter.h:511-593 makeKmerReadDistributionFromContig), the DBG is branch-
cut and bubble-crushed, and unitigs + junction k-mers are emitted as
PREFIX_merged.fa / PREFIX_mergedJunctionKmer.fa.
"""

from __future__ import annotations

import os

import numpy as np

from ..io import fasta as fa
from ..models import clean
from ..models.assemble_core import KmerTable, build_dbg_from_table
from ..ops import count as cnt
from ..ops.kmer import extract_canonical_kmers, kmer_to_codes
from ..ops.multiword import num_words
from ..utils.errors import ArgError, IOError_
from ..utils.log import LOG

EXCLUSION_FACTOR = 100.0  # common.h:749


def add_parser(sub) -> None:
    p = sub.add_parser("merge", help="merge contig sets through a DBG")
    p.add_argument("-o", default="out", help="output prefix")
    p.add_argument("-f", nargs="+", default=[], help="contig/scaffold FASTA files")
    p.add_argument("-c", type=int, default=1, help="minimum coverage")
    p.add_argument("-k", type=float, default=1.0, help="k = factor * read_length")
    p.add_argument("-l", type=float, default=2.0,
                   help="min length = factor * read_length")
    p.add_argument("-u", type=float, default=0.0, help="bubble crush threshold")
    p.add_argument("-d", type=float, default=0.5, help="branch cut threshold")
    p.add_argument("-m", type=int, default=16, help="memory GB (parity)")
    p.add_argument("-tmp", default=".", help="tmp dir (parity)")
    p.set_defaults(func=run)


def read_contigs_cutn(paths, min_length: int):
    """readFastaCoverageCutN: split at N runs, keep pieces >= min_length,
    each piece inherits the header coverage."""
    seqs, covs, lens_all, covs_all = [], [], [], []
    for path in paths:
        if not os.path.exists(path):
            raise IOError_(f"cannot open file: {path}")
        for name, s in fa.iter_fasta(path):
            cov = fa.parse_cov(name)
            codes = fa.seq_to_codes(s)
            lens_all.append(len(codes))
            covs_all.append(cov)
            isb = codes != 4
            if not isb.any():
                continue
            d = np.diff(isb.astype(np.int8))
            starts = [0] if isb[0] else []
            starts += list(np.nonzero(d == 1)[0] + 1)
            ends = list(np.nonzero(d == -1)[0] + 1)
            if isb[-1]:
                ends.append(len(codes))
            for st, ed in zip(starts, ends):
                if ed - st >= min_length:
                    seqs.append(codes[st:ed])
                    covs.append(cov)
    return seqs, np.array(covs, np.float64), lens_all, covs_all


def average_coverage_excluding_outlier(lengths, coverages) -> float:
    """calculateAverageCoverageExcludingOutlier (common.h:747-770) with
    minLength = median sequence length."""
    lengths = np.asarray(lengths, np.float64)
    coverages = np.asarray(coverages, np.float64)
    if len(lengths) == 0:
        return 0.0
    med = np.sort(lengths)[len(lengths) // 2]
    sel = lengths >= med
    if not sel.any():
        return 0.0
    mean0 = (coverages[sel] * lengths[sel]).sum() / lengths[sel].sum()
    ok = sel & (coverages >= mean0 / EXCLUSION_FACTOR) & (coverages <= mean0 * EXCLUSION_FACTOR)
    if not ok.any():
        return mean0
    return float((coverages[ok] * lengths[ok]).sum() / lengths[ok].sum())


def count_from_contigs(seqs, covs, k: int, min_occurrence: int) -> KmerTable:
    """Canonical k-mers of all contigs; value = MAX over sources of
    max(coverage, min_occurrence)."""
    import jax.numpy as jnp

    from ..ops.padding import next_pow2
    keep = [i for i, s in enumerate(seqs) if len(s) >= k]
    if not keep:
        return KmerTable(k, np.zeros((0, num_words(k)), np.uint32),
                         np.zeros((0,), np.uint32))
    lmax = -(-max(len(seqs[i]) for i in keep) // 32) * 32
    acc_k = acc_v = None
    CHUNK = max(1, (1 << 25) // max(lmax, 1))
    for c0 in range(0, len(keep), CHUNK):
        sel = keep[c0: c0 + CHUNK]
        rows = next_pow2(len(sel), minimum=16)
        mat = np.full((rows, lmax), 4, dtype=np.uint8)
        vals = np.zeros((rows,), np.uint32)
        for r, i in enumerate(sel):
            mat[r, : len(seqs[i])] = seqs[i]
            vals[r] = min(max(int(covs[i]), min_occurrence), cnt.MAX_OCCURRENCE)
        keys, valid = extract_canonical_kmers(jnp.asarray(mat), k)
        W = keys.shape[-1]
        flat = keys.reshape(-1, W)
        v = jnp.broadcast_to(jnp.asarray(vals)[:, None], valid.shape).reshape(-1)
        skeys, svals = cnt.sort_by_key(flat, v)
        ukeys, uvals, n = cnt.dedup_max(skeys, svals)
        if acc_k is None:
            acc_k, acc_v = cnt.compact_host(ukeys, uvals, n)
        else:
            kk, vv = cnt.compact_host(ukeys, uvals, n)
            both_k = np.concatenate([acc_k, kk])
            both_v = np.concatenate([acc_v, vv])
            from ..ops.padding import pad_pow2
            sk, sv = cnt.sort_by_key(jnp.asarray(pad_pow2(both_k, np.uint32(0xFFFFFFFF))),
                                     jnp.asarray(pad_pow2(both_v, 0)))
            uk, uv, n2 = cnt.dedup_max(sk, sv)
            acc_k, acc_v = cnt.compact_host(uk, uv, n2)
    return KmerTable(k, acc_k, acc_v)


def run_merge(contig_files, out_prefix, k_factor=1.0, len_factor=2.0,
              min_cov=1, bubble=0.0, branch=0.5):
    if not contig_files:
        raise ArgError("merge: not specified contig file!! (-f)")
    read_len = 100
    for name, _s in fa.iter_fasta(contig_files[0]):
        read_len = fa.parse_read_length(name)
        break
    k = int(k_factor * read_len + 0.5)
    min_len = int(len_factor * read_len + 0.5)
    LOG.info(f"K = {k}, loading kmers from contigs...")
    seqs, covs, lens_all, covs_all = read_contigs_cutn(contig_files, min_len)
    avg_cov = average_coverage_excluding_outlier(lens_all, covs_all)
    table = count_from_contigs(seqs, covs, k, min_cov)
    dbg = build_dbg_from_table(table, cutoff=0)
    clean.cut_branch_iterative(dbg, branch)
    if bubble > 0:
        clean.crush_bubble_iterative(dbg, avg_cov, bubble)

    import jax.numpy as jnp
    u = dbg.label_unitigs()
    useqs, ulens = dbg.unitig_sequences()
    contigs = [useqs[i, : ulens[i]] for i in range(u.num_unitigs)]
    contig_covs = [float(u.ucov[i]) for i in range(u.num_unitigs)]
    ji, jc = dbg.junction_info()
    j_codes = (np.asarray(kmer_to_codes(jnp.asarray(np.asarray(dbg.keys)[ji]), k))
               if len(ji) else np.zeros((0, k), np.uint8))
    fa.write_contigs(f"{out_prefix}_merged.fa", contigs, contig_covs, 1.0,
                     read_len, k, prefix="seq")
    fa.write_contigs(f"{out_prefix}_mergedJunctionKmer.fa",
                     [j_codes[i] for i in range(len(ji))],
                     [float(c) for c in jc], 1.0, read_len, k,
                     prefix="junction")
    LOG.info("merge completed!")
    return 0


def run(args) -> int:
    rc = run_merge(args.f, args.o, k_factor=args.k, len_factor=args.l,
                   min_cov=args.c, bubble=args.u, branch=args.d)
    LOG.report_memory()
    return rc
