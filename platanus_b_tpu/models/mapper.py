"""Short-read seed-and-extend mapper over contigs — batched on device.

Re-design of the reference Mapper (mapper.h:57-167, mapper.cpp):

- index = ALL forward keyLength-mers of the contigs, kept as a SORTED key
  table with position payloads; a key's postings are the contiguous
  [lower_bound, upper_bound) run (replaces the hash of MapPointer buckets,
  mapper.cpp:56-148). Contigs live in one concatenated base pool.
- mapRead (mapper.cpp:321-410): non-overlapping seed words from the read
  tail; per seed, canonical fwd+rev key lookup, exact-match extension from
  keyLength to wordLength, UNIQUE-extension filter, then a vote over seeds
  for the modal (contig, offset); first/second-max tie -> unmapped.
  Here all reads x seeds x candidates are one static-shape kernel.
- mapReadUngapAlignment (mapper.cpp:537-682): full-overlap ungapped
  mismatch count, score = match - 50*mismatch, unique max-score hit.
  Used by polish with identity >= 0.97 and coverage estimation.

Deviations (documented): a seed whose raw posting count exceeds the static
candidate budget H is treated as repetitive and discarded; the reference
scans all postings but near-always discards such seeds anyway via the
unique-extension rule (>1 full match -> invalid).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.kmer import extract_forward_kmers
from ..ops.multiword import num_words, revcomp
from ..ops.padding import next_pow2
from ..ops.search import lookup_range_jit
from ..utils.log import LOG

MAX_CANDIDATES = 16  # H: static per-seed candidate budget

# polish / coverage constants (mapper.cpp:29-31)
MIN_IDENTITY_FOR_SCAFFOLD = 0.95
MIN_IDENTITY_TO_CHECK_MAPPING = 0.95
MATCH_SCORE = 1
MISMATCH_SCORE = -50


class ContigIndex:
    """Concatenated contig pool + sorted forward k-mer position table."""

    def __init__(self, contigs: list[np.ndarray], key_length: int = 32):
        self.key_length = int(key_length)
        self.num_contigs = len(contigs)
        lengths = np.array([len(c) for c in contigs], dtype=np.int32)
        starts = np.zeros(self.num_contigs + 1, dtype=np.int32)
        np.cumsum(lengths, out=starts[1:])
        pool = (np.concatenate(contigs) if contigs
                else np.zeros((0,), np.uint8)).astype(np.uint8)
        pool_cap = next_pow2(max(len(pool), 1), minimum=64)
        self.pool = np.full((pool_cap,), 4, dtype=np.uint8)
        self.pool[: len(pool)] = pool
        self.lengths = lengths
        self.starts = starts
        self._build_key_table(contigs)
        self._dev = None

    def _build_key_table(self, contigs: list[np.ndarray]) -> None:
        k = self.key_length
        W = num_words(k)
        keys_all, pos_all = [], []
        if contigs:
            lmax = max(len(c) for c in contigs)
            lmax = -(-max(lmax, k) // 32) * 32
            # batch contigs into a padded matrix in chunks to bound memory
            CHUNK = max(1, (1 << 24) // max(lmax, 1))
            for c0 in range(0, len(contigs), CHUNK):
                chunk = contigs[c0: c0 + CHUNK]
                mat = np.full((len(chunk), lmax), 4, dtype=np.uint8)
                for i, c in enumerate(chunk):
                    mat[i, : len(c)] = c
                keys, valid = extract_forward_kmers(jnp.asarray(mat), k)
                keys = np.asarray(keys)
                valid = np.asarray(valid)
                P = keys.shape[1]
                gpos = (self.starts[c0: c0 + len(chunk), None]
                        + np.arange(P, dtype=np.int32)[None, :])
                sel = valid
                keys_all.append(keys[sel])
                pos_all.append(np.broadcast_to(gpos, valid.shape)[sel])
        if keys_all:
            keys = np.concatenate(keys_all, axis=0)
            pos = np.concatenate(pos_all, axis=0).astype(np.int32)
        else:
            keys = np.zeros((0, W), np.uint32)
            pos = np.zeros((0,), np.int32)
        order = np.lexsort(tuple(keys[:, w] for w in range(W - 1, -1, -1)))
        keys, pos = keys[order], pos[order]
        self.table_len = len(keys)
        cap = next_pow2(max(self.table_len, 1), minimum=64)
        self.key_table = np.full((cap, W), 0xFFFFFFFF, dtype=np.uint32)
        self.key_table[: self.table_len] = keys
        self.key_pos = np.zeros((cap,), np.int32)
        self.key_pos[: self.table_len] = pos

    def device_arrays(self):
        """(key_table, key_pos, pool, starts, lengths, table_len) on device."""
        if self._dev is None:
            self._dev = (jnp.asarray(self.key_table), jnp.asarray(self.key_pos),
                         jnp.asarray(self.pool), jnp.asarray(self.starts),
                         jnp.asarray(self.lengths),
                         jnp.int32(self.table_len))
        return self._dev


# ---------------------------------------------------------------------------
# mapRead kernel
# ---------------------------------------------------------------------------

def _map_votes(key_table, key_pos, pool, starts, clens, table_len,
               codes, lengths, key_len: int, word_len: int, S: int, H: int):
    """Shared seed-vote computation of the mapping kernels: per-seed
    uniquely-extended positions (vote_id/vote_off, 0 = none)."""
    R, L = codes.shape
    W = key_table.shape[-1]
    P = max(L - key_len + 1, 1)
    C = starts.shape[0] - 1

    fkeys, fvalid = extract_forward_kmers(codes, key_len)  # (R, P, W)
    if fkeys.shape[1] == 0:
        z = jnp.zeros((R, S), jnp.int32)
        zc = jnp.zeros((R, S, H), jnp.int32)
        return (z, z, jnp.zeros((R, S), bool),
                (zc.astype(bool), zc.astype(bool), zc, zc, z))

    # seed start positions, from the tail (mapper.cpp:330-332)
    s_idx = jnp.arange(S, dtype=jnp.int32)
    i_raw = lengths[:, None] - word_len - s_idx[None, :] * word_len  # (R, S)
    seed_exists = (i_raw > -word_len) & (lengths[:, None] >= word_len)
    i_s = jnp.clip(i_raw, 0, P - 1)

    rows = jnp.arange(R, dtype=jnp.int32)[:, None]
    fk = fkeys[rows, i_s]                       # (R, S, W)
    kvalid = fvalid[rows, i_s] & seed_exists    # (R, S)
    rk = revcomp(fk, key_len)

    q = jnp.concatenate([fk.reshape(-1, W), rk.reshape(-1, W)], axis=0)
    lo, hi = lookup_range_jit(key_table, q, table_len)
    lo_f, lo_r = lo[: R * S].reshape(R, S), lo[R * S:].reshape(R, S)
    hi_f, hi_r = hi[: R * S].reshape(R, S), hi[R * S:].reshape(R, S)
    n_f = hi_f - lo_f
    n_r = hi_r - lo_r
    tot = n_f + n_r
    seed_ok = kvalid & (tot > 0) & (tot <= H)

    # candidate postings (R, S, H)
    j = jnp.arange(H, dtype=jnp.int32)[None, None, :]
    is_fwd = j < n_f[..., None]
    pidx = jnp.where(is_fwd, lo_f[..., None] + j,
                     lo_r[..., None] + (j - n_f[..., None]))
    cand = (j < tot[..., None]) & seed_ok[..., None]
    pidx = jnp.clip(pidx, 0, key_pos.shape[0] - 1)
    gpos = key_pos[pidx]                                   # (R, S, H)
    cid = jnp.clip(jnp.searchsorted(starts, gpos, side="right").astype(jnp.int32) - 1,
                   0, C - 1)
    offset = gpos - starts[cid]
    clen = clens[cid]

    # exact extension keyLength..wordLength-1 (mapper.cpp:345-365)
    ok = cand
    ok = ok & jnp.where(is_fwd, offset <= clen - word_len,
                        offset >= word_len - key_len)
    pool_n = pool.shape[0]
    for kk in range(key_len, word_len):
        rb = codes[rows[..., None], jnp.clip(i_s[..., None] + kk, 0, L - 1)]
        fpos = jnp.clip(gpos + kk, 0, pool_n - 1)
        rpos = jnp.clip(gpos + key_len - 1 - kk, 0, pool_n - 1)
        fmatch = pool[fpos] == rb
        rmatch = pool[rpos] == (3 ^ rb)
        ok = ok & jnp.where(is_fwd, fmatch, rmatch)

    n_success = jnp.sum(ok.astype(jnp.int32), axis=-1)      # (R, S)
    seed_valid = seed_ok & (n_success == 1)
    pick = jnp.argmax(ok, axis=-1)                          # (R, S)
    pk = pick[..., None]
    sel = lambda a: jnp.take_along_axis(a, pk, axis=-1)[..., 0]
    v_isfwd = sel(is_fwd)
    v_cid = sel(cid)
    v_off = sel(offset)
    vote_id = jnp.where(v_isfwd, v_cid + 1, -(v_cid + 1)).astype(jnp.int32)
    vote_off = jnp.where(v_isfwd, v_off - i_s,
                         v_off + i_s + key_len - 1).astype(jnp.int32)
    vote_id = jnp.where(seed_valid, vote_id, 0)
    return (vote_id, vote_off, seed_valid,
            (ok, is_fwd, cid, offset, i_s))


@functools.partial(jax.jit, static_argnames=("key_len", "word_len", "S", "H"))
def _map_kernel(key_table, key_pos, pool, starts, clens, table_len,
                codes, lengths, key_len: int, word_len: int, S: int, H: int):
    """Map every read; returns (id, offset) per read.

    id: +-(contig+1), 0 = unmapped; offset = contig position of read base 0
    in mapping orientation (mapper.cpp:355,366 normalization).
    """
    R = codes.shape[0]
    vote_id, vote_off, seed_valid, _cands = _map_votes(
        key_table, key_pos, pool, starts, clens, table_len, codes, lengths,
        key_len, word_len, S, H)

    # modal (id, offset) vote with unique-top-group rule (mapper.cpp:383-409)
    eq = ((vote_id[:, :, None] == vote_id[:, None, :])
          & (vote_off[:, :, None] == vote_off[:, None, :])
          & seed_valid[:, None, :])
    c = jnp.sum(eq.astype(jnp.int32), axis=-1) * seed_valid  # (R, S)
    m1 = jnp.max(c, axis=-1)                                  # (R,)
    n_top = jnp.sum((c == m1[:, None]) & seed_valid, axis=-1)
    mapped = (m1 > 0) & (n_top == m1)
    best = jnp.argmax(c, axis=-1)
    bid = jnp.take_along_axis(vote_id, best[:, None], 1)[:, 0]
    boff = jnp.take_along_axis(vote_off, best[:, None], 1)[:, 0]
    return (jnp.where(mapped, bid, 0).astype(jnp.int32),
            jnp.where(mapped, boff, 0).astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("key_len", "word_len", "S", "H"))
def _map_kernel_multi(key_table, key_pos, pool, starts, clens, table_len,
                      codes, lengths, key_len: int, word_len: int, S: int,
                      H: int):
    """Multi-report variant (mapReadMultiReportsMultiSeed,
    mapper.cpp:415-536): EVERY successfully extended candidate position is
    reported — no unique-extension or modal-vote filtering. Returns
    (ids, offs) of shape (R, S*H) with 0 = empty slot."""
    _vi, _vo, _sv, cands = _map_votes(
        key_table, key_pos, pool, starts, clens, table_len, codes, lengths,
        key_len, word_len, S, H)
    ok, is_fwd, cid, offset, i_s = cands
    rep_id = jnp.where(ok, jnp.where(is_fwd, cid + 1, -(cid + 1)), 0)
    rep_off = jnp.where(is_fwd, offset - i_s[..., None],
                        offset + i_s[..., None] + key_len - 1)
    rep_off = jnp.where(ok, rep_off, 0)
    R = rep_id.shape[0]
    return (rep_id.reshape(R, -1).astype(jnp.int32),
            rep_off.reshape(R, -1).astype(jnp.int32))


def map_reads_multi(index: ContigIndex, codes: np.ndarray,
                    lengths: np.ndarray,
                    seed_lengths: list[int] | tuple[int, ...] = (32,),
                    max_candidates: int = MAX_CANDIDATES):
    """All distinct mapped positions per read (multi-report).

    Returns (read_idx, ids, offs) flat arrays: one row per distinct
    (read, signed contig id, offset) report, seed lengths falling through
    for reads with zero reports (mapReadMultiReportsMultiSeedFiltered,
    mapper.cpp:506-536)."""
    kt, kp, pool, starts, clens, tl = index.device_arrays()
    R, L = codes.shape
    rows_out = []
    todo = np.ones((R,), bool)
    for word_len in seed_lengths:
        word_len = int(word_len)
        if not todo.any() or L < word_len:
            break
        S = max(-(-L // word_len) + 1, 1)
        vid, voff = _map_kernel_multi(kt, kp, pool, starts, clens, tl,
                                      jnp.asarray(codes),
                                      jnp.asarray(lengths),
                                      index.key_length, word_len, S,
                                      max_candidates)
        vid, voff = np.asarray(vid), np.asarray(voff)
        ridx = np.repeat(np.arange(R), vid.shape[1])
        flat_id = vid.reshape(-1)
        flat_off = voff.reshape(-1)
        keep = (flat_id != 0) & todo[ridx]
        if keep.any():
            rec = np.stack([ridx[keep], flat_id[keep], flat_off[keep]],
                           axis=1)
            rec = np.unique(rec, axis=0)
            rows_out.append(rec)
            todo[np.unique(rec[:, 0])] = False
    if not rows_out:
        z = np.zeros(0, np.int64)
        return z, z.astype(np.int32), z.astype(np.int32)
    rec = np.concatenate(rows_out, axis=0)
    order = np.lexsort((rec[:, 2], rec[:, 1], rec[:, 0]))
    rec = rec[order]
    return (rec[:, 0].astype(np.int64), rec[:, 1].astype(np.int32),
            rec[:, 2].astype(np.int32))


def map_reads(index: ContigIndex, codes: np.ndarray, lengths: np.ndarray,
              seed_lengths: list[int] | tuple[int, ...] = (32,),
              max_candidates: int = MAX_CANDIDATES):
    """mapReadMultiSeedFiltered over a batch (mapper.cpp:506-516): try each
    seed length in order, fall through for still-unmapped reads."""
    kt, kp, pool, starts, clens, tl = index.device_arrays()
    R, L = codes.shape
    ids = np.zeros((R,), np.int32)
    offs = np.zeros((R,), np.int32)
    todo = np.ones((R,), bool)
    for word_len in seed_lengths:
        word_len = int(word_len)
        if not todo.any() or L < word_len:
            break
        S = max(-(-L // word_len) + 1, 1)
        i, o = _map_kernel(kt, kp, pool, starts, clens, tl,
                           jnp.asarray(codes), jnp.asarray(lengths),
                           index.key_length, word_len, S, max_candidates)
        i, o = np.asarray(i), np.asarray(o)
        take = todo & (i != 0)
        ids[take], offs[take] = i[take], o[take]
        todo &= ~take
    return ids, offs


# ---------------------------------------------------------------------------
# ungapped-alignment mapper (polish / coverage)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("key_len", "seed_len", "S", "H"))
def _map_ungap_kernel(key_table, key_pos, pool, starts, clens, table_len,
                      codes, lengths, min_identity,
                      key_len: int, seed_len: int, S: int, H: int):
    """mapReadUngapAlignment (mapper.cpp:537-682) in bulk.

    Returns (id, offset, identity, mis, span) per read; id = 0 if no unique
    max-score alignment meets the identity threshold.
    """
    R, L = codes.shape
    W = key_table.shape[-1]
    P = max(L - key_len + 1, 1)
    C = starts.shape[0] - 1
    pool_n = pool.shape[0]

    fkeys, fvalid = extract_forward_kmers(codes, key_len)
    s_idx = jnp.arange(S, dtype=jnp.int32)
    i_raw = lengths[:, None] - seed_len - s_idx[None, :] * seed_len
    seed_exists = (i_raw > -seed_len) & (lengths[:, None] >= seed_len)
    i_s = jnp.clip(i_raw, 0, P - 1)
    rows = jnp.arange(R, dtype=jnp.int32)[:, None]
    fk = fkeys[rows, i_s]
    kvalid = fvalid[rows, i_s] & seed_exists
    rk = revcomp(fk, key_len)

    q = jnp.concatenate([fk.reshape(-1, W), rk.reshape(-1, W)], axis=0)
    lo, hi = lookup_range_jit(key_table, q, table_len)
    lo_f, lo_r = lo[: R * S].reshape(R, S), lo[R * S:].reshape(R, S)
    n_f = (hi[: R * S] - lo[: R * S]).reshape(R, S)
    n_r = (hi[R * S:] - lo[R * S:]).reshape(R, S)
    tot = n_f + n_r
    seed_ok = kvalid & (tot > 0) & (tot <= H)

    j = jnp.arange(H, dtype=jnp.int32)[None, None, :]
    is_fwd = j < n_f[..., None]
    pidx = jnp.where(is_fwd, lo_f[..., None] + j,
                     lo_r[..., None] + (j - n_f[..., None]))
    cand = (j < tot[..., None]) & seed_ok[..., None]
    pidx = jnp.clip(pidx, 0, key_pos.shape[0] - 1)
    gpos = key_pos[pidx]
    cid = jnp.clip(jnp.searchsorted(starts, gpos, side="right").astype(jnp.int32) - 1,
                   0, C - 1)
    offset = gpos - starts[cid]
    clen = clens[cid]

    ok = cand
    ok = ok & jnp.where(is_fwd, offset <= clen - seed_len,
                        offset >= seed_len - key_len)
    for kk in range(key_len, seed_len):
        rb = codes[rows[..., None], jnp.clip(i_s[..., None] + kk, 0, L - 1)]
        fpos = jnp.clip(gpos + kk, 0, pool_n - 1)
        rpos = jnp.clip(gpos + key_len - 1 - kk, 0, pool_n - 1)
        ok = ok & jnp.where(is_fwd, pool[fpos] == rb, pool[rpos] == (3 ^ rb))

    # full-overlap ungapped mismatch count (mapper.cpp:591-666).
    # read-start offset on the contig in mapping orientation:
    ro = jnp.where(is_fwd, offset - i_s[..., None],
                   offset + i_s[..., None] + key_len - 1)
    # alignment span on the read: positions p where the contig coordinate is
    # in range: fwd coord = ro + p; rev coord = ro - p
    a_start = jnp.where(is_fwd, jnp.maximum(0, -ro),
                        jnp.maximum(0, ro - (clen - 1)))
    Lr = lengths[:, None, None]
    a_end = jnp.where(is_fwd, jnp.minimum(Lr, clen - ro),
                      jnp.minimum(Lr, ro + 1))
    span = jnp.maximum(a_end - a_start, 0)

    p = jnp.arange(L, dtype=jnp.int32)  # read positions
    # contig-LOCAL coordinate, lifted into the concatenated pool by the
    # contig's start (indexing the pool with the local offset compared
    # reads against the wrong contig whenever the hit contig wasn't
    # first — exact reads measured ~0.25 identity and polish masked
    # whole assemblies)
    coord = jnp.where(is_fwd[..., None], ro[..., None] + p,
                      ro[..., None] - p)                      # (R, S, H, L)
    gcoord = starts[cid][..., None] + coord
    cb = pool[jnp.clip(gcoord, 0, pool_n - 1)]
    tb = jnp.where(is_fwd[..., None], cb, 3 ^ jnp.minimum(cb, 3))
    rb = codes[:, None, None, :]
    in_span = (p >= a_start[..., None]) & (p < a_end[..., None])
    mm = in_span & (rb != 4) & (cb != 4) & (tb != rb)
    mis = jnp.sum(mm.astype(jnp.int32), axis=-1)              # (R, S, H)

    mis_thresh = ((1.0 - min_identity) * span).astype(jnp.int32)
    good = ok & (mis <= mis_thresh) & (span > 0)
    score = MATCH_SCORE * (span - mis) + MISMATCH_SCORE * mis
    score = jnp.where(good, score, jnp.iinfo(jnp.int32).min)

    # dedup identical (cid, ro, orient) candidates across seeds so one
    # alignment doesn't vote twice (mapper.cpp:579-580 dedup vs maxScore):
    # O((S*H)^2) pairwise equality over the small candidate axis
    f_cid = cid.reshape(R, S * H)
    f_ro = ro.reshape(R, S * H)
    f_fwd = is_fwd.reshape(R, S * H)
    flat_score = score.reshape(R, S * H)
    eqm = ((f_cid[:, :, None] == f_cid[:, None, :])
           & (f_ro[:, :, None] == f_ro[:, None, :])
           & (f_fwd[:, :, None] == f_fwd[:, None, :]))
    idx = jnp.arange(S * H)
    earlier = eqm & (idx[None, None, :] < idx[None, :, None])
    has_earlier = jnp.any(earlier & (flat_score[:, None, :] >
                                     jnp.iinfo(jnp.int32).min), axis=-1)
    flat_score = jnp.where(~has_earlier, flat_score, jnp.iinfo(jnp.int32).min)

    best = jnp.argmax(flat_score, axis=-1)
    max_score = jnp.take_along_axis(flat_score, best[:, None], 1)[:, 0]
    n_best = jnp.sum((flat_score == max_score[:, None])
                     & (flat_score > jnp.iinfo(jnp.int32).min), axis=-1)
    unique = (max_score > jnp.iinfo(jnp.int32).min) & (n_best == 1)

    def pick(a):
        return jnp.take_along_axis(a.reshape(R, S * H), best[:, None], 1)[:, 0]

    b_fwd = pick(is_fwd)
    b_cid = pick(cid)
    b_ro = pick(ro)
    b_mis = pick(mis)
    b_span = pick(span)
    out_id = jnp.where(unique,
                       jnp.where(b_fwd, b_cid + 1, -(b_cid + 1)), 0)
    ident = jnp.where(b_span > 0,
                      (b_span - b_mis) / jnp.maximum(b_span, 1), 0.0)
    return (out_id.astype(jnp.int32), b_ro.astype(jnp.int32),
            ident.astype(jnp.float32), b_mis, b_span)


def map_reads_ungap(index: ContigIndex, codes: np.ndarray, lengths: np.ndarray,
                    min_identity: float, seed_length: int = 32,
                    max_candidates: int = MAX_CANDIDATES):
    """Batch mapReadUngapAlignment. Returns (ids, offsets, identities)."""
    kt, kp, pool, starts, clens, tl = index.device_arrays()
    R, L = codes.shape
    if L < seed_length or index.table_len == 0:
        return (np.zeros((R,), np.int32), np.zeros((R,), np.int32),
                np.zeros((R,), np.float32))
    S = max(-(-L // seed_length) + 1, 1)
    i, o, ident, _, _ = _map_ungap_kernel(
        kt, kp, pool, starts, clens, tl, jnp.asarray(codes),
        jnp.asarray(lengths), jnp.float32(min_identity),
        index.key_length, int(seed_length), S, max_candidates)
    return np.asarray(i), np.asarray(o), np.asarray(ident)
