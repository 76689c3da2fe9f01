"""Deterministic k-mer counting: sort + segment-reduce on device.

The reference counts k-mers into a 1024-way lock-striped open-addressing
DoubleHash with out-of-core spill passes (counter.h:276-383,459-476,
doubleHash.h:118-218). Random scatter into an HBM hash table is the wrong
shape for a TPU; the idiomatic equivalent is a *sorted multiset*: extract
all canonical k-mers, sort them (XLA's native multi-operand sort), and
segment-reduce equal runs. The result — a sorted unique-key table with
counts — doubles as the lookup structure (binary search, ops.search)
everywhere the reference probes its hash table.

Determinism is total (no lock interleavings), and the sorted table is also
exactly what graph construction wants (graph.h:290 consumes sorted seeds).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .kmer import SENTINEL, extract_canonical_kmers
from .multiword import mw_eq

# occurrence values saturate one below the u16 deleted-marker, as in
# countKmerOrWriteTemporary (counter.h:459-476: UINT16_MAX-1 cap)
MAX_OCCURRENCE = 0xFFFF - 1


def sort_by_key(keys: jnp.ndarray, *payloads: jnp.ndarray):
    """Sort rows of (N, W) keys lexicographically, carrying payloads.

    Unstable (30% cheaper on TPU): every caller reduces equal-key runs
    with order-independent ops (sum/max/compaction of unique keys), so
    payload order within a run never reaches an output."""
    W = keys.shape[-1]
    ops = tuple(keys[:, w] for w in range(W)) + tuple(payloads)
    out = jax.lax.sort(ops, num_keys=W, is_stable=False)
    skeys = jnp.stack(out[:W], axis=-1)
    return (skeys,) + tuple(out[W:])


def _run_marks(sorted_keys: jnp.ndarray):
    """(valid, is_new, is_end) masks over sorted multiword keys.

    SENTINEL (all-ones) rows sort last, so valid rows form a sorted prefix;
    is_new marks the first row of each equal-key run, is_end the last.
    """
    valid = ~mw_eq(sorted_keys, jnp.full_like(sorted_keys, SENTINEL))
    neq_next = ~mw_eq(sorted_keys[1:], sorted_keys[:-1])
    is_new = jnp.concatenate([valid[:1], valid[1:] & neq_next])
    is_end = valid & jnp.concatenate([neq_next,
                                      jnp.ones((1,), dtype=bool)])
    return valid, is_new, is_end


def _compact_ends(sorted_keys: jnp.ndarray, is_end: jnp.ndarray,
                  payload: jnp.ndarray):
    """Move run-end rows (with payload) to the front, preserving order.

    Sort-based: non-end rows get SENTINEL keys, and one more key sort
    moves the (unique, already ordered) end rows to the front. XLA's TPU
    sort runs at near-bandwidth speed, while the former searchsorted
    compaction lowered to a while-loop of giant random gathers that cost
    SECONDS at benchmark sizes (and crashed the worker at ~32M rows) —
    measured 4.2 s vs 0.15 s for an 8M-row fold.
    """
    masked = jnp.where(is_end[:, None], sorted_keys,
                       jnp.full_like(sorted_keys, SENTINEL))
    out = sort_by_key(masked, payload)
    return out[0], out[1]


def dedup_sum(sorted_keys: jnp.ndarray, sorted_counts: jnp.ndarray):
    """Collapse equal adjacent keys, summing counts.

    Returns (ukeys, ucounts, n_unique): unique keys packed at the front in
    sorted order (capacity = input length, tail filled with SENTINEL rows,
    zero counts). SENTINEL rows in the input sort last and are excluded.

    Scatter-free: run totals fall out of the inclusive cumsum evaluated at
    run ends (current end minus previous end, recovered with an exclusive
    cummax over the end-masked cumsum — csum is nondecreasing, so the
    running max IS the previous end's value), and compaction is one more
    key sort (_compact_ends).
    """
    n = sorted_keys.shape[0]
    valid, is_new, is_end = _run_marks(sorted_keys)
    n_unique = jnp.sum(is_new.astype(jnp.int32))
    counts = jnp.where(valid, sorted_counts.astype(jnp.uint32), 0)
    csum = jnp.cumsum(counts)
    # compact the inclusive cumsum at run ends; run totals are then just
    # adjacent differences of the COMPACTED rows (end i minus end i-1)
    ckeys, ccsum = _compact_ends(sorted_keys, is_end, csum)
    prev = jnp.concatenate([jnp.zeros((1,), ccsum.dtype), ccsum[:-1]])
    in_range = jnp.arange(n, dtype=jnp.int32) < n_unique
    ucounts = jnp.where(in_range, ccsum - prev, 0).astype(jnp.uint32)
    ukeys = jnp.where(in_range[:, None], ckeys,
                      jnp.full_like(ckeys, SENTINEL))
    return ukeys, ucounts, n_unique


def dedup_max(sorted_keys: jnp.ndarray, sorted_vals: jnp.ndarray):
    """Like dedup_sum but keeps the MAX value per key — the merge rule of
    saveContig's next-k table inserts (graph.h:1760-1765: keep larger
    occurrence). The segmented running max needs no scan at all: rows are
    sorted, so sorting (key, ~val) ranks each run's max first and the max
    sits at the run's END after sorting (key, val) ascending — we instead
    just take cummax reset-free via the same end-difference trick on a
    monotone transform. Simpler and correct: sort vals DESCENDING within
    runs by sorting (keys, MAX-val), so each run's FIRST row holds its
    max, then read it at run starts and compact starts."""
    n = sorted_keys.shape[0]
    W = sorted_keys.shape[-1]
    valid, is_new, _is_end = _run_marks(sorted_keys)
    n_unique = jnp.sum(is_new.astype(jnp.int32))
    vals = jnp.where(valid, sorted_vals.astype(jnp.uint32), 0)
    inv = jnp.uint32(0xFFFFFFFF) - vals
    # inv participates as the LAST SORT KEY (num_keys = W + 1), so each
    # run's first row holds its maximum value
    ops = tuple(sorted_keys[:, w] for w in range(W)) + (inv,)
    out = jax.lax.sort(ops, num_keys=W + 1, is_stable=False)
    rkeys = jnp.stack(out[:W], axis=-1)
    rvals = jnp.uint32(0xFFFFFFFF) - out[W]
    # after the (key, MAX-val) sort, each run's first row holds the run max;
    # recompute run starts on the re-sorted keys (same key order)
    _v2, r_is_new, _e2 = _run_marks(rkeys)
    ckeys, cmax = _compact_ends(rkeys, r_is_new, rvals)
    in_range = jnp.arange(n, dtype=jnp.int32) < n_unique
    uvals = jnp.where(in_range, cmax, 0).astype(jnp.uint32)
    ukeys = jnp.where(in_range[:, None], ckeys,
                      jnp.full_like(ckeys, SENTINEL))
    return ukeys, uvals, n_unique


@functools.partial(jax.jit, static_argnames=("k",))
def extract_flat(codes: jnp.ndarray, k: int) -> jnp.ndarray:
    """Canonical k-mer keys of a batch, flattened to (R*P, W) — the
    chunk-assembly front half of counting (invalid windows = SENTINEL)."""
    keys, _valid = extract_canonical_kmers(codes, k)
    return keys.reshape(-1, keys.shape[-1])


@functools.partial(jax.jit, static_argnames=("k",))
def extract_flat_packed(words: jnp.ndarray, nmask: jnp.ndarray,
                        k: int) -> jnp.ndarray:
    """extract_flat on 2-bit packed uploads (ReadBatch.packed()) — the
    byte-per-base unpack happens on device, so host->device traffic is
    2.25 bits/base instead of 8."""
    from .kmer import unpack_codes
    keys, _valid = extract_canonical_kmers(unpack_codes(words, nmask), k)
    return keys.reshape(-1, keys.shape[-1])


@functools.partial(jax.jit, static_argnames=("k",))
def extract_lanes_packed(words: jnp.ndarray, nmask: jnp.ndarray, k: int):
    """extract_flat_packed, but returning W SEPARATE 1-D u32 lane arrays.

    TPU layout hazard (measured round 4): a (N, 2) u32 array crossing a
    jit boundary into elementwise ops gets the tiled layout T(8,128) —
    the minor dim 2 pads to 128, a 64x memory blowup that OOMs at ~67M
    rows. Keys therefore travel as separate 1-D lanes everywhere in the
    counting hot path.
    """
    from .kmer import unpack_codes
    keys, _valid = extract_canonical_kmers(unpack_codes(words, nmask), k)
    W = keys.shape[-1]
    return tuple(keys[..., w].reshape(-1) for w in range(W))


def _lane_neq_prev(lanes):
    neq = lanes[0][1:] != lanes[0][:-1]
    for ln in lanes[1:]:
        neq = neq | (ln[1:] != ln[:-1])
    return neq


def _lane_valid(lanes):
    v = lanes[0] != SENTINEL
    for ln in lanes[1:]:
        v = v | (ln != SENTINEL)
    return v


def _marks_runlens(slanes, n_valid=None):
    """(is_end, counts) over W sorted 1-D lanes: run ends + run lengths.

    Run lengths need no segmented scan: at a run's end, the previous
    run's end position is the running max (exclusive cummax) of
    end-masked positions, so length = pos - prev. When the caller knows
    the valid-window count up front (extraction's valid mask), pass
    n_valid: valid rows form a sorted prefix, so the validity test is a
    single arange compare instead of W lane compares.
    """
    n = slanes[0].shape[0]
    if n_valid is None:
        valid = _lane_valid(slanes)
    else:
        valid = jnp.arange(n, dtype=jnp.int32) < n_valid
    neq = _lane_neq_prev(slanes)
    is_end = valid & jnp.concatenate([neq, jnp.ones((1,), bool)])
    pos = jnp.arange(1, n + 1, dtype=jnp.uint32)
    endpos = jnp.where(is_end, pos, 0)
    prev = jnp.concatenate([jnp.zeros((1,), jnp.uint32),
                            jax.lax.cummax(endpos)[:-1]])
    # u16 with the reference counter's exact saturation (counter.h:459-476
    # caps at UINT16_MAX-1) — and a 16-bit payload lane is half the sort
    # bandwidth of a 32-bit one
    counts = jnp.where(is_end,
                       jnp.minimum(pos - prev, MAX_OCCURRENCE), 0
                       ).astype(jnp.uint16)
    return is_end, counts


# hierarchical compaction: block-local sort moves each block's live rows
# to its front at ~(log2 BLOCK / log2 n)^2 the cost of a full sort, then
# one global sort over the surviving BLOCK/4 columns finishes. Safe while
# every block holds <= BLOCK/4 live rows — guaranteed-checked on device
# (spill flag -> full-sort fallback), and essentially never hit at
# realistic unique densities (mean + 30 sigma at 25%).
_COMPACT_BLOCK = 16384


def _compact_hierarchical(slanes, is_end, counts):
    """Compact run-end rows to the front: (lanes, counts, spilled).

    Rows where is_end is False become SENTINEL keys / zero counts. The
    result is fully sorted with all live rows first IF NOT spilled;
    callers must fall back to a full masked sort when spilled is True.
    """
    W = len(slanes)
    n = slanes[0].shape[0]
    L = _COMPACT_BLOCK
    C = L // 4
    if n % L != 0 or n // L < 4:
        masked = tuple(jnp.where(is_end, ln, jnp.uint32(SENTINEL))
                       for ln in slanes)
        out = jax.lax.sort(masked + (jnp.where(is_end, counts, 0),),
                           num_keys=W, is_stable=False)
        return tuple(out[:W]), out[W], jnp.zeros((), bool)
    B = n // L
    masked = tuple(jnp.where(is_end, ln, jnp.uint32(SENTINEL)).reshape(B, L)
                   for ln in slanes)
    cnts = jnp.where(is_end, counts, 0).reshape(B, L)
    per_block = jnp.sum(is_end.reshape(B, L).astype(jnp.int32), axis=1)
    spilled = jnp.any(per_block > C)
    blk = jax.lax.sort(masked + (cnts,), num_keys=W, dimension=1,
                       is_stable=False)
    kept = tuple(o[:, :C].reshape(-1) for o in blk)
    out = jax.lax.sort(kept[:W] + (kept[W],), num_keys=W,
                       is_stable=False)
    return tuple(out[:W]), out[W], spilled


@jax.jit
def count_lanes_hier(lanes):
    """count_lanes_fused with the hierarchical compaction.

    Returns (lanes, counts, n_unique, spilled); when spilled is True the
    compaction dropped rows and the caller MUST redo it via
    count_lanes_fused (full-sort compaction, always correct).
    """
    W = len(lanes)
    slanes = jax.lax.sort(lanes, num_keys=W, is_stable=False)
    is_end, counts = _marks_runlens(slanes)
    clanes, ccounts, spilled = _compact_hierarchical(slanes, is_end, counts)
    n_unique = jnp.sum(is_end.astype(jnp.int32))
    return clanes, ccounts, n_unique, spilled


@jax.jit
def count_lanes_fused(lanes):
    """Single-sort k-mer counting over ALL windows at once.

    lanes: tuple of W 1-D u32 arrays (one per key word), SENTINEL rows =
    invalid windows. ONE W-lane sort makes duplicate keys adjacent
    (counts implicit — no payload in the big sort); run lengths fall out
    of position arithmetic (pos at run end minus the previous end's pos,
    recovered with an exclusive cummax — no segmented scan); a second
    masked sort compacts the (unique key, count) rows to the front.
    Sorting IS the TPU's gather: measured on v5e, a 1-D gather/scatter at
    67M rows costs 1.5-3 s while a full 2-lane sort is 0.32 s, so both
    the dedup and the compaction are sorts.

    Replaces the chunked sort + log-structured fold (count_sorted_chunk +
    TableAccumulator) whenever the whole window stream fits HBM: half the
    total sorted rows, no fold, no per-chunk host syncs.

    Returns (compact lanes tuple, counts u32 (0 past n_unique), n_unique).
    """
    W = len(lanes)
    slanes = jax.lax.sort(lanes, num_keys=W, is_stable=False)
    is_end, counts = _marks_runlens(slanes)
    masked = tuple(jnp.where(is_end, ln, jnp.uint32(SENTINEL))
                   for ln in slanes)
    out = jax.lax.sort(masked + (counts,), num_keys=W, is_stable=False)
    n_unique = jnp.sum(is_end.astype(jnp.int32))
    return tuple(out[:W]), out[W], n_unique


@functools.partial(jax.jit, static_argnames=("k", "max_len"))
def count_packed_hier(words: jnp.ndarray, nmask: jnp.ndarray, k: int,
                      max_len: int = 0):
    """ONE executable for the whole counting pipeline: unpack the 2-bit
    upload, extract canonical k-mer lanes, sort, segment-count, and
    hierarchically compact. A single dispatch matters over the device
    tunnel, where each eager transfer/jit round trip costs tens of ms
    (measured: 10 per-batch extract dispatches = 1.5 s of the round-3
    pipeline's 3.5 s).

    words/nmask are the row-concatenation of every batch's packed()
    arrays; max_len (true longest read) caps the window count below the
    16-base packing granularity. Returns (lanes, counts, n_unique,
    spilled) like count_lanes_hier.
    """
    from .kmer import unpack_codes
    codes = unpack_codes(words, nmask)
    if max_len and max_len < codes.shape[1]:
        codes = codes[:, :max_len]
    return _count_codes_hier(codes, k)


@functools.partial(jax.jit, static_argnames=("k", "max_len"))
def count_packed_lens_hier(words: jnp.ndarray, lengths: jnp.ndarray, k: int,
                           max_len: int = 0):
    """count_packed_hier for N-free read batches: the mask derives from
    lengths on device, skipping the nmask upload (a third of the wire
    bytes — the tunnel moves ~35-40 MB/s, so bytes ARE wall-clock)."""
    from .kmer import unpack_codes_lens
    codes = unpack_codes_lens(words, lengths)
    if max_len and max_len < codes.shape[1]:
        codes = codes[:, :max_len]
    return _count_codes_hier(codes, k)


@functools.partial(jax.jit, static_argnames=("k", "read_len", "max_len"))
def count_packed_uniform_hier(words: jnp.ndarray, k: int, read_len: int,
                              max_len: int = 0):
    """count_packed_lens_hier when every read has the same length: no
    lengths upload at all (the wire carries exactly 2 bits/base)."""
    R, WW = words.shape
    base = jnp.stack([(words >> np.uint32(30 - 2 * i)) & 3
                      for i in range(16)], axis=-1).astype(jnp.uint8)
    base = base.reshape(R, WW * 16)
    pad = jnp.arange(WW * 16, dtype=jnp.int32)[None, :] >= read_len
    codes = jnp.where(pad, jnp.uint8(4), base)
    if max_len and max_len < codes.shape[1]:
        codes = codes[:, :max_len]
    return _count_codes_hier(codes, k)


def _count_codes_hier(codes, k: int):
    keys, valid = extract_canonical_kmers(codes, k)
    W = keys.shape[-1]
    lanes = tuple(keys[..., w].reshape(-1) for w in range(W))
    n_valid = jnp.sum(valid.astype(jnp.int32))
    n = lanes[0].shape[0]
    L = _COMPACT_BLOCK
    if n % L:
        pad = L - n % L
        lanes = tuple(jnp.concatenate(
            [ln, jnp.full((pad,), jnp.uint32(SENTINEL))]) for ln in lanes)
    slanes = jax.lax.sort(lanes, num_keys=W, is_stable=False)
    is_end, counts = _marks_runlens(slanes, n_valid)
    clanes, ccounts, spilled = _compact_hierarchical(slanes, is_end, counts)
    n_unique = jnp.sum(is_end.astype(jnp.int32))
    # histogram in the SAME executable (one dispatch over the tunnel):
    # the compaction preserves exactly the end rows' count values (zeros
    # elsewhere map out of range in occurrence_histogram), and the
    # compacted lane is n/4 rows, so this sort is cheap.
    hist = occurrence_histogram(ccounts)
    return clanes, ccounts, n_unique, spilled, hist


@jax.jit
def count_sorted_chunk(flat: jnp.ndarray):
    """Sort + dedup a chunk of raw canonical keys (SENTINEL = invalid).

    The chunk is a concat of several batches' windows: one large sort2
    amortizes better than many small ones, and the per-chunk dedup
    shrinks rows ~2.5-3x before the cross-chunk fold. Counts are implicit
    (1 per valid window): valid rows sort to the front, so the inclusive
    cumsum of counts is just min(i+1, n_valid) — no cumsum pass.
    """
    n = flat.shape[0]
    (skeys,) = sort_by_key(flat)
    valid, is_new, is_end = _run_marks(skeys)
    n_valid = jnp.sum(valid.astype(jnp.uint32))
    n_unique = jnp.sum(is_new.astype(jnp.int32))
    csum = jnp.minimum(jnp.arange(1, n + 1, dtype=jnp.uint32), n_valid)
    ckeys, ccsum = _compact_ends(skeys, is_end, csum)
    prev = jnp.concatenate([jnp.zeros((1,), ccsum.dtype), ccsum[:-1]])
    in_range = jnp.arange(n, dtype=jnp.int32) < n_unique
    ucounts = jnp.where(in_range, ccsum - prev, 0).astype(jnp.uint32)
    ukeys = jnp.where(in_range[:, None], ckeys,
                      jnp.full_like(ckeys, SENTINEL))
    return ukeys, ucounts, n_unique


@functools.partial(jax.jit, static_argnames=("k",))
def count_batch(codes: jnp.ndarray, k: int):
    """Count canonical k-mers of one read batch.

    Returns (ukeys (C, W), ucounts (C,) uint32, n_unique) with
    C = total window capacity of the batch.
    """
    return count_sorted_chunk(extract_flat(codes, k))


@jax.jit
def merge_counts(keys_a, counts_a, keys_b, counts_b):
    """Merge two unique-count tables (concat + sort + segment-sum).

    Replaces the reference's iterative spill/re-count passes
    (counter.h:341-364) with a deterministic merge.
    """
    keys = jnp.concatenate([keys_a, keys_b], axis=0)
    counts = jnp.concatenate([counts_a.astype(jnp.uint32),
                              counts_b.astype(jnp.uint32)], axis=0)
    skeys, scounts = sort_by_key(keys, counts)
    return dedup_sum(skeys, scounts)


@jax.jit
def _sort_dedup(keys, counts):
    skeys, scounts = sort_by_key(keys, counts)
    return dedup_sum(skeys, scounts)


@jax.jit
def _sort_dedup_max(keys, vals):
    skeys, svals = sort_by_key(keys, vals)
    return dedup_max(skeys, svals)


def fold_tables(tables, rule: str = "sum"):
    """Merge N unique-count tables in one concat + sort + segment-reduce.

    tables: list of (keys (cap, W), counts (cap,), n int) device triples.
    Each table is sliced to its live rows, the concat is padded to a
    power-of-two capacity (bounded jit recompiles), and a single sort +
    segment reduce dedups — summing counts (rule='sum') or keeping the
    max (rule='max', the saveContig next-k merge rule, graph.h:1760-1765).
    Returns the same triple form, capacity-trimmed.
    """
    if len(tables) == 1:
        return tables[0]
    from .padding import next_pow2
    W = tables[0][0].shape[-1]
    total = sum(t[2] for t in tables)
    cap = next_pow2(max(total, 1))
    parts_k = [t[0][: t[2]] for t in tables]
    parts_c = [t[1][: t[2]].astype(jnp.uint32) for t in tables]
    if cap > total:
        parts_k.append(jnp.full((cap - total, W), SENTINEL, dtype=U32_DT))
        parts_c.append(jnp.zeros((cap - total,), jnp.uint32))
    keys = jnp.concatenate(parts_k, axis=0)
    counts = jnp.concatenate(parts_c, axis=0)
    reduce = _sort_dedup if rule == "sum" else _sort_dedup_max
    uk, uc, un = reduce(keys, counts)
    n = int(un)
    c = min(next_pow2(max(n, 1)), uk.shape[0])
    return uk[:c], uc[:c], n


class TableAccumulator:
    """Bounded log-structured fold of per-batch count tables.

    Parks incoming (keys, counts, n) tables; when the parked live rows
    exceed `budget_rows`, folds accumulator + parked in ONE sort whose
    working set is capped by the budget (plus the accumulator, itself
    bounded by the global unique-key count). This is the HBM-safe
    replacement for both the unbounded all-at-once merge (which crashed
    the TPU worker at benchmark scale) and the quadratic pairwise
    streaming fold — the TPU equivalent of the reference's out-of-core
    spill passes (counter.h:341-364).
    """

    def __init__(self, W: int, budget_rows: int | None = None,
                 rule: str = "sum"):
        self.W = W
        # working-set cap: rows * (W+1) u32 words * ~2x sort in+out
        self.budget_rows = budget_rows or max((3 << 28) // ((W + 1) * 8),
                                              1 << 20)
        self.rule = rule
        self.acc = None
        self.parked: list[tuple] = []
        self.parked_rows = 0

    def add(self, keys, counts, n: int) -> None:
        if n == 0:
            return
        from .padding import next_pow2
        cap = min(next_pow2(max(n, 1)), keys.shape[0])
        self.parked.append((keys[:cap], counts[:cap], n))
        self.parked_rows += n
        if self.parked_rows >= self.budget_rows:
            self._flush()

    def _flush(self) -> None:
        tables = ([self.acc] if self.acc is not None else []) + self.parked
        self.acc = fold_tables(tables, self.rule)
        self.parked = []
        self.parked_rows = 0

    def result(self):
        """Final (keys, counts, n) device triple (None-free; empty ok)."""
        if self.parked:
            self._flush()
        if self.acc is None:
            return (jnp.zeros((0, self.W), U32_DT),
                    jnp.zeros((0,), jnp.uint32), 0)
        return self.acc


@jax.jit
def compact_mask(keys: jnp.ndarray, keep: jnp.ndarray):
    """Compact masked rows of a sorted unique-key table to the front
    (device): rows where keep is False become SENTINEL and one key sort
    moves the kept (unique, ordered) rows forward. Returns
    (fkeys, n_keep)."""
    n_keep = jnp.sum(keep.astype(jnp.int32))
    masked = jnp.where(keep[:, None], keys, jnp.full_like(keys, SENTINEL))
    out = sort_by_key(masked)
    return out[0], n_keep


@jax.jit
def filter_by_count(keys: jnp.ndarray, counts: jnp.ndarray,
                    n: jnp.ndarray, cutoff: jnp.ndarray):
    """Compact rows with count >= cutoff to the front, on device.

    The device-resident form of loadKmer's occurrence filter
    (counter.h:600-640). Same stable flag-sort compaction as
    _compact_ends; dropped/tail rows become SENTINEL keys with zero
    counts, so the result slices directly into a DBG capacity buffer
    without a host round trip.
    """
    m = keys.shape[0]
    keep = (jnp.arange(m, dtype=jnp.int32) < n) & (counts >= cutoff)
    n_keep = jnp.sum(keep.astype(jnp.int32))
    # order-preserving compaction: one key sort over keep-masked keys
    # (kept keys are unique + already ordered, dropped rows sort last)
    fkeys, fcounts = _compact_ends(keys, keep, counts)
    in_range = jnp.arange(m, dtype=jnp.int32) < n_keep
    fkeys = jnp.where(in_range[:, None], fkeys, jnp.uint32(SENTINEL))
    fcounts = jnp.where(in_range, fcounts, 0)
    return fkeys, fcounts, n_keep


def compact_host(ukeys, ucounts, n_unique) -> tuple[np.ndarray, np.ndarray]:
    """Trim padded capacity to the true unique count (host-side)."""
    n = int(n_unique)
    return np.asarray(ukeys)[:n], np.asarray(ucounts)[:n]


@jax.jit
def occurrence_histogram(counts: jnp.ndarray) -> jnp.ndarray:
    """Occurrence distribution: hist[occ] = #distinct k-mers seen occ times.

    Mirrors occurrenceDistribution (counter.h:209-212); occurrences are
    clipped to MAX_OCCURRENCE like the saturating u16 counter. One
    single-key sort of the clipped values, then per-bin counts are
    adjacent differences of a 65536-query searchsorted — queries are
    BOUNDED (bin count, not table size), so the binary search's gather
    passes stay tiny.
    """
    occ = jnp.where(counts > 0,
                    jnp.clip(counts, 0, MAX_OCCURRENCE).astype(jnp.uint32),
                    jnp.uint32(SENTINEL))
    (socc,) = jax.lax.sort((occ,), num_keys=1, is_stable=False)
    bounds = jnp.searchsorted(socc,
                              jnp.arange(MAX_OCCURRENCE + 2,
                                         dtype=jnp.uint32),
                              side="left")
    return (bounds[1:] - bounds[:-1]).astype(jnp.int32)


def left_local_minimal_value(hist: np.ndarray, window_size: int = 1) -> int:
    """First local minimum of the smoothed occurrence histogram.

    Exact port of semantics in getLeftLocalMinimalValue (counter.h:243-266):
    slide a `window_size` sum from occ=1 upward and stop at the first
    non-decrease; the coverage cutoff follows assemble.cpp:319.
    """
    hist = np.asarray(hist)
    max_occ = int(np.max(np.nonzero(hist)[0])) if hist.any() else 0
    if max_occ <= window_size:
        return 0
    window_vector_size = max_occ - window_size + 2
    window = np.zeros(window_vector_size, dtype=np.uint64)
    for i in range(window_size):
        window[1] += hist[1 + i]
    i = 2
    while i < window_vector_size:
        window[i] = window[i - 1] - hist[i - 1] + hist[i + window_size - 1]
        if window[i] >= window[i - 1]:
            break
        i += 1
    if i <= max_occ:
        return i - 1 + window_size // 2
    return 1 + window_size // 2


def coverage_cutoff(hist: np.ndarray, manual: int = 0, repeat_mode: bool = False,
                    window_size: int = 1) -> int:
    """assemble.cpp:319-321: -n override, else max(localMin/2, 2)
    (or max(localMin, 2) in repeat mode)."""
    if manual:
        return int(manual)
    lm = left_local_minimal_value(hist, window_size)
    return max(lm if repeat_mode else lm // 2, 2)


def distribution_average(hist: np.ndarray, start: int, end: int) -> float:
    """calcDistributionAverage (counter.h:219-237): mean occurrence of
    distinct k-mers in [start, end]."""
    hist = np.asarray(hist, dtype=np.float64)
    end = min(end, len(hist) - 1)
    idx = np.arange(start, end + 1)
    num = float(hist[start:end + 1].sum())
    if num == 0:
        raise ValueError("empty k-mer distribution range")
    return float((idx * hist[start:end + 1]).sum() / num)


def write_occurrence_tsv(path: str, hist: np.ndarray) -> None:
    """PREFIX_<k>merFrq.tsv (counter.h:999-1007 outputOccurrenceDistribution)."""
    hist = np.asarray(hist)
    max_occ = int(np.max(np.nonzero(hist)[0])) if hist.any() else 0
    with open(path, "w") as f:
        for occ in range(1, max_occ + 1):
            f.write(f"{occ}\t{int(hist[occ])}\n")


_INTERNAL_OCC_MAGIC = 0x5054_5055_4F43_4331  # "PTPUOCC1" tag for k>32 files


def _doublehash_params(table_len: int):
    """indexLength/shifter exactly as DoubleHash (doubleHash.h:107-116,99)."""
    index_length = 1
    while table_len >> index_length != 0:
        index_length += 1
    shifter = 0 if index_length >= 32 else 2 * index_length
    return index_length, shifter


def _doublehash_slots(key64: np.ndarray, table_len: int) -> np.ndarray:
    """Slot of every (unique) u64 key in a DoubleHash of `table_len`
    (power of two), consistent with find_any's probing
    (doubleHash.h:118-146,170-185): h = (key + key>>L + key>>S) & mask,
    step = (~key ^ key>>L ^ key>>S) | 1, advance until free.

    Parallel greedy rounds: each round every unplaced key tries its next
    probe slot; one winner per contested slot; losers advance. Any final
    table produced this way is consistent with *some* sequential insertion
    order, which is all find_any requires.
    """
    L, S = _doublehash_params(table_len)
    mask = np.uint64(table_len - 1)
    key = key64.astype(np.uint64)
    h = (key + (key >> np.uint64(L)) + (key >> np.uint64(S))) & mask
    step = (~key ^ (key >> np.uint64(L)) ^ (key >> np.uint64(S))) \
        | np.uint64(1)
    slot = np.full(len(key), -1, dtype=np.int64)
    occupied = np.zeros(table_len, dtype=bool)
    pending = np.arange(len(key))
    pos = h.copy()
    while len(pending):
        p = pos[pending]
        free = ~occupied[p]
        cand = pending[free]
        cp = pos[cand]
        # one winner per slot this round (first occurrence)
        _uniq, first = np.unique(cp, return_index=True)
        winners = cand[first]
        slot[winners] = pos[winners]
        occupied[pos[winners]] = True
        won = np.zeros(len(key), dtype=bool)
        won[winners] = True
        pending = pending[~won[pending]]
        pos[pending] = (pos[pending] + step[pending]) & mask
    return slot


def pack_key64(keys: np.ndarray) -> np.ndarray:
    """(N, W<=2) uint32 multiword keys -> u64 scalars (word 0 = high)."""
    k = np.asarray(keys).astype(np.uint64)
    if k.ndim == 1:
        return k
    if k.shape[1] == 1:
        return k[:, 0]
    return (k[:, 0] << np.uint64(32)) | k[:, 1]


def write_occurrence_table_binary(path: str, keys: np.ndarray,
                                  counts: np.ndarray, k: int) -> None:
    """out_kmer_occ.bin export.

    k <= 32 (the `iterate`/`kmer_divide` use case): EXACT reference format
    — outputOccurrenceTableBinary (counter.h:955-963) + writeTable
    (doubleHash.h:266-280) over Kmer31 u64 keys: u64 kmerLength,
    u64 indexSize (table length - 1), then {u64 slot, u64 key, u16 value}
    records at genuine double-hash probe positions, so the reference
    binary's readTable + find_any work on our files and vice versa.

    k > 32: internal format (magic-tagged); the reference's KmerN
    serialization dumps raw C++ objects with vtable pointers
    (binstr.h:292-295, doubleHash.h:281-293) and is not portable.
    """
    keys = np.asarray(keys)
    counts = np.clip(np.asarray(counts), 0, 0xFFFF).astype(np.uint16)
    with open(path, "wb") as f:
        f.write(np.uint64(k).tobytes())
        if k <= 32:
            key64 = pack_key64(keys)
            n = len(key64)
            table_len = 1
            while table_len * DOUBLE_HASH_MAX_LOAD_FACTOR < max(n, 1):
                table_len <<= 1
            slots = _doublehash_slots(key64, table_len)
            order = np.argsort(slots)
            rec = np.zeros(n, dtype=np.dtype(
                [("slot", "<u8"), ("key", "<u8"), ("val", "<u2")],
                align=False))
            rec["slot"] = slots[order]
            rec["key"] = key64[order]
            rec["val"] = counts[order]
            f.write(np.uint64(table_len - 1).tobytes())
            f.write(rec.tobytes())
        else:
            w = keys.shape[1] if keys.ndim > 1 else 1
            f.write(np.uint64(_INTERNAL_OCC_MAGIC).tobytes())
            f.write(np.uint64(len(keys)).tobytes())
            f.write(np.uint64(w).tobytes())
            f.write(keys.astype(np.uint32).tobytes())
            f.write(counts.tobytes())


def read_occurrence_table_binary(path: str):
    """Inverse of write_occurrence_table_binary (also reads tables written
    by the reference binary for k <= 32); returns (k, keys (N, W) u32
    sorted, counts)."""
    with open(path, "rb") as f:
        k = int(np.frombuffer(f.read(8), np.uint64)[0])
        second = np.frombuffer(f.read(8), np.uint64)[0]
        if k > 32 and second == _INTERNAL_OCC_MAGIC:
            n = int(np.frombuffer(f.read(8), np.uint64)[0])
            w = int(np.frombuffer(f.read(8), np.uint64)[0])
            keys = np.frombuffer(f.read(4 * n * w),
                                 np.uint32).reshape(n, w).copy()
            counts = np.frombuffer(f.read(2 * n),
                                   np.uint16).astype(np.uint32)
            return k, keys, counts
        # reference DoubleHash format: {u64 slot, u64 key, u16 value}*
        rec = np.frombuffer(f.read(), dtype=np.dtype(
            [("slot", "<u8"), ("key", "<u8"), ("val", "<u2")], align=False))
        key64 = rec["key"].astype(np.uint64)
        counts = rec["val"].astype(np.uint32)
        order = np.argsort(key64, kind="stable")
        key64, counts = key64[order], counts[order]
        W = num_words_for_k(k)
        keys = np.zeros((len(key64), W), dtype=np.uint32)
        if W == 1:
            keys[:, 0] = key64.astype(np.uint32)
        else:
            keys[:, 0] = (key64 >> np.uint64(32)).astype(np.uint32)
            keys[:, 1] = (key64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        return k, keys, counts


def num_words_for_k(k: int) -> int:
    from .multiword import num_words
    return num_words(k)


# common.cpp:34
DOUBLE_HASH_MAX_LOAD_FACTOR = 0.9


U32_DT = jnp.uint32


@functools.partial(jax.jit, static_argnames=("k", "n_parts", "part"))
def count_batch_partition(codes: jnp.ndarray, k: int, part: int,
                          n_parts: int):
    """count_batch restricted to one key-space partition.

    Partitioning is by the TOP BITS of the canonical key's first word, so
    every partition is a contiguous sorted key range and the per-pass
    tables concatenate (in pass order) into the fully sorted global table
    — the TPU replacement for the reference's out-of-core spill/re-count
    passes under the -m memory budget (counter.h:341-364).
    """
    keys, valid = extract_canonical_kmers(codes, k)
    W = keys.shape[-1]
    flat = keys.reshape(-1, W)
    # top bits of word 0 (accounting for k < 32: only 2k bits are used)
    used_bits = min(2 * k, 32)
    shift = np.uint32(32 - used_bits)
    bits = max(n_parts.bit_length() - 1, 0)
    top = (flat[:, 0] << shift) >> np.uint32(32 - bits) if bits else \
        jnp.zeros(flat.shape[0], U32_DT)
    in_part = top == np.uint32(part)
    flat = jnp.where(in_part[:, None], flat,
                     jnp.full_like(flat, SENTINEL))
    (skeys,) = sort_by_key(flat)
    scounts = (~mw_eq(skeys, jnp.full_like(skeys, SENTINEL))
               ).astype(jnp.uint32)
    return dedup_sum(skeys, scounts)


def count_reads_partitioned(batches, k: int, n_parts: int):
    """Multi-pass partitioned counting: pass p counts only partition p of
    canonical key space (each pass's device working set is ~1/n_parts of
    the total), and the host concatenates the disjoint sorted slices.
    n_parts must be a power of two. Returns (keys, counts) host arrays."""
    assert n_parts & (n_parts - 1) == 0, "n_parts must be a power of two"
    from .multiword import num_words as _nw
    parts_k, parts_c = [], []
    for p in range(n_parts):
        acc = TableAccumulator(_nw(k))
        for b in batches:
            if b.num_reads == 0:
                continue
            from ..models.assemble_core import _pad_codes
            keys, counts, n = count_batch_partition(_pad_codes(b.codes), k,
                                                    p, n_parts)
            acc.add(keys, counts, int(n))
        acc_keys, acc_counts, acc_n = acc.result()
        if acc_n:
            parts_k.append(np.asarray(acc_keys[:acc_n]))
            parts_c.append(np.asarray(
                jnp.minimum(acc_counts[:acc_n],
                            MAX_OCCURRENCE)).astype(np.uint32))
    if not parts_k:
        from .multiword import num_words
        return (np.zeros((0, num_words(k)), np.uint32),
                np.zeros((0,), np.uint32))
    return np.concatenate(parts_k, axis=0), np.concatenate(parts_c, axis=0)
