"""Multi-host runtime: DCN-level read ingest sharding + host-0 gather.

The reference is strictly single-host: reads are dealt round-robin into
numThread per-host temporary files (seqlib.cpp:365-741) and every stage's
"transport" is the local filesystem (SURVEY §2.10). The TPU-native
scale-out adds a host axis on top of the device mesh:

- `initialize()` brings up the `jax.distributed` runtime when a
  coordinator is configured (no-op for the common single-host case);
- `host_shard(items)` assigns input read files / work items to hosts so
  each host only reads and packs ITS slice from local or network storage
  (the DCN-level analogue of the reference's per-thread file dealing);
- `host_read_plan(paths)` splits large files by byte range at record
  boundaries so even a single huge FASTQ is ingested host-parallel;
- `host0_gather(x)` / `all_hosts_concat(x)` move per-host results to
  host 0 (or everywhere) over DCN — the result-gather step of SURVEY
  §7.9 — and `broadcast_from_host0(x)` ships host-0 decisions (e.g. the
  coverage cutoff chosen from the global histogram) back out;
- `psum_histogram(local)` is the cross-host histogram reduction used to
  pick coverage cutoffs consistently (counter.h:245-267 semantics,
  computed on the GLOBAL distribution).

Everything degrades to the identity on a single process, so the entire
module is exercised by the regular (single-process) test suite; the
collective paths ride `jax.experimental.multihost_utils`, which is a
no-op passthrough at process_count()==1.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np


def initialize() -> bool:
    """Bring up jax.distributed when a coordinator is configured.

    Reads the standard env vars (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES,
    JAX_PROCESS_ID) or cloud-TPU auto-detection. Returns True when a
    multi-process runtime was initialized, False for single-process.
    """
    import jax

    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not coord:
        return False
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    kwargs = {"coordinator_address": coord}
    if nproc is not None:
        kwargs["num_processes"] = int(nproc)
    if pid is not None:
        kwargs["process_id"] = int(pid)
    jax.distributed.initialize(**kwargs)
    return True


def process_index() -> int:
    import jax
    return jax.process_index()


def process_count() -> int:
    import jax
    return jax.process_count()


def host_shard(items: Sequence, index: int | None = None,
               count: int | None = None) -> list:
    """Round-robin slice of `items` owned by this host.

    Replaces the reference's per-thread file dealing (seqlib.cpp:365-741)
    at the host level: every host calls this with the same full list and
    ingests only its share; no coordination needed because the assignment
    is a pure function of (index, count).
    """
    i = process_index() if index is None else index
    n = process_count() if count is None else count
    return list(items[i::n])


def host_read_plan(paths: Sequence[str], min_chunk: int = 64 << 20,
                   index: int | None = None,
                   count: int | None = None) -> list[tuple[str, int, int]]:
    """(path, byte_start, byte_end) ranges owned by this host.

    Files larger than `min_chunk` are split into `count` byte ranges so a
    single large FASTQ still ingests host-parallel; the reader must scan
    forward from byte_start to the next record boundary ('>' or '@' at
    line start) and read through the record straddling byte_end, which
    makes the ranges a partition of the records regardless of where the
    cuts land. Small files are assigned whole, round-robin.
    """
    i = process_index() if index is None else index
    n = process_count() if count is None else count
    plan: list[tuple[str, int, int]] = []
    small: list[str] = []
    for p in paths:
        try:
            size = os.path.getsize(p)
        except OSError:
            size = 0
        if n > 1 and size > min_chunk:
            per = -(-size // n)  # ceil
            start, end = i * per, min((i + 1) * per, size)
            if start < size:
                plan.append((p, start, end))
        else:
            small.append(p)
    plan.extend((p, 0, -1) for p in host_shard(small, i, n))
    return plan


def _ragged_allgather(x: np.ndarray) -> list[np.ndarray]:
    """process_allgather for arrays whose ROW COUNT differs per host:
    gather the row counts first (fixed shape), pad rows to the global max,
    gather, then trim each host's slice back. process_allgather itself
    requires identical shapes on every process."""
    from jax.experimental import multihost_utils
    x = np.asarray(x)
    lens = np.asarray(multihost_utils.process_allgather(
        np.asarray([x.shape[0]], np.int64))).reshape(-1)
    n_max = int(lens.max())
    pad_shape = (n_max - x.shape[0],) + x.shape[1:]
    padded = np.concatenate([x, np.zeros(pad_shape, x.dtype)], axis=0)
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    return [gathered[h, : int(lens[h])] for h in range(len(lens))]


def host0_gather(x: np.ndarray) -> np.ndarray | None:
    """Concatenate per-host arrays on host 0 (None elsewhere).

    DCN result gather (SURVEY §7.9): each host passes its local rows;
    host 0 receives the concatenation in process order.
    """
    if process_count() == 1:
        return np.asarray(x)
    out = np.concatenate(_ragged_allgather(x), axis=0)
    return out if process_index() == 0 else None


def all_hosts_concat(x: np.ndarray) -> np.ndarray:
    """Concatenation of every host's rows, replicated to all hosts."""
    if process_count() == 1:
        return np.asarray(x)
    return np.concatenate(_ragged_allgather(x), axis=0)


def broadcast_from_host0(x: np.ndarray) -> np.ndarray:
    """Ship a host-0 value (e.g. the chosen coverage cutoff) to all hosts."""
    if process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.broadcast_one_to_all(np.asarray(x)))


def global_count_merge(keys: np.ndarray, counts: np.ndarray,
                       max_occurrence: int = 0xFFFF - 1
                       ) -> tuple[np.ndarray, np.ndarray]:
    """Merge per-host sorted k-mer tables into the global table.

    Each host counted its own read slice; the same k-mer may appear on
    several hosts. Gather every host's (keys, counts) over DCN, then
    re-reduce by key locally (lexsort + reduceat) so all hosts hold the
    identical global table. Counts saturate at the reference's u16 cap
    (counter.h:459-476). Single-process: still canonicalizes (idempotent
    on an already-deduped table).
    """
    keys = np.asarray(keys)
    counts = np.asarray(counts, np.uint64)
    if process_count() > 1:
        keys = all_hosts_concat(keys)
        counts = all_hosts_concat(counts)
    if len(keys) == 0:
        return keys, counts.astype(np.uint32)
    order = np.lexsort(tuple(keys[:, w] for w in range(keys.shape[1] - 1, -1, -1)))
    keys, counts = keys[order], counts[order]
    new_run = np.empty(len(keys), dtype=bool)
    new_run[0] = True
    new_run[1:] = (keys[1:] != keys[:-1]).any(axis=1)
    starts = np.flatnonzero(new_run)
    summed = np.add.reduceat(counts, starts)
    return keys[starts], np.minimum(summed, max_occurrence).astype(np.uint32)


def shard_range_of(keys: np.ndarray, count: int | None = None,
                   k: int | None = None) -> np.ndarray:
    """Destination host of each (sorted-key) row: contiguous key ranges by
    the top key word, so every shard is a sorted slice of the global table
    and shards concatenate (in host order) into the full sorted table.
    `k` (the k-mer length) fixes the used bit width of word 0 — for
    k < 16 the value occupies fewer than 32 bits and must be left-aligned
    before range splitting."""
    n = process_count() if count is None else count
    top = np.asarray(keys)[:, 0].astype(np.uint64)
    used = 32 if k is None else min(2 * k, 32)
    top = top << np.uint64(32 - used)
    return (top * np.uint64(n) >> np.uint64(32)).astype(np.int64)


def global_count_merge_sharded(keys: np.ndarray, counts: np.ndarray,
                               max_occurrence: int = 0xFFFF - 1,
                               index: int | None = None,
                               count: int | None = None,
                               k: int | None = None
                               ) -> tuple[np.ndarray, np.ndarray]:
    """Key-range-sharded cross-host merge: this host ends up with ONLY its
    contiguous key-range shard of the global table (SURVEY §2.10 row 2 —
    the scalable form; `global_count_merge` replicates instead).

    The exchange runs as process_count() allgather rounds, one per
    destination range: each round moves only that range's rows (~1/n of
    the table), so per-host peak memory stays ~1/n of the global table
    plus one range's concat — no host ever materializes the whole table.
    Single-process: dedup-canonicalizes locally (identity key range).
    """
    keys = np.asarray(keys)
    counts = np.asarray(counts, np.uint64)
    i = process_index() if index is None else index
    n = process_count() if count is None else count

    def reduce_local(k, c):
        if len(k) == 0:
            return k, c.astype(np.uint32)
        order = np.lexsort(tuple(k[:, w]
                                 for w in range(k.shape[1] - 1, -1, -1)))
        k, c = k[order], c[order]
        new_run = np.empty(len(k), dtype=bool)
        new_run[0] = True
        new_run[1:] = (k[1:] != k[:-1]).any(axis=1)
        starts = np.flatnonzero(new_run)
        summed = np.add.reduceat(c, starts)
        return k[starts], np.minimum(summed,
                                     max_occurrence).astype(np.uint32)

    if n == 1:
        return reduce_local(keys, counts)
    dest = shard_range_of(keys, n, k)
    order = np.argsort(dest, kind="stable")
    dest_counts = np.bincount(dest, minlength=n).astype(np.int64)
    payload = np.concatenate(
        [keys[order].astype(np.uint32),
         np.minimum(counts[order], max_occurrence).astype(np.uint32)[:, None]],
        axis=1)
    try:
        mine = _all_to_all_exchange(payload, dest_counts, i, n)
    except Exception:
        # fallback: per-destination allgather rounds (n x the traffic of
        # the all_to_all path, but only multihost_utils primitives)
        my_keys = my_counts = None
        for d in range(n):
            sel = dest == d
            rows = np.concatenate([keys[sel].astype(np.uint64),
                                   counts[sel][:, None]], axis=1)
            parts = _ragged_allgather(rows)
            if d != i:
                continue
            allrows = np.concatenate(parts, axis=0)
            my_keys = allrows[:, :-1].astype(keys.dtype)
            my_counts = allrows[:, -1].astype(np.uint64)
        return reduce_local(my_keys, my_counts)
    return reduce_local(mine[:, :-1].astype(keys.dtype),
                        mine[:, -1].astype(np.uint64))


def _all_to_all_exchange(payload: np.ndarray, dest_counts: np.ndarray,
                         i: int, n: int) -> np.ndarray:
    """Route payload rows (grouped by destination, sizes in dest_counts)
    to their destination hosts with ONE device all_to_all over a
    process-spanning mesh. Each range crosses DCN exactly once — the
    per-destination allgather fallback ships every range to every host
    (n x the bytes). Returns this host's received rows (src order)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    C = np.asarray(multihost_utils.process_allgather(dest_counts))
    C = C.reshape(n, n)
    cap = max(int(C.max()), 1)
    Wp = payload.shape[1]
    send = np.zeros((1, n, cap, Wp), np.uint32)
    starts = np.zeros(n + 1, np.int64)
    starts[1:] = np.cumsum(dest_counts)
    for d in range(n):
        send[0, d, : dest_counts[d]] = payload[starts[d]: starts[d + 1]]

    devs = [next(d for d in jax.devices() if d.process_index == p)
            for p in range(n)]
    mesh = Mesh(np.array(devs), ("h",))
    sh = NamedSharding(mesh, PartitionSpec("h"))
    garr = jax.make_array_from_process_local_data(sh, send, (n, n, cap, Wp))
    shard_map = getattr(jax, "shard_map", None)
    if shard_map is None:  # older JAX spelling
        from jax.experimental.shard_map import shard_map

    def exchange(x):  # x: (1, n, cap, Wp) per device
        return jax.lax.all_to_all(x, "h", split_axis=1, concat_axis=0)

    out = jax.jit(shard_map(
        exchange, mesh=mesh, in_specs=PartitionSpec("h"),
        out_specs=PartitionSpec(None, "h")))(garr)
    local = np.asarray(list(out.addressable_shards)[0].data)  # (n,1,cap,Wp)
    recv = local.reshape(n, cap, Wp)
    return np.concatenate([recv[src, : C[src, i]] for src in range(n)],
                          axis=0)


def psum_histogram(local: np.ndarray) -> np.ndarray:
    """Global occurrence histogram = elementwise sum over hosts.

    The reference's histogram is built once on one host
    (counter.h:245-267); multi-host counting needs the SUM of per-host
    histograms before the left-local-minimum cutoff scan so every host
    derives the same cutoff.
    """
    if process_count() == 1:
        return np.asarray(local)
    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(np.asarray(local))
    return np.asarray(gathered).sum(axis=0)
