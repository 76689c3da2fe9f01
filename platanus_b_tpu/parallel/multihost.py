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


def host0_gather(x: np.ndarray) -> np.ndarray | None:
    """Concatenate per-host arrays on host 0 (None elsewhere).

    DCN result gather (SURVEY §7.9): each host passes its local rows;
    host 0 receives the concatenation in process order.
    """
    if process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(np.asarray(x))
    out = np.concatenate(list(gathered), axis=0)
    return out if process_index() == 0 else None


def all_hosts_concat(x: np.ndarray) -> np.ndarray:
    """Concatenation of every host's rows, replicated to all hosts."""
    if process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(np.asarray(x))
    return np.concatenate(list(gathered), axis=0)


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
