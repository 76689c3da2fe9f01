"""Bulk exact lookup in a sorted multi-word key table.

Replaces every DoubleHash probe in the reference (doubleHash.h:170-218
find_any / find_times_any) with a vectorized binary search over the sorted
unique-key table produced by ops.count. Each query runs ceil(log2(cap))
rounds of gather + lexicographic compare — fully parallel across queries,
deterministic, and HBM-friendly.

Shape discipline: the number of search steps derives from the PADDED table
capacity (static), while the true table length is a traced scalar — so one
compiled kernel serves every table of the same capacity bucket.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .multiword import mw_eq, mw_le, mw_lt


@jax.jit
def _lower_bound(table: jnp.ndarray, queries: jnp.ndarray,
                 table_len: jnp.ndarray):
    n = table.shape[0]
    m = queries.shape[0]
    steps = max(1, math.ceil(math.log2(n + 1)))
    lo = jnp.zeros((m,), jnp.int32)
    hi = jnp.broadcast_to(table_len.astype(jnp.int32), (m,))

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) >> 1
        rows = table[jnp.clip(mid, 0, n - 1)]
        q_le = mw_le(queries, rows)  # query <= table[mid]
        hi = jnp.where(q_le, mid, hi)
        lo = jnp.where(q_le, lo, mid + 1)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    return lo


@jax.jit
def _lookup_jit(table: jnp.ndarray, queries: jnp.ndarray,
                table_len: jnp.ndarray) -> jnp.ndarray:
    n = table.shape[0]
    pos = _lower_bound(table, queries, table_len)
    hit_rows = table[jnp.clip(pos, 0, n - 1)]
    found = (pos < table_len) & mw_eq(hit_rows, queries)
    return jnp.where(found, pos, -1)


def lookup(table: jnp.ndarray, queries: jnp.ndarray,
           table_len=None) -> jnp.ndarray:
    """Index of each query row in the sorted table, or -1 if absent.

    table:   (N, W) uint32, sorted ascending; rows at index >= table_len are
             ignored (SENTINEL padding).
    queries: (M, W) uint32.
    table_len: true number of valid rows (host int or traced scalar);
             defaults to the full array.
    """
    if table.shape[0] == 0:
        return jnp.full((queries.shape[0],), -1, jnp.int32)
    if table_len is None:
        table_len = table.shape[0]
    return _lookup_jit(jnp.asarray(table), jnp.asarray(queries),
                       jnp.asarray(table_len, dtype=jnp.int32))


def contains(table: jnp.ndarray, queries: jnp.ndarray,
             table_len=None) -> jnp.ndarray:
    return lookup(table, queries, table_len) >= 0


@jax.jit
def _upper_bound(table: jnp.ndarray, queries: jnp.ndarray,
                 table_len: jnp.ndarray):
    n = table.shape[0]
    m = queries.shape[0]
    steps = max(1, math.ceil(math.log2(n + 1)))
    lo = jnp.zeros((m,), jnp.int32)
    hi = jnp.broadcast_to(table_len.astype(jnp.int32), (m,))

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) >> 1
        rows = table[jnp.clip(mid, 0, n - 1)]
        q_lt = mw_lt(queries, rows)  # query < table[mid]
        hi = jnp.where(q_lt, mid, hi)
        lo = jnp.where(q_lt, lo, mid + 1)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    return lo


@jax.jit
def lookup_range_jit(table: jnp.ndarray, queries: jnp.ndarray,
                     table_len: jnp.ndarray):
    """[lo, hi) slice of a sorted-with-duplicates table equal to each query.

    The CSR-range analog of the reference's MapPointer{num, position*}
    buckets (mapper.cpp:56-148): the index IS the sorted key list; a key's
    postings are the contiguous run between its lower and upper bound.
    """
    lo = _lower_bound(table, queries, table_len)
    hi = _upper_bound(table, queries, table_len)
    return lo, hi
