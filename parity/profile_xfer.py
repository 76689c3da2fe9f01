"""Measure device->host transfer bandwidth and concat-inside-jit cost."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    # d2h bandwidth: contiguous fresh array
    for mb in (8, 64):
        n = mb << 18  # 4-byte elems
        x = jax.block_until_ready(jnp.arange(n, dtype=jnp.uint32))
        t0 = time.perf_counter()
        h = np.asarray(x)
        dt = time.perf_counter() - t0
        print(f"d2h {mb:4d} MB contiguous: {dt*1e3:8.1f} ms "
              f"({mb/dt:.0f} MB/s)", flush=True)

    # d2h via jax.device_get
    x = jax.block_until_ready(jnp.arange(64 << 18, dtype=jnp.uint32))
    t0 = time.perf_counter()
    h = jax.device_get(x)
    dt = time.perf_counter() - t0
    print(f"d2h 64 MB device_get:  {dt*1e3:8.1f} ms ({64/dt:.0f} MB/s)",
          flush=True)

    # chunk sort: concat outside jit vs inside jit
    from platanus_b_tpu.ops import count as cnt
    rng = np.random.default_rng(0)
    parts_h = [rng.integers(0, 2**32, size=(12 << 20, 2), dtype=np.uint32)
               for _ in range(2)]
    parts = [jax.block_until_ready(jnp.asarray(p)) for p in parts_h]

    def outside():
        pad = jnp.full(((32 << 20) - 2 * (12 << 20), 2),
                       np.uint32(0xFFFFFFFF), dtype=jnp.uint32)
        flat = jnp.concatenate(parts + [pad], axis=0)
        uk, uc, un = cnt.count_sorted_chunk(flat)
        return int(un)

    @functools.partial(jax.jit, static_argnames=("cap",))
    def _inside(parts, cap):
        W = parts[0].shape[-1]
        total = sum(p.shape[0] for p in parts)
        ps = list(parts)
        if cap > total:
            ps.append(jnp.full((cap - total, W), np.uint32(0xFFFFFFFF),
                               dtype=jnp.uint32))
        return cnt.count_sorted_chunk(jnp.concatenate(ps, axis=0))

    def inside():
        uk, uc, un = _inside(tuple(parts), 32 << 20)
        return int(un)

    for label, fn in (("concat outside jit", outside),
                      ("concat inside jit", inside)):
        fn()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        print(f"chunk 32M {label}: {min(ts)*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
