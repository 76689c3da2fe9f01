"""Isolate XLA TPU sort cost at various sizes (jitted, verified)."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("nk",))
def sort2(a, b, nk=2):
    return jax.lax.sort((a, b), num_keys=nk)


@jax.jit
def sort1(a):
    return jax.lax.sort((a,), num_keys=1)


def t(label, fn, reps=3):
    jax.block_until_ready(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    print(f"{label:40s} {min(ts)*1e3:10.1f} ms")
    return min(ts)


def main():
    rng = np.random.default_rng(0)
    for n in (1 << 20, 1 << 23, 1 << 24, 1 << 25):
        a = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))
        t(f"sort1 n={n>>20}M", lambda a=a: sort1(a))
        t(f"sort2 n={n>>20}M (2 keys)", lambda a=a, b=b: sort2(a, b))
        # verify
        out = sort1(a)[0]
        d = np.asarray(out)
        assert np.all(d[:-1] <= d[1:]), "NOT SORTED"
    print("verified sorted")


if __name__ == "__main__":
    main()
