"""Headline benchmark: canonical k-mer counting throughput (k=32).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (SURVEY.md §6); the baseline is the
reference binary's k-mer counting stage measured on this machine's CPU —
see BASELINE.md "measured" section. BASELINE_KMERS_PER_S below is that
measurement (reference `assemble -t 16` counting stage on the same
synthetic read set; re-measured whenever the dataset changes).
"""

import json
import time

import numpy as np

# reference platanus_b v1.3.2 `assemble` k-mer counting stage, 16 threads,
# same synthetic read volume (see BASELINE.md) — k-mers/s
BASELINE_KMERS_PER_S = 11.0e6

K = 32
READ_LEN = 128
NUM_READS = 1 << 17  # 128Ki reads x 128bp = 16.8 Mbp, ~12.7M windows/batch
REPEATS = 5


def main():
    import jax
    import jax.numpy as jnp

    from platanus_b_tpu.ops.count import count_batch

    rng = np.random.default_rng(7)
    codes = rng.integers(0, 4, size=(NUM_READS, READ_LEN), dtype=np.uint8)
    x = jnp.asarray(codes)

    n_windows = NUM_READS * (READ_LEN - K + 1)

    # warmup/compile
    out = count_batch(x, K)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(REPEATS):
        out = count_batch(x, K)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPEATS

    kmers_per_s = n_windows / dt
    print(json.dumps({
        "metric": "kmer_count_throughput_k32",
        "value": round(kmers_per_s, 1),
        "unit": "kmers/s",
        "vs_baseline": round(kmers_per_s / BASELINE_KMERS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
