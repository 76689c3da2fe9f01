"""Steady-state assemble profile: run the pipeline twice in one process
(first pass pays compile/executable-load; second is honest compute) and
print per-stage wall breakdown from LOG.timings."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/platanus_b_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from platanus_b_tpu.io.reads import load_read_batches
from platanus_b_tpu.models.assemble_core import AssembleOptions, assemble
from platanus_b_tpu.utils.log import LOG


def main():
    reads_fa = sys.argv[1] if len(sys.argv) > 1 else "/tmp/parity/reads.fa"
    batches = list(load_read_batches([reads_fa]))
    opts = AssembleOptions(k=32)

    t0 = time.perf_counter()
    assemble(batches, opts)
    t_cold = time.perf_counter() - t0
    print(f"PASS1 (load/compile included): {t_cold:.1f} s", flush=True)

    LOG.timings.clear()
    t0 = time.perf_counter()
    assemble(batches, opts)
    t_warm = time.perf_counter() - t0
    print(f"PASS2 (steady state): {t_warm:.1f} s")
    for name, dt in sorted(LOG.timings.items(), key=lambda kv: -kv[1]):
        print(f"  {dt:8.1f} s  {name}")


if __name__ == "__main__":
    main()
