"""Find where count_reads spends its 17s wall."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from bench import BATCH_READS, K, READ_LEN, make_reads
    from platanus_b_tpu.io.reads import ReadBatch
    from platanus_b_tpu.models.assemble_core import (_pad_codes,
                                                     count_reads_device)
    from platanus_b_tpu.ops import count as cnt

    reads = make_reads()
    n_reads = reads.shape[0]
    batches = [ReadBatch(reads[i: i + BATCH_READS],
                         np.full(min(BATCH_READS, n_reads - i), READ_LEN,
                                 np.int32))
               for i in range(0, n_reads, BATCH_READS)]

    # warm
    k0, c0, n0, h0 = count_reads_device(batches, K)
    del k0, c0

    # timed with phase breakdown
    from platanus_b_tpu.ops.multiword import num_words
    from platanus_b_tpu.ops.padding import next_pow2
    W = num_words(K)

    t_extract = t_chunk = t_fold = t_hist = 0.0
    acc = cnt.TableAccumulator(W)
    CHUNK_ROWS = 32 << 20
    parts, part_rows = [], 0
    t_all0 = time.perf_counter()

    def flush_chunk():
        nonlocal parts, part_rows, t_chunk, t_fold
        if not parts:
            return
        t0 = time.perf_counter()
        cap = next_pow2(part_rows)
        if cap > part_rows:
            parts.append(jnp.full((cap - part_rows, W),
                                  np.uint32(0xFFFFFFFF), dtype=jnp.uint32))
        flat = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
        keys, counts, n = cnt.count_sorted_chunk(flat)
        n = int(n)
        t_chunk += time.perf_counter() - t0
        parts, part_rows = [], 0
        t0 = time.perf_counter()
        acc.add(keys, counts, n)
        t_fold += time.perf_counter() - t0

    for b in batches:
        t0 = time.perf_counter()
        flat = cnt.extract_flat(_pad_codes(b.codes), K)
        t_extract += time.perf_counter() - t0
        parts.append(flat)
        part_rows += flat.shape[0]
        if part_rows >= CHUNK_ROWS:
            flush_chunk()
    flush_chunk()

    t0 = time.perf_counter()
    acc_keys, acc_counts, acc_n = acc.result()
    t_fold += time.perf_counter() - t0

    t0 = time.perf_counter()
    hist = np.asarray(cnt.occurrence_histogram(acc_counts))
    t_hist = time.perf_counter() - t0
    t_total = time.perf_counter() - t_all0

    print(f"extract+transfer: {t_extract*1e3:9.1f} ms")
    print(f"chunk sorts:      {t_chunk*1e3:9.1f} ms")
    print(f"folds:            {t_fold*1e3:9.1f} ms")
    print(f"histogram:        {t_hist*1e3:9.1f} ms")
    print(f"TOTAL device:     {t_total*1e3:9.1f} ms   n={acc_n/1e6:.1f}M")

    # host materialization cost (what count_reads adds)
    t0 = time.perf_counter()
    kh = np.asarray(acc_keys[:acc_n])
    ch = np.asarray(acc_counts[:acc_n])
    print(f"device->host:     {(time.perf_counter()-t0)*1e3:9.1f} ms "
          f"({(kh.nbytes+ch.nbytes)/1e6:.0f} MB)")


if __name__ == "__main__":
    main()
