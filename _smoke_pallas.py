import numpy as np, time
from platanus_b_tpu.ops.pallas_align import banded_edit_distance
from platanus_b_tpu.ops.align import edit_distance_np
rng = np.random.default_rng(5)
qs, ts, want = [], [], []
for _ in range(16):
    n = int(rng.integers(500, 2000))
    a = rng.integers(0, 4, size=n, dtype=np.uint8)
    b = a.copy()
    for _ in range(20):
        i = rng.integers(0, len(b)); b[i] = (b[i]+1+rng.integers(0,3))%4
    qs.append(a); ts.append(b)
    want.append(edit_distance_np(a, b))
t0=time.perf_counter()
got = banded_edit_distance(qs, ts, band=128)
print("compile+run:", time.perf_counter()-t0)
t0=time.perf_counter()
got = banded_edit_distance(qs, ts, band=128)
print("warm run:", time.perf_counter()-t0)
print("match:", list(got) == want, list(got)[:4], want[:4])
