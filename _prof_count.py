import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/platanus_b_tpu_jax_cache")
from platanus_b_tpu.ops import count as cnt
from platanus_b_tpu.ops.kmer import extract_canonical_kmers

K=32; R=1<<17; L=125
rng = np.random.default_rng(0)
codes = jnp.asarray(rng.integers(0,4,size=(R,L),dtype=np.uint8))

def timeit(f, n=3):
    f()  # warm
    t0=time.perf_counter()
    for _ in range(n):
        f()
    return (time.perf_counter()-t0)/n

ext = jax.jit(lambda c: extract_canonical_kmers(c, K))
print("extract:", timeit(lambda: np.asarray(ext(codes)[1]).sum()))

print("count_batch:", timeit(lambda: int(cnt.count_batch(codes, K)[2])))

ukeys, ucounts, n = cnt.count_batch(codes, K)
capA = 1<<25; capB = 1<<23
kA = jnp.asarray(rng.integers(0,2**32,size=(capA,2),dtype=np.uint32)); cA=jnp.ones((capA,),jnp.uint32)
kB = ukeys[:capB]; cB = ucounts[:capB]
print("merge(2^25+2^23):", timeit(lambda: int(cnt.merge_counts(kA,cA,kB,cB)[2])))

# sort-only cost at 12M rows
flat = jnp.asarray(rng.integers(0,2**32,size=(12320768,2),dtype=np.uint32))
ones = jnp.ones((12320768,),jnp.uint32)
srt = jax.jit(lambda a,b: cnt.sort_by_key(a,b))
print("sort12M:", timeit(lambda: np.asarray(srt(flat,ones)[1][:1]).sum()))
