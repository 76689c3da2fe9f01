import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def k_dyn_unaligned(x_ref, s_ref, o_ref):
    s = s_ref[0, 0]
    o_ref[:] = x_ref[:, pl.ds(s, 128)]

def k_dyn_unaligned_u8(x_ref, s_ref, o_ref):
    s = s_ref[0, 0]
    o_ref[:] = x_ref[:, pl.ds(s, 128)]

x = jnp.arange(8*512, dtype=jnp.int32).reshape(8, 512)
xu = (jnp.arange(8*512) % 251).astype(jnp.uint8).reshape(8, 512)
s = jnp.array([[5]], dtype=jnp.int32)
for name, kern, xx, od in [("dyn_unaligned_i32", k_dyn_unaligned, x, jnp.int32),
                           ("dyn_unaligned_u8", k_dyn_unaligned_u8, xu, jnp.uint8)]:
    try:
        out = pl.pallas_call(kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec((1,1), memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8,128), od))(xx, s)
        print(name, "OK", np.asarray(out)[0, :3])
    except Exception as e:
        print(name, "FAIL:", str(e).split("\n")[0][:120])
