import jax, jax.numpy as jnp, numpy as np, functools
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def k_dynroll(x_ref, s_ref, o_ref):
    s = s_ref[0, 0]
    o_ref[:] = pltpu.roll(x_ref[:], s, axis=1)

def k_statslice(x_ref, s_ref, o_ref):
    o_ref[:] = x_ref[:, 1:129]

def k_dynslice_aligned(x_ref, s_ref, o_ref):
    s = s_ref[0, 0]
    sa = (s // 128) * 128
    o_ref[:] = x_ref[:, pl.ds(pl.multiple_of(sa, 128), 128)]

x = jnp.arange(8*512, dtype=jnp.int32).reshape(8, 512)
s = jnp.array([[5]], dtype=jnp.int32)
for name, kern, oshape in [("dynroll", k_dynroll, (8,512)),
                           ("statslice", k_statslice, (8,128)),
                           ("dynslice_aligned", k_dynslice_aligned, (8,128))]:
    try:
        out = pl.pallas_call(kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec((1,1), memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(oshape, jnp.int32))(x, s)
        print(name, "OK", np.asarray(out)[0, :3])
    except Exception as e:
        print(name, "FAIL:", str(e).split("\n")[0][:150])
