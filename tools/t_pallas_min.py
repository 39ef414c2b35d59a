import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np

def k(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2.0

@jax.jit
def double(x):
    return pl.pallas_call(k,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)

x = jnp.ones((128, 128), jnp.float32)
t0=time.perf_counter()
out = np.asarray(double(x))
print("minimal pallas ok", out[0,0], f"{time.perf_counter()-t0:.1f}s")
