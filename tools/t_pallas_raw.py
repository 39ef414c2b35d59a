import time, sys, functools
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from candidate_reranking_cir_tpu.ops.pallas_attention import _attn_kernel

rng = np.random.default_rng(0)
bf = jnp.bfloat16
B, Lp, Mp, H, D, M = 400, 48, 640, 12, 64, 577

@jax.jit
def trivial(x): return x + 1.0
float(trivial(jnp.zeros(())))
t0=time.perf_counter()
for _ in range(5): float(trivial(jnp.zeros(())))
RTT=(time.perf_counter()-t0)/5

q = jnp.asarray(rng.normal(size=(B, H, Lp, D))*0.1, bf)
k = jnp.asarray(rng.normal(size=(B, H, Mp, D))*0.1, bf)
v = jnp.asarray(rng.normal(size=(B, H, Mp, D))*0.1, bf)

def raw(q, k, v):
    grid = (B,)
    q_spec = pl.BlockSpec((1, H, Lp, D), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, H, Mp, D), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_kernel, kv_len=M, scale=0.125, num_heads=H),
        grid=grid, in_specs=[q_spec, kv_spec, kv_spec], out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, Lp, D), bf),
    )(q, k, v)

ITERS=20
@jax.jit
def chain(q, k, v):
    def body(c, _):
        out = raw(q + c.astype(bf), k, v)
        return jnp.sum(out.astype(jnp.float32)) * 1e-12, None
    c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=ITERS)
    return c
float(chain(q, k, v))
t0=time.perf_counter(); float(chain(q, k, v)); t=(time.perf_counter()-t0-RTT)/ITERS
fl = 2*B*H*40*M*D*2
print(f"raw pallas [B,H,L,D]: {t*1e3:7.3f} ms  {fl/t/1e12:6.1f} TF/s")
