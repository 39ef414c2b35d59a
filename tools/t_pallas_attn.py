import time, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from candidate_reranking_cir_tpu.ops.pallas_attention import (
    _fused_attention_fwd_impl, _xla_attention)

rng = np.random.default_rng(0)
bf = jnp.bfloat16
B, L, M, H, D = 400, 40, 577, 12, 64
q = jnp.asarray(rng.normal(size=(B, L, H, D))*0.1, bf)
k = jnp.asarray(rng.normal(size=(B, M, H, D))*0.1, bf)
v = jnp.asarray(rng.normal(size=(B, M, H, D))*0.1, bf)

@jax.jit
def trivial(x): return x + 1.0
float(trivial(jnp.zeros(())))
t0=time.perf_counter()
for _ in range(5): float(trivial(jnp.zeros(())))
RTT=(time.perf_counter()-t0)/5
print(f"rtt {RTT*1e3:.0f} ms", flush=True)

err = float(jnp.max(jnp.abs(
    _fused_attention_fwd_impl(q, k, v, None).astype(jnp.float32)
    - _xla_attention(q, k, v, None).astype(jnp.float32))))
print(f"max abs err pallas vs xla on TPU: {err:.5f}", flush=True)

ITERS = 20
def bench(name, fn):
    @jax.jit
    def chain(q, k, v):
        def body(c, _):
            out = fn(q + c.astype(bf), k, v)
            return jnp.sum(out.astype(jnp.float32)) * 1e-12, None
        c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=ITERS)
        return c
    float(chain(q, k, v))
    t0=time.perf_counter(); float(chain(q, k, v)); t=(time.perf_counter()-t0-RTT)/ITERS
    fl = 2*B*H*L*M*D*2
    print(f"{name:10s} {t*1e3:7.3f} ms  {fl/t/1e12:6.1f} TF/s", flush=True)

bench("xla", lambda q,k,v: _xla_attention(q,k,v,None))
bench("pallas", lambda q,k,v: _fused_attention_fwd_impl(q,k,v,None))
