import time, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental.pallas.ops.tpu import flash_attention as fa
from candidate_reranking_cir_tpu.ops.pallas_attention import _xla_attention

rng = np.random.default_rng(0)
bf = jnp.bfloat16
B, L, M, H, D = 400, 40, 577, 12, 64
Lp, Mp = 128, 640  # flash kernel min block sizes

@jax.jit
def trivial(x): return x + 1.0
float(trivial(jnp.zeros(())))
t0=time.perf_counter()
for _ in range(5): float(trivial(jnp.zeros(())))
RTT=(time.perf_counter()-t0)/5

q = jnp.asarray(rng.normal(size=(B, H, L, D))*0.1, bf)
k = jnp.asarray(rng.normal(size=(B, H, M, D))*0.1, bf)
v = jnp.asarray(rng.normal(size=(B, H, M, D))*0.1, bf)

qp = jnp.pad(q, ((0,0),(0,0),(0,Lp-L),(0,0)))
kp = jnp.pad(k, ((0,0),(0,0),(0,Mp-M),(0,0)))
vp = jnp.pad(v, ((0,0),(0,0),(0,Mp-M),(0,0)))
# mask padded keys via segment ids: q all segment 0; padded keys segment 1
seg_q = jnp.zeros((B, Lp), jnp.int32)
seg_kv = jnp.concatenate([jnp.zeros((B, M), jnp.int32),
                          jnp.ones((B, Mp-M), jnp.int32)], axis=1)
seg = fa.SegmentIds(q=seg_q, kv=seg_kv)

def flash(q, k, v):
    return fa.flash_attention(q, k, v, segment_ids=seg, sm_scale=D**-0.5)

# correctness
out = flash(qp, kp, vp)[:, :, :L]
ref = _xla_attention(q.transpose(0,2,1,3), k.transpose(0,2,1,3),
                     v.transpose(0,2,1,3), None).transpose(0,2,1,3)
err = float(jnp.max(jnp.abs(out.astype(jnp.float32)-ref.astype(jnp.float32))))
print(f"flash vs xla max err: {err:.5f}", flush=True)

ITERS=20
@jax.jit
def chain(q, k, v):
    def body(c, _):
        o = flash(q + c.astype(bf), k, v)
        return jnp.sum(o.astype(jnp.float32)) * 1e-12, None
    c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=ITERS)
    return c
float(chain(qp, kp, vp))
t0=time.perf_counter(); float(chain(qp, kp, vp)); t=(time.perf_counter()-t0-RTT)/ITERS
fl = 2*B*H*L*M*D*2
print(f"jax flash_attention: {t*1e3:7.3f} ms  {fl/t/1e12:6.1f} TF/s (useful flops)")
