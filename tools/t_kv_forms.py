import time, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
rng = np.random.default_rng(0)
bf = jnp.bfloat16
P, M, D, H, X = 400, 577, 768, 12, 64

@jax.jit
def trivial(x): return x + 1.0
float(trivial(jnp.zeros(())))
t0=time.perf_counter()
for _ in range(5): float(trivial(jnp.zeros(())))
RTT=(time.perf_counter()-t0)/5

cand = jnp.asarray(rng.normal(size=(P, M, D))*0.02, bf)
w3 = jnp.asarray(rng.normal(size=(D, H, X))*0.02, bf)
w2 = w3.reshape(D, H*X)

def bench(name, fn, args, flops, iters=10):
    @jax.jit
    def chain(*a):
        def body(c, _):
            out = fn(c.astype(bf), *a)
            return jnp.sum(out.astype(jnp.float32)).astype(jnp.float32) * 1e-15, None
        c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=iters)
        return c
    float(chain(*args))
    t0=time.perf_counter(); float(chain(*args)); t=(time.perf_counter()-t0-RTT)/iters
    print(f"{name:28s} {t*1e3:8.2f} ms  {flops/t/1e12:6.1f} TF/s", flush=True)

fl = 2*P*M*D*H*X
bench("einsum pmd,dhx->pmhx", lambda c, cand, w: jnp.einsum(
    "pmd,dhx->pmhx", cand + c, w, preferred_element_type=jnp.float32).astype(bf),
    (cand, w3), fl)
bench("2d reshape matmul", lambda c, cand, w: (
    jnp.dot((cand + c).reshape(P*M, D), w, preferred_element_type=jnp.float32)
    .astype(bf).reshape(P, M, H, X)), (cand, w2), fl)
bench("2d kv both", lambda c, cand, w: (
    jnp.dot((cand + c).reshape(P*M, D),
            jnp.concatenate([w, w], 1), preferred_element_type=jnp.float32)
    .astype(bf)), (cand, w2), 2*fl)
