import time, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
rng = np.random.default_rng(0)
bf = jnp.bfloat16
B, L, M, H, D = 400, 40, 577, 12, 64

@jax.jit
def trivial(x): return x + 1.0
float(trivial(jnp.zeros(())))
t0=time.perf_counter()
for _ in range(5): float(trivial(jnp.zeros(())))
RTT=(time.perf_counter()-t0)/5

def bench(name, fn, args, iters=20):
    @jax.jit
    def chain(*a):
        def body(c, _):
            out = fn(c.astype(bf), *a)
            return jnp.sum(out.astype(jnp.float32)) * 1e-12, None
        c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=iters)
        return c
    float(chain(*args))
    t0=time.perf_counter(); float(chain(*args)); t=(time.perf_counter()-t0-RTT)/iters
    fl = 2*B*H*L*M*D*2
    print(f"{name:26s} {t*1e3:7.3f} ms  {fl/t/1e12:6.1f} TF/s", flush=True)

q1 = jnp.asarray(rng.normal(size=(B, L, H, D))*0.1, bf)
k1 = jnp.asarray(rng.normal(size=(B, M, H, D))*0.1, bf)
v1 = jnp.asarray(rng.normal(size=(B, M, H, D))*0.1, bf)
def attn_lhd(c, q, k, v):
    s = jnp.einsum("blhd,bmhd->bhlm", q + c, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * 0.125, axis=-1).astype(bf)
    return jnp.einsum("bhlm,bmhd->blhd", p, v, preferred_element_type=jnp.float32).astype(bf)
bench("layout [B,L,H,D] (now)", attn_lhd, (q1, k1, v1))

q2 = jnp.asarray(q1.transpose(0, 2, 1, 3))
k2 = jnp.asarray(k1.transpose(0, 2, 1, 3))
v2 = jnp.asarray(v1.transpose(0, 2, 1, 3))
def attn_hld(c, q, k, v):
    s = jnp.einsum("bhld,bhmd->bhlm", q + c, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * 0.125, axis=-1).astype(bf)
    return jnp.einsum("bhlm,bhmd->bhld", p, v, preferred_element_type=jnp.float32).astype(bf)
bench("layout [B,H,L,D]", attn_hld, (q2, k2, v2))

# bf16 probs already; what if scores stay fp32 but flattened batch*heads?
q3 = q2.reshape(B*H, L, D); k3 = k2.reshape(B*H, M, D); v3 = v2.reshape(B*H, M, D)
def attn_flat(c, q, k, v):
    s = jnp.einsum("gld,gmd->glm", q + c, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * 0.125, axis=-1).astype(bf)
    return jnp.einsum("glm,gmd->gld", p, v, preferred_element_type=jnp.float32).astype(bf)
bench("flattened [B*H,L,D]", attn_flat, (q3, k3, v3))
