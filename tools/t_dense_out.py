"""Does forcing preferred_element_type=f32 (+ cast to bf16) on the big
dense matmuls cost HBM traffic vs native-bf16 dot output? The MXU
accumulates fp32 internally either way; the only question is whether XLA
materializes the fp32 result before the cast. Measured on a ViT-layer-like
FFN chain at B=32 (rows = 32*577)."""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from bench import measure_rtt

ROWS, D, I = 32 * 577, 768, 3072
ITERS = 20


def chain_time(fn, args, rtt, iters=ITERS, warmup=2):
    @jax.jit
    def chain(*a):
        def body(c, _):
            out = fn(*a, c)
            return jnp.mean(out.astype(jnp.float32)) * 1e-9, None
        c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=iters)
        return c

    for _ in range(warmup):
        float(chain(*args))
    t0 = time.perf_counter()
    float(chain(*args))
    return max(time.perf_counter() - t0 - rtt, 1e-9) / iters


def main():
    rtt = measure_rtt()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(ROWS, D)) * 0.1, jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(D, I)) * 0.02, jnp.bfloat16)
    b1 = jnp.zeros((I,), jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(I, D)) * 0.02, jnp.bfloat16)
    b2 = jnp.zeros((D,), jnp.bfloat16)

    def ffn_pref_f32(x, w1, b1, w2, b2, c):
        h = jnp.dot(x + c.astype(x.dtype), w1,
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        h = jax.nn.gelu(h + b1, approximate=False)
        y = jnp.dot(h, w2,
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return y + b2

    def ffn_native(x, w1, b1, w2, b2, c):
        h = jnp.dot(x + c.astype(x.dtype), w1)
        h = jax.nn.gelu(h + b1, approximate=False)
        y = jnp.dot(h, w2)
        return y + b2

    flops = 2 * ROWS * D * I * 2
    for name, fn in (("pref_f32", ffn_pref_f32), ("native_bf16", ffn_native)):
        dt = chain_time(fn, (x, w1, b1, w2, b2), rtt)
        print(f"FFN {name}: {dt*1e3:.3f} ms  {flops/dt/1e12:.1f} TF/s "
              f"mfu={flops/dt/197e12:.3f}", flush=True)

    # numerics: identical? (accumulate-f32-then-round vs epilogue-round)
    a = ffn_pref_f32(x, w1, b1, w2, b2, jnp.zeros(()))
    b = ffn_native(x, w1, b1, w2, b2, jnp.zeros(()))
    diff = jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
    print("max abs diff:", float(diff), flush=True)


if __name__ == "__main__":
    main()
