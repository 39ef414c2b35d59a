"""Head-folded Pallas attention prototype: q/k/v in matmul-native
[B, L, H*D] layout, heads sliced on the lane dim inside the kernel.
Compare against the current [B, L, H, D] kernel + the relayout cost it
forces on the q/k/v projections (conv-form einsum)."""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from candidate_reranking_cir_tpu.ops.pallas_attention import (
    _head_attention, fused_attention)
from bench import measure_rtt


def _folded_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, num_heads, head_dim):
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        o_ref[0, :, sl] = _head_attention(
            q_ref[0, :, sl], k_ref[0, :, sl], None if v_ref is None else v_ref[0, :, sl],
            None, scale, o_ref.dtype) if False else _head_attention(
            q_ref[0, :, sl], k_ref[0, :, sl], v_ref[0, :, sl], None, scale,
            o_ref.dtype)


def folded_attention(q, k, v, num_heads):
    b, lq, hd = q.shape
    m = k.shape[1]
    d = hd // num_heads
    scale = d ** -0.5
    spec_q = pl.BlockSpec((1, lq, hd), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_kv = pl.BlockSpec((1, m, hd), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=2 * b * num_heads * lq * m * d * 2,
        bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
        transcendentals=b * num_heads * lq * m)
    return pl.pallas_call(
        functools.partial(_folded_kernel, scale=scale, num_heads=num_heads,
                          head_dim=d),
        grid=(b,),
        in_specs=[spec_q, spec_kv, spec_kv],
        out_specs=spec_q,
        out_shape=jax.ShapeDtypeStruct((b, lq, hd), q.dtype),
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(q, k, v)


def chain_time(fn, args, rtt, iters=20, warmup=2):
    @jax.jit
    def chain(*a):
        def body(c, _):
            out = fn(a[0] + c.astype(a[0].dtype), *a[1:])
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
    B, L, H, D = 32, 577, 12, 64
    qf = jnp.asarray(rng.normal(size=(B, L, H * D)), jnp.bfloat16)
    kf = jnp.asarray(rng.normal(size=(B, L, H * D)), jnp.bfloat16)
    vf = jnp.asarray(rng.normal(size=(B, L, H * D)), jnp.bfloat16)

    t = chain_time(lambda q, k, v: folded_attention(q, k, v, H),
                   (qf, kf, vf), rtt)
    print(f"folded [B,L,H*D] kernel: {t*1e3:.3f} ms", flush=True)

    q4 = qf.reshape(B, L, H, D)
    k4 = kf.reshape(B, L, H, D)
    v4 = vf.reshape(B, L, H, D)
    t = chain_time(lambda q, k, v: fused_attention(q, k, v),
                   (q4, k4, v4), rtt)
    print(f"current [B,L,H,D] kernel (incl relayout): {t*1e3:.3f} ms",
          flush=True)

    # numerics check vs XLA reference
    out_f = folded_attention(qf, kf, vf, H)
    out_c = fused_attention(q4, k4, v4).reshape(B, L, H * D)
    diff = float(jnp.max(jnp.abs(out_f.astype(jnp.float32)
                                 - out_c.astype(jnp.float32))))
    print(f"max |folded - current| = {diff:.3e}", flush=True)


if __name__ == "__main__":
    main()
