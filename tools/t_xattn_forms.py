"""Cross-attention composition forms at image-major fusion shapes.

The stage-I eval fusion phase runs at ~32% MFU (BASELINE.md r3 eval
decomposition) and its dominant FLOP term is the per-image cross-attention
K/V projections. This tool measures, at the exact (G, Q*L, M) shapes the
image-major scheduler dispatches, four compositions of one cross-attention
block (q/k/v projections + attention + out projection):

  A einsum-proj + unfolded Pallas kernel (today's routing at rows < 128)
  B flat-proj + folded Pallas kernel     (today's routing at rows >= 128)
  C einsum q + FLAT k/v reshaped to 4D + unfolded kernel
  D XLA attention (no Pallas) with einsum projections

and the self-attention twin at [G*Q, L]. Findings feed the routing policy in
models/layers.py (MultiHeadAttention).
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from candidate_reranking_cir_tpu.ops.pallas_attention import (
    fused_attention, fused_attention_folded)
from candidate_reranking_cir_tpu.ops.attention import dot_product_attention

H, D = 12, 64
W = H * D  # 768


def make_weights(key):
    ks = jax.random.split(key, 8)
    s = 0.02
    wq, wk, wv, wo = (jax.random.normal(k, (W, W), jnp.float32) * s
                      for k in ks[:4])
    return tuple(w.astype(jnp.bfloat16) for w in (wq, wk, wv, wo))


def proj_einsum(x, w):
    # the '...d,dhk->...hk' head projection (lowers to an N=64 conv)
    return jnp.einsum("...d,dhk->...hk", x,
                      w.reshape(W, H, D),
                      preferred_element_type=jnp.float32).astype(x.dtype)


def proj_flat(x, w):
    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)


def out_einsum(ctx, w):
    return jnp.einsum("...hk,hkd->...d", ctx, w.reshape(H, D, W),
                      preferred_element_type=jnp.float32).astype(ctx.dtype)


def variant_A(x, y, ws):
    wq, wk, wv, wo = ws
    q, k, v = proj_einsum(x, wq), proj_einsum(y, wk), proj_einsum(y, wv)
    ctx = fused_attention(q, k, v, None)
    return out_einsum(ctx, wo)


def variant_B(x, y, ws):
    wq, wk, wv, wo = ws
    q, k, v = proj_flat(x, wq), proj_flat(y, wk), proj_flat(y, wv)
    ctx = fused_attention_folded(q, k, v, None, num_heads=H)
    return proj_flat(ctx, wo)


def variant_C(x, y, ws):
    wq, wk, wv, wo = ws
    q = proj_einsum(x, wq)
    k = proj_flat(y, wk).reshape(*y.shape[:-1], H, D)
    v = proj_flat(y, wv).reshape(*y.shape[:-1], H, D)
    ctx = fused_attention(q, k, v, None)
    return out_einsum(ctx, wo)


def variant_D(x, y, ws):
    wq, wk, wv, wo = ws
    q, k, v = proj_einsum(x, wq), proj_einsum(y, wk), proj_einsum(y, wv)
    ctx = dot_product_attention(q, k, v, None)
    return out_einsum(ctx, wo)


VARIANTS = dict(A=variant_A, B=variant_B, C=variant_C, D=variant_D)


def bench(fn, x, y, ws, iters=30, rtt=0.0):
    # relay-safe timing (BASELINE.md r1): the relay does not honor
    # block_until_ready, so chain iters copies through a lax.scan (carry
    # dependency defeats elision), sync with a scalar D2H fetch, subtract RTT
    @jax.jit
    def many(x, y, ws):
        def body(c, _):
            # carry-dependent weight perturbation (adds ~1e-24, i.e. exactly
            # nothing in bf16 terms, but defeats LICM hoisting the
            # loop-invariant K/V projections out of the scan)
            d = (jnp.mean(c.astype(jnp.float32)) * 1e-24).astype(c.dtype)
            ws2 = tuple(w + d for w in ws)
            return fn(c, y, ws2).astype(c.dtype), None

        out, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(out.astype(jnp.float32))

    float(many(x, y, ws))  # warm (compile)
    t0 = time.perf_counter()
    float(many(x, y, ws))
    return (time.perf_counter() - t0 - rtt) / iters * 1e3


def flops(g, ql, m):
    proj_kv = 2 * g * m * W * W * 2
    proj_qo = 2 * g * ql * W * W * 2
    attn = 2 * g * ql * m * W * 2
    return proj_kv + proj_qo + attn


def main():
    from bench import measure_rtt

    rtt = measure_rtt()
    print(f"rtt {rtt * 1e3:.1f} ms")
    key = jax.random.key(0)
    ws = make_weights(key)
    print("cross-attention block [G, QL, 768] x [G, 577, 768]:")
    print(f"{'shape':>18} " + "".join(f"{v:>9}" for v in VARIANTS)
          + "   (ms; TF/s best)")
    for g, ql in [(128, 24), (128, 32), (64, 48), (64, 64), (32, 96),
                  (32, 128), (16, 192), (16, 256), (256, 24), (256, 32),
                  (128, 48), (128, 64)]:
        x = jax.random.normal(key, (g, ql, W), jnp.bfloat16)
        yv = jax.random.normal(key, (g, 577, W), jnp.bfloat16)
        times = {n: bench(fn, x, yv, ws, rtt=rtt) for n, fn in VARIANTS.items()}
        tf = flops(g, ql, 577) / min(times.values()) / 1e9
        print(f"[{g:>4},{ql:>4}] x 577  "
              + "".join(f"{times[n]:>9.3f}" for n in VARIANTS)
              + f"   best {tf:.0f} TF/s")

    print("\nself-attention block [B, L, 768] (y = x):")
    for b, l in [(128, 24), (128, 32), (256, 24), (256, 32)]:
        x = jax.random.normal(key, (b, l, W), jnp.bfloat16)
        times = {n: bench(fn, x, x, ws, rtt=rtt) for n, fn in VARIANTS.items()}
        tf = flops(b, l, l) / min(times.values()) / 1e9
        print(f"[{b:>4},{l:>4}]        "
              + "".join(f"{times[n]:>9.3f}" for n in VARIANTS)
              + f"   best {tf:.0f} TF/s")


if __name__ == "__main__":
    main()
