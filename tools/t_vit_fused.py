"""ViT-B/16 @ 384 forward: fused pallas attention vs XLA, plus isolated
577-token self-attention comparison. The ViT forward dominates stage-I
training (1024 images/step) and index building."""
import sys
import time

sys.path.insert(0, "/root/repo")
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from candidate_reranking_cir_tpu.config import vit_config
from candidate_reranking_cir_tpu.models.vit import VisionTransformer
from candidate_reranking_cir_tpu.ops.pallas_attention import fused_attention
from bench import measure_rtt, rand_params

ITERS = 8


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

    # isolated 577-token self-attention, B=64, 12 heads, D=64
    B, L, H, D = 64, 577, 12, 64
    q = jnp.asarray(rng.normal(size=(B, L, H, D)) * 0.05, jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, L, H, D)) * 0.05, jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, L, H, D)) * 0.05, jnp.bfloat16)

    def xla_attn(q, k, v, c):
        s = jnp.einsum("blhd,bmhd->bhlm", q + c.astype(q.dtype), k,
                       preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s * D ** -0.5, axis=-1).astype(q.dtype)
        return jnp.einsum("bhlm,bmhd->blhd", p, v,
                          preferred_element_type=jnp.float32)

    def pls_attn(q, k, v, c):
        return fused_attention(q + c.astype(q.dtype), k, v, None)

    dt = chain_time(xla_attn, (q, k, v), rtt)
    print(f"self-attn 577 XLA:    {dt*1e3:.2f} ms/call", flush=True)
    dt = chain_time(pls_attn, (q, k, v), rtt)
    print(f"self-attn 577 pallas: {dt*1e3:.2f} ms/call", flush=True)

    # full ViT forward, B=32
    for fused in (False, True):
        cfg = dataclasses.replace(vit_config("base", 384),
                                  fused_attention=fused)
        model = VisionTransformer(cfg, jnp.bfloat16)
        imgs = jnp.asarray(rng.normal(size=(32, 384, 384, 3)) * 0.3,
                           jnp.float32)
        params = rand_params(
            jax.eval_shape(lambda: model.init(jax.random.key(0), imgs[:2])),
            jax.random.key(1))

        def fwd(params, imgs, c):
            return model.apply(params, imgs + c)

        dt = chain_time(fwd, (params, imgs), rtt, iters=4)
        print(f"ViT-B/384 fwd B=32 fused={fused}: {dt*1e3:.1f} ms "
              f"= {32/dt:.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
