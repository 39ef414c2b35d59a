"""Candidate-major grid scoring: fused pallas attention vs XLA at the
production shape [A=16, B=32], plus a pairs_per_call=1024 variant."""
import sys
import time

sys.path.insert(0, "/root/repo")
import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np

from candidate_reranking_cir_tpu.config import RerankerModelConfig
from candidate_reranking_cir_tpu.models.blip_reranker import RerankerModel
from bench import measure_rtt, rand_params

ITERS = 8


def chain_time(fn, args, rtt, warmup=2):
    @jax.jit
    def chain(*a):
        def body(c, _):
            out = fn(*a, c)
            return jnp.mean(out) * 1e-9, None
        c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=ITERS)
        return c

    for _ in range(warmup):
        float(chain(*args))
    t0 = time.perf_counter()
    float(chain(*args))
    return max(time.perf_counter() - t0 - rtt, 1e-9) / ITERS


def main():
    rtt = measure_rtt()
    cfg = RerankerModelConfig()
    L = cfg.text_len
    M = cfg.vit.num_tokens
    W = cfg.text.encoder_width
    rng = np.random.default_rng(0)

    def inputs(A, B):
        z = jnp.asarray(rng.normal(size=(A, B, L, cfg.text.hidden_size))
                        * 0.02, jnp.bfloat16)
        ids = jnp.asarray(rng.integers(10, 20000, size=(A, B, L)), jnp.int32)
        msk = jnp.ones((A, B, L), jnp.int32)
        cand = jnp.asarray(rng.normal(size=(A, M, W)) * 0.02, jnp.bfloat16)
        return z, ids, msk, cand

    base = RerankerModel(cfg, dtype=jnp.bfloat16)
    z0, i0, m0, c0 = inputs(2, 4)
    params = rand_params(
        jax.eval_shape(lambda: base.init(jax.random.key(0), z0, i0, m0, c0,
                                         method=RerankerModel.score_grid)),
        jax.random.key(1))

    variants = [
        ("xla [16,32]", cfg, 16, 32),
        ("fused [16,32]",
         dc.replace(cfg, text=dc.replace(cfg.text, fused_attention=True)),
         16, 32),
        ("xla [32,32]", cfg, 32, 32),
        ("fused [16,64]",
         dc.replace(cfg, text=dc.replace(cfg.text, fused_attention=True)),
         16, 64),
    ]
    for name, c, A, B in variants:
        model = RerankerModel(c, dtype=jnp.bfloat16)
        z, ids, msk, cand = inputs(A, B)

        def fn(p, z, ids, msk, cand, carry):
            return model.apply(p, z + carry, ids, msk, cand,
                               method=RerankerModel.score_grid)

        try:
            dt = chain_time(fn, (params, z, ids, msk, cand), rtt)
            print(f"{name}: {dt*1e3:.1f} ms = {A*B/dt:,.0f} t/s", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
