"""Measure candidate-major score_grid vs per-query scoring at full size.

Each candidate's cross-attn K/V projections are paid once per call and shared
by B queries; per-query scoring pays them per pair. Expected win ~ the K/V
projection share of the per-pair cost (~65/210 ms measured in r1).
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from candidate_reranking_cir_tpu.config import RerankerModelConfig
from candidate_reranking_cir_tpu.models.blip_reranker import RerankerModel

ITERS = 8


def make_params(model, init_fn):  # kept for history; prefer bench.rand_params
    shapes = jax.eval_shape(init_fn)
    key = jax.random.key(0)
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    keys = jax.random.split(key, len(leaves))
    return jax.tree_util.tree_unflatten(treedef, [
        (jax.random.normal(k, s.shape, s.dtype) * 0.02
         if jnp.issubdtype(s.dtype, jnp.floating)
         else jnp.zeros(s.shape, s.dtype))
        for k, s in zip(keys, leaves)])


def rtt_measure():
    @jax.jit
    def trivial(x):
        return x + 1.0

    float(trivial(jnp.zeros(())))
    t0 = time.perf_counter()
    for _ in range(5):
        float(trivial(jnp.zeros(())))
    return (time.perf_counter() - t0) / 5


def bench_chain(fn, params, args, rtt, warmup=2):
    # params must be an explicit jit arg — a closure would bake them into the
    # HLO as constants and blow the remote-compile request size limit
    @jax.jit
    def chain(params, *a):
        def body(carry, _):
            out = fn(params, *a, carry)
            return jnp.mean(out) * 1e-9, None
        carry, _ = jax.lax.scan(body, jnp.zeros(()), None, length=ITERS)
        return carry

    for _ in range(warmup):
        float(chain(params, *args))
    t0 = time.perf_counter()
    float(chain(params, *args))
    return max(time.perf_counter() - t0 - rtt, 1e-9) / ITERS


def main():
    import dataclasses as dc

    cfg = RerankerModelConfig()
    L = cfg.text_len
    M = cfg.vit.num_tokens
    D = cfg.text.hidden_size
    W = cfg.text.encoder_width
    rng = np.random.default_rng(0)
    rtt = rtt_measure()
    print(f"rtt={rtt*1e3:.1f}ms")

    model = RerankerModel(cfg, dtype=jnp.bfloat16)

    def grid_inputs(A, B):
        z = jnp.asarray(rng.normal(size=(A, B, L, D)) * 0.02, jnp.bfloat16)
        ids = jnp.asarray(rng.integers(10, 20000, size=(A, B, L)), jnp.int32)
        msk = jnp.ones((A, B, L), jnp.int32)
        cand = jnp.asarray(rng.normal(size=(A, M, W)) * 0.02, jnp.bfloat16)
        return z, ids, msk, cand

    z0, i0, m0, c0 = grid_inputs(2, 4)
    params = make_params(model, lambda: model.init(
        jax.random.key(0), z0, i0, m0, c0, method=RerankerModel.score_grid))

    for A, B in ((4, 128), (16, 32), (2, 256)):
        z, ids, msk, cand = grid_inputs(A, B)

        def fn(p, z, ids, msk, cand, carry):
            return model.apply(p, z + carry, ids, msk, cand,
                               method=RerankerModel.score_grid)

        dt = bench_chain(fn, params, (z, ids, msk, cand), rtt)
        print(f"grid A={A} B={B}: {dt*1e3:.1f} ms/call "
              f"= {A*B/dt:,.0f} triplets/s", flush=True)

    fused_model = RerankerModel(dc.replace(
        cfg, text=dc.replace(cfg.text, fused_attention=True)),
        dtype=jnp.bfloat16)
    A, B = 4, 128
    z, ids, msk, cand = grid_inputs(A, B)

    def fn_f(p, z, ids, msk, cand, carry):
        return fused_model.apply(p, z + carry, ids, msk, cand,
                                 method=RerankerModel.score_grid)

    dt = bench_chain(fn_f, params, (z, ids, msk, cand), rtt)
    print(f"grid+fused A={A} B={B}: {dt*1e3:.1f} ms/call "
          f"= {A*B/dt:,.0f} triplets/s", flush=True)


if __name__ == "__main__":
    main()
