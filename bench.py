"""Headline benchmark: stage-II re-rank scoring throughput (triplets/sec).

This is the reference's bottleneck path — scoring K candidates per query with
the dual-stream encoder (validate_stage2.py:222-254, one bs=1 forward per query
on an A100). Here it is one batched pair-grid program at full model size
(ViT-B/16 features M=577, 12-layer dual encoder, L=40 text bucket, bf16).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is measured_triplets_per_sec / A100_BASELINE_TRIPLETS_PER_SEC,
where the baseline is a deliberately generous FLOP-model estimate for the
reference on its published hardware (see BASELINE.md "Stage-II throughput
baseline" for the derivation).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from candidate_reranking_cir_tpu.config import RerankerModelConfig
from candidate_reranking_cir_tpu.models.blip_reranker import RerankerModel

# Generous estimate of the reference implementation's stage-II scoring rate on
# one A100 (see BASELINE.md "Stage-II throughput baseline"): ~37 GFLOP/triplet
# (12 dual layers; cross-attn K/V projections over 577 image tokens dominate at
# ~2.7 GFLOP/layer) at an optimistic 50% bf16 MFU => ~4,200 triplets/s.
A100_BASELINE_TRIPLETS_PER_SEC = 4_200.0

Q, K = 8, 50          # queries per step x candidates per query (CIRR eval K)
WARMUP, ITERS = 2, 8


def main():
    cfg = RerankerModelConfig()
    model = RerankerModel(cfg, dtype=jnp.bfloat16)
    length = cfg.text_len
    m_tokens = cfg.vit.num_tokens
    d = cfg.text.hidden_size

    rng = np.random.default_rng(0)
    z_t = jnp.asarray(rng.normal(size=(Q, length, d)) * 0.02, jnp.float32)
    ids = jnp.asarray(rng.integers(10, 20000, size=(Q, length)), jnp.int32)
    mask = jnp.ones((Q, length), jnp.int32)
    cand = jnp.asarray(
        rng.normal(size=(Q, K, m_tokens, cfg.text.encoder_width)) * 0.02,
        jnp.bfloat16)

    # initialize only the text path (no ViT needed for the scoring benchmark)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.key(0), z_t, ids, mask, cand,
                           method=RerankerModel.score_per_query))
    key = jax.random.key(0)
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    keys = jax.random.split(key, len(leaves))
    params = jax.tree_util.tree_unflatten(treedef, [
        (jax.random.normal(k, s.shape, s.dtype) * 0.02
         if jnp.issubdtype(s.dtype, jnp.floating)
         else jnp.zeros(s.shape, s.dtype))
        for k, s in zip(keys, leaves)])

    # Timing methodology: the remote-TPU relay in this environment does not
    # honor block_until_ready for async dispatch, so ITERS scoring calls are
    # chained data-dependently inside ONE jit (lax.scan) and synced by a
    # scalar D2H; the relay round-trip is measured separately and subtracted.
    @jax.jit
    def score_chain(params, z_t, ids, mask, cand):
        def body(carry, _):
            out = model.apply(params, z_t + carry, ids, mask, cand,
                              method=RerankerModel.score_per_query)
            return jnp.mean(out) * 1e-9, None
        carry, _ = jax.lax.scan(body, jnp.zeros(()), None, length=ITERS)
        return carry

    @jax.jit
    def trivial(x):
        return x + 1.0

    float(trivial(jnp.zeros(())))
    t0 = time.perf_counter()
    for _ in range(5):
        float(trivial(jnp.zeros(())))
    rtt = (time.perf_counter() - t0) / 5

    for _ in range(WARMUP):
        float(score_chain(params, z_t, ids, mask, cand))

    t0 = time.perf_counter()
    float(score_chain(params, z_t, ids, mask, cand))
    dt = max(time.perf_counter() - t0 - rtt, 1e-9) / ITERS

    triplets_per_sec = Q * K / dt
    print(json.dumps({
        "metric": "stage2_rerank_triplets_per_sec",
        "value": round(triplets_per_sec, 1),
        "unit": "triplets/s",
        "vs_baseline": round(triplets_per_sec / A100_BASELINE_TRIPLETS_PER_SEC,
                             3),
    }))


if __name__ == "__main__":
    main()
