"""Dropout PRNG cost: threefry (jax default) vs rbg on the real train steps.
Dropout masks over the pair-grid attention probs draw billions of random
bits per step; threefry generates them on the VPU at ~10 ops/bit."""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from candidate_reranking_cir_tpu.config import (
    RerankerModelConfig,
    RetrievalModelConfig,
    TextEncoderConfig,
    TrainConfig,
    vit_config,
)
from candidate_reranking_cir_tpu.models.blip_reranker import RerankerModel
from candidate_reranking_cir_tpu.models.blip_retrieval import RetrievalModel
from candidate_reranking_cir_tpu.runtime.optim import make_optimizer
from candidate_reranking_cir_tpu.runtime.train_steps import (
    TrainState,
    make_stage1_train_step,
    make_stage2_train_step,
)
from bench import measure_rtt

ITERS = 4


def stage1(rtt, impl):
    b = 512
    cfg = RetrievalModelConfig(
        vit=vit_config("base", 384, remat=True, fused_attention=True),
        text=TextEncoderConfig(remat=True))
    model = RetrievalModel(cfg, dtype=jnp.bfloat16)
    L = cfg.text_len
    im = cfg.vit.image_size
    rng = np.random.default_rng(0)
    tgt = rng.normal(size=(b, 256)).astype(np.float32)
    tgt /= np.linalg.norm(tgt, axis=-1, keepdims=True)
    batch = {
        "ref_images": jnp.asarray(rng.normal(size=(b, im, im, 3)) * 0.3,
                                  jnp.float32),
        "target_pooled": jnp.asarray(tgt),
        "input_ids": jnp.asarray(rng.integers(10, 20000, size=(b, L)),
                                 jnp.int32),
        "attention_mask": jnp.ones((b, L), jnp.int32),
    }
    params = model.init(jax.random.key(0), batch["ref_images"][:2],
                        batch["input_ids"][:2], batch["attention_mask"][:2])
    tx, _ = make_optimizer(TrainConfig(batch_size=b), params, 100,
                           freeze_prefixes=("params/visual_encoder",))
    state = TrainState.create(params, tx)
    step = make_stage1_train_step(model, finetune_vit=False, donate=True)
    key = jax.random.key(1, impl=impl)
    state, loss = step(state, batch, key)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, loss = step(state, batch, key)
    float(loss)
    dt = max(time.perf_counter() - t0 - rtt, 1e-9) / ITERS
    print(f"stage1 {impl}: {dt*1e3:.0f} ms/step = {b/dt:.0f} pairs/s",
          flush=True)


def stage2(rtt, impl):
    b = 16
    s1_cfg = RetrievalModelConfig()
    s2_cfg = RerankerModelConfig(
        vit=vit_config("base", 384, drop_path_rate=0.1, remat=True,
                       remat_policy="dots", fused_attention=True),
        text=TextEncoderConfig(remat=True, remat_policy="dots"))
    s1 = RetrievalModel(s1_cfg, dtype=jnp.bfloat16)
    s2 = RerankerModel(s2_cfg, dtype=jnp.bfloat16)
    L = s2_cfg.text_len
    im = s2_cfg.vit.image_size
    rng = np.random.default_rng(0)
    batch = {
        "ref_images": jnp.asarray(rng.normal(size=(b, im, im, 3)) * 0.3,
                                  jnp.float32),
        "target_images": jnp.asarray(rng.normal(size=(b, im, im, 3)) * 0.3,
                                     jnp.float32),
        "input_ids": jnp.asarray(rng.integers(10, 20000, size=(b, L)),
                                 jnp.int32),
        "attention_mask": jnp.ones((b, L), jnp.int32),
    }
    s1_params = s1.init(jax.random.key(1), batch["ref_images"][:2],
                        batch["input_ids"][:2], batch["attention_mask"][:2])
    z = jnp.zeros((2, L, s2_cfg.text.hidden_size))
    s2_params = s2.init(jax.random.key(2), batch["target_images"][:2],
                        batch["input_ids"][:2], batch["attention_mask"][:2], z)
    tx, _ = make_optimizer(TrainConfig(batch_size=b), s2_params, 100)
    state = TrainState.create(s2_params, tx)
    step = make_stage2_train_step(s1, s2, donate=True)
    key = jax.random.key(3, impl=impl)
    state, loss = step(state, s1_params, batch, key)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, loss = step(state, s1_params, batch, key)
    float(loss)
    dt = max(time.perf_counter() - t0 - rtt, 1e-9) / ITERS
    print(f"stage2 {impl}: {dt*1e3:.0f} ms/step = {b*b/dt:.0f} t/s",
          flush=True)


if __name__ == "__main__":
    rtt = measure_rtt()
    for impl in ("threefry2x32", "rbg"):
        stage2(rtt, impl)
    for impl in ("threefry2x32", "rbg"):
        stage1(rtt, impl)
