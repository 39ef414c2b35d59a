"""A/B the train-mode fused attention kernel (in-kernel dropout) on the real
train steps: text/dual fused_attention off (current default) vs on."""
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
from bench import caption_lengths, measure_rtt
from candidate_reranking_cir_tpu.cli.common import (
    parse_text_buckets,
    text_bucket_slice,
)

ITERS = 6


def stage2(rtt, fused_text):
    b = 16
    s1_cfg = RetrievalModelConfig()
    s2_cfg = RerankerModelConfig(
        vit=vit_config("base", 384, drop_path_rate=0.1, remat=True,
                       remat_policy="dots", fused_attention=True),
        text=TextEncoderConfig(remat=True, remat_policy="dots",
                               fused_attention=fused_text))
    s1 = RetrievalModel(s1_cfg, dtype=jnp.bfloat16)
    s2 = RerankerModel(s2_cfg, dtype=jnp.bfloat16)
    L = s2_cfg.text_len
    im = s2_cfg.vit.image_size
    rng = np.random.default_rng(0)
    lens = caption_lengths(b, L)
    ids_np = rng.integers(10, 20000, size=(b, L)).astype(np.int32)
    mask_np = (np.arange(L)[None, :] < lens[:, None]).astype(np.int32)
    ids_np, mask_np = text_bucket_slice(ids_np * mask_np, mask_np,
                                        parse_text_buckets("auto", L))
    batch = {
        "ref_images": jnp.asarray(rng.normal(size=(b, im, im, 3)) * 0.3,
                                  jnp.float32),
        "target_images": jnp.asarray(rng.normal(size=(b, im, im, 3)) * 0.3,
                                     jnp.float32),
        "input_ids": jnp.asarray(ids_np),
        "attention_mask": jnp.asarray(mask_np),
    }
    s1_params = s1.init(jax.random.key(1), batch["ref_images"][:2],
                        batch["input_ids"][:2], batch["attention_mask"][:2])
    z_dummy = jnp.zeros((2, ids_np.shape[1], s2_cfg.text.hidden_size))
    s2_params = s2.init(jax.random.key(2), batch["target_images"][:2],
                        batch["input_ids"][:2], batch["attention_mask"][:2],
                        z_dummy)
    tx, _ = make_optimizer(TrainConfig(batch_size=b), s2_params, 100)
    state = TrainState.create(s2_params, tx)
    step = make_stage2_train_step(s1, s2, donate=True)
    state, loss = step(state, s1_params, batch, jax.random.key(3, impl="rbg"))
    l0 = float(loss)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, loss = step(state, s1_params, batch,
                           jax.random.key(4, impl="rbg"))
    l1 = float(loss)
    dt = max(time.perf_counter() - t0 - rtt, 1e-9) / ITERS
    print(f"stage2 fused_text={fused_text}: {b*b/dt:.1f} t/s "
          f"({dt*1e3:.1f} ms/step) loss {l0:.4f}->{l1:.4f}", flush=True)
    return b * b / dt


def stage1(rtt, fused_text):
    b = 512
    cfg = RetrievalModelConfig(
        vit=vit_config("base", 384, remat=True, fused_attention=True),
        text=TextEncoderConfig(remat=True, fused_attention=fused_text))
    model = RetrievalModel(cfg, dtype=jnp.bfloat16)
    L = cfg.text_len
    im = cfg.vit.image_size
    rng = np.random.default_rng(0)
    tgt = rng.normal(size=(b, 256)).astype(np.float32)
    tgt /= np.linalg.norm(tgt, axis=-1, keepdims=True)
    lens = caption_lengths(b, L)
    ids_np = rng.integers(10, 20000, size=(b, L)).astype(np.int32)
    mask_np = (np.arange(L)[None, :] < lens[:, None]).astype(np.int32)
    ids_np, mask_np = text_bucket_slice(ids_np * mask_np, mask_np,
                                        parse_text_buckets("auto", L))
    batch = {
        "ref_images": jnp.asarray(rng.normal(size=(b, im, im, 3)) * 0.3,
                                  jnp.float32),
        "target_pooled": jnp.asarray(tgt),
        "input_ids": jnp.asarray(ids_np),
        "attention_mask": jnp.asarray(mask_np),
    }
    params = model.init(jax.random.key(0), batch["ref_images"][:2],
                        batch["input_ids"][:2], batch["attention_mask"][:2])
    tx, _ = make_optimizer(TrainConfig(batch_size=b), params, 100,
                           freeze_prefixes=("params/visual_encoder",))
    state = TrainState.create(params, tx)
    step = make_stage1_train_step(model, finetune_vit=False, donate=True)
    state, loss = step(state, batch, jax.random.key(1, impl="rbg"))
    l0 = float(loss)
    t0 = time.perf_counter()
    for _ in range(max(ITERS // 2, 2)):
        state, loss = step(state, batch, jax.random.key(2, impl="rbg"))
    l1 = float(loss)
    dt = max(time.perf_counter() - t0 - rtt, 1e-9) / max(ITERS // 2, 2)
    print(f"stage1 fused_text={fused_text}: {b/dt:.1f} p/s "
          f"({dt*1e3:.1f} ms/step) loss {l0:.4f}->{l1:.4f}", flush=True)
    return b / dt


if __name__ == "__main__":
    rtt = measure_rtt()
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("both", "stage2"):
        stage2(rtt, False)
    if which in ("both", "stage2", "stage2f"):
        stage2(rtt, True)
    if which in ("both", "stage1"):
        stage1(rtt, False)
    if which in ("both", "stage1", "stage1f"):
        stage1(rtt, True)
