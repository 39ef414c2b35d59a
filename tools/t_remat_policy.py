"""Stage-II train step: full remat vs 'dots' checkpoint policy (save matmul
outputs without batch dims, recompute attention/elementwise) — backward-speed
vs memory trade at the reference config (B=16)."""
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
    make_stage2_train_step,
)
from bench import measure_rtt

B = 16
ITERS = 4


def run(name, policy):
    s1_cfg = RetrievalModelConfig()
    s2_cfg = RerankerModelConfig(
        vit=vit_config("base", 384, drop_path_rate=0.1, remat=True,
                       fused_attention=True, remat_policy=policy),
        text=TextEncoderConfig(remat=True, remat_policy=policy))
    s1 = RetrievalModel(s1_cfg, dtype=jnp.bfloat16)
    s2 = RerankerModel(s2_cfg, dtype=jnp.bfloat16)
    L = s2_cfg.text_len
    im = s2_cfg.vit.image_size
    rng = np.random.default_rng(0)
    batch = {
        "ref_images": jnp.asarray(rng.normal(size=(B, im, im, 3)) * 0.3,
                                  jnp.float32),
        "target_images": jnp.asarray(rng.normal(size=(B, im, im, 3)) * 0.3,
                                     jnp.float32),
        "input_ids": jnp.asarray(rng.integers(10, 20000, size=(B, L)),
                                 jnp.int32),
        "attention_mask": jnp.ones((B, L), jnp.int32),
    }
    s1_params = s1.init(jax.random.key(1), batch["ref_images"][:2],
                        batch["input_ids"][:2], batch["attention_mask"][:2])
    z = jnp.zeros((2, L, s2_cfg.text.hidden_size))
    s2_params = s2.init(jax.random.key(2), batch["target_images"][:2],
                        batch["input_ids"][:2], batch["attention_mask"][:2], z)
    tx, _ = make_optimizer(TrainConfig(batch_size=B), s2_params, 100)
    state = TrainState.create(s2_params, tx)
    step = make_stage2_train_step(s1, s2, donate=True)

    rtt = measure_rtt()
    try:
        state, loss = step(state, s1_params, batch, jax.random.key(3))
        float(loss)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, loss = step(state, s1_params, batch, jax.random.key(4))
        float(loss)
        dt = max(time.perf_counter() - t0 - rtt, 1e-9) / ITERS
        print(f"{name}: {dt*1e3:.0f} ms/step = {B*B/dt:.0f} t/s", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    run("remat full", "")
    run("remat dots", "dots")
