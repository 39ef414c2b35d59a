"""Stage-I training-step throughput at the reference config (bs=512,
frozen ViT) on one chip. Relay-safe timing."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

from candidate_reranking_cir_tpu.config import (
    RetrievalModelConfig, TextEncoderConfig, TrainConfig, vit_config)
from candidate_reranking_cir_tpu.models.blip_retrieval import RetrievalModel
from candidate_reranking_cir_tpu.runtime.optim import make_optimizer
from candidate_reranking_cir_tpu.runtime.train_steps import (
    TrainState, make_stage1_train_step)

B = 512
ITERS = 2

def main():
    cfg = RetrievalModelConfig(
        vit=vit_config("base", 384, remat=True),
        text=TextEncoderConfig(remat=True))
    model = RetrievalModel(cfg, dtype=jnp.bfloat16)
    L, IM = cfg.text_len, cfg.vit.image_size

    rng = np.random.default_rng(0)
    batch = {
        "ref_images": jnp.asarray(rng.normal(size=(B, IM, IM, 3)) * 0.3,
                                  jnp.float32),
        "target_images": jnp.asarray(rng.normal(size=(B, IM, IM, 3)) * 0.3,
                                     jnp.float32),
        "input_ids": jnp.asarray(rng.integers(10, 20000, size=(B, L)),
                                 jnp.int32),
        "attention_mask": jnp.ones((B, L), jnp.int32),
    }
    params = model.init(jax.random.key(0), batch["ref_images"][:2],
                        batch["input_ids"][:2], batch["attention_mask"][:2])
    tx, _ = make_optimizer(TrainConfig(batch_size=B), params, 100,
                           freeze_prefixes=("params/visual_encoder",))
    state = TrainState.create(params, tx)
    step = make_stage1_train_step(model, finetune_vit=False, donate=True)

    @jax.jit
    def trivial(x): return x + 1.0
    float(trivial(jnp.zeros(())))
    t0 = time.perf_counter()
    for _ in range(5):
        float(trivial(jnp.zeros(())))
    rtt = (time.perf_counter() - t0) / 5

    state, loss = step(state, batch, jax.random.key(1))
    print(f"loss after 1 step: {float(loss):.4f} (ln {B} = {np.log(B):.4f})",
          flush=True)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, loss = step(state, batch, jax.random.key(2))
    lv = float(loss)
    dt = max(time.perf_counter() - t0 - rtt, 1e-9) / ITERS
    print(f"stage1 train step B={B}: {dt*1e3:.0f} ms -> {B/dt:.1f} pairs/s "
          f"(loss {lv:.4f})")

if __name__ == "__main__":
    main()
