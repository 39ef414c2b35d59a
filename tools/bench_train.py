"""Stage-II training-step throughput: the B x B pair grid with shared-KV
(the reference's hottest construct, blip_stage2.py:78-94, as one program).

Reports triplets/sec for the full jitted step: frozen stage-I z_t production,
stage-II target ViT embedding, dual-encoder pair grid, CE loss, AdamW update.
Relay-safe timing (see bench.py).
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

from candidate_reranking_cir_tpu.config import (
    RerankerModelConfig, RetrievalModelConfig, TrainConfig)
from candidate_reranking_cir_tpu.models.blip_reranker import RerankerModel
from candidate_reranking_cir_tpu.models.blip_retrieval import RetrievalModel
from candidate_reranking_cir_tpu.runtime.optim import make_optimizer
from candidate_reranking_cir_tpu.runtime.train_steps import (
    TrainState, make_stage2_train_step, stage2_loss)

B = 16
ITERS = 4

def rand_params(shapes, key):
    leaves, td = jax.tree_util.tree_flatten(shapes)
    keys = jax.random.split(key, len(leaves))
    return jax.tree_util.tree_unflatten(td, [
        (jax.random.normal(k, s.shape, s.dtype) * 0.02
         if jnp.issubdtype(s.dtype, jnp.floating) else jnp.zeros(s.shape, s.dtype))
        for k, s in zip(keys, leaves)])

def main():
    import dataclasses
    from candidate_reranking_cir_tpu.config import TextEncoderConfig, ViTConfig, vit_config
    s1_cfg = RetrievalModelConfig()
    # training config: remat everywhere (required to fit the backward on chip)
    s2_cfg = RerankerModelConfig(
        vit=vit_config("base", 384, drop_path_rate=0.1, remat=True),
        text=TextEncoderConfig(remat=True))
    bf = jnp.bfloat16
    s1 = RetrievalModel(s1_cfg, dtype=bf)
    s2 = RerankerModel(s2_cfg, dtype=bf)
    L = s2_cfg.text_len
    IM = s2_cfg.vit.image_size

    rng = np.random.default_rng(0)
    batch = {
        "ref_images": jnp.asarray(rng.normal(size=(B, IM, IM, 3)) * 0.3, jnp.float32),
        "target_images": jnp.asarray(rng.normal(size=(B, IM, IM, 3)) * 0.3, jnp.float32),
        "input_ids": jnp.asarray(rng.integers(10, 20000, size=(B, L)), jnp.int32),
        "attention_mask": jnp.ones((B, L), jnp.int32),
    }

    # real init (LayerNorm scales at 1 etc.) so the loss trajectory is sane
    s1_params = s1.init(jax.random.key(1), batch["ref_images"][:2],
                        batch["input_ids"][:2], batch["attention_mask"][:2])
    z_dummy = jnp.zeros((2, L, s2_cfg.text.hidden_size))
    s2_params = s2.init(jax.random.key(2), batch["target_images"][:2],
                        batch["input_ids"][:2], batch["attention_mask"][:2],
                        z_dummy)

    tx, _ = make_optimizer(TrainConfig(batch_size=B), s2_params, 100)
    state = TrainState.create(s2_params, tx)
    step = make_stage2_train_step(s1, s2, donate=True)

    @jax.jit
    def trivial(x): return x + 1.0
    float(trivial(jnp.zeros(())))
    t0 = time.perf_counter()
    for _ in range(5):
        float(trivial(jnp.zeros(())))
    rtt = (time.perf_counter() - t0) / 5

    # warm: one step (compile); state is donated so always thread it
    state, loss = step(state, s1_params, batch, jax.random.key(3))
    print(f"loss after 1 step: {float(loss):.4f} (ln {B} = {np.log(B):.4f})",
          flush=True)

    # timed: ITERS dependent steps (state threads through -> no overlap dodge)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, loss = step(state, s1_params, batch, jax.random.key(4))
    lv = float(loss)  # D2H sync
    dt = max(time.perf_counter() - t0 - rtt, 1e-9) / ITERS
    print(f"stage2 train step B={B} ({B*B} triplets): {dt*1e3:.1f} ms "
          f"-> {B*B/dt:.1f} triplets/s (final loss {lv:.4f})")

if __name__ == "__main__":
    main()
