"""Stage-II train step at bucketed text widths: quantifies the
--text-len-buckets win (most batches at bs=16 land in the 24/32 buckets
under a realistic caption-length distribution)."""
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

rtt = measure_rtt()
b = 16
s1_cfg = RetrievalModelConfig()
s2_cfg = RerankerModelConfig(
    vit=vit_config("base", 384, drop_path_rate=0.1, remat=True,
                   remat_policy="dots", fused_attention=True),
    text=TextEncoderConfig(remat=True, remat_policy="dots"))
s1 = RetrievalModel(s1_cfg, dtype=jnp.bfloat16)
s2 = RerankerModel(s2_cfg, dtype=jnp.bfloat16)
im = s2_cfg.vit.image_size
rng = np.random.default_rng(0)
ref = jnp.asarray(rng.normal(size=(b, im, im, 3)) * 0.3, jnp.float32)
tgt = jnp.asarray(rng.normal(size=(b, im, im, 3)) * 0.3, jnp.float32)
step = make_stage2_train_step(s1, s2, donate=True)

for L in (int(a) for a in (sys.argv[1:] or ["40", "24"])):
    ids = jnp.asarray(rng.integers(10, 20000, size=(b, L)), jnp.int32)
    mask = jnp.ones((b, L), jnp.int32)
    batch = {"ref_images": ref, "target_images": tgt, "input_ids": ids,
             "attention_mask": mask}
    s1p = s1.init(jax.random.key(1), ref[:2], ids[:2], mask[:2])
    z = jnp.zeros((2, L, s2_cfg.text.hidden_size))
    s2p = s2.init(jax.random.key(2), tgt[:2], ids[:2], mask[:2], z)
    tx, _ = make_optimizer(TrainConfig(batch_size=b), s2p, 100)
    state = TrainState.create(s2p, tx)
    state, loss = step(state, s1p, batch, jax.random.key(3, impl="rbg"))
    print(f"L={L}: compiled, loss={float(loss):.3f}", flush=True)
    t0 = time.perf_counter()
    iters = 4
    for _ in range(iters):
        state, loss = step(state, s1p, batch, jax.random.key(4, impl="rbg"))
    float(loss)
    dt = (time.perf_counter() - t0 - rtt) / iters
    print(f"L={L}: {dt*1000:.0f} ms/step = {b*b/dt:,.0f} triplets/s",
          flush=True)
