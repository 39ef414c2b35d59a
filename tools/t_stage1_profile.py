"""Stage-I train step breakdown: ref ViT fwd, MED fusion fwd, full
value_and_grad step — find where the non-ViT second goes."""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from candidate_reranking_cir_tpu.config import (
    RetrievalModelConfig,
    TextEncoderConfig,
    TrainConfig,
    vit_config,
)
from candidate_reranking_cir_tpu.models.blip_retrieval import RetrievalModel
from candidate_reranking_cir_tpu.runtime.optim import make_optimizer
from candidate_reranking_cir_tpu.runtime.train_steps import (
    TrainState,
    make_stage1_train_step,
    stage1_loss,
)
from bench import measure_rtt, rand_params

B = 512
ITERS = 4
cfg = RetrievalModelConfig(
    vit=vit_config("base", 384, remat=True, fused_attention=True),
    text=TextEncoderConfig(remat=True))
model = RetrievalModel(cfg, dtype=jnp.bfloat16)
L = cfg.text_len
IM = cfg.vit.image_size

rng = np.random.default_rng(0)
tgt = rng.normal(size=(B, 256)).astype(np.float32)
tgt /= np.linalg.norm(tgt, axis=-1, keepdims=True)
batch = {
    "ref_images": jnp.asarray(rng.normal(size=(B, IM, IM, 3)) * 0.3,
                              jnp.float32),
    "target_pooled": jnp.asarray(tgt),
    "input_ids": jnp.asarray(rng.integers(10, 20000, size=(B, L)), jnp.int32),
    "attention_mask": jnp.ones((B, L), jnp.int32),
}
params = rand_params(
    jax.eval_shape(lambda: model.init(jax.random.key(0),
                                      batch["ref_images"][:2],
                                      batch["input_ids"][:2],
                                      batch["attention_mask"][:2])),
    jax.random.key(1))
rtt = measure_rtt()


def chain(fn, args, n=ITERS, warmup=1):
    @jax.jit
    def run(*a):
        def body(c, _):
            out = fn(*a, c)
            return jnp.mean(jnp.asarray(out, jnp.float32).ravel()[:1]) * 1e-9, None
        c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=n)
        return c
    for _ in range(warmup):
        float(run(*args))
    t0 = time.perf_counter()
    float(run(*args))
    return max(time.perf_counter() - t0 - rtt, 1e-9) / n


# a) ref ViT fwd (frozen/eval)
def vit_fwd(p, imgs, c):
    return model.apply(p, imgs + c, method=RetrievalModel.embed_images)

dt = chain(vit_fwd, (params, batch["ref_images"]))
print(f"ViT fwd 512 imgs: {dt*1e3:.0f} ms", flush=True)

# b) fusion fwd only (training mode dropout, rbg key outside)
ref_feats = model.apply(params, batch["ref_images"],
                        method=RetrievalModel.embed_images)

def fuse_fwd(p, feats, ids, mask, c):
    return model.apply(p, feats + c.astype(feats.dtype), ids, mask,
                       deterministic=False,
                       rngs={"dropout": jax.random.key(0, impl="rbg")},
                       method=RetrievalModel.fuse)

dt = chain(fuse_fwd, (params, ref_feats, batch["input_ids"],
                      batch["attention_mask"]))
print(f"MED fuse fwd 512q (train mode): {dt*1e3:.0f} ms", flush=True)

# c) loss fwd (no grad)
def loss_fwd(p, b_ref, b_tgt, ids, mask, c):
    bb = {"ref_images": b_ref + c, "target_pooled": b_tgt,
          "input_ids": ids, "attention_mask": mask}
    loss, _ = stage1_loss(model, p, bb, {"dropout": jax.random.key(0, impl="rbg")},
                          finetune_vit=False)
    return loss

dt = chain(loss_fwd, (params, batch["ref_images"], batch["target_pooled"],
                      batch["input_ids"], batch["attention_mask"]))
print(f"loss fwd: {dt*1e3:.0f} ms", flush=True)

# d) full train step
tx, _ = make_optimizer(TrainConfig(batch_size=B), params, 100,
                       freeze_prefixes=("params/visual_encoder",))
state = TrainState.create(params, tx)
step = make_stage1_train_step(model, finetune_vit=False, donate=True)
key = jax.random.key(1, impl="rbg")
state, loss = step(state, batch, key)
float(loss)
t0 = time.perf_counter()
for _ in range(ITERS):
    state, loss = step(state, batch, key)
float(loss)
dt = max(time.perf_counter() - t0 - rtt, 1e-9) / ITERS
print(f"full step: {dt*1e3:.0f} ms", flush=True)
