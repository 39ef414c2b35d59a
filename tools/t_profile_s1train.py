# Capture a profiler trace of the stage-I train step; summarize op time.
import sys, glob, gzip, json, os
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

from candidate_reranking_cir_tpu.config import (
    RetrievalModelConfig, TextEncoderConfig, TrainConfig, vit_config)
from candidate_reranking_cir_tpu.models.blip_retrieval import RetrievalModel
from candidate_reranking_cir_tpu.runtime.optim import make_optimizer
from candidate_reranking_cir_tpu.runtime.train_steps import (
    TrainState, make_stage1_train_step)
from bench import caption_lengths
from candidate_reranking_cir_tpu.cli.common import (
    parse_text_buckets, text_bucket_slice)

b = 512
cfg = RetrievalModelConfig(
    vit=vit_config("base", 384, remat=True, fused_attention=True),
    text=TextEncoderConfig(remat=True, fused_attention=True))
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
float(loss)

os.system("rm -rf /tmp/jtrace_s1")
with jax.profiler.trace("/tmp/jtrace_s1"):
    for _ in range(2):
        state, loss = step(state, batch, jax.random.key(2, impl="rbg"))
    float(loss)

files = glob.glob("/tmp/jtrace_s1/**/*.trace.json.gz", recursive=True)
print("trace files:", files)
for f in files:
    with gzip.open(f) as fh:
        data = json.load(fh)
    pids = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    agg = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X" or not e.get("dur"):
            continue
        lane = pids.get(e.get("pid"), "?")
        if "TPU" not in lane:
            continue
        agg[e["name"][:60]] = agg.get(e["name"][:60], 0) + e["dur"]
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:35]:
        print(f"{dur/1e3:9.2f} ms  {name}", flush=True)
