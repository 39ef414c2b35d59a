# Capture a profiler trace of the stage-II train step; summarize op time.
import sys, glob, gzip, json, os
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

from candidate_reranking_cir_tpu.config import (
    RerankerModelConfig, RetrievalModelConfig, TextEncoderConfig,
    TrainConfig, vit_config)
from candidate_reranking_cir_tpu.models.blip_reranker import RerankerModel
from candidate_reranking_cir_tpu.models.blip_retrieval import RetrievalModel
from candidate_reranking_cir_tpu.runtime.optim import make_optimizer
from candidate_reranking_cir_tpu.runtime.train_steps import (
    TrainState, make_stage2_train_step)
from bench import caption_lengths
from candidate_reranking_cir_tpu.cli.common import (
    parse_text_buckets, text_bucket_slice)

fused_text = len(sys.argv) > 1 and sys.argv[1] == "fused"
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
    "ref_images": jnp.asarray(rng.normal(size=(b, im, im, 3)) * 0.3, jnp.float32),
    "target_images": jnp.asarray(rng.normal(size=(b, im, im, 3)) * 0.3, jnp.float32),
    "input_ids": jnp.asarray(ids_np),
    "attention_mask": jnp.asarray(mask_np),
}
s1_params = s1.init(jax.random.key(1), batch["ref_images"][:2],
                    batch["input_ids"][:2], batch["attention_mask"][:2])
z_dummy = jnp.zeros((2, ids_np.shape[1], s2_cfg.text.hidden_size))
s2_params = s2.init(jax.random.key(2), batch["target_images"][:2],
                    batch["input_ids"][:2], batch["attention_mask"][:2], z_dummy)
tx, _ = make_optimizer(TrainConfig(batch_size=b), s2_params, 100)
state = TrainState.create(s2_params, tx)
step = make_stage2_train_step(s1, s2, donate=True)
state, loss = step(state, s1_params, batch, jax.random.key(3, impl="rbg"))
float(loss)

os.system("rm -rf /tmp/jtrace_s2")
with jax.profiler.trace("/tmp/jtrace_s2"):
    for _ in range(2):
        state, loss = step(state, s1_params, batch, jax.random.key(4, impl="rbg"))
    float(loss)

files = glob.glob("/tmp/jtrace_s2/**/*.trace.json.gz", recursive=True)
print("trace files:", files)
for f in files:
    with gzip.open(f) as fh:
        data = json.load(fh)
    evs = [e for e in data.get("traceEvents", []) if e.get("ph") == "X" and e.get("dur")]
    # find device lanes
    pids = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    agg = {}
    for e in evs:
        lane = pids.get(e.get("pid"), "?")
        name = e["name"][:60]
        key = (lane, name)
        agg[key] = agg.get(key, 0) + e["dur"]
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:45]
    for (lane, name), dur in top:
        print(f"{dur/1e3:9.2f} ms  [{lane[:30]}] {name}")
