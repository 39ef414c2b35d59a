# Capture a profiler trace of one score_per_query call and summarize op time.
import sys, glob, gzip, json, os, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from candidate_reranking_cir_tpu.config import RerankerModelConfig
from candidate_reranking_cir_tpu.models.blip_reranker import RerankerModel

rng = np.random.default_rng(0)
bf = jnp.bfloat16
cfg = RerankerModelConfig()
model = RerankerModel(cfg, dtype=bf)
Q, K, L, M = 8, 50, cfg.text_len, cfg.vit.num_tokens
z = jnp.asarray(rng.normal(size=(Q, L, 768))*0.02, jnp.float32)
ids = jnp.asarray(rng.integers(10, 20000, size=(Q, L)), jnp.int32)
mask = jnp.ones((Q, L), jnp.int32)
cand = jnp.asarray(rng.normal(size=(Q, K, M, 768))*0.02, bf)

shapes = jax.eval_shape(lambda: model.init(
    jax.random.key(0), z, ids, mask, cand, method=RerankerModel.score_per_query))
leaves, td = jax.tree_util.tree_flatten(shapes)
keys = jax.random.split(jax.random.key(0), len(leaves))
params = jax.tree_util.tree_unflatten(td, [
    (jax.random.normal(k_, s.shape, s.dtype)*0.02 if jnp.issubdtype(s.dtype, jnp.floating)
     else jnp.zeros(s.shape, s.dtype)) for k_, s in zip(keys, leaves)])

@jax.jit
def score(params, z, ids, mask, cand):
    return model.apply(params, z, ids, mask, cand, method=RerankerModel.score_per_query)

float(jnp.sum(score(params, z, ids, mask, cand)))  # compile+warm

os.system("rm -rf /tmp/jtrace")
with jax.profiler.trace("/tmp/jtrace"):
    for _ in range(2):
        out = score(params, z, ids, mask, cand)
    float(jnp.sum(out))

files = glob.glob("/tmp/jtrace/**/*.trace.json.gz", recursive=True)
print("trace files:", files)
for f in files:
    with gzip.open(f) as fh:
        data = json.load(fh)
    evs = [e for e in data.get("traceEvents", []) if e.get("ph") == "X" and e.get("dur")]
    # aggregate by name prefix
    agg = {}
    for e in evs:
        name = e["name"].split(".")[0][:40]
        agg[name] = agg.get(name, 0) + e["dur"]
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:25]
    total = sum(agg.values())
    print(f"== {f} total {total/1e3:.1f} ms")
    for name, dur in top:
        print(f"  {name:42s} {dur/1e3:9.2f} ms")
