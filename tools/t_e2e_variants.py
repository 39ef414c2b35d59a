import time, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from candidate_reranking_cir_tpu.config import RerankerModelConfig
from candidate_reranking_cir_tpu.models.blip_reranker import RerankerModel

rng = np.random.default_rng(0)
bf = jnp.bfloat16
cfg = RerankerModelConfig()
model = RerankerModel(cfg, dtype=bf)
L = cfg.text_len; M = cfg.vit.num_tokens; Dm = cfg.text.hidden_size

@jax.jit
def trivial(x): return x + 1.0
float(trivial(jnp.zeros(())))
t0=time.perf_counter()
for _ in range(5): float(trivial(jnp.zeros(())))
RTT=(time.perf_counter()-t0)/5

def make_inputs(Q, K):
    z = jnp.asarray(rng.normal(size=(Q, L, Dm))*0.02, jnp.float32)
    ids = jnp.asarray(rng.integers(10, 20000, size=(Q, L)), jnp.int32)
    mask = jnp.ones((Q, L), jnp.int32)
    cand = jnp.asarray(rng.normal(size=(Q, K, M, cfg.text.encoder_width))*0.02, bf)
    return z, ids, mask, cand

shapes = jax.eval_shape(lambda: model.init(
    jax.random.key(0), *make_inputs(2, 2), method=RerankerModel.score_per_query))
leaves, td = jax.tree_util.tree_flatten(shapes)
keys = jax.random.split(jax.random.key(0), len(leaves))
params = jax.tree_util.tree_unflatten(td, [
    (jax.random.normal(kk, s.shape, s.dtype)*0.02 if jnp.issubdtype(s.dtype, jnp.floating)
     else jnp.zeros(s.shape, s.dtype)) for kk, s in zip(keys, leaves)])

ITERS = 8
def bench(Q, K):
    z, ids, mask, cand = make_inputs(Q, K)
    @jax.jit
    def chain(params, z, ids, mask, cand):
        def body(c, _):
            out = model.apply(params, z + c, ids, mask, cand,
                              method=RerankerModel.score_per_query)
            return jnp.mean(out) * 1e-9, None
        c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=ITERS)
        return c
    float(chain(params, z, ids, mask, cand))
    t0=time.perf_counter(); float(chain(params, z, ids, mask, cand))
    t=(time.perf_counter()-t0-RTT)/ITERS
    print(f"Q={Q} K={K}: {t*1e3:7.1f} ms -> {Q*K/t:7.1f} triplets/s", flush=True)

bench(8, 50)
bench(16, 50)
bench(32, 50)
