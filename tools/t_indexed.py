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
L, M, Dm, W = cfg.text_len, cfg.vit.num_tokens, cfg.text.hidden_size, cfg.text.encoder_width
Q, K = 16, 50

@jax.jit
def trivial(x): return x + 1.0
float(trivial(jnp.zeros(())))
t0=time.perf_counter()
for _ in range(5): float(trivial(jnp.zeros(())))
RTT=(time.perf_counter()-t0)/5

z = jnp.asarray(rng.normal(size=(Q, L, Dm))*0.02, jnp.float32)
ids = jnp.asarray(rng.integers(10, 20000, size=(Q, L)), jnp.int32)
mask = jnp.ones((Q, L), jnp.int32)

shapes = jax.eval_shape(lambda: model.init(
    jax.random.key(0), jnp.zeros((2, cfg.vit.image_size, cfg.vit.image_size, 3)),
    ids[:2], mask[:2], z[:2]))
leaves, td = jax.tree_util.tree_flatten(shapes)
keys = jax.random.split(jax.random.key(0), len(leaves))
params = jax.tree_util.tree_unflatten(td, [
    (jax.random.normal(kk, s.shape, s.dtype)*0.02 if jnp.issubdtype(s.dtype, jnp.floating)
     else jnp.zeros(s.shape, s.dtype)) for kk, s in zip(keys, leaves)])

ITERS = 6
def bench(name, U):
    unique = jnp.asarray(rng.normal(size=(U, M, W))*0.02, bf)
    pmap = jnp.asarray(rng.integers(0, U, size=(Q, K)), jnp.int32)
    @jax.jit
    def chain(params, z, ids, mask, unique, pmap):
        def body(c, _):
            out = model.apply(params, z + c, ids, mask, unique, pmap,
                              method=RerankerModel.score_indexed)
            return jnp.mean(out) * 1e-9, None
        c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=ITERS)
        return c
    float(chain(params, z, ids, mask, unique, pmap))
    t0=time.perf_counter(); float(chain(params, z, ids, mask, unique, pmap))
    t=(time.perf_counter()-t0-RTT)/ITERS
    print(f"{name:24s} {t*1e3:7.1f} ms -> {Q*K/t:7.1f} triplets/s", flush=True)

bench("indexed U=800 (100%)", 800)
bench("indexed U=512 (64%)", 512)
bench("indexed U=256 (32%)", 256)
