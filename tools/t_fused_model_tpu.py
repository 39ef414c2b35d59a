# Model-level check on REAL TPU: fused_attention=True == default, compiled.
import sys, dataclasses
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from candidate_reranking_cir_tpu.config import RerankerModelConfig, TextEncoderConfig, ViTConfig
from candidate_reranking_cir_tpu.models.blip_reranker import RerankerModel

text = TextEncoderConfig(num_layers=2)
cfg = RerankerModelConfig(vit=ViTConfig(num_layers=1), text=text)
cfg_f = dataclasses.replace(cfg, text=dataclasses.replace(text, fused_attention=True))
bf = jnp.bfloat16
rng = np.random.default_rng(0)
Q, K, L, M = 2, 4, cfg.text_len, cfg.vit.num_tokens
z = jnp.asarray(rng.normal(size=(Q, L, 768))*0.02, jnp.float32)
ids = jnp.asarray(rng.integers(10, 20000, size=(Q, L)), jnp.int32)
mask = jnp.ones((Q, L), jnp.int32)
mask = mask.at[1, 30:].set(0)
cand = jnp.asarray(rng.normal(size=(Q, K, M, 768))*0.02, bf)

m = RerankerModel(cfg, dtype=bf)
m_f = RerankerModel(cfg_f, dtype=bf)
imgs = jnp.zeros((2, 384, 384, 3))
params = m.init(jax.random.key(0), imgs, ids, mask, z)
ref = np.asarray(m.apply(params, z, ids, mask, cand, method=RerankerModel.score_per_query))
out = np.asarray(m_f.apply(params, z, ids, mask, cand, method=RerankerModel.score_per_query))
err = np.abs(ref - out).max()
print(f"fused vs default on TPU: max abs err {err:.6f} {'OK' if err < 0.05 else 'FAIL'}")
