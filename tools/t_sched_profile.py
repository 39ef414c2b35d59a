"""Break down rerank_candidate_major wall-clock on the TPU: z_t production,
per-bucket scan programs, host-side scheduling, fetches."""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from candidate_reranking_cir_tpu.config import (
    RerankerModelConfig,
    RetrievalModelConfig,
)
from candidate_reranking_cir_tpu.models.blip_reranker import RerankerModel
from candidate_reranking_cir_tpu.models.blip_retrieval import RetrievalModel
from bench import _BenchTokenizer, rand_params

s1_cfg = RetrievalModelConfig()
s2_cfg = RerankerModelConfig()
s1 = RetrievalModel(s1_cfg, dtype=jnp.bfloat16)
s2 = RerankerModel(s2_cfg, dtype=jnp.bfloat16)
L = s2_cfg.text_len
M = s2_cfg.vit.num_tokens
W = s2_cfg.text.encoder_width

n_idx, n_q, k = 574, 1044, 50
rng = np.random.default_rng(0)
index_feats = jax.random.normal(jax.random.key(9), (n_idx, M, W),
                                jnp.bfloat16) * 0.05

ids = jnp.zeros((2, L), jnp.int32)
msk = jnp.ones((2, L), jnp.int32)
z0 = jnp.zeros((2, L, s2_cfg.text.hidden_size), jnp.bfloat16)
imgs = jnp.zeros((2, s2_cfg.vit.image_size, s2_cfg.vit.image_size, 3))
s1_params = rand_params(
    jax.eval_shape(lambda: s1.init(jax.random.key(0), imgs, ids, msk)),
    jax.random.key(1))
s2_params = rand_params(
    jax.eval_shape(lambda: s2.init(jax.random.key(0), imgs, ids, msk, z0)),
    jax.random.key(2))

tok = _BenchTokenizer()
ids_all, mask_all = tok.encode(["x"] * n_q, L)
ids_dev, mask_dev = jnp.asarray(ids_all), jnp.asarray(mask_all)
ref_idx = jnp.asarray(rng.integers(0, n_idx, n_q), jnp.int32)

# ---- z_t production --------------------------------------------------------
zt_batch = 32
n_zt = (n_q + zt_batch - 1) // zt_batch
zt_rows = np.arange(n_zt * zt_batch, dtype=np.int32).reshape(n_zt, zt_batch)
zt_rows = np.minimum(zt_rows, n_q - 1)


@jax.jit
def produce_all_zt(s1p, feats, ids, mask, refr, rows):
    def body(c, r):
        refs = jnp.take(feats, jnp.take(refr, r), axis=0)
        z = s1.apply(s1p, refs, jnp.take(ids, r, axis=0),
                     jnp.take(mask, r, axis=0), return_raw=True,
                     method=RetrievalModel.fuse)
        return c, z
    _, zs = jax.lax.scan(body, 0.0, rows)
    return zs.reshape(-1, *zs.shape[2:])


for tag in ("compile", "run"):
    t0 = time.perf_counter()
    zt_all = produce_all_zt(s1_params, index_feats, ids_dev, mask_dev,
                            ref_idx, jnp.asarray(zt_rows))
    zt_all = zt_all[:n_q]
    _ = float(zt_all[0, 0, 0].astype(jnp.float32))
    print(f"zt {tag}: {time.perf_counter()-t0:.2f}s", flush=True)

# ---- bucket scan (main shape) ---------------------------------------------
A, B, N_CALLS = 16, 32, 108
rows = np.asarray(rng.integers(0, n_q, (N_CALLS, A, B)), np.int32)
cands = np.asarray(rng.integers(0, n_idx, (N_CALLS, A)), np.int32)


@jax.jit
def bucket_scan(s2p, zt, ids, mask, feats, rows, cands):
    a, bb = rows.shape[1], rows.shape[2]

    def body(c, xs):
        r, cc = xs
        flat = r.reshape(-1)
        z = jnp.take(zt, flat, axis=0).reshape(a, bb, *zt.shape[1:])
        i = jnp.take(ids, flat, axis=0).reshape(a, bb, -1)
        m = jnp.take(mask, flat, axis=0).reshape(a, bb, -1)
        cf = jnp.take(feats, cc, axis=0)
        s = s2.apply(s2p, z, i, m, cf, method=RerankerModel.score_grid)
        return c, s

    _, scores = jax.lax.scan(body, 0.0, (rows, cands))
    return scores


for tag in ("compile", "run", "run2"):
    t0 = time.perf_counter()
    sc = bucket_scan(s2_params, zt_all, ids_dev, mask_dev, index_feats,
                     jnp.asarray(rows), jnp.asarray(cands))
    sc = np.asarray(sc)
    dt = time.perf_counter() - t0
    print(f"bucket_scan[{N_CALLS}x{A}x{B}] {tag}: {dt:.2f}s "
          f"= {N_CALLS*A*B/dt:,.0f} pairs/s", flush=True)
