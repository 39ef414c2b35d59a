"""pairs_per_call sweep for the L-bucketed candidate-major scheduler on the
bench workload (CIRR-val statistics, realistic caption lengths)."""
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
from candidate_reranking_cir_tpu.retrieval.rerank import rerank_candidate_major
from bench import _BenchTokenizer, caption_lengths, measure_rtt, rand_params

s1_cfg = RetrievalModelConfig()
s2_cfg = RerankerModelConfig()
s1 = RetrievalModel(s1_cfg, dtype=jnp.bfloat16)
s2 = RerankerModel(s2_cfg, dtype=jnp.bfloat16)
L = s2_cfg.text_len
M = s2_cfg.vit.num_tokens
W = s2_cfg.text.encoder_width

n_idx, n_q, k = 574, 1044, 50
rng = np.random.default_rng(0)
index_names = [f"im{i}" for i in range(n_idx)]
index_feats = jax.random.normal(jax.random.key(9), (n_idx, M, W),
                                jnp.bfloat16) * 0.05
topk = np.empty((n_q, k), object)
groups, refs = [], []
for q in range(n_q):
    sel = rng.choice(n_idx, size=k + 6, replace=False)
    topk[q] = [index_names[i] for i in sel[:k]]
    refs.append(index_names[sel[k]])
    groups.append([index_names[i] for i in sel[k:]])

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

tok = _BenchTokenizer(caption_lengths(n_q, L))
kw = dict(captions=[f"caption {q}" for q in range(n_q)],
          reference_names=refs, topk_names=topk, index_feats=index_feats,
          index_names=index_names, text_len=L, group_members=groups)
n_pairs = n_q * (k + 5)
rtt = measure_rtt()

def timed(label, **overrides):
    """Warm-up (compiles), then one timed end-to-end run, RTT subtracted —
    the single timing recipe every sweep below shares."""
    rerank_candidate_major(s1, s1_params, s2, s2_params, tok, **overrides,
                           **kw)
    t0 = time.perf_counter()
    rerank_candidate_major(s1, s1_params, s2, s2_params, tok, **overrides,
                           **kw)
    dt = max(time.perf_counter() - t0 - rtt, 1e-9)
    print(f"{label}: {n_pairs/dt:,.0f} t/s", flush=True)


numeric = [a for a in sys.argv[1:] if a.isdigit()]
flagged = any(a.startswith("--") for a in sys.argv[1:])
for ppc in (int(a) for a in (numeric or
                             ([] if flagged else ["384", "512", "768"]))):
    timed(f"ppc={ppc}", pairs_per_call=ppc)

if "--qbuckets" in sys.argv:
    for qb in [(2, 4, 8, 16, 32, 64, 128), (4, 8, 16, 32, 64),
               (4, 8, 16, 32)]:
        timed(f"q_buckets={qb}", q_buckets=qb)

if "--ppc2" in sys.argv:  # re-tune call size at the tuned q_buckets default
    for ppc in (128, 192, 320):
        timed(f"ppc={ppc} (tuned buckets)", pairs_per_call=ppc)
