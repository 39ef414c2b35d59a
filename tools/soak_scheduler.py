"""Scheduler soak (not in the default suite — ~8 min on CPU): randomized
workloads through the candidate-major scheduler (auto L-buckets, random
pairs_per_call / q_buckets / zt_batch, optional int8 banks, skips, groups)
checked against the query-major oracle at full text width.

  python tools/soak_scheduler.py [seed]

Exits nonzero on any mismatch. Last run: 16/16 ok (seed 7).
"""
import sys
sys.path.insert(0, "/root/repo")
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from candidate_reranking_cir_tpu.config import (
    RerankerModelConfig, RetrievalModelConfig, TextEncoderConfig, ViTConfig)
from candidate_reranking_cir_tpu.models.blip_reranker import RerankerModel
from candidate_reranking_cir_tpu.models.blip_retrieval import RetrievalModel
from candidate_reranking_cir_tpu.models.tokenizer import (
    WordPieceTokenizer, build_test_vocab)
from candidate_reranking_cir_tpu.ops.quant import quantize_bank
from candidate_reranking_cir_tpu.retrieval.rerank import (
    rerank, rerank_candidate_major)

vit = ViTConfig(image_size=32, patch_size=8, hidden_size=24, num_layers=2,
                num_heads=4)
text = TextEncoderConfig(vocab_size=256, hidden_size=32, num_layers=3,
                         num_heads=4, intermediate_size=64, encoder_width=24,
                         hidden_dropout=0.0, attention_dropout=0.0,
                         merge_mlp_from=1)
s1 = RetrievalModel(RetrievalModelConfig(vit=vit, text=text, embed_dim=16,
                                         text_len=16))
s2 = RerankerModel(RerankerModelConfig(vit=vit, text=text, text_len=16))
imgs = np.zeros((2, 32, 32, 3), np.float32)
ids = np.ones((2, 16), np.int32)
s1p = s1.init(jax.random.key(0), imgs, ids, ids)
s2p = s2.init(jax.random.key(1), imgs, ids, ids,
              np.zeros((2, 16, 32), np.float32))
tok = WordPieceTokenizer(build_test_vocab())
tok.overflow = "truncate"

words = ["red", "dress", "blue", "dog", "a", "the", "same", "image", "shirt"]
rng = np.random.default_rng(int(sys.argv[1]) if len(sys.argv) > 1 else 0)
fails = 0
for trial in range(16):
    n_idx = int(rng.integers(8, 24))
    n_q = int(rng.integers(2, 12))
    k = int(rng.integers(1, min(6, n_idx - 6) + 1))
    do_groups = bool(rng.integers(0, 2))
    use_int8 = bool(rng.integers(0, 2))
    names = [f"im{i}" for i in range(n_idx)]
    feats = jnp.asarray(rng.normal(size=(n_idx, 17, 24)) * 0.1, jnp.float32)
    topk = np.empty((n_q, k), object)
    refs, groups = [], []
    for q in range(n_q):
        sel = rng.choice(n_idx, size=k + 6, replace=False)
        topk[q] = [names[i] for i in sel[:k]]
        refs.append(names[sel[k]])
        groups.append([names[i] for i in sel[k:]])
    skip = rng.random(n_q) < 0.25
    caps = [" ".join(rng.choice(words, size=rng.integers(1, 12)))
            for _ in range(n_q)]
    kw = dict(captions=caps, reference_names=refs, topk_names=topk,
              index_names=names, text_len=16, skip_mask=skip,
              group_members=groups if do_groups else None)
    qm = rerank(s1, s1p, s2, s2p, tok, index_feats=feats, q_batch=4, **kw)
    bank = quantize_bank(feats) if use_int8 else feats
    ppc = int(rng.choice([4, 8, 16, 32]))
    qb = tuple(sorted(rng.choice([2, 3, 4, 8, 16], size=2, replace=False)))
    cm = rerank_candidate_major(s1, s1p, s2, s2p, tok, index_feats=bank,
                                pairs_per_call=ppc, q_buckets=qb,
                                zt_batch=int(rng.choice([2, 4, 8])), **kw)
    tol = 0.05 if use_int8 else 3e-4
    ok = np.allclose(cm.logits, qm.logits, rtol=tol, atol=tol)
    if do_groups:
        ok &= np.allclose(cm.group_logits, qm.group_logits, rtol=tol,
                          atol=tol)
    status = "ok" if ok else "MISMATCH"
    if not ok:
        fails += 1
        diff = np.abs(cm.logits - qm.logits).max()
        print(f"trial {trial}: {status} maxdiff={diff:.5f} "
              f"(n_idx={n_idx} n_q={n_q} k={k} groups={do_groups} "
              f"int8={use_int8} ppc={ppc} qb={qb})", flush=True)
    else:
        print(f"trial {trial}: ok (int8={use_int8} qb={qb})", flush=True)
print(f"soak done: {16 - fails}/16 ok", flush=True)
sys.exit(1 if fails else 0)
