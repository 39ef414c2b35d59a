"""Stage-II model: dual-encoder candidate re-ranker.

Capability parity with the reference BLIP_NLVR (blip_stage2.py:19-136): ViT image
encoder (drop_path 0.1), dual-stream text/z_t encoder over candidate image tokens,
and a cls head Linear(2D -> D) -> ReLU -> Linear(D -> 2) whose channel 0 is the
re-rank score (blip_stage2.py:96-99).

TPU-first: both scoring entry points are single batched jit programs over a
(query x candidate) pair grid — no Python loop over queries:

- ``score_shared``     [Q] queries x one shared [C] candidate set -> [Q, C]
                       (training's in-batch B x B contrast; candidate K/V computed
                       once per candidate, not per pair)
- ``score_per_query``  [Q] queries each with their own [K] candidates -> [Q, K]
                       (top-K re-rank evaluation, replacing the reference's
                       bs=1-per-query loop at validate_stage2.py:222-254)
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from candidate_reranking_cir_tpu.config import RerankerModelConfig
from candidate_reranking_cir_tpu.models.dual_encoder import DualStreamEncoder
from candidate_reranking_cir_tpu.models.layers import Dense
from candidate_reranking_cir_tpu.models.vit import VisionTransformer


class RerankerModel(nn.Module):
    cfg: RerankerModelConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.visual_encoder = VisionTransformer(self.cfg.vit, self.dtype)
        # one parameter tree; shared/per-query candidate layout is a call-time
        # static flag, not a separate module
        self.text_encoder = DualStreamEncoder(self.cfg.text, dtype=self.dtype)
        self.cls_dense1 = Dense(self.cfg.text.hidden_size, self.dtype)
        self.cls_dense2 = Dense(2, self.dtype)

    def __call__(self, images, input_ids, attention_mask, z_t, *,
                 deterministic: bool = True):
        """Init/compile convenience: embed images, score the B x B pair grid."""
        feats = self.embed_images(images, deterministic=deterministic)
        return self.score_shared(z_t, input_ids, attention_mask, feats,
                                 deterministic=deterministic)

    def embed_images(self, images, *, deterministic: bool = True):
        return self.visual_encoder(images, deterministic=deterministic)

    def _cls_scores(self, cls_pair):
        h = self.cls_dense1(cls_pair)
        h = nn.relu(h)
        logits = self.cls_dense2(h)          # [..., 2]
        return logits[..., 0].astype(jnp.float32)

    def score_shared(self, z_t, input_ids, attention_mask, cand_feats, *,
                     deterministic: bool = True):
        """[Q, L, D] x [C, M, W] -> [Q, C] scores (shared candidate set)."""
        cls_pair = self.text_encoder(
            input_ids, attention_mask, z_t, cand_feats,
            shared_candidates=True, deterministic=deterministic)
        return self._cls_scores(cls_pair)

    def score_per_query(self, z_t, input_ids, attention_mask, cand_feats, *,
                        deterministic: bool = True):
        """[Q, L, D] x [Q, K, M, W] -> [Q, K] scores (per-query candidates)."""
        cls_pair = self.text_encoder(
            input_ids, attention_mask, z_t, cand_feats,
            shared_candidates=False, deterministic=deterministic)
        return self._cls_scores(cls_pair)

    def score_grid(self, z_t, input_ids, attention_mask, cand_feats, *,
                   deterministic: bool = True):
        """Candidate-major grid: [A, B, L, D] x [A, M, W] -> [A, B] scores.

        Axis 0 indexes candidates, axis 1 the queries scored against each
        candidate; per-pair text ids/mask/z_t, per-candidate image features.
        Candidate K/V projections are paid once per candidate and reused by
        all B of its queries — the evaluation dual of score_shared's O(B)
        projection saving (the reference recomputes K/V per pair inside its
        per-query loop, blip_stage2.py:101-136)."""
        cls_pair = self.text_encoder(
            input_ids, attention_mask, z_t, cand_feats, layout="cand_major",
            deterministic=deterministic)
        return self._cls_scores(cls_pair)

    def score_indexed(self, z_t, input_ids, attention_mask, unique_cand,
                      pair_map, *, deterministic: bool = True):
        """[Q, L, D] x unique [U, M, W] + pair_map [Q, K] -> [Q, K] scores.

        Dedup evaluation path: candidate K/V projected once per unique
        candidate in the chunk, gathered per (query, candidate) pair. Exactly
        equal to score_per_query(z_t, ..., unique_cand[pair_map])."""
        cls_pair = self.text_encoder(
            input_ids, attention_mask, z_t, unique_cand, pair_map=pair_map,
            deterministic=deterministic)
        return self._cls_scores(cls_pair)
