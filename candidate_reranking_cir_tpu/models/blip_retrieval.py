"""Stage-I model: BLIP retrieval for candidate filtering.

Capability parity with the reference BLIP_Retrieval (blip_stage1.py:15-93):
- ``embed_images``      ViT features [B, M, D] and/or normalized 256-d CLS proj
- ``fuse``              text + reference-image cross-attention -> fused features;
                        raw last_hidden_state (z_t) or normalized 256-d prediction
- ``contrastive_logits`` in-batch similarity matrix pred @ targets.T / temp

The in-batch contrastive product is kept separate from ``fuse`` so the training
step can all-gather target features across the mesh and form a *global* batch
contrast (see parallel/contrastive.py) — the TPU replacement for the reference's
single-GPU B x B logits (blip_stage1.py:91).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from candidate_reranking_cir_tpu.config import RetrievalModelConfig
from candidate_reranking_cir_tpu.models.layers import Dense
from candidate_reranking_cir_tpu.models.med import TextEncoder
from candidate_reranking_cir_tpu.models.vit import VisionTransformer


def l2_normalize(x, axis=-1, eps=1e-12):
    n = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axis,
                         keepdims=True))
    return (x.astype(jnp.float32) / jnp.maximum(n, eps)).astype(x.dtype)


class RetrievalModel(nn.Module):
    cfg: RetrievalModelConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.visual_encoder = VisionTransformer(self.cfg.vit, self.dtype)
        self.text_encoder = TextEncoder(self.cfg.text, "multimodal", self.dtype)
        self.vision_proj = Dense(self.cfg.embed_dim, self.dtype)
        self.text_proj = Dense(self.cfg.embed_dim, self.dtype)
        self.temp = self.param("temp", nn.initializers.constant(self.cfg.temp_init),
                               (), jnp.float32)

    def __call__(self, images, input_ids, attention_mask, *,
                 deterministic: bool = True):
        """Convenience forward (used for init/compile checks): embeds images,
        fuses with text, and contrasts — touching every parameter so a single
        init covers the whole model."""
        feats, pooled = self.embed_images(images, pool_and_normalize=True,
                                          deterministic=deterministic)
        pred = self.fuse(feats, input_ids, attention_mask,
                         deterministic=deterministic)
        return self.contrastive_logits(pred, pooled)

    def embed_images(self, images, *, pool_and_normalize: bool = False,
                     deterministic: bool = True):
        """[B, H, W, 3] -> raw token features [B, M, D]; optionally also the
        normalized 256-d projected CLS (reference img_embed, blip_stage1.py:48-64).
        """
        feats = self.visual_encoder(images, deterministic=deterministic)
        if not pool_and_normalize:
            return feats
        pooled = l2_normalize(self.vision_proj(feats[:, 0]))
        return feats, pooled

    def pool_image_features(self, feats):
        """Raw [B, M, D] -> normalized 256-d projected CLS."""
        return l2_normalize(self.vision_proj(feats[:, 0]))

    def fuse(self, ref_image_feats, input_ids, attention_mask, *,
             return_raw: bool = False, deterministic: bool = True,
             query_group: int = 1):
        """Text cross-attends to reference image tokens (blip_stage1.py:67-92).

        return_raw=True -> last_hidden_state z_t [B, L, D] (stage-II input);
        otherwise the normalized 256-d predicted feature [B, embed_dim].

        query_group>1: reference-image-major fusion — input_ids/attention_mask
        are [G*Q, L] (Q queries per image, image-contiguous) against
        ref_image_feats [G, M, D]; each layer's image K/V projections are
        computed once per image instead of once per query (identical math).
        """
        hidden = self.text_encoder(
            input_ids, attention_mask, ref_image_feats,
            deterministic=deterministic, query_group=query_group)
        if return_raw:
            return hidden
        return l2_normalize(self.text_proj(hidden[:, 0]))

    def contrastive_logits(self, predicted, targets):
        """pred [B, E] x targets [N, E] -> [B, N] similarity / temp, in fp32."""
        logits = jnp.einsum("be,ne->bn", predicted.astype(jnp.float32),
                            targets.astype(jnp.float32))
        return logits / self.temp
