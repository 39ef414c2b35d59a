"""BLIP_Base — the reference's plain feature-extraction wrapper
(blip.py:23-74): ViT + MED BertModel with a forward-time ``mode`` switch.

Unused by the CIR pipelines in the reference but part of its BLIP family
surface; provided for completeness. Modes (blip.py:47-74):

- 'image':      ViT token features [B, M, W]
- 'text':       text-only MED last_hidden_state [B, L, D] (no cross-attn,
                plain [CLS] tokenization)
- 'multimodal': MED cross-attending over the image tokens, with the [ENC]
                token written over position 0 (blip.py:66) — callers encode
                with ``set_enc_token=True``.

One parameter tree serves all three modes (the reference's BertModel takes
mode at forward time); 'text' simply never reads the cross-attn weights.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from candidate_reranking_cir_tpu.config import RetrievalModelConfig
from candidate_reranking_cir_tpu.models.med import TextEncoder
from candidate_reranking_cir_tpu.models.vit import VisionTransformer


class BlipBase(nn.Module):
    cfg: RetrievalModelConfig  # vit/text dims; embed_dim unused
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.visual_encoder = VisionTransformer(self.cfg.vit, self.dtype)
        self.text_encoder = TextEncoder(self.cfg.text, "multimodal",
                                        self.dtype)

    def __call__(self, images, input_ids, attention_mask, *,
                 mode: str = "multimodal", deterministic: bool = True):
        assert mode in ("image", "text", "multimodal"), \
            "mode parameter must be image, text, or multimodal"  # blip.py:48
        if mode == "image":
            return self.visual_encoder(images, deterministic=deterministic)
        if mode == "text":
            return self.text_encoder(input_ids, attention_mask, mode="text",
                                     deterministic=deterministic)
        feats = self.visual_encoder(images, deterministic=deterministic)
        return self.text_encoder(input_ids, attention_mask, feats,
                                 deterministic=deterministic)
