"""MED — BLIP's "mixture of encoder-decoder" BERT, single-stream variant.

Capability parity with the reference MED BertModel (reference med.py:586-821):
word + position embeddings (no token-type table), post-LN layers with
self-attention -> optional cross-attention over image tokens -> FFN, additive
(1 - mask) * -10000 masking, modes 'text' / 'multimodal'.

TPU-first structure: one ``nn.scan`` over stacked layer parameters, static text
length (the reference pads to the longest caption in each batch — here a fixed
bucket + mask gives identical CLS outputs with a single compiled program).

The decoder/causal/KV-cache path of the reference (med.py:179-190, 647-666) is
unused by CIR and intentionally omitted; captioning would be a separate module.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from candidate_reranking_cir_tpu.config import TextEncoderConfig
from candidate_reranking_cir_tpu.models.layers import (
    Dense,
    LayerNorm,
    MultiHeadAttention,
)
from candidate_reranking_cir_tpu.ops.attention import make_additive_mask


class BertEmbeddings(nn.Module):
    """Word + absolute position embeddings, LayerNorm, dropout (med.py:67-109)."""

    cfg: TextEncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, *, deterministic: bool = True):
        cfg = self.cfg
        word = self.param(
            "word_embeddings", nn.initializers.normal(cfg.initializer_range),
            (cfg.vocab_size, cfg.hidden_size), jnp.float32)
        pos = self.param(
            "position_embeddings", nn.initializers.normal(cfg.initializer_range),
            (cfg.max_position_embeddings, cfg.hidden_size), jnp.float32)
        seq_len = input_ids.shape[-1]
        x = jnp.take(word, input_ids, axis=0) + pos[:seq_len]
        x = LayerNorm(cfg.layer_norm_eps, self.dtype, name="ln")(x.astype(self.dtype))
        return nn.Dropout(cfg.hidden_dropout)(x, deterministic=deterministic)


class BertSelfAttentionBlock(nn.Module):
    """Attention + output dense + residual + post-LN (med.py:243-332 shape)."""

    cfg: TextEncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, kv=None, bias=None, *, deterministic: bool = True):
        cfg = self.cfg
        ctx = MultiHeadAttention(
            cfg.num_heads, cfg.head_dim, cfg.hidden_size, self.dtype,
            cfg.attention_dropout, fused=cfg.fused_attention, name="attn")(
                x, kv, bias, deterministic=deterministic)
        ctx = nn.Dropout(cfg.hidden_dropout)(ctx, deterministic=deterministic)
        return LayerNorm(cfg.layer_norm_eps, self.dtype, name="ln")(ctx + x)


class BertFFN(nn.Module):
    """Intermediate GELU dense -> output dense -> residual post-LN."""

    cfg: TextEncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        cfg = self.cfg
        h = Dense(cfg.intermediate_size, self.dtype, name="intermediate")(x)
        h = nn.gelu(h, approximate=False)
        h = Dense(cfg.hidden_size, self.dtype, name="output")(h)
        h = nn.Dropout(cfg.hidden_dropout)(h, deterministic=deterministic)
        return LayerNorm(cfg.layer_norm_eps, self.dtype, name="ln")(h + x)


class MedLayer(nn.Module):
    """One MED layer; cross-attention is applied only in 'multimodal' mode
    (med.py:373-385). Scan-compatible signature."""

    cfg: TextEncoderConfig
    multimodal: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, text_bias, image_kv, image_bias,
                 deterministic: bool = True):
        x = BertSelfAttentionBlock(self.cfg, self.dtype, name="self_attn")(
            x, None, text_bias, deterministic=deterministic)
        if self.multimodal:
            x = BertSelfAttentionBlock(self.cfg, self.dtype, name="cross_attn")(
                x, image_kv, image_bias, deterministic=deterministic)
        x = BertFFN(self.cfg, self.dtype, name="ffn")(x, deterministic=deterministic)
        return x, None


class TextEncoder(nn.Module):
    """Single-stream MED encoder.

    mode='text': pure text self-attention stack.
    mode='multimodal': each layer cross-attends to ``image_embeds`` [B, M, W].
    causal=True adds a lower-triangular mask on top of the padding mask —
    the reference's decoder mode (med.py:739-758); used by the captioner.

    Returns last_hidden_state [B, L, D].
    """

    cfg: TextEncoderConfig
    mode: str = "multimodal"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask, image_embeds=None,
                 image_mask=None, *, causal: bool = False,
                 deterministic: bool = True):
        cfg = self.cfg
        multimodal = self.mode == "multimodal"
        x = BertEmbeddings(cfg, self.dtype, name="embeddings")(
            input_ids, deterministic=deterministic)

        text_bias = make_additive_mask(attention_mask, jnp.float32)
        if causal:
            length = input_ids.shape[-1]
            tri = jnp.tril(jnp.ones((length, length), jnp.float32))
            text_bias = text_bias + (1.0 - tri)[None, None] * -10000.0
        if multimodal:
            assert image_embeds is not None, "multimodal mode needs image_embeds"
            image_embeds = image_embeds.astype(self.dtype)
            if image_mask is None:
                image_bias = None  # image tokens are never padded
            else:
                image_bias = make_additive_mask(image_mask, jnp.float32)
        else:
            image_embeds, image_bias = None, None

        layer = MedLayer
        if cfg.remat:
            # deterministic is a static python bool (arg 5 incl. module)
            layer = nn.remat(layer, static_argnums=(5,), prevent_cse=False)
        stack = nn.scan(
            layer,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(nn.broadcast, nn.broadcast, nn.broadcast, nn.broadcast),
            length=cfg.num_layers,
        )(cfg=cfg, multimodal=multimodal, dtype=self.dtype, name="layers")
        x, _ = stack(x, text_bias, image_embeds, image_bias, deterministic)
        return x
