"""MED — BLIP's "mixture of encoder-decoder" BERT, single-stream variant.

Capability parity with the reference MED BertModel (reference med.py:586-821):
word + position embeddings (no token-type table), post-LN layers with
self-attention -> optional cross-attention over image tokens -> FFN, additive
(1 - mask) * -10000 masking, modes 'text' / 'multimodal'.

TPU-first structure: one ``nn.scan`` over stacked layer parameters, static text
length (the reference pads to the longest caption in each batch — here a fixed
bucket + mask gives identical CLS outputs with a single compiled program).

The reference's decoder path (med.py:179-190, 647-666) is covered too:
``causal=True`` for teacher-forced training, and an incremental KV-cache mode
(``precompute_image_kv`` / ``decode_cache``) used by models/blip_decoder.py for
one-token-per-step caption generation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from candidate_reranking_cir_tpu.config import TextEncoderConfig
from candidate_reranking_cir_tpu.models.layers import (
    Dense,
    LayerNorm,
    MultiHeadAttention,
    exact_gelu,
)
from candidate_reranking_cir_tpu.ops.attention import make_additive_mask


class BertEmbeddings(nn.Module):
    """Word + absolute position embeddings, LayerNorm, dropout (med.py:67-109)."""

    cfg: TextEncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, *, position=None, deterministic: bool = True):
        """position=None embeds a full [.., L] buffer at positions 0..L-1;
        an integer/traced ``position`` embeds a single-step [.., 1] token at
        that absolute position (incremental decoding)."""
        cfg = self.cfg
        word = self.param(
            "word_embeddings", nn.initializers.normal(cfg.initializer_range),
            (cfg.vocab_size, cfg.hidden_size), jnp.float32)
        pos = self.param(
            "position_embeddings", nn.initializers.normal(cfg.initializer_range),
            (cfg.max_position_embeddings, cfg.hidden_size), jnp.float32)
        if position is None:
            seq_len = input_ids.shape[-1]
            x = jnp.take(word, input_ids, axis=0) + pos[:seq_len]
        else:
            x = (jnp.take(word, input_ids, axis=0)
                 + jax.lax.dynamic_slice_in_dim(pos, position, 1, axis=0))
        x = LayerNorm(cfg.layer_norm_eps, self.dtype, name="ln")(x.astype(self.dtype))
        return nn.Dropout(cfg.hidden_dropout)(x, deterministic=deterministic)


class BertSelfAttentionBlock(nn.Module):
    """Attention + output dense + residual + post-LN (med.py:243-332 shape)."""

    cfg: TextEncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, kv=None, bias=None, *, deterministic: bool = True,
                 kv_only: bool = False, precomputed_kv=None, cache=None,
                 cache_index=None):
        cfg = self.cfg
        attn = MultiHeadAttention(
            cfg.num_heads, cfg.head_dim, cfg.hidden_size, self.dtype,
            cfg.attention_dropout, fused=cfg.fused_attention,
            capture_attention=cfg.capture_attention,
            perturb_attention=cfg.perturb_attention, name="attn")
        if kv_only:
            return attn(x, kv, kv_only=True)
        new_cache = None
        if cache is not None:
            ctx, new_cache = attn(x, kv, bias, deterministic=deterministic,
                                  cache=cache, cache_index=cache_index)
        else:
            ctx = attn(x, kv, bias, deterministic=deterministic,
                       precomputed_kv=precomputed_kv)
        ctx = nn.Dropout(cfg.hidden_dropout)(ctx, deterministic=deterministic)
        out = LayerNorm(cfg.layer_norm_eps, self.dtype, name="ln")(ctx + x)
        if new_cache is not None:
            return out, new_cache
        return out


class BertFFN(nn.Module):
    """Intermediate GELU dense -> output dense -> residual post-LN."""

    cfg: TextEncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        cfg = self.cfg
        h = Dense(cfg.intermediate_size, self.dtype, name="intermediate")(x)
        h = exact_gelu(h)
        h = Dense(cfg.hidden_size, self.dtype, name="output")(h)
        h = nn.Dropout(cfg.hidden_dropout)(h, deterministic=deterministic)
        return LayerNorm(cfg.layer_norm_eps, self.dtype, name="ln")(h + x)


class MedLayer(nn.Module):
    """One MED layer; cross-attention is applied only in 'multimodal' mode
    (med.py:373-385). Scan-compatible signature.

    Incremental decoding (reference med.py:179-190's KV-cache capability):
    - precompute_img_kv=True: only project this layer's cross-attn K/V of
      ``image_kv`` and emit them as the scan output (paid once per decode).
    - step_cache=(k_self, v_self, k_img, v_img): ``x`` is one [B, 1, D]
      token; self-attn K/V are appended into the cache at ``cache_index``
      and cross-attn reuses the precomputed image K/V. Emits the updated
      self cache.
    """

    cfg: TextEncoderConfig
    multimodal: bool
    dtype: jnp.dtype = jnp.float32
    # reference-image-major fusion: x carries query_group queries per image
    # ([G*Q, L, D] text vs [G, M, W] image features) and the cross-attention
    # folds the Q queries into the row axis, so each layer's image K/V
    # projections — the dominant FLOP term of the fusion forward — are
    # computed once per IMAGE instead of once per query. Identical math:
    # every query still attends over its own reference image's tokens.
    query_group: int = 1

    @nn.compact
    def __call__(self, x, text_bias, image_kv, image_bias,
                 deterministic: bool = True, step_cache=None,
                 cache_index=None, precompute_img_kv: bool = False):
        self_attn = BertSelfAttentionBlock(self.cfg, self.dtype,
                                           name="self_attn")
        cross_attn = (BertSelfAttentionBlock(self.cfg, self.dtype,
                                             name="cross_attn")
                      if self.multimodal else None)
        ffn = BertFFN(self.cfg, self.dtype, name="ffn")

        if precompute_img_kv:
            return x, cross_attn(x, image_kv, kv_only=True)

        if step_cache is not None:
            k_self, v_self, k_img, v_img = step_cache
            x, new_self = self_attn(x, None, text_bias,
                                    deterministic=deterministic,
                                    cache=(k_self, v_self),
                                    cache_index=cache_index)
            if cross_attn is not None:
                x = cross_attn(x, None, image_bias,
                               deterministic=deterministic,
                               precomputed_kv=(k_img, v_img))
            x = ffn(x, deterministic=deterministic)
            return x, new_self

        x = self_attn(x, None, text_bias, deterministic=deterministic)
        if cross_attn is not None:
            if self.query_group > 1:
                b, l, d = x.shape
                g = b // self.query_group
                # [G*Q, L, D] -> [G, Q*L, D] is a free reshape (contiguous);
                # residual + post-LN inside the block are elementwise, so
                # running them on the folded view is exact
                xg = x.reshape(g, self.query_group * l, d)
                xg = cross_attn(xg, image_kv, image_bias,
                                deterministic=deterministic)
                x = xg.reshape(b, l, d)
            else:
                x = cross_attn(x, image_kv, image_bias,
                               deterministic=deterministic)
        x = ffn(x, deterministic=deterministic)
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
                 deterministic: bool = True, decode_cache=None,
                 cache_index=None, precompute_image_kv: bool = False,
                 mode: str | None = None, query_group: int = 1):
        """``mode`` overrides the construction-time mode per call (the
        reference's BertModel takes mode at forward time, med.py:373-385);
        'text' skips the cross-attention blocks, leaving their parameters
        untouched — used by BlipBase's text mode (blip.py:57-61).

        Incremental decoding (reference med.py:179-190, 647-666):

        precompute_image_kv=True — project every layer's cross-attention K/V
        of ``image_embeds`` once; returns (k_img, v_img) stacked
        [n_layers, B, M, H, D]. Paid once per decode instead of per token.

        decode_cache=(k_self, v_self, k_img, v_img) — one-token step:
        input_ids is [B, 1] at absolute position ``cache_index``;
        attention_mask is the full [B, T] cache-validity mask (causality is
        implicit — future positions are still 0). Returns
        (hidden [B, 1, D], (new_k_self, new_v_self)).
        """
        cfg = self.cfg
        multimodal = (mode if mode is not None else self.mode) == "multimodal"

        def make_stack():
            layer = MedLayer
            if cfg.remat:
                from candidate_reranking_cir_tpu.models.layers import (
                    resolve_remat_policy,
                )

                # deterministic / precompute_img_kv are static python bools
                # (args 5 and 8 counting the module instance as arg 0)
                layer = nn.remat(layer, static_argnums=(5, 8),
                                 prevent_cse=False,
                                 policy=resolve_remat_policy(cfg.remat_policy))
            return nn.scan(
                layer,
                # intermediates/perturbations get a leading layer axis so the
                # capture_attention / perturb_attention hooks work through
                # the scanned stack (sowed probs stack to [n_layers, ...])
                variable_axes={"params": 0, "intermediates": 0,
                               "perturbations": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast,
                         nn.broadcast, 0, nn.broadcast, nn.broadcast),
                length=cfg.num_layers,
            )(cfg=cfg, multimodal=multimodal, dtype=self.dtype,
              query_group=query_group, name="layers")

        if precompute_image_kv:
            assert multimodal and image_embeds is not None
            dummy = jnp.zeros((), self.dtype)
            _, img_kv = make_stack()(
                dummy, None, image_embeds.astype(self.dtype), None,
                deterministic, None, None, True)
            return img_kv

        if decode_cache is not None:
            k_self, v_self, k_img, v_img = decode_cache
            x = BertEmbeddings(cfg, self.dtype, name="embeddings")(
                input_ids, position=cache_index, deterministic=deterministic)
            text_bias = make_additive_mask(attention_mask, jnp.float32)
            x, new_self = make_stack()(
                x, text_bias, None, None, deterministic,
                (k_self, v_self, k_img, v_img), cache_index, False)
            return x, new_self

        x = BertEmbeddings(cfg, self.dtype, name="embeddings")(
            input_ids, deterministic=deterministic)

        text_bias = make_additive_mask(attention_mask, jnp.float32)
        if causal:
            length = input_ids.shape[-1]
            tri = jnp.tril(jnp.ones((length, length), jnp.float32))
            text_bias = text_bias + (1.0 - tri)[None, None] * -10000.0
        if multimodal:
            assert image_embeds is not None, "multimodal mode needs image_embeds"
            if query_group > 1 and (cfg.capture_attention
                                    or cfg.perturb_attention):
                # introspection contract: sowed attn_probs must keep the
                # per-query [B, H, L, M] layout, which the image-major fold
                # would silently change to [G, H, Q*L, M] — unfold by
                # repeating each image's features across its queries (the
                # fold is a perf optimization only; introspection runs don't
                # care about the duplicated K/V projections)
                image_embeds = jnp.repeat(image_embeds, query_group, axis=0)
                query_group = 1
            if query_group > 1:
                assert input_ids.shape[0] == \
                    image_embeds.shape[0] * query_group, (
                        "query_group fusion needs input_ids [G*Q, L] with "
                        "image_embeds [G, M, W]")
            image_embeds = image_embeds.astype(self.dtype)
            if image_mask is None:
                image_bias = None  # image tokens are never padded
            else:
                image_bias = make_additive_mask(image_mask, jnp.float32)
        else:
            image_embeds, image_bias = None, None

        x, _ = make_stack()(x, text_bias, image_embeds, image_bias,
                            deterministic, None, None, False)
        return x
