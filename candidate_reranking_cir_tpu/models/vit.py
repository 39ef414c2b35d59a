"""Vision Transformer (ViT-B/16, ViT-L/16) as a TPU-first Flax module.

Capability parity with the reference ViT (reference vit.py:113-194): timm-style
patch embedding, CLS token, learned absolute position embeddings, pre-LN blocks
(MHA + GELU MLP), per-layer linearly-increasing stochastic depth, final LayerNorm.

TPU-first differences from the reference implementation:
- patch embedding is a space-to-depth reshape + one dense matmul (identical math to
  the stride-16 conv, but lands directly on the MXU with no conv lowering),
- the 12 blocks run under a single ``nn.scan`` with stacked parameters (one
  compiled block body instead of 12 unrolled ones),
- optional ``jax.checkpoint`` rematerialization per block replaces fairscale's
  checkpoint_wrapper (reference vit.py:103-105).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from candidate_reranking_cir_tpu.config import ViTConfig
from candidate_reranking_cir_tpu.models.layers import (
    Dense,
    LayerNorm,
    Mlp,
    MultiHeadAttention,
)


class PatchEmbed(nn.Module):
    """[B, H, W, 3] image -> [B, H/P * W/P, D] patch tokens.

    Equivalent to the reference's timm PatchEmbed Conv2d(3, D, P, stride=P): each
    PxP patch is flattened (row-major, channel-last) and sent through one dense
    layer. The weight converter reshapes the conv kernel accordingly.
    """

    patch_size: int
    hidden_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        b, h, w, c = images.shape
        p = self.patch_size
        x = images.reshape(b, h // p, p, w // p, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, (h // p) * (w // p), p * p * c)
        return Dense(self.hidden_size, self.dtype, name="proj")(x.astype(self.dtype))


class ViTBlock(nn.Module):
    """Pre-LN transformer block (reference vit.py:89-110).

    Signature is scan-compatible: (carry, per-layer drop-path rate, deterministic)
    -> (carry, None).
    """

    cfg: ViTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, drop_path_rate, deterministic: bool = True):
        cfg = self.cfg
        h = LayerNorm(cfg.layer_norm_eps, self.dtype, name="norm1")(x)
        h = MultiHeadAttention(
            cfg.num_heads, cfg.head_dim, cfg.hidden_size, self.dtype,
            cfg.attention_dropout, fused=cfg.fused_attention,
            name="attn")(h, deterministic=deterministic)
        h = nn.Dropout(cfg.dropout)(h, deterministic=deterministic)
        x = x + _drop_path(self, h, drop_path_rate, deterministic)
        h = LayerNorm(cfg.layer_norm_eps, self.dtype, name="norm2")(x)
        h = Mlp(int(cfg.hidden_size * cfg.mlp_ratio), cfg.hidden_size, self.dtype,
                cfg.dropout, name="mlp")(h, deterministic=deterministic)
        x = x + _drop_path(self, h, drop_path_rate, deterministic)
        return x, None


def _drop_path(mod: nn.Module, x, rate, deterministic: bool):
    """Stochastic depth with a traced per-layer rate (so it can ride nn.scan)."""
    if deterministic:
        return x
    rng = mod.make_rng("dropout")
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    keep = jax.random.bernoulli(rng, 1.0 - rate, shape)
    return jnp.where(keep, x / jnp.maximum(1.0 - rate, 1e-6), 0.0).astype(x.dtype)


class VisionTransformer(nn.Module):
    """ViT encoder returning all token states [B, 1 + num_patches, D]."""

    cfg: ViTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images, *, deterministic: bool = True):
        cfg = self.cfg
        b = images.shape[0]
        x = PatchEmbed(cfg.patch_size, cfg.hidden_size, self.dtype,
                       name="patch_embed")(images)
        cls = self.param("cls_token", nn.initializers.normal(stddev=0.02),
                         (1, 1, cfg.hidden_size), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, cfg.hidden_size)), x],
            axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(stddev=0.02),
                         (1, cfg.num_tokens, cfg.hidden_size), jnp.float32)
        x = x + pos[:, : x.shape[1]].astype(self.dtype)
        x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)

        # linearly spaced stochastic-depth rates, scanned alongside the layers
        dpr = jnp.linspace(0.0, cfg.drop_path_rate, cfg.num_layers)

        block = ViTBlock
        if cfg.remat:
            from candidate_reranking_cir_tpu.models.layers import (
                resolve_remat_policy,
            )

            # flax passes the module as arg 0 to the wrapped fn: indices +1
            block = nn.remat(block, static_argnums=(3,), prevent_cse=False,
                             policy=resolve_remat_policy(cfg.remat_policy))
        stack = nn.scan(
            block,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(0, nn.broadcast),
            length=cfg.num_layers,
            unroll=cfg.scan_unroll,
        )(cfg=cfg, dtype=self.dtype, name="blocks")
        x, _ = stack(x, dpr, deterministic)

        return LayerNorm(cfg.layer_norm_eps, self.dtype, name="norm")(x)
