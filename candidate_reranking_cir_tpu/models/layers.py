"""Shared Flax building blocks.

Parameters are stored in float32; compute runs in ``dtype`` (bfloat16 on TPU by
default) with float32 layer norms and softmax, mirroring the reference's AMP setup
(fp32 master weights + autocast) while keeping every matmul MXU-friendly.
"""
from __future__ import annotations

import os
from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from candidate_reranking_cir_tpu.ops.attention import dot_product_attention

Dtype = jnp.dtype

# A/B toggle for the folded cross-attention routing (commit 6aeb740): set
# CRC_NO_FOLDED_XATTN=1 to restore the pre-r4 eval routing (folded for long
# query rows only, never for short-query cross-attention). Measurement
# switch only — production always leaves this unset.
_NO_FOLDED_XATTN = os.environ.get("CRC_NO_FOLDED_XATTN", "") == "1"


def resolve_remat_policy(name: str):
    """Map a config remat_policy string to a jax checkpoint policy (None =
    recompute everything, the minimum-memory default)."""
    if not name:
        return None
    policies = {
        "dots": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
    }
    if name not in policies:
        raise ValueError(f"unknown remat_policy {name!r}; "
                         f"expected one of {('',) + tuple(policies)}")
    return policies[name]


def exact_gelu(x):
    """Erf-based GELU (the reference's nn.GELU / BERT activation).

    For float32 compute this is exactly ``nn.gelu(approximate=False)``
    (bitwise — the parity suites run fp32). For bf16 compute the erf is an
    elementwise rational approximation (Abramowitz & Stegun 7.1.26, max abs
    error 9.5e-7 in fp32 — ~4 orders of magnitude below bf16's own
    resolution; bf16-domain outputs differ from lax.erf by at most 1 ulp):
    unlike ``lax.erf``, whose TPU lowering refuses to fuse into the
    producing matmul's epilogue (a separate 0.56 ms VPU+HBM pass per ViT
    layer, tools/t_vit_pieces.py), the rational form is plain mul/add/exp
    and rides the epilogue like tanh-GELU does."""
    if x.dtype == jnp.float32:
        return nn.gelu(x, approximate=False)
    x32 = x.astype(jnp.float32)
    u = jnp.abs(x32) * 0.7071067811865476
    t = 1.0 / (1.0 + 0.3275911 * u)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                + t * (-1.453152027 + t * 1.061405429))))
    erf = jnp.sign(x32) * (1.0 - poly * jnp.exp(-u * u))
    return (0.5 * x32 * (1.0 + erf)).astype(x.dtype)


class LayerNorm(nn.Module):
    """Float32 LayerNorm that returns in the compute dtype."""

    eps: float = 1e-12
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(self.dtype)


class Dense(nn.Module):
    """Linear layer with fp32 params and dtype-cast compute."""

    features: int
    dtype: Dtype = jnp.float32
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.normal(stddev=0.02)

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features), jnp.float32)
        y = jnp.dot(x, kernel.astype(self.dtype),
                    preferred_element_type=jnp.float32).astype(self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class HeadProjection(nn.Module):
    """[..., D_in] -> [..., heads, head_dim] projection."""

    num_heads: int
    head_dim: int
    dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.normal(stddev=0.02)

    @nn.compact
    def __call__(self, x, *, flat: bool = False):
        """flat=True returns [..., H*D] from a single full-width matmul (no
        per-head relayout) — the layout the head-folded Pallas kernel
        consumes. The default einsum form lowers to a layout that feeds the
        unfolded [B, L, H, D] kernel without copies; its matmul N-dim is
        head_dim=64 (half the MXU lanes idle), which is why the folded
        layout is the fast path (tools/t_vit_hlo.py, t_folded_attn.py)."""
        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.num_heads, self.head_dim),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.num_heads, self.head_dim), jnp.float32)
        if flat:
            y = jnp.dot(x, kernel.astype(self.dtype).reshape(x.shape[-1], -1),
                        preferred_element_type=jnp.float32).astype(self.dtype)
            return y + bias.astype(self.dtype).reshape(-1)
        y = jnp.einsum("...d,dhk->...hk", x, kernel.astype(self.dtype),
                       preferred_element_type=jnp.float32).astype(self.dtype)
        return y + bias.astype(self.dtype)


class HeadOutProjection(nn.Module):
    """[..., heads, head_dim] -> [..., D_out] projection."""

    features: int
    dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.normal(stddev=0.02)

    num_heads: int | None = None  # required for flat=True input
    head_dim: int | None = None

    @nn.compact
    def __call__(self, x, *, flat: bool = False):
        if flat:
            h, d = self.num_heads, self.head_dim
        else:
            h, d = x.shape[-2:]
        kernel = self.param("kernel", self.kernel_init,
                            (h, d, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        if flat:
            # x [..., H*K] — same contraction as the einsum below with the
            # head axes pre-flattened (bitwise-identical MXU accumulation)
            y = jnp.dot(x, kernel.astype(self.dtype).reshape(h * d, -1),
                        preferred_element_type=jnp.float32).astype(self.dtype)
            return y + bias.astype(self.dtype)
        y = jnp.einsum("...hk,hkd->...d", x, kernel.astype(self.dtype),
                       preferred_element_type=jnp.float32).astype(self.dtype)
        return y + bias.astype(self.dtype)


class MultiHeadAttention(nn.Module):
    """Self- or cross-attention: q from ``x``, k/v from ``y`` (``y=x`` for self).

    Output is the raw multi-head context projected back to ``out_features`` —
    residual/LayerNorm policy is owned by the calling block (pre-LN for ViT,
    post-LN for BERT).
    """

    num_heads: int
    head_dim: int
    out_features: int
    dtype: Dtype = jnp.float32
    dropout_rate: float = 0.0
    fused: bool = False
    # record attention probabilities into the 'intermediates' collection —
    # the functional equivalent of the reference's save_attention_map hooks
    # (vit.py:58-81, med.py:129-133); read back via
    # model.apply(..., capture_intermediates=True) or mutable=['intermediates']
    capture_attention: bool = False
    # additionally register the probs as a flax perturbation — the functional
    # equivalent of the reference's save_attn_gradients backward hook
    # (vit.py:58-81): jax.grad w.r.t. the 'perturbations' collection yields
    # dLoss/dAttnProbs (see tests/test_attention_capture.py)
    perturb_attention: bool = False

    @nn.compact
    def __call__(self, x, y=None, bias=None, *, deterministic: bool = True,
                 kv_only: bool = False, precomputed_kv=None, cache=None,
                 cache_index=None):
        """Incremental-decoding extensions (all default-off):

        kv_only=True      project and return (k, v) of ``y`` only — used to
                          precompute image K/V once per decode instead of
                          per generated token (reference med.py:179-190).
        precomputed_kv    (k, v) to attend over, skipping the projections.
        cache             (k_cache, v_cache) [.., T, H, D]: ``x`` is a single
                          [.., 1, D] step; its K/V are written at cache_index
                          and attention runs over the updated cache. Returns
                          (out, (new_k_cache, new_v_cache)).
        """
        # caller intent, not object identity: every self-attention call site
        # passes y=None (med/vit/dual_encoder), so a caller handing in a
        # distinct array that happens to EQUAL x is still routed as cross —
        # the kernel-choice heuristic below keys off this flag
        is_cross = y is not None
        y = x if y is None else y
        # Head-folded fast path: projections stay in matmul-native
        # [..., H*D] layout end-to-end and the folded Pallas kernel slices
        # heads on the lane dim — avoids the [B, L, H, D] relayout the
        # unfolded kernel forces onto the q/k/v projections (measured: the
        # einsum projection lowers to an N=64 conv at 45% MFU vs 58%+ for
        # the full-width matmul; tools/t_vit_hlo.py, t_folded_attn.py).
        folded = False
        train_drop = not deterministic and self.dropout_rate > 0.0
        if (self.fused and not kv_only and cache is None
                and precomputed_kv is None
                and not self.capture_attention
                and not self.perturb_attention
                and (bias is None
                     or (bias.ndim >= 3 and bias.shape[-3] == 1))):
            if train_drop:
                # train path: in-kernel-dropout folded kernel where the
                # shapes qualify (kills the per-layer HBM mask + the
                # [B,L,H,D] relayout of the projected cross-attn K/V)
                from candidate_reranking_cir_tpu.ops.pallas_attention_train \
                    import eligible

                flat_batch = 1
                for s in x.shape[:-2]:
                    flat_batch *= int(s)
                folded = eligible(x.shape[-2], bias, y.shape[-2],
                                  batch=flat_batch)
            else:
                # eval path: pays off for long query rows (ViT's 577-token
                # self-attention: 852 -> 978 img/s) AND for cross-attention
                # to a long K/V sequence at ANY query width — there the
                # K/V projections are the dominant FLOP term and the flat
                # [D, H*D] matmul beats the einsum's N=64 conv lowering by
                # ~2x at the image-major fusion shapes (tools/t_xattn_forms:
                # [64,48]x577 0.58 vs 0.99 ms, [128,24]x577 1.37 vs 2.79 —
                # supersedes the r3 "-5% at MED text widths" query-major
                # measurement). Short self-attention (<=64-token MED rows)
                # stays unfolded: its cost is below timing resolution either
                # way and the lane slicing has no K/V win to amortize.
                folded = (x.shape[-2] >= 128
                          or (is_cross and y.shape[-2] >= 128
                              and not _NO_FOLDED_XATTN))
        if folded:
            from candidate_reranking_cir_tpu.ops.attention import (
                dot_product_attention_folded,
                dot_product_attention_folded_train,
            )

            qf = HeadProjection(self.num_heads, self.head_dim, self.dtype,
                                name="query")(x, flat=True)
            kf = HeadProjection(self.num_heads, self.head_dim, self.dtype,
                                name="key")(y, flat=True)
            vf = HeadProjection(self.num_heads, self.head_dim, self.dtype,
                                name="value")(y, flat=True)
            if train_drop:
                ctx = dot_product_attention_folded_train(
                    qf, kf, vf, bias, num_heads=self.num_heads,
                    dropout_rng=self.make_rng("dropout"),
                    dropout_rate=self.dropout_rate)
            else:
                ctx = dot_product_attention_folded(qf, kf, vf, bias,
                                                   num_heads=self.num_heads)
            return HeadOutProjection(self.out_features, self.dtype,
                                     num_heads=self.num_heads,
                                     head_dim=self.head_dim,
                                     name="out")(ctx, flat=True)
        if kv_only:
            k = HeadProjection(self.num_heads, self.head_dim, self.dtype,
                               name="key")(y)
            v = HeadProjection(self.num_heads, self.head_dim, self.dtype,
                               name="value")(y)
            return k, v
        q = HeadProjection(self.num_heads, self.head_dim, self.dtype, name="query")(x)
        new_cache = None
        if precomputed_kv is not None:
            k, v = precomputed_kv
        elif cache is not None:
            k_new = HeadProjection(self.num_heads, self.head_dim, self.dtype,
                                   name="key")(x)
            v_new = HeadProjection(self.num_heads, self.head_dim, self.dtype,
                                   name="value")(x)
            k = jax.lax.dynamic_update_slice_in_dim(
                cache[0], k_new.astype(cache[0].dtype), cache_index, axis=-3)
            v = jax.lax.dynamic_update_slice_in_dim(
                cache[1], v_new.astype(cache[1].dtype), cache_index, axis=-3)
            new_cache = (k, v)
        else:
            k = HeadProjection(self.num_heads, self.head_dim, self.dtype,
                               name="key")(y)
            v = HeadProjection(self.num_heads, self.head_dim, self.dtype,
                               name="value")(y)
        rng = None
        if self.dropout_rate > 0.0 and not deterministic:
            rng = self.make_rng("dropout")
        if self.capture_attention or self.perturb_attention:
            scores = jnp.einsum("...qhd,...khd->...hqk", q, k,
                                preferred_element_type=jnp.float32)
            scores = scores.astype(jnp.float32) * self.head_dim ** -0.5
            if bias is not None:
                scores = scores + bias.astype(jnp.float32)
            probs = jax.nn.softmax(scores, axis=-1)
            self.sow("intermediates", "attn_probs", probs)
            if self.perturb_attention:
                probs = self.perturb("attn_probs", probs)
            if rng is not None:
                # dropout applies AFTER the capture/perturb hooks, like the
                # reference's save_attention_map -> dropout order
                # (med.py:129-158)
                keep = jax.random.bernoulli(rng, 1.0 - self.dropout_rate,
                                            probs.shape)
                probs = probs * keep / (1.0 - self.dropout_rate)
            ctx = jnp.einsum("...hqk,...khd->...qhd", probs.astype(self.dtype),
                             v, preferred_element_type=jnp.float32
                             ).astype(self.dtype)
        else:
            ctx = dot_product_attention(
                q, k, v, bias,
                dropout_rate=self.dropout_rate, dropout_rng=rng,
                deterministic=deterministic, fused=self.fused)
        out = HeadOutProjection(self.out_features, self.dtype, name="out")(ctx)
        if new_cache is not None:
            return out, new_cache
        return out


class Mlp(nn.Module):
    """Transformer FFN: dense -> GELU -> dense (reference vit.py:23-41 shape)."""

    hidden_features: int
    out_features: int
    dtype: Dtype = jnp.float32
    dropout_rate: float = 0.0
    # BERT uses erf-based gelu; timm ViT also uses exact gelu
    approximate_gelu: bool = False

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        h = Dense(self.hidden_features, self.dtype, name="fc1")(x)
        h = (nn.gelu(h, approximate=True) if self.approximate_gelu
             else exact_gelu(h))
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        h = Dense(self.out_features, self.dtype, name="fc2")(h)
        return h


class DropPath(nn.Module):
    """Stochastic depth over the leading (batch) axis (reference timm DropPath)."""

    rate: float

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        keep = jax.random.bernoulli(rng, 1.0 - self.rate, shape)
        return jnp.where(keep, x / (1.0 - self.rate), 0.0).astype(x.dtype)
