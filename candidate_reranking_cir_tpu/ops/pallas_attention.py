"""Pallas fused attention kernel for TPU.

Motivation: in the dual-encoder hot path the XLA lowering materializes the
fp32 score tensor [B, H, Lq, M] in HBM between the QK^T and PV matmuls (plus
softmax round-trips) — for the stage-II pair grid that is ~1.3 GB of traffic
per layer-stream. Query and KV sequence lengths here are small (Lq <= 64 text
tokens, M = 577 image tokens), so one (batch, head) program's full score
matrix fits comfortably in VMEM: this kernel computes QK^T, a numerically
exact fp32 softmax, and the PV contraction without ever leaving VMEM — no
online-softmax bookkeeping needed at these shapes.

Layout: q [B, Lq, H, D], k/v [B, M, H, D] (the framework's native layout);
grid (B, H). The wrapper pads Lq and M to tile multiples and masks padded
keys with the framework's -10000-style additive convention (padded queries
produce garbage rows that the wrapper slices off).

Backward: custom_vjp whose backward is the standard XLA attention backward
(exact, recompute-based). The forward is where eval throughput lives; a
fused Pallas backward is a later optimization.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _head_attention(q, k, v, bias, kv_len: int, scale: float, out_dtype):
    """[Lq, D] x [M_pad, D] -> [Lq, D]; exact fp32 softmax in VMEM."""
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        scores = scores + bias
    if k.shape[0] != kv_len:
        key_idx = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(key_idx < kv_len, scores, NEG_INF)
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    probs = jnp.exp(scores)
    probs = (probs / jnp.sum(probs, axis=-1, keepdims=True)).astype(v.dtype)
    out = jax.lax.dot_general(
        probs, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return out.astype(out_dtype)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, kv_len: int, scale: float,
                 num_heads: int):
    """One program per batch entry, all heads looped inside (12x fewer
    programs than a (batch, head) grid — per-program overhead dominated the
    first design at these small shapes). Refs blocked [1, H, L, D]."""
    for h in range(num_heads):
        o_ref[0, h] = _head_attention(
            q_ref[0, h], k_ref[0, h], v_ref[0, h], None, kv_len, scale,
            o_ref.dtype)


def _attn_bias_kernel(q_ref, k_ref, v_ref, b_ref, o_ref, *, kv_len: int,
                      scale: float, num_heads: int):
    """Variant with an additive bias [Lq, M] (text self-attention masks),
    shared across heads."""
    bias = b_ref[0].astype(jnp.float32)
    for h in range(num_heads):
        o_ref[0, h] = _head_attention(
            q_ref[0, h], k_ref[0, h], v_ref[0, h], bias, kv_len, scale,
            o_ref.dtype)


def _fused_attention_fwd_impl(q, k, v, bias, *, interpret: bool | None = None):
    """q [B, Lq, H, D]; k, v [B, M, H, D]; bias None or broadcastable
    [B, 1|H, Lq, M] additive. Returns [B, Lq, H, D]."""
    if interpret is None:
        # Mosaic kernels only compile for TPU; on CPU (tests, virtual mesh)
        # fall back to the interpreter so the fused flag is portable
        interpret = jax.default_backend() != "tpu"
    b, lq, h, d = q.shape
    m = k.shape[1]
    scale = d ** -0.5

    sublane = 16 if q.dtype == jnp.bfloat16 else 8
    lq_pad = _round_up(lq, sublane)
    m_pad = _round_up(m, 128)

    # block long query sequences (e.g. the candidate-major fold of B*Lq rows)
    # so one program's q block + per-head fp32 scores stay inside the scoped
    # VMEM budget; softmax is exact per row regardless (full M in VMEM).
    # Block size balances the blocks instead of forcing 512: a ViT-length
    # query (lq_pad 592) runs as ONE 592-row block, not 2x512 with 43% of
    # rows padding (which cost ~8% of the whole ViT forward).
    if lq_pad <= 768:
        lq_block = lq_pad
    else:
        n_blocks = -(-lq_pad // 512)
        lq_block = _round_up(-(-lq_pad // n_blocks), sublane)
        lq_pad = lq_block * n_blocks
    n_lq_blocks = lq_pad // lq_block

    # Mosaic wants the last two block dims tile-aligned: run in [B, H, L, D]
    q = jnp.pad(q.transpose(0, 2, 1, 3),
                ((0, 0), (0, 0), (0, lq_pad - lq), (0, 0)))
    k = jnp.pad(k.transpose(0, 2, 1, 3),
                ((0, 0), (0, 0), (0, m_pad - m), (0, 0)))
    v = jnp.pad(v.transpose(0, 2, 1, 3),
                ((0, 0), (0, 0), (0, m_pad - m), (0, 0)))

    grid = (b, n_lq_blocks)
    q_spec = pl.BlockSpec((1, h, lq_block, d), lambda i, j: (i, 0, j, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, h, m_pad, d), lambda i, j: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((1, h, lq_block, d), lambda i, j: (i, 0, j, 0),
                          memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, h, lq_pad, d), q.dtype)

    cost = pl.CostEstimate(
        flops=2 * b * h * lq * m * d * 2,
        bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
        transcendentals=b * h * lq * m)

    if bias is None:
        out = pl.pallas_call(
            functools.partial(_attn_kernel, kv_len=m, scale=scale,
                              num_heads=h),
            grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec],
            out_specs=o_spec,
            out_shape=out_shape,
            cost_estimate=cost,
            interpret=interpret,
        )(q, k, v)
    else:
        # broadcast bias to [B, Lq_pad, M_pad] (head-independent masks only)
        bias3 = jnp.broadcast_to(bias[:, 0] if bias.ndim == 4 else bias,
                                 (b, lq, m)).astype(jnp.float32)
        bias3 = jnp.pad(bias3, ((0, 0), (0, lq_pad - lq), (0, m_pad - m)))
        b_spec = pl.BlockSpec((1, lq_block, m_pad), lambda i, j: (i, j, 0),
                              memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_attn_bias_kernel, kv_len=m, scale=scale,
                              num_heads=h),
            grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec, b_spec],
            out_specs=o_spec,
            out_shape=out_shape,
            cost_estimate=cost,
            interpret=interpret,
        )(q, k, v, bias3)

    return out.transpose(0, 2, 1, 3)[:, :lq]


def _xla_attention(q, k, v, bias):
    """Reference XLA path (also the vjp backward's recompute)."""
    scale = q.shape[-1] ** -0.5
    scores = jnp.einsum("blhd,bmhd->bhlm", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores.astype(jnp.float32) * scale
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhlm,bmhd->blhd", probs, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_attention(q, k, v, bias=None):
    """Fused TPU attention with exact softmax. Differentiable: the backward
    pass recomputes attention with standard XLA ops."""
    return _fused_attention_fwd_impl(q, k, v, bias)


def _fwd(q, k, v, bias):
    return _fused_attention_fwd_impl(q, k, v, bias), (q, k, v, bias)


def _bwd(res, g):
    q, k, v, bias = res
    _, vjp = jax.vjp(lambda q, k, v: _xla_attention(q, k, v, bias), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


fused_attention.defvjp(_fwd, _bwd)
