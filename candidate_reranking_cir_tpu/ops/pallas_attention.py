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
grid (B, lq-blocks). Arrays are NOT host-padded to tile multiples: block
shapes match the logical dims exactly (tile-UNaligned blocks are legal —
Mosaic masks the physical tile padding inside each block's own VMEM), so
every DMA stays in-bounds with zero pad/slice traffic. Explicit jnp.pads
measured 2.9x the whole attention call at ViT shapes, and block shapes
reaching past the array's physical allocation (the masked-edge-block
design) crashed the TPU worker with out-of-bounds DMAs at rerank scale —
see tools/t_nopad_attn.py.

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

def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_lq_blocks(lq: int, sublane: int) -> tuple[int, int, int]:
    """Q-row blocking policy shared by the unfolded and folded kernels:
    returns (lq_block, lq_pad, pad_rows).

    Block shapes must cover the q-row axis EXACTLY: a block reaching past
    the array's physical allocation makes Mosaic issue out-of-bounds DMAs,
    which crashed the TPU worker at rerank scale. Preference order (explicit
    jnp.pads of q/k/v measured 2.9x the whole attention call at ViT shapes,
    tools/t_nopad_attn.py):
      1. lq <= 768: one exact block of lq rows (tile-unaligned is fine —
         Mosaic masks the physical tile padding inside the block's VMEM);
         a ViT-length query (577) runs as ONE block, not 2x512 with 43%
         of rows padding (which cost ~8% of the whole ViT forward).
      2. a sublane-aligned divisor of lq in [384, 768] (candidate-major
         folds are power-of-two-rich, so one nearly always exists);
      3. fall back to padding q (and bias rows) only — k/v, the bulk of
         the bytes, are never padded."""
    if lq <= 768:
        return lq, lq, 0
    for n_blocks in range(-(-lq // 768), lq + 1):
        if lq % n_blocks == 0 and (lq // n_blocks) % sublane == 0 \
                and lq // n_blocks >= 384:
            return lq // n_blocks, lq, 0
    n_blocks = -(-lq // 512)
    lq_block = _round_up(-(-lq // n_blocks), sublane)
    lq_pad = lq_block * n_blocks
    return lq_block, lq_pad, lq_pad - lq


# A/B toggles for tools/t_softmax_opt.py (read at import; production = both
# off): CRC_NO_SCALE_FOLD=1 restores per-score scaling, CRC_ATTN_RECIP=1
# normalizes with reciprocal-multiply instead of divide (not bitwise equal
# to jax.nn.softmax's divide — measurement only unless promoted).
import os as _os

_NO_SCALE_FOLD = _os.environ.get("CRC_NO_SCALE_FOLD", "") == "1"
_ATTN_RECIP = _os.environ.get("CRC_ATTN_RECIP", "") == "1"


def _is_exact_pow2(x: float) -> bool:
    import math

    if _NO_SCALE_FOLD:
        return False
    m, _ = math.frexp(x)
    return x > 0 and m == 0.5


def _head_attention(q, k, v, bias, scale: float, out_dtype):
    """[Lq, D] x [M, D] -> [Lq, D]; exact fp32 softmax in VMEM.

    All block shapes exactly match the logical array dims (possibly
    tile-UNaligned — Mosaic masks the physical tile padding inside the
    block's own VMEM allocation), so there are no garbage keys or rows to
    mask here and every DMA is in-bounds."""
    if _is_exact_pow2(scale):
        # head_dim a power of 4 (64 everywhere here) makes 1/sqrt(d) an
        # exact power of two: folding it into q only shifts exponents, so
        # the scores are BITWISE identical while the per-score [Lq, M] VPU
        # multiply collapses to a [Lq, D] one (M/D ~ 9x fewer elements at
        # cross-attention shapes)
        scores = jax.lax.dot_general(
            q * q.dtype.type(scale), k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
    if bias is not None:
        scores = scores + bias
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    probs = jnp.exp(scores)
    denom = jnp.sum(probs, axis=-1, keepdims=True)
    if _ATTN_RECIP:
        probs = (probs * (1.0 / denom)).astype(v.dtype)
    else:
        probs = (probs / denom).astype(v.dtype)
    out = jax.lax.dot_general(
        probs, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return out.astype(out_dtype)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                 num_heads: int):
    """One program per batch entry, all heads looped inside (12x fewer
    programs than a (batch, head) grid — per-program overhead dominated the
    first design at these small shapes). Refs blocked [1, H, L, D]."""
    for h in range(num_heads):
        o_ref[0, h] = _head_attention(
            q_ref[0, h], k_ref[0, h], v_ref[0, h], None, scale, o_ref.dtype)


def _attn_bias_kernel(q_ref, k_ref, v_ref, b_ref, o_ref, *, scale: float,
                      num_heads: int):
    """Variant with an additive bias [Lq, M] (text self-attention masks),
    shared across heads."""
    bias = b_ref[0].astype(jnp.float32)
    for h in range(num_heads):
        o_ref[0, h] = _head_attention(
            q_ref[0, h], k_ref[0, h], v_ref[0, h], bias, scale, o_ref.dtype)


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

    # Block long query sequences (e.g. the candidate-major fold of B*Lq
    # rows) so one program's q block + per-head fp32 scores stay inside the
    # scoped VMEM budget; softmax is exact per row regardless (full M in
    # VMEM). Policy shared with the folded kernel: see _pick_lq_blocks.
    lq_block, lq_pad, pad_rows = _pick_lq_blocks(lq, sublane)
    n_lq_blocks = lq_pad // lq_block

    # Run in [B, H, L, D]; k/v keep their exact M rows (no pads, no masks).
    q = q.transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    if pad_rows:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_rows), (0, 0)))

    grid = (b, n_lq_blocks)
    q_spec = pl.BlockSpec((1, h, lq_block, d), lambda i, j: (i, 0, j, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, h, m, d), lambda i, j: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((1, h, lq_block, d), lambda i, j: (i, 0, j, 0),
                          memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, h, lq_pad, d), q.dtype)

    cost = pl.CostEstimate(
        flops=2 * b * h * lq * m * d * 2,
        bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
        transcendentals=b * h * lq * m)
    # fp32 at ViT shapes sits just over the default 16 MB scoped-VMEM limit
    # (16.41 MB); v5e has 128 MB VMEM, so give the scheduler headroom
    params = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)

    if bias is None:
        out = pl.pallas_call(
            functools.partial(_attn_kernel, scale=scale, num_heads=h),
            grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec],
            out_specs=o_spec,
            out_shape=out_shape,
            cost_estimate=cost,
            compiler_params=params,
            interpret=interpret,
        )(q, k, v)
    else:
        # broadcast bias to [B, Lq, M] (head-independent masks only)
        bias3 = jnp.broadcast_to(bias[:, 0] if bias.ndim == 4 else bias,
                                 (b, lq, m)).astype(jnp.float32)
        if pad_rows:
            bias3 = jnp.pad(bias3, ((0, 0), (0, pad_rows), (0, 0)))
        b_spec = pl.BlockSpec((1, lq_block, m), lambda i, j: (i, j, 0),
                              memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_attn_bias_kernel, scale=scale, num_heads=h),
            grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec, b_spec],
            out_specs=o_spec,
            out_shape=out_shape,
            cost_estimate=cost,
            compiler_params=params,
            interpret=interpret,
        )(q, k, v, bias3)

    out = out.transpose(0, 2, 1, 3)
    return out[:, :lq] if pad_rows else out


def _attn_kernel_folded(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                        num_heads: int, head_dim: int):
    """Head-FOLDED variant: refs are [1, L, H*D] (matmul-native layout, heads
    on the lane dim). Each head is a 64-lane slice of the block — no
    [B,L,H,D] relayout ever materializes in HBM, which lets the q/k/v
    projections run as full-width [D, H*D] matmuls (the einsum '...d,dhk'
    form lowers to an N=64 convolution at 45% MFU; measured
    tools/t_vit_hlo.py / t_folded_attn.py: kernel alone 0.517 vs 0.708 ms at
    ViT shapes, bitwise-identical output)."""
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        o_ref[0, :, sl] = _head_attention(
            q_ref[0, :, sl], k_ref[0, :, sl], v_ref[0, :, sl], None, scale,
            o_ref.dtype)


def _attn_bias_kernel_folded(q_ref, k_ref, v_ref, b_ref, o_ref, *,
                             scale: float, num_heads: int, head_dim: int):
    bias = b_ref[0].astype(jnp.float32)
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        o_ref[0, :, sl] = _head_attention(
            q_ref[0, :, sl], k_ref[0, :, sl], v_ref[0, :, sl], bias, scale,
            o_ref.dtype)


def _fused_attention_folded_impl(q, k, v, bias, num_heads: int, *,
                                 interpret: bool | None = None):
    """q [B, Lq, H*D]; k, v [B, M, H*D]; bias None or broadcastable
    [B, 1|H, Lq, M] additive (head-independent). Returns [B, Lq, H*D].

    Same exact-block policy as the unfolded kernel: q-row blocking only,
    k/v always one exact block."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, lq, hd = q.shape
    m = k.shape[1]
    d = hd // num_heads
    scale = d ** -0.5
    sublane = 16 if q.dtype == jnp.bfloat16 else 8

    lq_block, lq_pad, pad_rows = _pick_lq_blocks(lq, sublane)
    n_lq_blocks = lq_pad // lq_block
    if pad_rows:
        q = jnp.pad(q, ((0, 0), (0, pad_rows), (0, 0)))

    grid = (b, n_lq_blocks)
    q_spec = pl.BlockSpec((1, lq_block, hd), lambda i, j: (i, j, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, m, hd), lambda i, j: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, lq_pad, hd), q.dtype)
    cost = pl.CostEstimate(
        flops=2 * b * num_heads * lq * m * d * 2,
        bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
        transcendentals=b * num_heads * lq * m)
    params = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)

    if bias is None:
        out = pl.pallas_call(
            functools.partial(_attn_kernel_folded, scale=scale,
                              num_heads=num_heads, head_dim=d),
            grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec],
            out_specs=q_spec,
            out_shape=out_shape,
            cost_estimate=cost,
            compiler_params=params,
            interpret=interpret,
        )(q, k, v)
    else:
        bias3 = jnp.broadcast_to(bias[:, 0] if bias.ndim == 4 else bias,
                                 (b, lq, m)).astype(jnp.float32)
        if pad_rows:
            bias3 = jnp.pad(bias3, ((0, 0), (0, pad_rows), (0, 0)))
        b_spec = pl.BlockSpec((1, lq_block, m), lambda i, j: (i, j, 0),
                              memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_attn_bias_kernel_folded, scale=scale,
                              num_heads=num_heads, head_dim=d),
            grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec, b_spec],
            out_specs=q_spec,
            out_shape=out_shape,
            cost_estimate=cost,
            compiler_params=params,
            interpret=interpret,
        )(q, k, v, bias3)

    return out[:, :lq] if pad_rows else out


def _xla_attention_folded(q, k, v, bias, num_heads: int):
    b, l, hd = q.shape
    m = k.shape[1]
    d = hd // num_heads
    out = _xla_attention(q.reshape(b, l, num_heads, d),
                         k.reshape(b, m, num_heads, d),
                         v.reshape(b, m, num_heads, d), bias)
    return out.reshape(b, l, hd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _folded_attention_vjp(num_heads, q, k, v, bias):
    return _fused_attention_folded_impl(q, k, v, bias, num_heads)


def _folded_fwd(num_heads, q, k, v, bias):
    return (_fused_attention_folded_impl(q, k, v, bias, num_heads),
            (q, k, v, bias))


def _folded_bwd(num_heads, res, g):
    q, k, v, bias = res
    _, vjp = jax.vjp(
        lambda q, k, v: _xla_attention_folded(q, k, v, bias, num_heads),
        q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_folded_attention_vjp.defvjp(_folded_fwd, _folded_bwd)


def fused_attention_folded(q, k, v, bias=None, *, num_heads: int):
    """Fused TPU attention over head-folded [B, L, H*D] arrays (exact fp32
    softmax; differentiable via an XLA recompute backward)."""
    return _folded_attention_vjp(num_heads, q, k, v, bias)


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
