"""Pallas fused attention for TRAINING: in-kernel dropout, fused backward.

The eval kernel (ops/pallas_attention.py) is deterministic-only; the training
hot paths (stage-I MED fusion fwd+bwd at B=512, the stage-II dual-encoder
pair grid at B=16 => 256 pairs) additionally apply attention-probs dropout
(reference med_config.json attention_probs_dropout_prob=0.1, consumed at
med.py:158-240 / nlvr_encoder.py:140-222). Under XLA that costs three HBM
round-trips of the fp32 score tensor per attention site (scores, probs,
dropout mask — ~0.5 GB/layer-stream for the stage-I cross-attention) plus a
full recompute in the rematerialized backward.

This kernel keeps everything in VMEM:

- forward: QK^T, exact fp32 softmax, dropout, PV in one program per batch
  entry (heads looped inside, like the eval kernel);
- dropout mask: derived IN-KERNEL from a counter-based integer hash
  (lowbias32, fixed-shift xorshift-multiply) of (seed, batch, head, row,
  col) — no mask tensor ever exists in HBM, and the backward reproduces the
  identical mask from the same seed;
- backward: one program per batch entry recomputes probs + mask in VMEM and
  emits dq, dk, dv directly (flash-attention-style, but with the full key
  length resident — text/image sequences here are <= ~1k tokens).

Numerics: softmax is exact fp32 (max-subtracted), matching the XLA path
bit-for-bit up to reduction order. The keep decision is
``uniform24(hash) >= rate`` where uniform24 has 2^-24 resolution — the keep
probability differs from exactly (1-rate) by < 6e-8, statistically
indistinguishable from ``jax.random.bernoulli``.

The hash is NOT a cryptographic PRNG, but per-element counters are unique
per (batch, head, row, col) and lowbias32's avalanche behavior is well
studied (bias ~0.17%); for dropout masks this is far beyond sufficient.

Interpret mode (CPU tests, the virtual mesh) runs the same kernel body —
the hash is plain int32 arithmetic, so CPU and TPU produce IDENTICAL masks.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_M1 = 0x7FEB352D - (1 << 32) * 0  # 2135587861, fits int32
_M2 = -2073376117  # int32 view of 0x846CA68B


def _lowbias32(x):
    """lowbias32 integer hash (fixed shifts only — Mosaic-friendly).
    Operates on int32 with two's-complement wraparound multiplies."""
    x = x ^ jax.lax.shift_right_logical(x, 16)
    x = x * jnp.int32(_M1)
    x = x ^ jax.lax.shift_right_logical(x, 15)
    x = x * jnp.int32(_M2)
    x = x ^ jax.lax.shift_right_logical(x, 16)
    return x


def _keep_mask(seed, b, h, shape, rate: float):
    """[rows, cols] bool keep-mask, deterministic in (seed, b, h, i, j).

    seed: int32 scalar (traced); b, h: int32 scalars. Reproduced exactly by
    ``reference_keep_mask`` below (used by tests and any XLA fallback).
    """
    rows, cols = shape
    salt = _lowbias32(seed + jnp.int32(b) * jnp.int32(0x101) + jnp.int32(h))
    idx = (jax.lax.broadcasted_iota(jnp.int32, shape, 0) * jnp.int32(cols)
           + jax.lax.broadcasted_iota(jnp.int32, shape, 1))
    bits = _lowbias32(salt + idx)
    # top 24 bits -> uniform [0, 1) at 2^-24 resolution (jax.random.uniform's
    # construction); keep iff u >= rate
    u = jax.lax.shift_right_logical(bits, 8).astype(jnp.float32) * (2.0 ** -24)
    return u >= jnp.float32(rate)


def reference_keep_mask(seed, b: int, h: int, shape, rate: float):
    """Host/XLA replica of the in-kernel mask (for tests)."""
    return _keep_mask(jnp.int32(seed), jnp.int32(b), jnp.int32(h), shape, rate)


def _softmax_fp32(scores):
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    probs = jnp.exp(scores)
    return probs / jnp.sum(probs, axis=-1, keepdims=True)


def _head_scores(q, k, bias, scale: float):
    """[L, D] x [M, D] -> fp32 [L, M] scores. Blocks match the logical dims
    exactly (no padded keys to mask; a block reaching past the array's
    physical allocation makes Mosaic issue out-of-bounds DMAs — see the eval
    kernel's history in ops/pallas_attention.py)."""
    from candidate_reranking_cir_tpu.ops.pallas_attention import (
        _is_exact_pow2,
    )

    if _is_exact_pow2(scale):
        # 1/sqrt(d) is an exact power of two for d=64: folding it into q
        # shifts exponents only — bitwise-identical scores, and the [L, M]
        # per-score multiply becomes an [L, D] one (see the eval kernel)
        scores = jax.lax.dot_general(
            q * q.dtype.type(scale), k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
    if bias is not None:
        scores = scores + bias
    return scores


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, b_ref, o_ref, *,
                scale: float, num_heads: int, rate: float, has_bias: bool,
                entries: int = 1):
    pid = pl.program_id(0)
    seed = seed_ref[0]
    for e in range(entries):
        b = pid * entries + e  # absolute batch index keys the dropout mask
        bias = b_ref[e].astype(jnp.float32) if has_bias else None
        for h in range(num_heads):
            probs = _softmax_fp32(
                _head_scores(q_ref[e, h], k_ref[e, h], bias, scale))
            if rate > 0.0:
                keep = _keep_mask(seed, b, h, probs.shape, rate)
                probs = jnp.where(keep, probs * (1.0 / (1.0 - rate)), 0.0)
            out = jax.lax.dot_general(
                probs.astype(v_ref.dtype), v_ref[e, h],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[e, h] = out.astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, b_ref, g_ref,
                dq_ref, dk_ref, dv_ref, *, scale: float,
                num_heads: int, rate: float, has_bias: bool,
                entries: int = 1):
    pid = pl.program_id(0)
    seed = seed_ref[0]
    inv = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0
    for e in range(entries):
        b = pid * entries + e
        bias = b_ref[e].astype(jnp.float32) if has_bias else None
        for h in range(num_heads):
            q = q_ref[e, h]
            k = k_ref[e, h]
            v = v_ref[e, h]
            g = g_ref[e, h].astype(jnp.float32)
            probs = _softmax_fp32(_head_scores(q, k, bias, scale))
            if rate > 0.0:
                keep = _keep_mask(seed, b, h, probs.shape, rate)
                dropped = jnp.where(keep, probs * inv, 0.0)
            else:
                keep = None
                dropped = probs
            # dV = dropped^T g   [M, D]
            dv_ref[e, h] = jax.lax.dot_general(
                dropped, g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dv_ref.dtype)
            # d(dropped) = g V^T  [L, M]
            d_dropped = jax.lax.dot_general(
                g, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if keep is not None:
                d_probs = jnp.where(keep, d_dropped * inv, 0.0)
            else:
                d_probs = d_dropped
            # softmax backward (fp32, exact)
            d_scores = probs * (
                d_probs - jnp.sum(d_probs * probs, axis=-1, keepdims=True))
            d_scores = d_scores * scale
            dq_ref[e, h] = jax.lax.dot_general(
                d_scores.astype(q.dtype), k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dq_ref.dtype)
            dk_ref[e, h] = jax.lax.dot_general(
                d_scores.astype(q.dtype), q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dk_ref.dtype)


MAX_LQ = 1024  # single-query-block kernel: larger folds fall back to XLA
MIN_KV = 256   # below this key length XLA wins: the fp32 score tensor is
               # small enough that HBM traffic is negligible, while the
               # kernel's one-program-per-batch-entry layout degenerates to
               # tiny [L, 128] matmuls dominated by per-program overhead
               # (measured: routing the L<=48 pair-grid SELF-attention here
               # cost ~30 ms/step at B=16; cross-attention at M=577 wins)
MIN_ROWS = 128  # minimum query rows per program: at stage-I MED shapes
                # (B=512 programs x ~32 rows x M=577) the one-entry kernel
                # lost 8.6% vs XLA — per-program work too small; the
                # stage-II pair fold (B=16 programs x 384 rows x 577) wins
                # 16%. Short-row batches now run with an ENTRY BLOCK: E
                # batch entries per program (E*lq >= MIN_ROWS), which
                # amortizes the program overhead while keeping the in-kernel
                # dropout mask keyed by the absolute batch index.
MAX_ENTRIES_FWD = 8  # VMEM bound (double-buffered blocks): fwd holds
MAX_ENTRIES_BWD = 4  # E*(q,k,v,o); bwd holds E*(q,k,v,g,dq,dk,dv) — at
                     # M=577/H=12/D=64 the compiler measured 114.5 MB of
                     # scoped stack at E=8 vs the 96 MB cap, so bwd caps at
                     # 4. The dropout mask is keyed by the ABSOLUTE batch
                     # index, so fwd/bwd may block differently and still
                     # regenerate identical masks.


def _pick_entries(b: int, lq: int, cap: int = MAX_ENTRIES_BWD) -> int:
    """Largest E <= cap with b % E == 0 and E*lq >= MIN_ROWS; 1 when lq
    already meets MIN_ROWS (or nothing qualifies)."""
    if lq >= MIN_ROWS:
        return 1
    for e in (8, 4, 2):
        if e <= cap and b % e == 0 and e * lq >= MIN_ROWS:
            return e
    return 1


def _prep(q, k, v, bias):
    """Common layout: [B, L, H, D] -> [B, H, L, D] (+ bias3). NO padding —
    block shapes match the logical dims exactly (tile-unaligned blocks are
    legal; Mosaic masks the physical tile padding inside each block's own
    VMEM), so every DMA is in-bounds with zero pad/slice traffic."""
    b, lq, h, d = q.shape
    m = k.shape[1]
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    if bias is not None:
        bias3 = jnp.broadcast_to(bias[:, 0] if bias.ndim == 4 else bias,
                                 (b, lq, m)).astype(jnp.float32)
    else:
        bias3 = jnp.zeros((b, 8, 128), jnp.float32)  # placeholder operand
    return qt, kt, vt, bias3


def _specs(b, h, lq, m, d, has_bias, entries=1):
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    q_spec = pl.BlockSpec((entries, h, lq, d), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((entries, h, m, d), lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    if has_bias:
        b_spec = pl.BlockSpec((entries, lq, m), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        b_spec = pl.BlockSpec((entries, 8, 128), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    return seed_spec, q_spec, kv_spec, b_spec


# the backward program's double-buffered blocks (q/k/v/g in, dq/dk/dv out)
# plus per-head fp32 scratch exceed the default 16 MB scoped-vmem budget at
# the pair-grid fold shapes ([16, 12, 384+, 64] blocks); v5e has 128 MB VMEM
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)


def _interpret_default():
    # Mosaic compiles only for TPU; CPU (tests, virtual mesh) interprets
    return jax.default_backend() != "tpu"


def _fwd_impl(q, k, v, bias, seed, rate: float, interpret: bool | None):
    if interpret is None:
        interpret = _interpret_default()
    b, lq, h, d = q.shape
    m = k.shape[1]
    scale = d ** -0.5
    has_bias = bias is not None
    entries = _pick_entries(b, lq, MAX_ENTRIES_FWD)
    qt, kt, vt, bias3 = _prep(q, k, v, bias)
    seed_spec, q_spec, kv_spec, b_spec = _specs(b, h, lq, m, d, has_bias,
                                                entries)
    cost = pl.CostEstimate(
        flops=2 * b * h * lq * m * d * 2,
        bytes_accessed=(qt.size + kt.size + vt.size) * q.dtype.itemsize,
        transcendentals=b * h * lq * m)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, num_heads=h,
                          rate=rate, has_bias=has_bias, entries=entries),
        grid=(b // entries,),
        in_specs=[seed_spec, q_spec, kv_spec, kv_spec, b_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, lq, d), q.dtype),
        cost_estimate=cost,
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(seed, qt, kt, vt, bias3)
    return out.transpose(0, 2, 1, 3)


def _bwd_impl(q, k, v, bias, seed, g, rate: float, interpret: bool | None):
    if interpret is None:
        interpret = _interpret_default()
    b, lq, h, d = q.shape
    m = k.shape[1]
    scale = d ** -0.5
    has_bias = bias is not None
    entries = _pick_entries(b, lq)
    qt, kt, vt, bias3 = _prep(q, k, v, bias)
    gt = g.transpose(0, 2, 1, 3)
    seed_spec, q_spec, kv_spec, b_spec = _specs(b, h, lq, m, d, has_bias,
                                                entries)
    cost = pl.CostEstimate(
        flops=5 * 2 * b * h * lq * m * d,
        bytes_accessed=2 * (qt.size + kt.size + vt.size) * q.dtype.itemsize,
        transcendentals=b * h * lq * m)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, num_heads=h,
                          rate=rate, has_bias=has_bias, entries=entries),
        grid=(b // entries,),
        in_specs=[seed_spec, q_spec, kv_spec, kv_spec, b_spec, q_spec],
        out_specs=(q_spec, kv_spec, kv_spec),
        out_shape=(jax.ShapeDtypeStruct((b, h, lq, d), q.dtype),
                   jax.ShapeDtypeStruct((b, h, m, d), k.dtype),
                   jax.ShapeDtypeStruct((b, h, m, d), v.dtype)),
        cost_estimate=cost,
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(seed, qt, kt, vt, bias3, gt)
    dq = dq.transpose(0, 2, 1, 3)
    dk = dk.transpose(0, 2, 1, 3)
    dv = dv.transpose(0, 2, 1, 3)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_attention_train(q, k, v, bias, seed, rate: float):
    """Fused attention with in-kernel dropout. Differentiable in q, k, v.

    q [B, Lq, H, D]; k, v [B, M, H, D]; bias None or head-independent
    additive [B, 1, Lq, M] / [B, Lq, M]; seed int32 [1] array; rate static.
    The dropout mask is a pure function of (seed, batch, head, row, col) —
    forward and backward regenerate it identically, nothing hits HBM.
    Short-row batches run entry-blocked (see _pick_entries) with identical
    numerics: the mask stays keyed by the absolute batch index.
    """
    return _fwd_impl(q, k, v, bias, seed, rate, None)


def _vjp_fwd(q, k, v, bias, seed, rate):
    return _fwd_impl(q, k, v, bias, seed, rate, None), (q, k, v, bias, seed)


def _vjp_bwd(rate, res, g):
    q, k, v, bias, seed = res
    dq, dk, dv = _bwd_impl(q, k, v, bias, seed, g, rate, None)
    return dq, dk, dv, None, None


fused_attention_train.defvjp(_vjp_fwd, _vjp_bwd)


def eligible(lq: int, bias, kv_len: int = MIN_KV,
             batch: int | None = None) -> bool:
    """Single-block kernel constraint, head-independent bias, large-M and
    enough per-PROGRAM rows (directly, or via an entry block when the
    flattened batch size is given — see MIN_KV / MIN_ROWS rationale)."""
    if lq > MAX_LQ or kv_len < MIN_KV:
        return False
    if lq < MIN_ROWS and (batch is None or _pick_entries(batch, lq) == 1):
        return False
    if bias is not None and bias.ndim >= 3 and bias.shape[-3] not in (1,):
        return False
    return True


def seed_from_rng(rng) -> jax.Array:
    """Derive the kernel's int32 seed from a JAX PRNG key (one tiny draw)."""
    return jax.random.randint(rng, (1,), jnp.iinfo(jnp.int32).min,
                              jnp.iinfo(jnp.int32).max, jnp.int32)


# ---------------------------------------------------------------------------
# Head-FOLDED variants: q/k/v in matmul-native [B, L, H*D] layout, heads
# sliced on the lane dim inside the kernel (same rationale as the eval
# kernel's folded form, ops/pallas_attention.py: the [B, L, H, D] layout the
# unfolded kernel constrains its operands to forces 227 MB/layer relayout
# copies of the projected cross-attention K/V in the stage-I MED train step,
# and pushes the projections into the N=64 convolution form). The dropout
# mask is the same function of (seed, absolute batch, head, row, col), so
# folded and unfolded kernels are numerically interchangeable.


def _fwd_kernel_folded(seed_ref, q_ref, k_ref, v_ref, b_ref, o_ref, *,
                       scale: float, num_heads: int, head_dim: int,
                       rate: float, has_bias: bool, entries: int):
    pid = pl.program_id(0)
    seed = seed_ref[0]
    for e in range(entries):
        b = pid * entries + e
        bias = b_ref[e].astype(jnp.float32) if has_bias else None
        for h in range(num_heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            probs = _softmax_fp32(
                _head_scores(q_ref[e, :, sl], k_ref[e, :, sl], bias, scale))
            if rate > 0.0:
                keep = _keep_mask(seed, b, h, probs.shape, rate)
                probs = jnp.where(keep, probs * (1.0 / (1.0 - rate)), 0.0)
            out = jax.lax.dot_general(
                probs.astype(v_ref.dtype), v_ref[e, :, sl],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[e, :, sl] = out.astype(o_ref.dtype)


# CRC_BWD_TRANSPOSED=1 computes dv/dk transposed (dv^T = g^T @ dropped:
# N=m fills the 128 MXU lanes instead of N=head_dim=64, at the price of an
# in-kernel [d, m] -> [m, d] transpose per head). A/B toggle for
# tools/t_bwd_kernel.py / bench --only s1train; numerics are EXACT either
# way (verified max|Δ|=0 in interpret mode at rate=0.1).
import os as _os

_BWD_TRANSPOSED = _os.environ.get("CRC_BWD_TRANSPOSED", "") == "1"


def _bwd_kernel_folded(seed_ref, q_ref, k_ref, v_ref, b_ref, g_ref,
                       dq_ref, dk_ref, dv_ref, *, scale: float,
                       num_heads: int, head_dim: int, rate: float,
                       has_bias: bool, entries: int):
    pid = pl.program_id(0)
    seed = seed_ref[0]
    inv = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0
    for e in range(entries):
        b = pid * entries + e
        bias = b_ref[e].astype(jnp.float32) if has_bias else None
        for h in range(num_heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            q = q_ref[e, :, sl]
            k = k_ref[e, :, sl]
            v = v_ref[e, :, sl]
            g = g_ref[e, :, sl].astype(jnp.float32)
            probs = _softmax_fp32(_head_scores(q, k, bias, scale))
            if rate > 0.0:
                keep = _keep_mask(seed, b, h, probs.shape, rate)
                dropped = jnp.where(keep, probs * inv, 0.0)
            else:
                keep = None
                dropped = probs
            if _BWD_TRANSPOSED:
                dvT = jax.lax.dot_general(
                    g, dropped, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dv_ref[e, :, sl] = dvT.T.astype(dv_ref.dtype)
            else:
                dv_ref[e, :, sl] = jax.lax.dot_general(
                    dropped, g, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(dv_ref.dtype)
            d_dropped = jax.lax.dot_general(
                g, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if keep is not None:
                d_probs = jnp.where(keep, d_dropped * inv, 0.0)
            else:
                d_probs = d_dropped
            d_scores = probs * (
                d_probs - jnp.sum(d_probs * probs, axis=-1, keepdims=True))
            d_scores = d_scores * scale
            d_scores_lp = d_scores.astype(q.dtype)
            dq_ref[e, :, sl] = jax.lax.dot_general(
                d_scores_lp, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dq_ref.dtype)
            if _BWD_TRANSPOSED:
                dkT = jax.lax.dot_general(
                    q, d_scores_lp, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dk_ref[e, :, sl] = dkT.T.astype(dk_ref.dtype)
            else:
                dk_ref[e, :, sl] = jax.lax.dot_general(
                    d_scores_lp, q, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(dk_ref.dtype)


def _bias3_folded(bias, b, lq, m):
    if bias is not None:
        return jnp.broadcast_to(bias[:, 0] if bias.ndim == 4 else bias,
                                (b, lq, m)).astype(jnp.float32)
    return jnp.zeros((b, 8, 128), jnp.float32)  # placeholder operand


def _specs_folded(h, lq, m, hd, has_bias, entries):
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    q_spec = pl.BlockSpec((entries, lq, hd), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((entries, m, hd), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    if has_bias:
        b_spec = pl.BlockSpec((entries, lq, m), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        b_spec = pl.BlockSpec((entries, 8, 128), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    return seed_spec, q_spec, kv_spec, b_spec


def _fwd_impl_folded(q, k, v, bias, seed, rate: float, num_heads: int,
                     interpret: bool | None):
    if interpret is None:
        interpret = _interpret_default()
    b, lq, hd = q.shape
    m = k.shape[1]
    d = hd // num_heads
    scale = d ** -0.5
    has_bias = bias is not None
    entries = _pick_entries(b, lq, MAX_ENTRIES_FWD)
    bias3 = _bias3_folded(bias, b, lq, m)
    seed_spec, q_spec, kv_spec, b_spec = _specs_folded(
        num_heads, lq, m, hd, has_bias, entries)
    cost = pl.CostEstimate(
        flops=2 * b * num_heads * lq * m * d * 2,
        bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
        transcendentals=b * num_heads * lq * m)
    return pl.pallas_call(
        functools.partial(_fwd_kernel_folded, scale=scale,
                          num_heads=num_heads, head_dim=d, rate=rate,
                          has_bias=has_bias, entries=entries),
        grid=(b // entries,),
        in_specs=[seed_spec, q_spec, kv_spec, kv_spec, b_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((b, lq, hd), q.dtype),
        cost_estimate=cost,
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(seed, q, k, v, bias3)


def _bwd_impl_folded(q, k, v, bias, seed, g, rate: float, num_heads: int,
                     interpret: bool | None):
    if interpret is None:
        interpret = _interpret_default()
    b, lq, hd = q.shape
    m = k.shape[1]
    d = hd // num_heads
    scale = d ** -0.5
    has_bias = bias is not None
    entries = _pick_entries(b, lq)
    bias3 = _bias3_folded(bias, b, lq, m)
    seed_spec, q_spec, kv_spec, b_spec = _specs_folded(
        num_heads, lq, m, hd, has_bias, entries)
    cost = pl.CostEstimate(
        flops=5 * 2 * b * num_heads * lq * m * d,
        bytes_accessed=2 * (q.size + k.size + v.size) * q.dtype.itemsize,
        transcendentals=b * num_heads * lq * m)
    return pl.pallas_call(
        functools.partial(_bwd_kernel_folded, scale=scale,
                          num_heads=num_heads, head_dim=d, rate=rate,
                          has_bias=has_bias, entries=entries),
        grid=(b // entries,),
        in_specs=[seed_spec, q_spec, kv_spec, kv_spec, b_spec, q_spec],
        out_specs=(q_spec, kv_spec, kv_spec),
        out_shape=(jax.ShapeDtypeStruct((b, lq, hd), q.dtype),
                   jax.ShapeDtypeStruct((b, m, hd), k.dtype),
                   jax.ShapeDtypeStruct((b, m, hd), v.dtype)),
        cost_estimate=cost,
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(seed, q, k, v, bias3, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _train_folded_vjp(q, k, v, bias, seed, rate, num_heads):
    return _fwd_impl_folded(q, k, v, bias, seed, rate, num_heads, None)


def _folded_vjp_fwd(q, k, v, bias, seed, rate, num_heads):
    return (_fwd_impl_folded(q, k, v, bias, seed, rate, num_heads, None),
            (q, k, v, bias, seed))


def _folded_vjp_bwd(rate, num_heads, res, g):
    q, k, v, bias, seed = res
    dq, dk, dv = _bwd_impl_folded(q, k, v, bias, seed, g, rate, num_heads,
                                  None)
    return dq, dk, dv, None, None


_train_folded_vjp.defvjp(_folded_vjp_fwd, _folded_vjp_bwd)


def fused_attention_train_folded(q, k, v, bias, seed, rate: float, *,
                                 num_heads: int):
    """Head-folded twin of fused_attention_train: q [B, Lq, H*D];
    k, v [B, M, H*D]; same in-kernel dropout contract (mask keyed by the
    absolute batch index — interchangeable with the unfolded kernel)."""
    return _train_folded_vjp(q, k, v, bias, seed, rate, num_heads)
