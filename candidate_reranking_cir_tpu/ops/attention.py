"""Attention compute primitives.

These are the TPU replacements for the reference's per-module torch attention
(reference vit.py:70-86, med.py:140-240, nlvr_encoder.py:140-222). All variants:

- take/emit ``[..., seq, heads, head_dim]`` tensors (batch dims lead, contraction
  via einsum so XLA maps them straight onto the MXU),
- compute the softmax in float32 regardless of the input dtype (matching the
  reference's fp32-autocast-exempt softmax numerics),
- use the additive ``(1 - mask) * -10000`` bias convention of the reference
  (med.py:682) so ported weights score identically.

``pair_cross_attention`` is the TPU-first core of stage-II re-ranking: for a grid of
(query, candidate) pairs it attends pair states to **shared per-candidate K/V**,
so candidate key/value projections are computed once per candidate instead of once
per pair (the reference recomputes them inside a Python loop over queries,
blip_stage2.py:78-94).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -10000.0  # additive mask value, matches reference med.py:682


def make_additive_mask(mask: jax.Array, dtype=jnp.float32) -> jax.Array:
    """[..., kv_len] 1/0 validity mask -> [..., 1, 1, kv_len] additive bias.

    The two broadcast axes are (heads, q_len). Matches reference
    ``get_extended_attention_mask`` / ``invert_attention_mask`` semantics
    (med.py:624-683): bias = (1 - mask) * -10000.
    """
    bias = (1.0 - mask.astype(jnp.float32)) * NEG_INF
    return bias[..., None, None, :].astype(dtype)


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array | None = None,
    *,
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
    deterministic: bool = True,
    fused: bool = False,
) -> jax.Array:
    """Multi-head scaled dot-product attention.

    q: [..., Lq, H, D]; k, v: [..., Lk, H, D]; bias broadcastable to
    [..., H, Lq, Lk]. Returns [..., Lq, H, D] in q.dtype.

    Softmax (and the score accumulation) run in float32; the context matmul runs in
    the input dtype with fp32 MXU accumulation.

    fused=True routes through the Pallas VMEM-resident kernel
    (ops/pallas_attention.py) when the call qualifies: no attention dropout
    active and a head-independent bias. Falls back silently otherwise.
    """
    if fused and (deterministic or dropout_rate == 0.0):
        out = _try_fused(q, k, v, bias)
        if out is not None:
            return out
    elif fused and dropout_rng is not None:
        out = _try_fused_train(q, k, v, bias, dropout_rng, dropout_rate)
        if out is not None:
            return out
    dtype = q.dtype
    depth = q.shape[-1]
    scale = depth ** -0.5
    # [..., H, Lq, Lk] in fp32
    scores = jnp.einsum("...qhd,...khd->...hqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores.astype(jnp.float32) * scale
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = probs * keep / (1.0 - dropout_rate)
    probs = probs.astype(dtype)
    out = jnp.einsum("...hqk,...khd->...qhd", probs, v,
                     preferred_element_type=jnp.float32)
    return out.astype(dtype)


def dot_product_attention_folded(q, k, v, bias=None, *, num_heads: int):
    """Head-folded twin of the fused eval path: q [..., Lq, H*D];
    k, v [..., M, H*D]; bias None or head-independent broadcastable
    [..., 1, Lq, M]. Returns [..., Lq, H*D] via the folded Pallas kernel
    (ops/pallas_attention.py) — no [B, L, H, D] relayout in HBM."""
    from candidate_reranking_cir_tpu.ops.pallas_attention import (
        fused_attention_folded,
    )

    batch_shape = q.shape[:-2]
    lq, hd = q.shape[-2:]
    m = k.shape[-2]
    if bias is not None:
        bias = jnp.broadcast_to(
            bias, (*batch_shape, 1, lq, m)).reshape(-1, 1, lq, m)
    out = fused_attention_folded(
        q.reshape(-1, lq, hd), k.reshape(-1, m, hd), v.reshape(-1, m, hd),
        bias, num_heads=num_heads)
    return out.reshape(*batch_shape, lq, hd)


def dot_product_attention_folded_train(q, k, v, bias=None, *,
                                       num_heads: int, dropout_rng,
                                       dropout_rate: float):
    """Folded twin of the in-kernel-dropout train path: q [..., Lq, H*D];
    k, v [..., M, H*D]. Caller must pre-check
    pallas_attention_train.eligible(); masks are keyed by the absolute
    batch index, identical to the unfolded kernel's."""
    from candidate_reranking_cir_tpu.ops.pallas_attention_train import (
        fused_attention_train_folded,
        seed_from_rng,
    )

    batch_shape = q.shape[:-2]
    lq, hd = q.shape[-2:]
    m = k.shape[-2]
    if bias is not None:
        bias = jnp.broadcast_to(
            bias, (*batch_shape, 1, lq, m)).reshape(-1, 1, lq, m)
    out = fused_attention_train_folded(
        q.reshape(-1, lq, hd), k.reshape(-1, m, hd), v.reshape(-1, m, hd),
        bias, seed_from_rng(dropout_rng), dropout_rate, num_heads=num_heads)
    return out.reshape(*batch_shape, lq, hd)


def _try_fused(q, k, v, bias):
    """Flatten leading batch dims and dispatch to the Pallas kernel.
    Returns None when the shape/bias layout is not kernel-compatible."""
    if q.ndim < 4 or k.ndim != q.ndim:
        return None
    batch_shape = q.shape[:-3]
    lq, h, d = q.shape[-3:]
    m = k.shape[-3]
    if k.shape[:-3] != batch_shape:
        return None
    if bias is not None:
        # kernel supports head-independent bias only
        if bias.ndim < 3 or bias.shape[-3] not in (1,):
            return None
        bias = jnp.broadcast_to(
            bias, (*batch_shape, 1, lq, m)).reshape(-1, 1, lq, m)
    from candidate_reranking_cir_tpu.ops.pallas_attention import (
        fused_attention,
    )

    qf = q.reshape(-1, lq, h, d)
    kf = k.reshape(-1, m, h, d)
    vf = v.reshape(-1, m, h, d)
    out = fused_attention(qf, kf, vf, bias)
    return out.reshape(*batch_shape, lq, h, d)


def _try_fused_train(q, k, v, bias, dropout_rng, dropout_rate):
    """Training twin of ``_try_fused``: routes to the in-kernel-dropout
    Pallas kernel (ops/pallas_attention_train.py) when the call qualifies
    (head-independent bias, single-query-block length). The dropout mask is
    derived in-kernel from a seed drawn off ``dropout_rng`` — it never
    materializes in HBM, and the fused backward regenerates it exactly."""
    if q.ndim < 4 or k.ndim != q.ndim:
        return None
    batch_shape = q.shape[:-3]
    lq, h, d = q.shape[-3:]
    m = k.shape[-3]
    if k.shape[:-3] != batch_shape:
        return None
    from candidate_reranking_cir_tpu.ops.pallas_attention_train import (
        eligible,
        fused_attention_train,
        seed_from_rng,
    )

    flat_batch = 1
    for s in batch_shape:
        flat_batch *= int(s)
    if not eligible(lq, bias, m, batch=flat_batch):
        return None
    if bias is not None:
        bias = jnp.broadcast_to(
            bias, (*batch_shape, 1, lq, m)).reshape(-1, 1, lq, m)
    out = fused_attention_train(
        q.reshape(-1, lq, h, d), k.reshape(-1, m, h, d),
        v.reshape(-1, m, h, d), bias, seed_from_rng(dropout_rng),
        dropout_rate)
    return out.reshape(*batch_shape, lq, h, d)


def grid_cross_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array | None = None,
    *,
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
    deterministic: bool = True,
    fused: bool = False,
) -> jax.Array:
    """Cross-attention over a (candidate x query) grid with per-ROW shared K/V.

    The candidate-major dual of ``pair_cross_attention``: here axis 0 indexes
    candidates and axis 1 the queries scored against each candidate, so K/V
    are shared along axis 1 instead of axis 0.

    q:    [A, B, Lq, H, D]   pair states (candidate a x its b-th query)
    k, v: [A, Lk, H, D]      per-candidate keys/values, shared across the B
                             queries that rank candidate a
    bias: broadcastable to [A, B, H, Lq, Lk] or None

    Returns [A, B, Lq, H, D]. Candidate K/V projections are paid once per
    candidate per call and amortized over every query that retrieves it (the
    eval-side equivalent of the training-side score_shared saving; on CIRR
    val each corpus image recurs in ~90 queries' top-K lists).

    fused=True (deterministic, no bias) folds the query axis into the q
    sequence: per candidate the kernel attends [B*Lq] rows to that
    candidate's keys in one well-tiled program.
    """
    if (fused and (deterministic or dropout_rate == 0.0) and bias is None
            and k.ndim == 4):
        from candidate_reranking_cir_tpu.ops.pallas_attention import (
            fused_attention,
        )

        a, b, lq, h, d = q.shape
        out = fused_attention(q.reshape(a, b * lq, h, d), k, v, None)
        return out.reshape(a, b, lq, h, d)
    if (fused and dropout_rng is not None and bias is None and k.ndim == 4):
        from candidate_reranking_cir_tpu.ops.pallas_attention_train import (
            eligible,
            fused_attention_train,
            seed_from_rng,
        )

        a, b, lq, h, d = q.shape
        if eligible(b * lq, None, k.shape[-3]):
            out = fused_attention_train(q.reshape(a, b * lq, h, d), k, v,
                                        None, seed_from_rng(dropout_rng),
                                        dropout_rate)
            return out.reshape(a, b, lq, h, d)
    dtype = q.dtype
    scale = q.shape[-1] ** -0.5
    scores = jnp.einsum("ablhd,akhd->abhlk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores.astype(jnp.float32) * scale
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = probs * keep / (1.0 - dropout_rate)
    probs = probs.astype(dtype)
    out = jnp.einsum("abhlk,akhd->ablhd", probs, v,
                     preferred_element_type=jnp.float32)
    return out.astype(dtype)


def pair_cross_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array | None = None,
    *,
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
    deterministic: bool = True,
    fused: bool = False,
) -> jax.Array:
    """Cross-attention over a (query x candidate) pair grid with shared K/V.

    q:    [Q, C, Lq, H, D]   pair states (one per (query, candidate) pair)
    k, v: [C, Lk, H, D]      per-candidate keys/values, shared across all queries
    bias: broadcastable to [C, H, Lq, Lk] or None (image tokens are never padded)

    Returns [Q, C, Lq, H, D]. The einsum broadcasts K over the query axis, so the
    O(C * Lk * width^2) K/V projection cost is paid once per candidate rather than
    once per pair — the key FLOP saving over the reference's B sequential forwards.

    fused=True (deterministic, no bias) folds the query axis into the q
    sequence — per candidate c the kernel attends [Q*Lq] rows to that
    candidate's keys, a larger and better-tiled program than per-pair calls.
    """
    if (fused and (deterministic or dropout_rate == 0.0) and bias is None
            and k.ndim == 4):
        from candidate_reranking_cir_tpu.ops.pallas_attention import (
            fused_attention,
        )

        n_q, n_c, lq, h, d = q.shape
        qt = q.transpose(1, 0, 2, 3, 4).reshape(n_c, n_q * lq, h, d)
        out = fused_attention(qt, k, v, None)
        return out.reshape(n_c, n_q, lq, h, d).transpose(1, 0, 2, 3, 4)
    if (fused and dropout_rng is not None and bias is None and k.ndim == 4):
        from candidate_reranking_cir_tpu.ops.pallas_attention_train import (
            eligible,
            fused_attention_train,
            seed_from_rng,
        )

        n_q, n_c, lq, h, d = q.shape
        if eligible(n_q * lq, None, k.shape[-3]):
            # fold queries into the row axis per candidate: the dropout mask
            # is iid per (pair, head, row, key) either way
            qt = q.transpose(1, 0, 2, 3, 4).reshape(n_c, n_q * lq, h, d)
            out = fused_attention_train(qt, k, v, None,
                                        seed_from_rng(dropout_rng),
                                        dropout_rate)
            return out.reshape(n_c, n_q, lq, h, d).transpose(1, 0, 2, 3, 4)
    dtype = q.dtype
    scale = q.shape[-1] ** -0.5
    scores = jnp.einsum("qclhd,ckhd->qchlk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores.astype(jnp.float32) * scale
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)[None]
    probs = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = probs * keep / (1.0 - dropout_rate)
    probs = probs.astype(dtype)
    out = jnp.einsum("qchlk,ckhd->qclhd", probs, v,
                     preferred_element_type=jnp.float32)
    return out.astype(dtype)
