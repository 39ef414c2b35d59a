"""int8 feature-bank quantization.

The stage-II corpus bank ([N, 577, 768] token features) is the dominant
memory object at evaluation/serving time (CIRR-val ≈ 1 GB bf16; production
corpora scale linearly). Symmetric per-token int8 halves it again: each
(image, token) row keeps a float scale = max|x|/127, so the relative
quantization error per element is ≤ ~0.4% — scores shift slightly
(rankings are empirically stable; tests bound the logit deviation), which
is why the option is OFF by default on the parity-focused eval CLIs and
opt-in (`--index-int8`) where memory matters.

The bank is a registered pytree, so it passes through jit/scan like a
plain array; ``take_rows`` is the single gather point the schedulers use
for both representations (dequantize AFTER the gather — only the gathered
rows are ever materialized in bf16).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
class Int8Bank:
    """Quantized [N, M, W] bank: q int8 + per-(N, M) fp32 scales."""

    def __init__(self, q, scale):
        self.q = q
        self.scale = scale

    @property
    def shape(self):
        return self.q.shape

    @property
    def nbytes(self):
        return self.q.size + self.scale.size * 4

    def tree_flatten(self):
        return (self.q, self.scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def quantize_bank(feats, *, axis: int = -1) -> Int8Bank:
    """[..., W] float -> symmetric per-row int8 (scale = max|x| / 127)."""
    feats = jnp.asarray(feats)
    amax = jnp.max(jnp.abs(feats.astype(jnp.float32)), axis=axis,
                   keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(feats.astype(jnp.float32) / scale), -127, 127
                 ).astype(jnp.int8)
    return Int8Bank(q=q, scale=scale)


def dequantize(bank: Int8Bank, dtype=jnp.bfloat16):
    return (bank.q.astype(jnp.float32) * bank.scale).astype(dtype)


def take_rows(bank, idx, dtype=jnp.bfloat16):
    """Gather bank rows by leading-axis index; dequantizes int8 banks after
    the gather. Accepts a plain array (returned as-is dtype) or Int8Bank."""
    if isinstance(bank, Int8Bank):
        q = jnp.take(bank.q, idx, axis=0)
        s = jnp.take(bank.scale, idx, axis=0)
        return (q.astype(jnp.float32) * s).astype(dtype)
    return jnp.take(bank, idx, axis=0)


def bank_len(bank) -> int:
    return bank.q.shape[0] if isinstance(bank, Int8Bank) else bank.shape[0]
