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


@jax.jit
def _quantize_chunk(x):
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_bank(feats, *, chunk: int = 512) -> Int8Bank:
    """[N, ..., W] float -> symmetric per-last-axis-row int8
    (scale = max|x| / 127).

    Quantizes in jitted leading-axis chunks so the transient HBM peak stays
    near bank + int8 output — an eager whole-bank pass would materialize
    several full fp32 temporaries, OOMing at exactly the corpus sizes this
    feature targets."""
    feats = jnp.asarray(feats)
    qs, ss = [], []
    for s in range(0, feats.shape[0], chunk):
        q, sc = _quantize_chunk(feats[s:s + chunk])
        qs.append(q)
        ss.append(sc)
    if len(qs) == 1:
        return Int8Bank(q=qs[0], scale=ss[0])
    return Int8Bank(q=jnp.concatenate(qs), scale=jnp.concatenate(ss))


def dequantize(bank: Int8Bank, dtype=jnp.bfloat16):
    return (bank.q.astype(jnp.float32) * bank.scale).astype(dtype)


def take_rows(bank, idx, dtype=None):
    """Gather bank rows by leading-axis index; dequantizes int8 banks after
    the gather (to ``dtype``, default bf16). Plain arrays pass through in
    their own dtype unless ``dtype`` is given explicitly — a full-precision
    bank must not silently drop precision."""
    if isinstance(bank, Int8Bank):
        q = jnp.take(bank.q, idx, axis=0)
        s = jnp.take(bank.scale, idx, axis=0)
        return (q.astype(jnp.float32) * s).astype(dtype or jnp.bfloat16)
    rows = jnp.take(bank, idx, axis=0)
    return rows.astype(dtype) if dtype is not None else rows


def bank_len(bank) -> int:
    return bank.q.shape[0] if isinstance(bank, Int8Bank) else bank.shape[0]
