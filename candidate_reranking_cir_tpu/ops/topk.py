"""Top-K retrieval primitives.

Replaces the reference's monolithic full-corpus argsort (validate.py:202-204) with
TPU-friendly pieces:

- ``cosine_rank``: distances = 1 - pred @ index.T, full stable ascending ranking
  (exact argsort semantics the metric engine / golden files need);
- ``cosine_topk``: jax.lax.top_k on the similarity — O(N log K) instead of a full
  sort when only the top K matter;
- ``sharded_cosine_topk``: per-shard top-k + gather-merge for a corpus sharded
  over the mesh (the multi-chip index path; see parallel/sharded docstring).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cosine_scores(pred: jax.Array, index: jax.Array) -> jax.Array:
    """[Q, E] x [N, E] -> [Q, N] similarity, fp32 on the MXU."""
    return jnp.einsum("qe,ne->qn", pred.astype(jnp.float32),
                      index.astype(jnp.float32),
                      preferred_element_type=jnp.float32)


def cosine_rank(pred: jax.Array, index: jax.Array) -> jax.Array:
    """Full ascending-by-distance ranking. Stable, so equal scores keep index
    order — deterministic goldens (torch.argsort-compatible ordering for the
    common no-ties case)."""
    distances = 1.0 - cosine_scores(pred, index)
    return jnp.argsort(distances, axis=-1, stable=True)


def cosine_topk(pred: jax.Array, index: jax.Array, k: int):
    """Top-k by similarity. Returns (scores [Q, k], indices [Q, k])."""
    sims = cosine_scores(pred, index)
    return jax.lax.top_k(sims, k)


def sharded_cosine_topk(pred: jax.Array, index_shard: jax.Array, k: int,
                        axis_name: str, shard_offset: jax.Array):
    """Inside shard_map: each device ranks its corpus shard, then the per-shard
    candidates are all-gathered and re-ranked — O(k * n_dev) merge instead of a
    global sort. ``shard_offset`` maps local to global corpus indices."""
    sims, local_idx = cosine_topk(pred, index_shard, k)
    global_idx = local_idx + shard_offset
    all_sims = jax.lax.all_gather(sims, axis_name, axis=-1, tiled=True)
    all_idx = jax.lax.all_gather(global_idx, axis_name, axis=-1, tiled=True)
    merged_sims, merged_pos = jax.lax.top_k(all_sims, k)
    merged_idx = jnp.take_along_axis(all_idx, merged_pos, axis=-1)
    return merged_sims, merged_idx
