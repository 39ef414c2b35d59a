"""Corpus index building — the ``extract_index_features`` equivalent.

The reference iterates a DataLoader and fills fp32 GPU buffers [N, 577, 768] +
[N, 256] (utils.py:25-72), which drives its ~70 GB VRAM footprint. Here:

- image embedding runs as a fixed-shape jitted program per batch (last batch
  padded, valid rows masked off on host),
- raw token features are stored in bfloat16 — half the footprint with no
  measurable recall change (scores/softmax still fp32),
- under a multi-chip mesh the batch dim is sharded so every chip embeds its
  slice of the corpus; results gather to host.
"""
from __future__ import annotations

from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np


def iter_batches(dataset, batch_size: int) -> Iterable[tuple[list[str], np.ndarray]]:
    """Yield (names, [B, H, W, 3] float32) batches from a 'classic' dataset.

    Fast path: when the dataset's transform exposes ``batch_from_paths``
    (the native C++ pipeline's thread-pool batch decode,
    data/native_pipe.py) and errors raise (the default policy), whole
    batches decode+preprocess in ONE GIL-free native call.
    """
    batch_fn = getattr(getattr(dataset, "transform", None),
                       "batch_from_paths", None)
    if (batch_fn is not None and getattr(dataset, "mode", "") == "classic"
            and not getattr(dataset, "skip_errors", False)):
        all_names = dataset.index_names
        for start in range(0, len(all_names), batch_size):
            chunk = all_names[start:start + batch_size]
            paths = [dataset.image_path(nm) for nm in chunk]
            yield chunk, batch_fn(paths)
        return

    names, images = [], []
    for i in range(len(dataset)):
        sample = dataset[i]
        if sample is None:  # skip_errors dropped a corrupt image
            continue
        names.append(sample["name"])
        images.append(sample["image"])
        if len(names) == batch_size:
            yield names, np.stack(images)
            names, images = [], []
    if names:
        yield names, np.stack(images)


def build_index(dataset, embed_fn: Callable, batch_size: int = 32, *,
                pooled: bool = True, feature_dtype=jnp.bfloat16, mesh=None,
                shard_index: bool = False, keep_raw: bool = True):
    """Embed the whole corpus.

    embed_fn: [B, H, W, 3] -> raw [B, M, D] or (raw, pooled[B, E]) jitted fn
    (fixed B — short batches are padded then trimmed).

    mesh: optional jax Mesh — the image batch is sharded over the data axis
    so every chip embeds its slice of the corpus (multi-chip index build;
    batch_size must divide by the mesh size).

    shard_index=True (requires mesh): instead of replicating the finished
    feature bank on every chip, the corpus axis is padded to a multiple of
    the mesh size and SHARDED over it — each chip holds N/n_dev rows. This
    is the production layout for corpora that don't fit per-chip HBM
    (SURVEY.md section 5's corpus-sharded plan); consumed by
    rerank_candidate_major(index_sharded=True), which schedules each
    candidate's pairs onto the chip that owns its features.

    Returns (raw [N, M, D] feature_dtype on device, pooled [N, E] fp32 or None,
    names list). With shard_index the raw bank's leading dim is padded.
    """
    from candidate_reranking_cir_tpu.parallel.mesh import (
        batch_sharding,
        fit_mesh,
    )

    shard_mesh = fit_mesh(mesh, batch_size)
    raw_chunks, pooled_chunks, names_all = [], [], []
    for names, images in iter_batches(dataset, batch_size):
        valid = len(names)
        if valid < batch_size:  # pad to the compiled shape
            pad = np.zeros((batch_size - valid, *images.shape[1:]),
                           images.dtype)
            images = np.concatenate([images, pad])
        if shard_mesh is not None:
            images = jax.device_put(images, batch_sharding(shard_mesh, 4))
        out = embed_fn(images)
        if pooled:
            raw, pool = out
            pooled_chunks.append(np.asarray(pool[:valid], dtype=np.float32))
        else:
            raw = out
        if keep_raw:
            raw_chunks.append(np.asarray(raw[:valid].astype(feature_dtype)))
        names_all.extend(names)

    pooled_all = (jnp.asarray(np.concatenate(pooled_chunks))
                  if pooled else None)
    if not keep_raw:
        # pooled-only mode (e.g. the stage-I trainer's target-feature cache):
        # the [N, M, D] token bank is never materialized
        return None, pooled_all, names_all
    raw_np = np.concatenate(raw_chunks)
    if mesh is not None and shard_index:
        from candidate_reranking_cir_tpu.parallel.mesh import (
            batch_sharding,
            replicated,
        )

        n_dev = mesh.devices.size
        pad = (-len(raw_np)) % n_dev
        if pad:
            raw_np = np.concatenate(
                [raw_np, np.zeros((pad, *raw_np.shape[1:]), raw_np.dtype)])
        raw_all = jax.device_put(raw_np, batch_sharding(mesh, raw_np.ndim))
        if pooled_all is not None:
            pooled_all = jax.device_put(pooled_all, replicated(mesh))
        return raw_all, pooled_all, names_all
    raw_all = jnp.asarray(raw_np)
    if mesh is not None:
        # replicate the feature bank so downstream sharded programs read
        # their gathers locally instead of pulling from one chip
        from candidate_reranking_cir_tpu.parallel.mesh import replicated

        raw_all = jax.device_put(raw_all, replicated(mesh))
        if pooled_all is not None:
            pooled_all = jax.device_put(pooled_all, replicated(mesh))
    return raw_all, pooled_all, names_all


def gather_features(index_feats, names: list[str],
                    wanted: list[str]) -> jax.Array:
    """Look up rows of the index by name (the reference's name_to_feat dict,
    validate.py:121) as one device-side take."""
    pos = {n: i for i, n in enumerate(names)}
    idx = np.asarray([pos[w] for w in wanted], dtype=np.int32)
    return jnp.take(index_feats, jnp.asarray(idx), axis=0)
