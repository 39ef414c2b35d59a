"""Global-batch contrastive loss.

The reference computes an in-batch B x B contrast on one GPU
(blip_stage1.py:91, stage1_train.py:414-417). Under data parallelism the
equivalent-and-stronger TPU formulation contrasts each device's local queries
against the target features of the ENTIRE global batch: target embeddings are
all-gathered over the mesh (256-d vectors — a few hundred KB over ICI), the
[local_B, global_B] logits stay sharded, and the softmax normalizes over the
global batch. With a 1-device mesh this reduces exactly to the reference's loss.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def global_contrastive_loss(predicted, targets, temp, axis_name: str | None):
    """predicted [B_loc, E] (normalized), targets [B_loc, E] (normalized),
    temp scalar. Returns (mean CE loss, [B_loc, B_glob] fp32 logits).

    Row i's positive is the i-th target of the same device's shard; with
    all-gather concatenation along axis 0 the global index is
    dev_index * B_loc + i.
    """
    predicted = predicted.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    if axis_name is not None:
        all_targets = jax.lax.all_gather(targets, axis_name, axis=0, tiled=True)
        dev = jax.lax.axis_index(axis_name)
    else:
        all_targets, dev = targets, 0
    logits = jnp.einsum("be,ne->bn", predicted, all_targets) / temp
    b_loc = predicted.shape[0]
    labels = dev * b_loc + jnp.arange(b_loc)
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()
    return loss, logits


def cross_entropy_rows(logits, labels):
    """Plain row-wise CE over fp32 logits (stage-II B x B loss,
    stage2_train.py:466-472)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()
