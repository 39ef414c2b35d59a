"""Jitted train steps for stage I and stage II.

SPMD style: the steps are written over GLOBAL arrays and jitted once; the batch
dimension is sharded over the mesh's data axis, parameters are replicated (or
FSDP-sharded), and XLA inserts the collectives. Consequences vs the reference:

- stage I's in-batch contrast (blip_stage1.py:91) becomes a **global-batch**
  contrast automatically: the target-feature matrix is [B_global, 256], so the
  logits row for a local query contrasts against every chip's targets (the
  all-gather of the 256-d targets rides ICI),
- stage II's B x B triplet grid (the reference's sequential Python loop,
  blip_stage2.py:78-94) is one pair-grid program, queries sharded over chips and
  candidate K/V broadcast.

The frozen producers (stage-I z_t inside stage-II training; the frozen ViT in
stage-I training by default) run inside the same jit in eval mode with stopped
gradients — zero extra host round-trips per step.
"""
from __future__ import annotations


from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from candidate_reranking_cir_tpu.models.blip_reranker import RerankerModel
from candidate_reranking_cir_tpu.models.blip_retrieval import RetrievalModel
from candidate_reranking_cir_tpu.parallel.contrastive import cross_entropy_rows


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params), tx=tx)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            opt_state=new_opt)


# --------------------------------------------------------------------------
# Stage I


_VIT_CHUNK = 32  # frozen-ViT embeds run as a lax.scan over chunks this size:
                 # at bs=512 the monolithic forward holds ~454 MB/layer of
                 # activations and runs 575 img/s; chunked-64 640 img/s;
                 # chunked-32 is the throughput peak of the batch sweep
                 # (768 img/s standalone, tools/t_vit_sweep.py — throughput
                 # FALLS with batch beyond 32 on v5e)


def _frozen_embed(model, params, images, *, pooled: bool):
    """Eval-mode ViT embed, chunked when the batch is large (frozen path
    only — no gradients flow, so the scan costs nothing in backward)."""
    def one(x):
        return model.apply(params, x, pool_and_normalize=pooled,
                           method=RetrievalModel.embed_images)

    b = images.shape[0]
    if b <= _VIT_CHUNK or b % _VIT_CHUNK:
        return one(images)
    xs = images.reshape(b // _VIT_CHUNK, _VIT_CHUNK, *images.shape[1:])

    def body(carry, xc):
        return carry, one(xc)

    _, outs = jax.lax.scan(body, 0.0, xs)
    # outs: [n_chunks, chunk, ...] array, or a (raw, pooled) tuple of them
    return jax.tree.map(lambda o: o.reshape(b, *o.shape[2:]), outs)


def stage1_loss(model: RetrievalModel, params, batch, rngs, *,
                finetune_vit: bool, train: bool = True):
    """batch: ref_images [B, H, W, 3]; input_ids, attention_mask [B, L];
    and either target_images [B, H, W, 3] or target_pooled [B, E]
    (precomputed normalized target features — valid with a frozen ViT, whose
    features are constant across epochs). Returns (loss, logits [B, B])."""
    det = not train
    if "target_pooled" in batch:
        assert not (finetune_vit and train), \
            "cached target features require a frozen ViT"
        tgt_pooled = jax.lax.stop_gradient(batch["target_pooled"])
        ref_feats = _frozen_embed(model, jax.lax.stop_gradient(params),
                                  batch["ref_images"], pooled=False)
    elif finetune_vit and train:
        ref_feats = model.apply(params, batch["ref_images"],
                                deterministic=det, rngs=rngs,
                                method=RetrievalModel.embed_images)
        _, tgt_pooled = model.apply(
            params, batch["target_images"], pool_and_normalize=True,
            deterministic=det, rngs=rngs,
            method=RetrievalModel.embed_images)
    else:
        # frozen ViT: eval mode, no gradient (stage1_train.py:396-403)
        stopped = jax.lax.stop_gradient(params)
        ref_feats = _frozen_embed(model, stopped, batch["ref_images"],
                                  pooled=False)
        _, tgt_pooled = _frozen_embed(model, stopped,
                                      batch["target_images"], pooled=True)
        tgt_pooled = jax.lax.stop_gradient(tgt_pooled)

    pred = model.apply(params, ref_feats, batch["input_ids"],
                       batch["attention_mask"], deterministic=det,
                       rngs=rngs if train else None,
                       method=RetrievalModel.fuse)
    logits = model.apply(params, pred, tgt_pooled,
                         method=RetrievalModel.contrastive_logits)
    labels = jnp.arange(logits.shape[0])
    return cross_entropy_rows(logits, labels), logits


def make_stage1_train_step(model: RetrievalModel, *, finetune_vit: bool = False,
                           donate: bool = True):
    def step(state: TrainState, batch, dropout_rng):
        rng = jax.random.fold_in(dropout_rng, state.step)

        def loss_fn(params):
            loss, _ = stage1_loss(model, params, batch, {"dropout": rng},
                                  finetune_vit=finetune_vit)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    return jax.jit(step, donate_argnums=(0,) if donate else ())


# ---------------------------------------------------------------------------
# Stage II


def stage2_loss(reranker: RerankerModel, params, z_t, tgt_feats, batch, rngs):
    logits = reranker.apply(params, z_t, batch["input_ids"],
                            batch["attention_mask"], tgt_feats,
                            deterministic=False, rngs=rngs,
                            method=RerankerModel.score_shared)
    labels = jnp.arange(logits.shape[0])
    return cross_entropy_rows(logits, labels), logits


def make_stage2_train_step(stage1: RetrievalModel, reranker: RerankerModel, *,
                           finetune_vit: bool = False, donate: bool = True):
    """The full reference pipeline of stage2_train.py:440-479 in ONE program.

    Feature sourcing matches the reference exactly: the STAGE-II model's ViT
    embeds both reference and target images (stage2_train.py:445-460) — under
    no_grad unless --blip-img-tune — and the frozen stage-I MED fuses those
    reference features into z_t (stage2_train.py:462-464). Gradients reach
    only the dual text encoder + cls head by default."""

    def step(state: TrainState, stage1_params, batch, dropout_rng):
        rng = jax.random.fold_in(dropout_rng, state.step)
        s1 = jax.lax.stop_gradient(stage1_params)

        def embed(params, images, train):
            return reranker.apply(params, images, deterministic=not train,
                                  rngs={"dropout": rng} if train else None,
                                  method=RerankerModel.embed_images)

        def loss_fn(params):
            if finetune_vit:
                ref_feats = embed(params, batch["ref_images"], True)
                tgt_feats = embed(params, batch["target_images"], True)
            else:
                frozen = jax.lax.stop_gradient(params)
                ref_feats = embed(frozen, batch["ref_images"], False)
                tgt_feats = jax.lax.stop_gradient(
                    embed(frozen, batch["target_images"], False))
            z_t = stage1.apply(s1, ref_feats, batch["input_ids"],
                               batch["attention_mask"], return_raw=True,
                               method=RetrievalModel.fuse)
            z_t = jax.lax.stop_gradient(z_t)
            loss, _ = stage2_loss(reranker, params, z_t, tgt_feats, batch,
                                  {"dropout": rng})
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    return jax.jit(step, donate_argnums=(0,) if donate else ())
