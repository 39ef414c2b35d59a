"""Optimizer and LR schedule construction.

Parity with the reference trainer (stage1_train.py:117, 356; utils.py:216-221):
AdamW(weight_decay=0.05) over trainable parameters only (the ViT is frozen unless
--blip-img-tune), with a per-epoch cosine LR decay
lr(e) = (init - min) * 0.5 * (1 + cos(pi * e / max_epoch)) + min.

TPU framing: freezing is an optax mask (frozen leaves carry no optimizer state),
the schedule is a function of the global step with a steps-per-epoch divisor, and
gradient accumulation is optax.MultiSteps instead of manual loss scaling
(stage1_train.py:186-191).
"""
from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from candidate_reranking_cir_tpu.config import TrainConfig


def cosine_epoch_schedule(init_lr: float, min_lr: float, max_epoch: int,
                          steps_per_epoch: int) -> Callable:
    """Epoch-granular cosine decay (reference utils.py:216-221): the LR is
    constant within an epoch and steps down between epochs."""

    def schedule(step):
        epoch = jnp.floor_divide(step, max(steps_per_epoch, 1))
        return (init_lr - min_lr) * 0.5 * (
            1.0 + jnp.cos(math.pi * epoch / max_epoch)) + min_lr

    return schedule


def warmup_schedule(init_lr: float, max_lr: float, max_step: int) -> Callable:
    """Linear warmup (reference utils.py:223-228)."""

    def schedule(step):
        return jnp.minimum(max_lr,
                           init_lr + (max_lr - init_lr) * step / max_step)

    return schedule


def step_epoch_schedule(init_lr: float, min_lr: float, decay_rate: float,
                        steps_per_epoch: int) -> Callable:
    """Stepwise exponential decay per epoch (reference utils.py:230-235)."""

    def schedule(step):
        epoch = jnp.floor_divide(step, max(steps_per_epoch, 1))
        return jnp.maximum(min_lr, init_lr * decay_rate ** epoch)

    return schedule


def exp_epoch_schedule(init_lr: float, gamma: float,
                       steps_per_epoch: int) -> Callable:
    """Multiplicative per-epoch decay (reference utils.py:237-241)."""

    def schedule(step):
        epoch = jnp.floor_divide(step, max(steps_per_epoch, 1))
        return init_lr * gamma ** epoch

    return schedule


def trainable_mask(params, freeze_prefixes: tuple[str, ...]):
    """True for trainable leaves; any path whose first components match one of
    ``freeze_prefixes`` (e.g. ('visual_encoder',)) is frozen."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_frozen(path):
        keys = tuple(getattr(p, "key", getattr(p, "idx", None)) for p in path)
        return any(keys[: len(pref)] == pref
                   for pref in (tuple(p.split("/")) for p in freeze_prefixes))

    mask_flat = [not path_frozen(path) for path, _ in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, mask_flat)


def make_optimizer(cfg: TrainConfig, params, steps_per_epoch: int, *,
                   freeze_prefixes: tuple[str, ...] = ()):
    schedule = cosine_epoch_schedule(cfg.learning_rate, cfg.min_lr,
                                     cfg.cosine_max_epoch, steps_per_epoch)
    tx = optax.adamw(learning_rate=schedule, b1=0.9, b2=0.999, eps=1e-8,
                     weight_decay=cfg.weight_decay)
    if freeze_prefixes:
        mask = trainable_mask(params, freeze_prefixes)
        tx = optax.masked(tx, mask)
    if cfg.grad_accumulation > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accumulation)
    return tx, schedule
