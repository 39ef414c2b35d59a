"""Device-side image preprocessing (pure JAX).

The PIL path (data/preprocessing.py) is the pixel-parity reference; this
module provides the same TargetPad -> resize -> center-crop -> CLIP-normalize
pipeline as a jittable function operating on uint8 RGB batches, so decode is
the only host work and resize/normalize ride the TPU (useful for training
throughput where bicubic-vs-PIL half-pixel differences are irrelevant).

jax.image.resize uses half-pixel-centered bicubic (like torchvision's
antialias=False bicubic up to kernel details); training is robust to this,
eval parity paths should use the PIL pipeline.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from candidate_reranking_cir_tpu.data.preprocessing import CLIP_MEAN, CLIP_STD


def pad_to_target_ratio(image: jax.Array, target_ratio: float) -> jax.Array:
    """[H, W, 3] uint8 -> zero-padded so aspect ratio <= target_ratio.

    Shapes must stay static under jit: padding amounts are computed from the
    static shape (host-side ints), mirroring data_utils.py:45-68.
    """
    h, w = image.shape[:2]
    if max(w, h) / min(w, h) < target_ratio:
        return image
    scaled_max_wh = max(w, h) / target_ratio
    hp = max(int((scaled_max_wh - w) / 2), 0)
    vp = max(int((scaled_max_wh - h) / 2), 0)
    return jnp.pad(image, ((vp, vp), (hp, hp), (0, 0)))


def resize_and_crop(image: jax.Array, dim: int) -> jax.Array:
    """Short side -> dim (bicubic), then center crop to [dim, dim, 3]."""
    h, w = image.shape[:2]
    if w <= h:
        new_w, new_h = dim, max(int(round(h * dim / w)), dim)
    else:
        new_w, new_h = max(int(round(w * dim / h)), dim), dim
    img = jax.image.resize(image.astype(jnp.float32), (new_h, new_w, 3),
                           "bicubic")
    top = int(round((new_h - dim) / 2.0))
    left = int(round((new_w - dim) / 2.0))
    return jax.lax.dynamic_slice(img, (top, left, 0), (dim, dim, 3))


def normalize_clip(images01: jax.Array) -> jax.Array:
    mean = jnp.asarray(CLIP_MEAN)
    std = jnp.asarray(CLIP_STD)
    return (images01 - mean) / std


def preprocess_image(image: jax.Array, dim: int = 384,
                     target_ratio: float = 1.25) -> jax.Array:
    """Full single-image pipeline: uint8 [H, W, 3] -> normalized float32
    [dim, dim, 3]. Static per input shape (jit once per source resolution)."""
    img = pad_to_target_ratio(image, target_ratio)
    img = resize_and_crop(img, dim)
    return normalize_clip(img / 255.0)


@partial(jax.jit, static_argnums=(1,))
def preprocess_batch_uniform(images: jax.Array, dim: int) -> jax.Array:
    """[B, H, W, 3] uint8 batch of same-size images (already padded on host)
    -> normalized [B, dim, dim, 3]."""
    return jax.vmap(lambda im: normalize_clip(
        resize_and_crop(im, dim) / 255.0))(images)
