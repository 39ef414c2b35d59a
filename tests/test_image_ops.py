"""Device-side preprocessing (ops/image_ops.py) vs the PIL parity path."""
import numpy as np
import pytest

import jax.numpy as jnp

from candidate_reranking_cir_tpu.data.preprocessing import (
    CLIP_MEAN,
    CLIP_STD,
    make_transform,
)
from candidate_reranking_cir_tpu.ops.image_ops import (
    normalize_clip,
    pad_to_target_ratio,
    preprocess_image,
)


def test_pad_to_target_ratio_matches_host_logic():
    import PIL.Image

    arr = np.random.default_rng(0).integers(0, 255, size=(40, 100, 3),
                                            dtype=np.uint8)
    out = np.asarray(pad_to_target_ratio(jnp.asarray(arr), 1.25))
    # host reference: TargetPad pads to ratio 1.25
    from candidate_reranking_cir_tpu.data.preprocessing import target_pad

    host = np.asarray(target_pad(PIL.Image.fromarray(arr), 1.25))
    assert out.shape == host.shape
    np.testing.assert_array_equal(out, host)

    # below-ratio images pass through
    sq = np.zeros((50, 50, 3), np.uint8)
    assert pad_to_target_ratio(jnp.asarray(sq), 1.25).shape == (50, 50, 3)


def test_normalize_clip_matches_host():
    x = np.random.default_rng(1).random((4, 4, 3)).astype(np.float32)
    out = np.asarray(normalize_clip(jnp.asarray(x)))
    ref = (x - CLIP_MEAN) / CLIP_STD
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_device_pipeline_close_to_pil():
    """jax.image bicubic differs from PIL bicubic in kernel details; the two
    pipelines must agree closely on smooth content (training-tolerant), with
    identical shapes and normalization."""
    import PIL.Image

    rng = np.random.default_rng(2)
    # smooth image: low-frequency gradient + mild noise
    yy, xx = np.mgrid[0:60, 0:48]
    base = (np.stack([yy, xx, yy + xx], -1) % 255).astype(np.float32)
    smooth = (0.8 * base + 10).astype(np.uint8)

    dev = np.asarray(preprocess_image(jnp.asarray(smooth), dim=32,
                                      target_ratio=1.25))
    pil = make_transform("targetpad", 32, 1.25)(PIL.Image.fromarray(smooth))
    assert dev.shape == pil.shape == (32, 32, 3)
    # mean abs difference small relative to the CLIP-normalized range (~5)
    assert np.abs(dev - pil).mean() < 0.12
