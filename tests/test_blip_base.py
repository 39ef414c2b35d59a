"""BlipBase feature-extraction wrapper (reference blip.py:23-74 modes)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from candidate_reranking_cir_tpu.config import (
    RetrievalModelConfig,
    TextEncoderConfig,
    ViTConfig,
)
from candidate_reranking_cir_tpu.models.blip_base import BlipBase

pytestmark = pytest.mark.slow  # full BLIP-base wrapper forwards

CFG = RetrievalModelConfig(
    vit=ViTConfig(image_size=16, patch_size=8, hidden_size=24, num_layers=2,
                  num_heads=2),
    text=TextEncoderConfig(vocab_size=48, hidden_size=24, num_layers=2,
                           num_heads=2, intermediate_size=48,
                           encoder_width=24, hidden_dropout=0.0,
                           attention_dropout=0.0),
    text_len=6)


@pytest.fixture(scope="module")
def setup():
    model = BlipBase(CFG)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(2, 16, 16, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(1, 40, size=(2, 6)), jnp.int32)
    mask = jnp.asarray([[1] * 6, [1, 1, 1, 1, 0, 0]], jnp.int32)
    params = model.init(jax.random.key(0), images, ids, mask)
    return model, params, images, ids, mask


def test_image_mode(setup):
    model, params, images, ids, mask = setup
    feats = model.apply(params, images, ids, mask, mode="image")
    # 4 patches + CLS, ViT width
    assert feats.shape == (2, 5, 24)


def test_text_mode_ignores_images_and_cross_weights(setup):
    model, params, images, ids, mask = setup
    h1 = model.apply(params, images, ids, mask, mode="text")
    h2 = model.apply(params, jnp.zeros_like(images), ids, mask, mode="text")
    assert h1.shape == (2, 6, 24)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))

    # zeroing the cross-attention weights must not change text-mode output
    import flax

    flat = flax.traverse_util.flatten_dict(params["params"])
    zeroed = {k: (jnp.zeros_like(v) if "cross_attn" in "/".join(map(str, k))
                  else v) for k, v in flat.items()}
    params_z = {"params": flax.traverse_util.unflatten_dict(zeroed)}
    h3 = model.apply(params_z, images, ids, mask, mode="text")
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h3))


def test_multimodal_mode_depends_on_image(setup):
    model, params, images, ids, mask = setup
    h1 = model.apply(params, images, ids, mask, mode="multimodal")
    h2 = model.apply(params, images * 0.5, ids, mask, mode="multimodal")
    assert h1.shape == (2, 6, 24)
    assert np.abs(np.asarray(h1) - np.asarray(h2)).max() > 1e-5


def test_convert_base_roundtrip():
    """Torch BLIP_Base-shaped state dict loads through convert_base and the
    model runs; text mode equals a torch-free init's structure."""
    import torch

    from candidate_reranking_cir_tpu.runtime import convert

    model = BlipBase(CFG)
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.normal(size=(1, 16, 16, 3)), jnp.float32)
    ids = jnp.ones((1, 6), jnp.int32)
    mask = jnp.ones((1, 6), jnp.int32)
    variables = model.init(jax.random.key(1), images, ids, mask)

    # export the equivalent stage-1 tree (visual+text) then re-import
    sd = {}
    sd.update(convert.export_vit(variables["params"]["visual_encoder"],
                                 "visual_encoder", CFG.vit.num_layers))
    sd.update(convert.export_med(variables["params"]["text_encoder"],
                                 "text_encoder", CFG.text.num_layers))
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    sd = {k: v.numpy() for k, v in sd.items()}

    restored = convert.convert_base(sd, CFG)
    out_ref = model.apply(variables, images, ids, mask, mode="multimodal")
    out = model.apply(restored, images, ids, mask, mode="multimodal")
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               atol=1e-6)
