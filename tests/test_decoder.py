"""Caption decoder: causal masking semantics and greedy decoding."""
import jax
import jax.numpy as jnp
import numpy as np

from candidate_reranking_cir_tpu.config import (
    RetrievalModelConfig,
    TextEncoderConfig,
    ViTConfig,
)
from candidate_reranking_cir_tpu.models.blip_decoder import (
    CaptionDecoder,
    greedy_caption,
)
from candidate_reranking_cir_tpu.models.med import TextEncoder

CFG = RetrievalModelConfig(
    vit=ViTConfig(image_size=16, patch_size=8, hidden_size=24, num_layers=1,
                  num_heads=2),
    text=TextEncoderConfig(vocab_size=48, hidden_size=24, num_layers=2,
                           num_heads=2, intermediate_size=48,
                           encoder_width=24, hidden_dropout=0.0,
                           attention_dropout=0.0),
    text_len=8)


def test_causal_mask_prefix_invariance():
    """With causal masking, logits at position t must not depend on tokens
    after t."""
    cfg = CFG.text
    enc = TextEncoder(cfg, "multimodal")
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(1, 5, 24)), jnp.float32)
    ids1 = jnp.asarray([[3, 7, 9, 11, 13, 15]], jnp.int32)
    ids2 = jnp.asarray([[3, 7, 9, 40, 41, 42]], jnp.int32)  # differ after t=2
    mask = jnp.ones((1, 6), jnp.int32)
    params = enc.init(jax.random.key(0), ids1, mask, img)
    h1 = enc.apply(params, ids1, mask, img, causal=True)
    h2 = enc.apply(params, ids2, mask, img, causal=True)
    np.testing.assert_allclose(np.asarray(h1[:, :3]), np.asarray(h2[:, :3]),
                               atol=1e-5)
    # non-causal: position 0 DOES see the suffix
    g1 = enc.apply(params, ids1, mask, img, causal=False)
    g2 = enc.apply(params, ids2, mask, img, causal=False)
    assert np.abs(np.asarray(g1[:, 0]) - np.asarray(g2[:, 0])).max() > 1e-4


def test_greedy_caption_shapes_and_eos():
    model = CaptionDecoder(CFG)
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.normal(size=(2, 16, 16, 3)), jnp.float32)
    ids = jnp.ones((2, 8), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)
    params = model.init(jax.random.key(0), images, ids, mask)

    logits = model.apply(params, images, ids, mask)
    assert logits.shape == (2, 8, 48)

    feats = model.apply(params, images,
                        method=lambda m, im: m.visual_encoder(im))
    out = greedy_caption(model, params, feats, bos_id=2, eos_id=3, pad_id=0,
                         max_len=6)
    out = np.asarray(out)
    assert out.shape == (2, 6)
    assert (out[:, 0] == 2).all()
    # after an eos, everything is pad
    for row in out:
        hits = np.where(row == 3)[0]
        if len(hits):
            assert (row[hits[0] + 1:] == 0).all()


def test_beam_caption_matches_greedy_at_one_beam():
    from candidate_reranking_cir_tpu.models.blip_decoder import beam_caption

    model = CaptionDecoder(CFG)
    rng = np.random.default_rng(2)
    images = jnp.asarray(rng.normal(size=(2, 16, 16, 3)), jnp.float32)
    ids = jnp.ones((2, 8), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)
    params = model.init(jax.random.key(0), images, ids, mask)
    feats = model.apply(params, images,
                        method=lambda m, im: m.visual_encoder(im))

    g = greedy_caption(model, params, feats, bos_id=2, eos_id=3, pad_id=0,
                       max_len=6)
    b1 = beam_caption(model, params, feats, bos_id=2, eos_id=3, pad_id=0,
                      max_len=6, num_beams=1)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(b1))


def test_beam_caption_structure():
    from candidate_reranking_cir_tpu.models.blip_decoder import beam_caption

    model = CaptionDecoder(CFG)
    rng = np.random.default_rng(3)
    images = jnp.asarray(rng.normal(size=(2, 16, 16, 3)), jnp.float32)
    ids = jnp.ones((2, 8), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)
    params = model.init(jax.random.key(1), images, ids, mask)
    feats = model.apply(params, images,
                        method=lambda m, im: m.visual_encoder(im))

    out = np.asarray(beam_caption(model, params, feats, bos_id=2, eos_id=3,
                                  pad_id=0, max_len=6, num_beams=3))
    assert out.shape == (2, 6)
    assert (out[:, 0] == 2).all()
    for row in out:
        hits = np.where(row == 3)[0]
        if len(hits):
            assert (row[hits[0] + 1:] == 0).all()


def test_cached_greedy_matches_recompute():
    """KV-cache decode == full-prefix recompute decode, token-for-token."""
    from candidate_reranking_cir_tpu.models.blip_decoder import (
        greedy_caption_cached,
    )

    model = CaptionDecoder(CFG)
    rng = np.random.default_rng(4)
    images = jnp.asarray(rng.normal(size=(3, 16, 16, 3)), jnp.float32)
    ids = jnp.ones((3, 8), jnp.int32)
    mask = jnp.ones((3, 8), jnp.int32)
    params = model.init(jax.random.key(5), images, ids, mask)
    feats = model.apply(params, images,
                        method=lambda m, im: m.visual_encoder(im))

    ref = np.asarray(greedy_caption(model, params, feats, bos_id=2, eos_id=3,
                                    pad_id=0, max_len=7))
    out = np.asarray(greedy_caption_cached(model, params, feats, bos_id=2,
                                           eos_id=3, pad_id=0, max_len=7))
    np.testing.assert_array_equal(out, ref)


def test_cached_beam_matches_recompute():
    from candidate_reranking_cir_tpu.models.blip_decoder import (
        beam_caption,
        beam_caption_cached,
    )

    model = CaptionDecoder(CFG)
    rng = np.random.default_rng(6)
    images = jnp.asarray(rng.normal(size=(2, 16, 16, 3)), jnp.float32)
    ids = jnp.ones((2, 8), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)
    params = model.init(jax.random.key(7), images, ids, mask)
    feats = model.apply(params, images,
                        method=lambda m, im: m.visual_encoder(im))

    for nb in (1, 3):
        ref = np.asarray(beam_caption(model, params, feats, bos_id=2,
                                      eos_id=3, pad_id=0, max_len=7,
                                      num_beams=nb))
        out = np.asarray(beam_caption_cached(model, params, feats, bos_id=2,
                                             eos_id=3, pad_id=0, max_len=7,
                                             num_beams=nb))
        np.testing.assert_array_equal(out, ref)
