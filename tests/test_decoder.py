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
import pytest

CFG = RetrievalModelConfig(
    vit=ViTConfig(image_size=16, patch_size=8, hidden_size=24, num_layers=1,
                  num_heads=2),
    text=TextEncoderConfig(vocab_size=48, hidden_size=24, num_layers=2,
                           num_heads=2, intermediate_size=48,
                           encoder_width=24, hidden_dropout=0.0,
                           attention_dropout=0.0),
    text_len=8)


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_prompt_conditioning_all_decoders():
    """prompt_ids conditioning (the reference's 'a picture of ' prefix,
    blip.py:119-127): every decode path emits [bos, *prompt, ...] rows, the
    cached paths stay token-identical to their recompute twins, and the
    prompt actually changes what gets generated."""
    from candidate_reranking_cir_tpu.models.blip_decoder import (
        beam_caption,
        beam_caption_cached,
        greedy_caption_cached,
        sample_caption_cached,
    )

    model = CaptionDecoder(CFG)
    rng = np.random.default_rng(11)
    images = jnp.asarray(rng.normal(size=(2, 16, 16, 3)), jnp.float32)
    ids = jnp.ones((2, 8), jnp.int32)
    params = model.init(jax.random.key(12), images, ids, ids)
    feats = model.apply(params, images,
                        method=lambda m, im: m.visual_encoder(im))

    prompt = (7, 11, 5)
    kw = dict(bos_id=2, eos_id=3, pad_id=0, max_len=9)
    g = np.asarray(greedy_caption(model, params, feats, prompt_ids=prompt,
                                  **kw))
    gc = np.asarray(greedy_caption_cached(model, params, feats,
                                          prompt_ids=prompt, **kw))
    np.testing.assert_array_equal(g, gc)
    np.testing.assert_array_equal(g[:, :4], [[2, 7, 11, 5]] * 2)
    g0 = np.asarray(greedy_caption(model, params, feats, **kw))
    assert not np.array_equal(g, g0)  # conditioning changes the caption

    for nb in (1, 3):
        b = np.asarray(beam_caption(model, params, feats, prompt_ids=prompt,
                                    num_beams=nb, **kw))
        bc = np.asarray(beam_caption_cached(model, params, feats,
                                            prompt_ids=prompt, num_beams=nb,
                                            **kw))
        np.testing.assert_array_equal(b, bc)
        np.testing.assert_array_equal(b[:, :4], [[2, 7, 11, 5]] * 2)
    # beam-1 == greedy under the same prompt
    b1 = np.asarray(beam_caption(model, params, feats, prompt_ids=prompt,
                                 num_beams=1, **kw))
    np.testing.assert_array_equal(b1, g)

    s = np.asarray(sample_caption_cached(model, params, feats,
                                         jax.random.key(3), min_len=6,
                                         prompt_ids=prompt, **kw))
    np.testing.assert_array_equal(s[:, :4], [[2, 7, 11, 5]] * 2)
    # min_len counts the prompt (HF cur_len): eos banned before position 6
    for row in s:
        assert not (row[:5] == 3).any()


def test_top_p_filter_hand_checked():
    """HF TopPLogitsWarper semantics on a hand-built distribution: probs
    (.5, .3, .15, .05) at top_p=0.7 keeps the minimal prefix whose
    cumulative probability reaches top_p — {0, 1} (cum .5, .8): token 1
    crosses the threshold and is kept via HF's shift-right."""
    from candidate_reranking_cir_tpu.models.blip_decoder import top_p_filter

    probs = np.asarray([[0.5, 0.3, 0.15, 0.05]])
    logits = jnp.asarray(np.log(probs), jnp.float32)
    sorted_logits, sort_idx = top_p_filter(logits, 0.7)
    kept = np.isfinite(np.asarray(sorted_logits))[0]
    order = np.asarray(sort_idx)[0]
    assert order.tolist() == [0, 1, 2, 3]
    # cum = .5, .8, .95, 1.0 -> remove where the PREVIOUS cum > .7
    assert kept.tolist() == [True, True, False, False]
    # kept logits are untouched (sampling distribution is exact)
    np.testing.assert_allclose(np.asarray(sorted_logits)[0, :2],
                               np.log(probs)[0, :2], rtol=1e-6)
    # degenerate top_p always keeps the argmax
    sorted_logits, _ = top_p_filter(logits, 0.0)
    assert np.isfinite(np.asarray(sorted_logits))[0].tolist() == [
        True, False, False, False]


def test_repetition_penalty_hand_checked():
    from candidate_reranking_cir_tpu.models.blip_decoder import (
        apply_repetition_penalty,
    )

    logits = jnp.asarray([[2.0, -2.0, 1.0, 0.5]], jnp.float32)
    ids = jnp.asarray([[0, 1, 1, 3]], jnp.int32)   # 3 masked out below
    mask = jnp.asarray([[1, 1, 1, 0]], jnp.int32)
    out = np.asarray(apply_repetition_penalty(logits, ids, mask, 2.0))
    # seen ids {0, 1}: positive /2, negative *2; id 1 penalized ONCE
    np.testing.assert_allclose(out, [[1.0, -4.0, 1.0, 0.5]], rtol=1e-6)
    # penalty 1.0 is the identity
    out = np.asarray(apply_repetition_penalty(logits, ids, mask, 1.0))
    np.testing.assert_allclose(out, np.asarray(logits))


@pytest.mark.slow
def test_sample_caption_cached_structure():
    """Nucleus decode: bos prefix, min_len eos ban, pad-after-eos, and
    determinism in the PRNG key (reference blip.py:128-151 semantics)."""
    from candidate_reranking_cir_tpu.models.blip_decoder import (
        sample_caption_cached,
    )

    model = CaptionDecoder(CFG)
    rng = np.random.default_rng(4)
    images = jnp.asarray(rng.normal(size=(3, 16, 16, 3)), jnp.float32)
    ids = jnp.ones((3, 8), jnp.int32)
    params = model.init(jax.random.key(0), images, ids, ids)
    feats = model.apply(params, images,
                        method=lambda m, im: m.visual_encoder(im))

    kw = dict(bos_id=2, eos_id=3, pad_id=0, max_len=10, min_len=6)
    out1 = np.asarray(sample_caption_cached(model, params, feats,
                                            jax.random.key(7), **kw))
    out2 = np.asarray(sample_caption_cached(model, params, feats,
                                            jax.random.key(7), **kw))
    out3 = np.asarray(sample_caption_cached(model, params, feats,
                                            jax.random.key(8), **kw))
    assert out1.shape == (3, 10)
    np.testing.assert_array_equal(out1, out2)      # key-deterministic
    assert not np.array_equal(out1, out3)          # key actually matters
    assert (out1[:, 0] == 2).all()
    for row in out1:
        # eos banned while len < min_len (bos counts, HF cur_len semantics)
        assert not (row[1:5] == 3).any()
        eos = np.flatnonzero(row == 3)
        if eos.size:                               # pad after first eos
            assert (row[eos[0] + 1:] == 0).all()
