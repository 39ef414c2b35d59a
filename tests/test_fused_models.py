"""Model-level equivalence: fused_attention=True == default XLA attention."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from candidate_reranking_cir_tpu.config import TextEncoderConfig, ViTConfig
from candidate_reranking_cir_tpu.models.dual_encoder import DualStreamEncoder
from candidate_reranking_cir_tpu.models.med import TextEncoder
from candidate_reranking_cir_tpu.models.vit import VisionTransformer
import pytest


def test_vit_fused_equals_xla():
    cfg = ViTConfig(image_size=32, patch_size=8, hidden_size=32, num_layers=2,
                    num_heads=2)
    cfg_f = dataclasses.replace(cfg, fused_attention=True)
    imgs = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 3)),
                       jnp.float32)
    model = VisionTransformer(cfg)
    params = model.init(jax.random.key(0), imgs)
    ref = model.apply(params, imgs)
    out = VisionTransformer(cfg_f).apply(params, imgs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_med_fused_equals_xla():
    cfg = TextEncoderConfig(vocab_size=64, hidden_size=32, num_layers=2,
                            num_heads=2, intermediate_size=64,
                            encoder_width=24, hidden_dropout=0.0,
                            attention_dropout=0.0)
    cfg_f = dataclasses.replace(cfg, fused_attention=True)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(1, 60, size=(2, 9)), jnp.int32)
    mask = jnp.asarray([[1] * 9, [1] * 6 + [0] * 3], jnp.int32)
    img = jnp.asarray(rng.normal(size=(2, 11, 24)), jnp.float32)
    model = TextEncoder(cfg, "multimodal")
    params = model.init(jax.random.key(0), ids, mask, img)
    ref = model.apply(params, ids, mask, img)
    out = TextEncoder(cfg_f, "multimodal").apply(params, ids, mask, img)
    valid = np.asarray(mask, bool)
    np.testing.assert_allclose(np.asarray(out)[valid], np.asarray(ref)[valid],
                               atol=3e-5)


@pytest.mark.slow
def test_dual_fused_equals_xla_both_layouts():
    cfg = TextEncoderConfig(vocab_size=64, hidden_size=32, num_layers=2,
                            num_heads=2, intermediate_size=64,
                            encoder_width=24, hidden_dropout=0.0,
                            attention_dropout=0.0, merge_mlp_from=1)
    cfg_f = dataclasses.replace(cfg, fused_attention=True)
    rng = np.random.default_rng(2)
    Q, C, L, M = 2, 3, 6, 9
    ids = jnp.asarray(rng.integers(1, 60, size=(Q, L)), jnp.int32)
    mask = jnp.asarray([[1] * L, [1] * 4 + [0] * (L - 4)], jnp.int32)
    z_t = jnp.asarray(rng.normal(size=(Q, L, 32)), jnp.float32)
    cand = jnp.asarray(rng.normal(size=(C, M, 24)), jnp.float32)

    enc = DualStreamEncoder(cfg)
    params = enc.init(jax.random.key(0), ids, mask, z_t, cand)
    ref = enc.apply(params, ids, mask, z_t, cand, shared_candidates=True)

    enc_f = DualStreamEncoder(cfg_f)
    out_shared = enc_f.apply(params, ids, mask, z_t, cand,
                             shared_candidates=True)
    np.testing.assert_allclose(np.asarray(out_shared), np.asarray(ref),
                               atol=3e-5)

    grid = jnp.broadcast_to(cand[None], (Q, C, M, 24))
    out_grid = enc_f.apply(params, ids, mask, z_t, grid,
                           shared_candidates=False)
    np.testing.assert_allclose(np.asarray(out_grid), np.asarray(ref),
                               atol=3e-5)


@pytest.mark.slow
def test_dual_indexed_equals_per_pair():
    """score_indexed (unique candidates + pair_map) == per-pair grid."""
    import jax

    from candidate_reranking_cir_tpu.config import (
        RerankerModelConfig,
        ViTConfig,
    )
    from candidate_reranking_cir_tpu.models.blip_reranker import RerankerModel

    text = TextEncoderConfig(vocab_size=64, hidden_size=32, num_layers=2,
                             num_heads=2, intermediate_size=64,
                             encoder_width=24, hidden_dropout=0.0,
                             attention_dropout=0.0, merge_mlp_from=1)
    cfg = RerankerModelConfig(
        vit=ViTConfig(image_size=16, patch_size=8, hidden_size=24,
                      num_layers=1, num_heads=2),
        text=text, text_len=6)
    model = RerankerModel(cfg)
    rng = np.random.default_rng(5)
    Q, K, U, M = 3, 4, 5, 9
    ids = jnp.asarray(rng.integers(1, 60, size=(Q, 6)), jnp.int32)
    mask = jnp.ones((Q, 6), jnp.int32)
    z_t = jnp.asarray(rng.normal(size=(Q, 6, 32)), jnp.float32)
    unique = jnp.asarray(rng.normal(size=(U, M, 24)), jnp.float32)
    pair_map = jnp.asarray(rng.integers(0, U, size=(Q, K)), jnp.int32)

    imgs = jnp.zeros((2, 16, 16, 3))
    params = model.init(jax.random.key(0), imgs, ids[:2], mask[:2], z_t[:2])

    ref = model.apply(params, z_t, ids, mask, unique[pair_map],
                      method=RerankerModel.score_per_query)
    out = model.apply(params, z_t, ids, mask, unique, pair_map,
                      method=RerankerModel.score_indexed)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_score_grid_equals_per_query():
    """Candidate-major score_grid == score_per_query on the transposed grid,
    with and without the fused-attention kernel."""
    import dataclasses as dc

    import jax

    from candidate_reranking_cir_tpu.config import (
        RerankerModelConfig,
        ViTConfig,
    )
    from candidate_reranking_cir_tpu.models.blip_reranker import RerankerModel

    text = TextEncoderConfig(vocab_size=64, hidden_size=32, num_layers=2,
                             num_heads=2, intermediate_size=64,
                             encoder_width=24, hidden_dropout=0.0,
                             attention_dropout=0.0, merge_mlp_from=1)
    cfg = RerankerModelConfig(
        vit=ViTConfig(image_size=16, patch_size=8, hidden_size=24,
                      num_layers=1, num_heads=2),
        text=text, text_len=6)
    rng = np.random.default_rng(7)
    A, B, L, M = 3, 4, 6, 9  # A candidates x B queries each
    ids = jnp.asarray(rng.integers(1, 60, size=(A, B, L)), jnp.int32)
    mask = jnp.asarray(rng.integers(0, 2, size=(A, B, L)), jnp.int32)
    mask = mask.at[:, :, 0].set(1)
    z_t = jnp.asarray(rng.normal(size=(A, B, L, 32)), jnp.float32)
    cand = jnp.asarray(rng.normal(size=(A, M, 24)), jnp.float32)

    model = RerankerModel(cfg)
    imgs = jnp.zeros((2, 16, 16, 3))
    params = model.init(jax.random.key(0), imgs, ids[0, :2], mask[0, :2],
                        z_t[0, :2])

    out = model.apply(params, z_t, ids, mask, cand,
                      method=RerankerModel.score_grid)  # [A, B]
    assert out.shape == (A, B)

    # reference: per-pair grid with queries flattened, each pair carrying its
    # own candidate copy -> [A*B, 1]
    flat = A * B
    per_pair_cand = jnp.broadcast_to(
        cand[:, None], (A, B, M, 24)).reshape(flat, 1, M, 24)
    ref = model.apply(params, z_t.reshape(flat, L, 32), ids.reshape(flat, L),
                      mask.reshape(flat, L), per_pair_cand,
                      method=RerankerModel.score_per_query)
    np.testing.assert_allclose(np.asarray(out).ravel(),
                               np.asarray(ref).ravel(), atol=2e-5)

    fused = RerankerModel(dc.replace(
        cfg, text=dc.replace(text, fused_attention=True)))
    out_f = fused.apply(params, z_t, ids, mask, cand,
                        method=RerankerModel.score_grid)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out), atol=3e-5)
