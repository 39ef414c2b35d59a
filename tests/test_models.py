"""Shape/semantics tests for the Flax model stack."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from candidate_reranking_cir_tpu.config import (
    RerankerModelConfig,
    RetrievalModelConfig,
    TextEncoderConfig,
    ViTConfig,
)
from candidate_reranking_cir_tpu.models.blip_reranker import RerankerModel
from candidate_reranking_cir_tpu.models.blip_retrieval import RetrievalModel
from candidate_reranking_cir_tpu.models.dual_encoder import DualStreamEncoder
from candidate_reranking_cir_tpu.models.med import TextEncoder
from candidate_reranking_cir_tpu.models.vit import VisionTransformer


@pytest.mark.slow
def test_vit_shapes(tiny_vit_cfg):
    model = VisionTransformer(tiny_vit_cfg)
    imgs = jnp.ones((2, 32, 32, 3))
    params = model.init(jax.random.key(0), imgs)
    out = model.apply(params, imgs)
    assert out.shape == (2, tiny_vit_cfg.num_tokens, 24)
    assert out.shape[1] == (32 // 8) ** 2 + 1
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_med_text_vs_multimodal(tiny_text_cfg):
    cfg = tiny_text_cfg
    ids = jnp.array([[2, 5, 6, 7, 3, 0, 0, 0]], dtype=jnp.int32)
    mask = jnp.array([[1, 1, 1, 1, 1, 0, 0, 0]], dtype=jnp.int32)
    img = jnp.ones((1, 17, cfg.encoder_width))

    mm = TextEncoder(cfg, "multimodal")
    params = mm.init(jax.random.key(0), ids, mask, img)
    out = mm.apply(params, ids, mask, img)
    assert out.shape == (1, 8, cfg.hidden_size)

    txt = TextEncoder(cfg, "text")
    params_t = txt.init(jax.random.key(0), ids, mask)
    out_t = txt.apply(params_t, ids, mask)
    assert out_t.shape == (1, 8, cfg.hidden_size)


@pytest.mark.slow
def test_med_padding_invariance(tiny_text_cfg):
    """CLS output must not depend on content at masked positions — the static
    pad-to-bucket design relies on this (reference pads to longest instead)."""
    cfg = tiny_text_cfg
    img = jnp.asarray(np.random.default_rng(1).normal(size=(1, 9, cfg.encoder_width)),
                      jnp.float32)
    ids1 = jnp.array([[2, 5, 6, 3, 0, 0]], dtype=jnp.int32)
    ids2 = jnp.array([[2, 5, 6, 3, 9, 9]], dtype=jnp.int32)  # junk in padding
    mask = jnp.array([[1, 1, 1, 1, 0, 0]], dtype=jnp.int32)
    model = TextEncoder(cfg, "multimodal")
    params = model.init(jax.random.key(0), ids1, mask, img)
    out1 = model.apply(params, ids1, mask, img)
    out2 = model.apply(params, ids2, mask, img)
    np.testing.assert_allclose(out1[:, 0], out2[:, 0], atol=1e-5)

    # and a longer bucket with the same content gives the same CLS
    ids3 = jnp.array([[2, 5, 6, 3, 0, 0, 0, 0, 0, 0]], dtype=jnp.int32)
    mask3 = jnp.array([[1, 1, 1, 1, 0, 0, 0, 0, 0, 0]], dtype=jnp.int32)
    out3 = model.apply(params, ids3, mask3, img)
    np.testing.assert_allclose(out1[:, 0], out3[:, 0], atol=1e-5)


@pytest.mark.slow
def test_retrieval_model_end_to_end():
    cfg = RetrievalModelConfig(
        vit=ViTConfig(image_size=32, patch_size=8, hidden_size=24, num_layers=2,
                      num_heads=4),
        text=TextEncoderConfig(vocab_size=64, hidden_size=32, num_layers=2,
                               num_heads=4, intermediate_size=64,
                               encoder_width=24, hidden_dropout=0.0,
                               attention_dropout=0.0),
        embed_dim=16, text_len=8)
    model = RetrievalModel(cfg)
    imgs = jnp.ones((3, 32, 32, 3))
    ids = jnp.ones((3, 8), dtype=jnp.int32)
    mask = jnp.ones((3, 8), dtype=jnp.int32)
    params = model.init(jax.random.key(0), imgs, ids, mask)

    feats, pooled = model.apply(params, imgs, pool_and_normalize=True,
                                method=RetrievalModel.embed_images)
    assert feats.shape == (3, 17, 24)
    assert pooled.shape == (3, 16)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(pooled), axis=-1),
                               1.0, atol=1e-5)

    pred = model.apply(params, feats, ids, mask, method=RetrievalModel.fuse)
    assert pred.shape == (3, 16)
    z_t = model.apply(params, feats, ids, mask, return_raw=True,
                      method=RetrievalModel.fuse)
    assert z_t.shape == (3, 8, 32)

    logits = model.apply(params, pred, pooled,
                         method=RetrievalModel.contrastive_logits)
    assert logits.shape == (3, 3)
    # self-similarity of normalized vectors / temp = 1 / 0.07
    self_logits = model.apply(params, pred, pred,
                              method=RetrievalModel.contrastive_logits)
    np.testing.assert_allclose(np.diag(np.asarray(self_logits)), 1.0 / 0.07,
                               rtol=1e-4)


@pytest.fixture(scope="module")
def dual_setup():
    cfg = TextEncoderConfig(
        vocab_size=64, hidden_size=32, num_layers=4, num_heads=4,
        intermediate_size=64, encoder_width=24, hidden_dropout=0.0,
        attention_dropout=0.0, merge_mlp_from=2)
    enc = DualStreamEncoder(cfg)
    rng = np.random.default_rng(2)
    Q, C, L, M = 3, 4, 6, 9
    ids = jnp.asarray(rng.integers(4, 60, size=(Q, L)), jnp.int32)
    mask = jnp.asarray((rng.random((Q, L)) > 0.2).astype(np.int32))
    mask = mask.at[:, 0].set(1)
    z_t = jnp.asarray(rng.normal(size=(Q, L, 32)), jnp.float32)
    cand = jnp.asarray(rng.normal(size=(C, M, 24)), jnp.float32)
    params = enc.init(jax.random.key(0), ids, mask, z_t, cand)
    return enc, params, ids, mask, z_t, cand


@pytest.mark.slow
def test_dual_encoder_shapes(dual_setup):
    enc, params, ids, mask, z_t, cand = dual_setup
    out = enc.apply(params, ids, mask, z_t, cand, shared_candidates=True)
    assert out.shape == (3, 4, 64)  # [Q, C, 2*hidden]


@pytest.mark.slow
def test_dual_encoder_shared_equals_grid(dual_setup):
    """The shared-candidate fast path (K/V once per candidate) must score
    identically to the general per-pair grid path."""
    enc, params, ids, mask, z_t, cand = dual_setup
    out_shared = enc.apply(params, ids, mask, z_t, cand, shared_candidates=True)
    grid = jnp.broadcast_to(cand[None], (3, *cand.shape))
    out_grid = enc.apply(params, ids, mask, z_t, grid, shared_candidates=False)
    np.testing.assert_allclose(np.asarray(out_shared), np.asarray(out_grid),
                               atol=1e-5)


@pytest.mark.slow
def test_dual_encoder_pair_independence(dual_setup):
    """Pair (i, j) must depend only on query i and candidate j — i.e. the pair
    grid is equivalent to the reference's loop over single (query, candidate)
    forwards."""
    enc, params, ids, mask, z_t, cand = dual_setup
    full = enc.apply(params, ids, mask, z_t, cand, shared_candidates=True)
    # score pair (1, 2) alone
    single = enc.apply(params, ids[1:2], mask[1:2], z_t[1:2], cand[2:3],
                       shared_candidates=True)
    np.testing.assert_allclose(np.asarray(full[1, 2]), np.asarray(single[0, 0]),
                               atol=1e-5)


@pytest.mark.slow
def test_reranker_model():
    cfg = RerankerModelConfig(
        vit=ViTConfig(image_size=32, patch_size=8, hidden_size=24, num_layers=2,
                      num_heads=4, drop_path_rate=0.1),
        text=TextEncoderConfig(vocab_size=64, hidden_size=32, num_layers=2,
                               num_heads=4, intermediate_size=64,
                               encoder_width=24, hidden_dropout=0.0,
                               attention_dropout=0.0, merge_mlp_from=1),
        text_len=6)
    model = RerankerModel(cfg)
    B, L = 2, 6
    imgs = jnp.ones((B, 32, 32, 3))
    ids = jnp.ones((B, L), dtype=jnp.int32)
    mask = jnp.ones((B, L), dtype=jnp.int32)
    z_t = jnp.ones((B, L, 32))
    params = model.init(jax.random.key(0), imgs, ids, mask, z_t)

    feats = model.apply(params, imgs, method=RerankerModel.embed_images)
    assert feats.shape == (B, 17, 24)

    scores = model.apply(params, z_t, ids, mask, feats,
                         method=RerankerModel.score_shared)
    assert scores.shape == (B, B)
    assert scores.dtype == jnp.float32

    # per-query candidates: [Q, K, M, W]
    grid = jnp.broadcast_to(feats[None], (B, B, 17, 24))
    scores2 = model.apply(params, z_t, ids, mask, grid,
                          method=RerankerModel.score_per_query)
    np.testing.assert_allclose(np.asarray(scores), np.asarray(scores2), atol=1e-5)


@pytest.mark.slow
def test_vit_large_factory_and_forward():
    """'large' factory matches the reference create_vit dims
    (blip.py:194-209: 1024 hidden / 24 layers / 16 heads) and the module
    runs end-to-end (tiny image so CPU stays fast)."""
    import dataclasses

    from candidate_reranking_cir_tpu.config import vit_config
    from candidate_reranking_cir_tpu.models.vit import VisionTransformer

    cfg = vit_config("large", 384)
    assert (cfg.hidden_size, cfg.num_layers, cfg.num_heads) == (1024, 24, 16)
    assert cfg.head_dim == 64 and cfg.num_tokens == 577

    small = dataclasses.replace(vit_config("large", 32), num_layers=2)
    model = VisionTransformer(small, jnp.float32)
    x = jnp.zeros((1, 32, 32, 3))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out.shape == (1, small.num_tokens, 1024)


def test_exact_gelu_contract():
    """exact_gelu: bitwise nn.gelu(approximate=False) in fp32; <=1-ulp
    bf16-domain deviation from the lax.erf form; correct gradient at 0."""
    from candidate_reranking_cir_tpu.models.layers import exact_gelu
    from flax import linen as nn

    x = jnp.asarray(np.linspace(-12.0, 12.0, 20001), jnp.float32)
    assert float(jnp.max(jnp.abs(
        exact_gelu(x) - nn.gelu(x, approximate=False)))) == 0.0

    xb = x.astype(jnp.bfloat16)
    got = np.asarray(exact_gelu(xb).astype(jnp.float32))
    ref = np.asarray(nn.gelu(xb, approximate=False).astype(jnp.float32))
    # nn.gelu on bf16 runs its erf in bf16, while exact_gelu upcasts to
    # fp32 internally — so each is within ~1-2 bf16 ulps of the true gelu
    # and of each other (got is the more accurate of the two)
    bound = np.maximum(np.abs(ref) * 2.0 ** -6, 2e-3)
    assert (np.abs(got - ref) <= bound).all()

    g0 = jax.grad(lambda v: exact_gelu(v).sum())(
        jnp.zeros((1,), jnp.bfloat16))
    np.testing.assert_allclose(np.asarray(g0, np.float32), [0.5], atol=1e-3)

    # fp32 gradient matches the exact form away from 0
    xs = jnp.asarray([-3.0, -1.0, -0.1, 0.1, 1.0, 3.0], jnp.float32)
    g_fast = jax.vmap(jax.grad(lambda v: exact_gelu(v)))(xs)
    g_ref = jax.vmap(jax.grad(lambda v: nn.gelu(v, approximate=False)))(xs)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                               atol=1e-6)
