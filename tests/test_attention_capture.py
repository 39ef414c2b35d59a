"""Attention-map capture (the reference's save_attention_map hook parity)."""
import jax
import jax.numpy as jnp
import numpy as np

from candidate_reranking_cir_tpu.models.layers import MultiHeadAttention
import pytest


def test_capture_attention_probs():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 5, 16)), jnp.float32)
    mha = MultiHeadAttention(2, 8, 16, capture_attention=True)
    params = mha.init(jax.random.key(0), x)
    out, inter = mha.apply(params, x, mutable=["intermediates"])
    probs = inter["intermediates"]["attn_probs"][0]
    assert probs.shape == (2, 2, 5, 5)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)

    # capture path must produce identical outputs to the normal path
    mha_plain = MultiHeadAttention(2, 8, 16)
    ref = mha_plain.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_perturb_attention_gradients():
    """Functional equivalent of the reference's save_attn_gradients backward
    hook (vit.py:58-81): jax.grad w.r.t. the 'perturbations' collection
    returns dLoss/dAttnProbs, without changing forward outputs."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 5, 16)), jnp.float32)
    mha = MultiHeadAttention(2, 8, 16, perturb_attention=True)
    variables = mha.init(jax.random.key(0), x)
    params = variables["params"]
    perts = variables["perturbations"]

    def loss(perts):
        out = mha.apply({"params": params, "perturbations": perts}, x)
        return jnp.sum(out ** 2)

    grads = jax.grad(loss)(perts)
    g = grads["attn_probs"]
    assert g.shape == (2, 2, 5, 5)  # [B, H, Lq, Lk] == the probs shape
    assert np.abs(np.asarray(g)).max() > 0

    # perturbations are zeros: forward output identical to the plain path
    out = mha.apply(variables, x)
    ref = MultiHeadAttention(2, 8, 16).apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


@pytest.mark.slow
def test_capture_branch_applies_attention_dropout():
    """Regression: the capture/perturb branch drew a dropout rng but never
    applied it — training with capture_attention=True silently skipped
    attention dropout. The sowed probs stay PRE-dropout (the reference
    saves the attention map before its dropout, med.py:129-158), while the
    context must reflect the dropped probs."""
    import jax
    import jax.numpy as jnp

    from candidate_reranking_cir_tpu.models.layers import MultiHeadAttention

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 6, 16)), jnp.float32)
    m = MultiHeadAttention(2, 8, 16, jnp.float32, dropout_rate=0.5,
                           capture_attention=True)
    params = m.init({"params": jax.random.key(0),
                     "dropout": jax.random.key(1)}, x, deterministic=False)

    out_det, st = m.apply(params, x, deterministic=True,
                          mutable=["intermediates"])
    out_trn, st_trn = m.apply(params, x, deterministic=False,
                              rngs={"dropout": jax.random.key(2)},
                              mutable=["intermediates"])
    # dropout must change the context (rate 0.5 on 2x2x6x6 probs)
    assert float(jnp.max(jnp.abs(out_det - out_trn))) > 1e-6
    # sowed probs are pre-dropout in BOTH modes: rows still sum to 1
    probs = st_trn["intermediates"]["attn_probs"][0]
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)


@pytest.mark.slow
def test_med_capture_through_scan_and_query_group():
    """capture_attention threaded through TextEncoderConfig: sowed probs
    stack per layer through the nn.scan, and image-major fusion
    (query_group>1) is forced back to query-major so the layout stays
    per-query [B, H, L, M] (advisor r3: the fold would silently sow
    [G, H, Q*L, M])."""
    from candidate_reranking_cir_tpu.config import TextEncoderConfig
    from candidate_reranking_cir_tpu.models.med import TextEncoder

    cfg = TextEncoderConfig(vocab_size=40, hidden_size=16, num_layers=2,
                            num_heads=2, intermediate_size=32,
                            encoder_width=16, hidden_dropout=0.0,
                            attention_dropout=0.0, capture_attention=True)
    enc = TextEncoder(cfg, "multimodal")
    rng = np.random.default_rng(2)
    g, q, l, m = 3, 2, 5, 7
    ids = jnp.asarray(rng.integers(1, 40, size=(g * q, l)), jnp.int32)
    mask = jnp.ones((g * q, l), jnp.int32)
    img = jnp.asarray(rng.normal(size=(g, m, 16)), jnp.float32)

    params = enc.init(jax.random.key(0), ids, mask, img, query_group=q)
    out_g, st = enc.apply(params, ids, mask, img, query_group=q,
                          mutable=["intermediates"])

    # query-major reference: each query against its own repeated image
    img_rep = jnp.repeat(img, q, axis=0)
    out_ref, st_ref = enc.apply(params, ids, mask, img_rep,
                                mutable=["intermediates"])
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_ref),
                               atol=1e-5)

    layers = st["intermediates"]["layers"]
    self_probs = layers["self_attn"]["attn"]["attn_probs"][0]
    cross_probs = layers["cross_attn"]["attn"]["attn_probs"][0]
    # per-layer stacking from the scan + per-query layouts
    assert self_probs.shape == (cfg.num_layers, g * q, 2, l, l)
    assert cross_probs.shape == (cfg.num_layers, g * q, 2, l, m)
    ref_cross = st_ref["intermediates"]["layers"]["cross_attn"]["attn"][
        "attn_probs"][0]
    np.testing.assert_allclose(np.asarray(cross_probs),
                               np.asarray(ref_cross), atol=1e-6)
