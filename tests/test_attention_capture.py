"""Attention-map capture (the reference's save_attention_map hook parity)."""
import jax
import jax.numpy as jnp
import numpy as np

from candidate_reranking_cir_tpu.models.layers import MultiHeadAttention


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
