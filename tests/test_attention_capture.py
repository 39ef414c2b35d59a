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
