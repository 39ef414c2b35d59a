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
