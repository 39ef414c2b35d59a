"""Train-mode fused attention kernel (in-kernel dropout, fused backward).

Runs in interpret mode on CPU — the mask hash is plain int32 arithmetic, so
these tests validate the exact masks/gradients the TPU kernel produces.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from candidate_reranking_cir_tpu.ops.attention import (
    dot_product_attention,
    make_additive_mask,
    pair_cross_attention,
)
from candidate_reranking_cir_tpu.ops.pallas_attention_train import (
    fused_attention_train,
    reference_keep_mask,
    seed_from_rng,
)


def _rand(key, *shape, dtype=jnp.float32):
    return jax.random.normal(jax.random.key(key), shape, dtype) * 0.3


def _xla_attention(q, k, v, bias, keep=None, rate=0.0):
    scale = q.shape[-1] ** -0.5
    scores = jnp.einsum("blhd,bmhd->bhlm", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores.astype(jnp.float32) * scale
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    if keep is not None:
        probs = jnp.where(keep, probs / (1.0 - rate), 0.0)
    return jnp.einsum("bhlm,bmhd->blhd", probs.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _expected_keep(seed, b, h, lq, m, rate):
    """Replicate the kernel's per-(batch, head) mask (logical shapes — the
    kernel's blocks match the logical dims exactly, no padding)."""
    full = np.stack([
        np.stack([np.asarray(reference_keep_mask(seed, bi, hi,
                                                 (lq, m), rate))
                  for hi in range(h)])
        for bi in range(b)])
    return jnp.asarray(full)


SEED = jnp.array([12345], jnp.int32)


@pytest.mark.slow
def test_p0_matches_xla():
    q = _rand(0, 3, 17, 4, 32)
    k = _rand(1, 3, 41, 4, 32)
    v = _rand(2, 3, 41, 4, 32)
    out = fused_attention_train(q, k, v, None, SEED, 0.0)
    ref = _xla_attention(q, k, v, None)
    np.testing.assert_allclose(out, ref, atol=2e-5)


@pytest.mark.slow
def test_p0_with_bias_matches_xla():
    q = _rand(0, 2, 9, 4, 32)
    k = _rand(1, 2, 21, 4, 32)
    v = _rand(2, 2, 21, 4, 32)
    mask = (jnp.arange(21)[None] < jnp.array([[13], [21]])).astype(jnp.int32)
    bias = make_additive_mask(mask)  # [B, 1, 1, M]
    bias = jnp.broadcast_to(bias, (2, 1, 9, 21))
    out = fused_attention_train(q, k, v, bias, SEED, 0.0)
    ref = _xla_attention(q, k, v, bias[:, :, :, :])
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_dropout_matches_xla_with_replicated_mask():
    b, lq, m, h, d = 2, 9, 21, 4, 32
    rate = 0.1
    q = _rand(0, b, lq, h, d)
    k = _rand(1, b, m, h, d)
    v = _rand(2, b, m, h, d)
    out = fused_attention_train(q, k, v, None, SEED, rate)
    keep = _expected_keep(SEED[0], b, h, lq, m, rate)
    ref = _xla_attention(q, k, v, None, keep=keep, rate=rate)
    np.testing.assert_allclose(out, ref, atol=2e-5)


@pytest.mark.slow
def test_dropout_gradients_match_xla_with_replicated_mask():
    b, lq, m, h, d = 2, 7, 19, 2, 16
    rate = 0.25
    q = _rand(0, b, lq, h, d)
    k = _rand(1, b, m, h, d)
    v = _rand(2, b, m, h, d)
    cot = _rand(3, b, lq, h, d)
    keep = _expected_keep(SEED[0], b, h, lq, m, rate)

    def fused_loss(q, k, v):
        return jnp.vdot(fused_attention_train(q, k, v, None, SEED, rate), cot)

    def xla_loss(q, k, v):
        return jnp.vdot(_xla_attention(q, k, v, None, keep=keep, rate=rate),
                        cot)

    gf = jax.grad(fused_loss, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(xla_loss, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(a, b_, atol=3e-5)


@pytest.mark.slow
def test_gradients_with_bias_and_dropout():
    b, lq, m, h, d = 2, 9, 9, 2, 16
    rate = 0.1
    q = _rand(0, b, lq, h, d)
    k = _rand(1, b, m, h, d)
    v = _rand(2, b, m, h, d)
    cot = _rand(3, b, lq, h, d)
    mask = (jnp.arange(m)[None] < jnp.array([[6], [9]])).astype(jnp.int32)
    bias = jnp.broadcast_to(make_additive_mask(mask), (b, 1, lq, m))
    keep = _expected_keep(SEED[0], b, h, lq, m, rate)

    def fused_loss(q, k, v):
        return jnp.vdot(fused_attention_train(q, k, v, bias, SEED, rate), cot)

    def xla_loss(q, k, v):
        return jnp.vdot(_xla_attention(q, k, v, bias, keep=keep, rate=rate),
                        cot)

    gf = jax.grad(fused_loss, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(xla_loss, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(a, b_, atol=3e-5)


def test_keep_rate_statistics():
    rate = 0.1
    masks = _expected_keep(777, 4, 4, 64, 128, rate)
    got = 1.0 - float(jnp.mean(masks.astype(jnp.float32)))
    assert abs(got - rate) < 0.01, got


def test_mask_distinct_across_batch_and_head():
    m0 = reference_keep_mask(42, 0, 0, (64, 128), 0.5)
    m1 = reference_keep_mask(42, 1, 0, (64, 128), 0.5)
    m2 = reference_keep_mask(42, 0, 1, (64, 128), 0.5)
    assert not bool(jnp.array_equal(m0, m1))
    assert not bool(jnp.array_equal(m0, m2))
    # deterministic
    np.testing.assert_array_equal(m0, reference_keep_mask(42, 0, 0, (64, 128), 0.5))


def test_dot_product_attention_fused_train_route(monkeypatch):
    """The public entry routes dropout+fused calls through the kernel."""
    from candidate_reranking_cir_tpu.ops import pallas_attention_train as pat

    monkeypatch.setattr(pat, "MIN_KV", 0)
    monkeypatch.setattr(pat, "MIN_ROWS", 0)
    b, lq, m, h, d = 2, 9, 21, 4, 32
    q = _rand(0, b, lq, h, d)
    k = _rand(1, b, m, h, d)
    v = _rand(2, b, m, h, d)
    rng = jax.random.key(3)
    out = dot_product_attention(q, k, v, None, dropout_rate=0.1,
                                dropout_rng=rng, deterministic=False,
                                fused=True)
    seed = seed_from_rng(rng)
    expect = fused_attention_train(q, k, v, None, seed, 0.1)
    np.testing.assert_allclose(out, expect, atol=1e-6)
    # and the result differs from the no-dropout path (mask actually applied)
    det = dot_product_attention(q, k, v, None, deterministic=True)
    assert float(jnp.max(jnp.abs(out - det))) > 1e-3


@pytest.mark.slow
def test_pair_cross_attention_fused_train_route(monkeypatch):
    from candidate_reranking_cir_tpu.ops import pallas_attention_train as pat

    monkeypatch.setattr(pat, "MIN_KV", 0)
    monkeypatch.setattr(pat, "MIN_ROWS", 0)
    n_q, n_c, lq, m, h, d = 3, 4, 5, 21, 2, 16
    q = _rand(0, n_q, n_c, lq, h, d)
    k = _rand(1, n_c, m, h, d)
    v = _rand(2, n_c, m, h, d)
    rng = jax.random.key(3)
    out = pair_cross_attention(q, k, v, None, dropout_rate=0.1,
                               dropout_rng=rng, deterministic=False,
                               fused=True)
    assert out.shape == (n_q, n_c, lq, h, d)
    seed = seed_from_rng(rng)
    qt = q.transpose(1, 0, 2, 3, 4).reshape(n_c, n_q * lq, h, d)
    expect = fused_attention_train(qt, k, v, None, seed, 0.1)
    expect = expect.reshape(n_c, n_q, lq, h, d).transpose(1, 0, 2, 3, 4)
    np.testing.assert_allclose(out, expect, atol=1e-6)


@pytest.mark.slow
def test_stage2_train_step_routes_through_kernel(monkeypatch):
    """A real (tiny) stage-II train step with text fused_attention=True must
    dispatch the train kernel (self-attn with bias + pair-grid cross-attn)
    and produce a finite loss / changed params."""
    from candidate_reranking_cir_tpu.config import (
        RerankerModelConfig,
        RetrievalModelConfig,
        TextEncoderConfig,
        TrainConfig,
        ViTConfig,
    )
    from candidate_reranking_cir_tpu.models.blip_reranker import RerankerModel
    from candidate_reranking_cir_tpu.models.blip_retrieval import (
        RetrievalModel,
    )
    from candidate_reranking_cir_tpu.runtime.optim import make_optimizer
    from candidate_reranking_cir_tpu.runtime.train_steps import (
        TrainState,
        make_stage2_train_step,
    )
    from candidate_reranking_cir_tpu.ops import pallas_attention_train as pat

    calls = []
    real = pat._fwd_impl

    def counting(*a, **kw):
        calls.append(a[0].shape)
        return real(*a, **kw)

    monkeypatch.setattr(pat, "_fwd_impl", counting)
    monkeypatch.setattr(pat, "MIN_KV", 0)
    monkeypatch.setattr(pat, "MIN_ROWS", 0)

    vit = ViTConfig(image_size=16, patch_size=8, hidden_size=16, num_layers=1,
                    num_heads=2, fused_attention=True)
    text = TextEncoderConfig(vocab_size=64, hidden_size=16, num_layers=2,
                             num_heads=2, intermediate_size=32,
                             encoder_width=16, merge_mlp_from=1,
                             fused_attention=True)
    s1_cfg = RetrievalModelConfig(vit=vit, text=text, embed_dim=8)
    s2_cfg = RerankerModelConfig(vit=vit, text=text)
    s1 = RetrievalModel(s1_cfg)
    s2 = RerankerModel(s2_cfg)
    b, L = 3, 6
    rng = np.random.default_rng(0)
    batch = {
        "ref_images": jnp.asarray(rng.normal(size=(b, 16, 16, 3)),
                                  jnp.float32),
        "target_images": jnp.asarray(rng.normal(size=(b, 16, 16, 3)),
                                     jnp.float32),
        "input_ids": jnp.asarray(rng.integers(1, 64, size=(b, L)), jnp.int32),
        "attention_mask": jnp.ones((b, L), jnp.int32),
    }
    s1_params = s1.init(jax.random.key(1), batch["ref_images"][:2],
                        batch["input_ids"][:2], batch["attention_mask"][:2])
    z_dummy = jnp.zeros((2, L, 16))
    s2_params = s2.init(jax.random.key(2), batch["target_images"][:2],
                        batch["input_ids"][:2], batch["attention_mask"][:2],
                        z_dummy)
    tx, _ = make_optimizer(TrainConfig(batch_size=b), s2_params, 10,
                           freeze_prefixes=("params/visual_encoder",))
    state = TrainState.create(s2_params, tx)
    step = make_stage2_train_step(s1, s2, donate=False)
    new_state, loss = step(state, s1_params, batch, jax.random.key(3))
    assert np.isfinite(float(loss))
    assert calls, "train kernel was never dispatched"
    leaves0 = jax.tree_util.tree_leaves(state.params)
    leaves1 = jax.tree_util.tree_leaves(new_state.params)
    assert any(float(jnp.max(jnp.abs(a - b_))) > 0
               for a, b_ in zip(leaves0, leaves1))
    # the frozen ViT must be bit-identical after the step: optax.adamw
    # applies weight decay even to zero-grad params unless masked (the
    # reference hands AdamW only requires_grad params, stage2_train.py:138)
    ve0 = state.params["params"]["visual_encoder"]
    ve1 = new_state.params["params"]["visual_encoder"]
    for a, b_ in zip(jax.tree_util.tree_leaves(ve0),
                     jax.tree_util.tree_leaves(ve1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_bf16_path():
    q = _rand(0, 2, 9, 4, 32, dtype=jnp.float32).astype(jnp.bfloat16)
    k = _rand(1, 2, 21, 4, 32).astype(jnp.bfloat16)
    v = _rand(2, 2, 21, 4, 32).astype(jnp.bfloat16)
    out = fused_attention_train(q, k, v, None, SEED, 0.1)
    assert out.dtype == jnp.bfloat16
    assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))


@pytest.mark.slow
def test_entry_blocked_matches_xla_with_replicated_mask():
    """Short-row batches run entry-blocked (E entries per program); the
    dropout mask stays keyed by the ABSOLUTE batch index, so output and
    gradients are identical to the one-entry kernel / XLA replica."""
    from candidate_reranking_cir_tpu.ops.pallas_attention_train import (
        _pick_entries,
    )

    b, lq, m, h, d = 8, 16, 33, 2, 32
    # fwd blocks at E=8 (8 * 16 = 128 rows/program); bwd holds 7 E-sized
    # blocks so its cap is 4 and it falls back to E=1 here — the mask is
    # keyed by the absolute batch index, so mixed blocking stays exact
    from candidate_reranking_cir_tpu.ops.pallas_attention_train import (
        MAX_ENTRIES_FWD,
    )
    assert _pick_entries(b, lq, MAX_ENTRIES_FWD) == 8
    assert _pick_entries(b, lq) == 1
    rate = 0.2
    q = _rand(0, b, lq, h, d)
    k = _rand(1, b, m, h, d)
    v = _rand(2, b, m, h, d)
    cot = _rand(3, b, lq, h, d)
    keep = _expected_keep(SEED[0], b, h, lq, m, rate)

    out = fused_attention_train(q, k, v, None, SEED, rate)
    ref = _xla_attention(q, k, v, None, keep=keep, rate=rate)
    np.testing.assert_allclose(out, ref, atol=2e-5)

    def fused_loss(q, k, v):
        return jnp.vdot(fused_attention_train(q, k, v, None, SEED, rate), cot)

    def xla_loss(q, k, v):
        return jnp.vdot(_xla_attention(q, k, v, None, keep=keep, rate=rate),
                        cot)

    gf = jax.grad(fused_loss, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(xla_loss, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(a, b_, atol=3e-5)


@pytest.mark.slow
def test_entry_blocked_with_bias():
    b, lq, m, h, d = 4, 32, 40, 2, 32
    from candidate_reranking_cir_tpu.ops.pallas_attention_train import (
        _pick_entries,
    )
    assert _pick_entries(b, lq) == 4
    rate = 0.1
    q = _rand(0, b, lq, h, d)
    k = _rand(1, b, m, h, d)
    v = _rand(2, b, m, h, d)
    mask = (jnp.arange(m)[None] < jnp.asarray([[30], [m], [17], [25]])
            ).astype(jnp.int32)
    bias = jnp.broadcast_to(make_additive_mask(mask), (b, 1, lq, m))
    keep = _expected_keep(SEED[0], b, h, lq, m, rate)
    out = fused_attention_train(q, k, v, bias, SEED, rate)
    ref = _xla_attention(q, k, v, bias, keep=keep, rate=rate)
    np.testing.assert_allclose(out, ref, atol=2e-5)


@pytest.mark.slow
def test_folded_train_matches_unfolded_and_xla():
    """Folded train kernel ([B, L, H*D] layout) must match the unfolded
    kernel bitwise-in-mask (same absolute-batch-index keying) and the XLA
    replicated-mask replica, for outputs and gradients."""
    from candidate_reranking_cir_tpu.ops.pallas_attention_train import (
        fused_attention_train_folded,
    )

    b, lq, m, h, d = 4, 32, 37, 2, 32
    rate = 0.15
    q = _rand(0, b, lq, h, d)
    k = _rand(1, b, m, h, d)
    v = _rand(2, b, m, h, d)
    cot = _rand(3, b, lq, h, d)
    keep = _expected_keep(SEED[0], b, h, lq, m, rate)

    qf = q.reshape(b, lq, h * d)
    kf = k.reshape(b, m, h * d)
    vf = v.reshape(b, m, h * d)
    out_f = fused_attention_train_folded(qf, kf, vf, None, SEED, rate,
                                         num_heads=h)
    out_u = fused_attention_train(q, k, v, None, SEED, rate)
    np.testing.assert_allclose(out_f, out_u.reshape(b, lq, h * d), atol=2e-5)
    ref = _xla_attention(q, k, v, None, keep=keep, rate=rate)
    np.testing.assert_allclose(out_f, ref.reshape(b, lq, h * d), atol=2e-5)

    def fused_loss(qf, kf, vf):
        out = fused_attention_train_folded(qf, kf, vf, None, SEED, rate,
                                           num_heads=h)
        return jnp.vdot(out, cot.reshape(b, lq, h * d))

    def xla_loss(q, k, v):
        return jnp.vdot(_xla_attention(q, k, v, None, keep=keep, rate=rate),
                        cot)

    gf = jax.grad(fused_loss, argnums=(0, 1, 2))(qf, kf, vf)
    gx = jax.grad(xla_loss, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(gf[0], gx[0].reshape(b, lq, h * d), atol=3e-5)
    np.testing.assert_allclose(gf[1], gx[1].reshape(b, m, h * d), atol=3e-5)
    np.testing.assert_allclose(gf[2], gx[2].reshape(b, m, h * d), atol=3e-5)


@pytest.mark.slow
def test_folded_train_with_bias():
    from candidate_reranking_cir_tpu.ops.pallas_attention_train import (
        fused_attention_train_folded,
    )

    b, lq, m, h, d = 2, 64, 29, 2, 32
    rate = 0.1
    q = _rand(0, b, lq, h, d)
    k = _rand(1, b, m, h, d)
    v = _rand(2, b, m, h, d)
    mask = (jnp.arange(m)[None] < jnp.asarray([[20], [m]])).astype(jnp.int32)
    bias = jnp.broadcast_to(make_additive_mask(mask), (b, 1, lq, m))
    keep = _expected_keep(SEED[0], b, h, lq, m, rate)
    out = fused_attention_train_folded(
        q.reshape(b, lq, h * d), k.reshape(b, m, h * d),
        v.reshape(b, m, h * d), bias, SEED, rate, num_heads=h)
    ref = _xla_attention(q, k, v, bias, keep=keep, rate=rate)
    np.testing.assert_allclose(out, ref.reshape(b, lq, h * d), atol=2e-5)
