"""Weight-converter unit tests beyond the HF parity chain."""
import numpy as np
import pytest

from candidate_reranking_cir_tpu.runtime import convert


def test_interpolate_pos_embed_identity():
    pos = np.random.default_rng(0).normal(size=(1, 17, 8)).astype(np.float32)
    out = convert.interpolate_pos_embed(pos, 16)
    np.testing.assert_array_equal(out, pos)


def test_interpolate_pos_embed_resize():
    rng = np.random.default_rng(1)
    pos = rng.normal(size=(1, 1 + 16, 8)).astype(np.float32)  # 4x4 grid
    out = convert.interpolate_pos_embed(pos, 64)               # -> 8x8 grid
    assert out.shape == (1, 65, 8)
    # CLS row untouched
    np.testing.assert_array_equal(out[:, 0], pos[:, 0])
    # a constant grid stays constant under bicubic resize
    const = np.concatenate(
        [pos[:, :1], np.full((1, 16, 8), 3.5, np.float32)], axis=1)
    out_c = convert.interpolate_pos_embed(const, 64)
    np.testing.assert_allclose(out_c[:, 1:], 3.5, rtol=1e-5)


def test_duplicate_for_dual_stream_contract():
    sd = {
        "l.attention.self.query.weight": np.ones((2, 2)),
        "l.attention.output.dense.weight": np.ones((2, 2)),
        "l.attention.output.LayerNorm.weight": np.ones(2),
        "l.crossattention.self.key.bias": np.ones(2),
        "l.crossattention.output.dense.bias": np.ones(2),
        "l.crossattention.output.LayerNorm.bias": np.ones(2),
        "l.intermediate.dense.weight": np.ones((2, 2)),  # untouched
    }
    out = convert.duplicate_for_dual_stream(sd)
    assert "l.attention.self0.query.weight" in out
    assert "l.attention.self1.query.weight" in out
    assert "l.attention.output.dense0.weight" in out
    assert "l.attention.output.LayerNormA.weight" in out
    assert "l.attention.output.LayerNormB.weight" in out
    assert "l.crossattention.self0.key.bias" in out
    assert "l.crossattention.output.dense1.bias" in out
    assert "l.crossattention.output.LayerNormA.bias" in out
    # non-attention keys unchanged and present
    assert "l.intermediate.dense0.weight" not in out
    assert "l.intermediate.dense.weight" in out


def test_load_torch_state_wrappers(tmp_path):
    torch = pytest.importorskip("torch")
    sd = {"w": torch.ones(3, 2)}
    for wrapper in ({"model": sd}, {"BLIP_Retrieval": sd, "epoch": 3},
                    {"BLIP_NLVR": sd, "optimizer_state_dict": {}}):
        p = tmp_path / "c.pt"
        torch.save(wrapper, p)
        out = convert.load_torch_state(str(p))
        assert list(out) == ["w"] and out["w"].shape == (3, 2)


@pytest.mark.slow
def test_roundtrip_stage1_and_stage2():
    """export_*(convert == identity): JAX params -> torch keys -> JAX params."""
    import jax
    import jax.numpy as jnp

    from candidate_reranking_cir_tpu.config import (
        RerankerModelConfig,
        RetrievalModelConfig,
        TextEncoderConfig,
        ViTConfig,
    )
    from candidate_reranking_cir_tpu.models.blip_reranker import RerankerModel
    from candidate_reranking_cir_tpu.models.blip_retrieval import (
        RetrievalModel,
    )

    vit = ViTConfig(image_size=16, patch_size=8, hidden_size=16, num_layers=2,
                    num_heads=2)
    text = TextEncoderConfig(vocab_size=32, hidden_size=16, num_layers=3,
                             num_heads=2, intermediate_size=32,
                             encoder_width=16, max_position_embeddings=64,
                             merge_mlp_from=2)
    s1_cfg = RetrievalModelConfig(vit=vit, text=text, embed_dim=8, text_len=6)
    s2_cfg = RerankerModelConfig(vit=vit, text=text, text_len=6)

    imgs = jnp.zeros((2, 16, 16, 3))
    ids = jnp.ones((2, 6), jnp.int32)
    z = jnp.zeros((2, 6, 16))

    s1 = RetrievalModel(s1_cfg)
    v1 = s1.init(jax.random.key(0), imgs, ids, ids)
    sd = convert.export_stage1(v1, s1_cfg)
    back = convert.convert_stage1(sd, s1_cfg)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(v1)[0],
            jax.tree_util.tree_flatten_with_path(back)[0]):
        assert str(pa) == str(pb)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   err_msg=str(pa))

    s2 = RerankerModel(s2_cfg)
    v2 = s2.init(jax.random.key(1), imgs, ids, ids, z)
    sd2 = convert.export_stage2(v2, s2_cfg)
    back2 = convert.convert_stage2(sd2, s2_cfg)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(v2)[0],
            jax.tree_util.tree_flatten_with_path(back2)[0]):
        assert str(pa) == str(pb)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   err_msg=str(pa))


def test_save_torch_checkpoint_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    sd = {"visual_encoder.norm.weight": np.ones(4, np.float32)}
    p = tmp_path / "export.pt"
    convert.save_torch_checkpoint(str(p), sd, "BLIP_Retrieval", epoch=7)
    raw = torch.load(p, weights_only=False)
    assert raw["epoch"] == 7 and "BLIP_Retrieval" in raw
    loaded = convert.load_torch_state(str(p))
    np.testing.assert_array_equal(loaded["visual_encoder.norm.weight"],
                                  sd["visual_encoder.norm.weight"])


def test_convert_vit_npz_matches_timm_path():
    """The original-JAX .npz ViT importer (reference vit.py:201-278
    capability) must produce the SAME parameter tree as the
    torch/timm-layout converter given equivalent weights — cross-validating
    the npz key map against the HF-parity-tested timm path, and the tree
    must drive VisionTransformer.apply."""
    import jax
    import jax.numpy as jnp

    from candidate_reranking_cir_tpu.config import ViTConfig
    from candidate_reranking_cir_tpu.models.vit import VisionTransformer
    from candidate_reranking_cir_tpu.runtime import convert

    rng = np.random.default_rng(0)
    layers, heads, d, p, img = 2, 4, 32, 4, 16
    n_patches = (img // p) ** 2
    hd = d // heads
    r = lambda *s: rng.normal(scale=0.05, size=s).astype(np.float32)

    conv = r(d, 3, p, p)
    cls, pos = r(1, 1, d), r(1, n_patches + 1, d)
    sd = {"v.patch_embed.proj.weight": conv,
          "v.patch_embed.proj.bias": r(d),
          "v.cls_token": cls, "v.pos_embed": pos,
          "v.norm.weight": r(d), "v.norm.bias": r(d)}
    npz = {"embedding/kernel": conv.transpose(2, 3, 1, 0),
           "embedding/bias": sd["v.patch_embed.proj.bias"],
           "cls": cls,
           "Transformer/posembed_input/pos_embedding": pos,
           "Transformer/encoder_norm/scale": sd["v.norm.weight"],
           "Transformer/encoder_norm/bias": sd["v.norm.bias"]}
    for i in range(layers):
        pre = f"v.blocks.{i}"
        qkv_w, qkv_b = r(3 * d, d), r(3 * d)
        proj_w, proj_b = r(d, d), r(d)
        sd |= {f"{pre}.attn.qkv.weight": qkv_w,
               f"{pre}.attn.qkv.bias": qkv_b,
               f"{pre}.attn.proj.weight": proj_w,
               f"{pre}.attn.proj.bias": proj_b,
               f"{pre}.norm1.weight": r(d), f"{pre}.norm1.bias": r(d),
               f"{pre}.norm2.weight": r(d), f"{pre}.norm2.bias": r(d),
               f"{pre}.mlp.fc1.weight": r(4 * d, d),
               f"{pre}.mlp.fc1.bias": r(4 * d),
               f"{pre}.mlp.fc2.weight": r(d, 4 * d),
               f"{pre}.mlp.fc2.bias": r(d)}
        b = f"Transformer/encoderblock_{i}/"
        a = b + "MultiHeadDotProductAttention_1/"
        for name, sl in (("query", slice(0, d)), ("key", slice(d, 2 * d)),
                         ("value", slice(2 * d, 3 * d))):
            npz[a + f"{name}/kernel"] = np.ascontiguousarray(
                qkv_w[sl].T).reshape(d, heads, hd)
            npz[a + f"{name}/bias"] = qkv_b[sl].reshape(heads, hd)
        npz[a + "out/kernel"] = np.ascontiguousarray(
            proj_w.T).reshape(heads, hd, d)
        npz[a + "out/bias"] = proj_b
        npz |= {b + "LayerNorm_0/scale": sd[f"{pre}.norm1.weight"],
                b + "LayerNorm_0/bias": sd[f"{pre}.norm1.bias"],
                b + "LayerNorm_2/scale": sd[f"{pre}.norm2.weight"],
                b + "LayerNorm_2/bias": sd[f"{pre}.norm2.bias"],
                b + "MlpBlock_3/Dense_0/kernel": np.ascontiguousarray(
                    sd[f"{pre}.mlp.fc1.weight"].T),
                b + "MlpBlock_3/Dense_0/bias": sd[f"{pre}.mlp.fc1.bias"],
                b + "MlpBlock_3/Dense_1/kernel": np.ascontiguousarray(
                    sd[f"{pre}.mlp.fc2.weight"].T),
                b + "MlpBlock_3/Dense_1/bias": sd[f"{pre}.mlp.fc2.bias"]}

    from_timm = convert.convert_vit(sd, "v", layers, heads, n_patches)
    from_npz = convert.convert_vit_npz(npz, layers, n_patches)

    flat_a = jax.tree_util.tree_flatten_with_path(from_timm)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(from_npz)[0]
    assert [k for k, _ in flat_a] == [k for k, _ in flat_b]
    for (k, va), (_, vb) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb),
                                      err_msg=str(k))

    model = VisionTransformer(ViTConfig(
        image_size=img, patch_size=p, hidden_size=d, num_layers=layers,
        num_heads=heads, mlp_ratio=4.0))
    out = model.apply({"params": from_npz},
                      jnp.asarray(rng.normal(size=(2, img, img, 3)),
                                  jnp.float32))
    assert out.shape == (2, n_patches + 1, d)
