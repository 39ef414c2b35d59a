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
