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
