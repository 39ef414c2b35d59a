"""Full-size converter structure check.

Builds synthetic torch-style state dicts with the reference's exact key names
and FULL production shapes (ViT-B/16 @ 384, 12-layer BERT, vocab 30524),
converts, and verifies the parameter trees match the models' init structure
leaf-for-leaf (names, shapes, dtypes) via jax.eval_shape — no FLOPs spent.
Catches key-mapping/transposition bugs that tiny-dim tests can mask.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from candidate_reranking_cir_tpu.config import (
    RerankerModelConfig,
    RetrievalModelConfig,
)
from candidate_reranking_cir_tpu.models.blip_reranker import RerankerModel
from candidate_reranking_cir_tpu.models.blip_retrieval import RetrievalModel
from candidate_reranking_cir_tpu.runtime import convert

pytestmark = pytest.mark.slow  # full-size (12L/768H) checkpoint conversions

H, INTER, VOCAB, POS, PATCHES = 768, 3072, 30524, 512, 576


def _z(*shape):
    return np.zeros(shape, np.float32)


def make_vit_sd(prefix):
    sd = {
        f"{prefix}.patch_embed.proj.weight": _z(H, 3, 16, 16),
        f"{prefix}.patch_embed.proj.bias": _z(H),
        f"{prefix}.cls_token": _z(1, 1, H),
        f"{prefix}.pos_embed": _z(1, PATCHES + 1, H),
        f"{prefix}.norm.weight": _z(H),
        f"{prefix}.norm.bias": _z(H),
    }
    for i in range(12):
        p = f"{prefix}.blocks.{i}"
        sd |= {
            f"{p}.norm1.weight": _z(H), f"{p}.norm1.bias": _z(H),
            f"{p}.attn.qkv.weight": _z(3 * H, H),
            f"{p}.attn.qkv.bias": _z(3 * H),
            f"{p}.attn.proj.weight": _z(H, H), f"{p}.attn.proj.bias": _z(H),
            f"{p}.norm2.weight": _z(H), f"{p}.norm2.bias": _z(H),
            f"{p}.mlp.fc1.weight": _z(INTER, H), f"{p}.mlp.fc1.bias": _z(INTER),
            f"{p}.mlp.fc2.weight": _z(H, INTER), f"{p}.mlp.fc2.bias": _z(H),
        }
    return sd


def make_bert_sd(prefix, cross=True):
    sd = {
        f"{prefix}.embeddings.word_embeddings.weight": _z(VOCAB, H),
        f"{prefix}.embeddings.position_embeddings.weight": _z(POS, H),
        f"{prefix}.embeddings.LayerNorm.weight": _z(H),
        f"{prefix}.embeddings.LayerNorm.bias": _z(H),
    }
    for i in range(12):
        p = f"{prefix}.encoder.layer.{i}"
        blocks = ["attention"] + (["crossattention"] if cross else [])
        for blk in blocks:
            for part in ("query", "key", "value"):
                sd[f"{p}.{blk}.self.{part}.weight"] = _z(H, H)
                sd[f"{p}.{blk}.self.{part}.bias"] = _z(H)
            sd[f"{p}.{blk}.output.dense.weight"] = _z(H, H)
            sd[f"{p}.{blk}.output.dense.bias"] = _z(H)
            sd[f"{p}.{blk}.output.LayerNorm.weight"] = _z(H)
            sd[f"{p}.{blk}.output.LayerNorm.bias"] = _z(H)
        sd |= {
            f"{p}.intermediate.dense.weight": _z(INTER, H),
            f"{p}.intermediate.dense.bias": _z(INTER),
            f"{p}.output.dense.weight": _z(H, INTER),
            f"{p}.output.dense.bias": _z(H),
            f"{p}.output.LayerNorm.weight": _z(H),
            f"{p}.output.LayerNorm.bias": _z(H),
        }
    return sd


def _shape_tree(tree):
    return jax.tree.map(lambda x: (tuple(x.shape)), tree)


def _assert_same_structure(converted, expected, what):
    conv = _shape_tree(converted)
    exp = _shape_tree(expected)
    flat_c = dict(jax.tree_util.tree_flatten_with_path(conv)[0])
    flat_e = dict(jax.tree_util.tree_flatten_with_path(exp)[0])
    missing = set(map(str, flat_e)) - set(map(str, flat_c))
    extra = set(map(str, flat_c)) - set(map(str, flat_e))
    assert not missing, f"{what}: converted tree missing {sorted(missing)[:6]}"
    assert not extra, f"{what}: converted tree has extra {sorted(extra)[:6]}"
    for k, v in flat_e.items():
        assert flat_c[k] == v, f"{what}: {k} shape {flat_c[k]} != {v}"


def test_full_size_stage1_conversion_structure():
    cfg = RetrievalModelConfig()
    model = RetrievalModel(cfg)
    expected = jax.eval_shape(
        lambda: model.init(jax.random.key(0),
                           jnp.zeros((1, 384, 384, 3)),
                           jnp.zeros((1, 40), jnp.int32),
                           jnp.zeros((1, 40), jnp.int32)))

    sd = make_vit_sd("visual_encoder") | make_bert_sd("text_encoder")
    sd |= {
        "vision_proj.weight": _z(256, H), "vision_proj.bias": _z(256),
        "text_proj.weight": _z(256, H), "text_proj.bias": _z(256),
        "temp": np.float32(0.07),
    }
    converted = convert.convert_stage1(sd, cfg)
    _assert_same_structure(converted, expected, "stage1")


def test_full_size_stage2_conversion_structure():
    cfg = RerankerModelConfig()
    model = RerankerModel(cfg)
    expected = jax.eval_shape(
        lambda: model.init(jax.random.key(0),
                           jnp.zeros((1, 384, 384, 3)),
                           jnp.zeros((1, 40), jnp.int32),
                           jnp.zeros((1, 40), jnp.int32),
                           jnp.zeros((1, 40, H))))

    # single-stream pretrain -> duplication path exercised
    sd = make_vit_sd("visual_encoder") | make_bert_sd("text_encoder")
    sd |= {
        "cls_head.0.weight": _z(H, 2 * H), "cls_head.0.bias": _z(H),
        "cls_head.2.weight": _z(2, H), "cls_head.2.bias": _z(2),
    }
    converted = convert.convert_stage2(sd, cfg)
    _assert_same_structure(converted, expected, "stage2")

    # interpolation: a 224px checkpoint (196+1 pos rows) resizes to 577
    sd_small = dict(sd)
    sd_small["visual_encoder.pos_embed"] = _z(1, 197, H)
    converted2 = convert.convert_stage2(sd_small, cfg)
    assert converted2["params"]["visual_encoder"]["pos_embed"].shape == \
        (1, 577, H)
