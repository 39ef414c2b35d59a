"""Numerical parity against torch/HuggingFace reference implementations.

Chain of trust for the model stack (no reference-repo code involved):
1. HF transformers BertModel (the codebase the reference's med.py descends
   from) == our TextEncoder in text mode, through the weight converter;
2. HF transformers ViTModel == our VisionTransformer, through the converter
   (HF q/k/v reassembled into the timm fused-qkv layout the converter eats);
3. our MED multimodal forward == our DualStreamEncoder when the dual weights
   are produced by the reference's single->dual duplication contract, z_t
   equals the text embedding, and every layer avg-merges — the mathematical
   identity the stage-II initialization relies on (blip_stage2.py:160-187).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from candidate_reranking_cir_tpu.config import TextEncoderConfig, ViTConfig
from candidate_reranking_cir_tpu.models.dual_encoder import DualStreamEncoder
from candidate_reranking_cir_tpu.models.med import TextEncoder
from candidate_reranking_cir_tpu.models.vit import VisionTransformer
from candidate_reranking_cir_tpu.runtime import convert

HID, HEADS, LAYERS, INTER, VOCAB = 32, 4, 3, 64, 96


def _torch_sd_to_numpy(module, prefix=""):
    return {f"{prefix}{k}": v.detach().numpy()
            for k, v in module.state_dict().items()}


@pytest.fixture(scope="module")
def hf_bert():
    cfg = transformers.BertConfig(
        vocab_size=VOCAB, hidden_size=HID, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTER,
        max_position_embeddings=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, layer_norm_eps=1e-12)
    torch.manual_seed(0)
    model = transformers.BertModel(cfg, add_pooling_layer=False)
    # our embeddings have no token-type table; zero HF's so both compute
    # word + position only
    with torch.no_grad():
        model.embeddings.token_type_embeddings.weight.zero_()
    model.eval()
    return model


def test_text_encoder_matches_hf_bert(hf_bert):
    sd = _torch_sd_to_numpy(hf_bert, "text_encoder.")
    cfg = TextEncoderConfig(
        vocab_size=VOCAB, hidden_size=HID, num_layers=LAYERS, num_heads=HEADS,
        intermediate_size=INTER, max_position_embeddings=64,
        hidden_dropout=0.0, attention_dropout=0.0)
    params = {"params": convert.convert_med(sd, "text_encoder", LAYERS, HEADS,
                                            multimodal=False)}

    rng = np.random.default_rng(0)
    ids = rng.integers(1, VOCAB, size=(3, 9))
    mask = np.ones((3, 9), np.int64)
    mask[0, 6:] = 0
    mask[2, 4:] = 0

    with torch.no_grad():
        ref = hf_bert(input_ids=torch.tensor(ids),
                      attention_mask=torch.tensor(mask)
                      ).last_hidden_state.numpy()

    model = TextEncoder(cfg, mode="text")
    out = np.asarray(model.apply(params, jnp.asarray(ids, jnp.int32),
                                 jnp.asarray(mask, jnp.int32)))
    # compare only valid positions (mask conventions differ at pads)
    valid = mask.astype(bool)
    np.testing.assert_allclose(out[valid], ref[valid], atol=2e-5)


def test_vit_matches_hf_vit():
    img, patch = 32, 8
    cfg_hf = transformers.ViTConfig(
        hidden_size=HID, num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        intermediate_size=INTER, image_size=img, patch_size=patch,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-6)
    torch.manual_seed(1)
    hf = transformers.ViTModel(cfg_hf, add_pooling_layer=False)
    hf.eval()
    hsd = _torch_sd_to_numpy(hf)

    # reassemble into the timm-style layout convert_vit expects
    sd = {
        "v.patch_embed.proj.weight":
            hsd["embeddings.patch_embeddings.projection.weight"],
        "v.patch_embed.proj.bias":
            hsd["embeddings.patch_embeddings.projection.bias"],
        "v.cls_token": hsd["embeddings.cls_token"],
        "v.pos_embed": hsd["embeddings.position_embeddings"],
        "v.norm.weight": hsd["layernorm.weight"],
        "v.norm.bias": hsd["layernorm.bias"],
    }
    for i in range(LAYERS):
        h = f"encoder.layer.{i}"
        sd[f"v.blocks.{i}.attn.qkv.weight"] = np.concatenate([
            hsd[f"{h}.attention.attention.query.weight"],
            hsd[f"{h}.attention.attention.key.weight"],
            hsd[f"{h}.attention.attention.value.weight"]])
        sd[f"v.blocks.{i}.attn.qkv.bias"] = np.concatenate([
            hsd[f"{h}.attention.attention.query.bias"],
            hsd[f"{h}.attention.attention.key.bias"],
            hsd[f"{h}.attention.attention.value.bias"]])
        sd[f"v.blocks.{i}.attn.proj.weight"] = \
            hsd[f"{h}.attention.output.dense.weight"]
        sd[f"v.blocks.{i}.attn.proj.bias"] = \
            hsd[f"{h}.attention.output.dense.bias"]
        sd[f"v.blocks.{i}.norm1.weight"] = hsd[f"{h}.layernorm_before.weight"]
        sd[f"v.blocks.{i}.norm1.bias"] = hsd[f"{h}.layernorm_before.bias"]
        sd[f"v.blocks.{i}.norm2.weight"] = hsd[f"{h}.layernorm_after.weight"]
        sd[f"v.blocks.{i}.norm2.bias"] = hsd[f"{h}.layernorm_after.bias"]
        sd[f"v.blocks.{i}.mlp.fc1.weight"] = hsd[f"{h}.intermediate.dense.weight"]
        sd[f"v.blocks.{i}.mlp.fc1.bias"] = hsd[f"{h}.intermediate.dense.bias"]
        sd[f"v.blocks.{i}.mlp.fc2.weight"] = hsd[f"{h}.output.dense.weight"]
        sd[f"v.blocks.{i}.mlp.fc2.bias"] = hsd[f"{h}.output.dense.bias"]

    n_patches = (img // patch) ** 2
    params = {"params": convert.convert_vit(sd, "v", LAYERS, HEADS, n_patches)}

    cfg = ViTConfig(image_size=img, patch_size=patch, hidden_size=HID,
                    num_layers=LAYERS, num_heads=HEADS,
                    mlp_ratio=INTER / HID, layer_norm_eps=1e-6)
    model = VisionTransformer(cfg)

    rng = np.random.default_rng(2)
    images = rng.normal(size=(2, img, img, 3)).astype(np.float32)
    with torch.no_grad():
        ref = hf(pixel_values=torch.tensor(
            images.transpose(0, 3, 1, 2))).last_hidden_state.numpy()
    out = np.asarray(model.apply(params, jnp.asarray(images)))
    np.testing.assert_allclose(out, ref, atol=3e-5)


@pytest.mark.slow
def test_dual_encoder_matches_med_under_duplication():
    """With duplicated single-stream weights, z_t == text embedding, and
    avg-merge at every layer, both dual streams must reproduce the
    single-stream MED multimodal forward exactly."""
    cfg = TextEncoderConfig(
        vocab_size=VOCAB, hidden_size=HID, num_layers=LAYERS, num_heads=HEADS,
        intermediate_size=INTER, max_position_embeddings=64, encoder_width=24,
        hidden_dropout=0.0, attention_dropout=0.0,
        merge_mlp_from=LAYERS)  # all layers avg-merge

    # build a synthetic single-stream torch-style state dict
    rng = np.random.default_rng(3)

    def lin(i, o):
        return rng.normal(scale=0.05, size=(o, i)).astype(np.float32)

    sd = {}
    sd["te.embeddings.word_embeddings.weight"] = \
        rng.normal(scale=0.05, size=(VOCAB, HID)).astype(np.float32)
    sd["te.embeddings.position_embeddings.weight"] = \
        rng.normal(scale=0.05, size=(64, HID)).astype(np.float32)
    sd["te.embeddings.LayerNorm.weight"] = np.ones(HID, np.float32)
    sd["te.embeddings.LayerNorm.bias"] = np.zeros(HID, np.float32)
    for i in range(LAYERS):
        p = f"te.encoder.layer.{i}"
        for blk, kv_in in (("attention", HID), ("crossattention", 24)):
            sd[f"{p}.{blk}.self.query.weight"] = lin(HID, HID)
            sd[f"{p}.{blk}.self.query.bias"] = np.zeros(HID, np.float32)
            sd[f"{p}.{blk}.self.key.weight"] = lin(kv_in, HID)
            sd[f"{p}.{blk}.self.key.bias"] = np.zeros(HID, np.float32)
            sd[f"{p}.{blk}.self.value.weight"] = lin(kv_in, HID)
            sd[f"{p}.{blk}.self.value.bias"] = np.zeros(HID, np.float32)
            sd[f"{p}.{blk}.output.dense.weight"] = lin(HID, HID)
            sd[f"{p}.{blk}.output.dense.bias"] = np.zeros(HID, np.float32)
            sd[f"{p}.{blk}.output.LayerNorm.weight"] = np.ones(HID, np.float32)
            sd[f"{p}.{blk}.output.LayerNorm.bias"] = np.zeros(HID, np.float32)
        sd[f"{p}.intermediate.dense.weight"] = lin(HID, INTER)
        sd[f"{p}.intermediate.dense.bias"] = np.zeros(INTER, np.float32)
        sd[f"{p}.output.dense.weight"] = lin(INTER, HID)
        sd[f"{p}.output.dense.bias"] = np.zeros(HID, np.float32)
        sd[f"{p}.output.LayerNorm.weight"] = np.ones(HID, np.float32)
        sd[f"{p}.output.LayerNorm.bias"] = np.zeros(HID, np.float32)

    med_params = {"params": convert.convert_med(sd, "te", LAYERS, HEADS)}
    dual_params = {"params": convert.convert_dual_encoder(
        sd, "te", LAYERS, HEADS, merge_mlp_from=LAYERS, hidden_size=HID)}

    ids = rng.integers(1, VOCAB, size=(2, 7))
    mask = np.ones((2, 7), np.int64)
    mask[1, 5:] = 0
    cand = rng.normal(scale=0.1, size=(2, 11, 24)).astype(np.float32)

    med = TextEncoder(cfg, mode="multimodal")
    med_out = np.asarray(med.apply(
        med_params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
        jnp.asarray(cand)))

    # z_t = the dual encoder's own text embedding output (streams identical)
    from candidate_reranking_cir_tpu.models.med import BertEmbeddings

    emb_params = {"params": dual_params["params"]["embeddings"]}
    z_t = BertEmbeddings(cfg).apply(
        emb_params, jnp.asarray(ids, jnp.int32))

    dual = DualStreamEncoder(cfg)
    # per-query candidates: query i pairs with candidate i -> grid [2, 1, ...]
    out = dual.apply(dual_params, jnp.asarray(ids, jnp.int32),
                     jnp.asarray(mask, jnp.int32), z_t,
                     jnp.asarray(cand)[:, None],
                     shared_candidates=False)
    out = np.asarray(out)  # [2, 1, 2*HID]
    cls0, cls1 = out[:, 0, :HID], out[:, 0, HID:]
    # both streams identical and equal to MED's CLS state
    np.testing.assert_allclose(cls0, cls1, atol=1e-5)
    np.testing.assert_allclose(cls0, med_out[:, 0], atol=2e-5)
