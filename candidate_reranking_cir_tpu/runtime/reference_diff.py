"""Differential parity against the reference implementation's OWN code.

The HF-proxy parity tests (tests/test_torch_parity.py) anchor this framework
to the codebases the reference descends from; this module closes the last
gap by executing the reference's actual modules — med.py (multimodal MED),
nlvr_encoder.py (twin-stream dual encoder incl. its avg/MLP merge schedule,
nlvr_encoder.py:225-270,286), blip_stage1.img_txt_fusion
(blip_stage1.py:66-92) and blip_stage2.img_txt_fusion/_val
(blip_stage2.py:78-136) — on CPU torch at the FULL production config
(12L/768H, 577 image tokens, vocab 30524), exporting their randomly
initialized state dicts through runtime/convert.py and comparing this
framework's outputs element-for-element.

The reference sources import transformers APIs from v4.15 whose symbols have
since moved, plus timm/fairscale (absent here); ``load_reference`` installs
aliases/stubs first. The three timm symbols the reference ViT actually
*executes* (PatchEmbed / DropPath / trunc_normal_, vit.py:16-18) are faithful
reimplementations of their timm-0.4.12 semantics, so ``check_vit`` and
``check_img_embed`` run the reference's own vit.py end to end from pixels;
everything else stubbed is import-surface only. Tokenization is replaced by
pre-baked ids since real-vocab tokenization is covered by the tokenizer
differential tests.

Checks run from tests/test_reference_differential.py and as rung 0 of
cli/parity_ladder.py (the only rung that needs no downloaded artifacts).
"""
from __future__ import annotations

import importlib
import os
import sys
import types
from types import SimpleNamespace

import numpy as np

DEFAULT_SRC = "/root/reference/src"
TOL_MAX_ABS = 1e-4
TOL_COSINE = 0.9999

# full production config (med_config.json)
HID, HEADS, LAYERS, INTER = 768, 12, 12, 3072
VOCAB, IMG_TOKENS, MERGE_MLP_FROM = 30524, 577, 6
ENC_TOKEN_ID = 30523  # blip.py:190: [ENC] appended after bert's 30522 + [DEC]


def reference_available(src_dir: str = DEFAULT_SRC) -> bool:
    return os.path.isfile(os.path.join(src_dir, "med.py"))


def load_reference(src_dir: str = DEFAULT_SRC) -> SimpleNamespace:
    """Import the reference's model modules with compatibility shims."""
    import transformers.modeling_utils as mu
    import transformers.pytorch_utils as pu

    # med.py/nlvr_encoder.py import these from transformers.modeling_utils
    # (their v4.15 home); they live in transformers.pytorch_utils now
    for name in ("apply_chunking_to_forward", "prune_linear_layer",
                 "find_pruneable_heads_and_indices"):
        if not hasattr(mu, name):
            setattr(mu, name, getattr(pu, name))

    # timm stubs. The three symbols vit.py executes (PatchEmbed, DropPath,
    # trunc_normal_ — vit.py:16-18) are faithful timm-0.4.12 equivalents so
    # the reference ViT runs for real; the rest satisfy imports only.
    def _module(name, **attrs):
        if name in sys.modules:
            return sys.modules[name]
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod
        return mod

    import math

    import torch
    import torch.nn as tnn

    class _PatchEmbed(tnn.Module):
        """timm 0.4.12 PatchEmbed: stride-P Conv2d -> flatten -> [B, N, D]."""

        def __init__(self, img_size=224, patch_size=16, in_chans=3,
                     embed_dim=768, norm_layer=None, flatten=True):
            super().__init__()
            to2 = lambda v: v if isinstance(v, tuple) else (v, v)
            self.img_size, self.patch_size = to2(img_size), to2(patch_size)
            self.grid_size = (self.img_size[0] // self.patch_size[0],
                              self.img_size[1] // self.patch_size[1])
            self.num_patches = self.grid_size[0] * self.grid_size[1]
            self.proj = tnn.Conv2d(in_chans, embed_dim,
                                   kernel_size=self.patch_size,
                                   stride=self.patch_size)
            self.norm = norm_layer(embed_dim) if norm_layer else tnn.Identity()

        def forward(self, x):
            assert x.shape[-2:] == torch.Size(self.img_size)
            return self.norm(self.proj(x).flatten(2).transpose(1, 2))

    class _DropPath(tnn.Module):
        """timm 0.4.12 DropPath (stochastic depth): identity in eval; in
        train, zeroes whole samples w.p. drop_prob and rescales by keep."""

        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob or 0.0

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = torch.floor(
                keep + torch.rand(shape, dtype=x.dtype, device=x.device))
            return x.div(keep) * mask

    def _trunc_normal(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        """timm 0.4.12 trunc_normal_: inverse-CDF truncated normal fill."""
        cdf = lambda v: (1.0 + math.erf(v / math.sqrt(2.0))) / 2.0
        with torch.no_grad():
            lo, hi = cdf((a - mean) / std), cdf((b - mean) / std)
            tensor.uniform_(2 * lo - 1, 2 * hi - 1)
            tensor.erfinv_()
            tensor.mul_(std * math.sqrt(2.0)).add_(mean)
            return tensor.clamp_(min=a, max=b)

    _unused = lambda *a, **k: None
    timm = _module("timm")
    timm.models = _module(
        "timm.models",
        hub=_module("timm.models.hub", download_cached_file=_unused),
        vision_transformer=_module("timm.models.vision_transformer",
                                   _cfg=_unused, PatchEmbed=_PatchEmbed),
        registry=_module("timm.models.registry",
                         register_model=lambda f: f),
        layers=_module("timm.models.layers",
                       trunc_normal_=_trunc_normal, DropPath=_DropPath),
        helpers=_module("timm.models.helpers",
                        named_apply=_unused, adapt_input_conv=_unused),
    )
    fairscale = _module("fairscale")
    fairscale.nn = _module("fairscale.nn")
    fairscale.nn.checkpoint = _module("fairscale.nn.checkpoint")
    fairscale.nn.checkpoint.checkpoint_activations = _module(
        "fairscale.nn.checkpoint.checkpoint_activations",
        checkpoint_wrapper=lambda m, *a, **k: m)

    sys.path.insert(0, src_dir)
    try:
        mods = {name: importlib.import_module(name)
                for name in ("vit", "med", "nlvr_encoder", "blip",
                             "blip_stage1", "blip_stage2")}
    finally:
        sys.path.remove(src_dir)

    cfg = mods["med"].BertConfig.from_json_file(
        os.path.join(src_dir, "med_config.json"))
    # dropout off for determinism (torch .eval() would disable it anyway;
    # the JAX side runs deterministic=True)
    cfg.hidden_dropout_prob = 0.0
    cfg.attention_probs_dropout_prob = 0.0
    return SimpleNamespace(config=cfg, **mods)


# ---------------------------------------------------------------------------
# shared plumbing


class _StubTokenizer:
    """Stands in for the HF tokenizer inside the reference wrapper modules:
    returns pre-baked ids/mask regardless of the text (the wrappers tokenize
    internally, blip_stage1.py:72-73; real-vocab tokenization itself is
    covered by the tokenizer differential fuzz tests)."""

    def __init__(self, ids, mask, enc_token_id: int = ENC_TOKEN_ID):
        import torch

        self._ids = torch.as_tensor(np.asarray(ids, np.int64))
        self._mask = torch.as_tensor(np.asarray(mask, np.int64))
        self.enc_token_id = enc_token_id

    def __call__(self, text, **kw):
        batch = SimpleNamespace(input_ids=self._ids.clone(),
                                attention_mask=self._mask.clone())
        batch.to = lambda device: batch
        return batch


def _text_cfg(**over):
    from candidate_reranking_cir_tpu.config import TextEncoderConfig

    kw = dict(vocab_size=VOCAB, hidden_size=HID, num_layers=LAYERS,
              num_heads=HEADS, intermediate_size=INTER, encoder_width=HID,
              hidden_dropout=0.0, attention_dropout=0.0,
              merge_mlp_from=MERGE_MLP_FROM)
    kw.update(over)
    return TextEncoderConfig(**kw)


def _sd_numpy(module, prefix: str = "") -> dict:
    return {f"{prefix}{k}": v.detach().cpu().numpy()
            for k, v in module.state_dict().items()}


def _zero_vit_sd(prefix: str = "visual_encoder") -> dict:
    """Synthetic zero ViT-B/16 state dict: the converters require the vision
    tower's keys, but every check feeds precomputed image features, so the
    vision parameters never participate."""
    z = lambda *s: np.zeros(s, np.float32)
    sd = {
        f"{prefix}.patch_embed.proj.weight": z(HID, 3, 16, 16),
        f"{prefix}.patch_embed.proj.bias": z(HID),
        f"{prefix}.cls_token": z(1, 1, HID),
        f"{prefix}.pos_embed": z(1, IMG_TOKENS, HID),
        f"{prefix}.norm.weight": z(HID),
        f"{prefix}.norm.bias": z(HID),
    }
    for i in range(12):
        p = f"{prefix}.blocks.{i}"
        sd |= {
            f"{p}.norm1.weight": z(HID), f"{p}.norm1.bias": z(HID),
            f"{p}.attn.qkv.weight": z(3 * HID, HID),
            f"{p}.attn.qkv.bias": z(3 * HID),
            f"{p}.attn.proj.weight": z(HID, HID),
            f"{p}.attn.proj.bias": z(HID),
            f"{p}.norm2.weight": z(HID), f"{p}.norm2.bias": z(HID),
            f"{p}.mlp.fc1.weight": z(INTER, HID),
            f"{p}.mlp.fc1.bias": z(INTER),
            f"{p}.mlp.fc2.weight": z(HID, INTER),
            f"{p}.mlp.fc2.bias": z(HID),
        }
    return sd


def _inputs(seed: int, batch: int, length: int):
    rng = np.random.default_rng(seed)
    ids = rng.integers(1000, VOCAB - 2, size=(batch, length))
    ids[:, 0] = 101  # [CLS], overwritten with [ENC] by the fusion wrappers
    mask = np.ones((batch, length), np.int64)
    for b in range(1, batch):  # mixed caption lengths
        mask[b, length - 2 * b:] = 0
        ids[b, length - 2 * b:] = 0
    img = rng.normal(scale=0.5,
                     size=(batch, IMG_TOKENS, HID)).astype(np.float32)
    return ids, mask, img


def _record(check: str, ours: np.ndarray, theirs: np.ndarray,
            tol: float = TOL_MAX_ABS) -> dict:
    ours = np.asarray(ours, np.float64).ravel()
    theirs = np.asarray(theirs, np.float64).ravel()
    max_abs = float(np.max(np.abs(ours - theirs)))
    denom = float(np.linalg.norm(ours) * np.linalg.norm(theirs))
    cosine = float(ours @ theirs / denom) if denom else 1.0
    # guard against degenerate all-equal outputs masking wiring bugs
    spread = float(np.std(theirs))
    return {"check": check, "max_abs": max_abs, "cosine": round(cosine, 7),
            "ref_std": spread,
            "pass": bool(max_abs <= tol and cosine >= TOL_COSINE
                         and spread > 1e-4)}


# ---------------------------------------------------------------------------
# checks


IMG_SIZE = 384


def _pixels(seed: int, batch: int):
    """CLIP-normalized-looking random pixels, NCHW fp32."""
    rng = np.random.default_rng(seed)
    return rng.normal(scale=1.0,
                      size=(batch, 3, IMG_SIZE, IMG_SIZE)).astype(np.float32)


def check_vit(ref, seed: int = 50) -> dict:
    """The reference's OWN VisionTransformer (vit.py:113-194, instantiated
    exactly as create_vit('base', 384) does, blip.py:194-209) vs our Flax
    VisionTransformer through convert_vit — pixels in, [B, 577, 768] out."""
    import torch

    import jax.numpy as jnp

    from candidate_reranking_cir_tpu.config import ViTConfig
    from candidate_reranking_cir_tpu.models.vit import VisionTransformer
    from candidate_reranking_cir_tpu.runtime import convert

    torch.manual_seed(seed)
    model, width = ref.blip.create_vit("base", IMG_SIZE)
    assert width == HID
    model = model.eval()
    x = _pixels(seed, batch=2)
    with torch.no_grad():
        out = model(torch.as_tensor(x)).numpy()  # [B, 577, 768]

    cfg = ViTConfig()
    sd = _sd_numpy(model, "visual_encoder.")
    params = {"params": convert.convert_vit(
        sd, "visual_encoder", cfg.num_layers, cfg.num_heads,
        cfg.num_patches)}
    mine = VisionTransformer(cfg).apply(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)))  # ours is NHWC
    return _record("vit_forward", np.asarray(mine), out)


def check_img_embed(ref, seed: int = 60) -> dict:
    """End-to-end image tower: the reference's BLIP_Retrieval.img_embed
    (blip_stage1.py:48-64; real ViT + vision_proj + L2 norm) vs
    RetrievalModel.embed_images — pixels in, pooled normalized 256-d out.
    With check_med/check_stage1_fusion this anchors the entire stage-I
    forward graph (pixels -> logits) to reference code."""
    import torch

    import jax.numpy as jnp

    from candidate_reranking_cir_tpu.config import RetrievalModelConfig
    from candidate_reranking_cir_tpu.models.blip_retrieval import (
        RetrievalModel,
    )
    from candidate_reranking_cir_tpu.runtime import convert

    torch.manual_seed(seed)
    m = ref.blip_stage1.BLIP_Retrieval.__new__(ref.blip_stage1.BLIP_Retrieval)
    torch.nn.Module.__init__(m)
    m.visual_encoder, _ = ref.blip.create_vit("base", IMG_SIZE)
    m.text_encoder = ref.med.BertModel(ref.config, add_pooling_layer=False)
    m.vision_proj = torch.nn.Linear(HID, 256)
    m.text_proj = torch.nn.Linear(HID, 256)
    m.temp = torch.nn.Parameter(0.07 * torch.ones([]))
    m.eval()

    x = _pixels(seed + 1, batch=2)
    with torch.no_grad():
        raw, pooled = m.img_embed(torch.as_tensor(x),
                                  return_pool_and_normalized=True)

    sd = (_sd_numpy(m.visual_encoder, "visual_encoder.")
          | _sd_numpy(m.text_encoder, "text_encoder.")
          | _sd_numpy(m.vision_proj, "vision_proj.")
          | _sd_numpy(m.text_proj, "text_proj.")
          | {"temp": np.float32(0.07)})
    cfg = RetrievalModelConfig(text=_text_cfg())
    params = convert.convert_stage1(sd, cfg)
    model = RetrievalModel(cfg)
    my_raw, my_pooled = model.apply(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)), pool_and_normalize=True,
        method=RetrievalModel.embed_images)

    rec = _record("img_embed_raw", np.asarray(my_raw), raw.numpy())
    rec_p = _record("img_embed_pooled", np.asarray(my_pooled), pooled.numpy())
    # fold into one record pair by returning both from run_all
    return [rec, rec_p]


def check_med_multimodal(ref, seed: int = 0) -> dict:
    """Reference med.BertModel multimodal forward (med.py:586-821) vs
    TextEncoder, weights through convert_med."""
    import torch

    import jax.numpy as jnp

    from candidate_reranking_cir_tpu.models.med import TextEncoder
    from candidate_reranking_cir_tpu.runtime import convert

    torch.manual_seed(seed)
    model = ref.med.BertModel(ref.config, add_pooling_layer=False).eval()
    ids, mask, img = _inputs(seed, batch=2, length=11)
    with torch.no_grad():
        out = model(torch.as_tensor(ids), attention_mask=torch.as_tensor(mask),
                    encoder_hidden_states=torch.as_tensor(img),
                    encoder_attention_mask=torch.ones(
                        (ids.shape[0], IMG_TOKENS), dtype=torch.long),
                    return_dict=True).last_hidden_state.numpy()

    sd = _sd_numpy(model, "te.")
    params = {"params": convert.convert_med(sd, "te", LAYERS, HEADS)}
    mine = TextEncoder(_text_cfg(), mode="multimodal").apply(
        params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
        jnp.asarray(img))
    return _record("med_multimodal", np.asarray(mine), out)


def _duplicate_reference_contract(sd: dict) -> dict:
    """Transcription of the reference's single->dual key duplication
    (blip_stage2.py:160-187) — independent of convert.duplicate_for_dual_stream
    so the converter's own duplication is checked against this, not itself."""
    out = dict(sd)
    for key in list(sd.keys()):
        if "crossattention.self." in key:
            out[key.replace("self", "self0")] = sd[key]
            out[key.replace("self", "self1")] = sd[key]
        elif "crossattention.output.dense." in key:
            out[key.replace("dense", "dense0")] = sd[key]
            out[key.replace("dense", "dense1")] = sd[key]
        if "attention.self." in key:
            out[key.replace("self", "self0")] = sd[key]
            out[key.replace("self", "self1")] = sd[key]
        elif "attention.output.dense." in key:
            out[key.replace("dense", "dense0")] = sd[key]
            out[key.replace("dense", "dense1")] = sd[key]
        if "output.LayerNorm" in key and "attention" in key:
            out[key.replace("LayerNorm", "LayerNormA")] = sd[key]
            out[key.replace("LayerNorm", "LayerNormB")] = sd[key]
    return out


def _run_dual(ref, nlvr_model, single_sd_for_convert, seed: int, check: str):
    import torch

    import jax.numpy as jnp

    from candidate_reranking_cir_tpu.models.dual_encoder import (
        DualStreamEncoder,
    )
    from candidate_reranking_cir_tpu.runtime import convert

    ids, mask, img = _inputs(seed + 1, batch=2, length=9)
    z_t = np.random.default_rng(seed + 2).normal(
        scale=0.5, size=(2, 9, HID)).astype(np.float32)
    atts = torch.ones((2, IMG_TOKENS), dtype=torch.long)
    with torch.no_grad():
        out = nlvr_model(
            torch.as_tensor(ids), attention_mask=torch.as_tensor(mask),
            z_t=torch.as_tensor(z_t),
            encoder_hidden_states=[torch.as_tensor(img)] * 2,
            encoder_attention_mask=[atts, atts],
            return_dict=True).numpy()  # [B, 2H] concat CLS

    params = {"params": convert.convert_dual_encoder(
        single_sd_for_convert, "te", LAYERS, HEADS,
        merge_mlp_from=MERGE_MLP_FROM, hidden_size=HID)}
    dual = DualStreamEncoder(_text_cfg())
    mine = dual.apply(params, jnp.asarray(ids, jnp.int32),
                      jnp.asarray(mask, jnp.int32), jnp.asarray(z_t),
                      jnp.asarray(img)[:, None], shared_candidates=False)
    return _record(check, np.asarray(mine)[:, 0], out)


def check_dual_from_single(ref, seed: int = 10) -> dict:
    """Duplication contract: a single-stream MED state dict loaded through
    the reference's own duplication (blip_stage2.py:160-187) into
    nlvr_encoder.BertModel vs convert_dual_encoder's internal duplication of
    the same single-stream dict. merge_layer weights (absent from a
    single-stream dict; left random by the reference's strict=False load) are
    zeroed on the torch side to match the converter's zero-init."""
    import torch

    torch.manual_seed(seed)
    single = ref.med.BertModel(ref.config, add_pooling_layer=False)
    single_sd = {k: v.detach().clone()
                 for k, v in single.state_dict().items()}
    dup_sd = _duplicate_reference_contract(single_sd)

    model = ref.nlvr_encoder.BertModel(ref.config,
                                       add_pooling_layer=False).eval()
    model.load_state_dict(dup_sd, strict=False)
    for layer in model.encoder.layer:
        out = layer.crossattention.output
        if getattr(out, "mergeMLP", False):
            out.merge_layer.weight.data.zero_()
            out.merge_layer.bias.data.zero_()

    sd = {f"te.{k}": v.numpy() for k, v in single_sd.items()}
    return _run_dual(ref, model, sd, seed, "dual_from_single")


def check_dual_twin(ref, seed: int = 20) -> dict:
    """Trained-checkpoint path: nlvr_encoder.BertModel with its native random
    init (independent twin streams, real merge_layer weights) exported
    directly — exercises the asymmetric merge schedule end to end."""
    import torch

    torch.manual_seed(seed)
    model = ref.nlvr_encoder.BertModel(ref.config,
                                       add_pooling_layer=False).eval()
    sd = _sd_numpy(model, "te.")
    return _run_dual(ref, model, sd, seed, "dual_twin")


def check_stage1_fusion(ref, seed: int = 30) -> list[dict]:
    """blip_stage1.img_txt_fusion (blip_stage1.py:66-92): train-mode B x B
    contrastive logits, eval-mode normalized 256-d features, and raw z_t —
    vs RetrievalModel through convert_stage1."""
    import torch

    import jax.numpy as jnp

    from candidate_reranking_cir_tpu.config import RetrievalModelConfig
    from candidate_reranking_cir_tpu.models.blip_retrieval import (
        RetrievalModel,
    )
    from candidate_reranking_cir_tpu.runtime import convert

    torch.manual_seed(seed)
    ids, mask, img = _inputs(seed, batch=3, length=10)

    m = ref.blip_stage1.BLIP_Retrieval.__new__(ref.blip_stage1.BLIP_Retrieval)
    torch.nn.Module.__init__(m)
    m.text_encoder = ref.med.BertModel(ref.config, add_pooling_layer=False)
    m.vision_proj = torch.nn.Linear(HID, 256)
    m.text_proj = torch.nn.Linear(HID, 256)
    m.temp = torch.nn.Parameter(0.07 * torch.ones([]))
    m.tokenizer = _StubTokenizer(ids, mask)
    m.eval()

    tgt = np.random.default_rng(seed + 1).normal(size=(3, 256))
    tgt = (tgt / np.linalg.norm(tgt, axis=-1, keepdims=True)).astype(
        np.float32)
    with torch.no_grad():
        logits = m.img_txt_fusion(torch.as_tensor(img), torch.as_tensor(tgt),
                                  ["caption"] * 3, train=True).numpy()
        feats = m.img_txt_fusion(torch.as_tensor(img), None, ["caption"] * 3,
                                 train=False).numpy()
        raw = m.img_txt_fusion(torch.as_tensor(img), None, ["caption"] * 3,
                               train=False,
                               return_raw=True).last_hidden_state.numpy()

    sd = (_sd_numpy(m.text_encoder, "text_encoder.") | _zero_vit_sd()
          | _sd_numpy(m.vision_proj, "vision_proj.")
          | _sd_numpy(m.text_proj, "text_proj.")
          | {"temp": np.float32(0.07)})
    cfg = RetrievalModelConfig(text=_text_cfg())
    params = convert.convert_stage1(sd, cfg)
    model = RetrievalModel(cfg)

    ids_enc = ids.copy()
    ids_enc[:, 0] = ENC_TOKEN_ID  # the wrapper overwrites [CLS] with [ENC]
    j_ids = jnp.asarray(ids_enc, jnp.int32)
    j_mask = jnp.asarray(mask, jnp.int32)
    my_raw = model.apply(params, jnp.asarray(img), j_ids, j_mask,
                         return_raw=True, method=RetrievalModel.fuse)
    my_feats = model.apply(params, jnp.asarray(img), j_ids, j_mask,
                           method=RetrievalModel.fuse)
    my_logits = model.apply(params, my_feats, jnp.asarray(tgt),
                            method=RetrievalModel.contrastive_logits)

    recs = [_record("stage1_train_logits", np.asarray(my_logits), logits,
                    tol=5e-4),  # /0.07 amplifies feature error ~14x
            _record("stage1_eval_features", np.asarray(my_feats), feats),
            _record("stage1_raw_zt", np.asarray(my_raw), raw)]
    return recs


def check_stage2_fusion(ref, seed: int = 40) -> list[dict]:
    """blip_stage2.img_txt_fusion B x B train grid (blip_stage2.py:78-99) vs
    score_shared, and img_txt_fusion_val K-candidate scores
    (blip_stage2.py:101-136) vs score_per_query — through convert_stage2."""
    import torch

    import jax.numpy as jnp

    from candidate_reranking_cir_tpu.config import RerankerModelConfig
    from candidate_reranking_cir_tpu.models.blip_reranker import RerankerModel
    from candidate_reranking_cir_tpu.runtime import convert

    torch.manual_seed(seed)
    B, L, K = 3, 9, 4
    ids, mask, img = _inputs(seed, batch=B, length=L)
    z_t = np.random.default_rng(seed + 2).normal(
        scale=0.5, size=(B, L, HID)).astype(np.float32)

    m = ref.blip_stage2.BLIP_NLVR.__new__(ref.blip_stage2.BLIP_NLVR)
    torch.nn.Module.__init__(m)
    m.text_encoder = ref.nlvr_encoder.BertModel(ref.config,
                                                add_pooling_layer=False)
    m.cls_head = torch.nn.Sequential(
        torch.nn.Linear(HID * 2, HID), torch.nn.ReLU(),
        torch.nn.Linear(HID, 2))
    m.tokenizer = _StubTokenizer(ids, mask)
    m.eval()

    raw = SimpleNamespace(last_hidden_state=torch.as_tensor(z_t))
    with torch.no_grad():
        grid = m.img_txt_fusion(raw, torch.as_tensor(img),
                                ["caption"] * B).numpy()  # [B, B]

    # val path: batch-size-1 query (first row), K candidates
    rng = np.random.default_rng(seed + 3)
    cand = rng.normal(scale=0.5,
                      size=(K, IMG_TOKENS, HID)).astype(np.float32)
    m.tokenizer = _StubTokenizer(ids[:1], mask[:1])
    raw1 = SimpleNamespace(last_hidden_state=torch.as_tensor(z_t[:1]))
    with torch.no_grad():
        val = m.img_txt_fusion_val(raw1, torch.as_tensor(cand),
                                   ["caption"]).numpy()  # [K]

    sd = (_sd_numpy(m.text_encoder, "text_encoder.") | _zero_vit_sd()
          | _sd_numpy(m.cls_head, "cls_head."))
    cfg = RerankerModelConfig(text=_text_cfg())
    params = convert.convert_stage2(sd, cfg)
    model = RerankerModel(cfg)

    ids_enc = ids.copy()
    ids_enc[:, 0] = ENC_TOKEN_ID
    j_ids = jnp.asarray(ids_enc, jnp.int32)
    j_mask = jnp.asarray(mask, jnp.int32)
    my_grid = model.apply(params, jnp.asarray(z_t), j_ids, j_mask,
                          jnp.asarray(img), method=RerankerModel.score_shared)
    my_val = model.apply(params, jnp.asarray(z_t[:1]), j_ids[:1], j_mask[:1],
                         jnp.asarray(cand)[None],
                         method=RerankerModel.score_per_query)

    return [_record("stage2_train_grid", np.asarray(my_grid), grid),
            _record("stage2_val_scores", np.asarray(my_val)[0], val)]


def run_all(src_dir: str = DEFAULT_SRC, seed: int = 0) -> list[dict]:
    """Run every differential check; returns the list of records."""
    ref = load_reference(src_dir)
    records = [check_med_multimodal(ref, seed),
               check_dual_from_single(ref, seed + 10),
               check_dual_twin(ref, seed + 20)]
    records += check_stage1_fusion(ref, seed + 30)
    records += check_stage2_fusion(ref, seed + 40)
    records += [check_vit(ref, seed + 50)]
    records += check_img_embed(ref, seed + 60)
    return records


if __name__ == "__main__":
    import json

    src = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SRC
    recs = run_all(src)
    print(json.dumps(recs, indent=2))
    sys.exit(0 if all(r["pass"] for r in recs) else 1)
