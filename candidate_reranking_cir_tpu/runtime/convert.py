"""PyTorch -> JAX weight conversion.

Maps the reference's checkpoint trees (BLIP `.pth` pretrains and the repo's
trained `.pt` files, formats at utils.py:146-150 / blip.py:215-237) onto this
framework's parameter pytrees. Key structural translations:

- torch ``Linear.weight`` [out, in] -> dense kernel [in, out] (transpose);
  multi-head projections additionally reshape to [in, heads, head_dim] /
  [heads, head_dim, out],
- timm patch-embed conv [D, 3, P, P] -> space-to-depth dense [P*P*3, D],
- per-layer module lists -> a stacked leading layer axis (nn.scan layout),
- BLIP pos-embed interpolation for image-size mismatches (vit.py:281-305)
  via jax.image bicubic resize,
- the stage-II dual-stream duplication contract (blip_stage2.py:160-187):
  single-stream pretrain weights are copied into both streams' slots
  (self0/self1, dense0/dense1, LayerNormA/B) when loading a BLIP base
  checkpoint; trained stage-II checkpoints carry the twin keys directly.

Input is a flat {key: numpy array} dict — produced by ``load_torch_state``
(torch-cpu) so no torch dependency leaks past this module.
"""
from __future__ import annotations

from typing import Mapping

import jax
import numpy as np


# ---------------------------------------------------------------------------
# torch file reading


def load_torch_state(path: str) -> dict[str, np.ndarray]:
    """Read a torch checkpoint into {key: np.ndarray}. Handles the reference's
    wrappers: {'model': sd} (BLIP pretrain) and {'<ClassName>': sd, 'epoch',
    'optimizer_state_dict'} (reference save_model, utils.py:146-150)."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(raw, dict):
        for key in ("model", "BLIP_Retrieval", "BLIP_NLVR"):
            if key in raw and isinstance(raw[key], dict):
                raw = raw[key]
                break
    return {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v)
            for k, v in raw.items() if hasattr(v, "shape")}


# ---------------------------------------------------------------------------
# primitives


def _dense(sd, prefix, out=None):
    w = sd[f"{prefix}.weight"]
    p = {"kernel": np.ascontiguousarray(w.T)}
    if f"{prefix}.bias" in sd:
        p["bias"] = sd[f"{prefix}.bias"]
    return p


def _head_proj(sd, prefix, heads):
    """Linear [all_head, in] -> HeadProjection [in, heads, head_dim]."""
    w = sd[f"{prefix}.weight"]
    out_dim, in_dim = w.shape
    k = np.ascontiguousarray(w.T).reshape(in_dim, heads, out_dim // heads)
    b = sd[f"{prefix}.bias"].reshape(heads, out_dim // heads)
    return {"kernel": k, "bias": b}


def _head_out(sd, prefix, heads):
    """Linear [out, all_head] -> HeadOutProjection [heads, head_dim, out]."""
    w = sd[f"{prefix}.weight"]
    out_dim, in_dim = w.shape
    k = np.ascontiguousarray(w.T).reshape(heads, in_dim // heads, out_dim)
    return {"kernel": k, "bias": sd[f"{prefix}.bias"]}


def _ln(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _stack(dicts: list[dict]) -> dict:
    """List of per-layer param dicts -> one dict with stacked leaves."""
    out = {}
    for key in dicts[0]:
        if isinstance(dicts[0][key], Mapping) or isinstance(dicts[0][key], dict):
            out[key] = _stack([d[key] for d in dicts])
        else:
            out[key] = np.stack([d[key] for d in dicts])
    return out


def interpolate_pos_embed(pos: np.ndarray, num_patches: int) -> np.ndarray:
    """Bicubic-resize checkpoint position embeddings to a new grid
    (reference vit.py:281-305). pos: [1, 1 + old_patches, D]."""
    old = pos.shape[1] - 1
    if old == num_patches:
        return pos
    dim = pos.shape[-1]
    old_size, new_size = int(old ** 0.5), int(num_patches ** 0.5)
    extra, grid = pos[:, :1], pos[:, 1:]
    grid = grid.reshape(1, old_size, old_size, dim)
    grid = np.asarray(jax.image.resize(
        jax.numpy.asarray(grid), (1, new_size, new_size, dim), "bicubic"))
    grid = grid.reshape(1, new_size * new_size, dim)
    return np.concatenate([extra, grid], axis=1)


# ---------------------------------------------------------------------------
# module converters


def convert_vit(sd: dict, prefix: str, num_layers: int, num_heads: int,
                num_patches: int) -> dict:
    """torch ViT subtree -> VisionTransformer params."""
    g = lambda k: sd[f"{prefix}.{k}"]
    conv_w = g("patch_embed.proj.weight")  # [D, 3, P, P]
    d_model = conv_w.shape[0]
    kernel = conv_w.transpose(2, 3, 1, 0).reshape(-1, d_model)
    patch = {"proj": {"kernel": np.ascontiguousarray(kernel),
                      "bias": g("patch_embed.proj.bias")}}

    layers = []
    for i in range(num_layers):
        p = f"{prefix}.blocks.{i}"
        qkv_w = sd[f"{p}.attn.qkv.weight"]      # [3D, D]
        qkv_b = sd[f"{p}.attn.qkv.bias"]
        d3 = qkv_w.shape[0] // 3
        heads, hd = num_heads, d3 // num_heads

        def split(part_w, part_b):
            return {"kernel": np.ascontiguousarray(part_w.T).reshape(
                        part_w.shape[1], heads, hd),
                    "bias": part_b.reshape(heads, hd)}

        attn = {
            "query": split(qkv_w[:d3], qkv_b[:d3]),
            "key": split(qkv_w[d3:2 * d3], qkv_b[d3:2 * d3]),
            "value": split(qkv_w[2 * d3:], qkv_b[2 * d3:]),
            "out": _head_out(sd, f"{p}.attn.proj", heads),
        }
        layers.append({
            "norm1": _ln(sd, f"{p}.norm1"),
            "attn": attn,
            "norm2": _ln(sd, f"{p}.norm2"),
            "mlp": {"fc1": _dense(sd, f"{p}.mlp.fc1"),
                    "fc2": _dense(sd, f"{p}.mlp.fc2")},
        })

    return {
        "patch_embed": patch,
        "cls_token": g("cls_token"),
        "pos_embed": interpolate_pos_embed(g("pos_embed"), num_patches),
        "blocks": _stack(layers),
        "norm": _ln(sd, f"{prefix}.norm"),
    }


def convert_med(sd: dict, prefix: str, num_layers: int, num_heads: int,
                multimodal: bool = True) -> dict:
    """torch MED BertModel subtree -> TextEncoder params."""
    emb = {
        "word_embeddings": sd[f"{prefix}.embeddings.word_embeddings.weight"],
        "position_embeddings":
            sd[f"{prefix}.embeddings.position_embeddings.weight"],
        "ln": _ln(sd, f"{prefix}.embeddings.LayerNorm"),
    }
    layers = []
    for i in range(num_layers):
        p = f"{prefix}.encoder.layer.{i}"
        layer = {
            "self_attn": {
                "attn": {
                    "query": _head_proj(sd, f"{p}.attention.self.query",
                                        num_heads),
                    "key": _head_proj(sd, f"{p}.attention.self.key", num_heads),
                    "value": _head_proj(sd, f"{p}.attention.self.value",
                                        num_heads),
                    "out": _head_out(sd, f"{p}.attention.output.dense",
                                     num_heads),
                },
                "ln": _ln(sd, f"{p}.attention.output.LayerNorm"),
            },
            "ffn": {
                "intermediate": _dense(sd, f"{p}.intermediate.dense"),
                "output": _dense(sd, f"{p}.output.dense"),
                "ln": _ln(sd, f"{p}.output.LayerNorm"),
            },
        }
        if multimodal:
            layer["cross_attn"] = {
                "attn": {
                    "query": _head_proj(sd, f"{p}.crossattention.self.query",
                                        num_heads),
                    "key": _head_proj(sd, f"{p}.crossattention.self.key",
                                      num_heads),
                    "value": _head_proj(sd, f"{p}.crossattention.self.value",
                                        num_heads),
                    "out": _head_out(sd, f"{p}.crossattention.output.dense",
                                     num_heads),
                },
                "ln": _ln(sd, f"{p}.crossattention.output.LayerNorm"),
            }
        layers.append(layer)
    return {"embeddings": emb, "layers": _stack(layers)}


def duplicate_for_dual_stream(sd: dict) -> dict:
    """Apply the reference's single->dual stream key duplication
    (blip_stage2.py:160-187) to a flat torch state dict."""
    out = dict(sd)
    for key in list(sd.keys()):
        if "crossattention.self." in key or "attention.self." in key:
            out[key.replace(".self.", ".self0.")] = sd[key]
            out[key.replace(".self.", ".self1.")] = sd[key]
        elif ("crossattention.output.dense." in key
              or "attention.output.dense." in key):
            out[key.replace(".dense.", ".dense0.")] = sd[key]
            out[key.replace(".dense.", ".dense1.")] = sd[key]
        if "output.LayerNorm" in key and "attention" in key:
            out[key.replace("LayerNorm", "LayerNormA")] = sd[key]
            out[key.replace("LayerNorm", "LayerNormB")] = sd[key]
    return out


def convert_dual_encoder(sd: dict, prefix: str, num_layers: int,
                         num_heads: int, merge_mlp_from: int,
                         hidden_size: int) -> dict:
    """torch dual-stream BertModel subtree -> DualStreamEncoder params.

    If the state dict lacks twin keys (a single-stream BLIP pretrain), the
    duplication contract is applied first. Missing merge_layer weights (layers
    >= merge_mlp_from in a fresh pretrain) are zero-initialized <- the
    reference leaves them randomly initialized via strict=False loading; zero
    init here makes the merged output start at 0 (a cleaner neutral start) and
    is irrelevant when loading trained stage-II checkpoints, which carry them.
    """
    probe = f"{prefix}.encoder.layer.0.attention.self0.query.weight"
    if probe not in sd:
        sd = duplicate_for_dual_stream(sd)

    emb = {
        "word_embeddings": sd[f"{prefix}.embeddings.word_embeddings.weight"],
        "position_embeddings":
            sd[f"{prefix}.embeddings.position_embeddings.weight"],
        "ln": _ln(sd, f"{prefix}.embeddings.LayerNorm"),
    }

    def layer_params(i: int, merge_mlp: bool) -> dict:
        p = f"{prefix}.encoder.layer.{i}"
        layer = {}
        for s in ("0", "1"):
            layer[f"self_attn{s}"] = {
                "query": _head_proj(sd, f"{p}.attention.self{s}.query",
                                    num_heads),
                "key": _head_proj(sd, f"{p}.attention.self{s}.key", num_heads),
                "value": _head_proj(sd, f"{p}.attention.self{s}.value",
                                    num_heads),
                "out": _head_out(sd, f"{p}.attention.output.dense{s}",
                                 num_heads),
            }
            layer[f"cross_q{s}"] = _head_proj(
                sd, f"{p}.crossattention.self{s}.query", num_heads)
            layer[f"cross_k{s}"] = _head_proj(
                sd, f"{p}.crossattention.self{s}.key", num_heads)
            layer[f"cross_v{s}"] = _head_proj(
                sd, f"{p}.crossattention.self{s}.value", num_heads)
            layer[f"cross_dense{s}"] = _head_out(
                sd, f"{p}.crossattention.output.dense{s}", num_heads)
        layer["self_ln0"] = _ln(sd, f"{p}.attention.output.LayerNormA")
        layer["self_ln1"] = _ln(sd, f"{p}.attention.output.LayerNormB")
        layer["cross_ln0"] = _ln(sd, f"{p}.crossattention.output.LayerNormA")
        layer["cross_ln1"] = _ln(sd, f"{p}.crossattention.output.LayerNormB")
        if merge_mlp:
            mk = f"{p}.crossattention.output.merge_layer.weight"
            if mk in sd:
                layer["merge"] = _dense(sd, f"{p}.crossattention.output."
                                            "merge_layer")
            else:
                layer["merge"] = {
                    "kernel": np.zeros((2 * hidden_size, hidden_size),
                                       np.float32),
                    "bias": np.zeros((hidden_size,), np.float32),
                }
        layer["ffn"] = {
            "intermediate": _dense(sd, f"{p}.intermediate.dense"),
            "output": _dense(sd, f"{p}.output.dense"),
            "ln": _ln(sd, f"{p}.output.LayerNorm"),
        }
        return layer

    n_avg = min(merge_mlp_from, num_layers)
    out = {"embeddings": emb}
    if n_avg:
        out["layers_avg"] = _stack(
            [layer_params(i, False) for i in range(n_avg)])
    if num_layers - n_avg:
        out["layers_mlp"] = _stack(
            [layer_params(i, True) for i in range(n_avg, num_layers)])
    return out


def convert_vit_npz(path_or_dict, num_layers: int, num_patches: int) -> dict:
    """Import an original JAX/Flax ViT checkpoint (.npz from
    google-research/vision_transformer) — the capability of the reference's
    ``_load_weights`` (vit.py:201-278). The npz stores kernels in exactly this
    framework's multi-head layout ([in, heads, head_dim]), so this is mostly a
    key re-map plus pos-embed interpolation.
    """
    if isinstance(path_or_dict, (str,)) or hasattr(path_or_dict, "read"):
        w = dict(np.load(path_or_dict))
    else:
        w = dict(path_or_dict)
    pre = "Transformer/"

    conv = w["embedding/kernel"]  # [P, P, 3, D]
    p, _, c, dmodel = conv.shape
    patch = {"proj": {"kernel": conv.reshape(p * p * c, dmodel),
                      "bias": w["embedding/bias"]}}

    layers = []
    for i in range(num_layers):
        b = f"{pre}encoderblock_{i}/"
        a = b + "MultiHeadDotProductAttention_1/"
        heads = w[a + "query/kernel"].shape[1]
        layers.append({
            "norm1": {"scale": w[b + "LayerNorm_0/scale"],
                      "bias": w[b + "LayerNorm_0/bias"]},
            "attn": {
                "query": {"kernel": w[a + "query/kernel"],
                          "bias": w[a + "query/bias"]},
                "key": {"kernel": w[a + "key/kernel"],
                        "bias": w[a + "key/bias"]},
                "value": {"kernel": w[a + "value/kernel"],
                          "bias": w[a + "value/bias"]},
                "out": {"kernel": w[a + "out/kernel"],
                        "bias": w[a + "out/bias"]},
            },
            "norm2": {"scale": w[b + "LayerNorm_2/scale"],
                      "bias": w[b + "LayerNorm_2/bias"]},
            "mlp": {
                "fc1": {"kernel": w[b + "MlpBlock_3/Dense_0/kernel"],
                        "bias": w[b + "MlpBlock_3/Dense_0/bias"]},
                "fc2": {"kernel": w[b + "MlpBlock_3/Dense_1/kernel"],
                        "bias": w[b + "MlpBlock_3/Dense_1/bias"]},
            },
        })

    return {
        "patch_embed": patch,
        "cls_token": w["cls"],
        "pos_embed": interpolate_pos_embed(
            w[f"{pre}posembed_input/pos_embedding"], num_patches),
        "blocks": _stack(layers),
        "norm": {"scale": w[f"{pre}encoder_norm/scale"],
                 "bias": w[f"{pre}encoder_norm/bias"]},
    }


# ---------------------------------------------------------------------------
# reverse conversion (JAX -> torch reference format)


def _unstack(stacked: dict, i: int) -> dict:
    return jax.tree_util.tree_map(lambda x: np.asarray(x)[i], stacked) \
        if False else {k: (_unstack(v, i) if isinstance(v, dict)
                           else np.asarray(v)[i]) for k, v in stacked.items()}


def _rev_dense(p: dict, out: dict, prefix: str):
    out[f"{prefix}.weight"] = np.ascontiguousarray(np.asarray(p["kernel"]).T)
    if "bias" in p:
        out[f"{prefix}.bias"] = np.asarray(p["bias"])


def _rev_head_proj(p: dict, out: dict, prefix: str):
    k = np.asarray(p["kernel"])  # [in, heads, hd]
    d_in = k.shape[0]
    out[f"{prefix}.weight"] = np.ascontiguousarray(
        k.reshape(d_in, -1).T)
    out[f"{prefix}.bias"] = np.asarray(p["bias"]).reshape(-1)


def _rev_head_out(p: dict, out: dict, prefix: str):
    k = np.asarray(p["kernel"])  # [heads, hd, out]
    d_out = k.shape[-1]
    out[f"{prefix}.weight"] = np.ascontiguousarray(
        k.reshape(-1, d_out).T)
    out[f"{prefix}.bias"] = np.asarray(p["bias"])


def _rev_ln(p: dict, out: dict, prefix: str):
    out[f"{prefix}.weight"] = np.asarray(p["scale"])
    out[f"{prefix}.bias"] = np.asarray(p["bias"])


def export_vit(params: dict, prefix: str, num_layers: int) -> dict:
    """VisionTransformer params -> timm-style torch keys (inverse of
    convert_vit, including re-fusing q/k/v into the qkv matrix)."""
    out: dict[str, np.ndarray] = {}
    pe = np.asarray(params["patch_embed"]["proj"]["kernel"])  # [P*P*3, D]
    d_model = pe.shape[-1]
    # infer P from kernel rows (P*P*3)
    p_sq = pe.shape[0] // 3
    p = int(round(p_sq ** 0.5))
    out[f"{prefix}.patch_embed.proj.weight"] = np.ascontiguousarray(
        pe.reshape(p, p, 3, d_model).transpose(3, 2, 0, 1))
    out[f"{prefix}.patch_embed.proj.bias"] = np.asarray(
        params["patch_embed"]["proj"]["bias"])
    out[f"{prefix}.cls_token"] = np.asarray(params["cls_token"])
    out[f"{prefix}.pos_embed"] = np.asarray(params["pos_embed"])
    _rev_ln(params["norm"], out, f"{prefix}.norm")

    for i in range(num_layers):
        lp = _unstack(params["blocks"], i)
        b = f"{prefix}.blocks.{i}"
        _rev_ln(lp["norm1"], out, f"{b}.norm1")
        _rev_ln(lp["norm2"], out, f"{b}.norm2")
        qkv_w, qkv_b = [], []
        for part in ("query", "key", "value"):
            k = np.asarray(lp["attn"][part]["kernel"])
            d_in = k.shape[0]
            qkv_w.append(k.reshape(d_in, -1).T)
            qkv_b.append(np.asarray(lp["attn"][part]["bias"]).reshape(-1))
        out[f"{b}.attn.qkv.weight"] = np.ascontiguousarray(
            np.concatenate(qkv_w))
        out[f"{b}.attn.qkv.bias"] = np.concatenate(qkv_b)
        _rev_head_out(lp["attn"]["out"], out, f"{b}.attn.proj")
        _rev_dense(lp["mlp"]["fc1"], out, f"{b}.mlp.fc1")
        _rev_dense(lp["mlp"]["fc2"], out, f"{b}.mlp.fc2")
    return out


def export_med(params: dict, prefix: str, num_layers: int,
               multimodal: bool = True) -> dict:
    """TextEncoder params -> reference MED torch keys (inverse of
    convert_med)."""
    out: dict[str, np.ndarray] = {}
    emb = params["embeddings"]
    out[f"{prefix}.embeddings.word_embeddings.weight"] = np.asarray(
        emb["word_embeddings"])
    out[f"{prefix}.embeddings.position_embeddings.weight"] = np.asarray(
        emb["position_embeddings"])
    _rev_ln(emb["ln"], out, f"{prefix}.embeddings.LayerNorm")
    for i in range(num_layers):
        lp = _unstack(params["layers"], i)
        b = f"{prefix}.encoder.layer.{i}"
        for part in ("query", "key", "value"):
            _rev_head_proj(lp["self_attn"]["attn"][part], out,
                           f"{b}.attention.self.{part}")
        _rev_head_out(lp["self_attn"]["attn"]["out"], out,
                      f"{b}.attention.output.dense")
        _rev_ln(lp["self_attn"]["ln"], out, f"{b}.attention.output.LayerNorm")
        if multimodal and "cross_attn" in lp:
            for part in ("query", "key", "value"):
                _rev_head_proj(lp["cross_attn"]["attn"][part], out,
                               f"{b}.crossattention.self.{part}")
            _rev_head_out(lp["cross_attn"]["attn"]["out"], out,
                          f"{b}.crossattention.output.dense")
            _rev_ln(lp["cross_attn"]["ln"], out,
                    f"{b}.crossattention.output.LayerNorm")
        _rev_dense(lp["ffn"]["intermediate"], out, f"{b}.intermediate.dense")
        _rev_dense(lp["ffn"]["output"], out, f"{b}.output.dense")
        _rev_ln(lp["ffn"]["ln"], out, f"{b}.output.LayerNorm")
    return out


def export_dual_encoder(params: dict, prefix: str, merge_mlp_from: int) -> dict:
    """DualStreamEncoder params -> reference nlvr-style torch keys (inverse
    of convert_dual_encoder)."""
    out: dict[str, np.ndarray] = {}
    emb = params["embeddings"]
    out[f"{prefix}.embeddings.word_embeddings.weight"] = np.asarray(
        emb["word_embeddings"])
    out[f"{prefix}.embeddings.position_embeddings.weight"] = np.asarray(
        emb["position_embeddings"])
    _rev_ln(emb["ln"], out, f"{prefix}.embeddings.LayerNorm")

    def export_layer(lp: dict, i: int, merge_mlp: bool):
        b = f"{prefix}.encoder.layer.{i}"
        for s in ("0", "1"):
            for part in ("query", "key", "value"):
                _rev_head_proj(lp[f"self_attn{s}"][part], out,
                               f"{b}.attention.self{s}.{part}")
            _rev_head_out(lp[f"self_attn{s}"]["out"], out,
                          f"{b}.attention.output.dense{s}")
            _rev_head_proj(lp[f"cross_q{s}"], out,
                           f"{b}.crossattention.self{s}.query")
            _rev_head_proj(lp[f"cross_k{s}"], out,
                           f"{b}.crossattention.self{s}.key")
            _rev_head_proj(lp[f"cross_v{s}"], out,
                           f"{b}.crossattention.self{s}.value")
            _rev_head_out(lp[f"cross_dense{s}"], out,
                          f"{b}.crossattention.output.dense{s}")
        _rev_ln(lp["self_ln0"], out, f"{b}.attention.output.LayerNormA")
        _rev_ln(lp["self_ln1"], out, f"{b}.attention.output.LayerNormB")
        _rev_ln(lp["cross_ln0"], out, f"{b}.crossattention.output.LayerNormA")
        _rev_ln(lp["cross_ln1"], out, f"{b}.crossattention.output.LayerNormB")
        if merge_mlp:
            _rev_dense(lp["merge"], out,
                       f"{b}.crossattention.output.merge_layer")
        _rev_dense(lp["ffn"]["intermediate"], out, f"{b}.intermediate.dense")
        _rev_dense(lp["ffn"]["output"], out, f"{b}.output.dense")
        _rev_ln(lp["ffn"]["ln"], out, f"{b}.output.LayerNorm")

    if "layers_avg" in params:
        n_avg = np.asarray(jax.tree_util.tree_leaves(
            params["layers_avg"])[0]).shape[0]
        for i in range(n_avg):
            export_layer(_unstack(params["layers_avg"], i), i, False)
    if "layers_mlp" in params:
        n_mlp = np.asarray(jax.tree_util.tree_leaves(
            params["layers_mlp"])[0]).shape[0]
        for i in range(n_mlp):
            export_layer(_unstack(params["layers_mlp"], i),
                         merge_mlp_from + i, True)
    return out


def export_stage1(variables: dict, cfg) -> dict:
    """RetrievalModel variables -> reference BLIP_Retrieval state dict."""
    p = variables["params"]
    out = export_vit(p["visual_encoder"], "visual_encoder",
                     cfg.vit.num_layers)
    out |= export_med(p["text_encoder"], "text_encoder", cfg.text.num_layers)
    _rev_dense(p["vision_proj"], out, "vision_proj")
    _rev_dense(p["text_proj"], out, "text_proj")
    out["temp"] = np.asarray(p["temp"], np.float32)
    return out


def export_stage2(variables: dict, cfg) -> dict:
    """RerankerModel variables -> reference BLIP_NLVR state dict."""
    p = variables["params"]
    out = export_vit(p["visual_encoder"], "visual_encoder",
                     cfg.vit.num_layers)
    out |= export_dual_encoder(p["text_encoder"], "text_encoder",
                               cfg.text.merge_mlp_from)
    _rev_dense(p["cls_dense1"], out, "cls_head.0")
    _rev_dense(p["cls_dense2"], out, "cls_head.2")
    return out


def save_torch_checkpoint(path: str, state_dict: dict, class_name: str,
                          epoch: int = 0) -> None:
    """Write the reference's checkpoint wrapper
    {'epoch', <ClassName>: sd, 'optimizer_state_dict': {}}
    (utils.py:146-150) readable by the reference's load paths."""
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in
          state_dict.items()}
    torch.save({"epoch": epoch, class_name: sd,
                "optimizer_state_dict": {}}, path)



# ---------------------------------------------------------------------------
# full models


def convert_lm_head(sd: dict, prefix: str = "cls.predictions") -> dict:
    """BertLMPredictionHead keys (med.py:825-969 family) -> BertLMHead params.
    The reference ties decoder.bias to a standalone `bias` parameter."""
    bias = sd.get(f"{prefix}.bias", sd.get(f"{prefix}.decoder.bias"))
    return {
        "transform": _dense(sd, f"{prefix}.transform.dense"),
        "ln": _ln(sd, f"{prefix}.transform.LayerNorm"),
        "decoder": {
            "kernel": np.ascontiguousarray(sd[f"{prefix}.decoder.weight"].T),
            "bias": bias,
        },
    }


def convert_caption_decoder(sd: dict, cfg) -> dict:
    """Flat torch BLIP_Decoder state dict -> CaptionDecoder params."""
    params = {
        "visual_encoder": convert_vit(
            sd, "visual_encoder", cfg.vit.num_layers, cfg.vit.num_heads,
            cfg.vit.num_patches),
        "text_decoder": convert_med(
            sd, "text_decoder.bert", cfg.text.num_layers, cfg.text.num_heads),
        "lm_head": convert_lm_head(sd, "text_decoder.cls.predictions"),
    }
    return {"params": params}


def convert_stage1(sd: dict, cfg) -> dict:
    """Flat torch BLIP_Retrieval state dict -> RetrievalModel params."""
    params = {
        "visual_encoder": convert_vit(
            sd, "visual_encoder", cfg.vit.num_layers, cfg.vit.num_heads,
            cfg.vit.num_patches),
        "text_encoder": convert_med(
            sd, "text_encoder", cfg.text.num_layers, cfg.text.num_heads),
        "vision_proj": _dense(sd, "vision_proj"),
        "text_proj": _dense(sd, "text_proj"),
        "temp": np.asarray(sd["temp"], np.float32).reshape(()),
    }
    return {"params": params}


def convert_base(sd: dict, cfg) -> dict:
    """Flat torch BLIP_Base state dict (blip.py:23-44: visual_encoder + MED
    text_encoder, no projection heads) -> BlipBase params."""
    params = {
        "visual_encoder": convert_vit(
            sd, "visual_encoder", cfg.vit.num_layers, cfg.vit.num_heads,
            cfg.vit.num_patches),
        "text_encoder": convert_med(
            sd, "text_encoder", cfg.text.num_layers, cfg.text.num_heads),
    }
    return {"params": params}


def convert_stage2(sd: dict, cfg) -> dict:
    """Flat torch BLIP_NLVR state dict -> RerankerModel params."""
    params = {
        "visual_encoder": convert_vit(
            sd, "visual_encoder", cfg.vit.num_layers, cfg.vit.num_heads,
            cfg.vit.num_patches),
        "text_encoder": convert_dual_encoder(
            sd, "text_encoder", cfg.text.num_layers, cfg.text.num_heads,
            cfg.text.merge_mlp_from, cfg.text.hidden_size),
        "cls_dense1": _dense(sd, "cls_head.0"),
        "cls_dense2": _dense(sd, "cls_head.2"),
    }
    return {"params": params}
