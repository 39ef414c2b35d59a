"""Shared CLI plumbing: model/tokenizer construction and checkpoint loading.

Flag surface mirrors the reference scripts (validate.py:343-358,
stage1_train.py:508-537, …) so reference users can switch with familiar
invocations; paths/configs collapse into the typed config tree.
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax.numpy as jnp

from candidate_reranking_cir_tpu.config import (
    RerankerModelConfig,
    RetrievalModelConfig,
    TextEncoderConfig,
    vit_config,
)
from candidate_reranking_cir_tpu.data.preprocessing import make_transform
from candidate_reranking_cir_tpu.models.blip_reranker import RerankerModel
from candidate_reranking_cir_tpu.models.blip_retrieval import RetrievalModel
from candidate_reranking_cir_tpu.models.tokenizer import load_tokenizer
from candidate_reranking_cir_tpu.runtime.checkpoint import load_model_params


def add_common_flags(parser: argparse.ArgumentParser):
    parser.add_argument("--dataset", type=str, required=True,
                        help="'CIRR' or 'fashionIQ'")
    parser.add_argument("--data-root", type=str, default=".",
                        help="directory containing cirr_dataset/ or "
                             "fashionIQ_dataset/")
    parser.add_argument("--target-ratio", default=1.25, type=float,
                        help="TargetPad target ratio")
    parser.add_argument("--transform", default="targetpad", type=str,
                        help="'squarepad' or 'targetpad'")
    parser.add_argument("--vocab", type=str, default="",
                        help="path to bert-base-uncased vocab.txt (fetch "
                             "with cli.fetch_vocab)")
    parser.add_argument("--allow-test-vocab", action="store_true",
                        help="run with the ~90-token unit-test vocabulary "
                             "instead of a real vocab file — outputs are "
                             "meaningless; for smoke tests only (env: "
                             "CIR_ALLOW_TEST_VOCAB=1)")
    parser.add_argument("--vit", type=str, default="base")
    parser.add_argument("--image-size", type=int, default=384)
    parser.add_argument("--text-len", type=int, default=40,
                        help="static text bucket length")
    parser.add_argument("--text-overflow", type=str, default="error",
                        choices=["error", "warn", "truncate"],
                        help="what to do when a caption exceeds --text-len: "
                             "fail loudly (default), truncate with a counted "
                             "warning, or silently clip (diverges from the "
                             "reference's pad-to-longest numerics)")
    parser.add_argument("--bf16", action="store_true", default=True)
    parser.add_argument("--no-bf16", dest="bf16", action="store_false")
    parser.add_argument("--native-pipe", action="store_true",
                        help="use the C++ decode+preprocess pipeline "
                             "(make -C native; JPEG sources only)")
    parser.add_argument("--dress-types", type=str, nargs="+",
                        default=["dress", "shirt", "toptee"],
                        help="Fashion-IQ categories")
    parser.add_argument("--fused-attention", type=str, default="auto",
                        choices=["auto", "on", "off"],
                        help="route attention through the Pallas "
                             "VMEM-resident kernels: the eval kernel for "
                             "deterministic calls (~10%% faster ViT forward "
                             "at 577 tokens) and the in-kernel-dropout "
                             "train kernel for large-KV training attention "
                             "(ops/pallas_attention_train.py); 'auto' "
                             "enables both on TPU backends only")
    parser.add_argument("--dropout-rng", type=str, default="rbg",
                        choices=["rbg", "threefry2x32"],
                        help="PRNG for dropout masks: the hardware "
                             "RngBitGenerator (default; threefry mask "
                             "generation over the pair-grid attention probs "
                             "costs ~20%% of a stage-II train step) or "
                             "jax's default threefry")
    parser.add_argument("--mesh", type=str, default="auto",
                        choices=["auto", "off"],
                        help="'auto' shards eval over all visible chips "
                             "(index build, query fusion, ranking, re-rank "
                             "pair grids); 'off' runs single-device")
    parser.add_argument("--model-config", type=str, default="",
                        help="JSON overriding model dims: "
                             '{"vit": {...}, "text": {...}, "embed_dim": N}')
    return parser


def _model_overrides(args):
    if not getattr(args, "model_config", ""):
        return None
    return json.loads(Path(args.model_config).read_text())


def _fused(args) -> bool:
    choice = getattr(args, "fused_attention", "auto")
    if choice == "auto":
        import jax

        return jax.default_backend() == "tpu"
    return choice == "on"


def build_stage1(args, *, remat: bool = False):
    ov = _model_overrides(args) or {}
    from candidate_reranking_cir_tpu.config import ViTConfig

    fused = _fused(args)
    # stage-I trains at bs=512: saving matmul outputs ('dots') would keep
    # ~11 GB of cross-attn K/V projections alive — full recompute only
    vit = (ViTConfig(**{"remat": remat, "fused_attention": fused,
                        **ov["vit"]}) if "vit" in ov
           else vit_config(args.vit, args.image_size, remat=remat,
                           fused_attention=fused))
    # text fused attention: eval ties XLA at these shapes (BASELINE.md), but
    # training routes through the in-kernel-dropout Pallas kernel
    # (ops/pallas_attention_train.py) — measured faster on both train steps
    text = TextEncoderConfig(**{"remat": remat, "fused_attention": fused,
                                **ov.get("text", {})})
    cfg = RetrievalModelConfig(vit=vit, text=text,
                               embed_dim=ov.get("embed_dim", 256),
                               text_len=args.text_len)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    return RetrievalModel(cfg, dtype=dtype), cfg


def build_stage2(args, *, remat: bool = False):
    ov = _model_overrides(args) or {}
    from candidate_reranking_cir_tpu.config import ViTConfig

    fused = _fused(args)
    # 'dots' saves matmul outputs and recomputes only attention/elementwise
    # in backward — measured +6% stage-II train step, fits HBM at B=16
    policy = "dots" if remat else ""
    vit = (ViTConfig(**{"remat": remat, "remat_policy": policy,
                        "fused_attention": fused,
                        **ov["vit"]}) if "vit" in ov
           else vit_config(args.vit, args.image_size, drop_path_rate=0.1,
                           remat=remat, remat_policy=policy,
                           fused_attention=fused))
    text = TextEncoderConfig(**{"remat": remat, "remat_policy": policy,
                                "fused_attention": fused,
                                **ov.get("text", {})})
    cfg = RerankerModelConfig(vit=vit, text=text, text_len=args.text_len)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    return RerankerModel(cfg, dtype=dtype), cfg


def load_params(path: str, stage: int, cfg):
    return load_model_params(path, stage, cfg)


def get_transform(args):
    if getattr(args, "native_pipe", False):
        from candidate_reranking_cir_tpu.data.native_pipe import (
            make_native_transform,
            native_available,
        )

        if native_available():
            return make_native_transform(args.transform, args.image_size,
                                         args.target_ratio)
        print("native image pipeline not built; falling back to PIL")
    return make_transform(args.transform, args.image_size, args.target_ratio)


def get_mesh(args):
    """Resolve --mesh: a data-parallel Mesh over all devices, or None."""
    if getattr(args, "mesh", "off") != "auto":
        return None
    import jax

    if len(jax.devices()) < 2:
        return None
    from candidate_reranking_cir_tpu.parallel.mesh import make_mesh

    return make_mesh()


def parse_l_buckets(spec: str):
    """--l-buckets value -> rerank_candidate_major's l_buckets argument:
    'auto', 'off' (None, single --text-len bucket), or '16,24,40'."""
    if spec == "auto":
        return "auto"
    if spec in ("off", "none"):
        return None
    return tuple(int(b) for b in spec.split(","))


def parse_text_buckets(spec: str, text_len: int) -> tuple[int, ...]:
    """Static per-batch text-width buckets for the trainers. 'auto' cuts at
    ~60%/80%/100% of --text-len (multiples of 8); 'off' -> () keeps the
    single static bucket."""
    if spec in ("off", "none"):
        return ()
    if spec == "auto":
        cand = {min(-(-int(text_len * f) // 8) * 8, text_len)
                for f in (0.6, 0.8)}
    else:
        cand = {int(b) for b in spec.split(",") if int(b) <= text_len}
    cand.add(text_len)
    return tuple(sorted(cand))


def text_bucket_slice(ids, mask, buckets: tuple[int, ...]):
    """Slice a pad-to-text_len batch down to the smallest bucket holding its
    longest caption. The reference trains pad-to-longest per batch
    (blip_stage1.py:72 tokenizes padding='longest'); a fixed bucket set keeps
    the compiled-program count bounded while recovering most of that saving —
    the train step's text-side compute scales with the padded width.
    Numerics per real token are unchanged (pad keys additively masked)."""
    if not buckets:
        return ids, mask
    max_len = int(mask.sum(axis=1).max())
    lb = next((b for b in buckets if b >= max_len), ids.shape[1])
    return ids[:, :lb], mask[:, :lb]


def get_tokenizer(args):
    import os

    allow_test = (getattr(args, "allow_test_vocab", False)
                  or os.environ.get("CIR_ALLOW_TEST_VOCAB") == "1")
    tok = load_tokenizer(args.vocab or None, allow_test_vocab=allow_test)
    if allow_test and not args.vocab:
        print("WARNING: running with the unit-test toy vocabulary "
              "(--allow-test-vocab); all text-derived outputs are "
              "meaningless", flush=True)
    tok.overflow = getattr(args, "text_overflow", "error")
    return tok


def prescan_captions(tokenizer, dataset, text_len: int, dataset_name: str):
    """Apply the caption-overflow policy to the WHOLE train split before the
    first step. All captions are known up front, so with the default
    overflow='error' an over-long caption aborts at startup with the full
    count — not hours into an epoch when the unlucky batch is tokenized
    (which would discard progress since the last checkpoint). For Fashion-IQ
    the longest random compositions (both two-caption orders) are scanned."""
    if dataset_name == "cirr":
        caps = [t["caption"] for t in dataset.triplets]
    else:
        from candidate_reranking_cir_tpu.data.captions import (
            fiq_longest_compositions,
        )

        caps = fiq_longest_compositions(
            [t["captions"] for t in dataset.triplets])
    if caps:
        tokenizer.encode(caps, text_len)


def print_metrics(metrics: dict):
    for k, v in metrics.items():
        print(f"{k} = {v:.2f}")
