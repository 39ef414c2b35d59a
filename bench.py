"""Benchmarks for the four hot paths. Prints one JSON line each:

1. stage2_rerank_triplets_per_sec — the headline: stage-II re-rank scoring
   driven through the production candidate-major scheduler
   (retrieval/rerank.rerank_candidate_major) on a synthetic workload with
   CIRR-val statistics (corpus ~N/4, ~100 queries per candidate, K=50 + 5
   group members per query). Throughput counts only REAL scheduled pairs, so
   bucket padding waste is honestly included.
2. stage2_train_triplets_per_sec — full jitted stage-II train step at the
   reference config (B=16 => 256 triplets/step; frozen stage-I z_t + ViT
   embeds + dual pair grid + AdamW, layer remat).
3. stage1_train_pairs_per_sec — full jitted stage-I train step at the
   reference config (B=512, frozen ViT, contrastive CE).
4. stage1_eval_queries_per_sec — the reference's validation hot loop
   (validate.py:201-204, utils.py:25-72) at CIRR-val scale: full-corpus ViT
   index build (N=2297) + per-query fusion (N_q=4181) + full ranking.

Every line's ``vs_baseline`` is measured / an A100 FLOP-model estimate of
the REFERENCE implementation on its published hardware (1x A100,
README.md:130): exact matmul FLOP counts of the reference's algorithm
(incl. its per-pair candidate K/V recomputation and per-epoch target
re-embedding) at an optimistic 50% MFU of A100's 312 TFLOP/s bf16 peak.
See BASELINE.md "FLOP-model baselines" for the derivation and why 50% is
generous to an eager per-row loop. Every line also emits ``tflops`` (this
framework's OWN model FLOPs — amortized K/V, cached targets, i.e. the work
we actually schedule — per second) and ``mfu`` (tflops / 197 TF/s v5e-1
bf16 peak) so perf claims are auditable.

Timing: the remote-TPU relay does not honor block_until_ready, so the eval
paths are timed as host wall-clock around dispatch-everything-then-fetch
(the final D2H transfers synchronize), and the train steps as
data-dependent step chains synced by a scalar D2H, with the relay RTT
subtracted.
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_PEAK_FLOPS = 312e12
A100_MFU = 0.5           # generous: the reference is an eager per-row loop
A100_EFF = A100_PEAK_FLOPS * A100_MFU
V5E_PEAK_FLOPS = 197e12  # v5e bf16 dense peak (per chip)

# model dims (med_config.json / ViT-B-16 @ 384)
D, S, NL = 768, 577, 12  # hidden, image tokens (24^2+1), layers


# ---------------------------------------------------------------------------
# FLOP accounting (matmul terms only; LN/softmax/gelu excluded on BOTH sides)


def vit_fwd_flops(s=S, d=D, layers=NL) -> float:
    """ViT-B/16 forward: patch embed + per layer qkv/out (8sd^2),
    scores+apply (4s^2 d), MLP ratio 4 (16sd^2)."""
    patch = 2 * (s - 1) * (16 * 16 * 3) * d
    per_layer = 8 * s * d * d + 4 * s * s * d + 16 * s * d * d
    return patch + layers * per_layer


def med_fwd_flops(l: float, s=S, d=D, layers=NL, kv_share: float = 1.0) -> float:
    """MED multimodal forward at caption length l (med.py:414-508):
    self-attn + cross-attn (K/V over the s image tokens: the 4sd^2 term
    dominates at small l) + FFN. ``kv_share``: fraction of the image-K/V
    projection cost actually paid per query (1.0 = per-query, the
    reference; <1 under this framework's reference-image-major fusion,
    where queries sharing an image share its per-layer K/V)."""
    self_ = 8 * l * d * d + 4 * l * l * d
    cross = 4 * l * d * d + 4 * s * d * d * kv_share + 4 * l * s * d
    ffn = 16 * l * d * d
    return layers * (self_ + cross + ffn)


def dual_fwd_flops(l: float, kv_share: float = 1.0, s=S, d=D,
                   layers=NL) -> float:
    """Dual-stream encoder forward per (query, candidate) pair
    (nlvr_encoder.py:225-478): twin self-attn, twin cross-attn whose
    candidate K/V projections cost 2 * 4sd^2 — ``kv_share`` is the fraction
    of that cost actually paid per pair (1.0 = recomputed for every pair,
    the reference's loop, blip_stage2.py:78-136; 1/B = computed once per
    candidate and broadcast, this framework's pair grid), shared FFN on both
    streams, and the MLP merge (layers 6-11)."""
    self_ = 2 * (8 * l * d * d + 4 * l * l * d)
    cross = 2 * (4 * l * d * d + 4 * s * d * d * kv_share + 4 * l * s * d)
    ffn = 2 * 16 * l * d * d
    merge = 2 * l * d * d  # Linear(2D->D) on l tokens, half the layers
    return layers * (self_ + cross + ffn + merge)


# ---------------------------------------------------------------------------
# harness helpers


def measure_rtt():
    @jax.jit
    def trivial(x):
        return x + 1.0

    float(trivial(jnp.zeros(())))
    t0 = time.perf_counter()
    for _ in range(5):
        float(trivial(jnp.zeros(())))
    return (time.perf_counter() - t0) / 5


def rand_params(shapes, key):
    leaves, td = jax.tree_util.tree_flatten(shapes)
    keys = jax.random.split(key, len(leaves))
    return jax.tree_util.tree_unflatten(td, [
        (jax.random.normal(k, s.shape, s.dtype) * 0.02
         if jnp.issubdtype(s.dtype, jnp.floating)
         else jnp.zeros(s.shape, s.dtype))
        for k, s in zip(keys, leaves)])


def _previous_round_values() -> dict:
    """metric -> value from the newest BENCH_r*.json next to this file (the
    driver's artifact: its 'tail' field holds the emitted JSON lines)."""
    import glob
    import os
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    newest, newest_n = None, -1
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r0*(\d+)\.json$", path)
        if m and int(m.group(1)) > newest_n:
            newest, newest_n = path, int(m.group(1))
    if newest is None:
        return {}
    vals = {}
    try:
        with open(newest) as f:
            blob = f.read()
        for line in blob.splitlines():
            line = line.strip().replace("\\\"", "\"")
            for frag in line.split("\\n"):
                frag = frag.strip()
                if frag.startswith("{\"metric\""):
                    try:
                        rec = json.loads(frag)
                        vals[rec["metric"]] = float(rec["value"])
                    except (json.JSONDecodeError, KeyError, ValueError):
                        pass
    except OSError:
        return {}
    vals["_round"] = newest_n
    return vals


_PREV = _previous_round_values()


def timed_median(fn, repeats: int = 3, rtt: float = 0.0) -> tuple:
    """Run ``fn`` (one full timed pass, returns its own sync) ``repeats``
    times; return (median_dt, spread) where spread = (max-min)/median over
    the per-pass times. Guards the headline numbers against the rig's
    run-to-run relay noise (single-shot r3/r4 lines moved +-5% round to
    round with no way to tell noise from regression)."""
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        times.append(max(time.perf_counter() - t0 - rtt, 1e-9))
    times.sort()
    med = times[len(times) // 2] if len(times) % 2 else (
        0.5 * (times[len(times) // 2 - 1] + times[len(times) // 2]))
    return med, (times[-1] - times[0]) / med


def emit(metric, value, unit, baseline, our_flops_per_unit, spread=None):
    """our_flops_per_unit: this framework's OWN per-unit model FLOPs (its
    algorithm, not the reference's) — tflops/mfu report what we schedule.
    spread: (max-min)/median across timed passes, the run-to-run envelope."""
    achieved = value * our_flops_per_unit
    rec = {
        "metric": metric,
        "value": round(value, 1),
        "unit": unit,
        "vs_baseline": round(value / baseline, 3),
        "tflops": round(achieved / 1e12, 1),
        "mfu": round(achieved / V5E_PEAK_FLOPS, 3),
    }
    if spread is not None:
        rec["spread"] = round(spread, 3)
    prev = _PREV.get(metric)
    if prev and value < 0.95 * prev:
        print(f"bench: WARNING {metric} {value:.0f} is "
              f"{100 * (1 - value / prev):.1f}% below BENCH_r"
              f"{_PREV.get('_round')}'s {prev:.0f}", file=sys.stderr,
              flush=True)
    print(json.dumps(rec), flush=True)


class _BenchTokenizer:
    """Pre-encoded captions: the benchmark measures device scoring, not
    wordpiece; encode() returns deterministic ids, padded to the bucket with
    per-caption true lengths (full-length when lengths is None)."""

    overflow = "truncate"

    def __init__(self, lengths: np.ndarray | None = None):
        self.lengths = lengths

    def encode(self, texts, max_len, set_enc_token=False, overflow=None):
        rng = np.random.default_rng(42)
        ids = rng.integers(10, 20000, size=(len(texts), max_len)).astype(
            np.int32)
        mask = np.ones((len(texts), max_len), np.int32)
        if self.lengths is not None:
            cols = np.arange(max_len)[None, :]
            keep = cols < self.lengths[:len(texts), None]
            ids *= keep
            mask *= keep
        return ids, mask


def caption_lengths(n: int, max_len: int) -> np.ndarray:
    """Synthetic CIRR-like caption token counts (incl. [CLS]/[SEP]): CIRR
    modification texts average ~11 words => ~13 wordpieces; modeled as
    clip(round(N(15, 5)), 6, max_len). No caption data ships with the
    reference, so the distribution is an assumption — documented here and
    applied identically to the measured workload and the A100 baseline."""
    rng = np.random.default_rng(7)
    return np.clip(np.round(rng.normal(15.0, 5.0, size=n)), 6,
                   max_len).astype(np.int32)


def _stage1_models(train: bool):
    from candidate_reranking_cir_tpu.config import (
        RetrievalModelConfig,
        TextEncoderConfig,
        vit_config,
    )
    from candidate_reranking_cir_tpu.models.blip_retrieval import (
        RetrievalModel,
    )

    if train:
        # no 'dots' policy here: at bs=512 the saved cross-attn K/V
        # projections (~11 GB) blow HBM — stage I stays full-recompute remat
        cfg = RetrievalModelConfig(
            vit=vit_config("base", 384, remat=True, fused_attention=True),
            text=TextEncoderConfig(remat=True, fused_attention=True))
    else:
        # text fused too, matching cli/common.py's TPU default ('auto'): the
        # folded kernel + flat projections now engage for cross-attention at
        # every query width (tools/t_xattn_forms.py) — the bench previously
        # measured the XLA text path the CLI never runs on TPU
        cfg = RetrievalModelConfig(
            vit=vit_config("base", 384, fused_attention=True),
            text=TextEncoderConfig(fused_attention=True))
    return RetrievalModel(cfg, dtype=jnp.bfloat16), cfg


# ---------------------------------------------------------------------------
# 1. stage-II re-rank evaluation (headline)


def bench_stage2_eval(rtt):
    from candidate_reranking_cir_tpu.config import (
        RerankerModelConfig,
        RetrievalModelConfig,
    )
    from candidate_reranking_cir_tpu.models.blip_reranker import RerankerModel
    from candidate_reranking_cir_tpu.models.blip_retrieval import (
        RetrievalModel,
    )
    from candidate_reranking_cir_tpu.retrieval.rerank import (
        rerank_candidate_major,
    )

    s1_cfg = RetrievalModelConfig()
    s2_cfg = RerankerModelConfig()
    s1 = RetrievalModel(s1_cfg, dtype=jnp.bfloat16)
    s2 = RerankerModel(s2_cfg, dtype=jnp.bfloat16)
    L = s2_cfg.text_len
    M = s2_cfg.vit.num_tokens
    W = s2_cfg.text.encoder_width

    # CIRR-val-like statistics at quarter scale: every corpus image recurs in
    # ~100 queries' lists (4181*55/2297 ~= 100 on the real split)
    n_idx, n_q, k = 574, 1044, 50
    rng = np.random.default_rng(0)
    index_names = [f"im{i}" for i in range(n_idx)]
    index_feats = (jax.random.normal(
        jax.random.key(9), (n_idx, M, W), jnp.bfloat16) * 0.05)

    topk = np.empty((n_q, k), object)
    groups = []
    refs = []
    for q in range(n_q):
        sel = rng.choice(n_idx, size=k + 6, replace=False)
        topk[q] = [index_names[i] for i in sel[:k]]
        refs.append(index_names[sel[k]])
        groups.append([index_names[i] for i in sel[k:]])  # ref + 5 others

    ids = jnp.zeros((2, L), jnp.int32)
    msk = jnp.ones((2, L), jnp.int32)
    z0 = jnp.zeros((2, L, s2_cfg.text.hidden_size), jnp.bfloat16)
    imgs = jnp.zeros((2, s2_cfg.vit.image_size, s2_cfg.vit.image_size, 3))
    s1_params = rand_params(
        jax.eval_shape(lambda: s1.init(jax.random.key(0), imgs, ids, msk)),
        jax.random.key(1))
    s2_params = rand_params(
        jax.eval_shape(lambda: s2.init(jax.random.key(0), imgs, ids, msk,
                                       z0)),
        jax.random.key(2))

    lengths = caption_lengths(n_q, L)
    tok = _BenchTokenizer(lengths)
    kw = dict(captions=[f"caption {q}" for q in range(n_q)],
              reference_names=refs, topk_names=topk, index_feats=index_feats,
              index_names=index_names, text_len=L, group_members=groups)
    n_pairs = n_q * (k + 5)

    # A100 baseline: the reference scores each pair at its query's OWN
    # caption length (validate_stage2.py is bs=1 + pad-to-longest),
    # recomputing candidate K/V per pair (kv_share=1), plus the per-query
    # z_t production (validate_stage2.py:244) amortized over its K+5 pairs.
    ref_flops = (dual_fwd_flops(lengths.astype(np.float64), 1.0)
                 + med_fwd_flops(lengths.astype(np.float64)) / (k + 5))
    baseline = A100_EFF / float(ref_flops.mean())

    # our own work: pairs run at their L-bucket's padded width, and each
    # candidate's K/V projections are paid once per (candidate, query-chunk)
    # rather than per pair. ~100 queries/candidate split into q_buckets
    # chunks (e.g. 100 -> 64+32+4) => ~3 K/V instances per candidate.
    p50, p90 = np.percentile(lengths, [50, 90])
    bucket = lambda x: min(int(-(-x // 8) * 8), L)
    edges = sorted({bucket(p50), bucket(p90), L})
    widths = np.asarray([next(e for e in edges if e >= ln)
                         for ln in lengths], np.float64)
    kv_instances = 3.0 * n_idx
    our_flops = (dual_fwd_flops(widths, 0.0).mean()
                 + dual_fwd_flops(0.0, 1.0) * kv_instances / n_pairs
                 + med_fwd_flops(widths).mean() / (k + 5))

    # warmup run compiles the per-bucket programs; each timed pass is
    # wall-clock around dispatch-all-then-fetch (the final D2H syncs the
    # device stream); median of 3 passes guards against relay noise
    print("bench: compiling eval programs (several minutes through the "
          "remote-compile relay)...", file=sys.stderr, flush=True)
    rerank_candidate_major(s1, s1_params, s2, s2_params, tok, **kw)
    dt, spread = timed_median(
        lambda: rerank_candidate_major(s1, s1_params, s2, s2_params, tok,
                                       **kw), rtt=rtt)
    emit("stage2_rerank_triplets_per_sec", n_pairs / dt, "triplets/s",
         baseline, our_flops, spread=spread)


# ---------------------------------------------------------------------------
# 2. stage-II train step


def bench_stage2_train(rtt, iters=4):
    from candidate_reranking_cir_tpu.config import (
        RerankerModelConfig,
        RetrievalModelConfig,
        TextEncoderConfig,
        TrainConfig,
        vit_config,
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

    b = 16  # reference stage-II config (Instructions_CIRR.md:66-77)
    s1_cfg = RetrievalModelConfig()
    s2_cfg = RerankerModelConfig(
        vit=vit_config("base", 384, drop_path_rate=0.1, remat=True,
                       remat_policy="dots", fused_attention=True),
        text=TextEncoderConfig(remat=True, remat_policy="dots",
                               fused_attention=True))
    s1 = RetrievalModel(s1_cfg, dtype=jnp.bfloat16)
    s2 = RerankerModel(s2_cfg, dtype=jnp.bfloat16)
    L = s2_cfg.text_len
    im = s2_cfg.vit.image_size

    rng = np.random.default_rng(0)
    # production default (--text-len-buckets auto): the batch is sliced to
    # the smallest bucket holding its longest caption, like the reference's
    # pad-to-longest (blip_stage1.py:72). Sample a realistic batch.
    from candidate_reranking_cir_tpu.cli.common import (
        parse_text_buckets,
        text_bucket_slice,
    )

    lens = caption_lengths(b, L)
    ids_np = rng.integers(10, 20000, size=(b, L)).astype(np.int32)
    mask_np = (np.arange(L)[None, :] < lens[:, None]).astype(np.int32)
    ids_np, mask_np = text_bucket_slice(ids_np * mask_np, mask_np,
                                        parse_text_buckets("auto", L))
    l_ours = ids_np.shape[1]     # our padded bucket width
    l_ref = float(lens.max())    # the reference pads to the batch's longest
    batch = {
        "ref_images": jnp.asarray(rng.normal(size=(b, im, im, 3)) * 0.3,
                                  jnp.float32),
        "target_images": jnp.asarray(rng.normal(size=(b, im, im, 3)) * 0.3,
                                     jnp.float32),
        "input_ids": jnp.asarray(ids_np),
        "attention_mask": jnp.asarray(mask_np),
    }
    s1_params = s1.init(jax.random.key(1), batch["ref_images"][:2],
                        batch["input_ids"][:2], batch["attention_mask"][:2])
    z_dummy = jnp.zeros((2, l_ours, s2_cfg.text.hidden_size))
    s2_params = s2.init(jax.random.key(2), batch["target_images"][:2],
                        batch["input_ids"][:2], batch["attention_mask"][:2],
                        z_dummy)
    tx, _ = make_optimizer(TrainConfig(batch_size=b), s2_params, 100,
                           freeze_prefixes=("params/visual_encoder",))
    state = TrainState.create(s2_params, tx)
    step = make_stage2_train_step(s1, s2, donate=True)

    # A100 baseline (stage2_train.py:434-480 + blip_stage2.py:78-99): per
    # B x B step the reference runs 2B frozen ViT forwards (ref + target),
    # B frozen stage-I fusion forwards (z_t), then B sequential dual-encoder
    # calls scoring B pairs each — fwd+bwd (3x) with candidate K/V
    # recomputed per pair — all padded to the batch's longest caption.
    ref_per_triplet = (3.0 * dual_fwd_flops(l_ref, 1.0)
                       + (med_fwd_flops(l_ref) + 2 * vit_fwd_flops()) / b)
    baseline = A100_EFF / ref_per_triplet
    # ours: same step algorithmically restructured — candidate K/V once per
    # candidate (kv_share=1/B), pair grid at the bucket width. (Remat
    # recompute is excluded, the standard 3x-forward MFU convention.)
    our_per_triplet = (3.0 * dual_fwd_flops(l_ours, 1.0 / b)
                       + (med_fwd_flops(l_ours) + 2 * vit_fwd_flops()) / b)

    # rbg dropout keys (the trainer default): threefry mask generation over
    # the pair-grid attention probs costs ~20% of the step
    print("bench: compiling stage-II train step...", file=sys.stderr,
          flush=True)
    state, loss = step(state, s1_params, batch, jax.random.key(3, impl="rbg"))
    float(loss)  # compile + sync

    def one_pass():
        nonlocal state
        for _ in range(iters):
            state, loss = step(state, s1_params, batch,
                               jax.random.key(4, impl="rbg"))
        float(loss)

    dt, spread = timed_median(one_pass, rtt=rtt)
    emit("stage2_train_triplets_per_sec", b * b / (dt / iters), "triplets/s",
         baseline, our_per_triplet, spread=spread)


# ---------------------------------------------------------------------------
# 3. stage-I train step


def bench_stage1_train(rtt, iters=2):
    from candidate_reranking_cir_tpu.config import TrainConfig
    from candidate_reranking_cir_tpu.runtime.optim import make_optimizer
    from candidate_reranking_cir_tpu.runtime.train_steps import (
        TrainState,
        make_stage1_train_step,
    )

    b = 512  # reference stage-I config (Instructions_CIRR.md:18-26)
    model, cfg = _stage1_models(train=True)
    L = cfg.text_len
    im = cfg.vit.image_size

    rng = np.random.default_rng(0)
    tgt = rng.normal(size=(b, 256)).astype(np.float32)
    tgt /= np.linalg.norm(tgt, axis=-1, keepdims=True)
    # production default (--text-len-buckets auto): pad-to-bucket like the
    # reference's per-batch pad-to-longest
    from candidate_reranking_cir_tpu.cli.common import (
        parse_text_buckets,
        text_bucket_slice,
    )

    lens = caption_lengths(b, L)
    ids_np = rng.integers(10, 20000, size=(b, L)).astype(np.int32)
    mask_np = (np.arange(L)[None, :] < lens[:, None]).astype(np.int32)
    ids_np, mask_np = text_bucket_slice(ids_np * mask_np, mask_np,
                                        parse_text_buckets("auto", L))
    l_ours = ids_np.shape[1]
    l_ref = float(lens.max())
    batch = {
        "ref_images": jnp.asarray(rng.normal(size=(b, im, im, 3)) * 0.3,
                                  jnp.float32),
        # production default (frozen ViT): pooled target features come from
        # the per-corpus cache, not a second in-step ViT pass
        "target_pooled": jnp.asarray(tgt),
        "input_ids": jnp.asarray(ids_np),
        "attention_mask": jnp.asarray(mask_np),
    }
    params = model.init(jax.random.key(0), batch["ref_images"][:2],
                        batch["input_ids"][:2], batch["attention_mask"][:2])
    tx, _ = make_optimizer(TrainConfig(batch_size=b), params, 100,
                           freeze_prefixes=("params/visual_encoder",))
    state = TrainState.create(params, tx)
    step = make_stage1_train_step(model, finetune_vit=False, donate=True)

    # A100 baseline (stage1_train.py:145-190): per pair the reference runs
    # TWO frozen ViT forwards every step (reference image full features +
    # target image re-embedded every epoch, blip-bs=16 eager micro-batches)
    # + MED fusion fwd+bwd (3x) padded to the batch's longest caption.
    ref_per_pair = 2 * vit_fwd_flops() + 3.0 * med_fwd_flops(l_ref)
    baseline = A100_EFF / ref_per_pair
    # ours: ONE ViT forward (pooled target features are corpus-cached) + MED
    # fusion fwd+bwd at the bucket width.
    our_per_pair = vit_fwd_flops() + 3.0 * med_fwd_flops(l_ours)

    print("bench: compiling stage-I train step...", file=sys.stderr,
          flush=True)
    state, loss = step(state, batch, jax.random.key(1, impl="rbg"))
    float(loss)

    def one_pass():
        nonlocal state
        for _ in range(iters):
            state, loss = step(state, batch, jax.random.key(2, impl="rbg"))
        float(loss)

    dt, spread = timed_median(one_pass, rtt=rtt)
    emit("stage1_train_pairs_per_sec", b / (dt / iters), "pairs/s", baseline,
         our_per_pair, spread=spread)


# ---------------------------------------------------------------------------
# 4. stage-I evaluation (index build + query fusion + full ranking)


def bench_stage1_eval(rtt):
    from candidate_reranking_cir_tpu.retrieval.validate_engine import (
        build_fusion_plan,
        make_single_program_eval,
        resolve_buckets,
        schedule_fusion_batches,
    )

    model, cfg = _stage1_models(train=False)
    L = cfg.text_len
    im = cfg.vit.image_size
    # embed_bs: the r4 standalone re-sweep puts the ViT peak at 64/128
    # (1,198 img/s vs 1,182 at 32, tools/t_vit_sweep.py) but inside the
    # embed scan 32 and 64 measure identical (1,110 img/s) and 64 adds a
    # reproducible ~0.1 s to the ranking phase — so 32 stays
    n_idx, n_q, embed_bs, q_batch = 2297, 4181, 32, 256  # CIRR-val scale

    ids0 = jnp.ones((2, L), jnp.int32)
    params = rand_params(
        jax.eval_shape(lambda: model.init(
            jax.random.key(0), jnp.zeros((2, im, im, 3)), ids0, ids0)),
        jax.random.key(1))

    # device-resident synthetic corpus: the compute benchmark must not be
    # throttled by the relay's ~35 MB/s H2D (the reference baseline models
    # compute only, so H2D is excluded on both sides)
    n_batches = -(-n_idx // embed_bs)
    imgs = jax.random.normal(jax.random.key(2),
                             (n_batches, embed_bs, im, im, 3),
                             jnp.float32) * 0.3

    lengths = caption_lengths(n_q, L)
    rng = np.random.default_rng(3)
    ref_idx = rng.integers(0, n_idx, size=n_q).astype(np.int32)
    tok = _BenchTokenizer(lengths)
    captions = [f"caption {q}" for q in range(n_q)]
    # target + reference + 5 group members per query, as the engine requests
    ent = np.concatenate([rng.integers(0, n_idx, size=(n_q, 1)),
                          ref_idx[:, None],
                          rng.integers(0, n_idx, size=(n_q, 5))],
                         axis=1).astype(np.int32)

    # single-program executor (the production --single-program path): the
    # whole evaluation — embed scan + fusion family scans + ranking — is ONE
    # jitted launch, so no per-launch submission gap is ever exposed
    # (r5: multi-launch vs single-program A/B in tools/t_single_prog_eval.py;
    # a v5e has one TensorCore, so that gap removal is the entire
    # embed/fusion "overlap" opportunity)
    ids_all, mask_all, bucket_of = resolve_buckets(tok, captions, L, "auto")
    fams, inv = build_fusion_plan(
        schedule_fusion_batches(ref_idx, bucket_of, q_batch, True),
        ids_all, mask_all)
    prog = make_single_program_eval(model)
    inv_j, ent_j = jnp.asarray(inv), jnp.asarray(ent)

    def run():
        topk, ranks = prog(params, imgs, fams, inv_j, ent_j,
                           n_idx=n_idx, width=501)
        return np.asarray(topk), np.asarray(ranks)

    # A100 baseline (validate.py:161-234 + utils.py:25-72): per query, one
    # fusion forward at the query's own caption length + the full-corpus ViT
    # index build amortized over the queries (the ranking matmul, ~1.2
    # MFLOP/query, is negligible on both sides).
    ref_per_query = (med_fwd_flops(lengths.astype(np.float64)).mean()
                     + n_idx * vit_fwd_flops() / n_q)
    baseline = A100_EFF / ref_per_query
    # ours: same algorithm; fusion runs at L-bucketed widths (the engine's
    # l_buckets='auto'), embed batches padded to embed_bs.
    p50, p90 = np.percentile(lengths, [50, 90])
    bucket = lambda x: min(int(-(-x // 8) * 8), L)
    edges = sorted({bucket(p50), bucket(p90), L})
    widths = np.asarray([next(e for e in edges if e >= ln)
                         for ln in lengths], np.float64)
    # reference-image-major fusion (validate_engine.predict_queries): the
    # per-layer image K/V projections run once per power-of-2 query chunk,
    # not once per query — count the ACTUALLY dispatched K/V units with the
    # scheduler's own group sizes (q <= q_batch; no mesh here) so
    # tflops/mfu reflect scheduled work (batch-tail padding <1%, ignored)
    group_sizes = [q for q in (8, 4, 2) if q <= q_batch] + [1]
    by_img: dict[int, int] = {}
    for r in ref_idx:
        by_img[int(r)] = by_img.get(int(r), 0) + 1
    kv_units = 0
    for c in by_img.values():
        for qchunk in group_sizes:
            kv_units += c // qchunk
            c -= (c // qchunk) * qchunk
    our_per_query = (med_fwd_flops(widths, kv_share=kv_units / n_q).mean()
                     + n_batches * embed_bs * vit_fwd_flops() / n_q)

    print("bench: compiling stage-I eval programs...", file=sys.stderr,
          flush=True)
    topk, ranks = run()
    assert topk.shape == (n_q, 501) and ranks.shape == (n_q, 7)
    dt, spread = timed_median(run, rtt=rtt)
    emit("stage1_eval_queries_per_sec", n_q / dt, "queries/s", baseline,
         our_per_query, spread=spread)


def main():
    # Persistent XLA cache: repeat bench invocations skip the relay's
    # remote-compile round trips entirely (timed passes are post-warmup, so
    # measured numbers are unaffected either way).
    from candidate_reranking_cir_tpu.runtime.host import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    # --only rerank,s2train,s1train,s1eval — subset selection for A/B runs
    # (tools/ harnesses and regression classification); default: all four.
    names = {"rerank": bench_stage2_eval, "s2train": bench_stage2_train,
             "s1train": bench_stage1_train, "s1eval": bench_stage1_eval}
    selected = list(names)
    for a in sys.argv[1:]:
        if a.startswith("--only"):
            sel = a.split("=", 1)[1] if "=" in a \
                else sys.argv[sys.argv.index(a) + 1]
            selected = [s.strip() for s in sel.split(",")]
    rtt = measure_rtt()
    first = True
    for key in selected:
        fn = names[key]
        try:
            fn(rtt)
        except Exception as e:
            if first:  # keep the headline line even if another bench dies
                raise
            print(f"# {fn.__name__} failed: {e}", flush=True)
        first = False


if __name__ == "__main__":
    main()
