"""Stage-II validation engine (reference validate_stage2.py flows).

Builds the stage-II ViT index over the val corpus, re-ranks each query's
top-K candidates with the batched pair-grid scorer, and computes the
re-ranked recalls (+ CIRR subset recalls from the re-scored 5-member groups).
"""
from __future__ import annotations

import jax
import numpy as np

from candidate_reranking_cir_tpu.data.captions import compose_fiq_eval
from candidate_reranking_cir_tpu.data.topk_io import resolve_fiq_topk_path
from candidate_reranking_cir_tpu.data.datasets import (
    CIRRDataset,
    FashionIQDataset,
)
from candidate_reranking_cir_tpu.models.blip_reranker import RerankerModel
from candidate_reranking_cir_tpu.ops.quant import quantize_bank
from candidate_reranking_cir_tpu.retrieval import metrics as M
from candidate_reranking_cir_tpu.retrieval.index import build_index
from candidate_reranking_cir_tpu.retrieval.rerank import (
    cirr_group_labels,
    rerank,
    rerank_candidate_major,
)


def _build_stage2_index(reranker, s2_params, classic_ds, batch_size=16,
                        mesh=None, shard_index=False):
    # params as a jit argument — closing over them would bake the weights
    # into the HLO (remote-compile request size limit)
    @jax.jit
    def _embed(p, images):
        return reranker.apply(p, images, method=RerankerModel.embed_images)

    return build_index(classic_ds, lambda im: _embed(s2_params, im),
                       batch_size, pooled=False, mesh=mesh,
                       shard_index=shard_index)


def _run_rerank(schedule, stage1, s1_params, reranker, s2_params, tokenizer,
                mesh, shard_index=False, **kw):
    """Dispatch to the re-rank scheduler.

    'candidate_major' (default): pairs grouped by candidate so K/V projections
    amortize over the ~90 queries that rank each corpus image — measured
    materially faster at CIRR shapes. 'query_major': fixed [Qb, K] pair-grid
    chunks (the round-1 path, kept for parity tests and tiny workloads).
    """
    if schedule == "candidate_major":
        kw.pop("q_batch", None)
        return rerank_candidate_major(stage1, s1_params, reranker, s2_params,
                                      tokenizer, mesh=mesh,
                                      index_sharded=shard_index, **kw)
    if shard_index:
        raise ValueError("shard_index requires schedule='candidate_major'")
    kw.pop("l_buckets", None)  # query-major runs the single text_len bucket
    return rerank(stage1, s1_params, reranker, s2_params, tokenizer,
                  mesh=mesh, **kw)


def evaluate_cirr_stage2(stage1, s1_params, reranker, s2_params, tokenizer, *,
                         data_root, transform, top_k_path, k, text_len,
                         q_batch: int = 8, batch_size: int = 16, mesh=None,
                         schedule: str = "candidate_major",
                         shard_index: bool = False, l_buckets="auto",
                         index_int8: bool = False) -> dict:
    classic = CIRRDataset(data_root, "val", "classic", transform,
                          load_topk=top_k_path, k=k)
    relative = CIRRDataset(data_root, "val", "relative", transform,
                           load_topk=top_k_path, k=k)
    raw, _, index_names = _build_stage2_index(reranker, s2_params, classic,
                                              batch_size, mesh=mesh,
                                              shard_index=shard_index)
    if index_int8:
        raw = quantize_bank(raw)  # ~half the bank HBM; scores shift <1%

    samples = [relative[i] for i in range(len(relative))]
    captions = [s["caption"] for s in samples]
    refs = [s["reference_name"] for s in samples]
    targets = [s["target_name"] for s in samples]
    groups = [s["group_members"] for s in samples]
    topk_names = np.stack([np.asarray(s["topk_names"]) for s in samples])
    topk_labels = np.stack([np.asarray(s["topk_labels"], bool)
                            for s in samples])

    hit_rate = 100.0 * topk_labels.any(1).mean()
    print(f"val-split: top-{k} candidate {hit_rate:.2f}%")

    skip = ~topk_labels.any(axis=1)  # validate_stage2.py:256-258
    out = _run_rerank(schedule, stage1, s1_params, reranker, s2_params,
                      tokenizer, mesh, shard_index=shard_index,
                      captions=captions, reference_names=refs,
                      topk_names=topk_names, index_feats=raw,
                      index_names=index_names, text_len=text_len,
                      q_batch=q_batch, skip_mask=skip, group_members=groups,
                      l_buckets=l_buckets)

    labels = M.reranked_labels(topk_labels, out.order)
    members_no_ref = [[m for m in g if m != r][:5]
                      for g, r in zip(groups, refs)]
    glabels = cirr_group_labels(members_no_ref, out.group_order, targets)

    n = len(labels)
    mets = {}
    for kk in (1, 5, 10, 50, 100):
        if kk <= labels.shape[1]:
            mets[f"recall_at{kk}"] = 100.0 * labels[:, :kk].sum() / n
    for kk in (1, 2, 3):
        mets[f"group_recall_at{kk}"] = 100.0 * glabels[:, :kk].sum() / n
    mets["mean_r5_rs1"] = (mets.get("recall_at5", 0.0)
                           + mets["group_recall_at1"]) / 2
    return mets


def evaluate_fiq_stage2(stage1, s1_params, reranker, s2_params, tokenizer, *,
                        data_root, transform, top_k_path, k, text_len,
                        dress_types=("shirt", "dress", "toptee"),
                        q_batch: int = 8, batch_size: int = 16, mesh=None,
                        schedule: str = "candidate_major",
                        shard_index: bool = False, l_buckets="auto",
                        index_int8: bool = False) -> dict:
    """Per-category re-rank eval; top_k_path may contain '{dress}' or the
    reference's 'DTYPE' placeholder, substituted per category (the reference
    stores one file per type, utils.py:195)."""
    mets = {}
    r10s, r50s = [], []
    for dress in dress_types:
        path = resolve_fiq_topk_path(top_k_path, dress)
        classic = FashionIQDataset(data_root, "val", [dress], "classic",
                                   transform, load_topk=path, k=k)
        relative = FashionIQDataset(data_root, "val", [dress], "relative",
                                    transform, load_topk=path, k=k)
        raw, _, index_names = _build_stage2_index(reranker, s2_params,
                                                  classic, batch_size,
                                                  mesh=mesh,
                                                  shard_index=shard_index)
        if index_int8:
            raw = quantize_bank(raw)

        samples = [relative[i] for i in range(len(relative))]
        captions = compose_fiq_eval([s["captions"] for s in samples])
        refs = [s["reference_name"] for s in samples]
        topk_names = np.stack([np.asarray(s["topk_names"]) for s in samples])
        topk_labels = np.stack([np.asarray(s["topk_labels"], bool)
                                for s in samples])

        skip = ~topk_labels.any(axis=1)
        out = _run_rerank(schedule, stage1, s1_params, reranker, s2_params,
                          tokenizer, mesh, shard_index=shard_index,
                          captions=captions, reference_names=refs,
                          topk_names=topk_names, index_feats=raw,
                          index_names=index_names, text_len=text_len,
                          q_batch=q_batch, skip_mask=skip,
                          l_buckets=l_buckets)
        labels = M.reranked_labels(topk_labels, out.order)
        n = len(labels)
        r10 = 100.0 * labels[:, :10].sum() / n
        r50 = 100.0 * labels[:, :50].sum() / n if labels.shape[1] >= 50 \
            else 100.0 * labels.sum() / n
        mets[f"{dress}_recall_at10"] = r10
        mets[f"{dress}_recall_at50"] = r50
        r10s.append(r10)
        r50s.append(r50)
    mets["average_recall10"] = float(np.mean(r10s))
    mets["average_recall50"] = float(np.mean(r50s))
    mets["average_recall"] = (mets["average_recall10"]
                              + mets["average_recall50"]) / 2
    return mets
