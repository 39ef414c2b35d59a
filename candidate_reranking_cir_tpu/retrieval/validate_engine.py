"""Stage-I validation / top-k extraction engine.

Mirrors reference validate.py flows (cirr_val_retrieval :319-339,
fashioniq_val_retrieval :152-173) with the device work batched and jitted:

1. embed the 'classic' corpus -> raw [N, M, D] + pooled-normalized [N, E],
2. per relative-query batch: gather reference features from the index (no
   recompute — reference validate.py:142-143), fuse with the caption,
3. rank the full corpus by cosine distance, build labels, compute recalls,
4. optionally emit the top-k artifact consumed by stage II.

All shapes static: queries run in fixed-size buckets with tail padding.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from candidate_reranking_cir_tpu.data.captions import compose_fiq_eval
from candidate_reranking_cir_tpu.models.blip_retrieval import RetrievalModel
from candidate_reranking_cir_tpu.retrieval import metrics as M
from candidate_reranking_cir_tpu.retrieval.index import build_index
from candidate_reranking_cir_tpu.retrieval.topk_writer import topk_payload


@dataclass
class Stage1EvalResult:
    metrics: dict
    ranking: M.RankingResult
    index_names: list[str]
    target_names: list[str]


def make_stage1_fns(model: RetrievalModel, params):
    # params are explicit jit ARGUMENTS (bound here, not closed over): a
    # closure would bake ~1 GB of weights into the HLO as constants, which
    # the remote-compile path rejects (request size limit)
    @jax.jit
    def _embed(p, images):
        return model.apply(p, images, pool_and_normalize=True,
                           method=RetrievalModel.embed_images)

    @jax.jit
    def _fuse(p, ref_feats, ids, mask):
        return model.apply(p, ref_feats, ids, mask,
                           method=RetrievalModel.fuse)

    def embed(images):
        return _embed(params, images)

    def fuse(ref_feats, ids, mask):
        return _fuse(params, ref_feats, ids, mask)

    return embed, fuse


def predict_queries(fuse_fn, tokenizer, captions: list[str], ref_names,
                    index_feats, index_names, text_len: int,
                    q_batch: int = 32, mesh=None) -> np.ndarray:
    """Fused query features [N_q, E] via index-feature reuse.

    mesh: optional jax Mesh — each fixed-size query batch is sharded over the
    data axis so fusion runs SPMD across the chips (q_batch must divide).
    """
    from candidate_reranking_cir_tpu.parallel.mesh import (
        batch_sharding,
        fit_mesh,
    )

    mesh = fit_mesh(mesh, q_batch)
    pos = {n: i for i, n in enumerate(index_names)}
    ref_idx = np.asarray([pos[r] for r in ref_names], np.int32)
    ids_all, mask_all = tokenizer.encode(captions, text_len,
                                         set_enc_token=True)
    n = len(captions)
    out = np.empty((n, 0), np.float32) if n == 0 else None
    preds = []
    for start in range(0, n, q_batch):
        sl = slice(start, min(start + q_batch, n))
        count = sl.stop - sl.start
        pad = q_batch - count

        def padded(x):
            if pad == 0:
                return x[sl]
            return np.concatenate([x[sl], np.repeat(x[sl][:1], pad, axis=0)])

        refs = jnp.take(index_feats, jnp.asarray(padded(ref_idx)), axis=0)
        ids = jnp.asarray(padded(ids_all))
        msk = jnp.asarray(padded(mask_all))
        if mesh is not None:
            refs = jax.device_put(refs, batch_sharding(mesh, refs.ndim))
            ids = jax.device_put(ids, batch_sharding(mesh, 2))
            msk = jax.device_put(msk, batch_sharding(mesh, 2))
        pred = fuse_fn(refs, ids, msk)
        preds.append(np.asarray(pred[:count], np.float32))
    return np.concatenate(preds) if preds else out


def full_ranking(pred: np.ndarray, pooled_index, mesh=None) -> np.ndarray:
    """Ascending-distance stable argsort over the whole corpus, on device.

    mesh: optional jax Mesh — the ranking is embarrassingly parallel over
    queries, so the query axis is sharded over the data axis and each chip
    argsorts its slice against the (replicated) pooled index.
    """
    pred = jnp.asarray(pred)
    if mesh is None:
        distances = 1.0 - jnp.einsum(
            "qe,ne->qn", pred, pooled_index.astype(jnp.float32))
        return np.asarray(jnp.argsort(distances, axis=-1, stable=True))

    from candidate_reranking_cir_tpu.parallel.mesh import (
        batch_sharding,
        replicated,
    )

    n_dev = mesh.devices.size
    n = pred.shape[0]
    pad = (-n) % n_dev
    if pad:
        pred = jnp.concatenate([pred, jnp.zeros((pad, pred.shape[1]),
                                                pred.dtype)])
    pred = jax.device_put(pred, batch_sharding(mesh, 2))
    index = jax.device_put(pooled_index.astype(jnp.float32), replicated(mesh))

    @jax.jit
    def rank(p, idx):
        return jnp.argsort(1.0 - jnp.einsum("qe,ne->qn", p, idx),
                           axis=-1, stable=True)

    return np.asarray(rank(pred, index))[:n]


def evaluate_cirr_stage1(model, params, dataset_classic, dataset_relative,
                         tokenizer, *, text_len: int, batch_size: int = 32,
                         save_topk_k: int | None = None, mesh=None) -> tuple:
    embed, fuse = make_stage1_fns(model, params)
    raw, pooled, index_names = build_index(dataset_classic, embed,
                                           batch_size, pooled=True, mesh=mesh)

    captions, refs, targets, groups = [], [], [], []
    for i in range(len(dataset_relative)):
        s = dataset_relative[i]
        captions.append(s["caption"])
        refs.append(s["reference_name"])
        targets.append(s["target_name"])
        groups.append(s["group_members"])

    pred = predict_queries(fuse, tokenizer, captions, refs, raw, index_names,
                           text_len, batch_size, mesh=mesh)
    sorted_idx = full_ranking(pred, pooled, mesh=mesh)
    names_sorted = M.rank_names(sorted_idx, index_names)
    ranking = M.cirr_ranking(names_sorted, refs, targets, groups)
    mets = M.cirr_metrics(ranking)

    payload = None
    if save_topk_k:
        payload = topk_payload(
            ranking, index_names, targets, "val", k=save_topk_k)
    return Stage1EvalResult(mets, ranking, index_names, targets), payload


def evaluate_fiq_stage1(model, params, dataset_classic, dataset_relative,
                        tokenizer, *, text_len: int, batch_size: int = 32,
                        save_topk_k: int | None = None,
                        dress_types: list[str] | None = None,
                        mesh=None) -> tuple:
    embed, fuse = make_stage1_fns(model, params)
    raw, pooled, index_names = build_index(dataset_classic, embed,
                                           batch_size, pooled=True, mesh=mesh)

    captions_pairs, refs, targets = [], [], []
    for i in range(len(dataset_relative)):
        s = dataset_relative[i]
        captions_pairs.append(s["captions"])
        refs.append(s["reference_name"])
        targets.append(s["target_name"])
    captions = compose_fiq_eval(captions_pairs)

    pred = predict_queries(fuse, tokenizer, captions, refs, raw, index_names,
                           text_len, batch_size, mesh=mesh)
    sorted_idx = full_ranking(pred, pooled, mesh=mesh)
    names_sorted = M.rank_names(sorted_idx, index_names)
    ranking = M.fiq_ranking(names_sorted, targets)
    mets = M.fiq_metrics(ranking)

    payload = None
    if save_topk_k:
        payload = topk_payload(ranking, index_names, targets,
                               dataset_relative.split, k=save_topk_k,
                               dress_types=dress_types)
    return Stage1EvalResult(mets, ranking, index_names, targets), payload
