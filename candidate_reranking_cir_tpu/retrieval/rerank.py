"""Stage-II re-ranking evaluation engine.

Behavior parity with the reference (validate_stage2.py:209-278):

- one shared index-feature bank built with the STAGE-II ViT serves both the
  stage-I z_t production (the reference fuses stage-1 MED over stage-2 ViT
  features at eval, validate_stage2.py:244) and the candidate features,
- per query: z_t = stage1.fuse(ref_feats, caption, raw), then the K top-k
  candidates are scored by the dual encoder; queries whose target is absent
  from the top-K get all-(-99999.99) logits (the reference's skip optimization,
  validate_stage2.py:256-258),
- CIRR additionally re-scores the 5 non-reference group members
  (validate_stage2.py:261-269),
- final labels: descending-score argsort re-indexes the stored top-k labels
  via take_along_axis (validate_stage2.py:174-179).

TPU-first: queries are processed in fixed-size batches through ONE jitted
pair-grid program ([Qb, K] candidates per call) instead of the reference's
bs=1-per-query Python loop; the "skip" becomes a mask applied after the batched
compute (same numbers, no dynamic shapes).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from candidate_reranking_cir_tpu.models.blip_reranker import RerankerModel
from candidate_reranking_cir_tpu.models.blip_retrieval import RetrievalModel

SKIP_LOGIT = -99999.99  # validate_stage2.py:257


@dataclass
class RerankOutput:
    logits: np.ndarray                 # [N, K]
    group_logits: np.ndarray | None    # [N, 5] (CIRR) or None
    order: np.ndarray                  # [N, K] descending-score argsort
    group_order: np.ndarray | None


def make_rerank_fns(stage1: RetrievalModel, reranker: RerankerModel):
    """Jitted (z_t producer, [Qb, K] scorer) pair."""

    @jax.jit
    def produce_zt(s1_params, ref_feats, ids, mask):
        return stage1.apply(s1_params, ref_feats, ids, mask, return_raw=True,
                            method=RetrievalModel.fuse)

    @jax.jit
    def score(s2_params, z_t, ids, mask, cand_feats):
        return reranker.apply(s2_params, z_t, ids, mask, cand_feats,
                              method=RerankerModel.score_per_query)

    return produce_zt, score


def rerank(stage1, s1_params, reranker, s2_params, tokenizer, *,
           captions: list[str], reference_names: list[str],
           topk_names: np.ndarray, index_feats, index_names: list[str],
           text_len: int, q_batch: int = 8,
           skip_mask: np.ndarray | None = None,
           group_members: list[list[str]] | None = None) -> RerankOutput:
    """Score every query's K candidates (and optional 5-member groups).

    index_feats: [N_idx, M, W] stage-II ViT features (device array).
    topk_names: [N, K] candidate names per query.
    skip_mask: [N] bool — True rows get SKIP_LOGIT instead of real scores.
    """
    n = len(captions)
    k = topk_names.shape[1]
    produce_zt, score = make_rerank_fns(stage1, reranker)

    pos = {name: i for i, name in enumerate(index_names)}
    ref_idx = np.asarray([pos[r] for r in reference_names], np.int32)
    cand_idx = np.asarray(
        [[pos[nm] for nm in row] for row in topk_names], np.int32)

    ids_all, mask_all = tokenizer.encode(captions, text_len,
                                         set_enc_token=True)

    do_groups = group_members is not None
    if do_groups:
        members_no_ref = [
            [m for m in g if m != r][:5]
            for g, r in zip(group_members, reference_names)]
        grp_idx = np.asarray(
            [[pos[m] for m in row] for row in members_no_ref], np.int32)

    logits = np.empty((n, k), np.float32)
    grp_logits = np.empty((n, 5), np.float32) if do_groups else None

    n_pad = (-n) % q_batch
    for start in range(0, n + n_pad, q_batch):
        sl = slice(start, min(start + q_batch, n))
        count = sl.stop - sl.start
        if count <= 0:
            break

        def pad(x):
            if count == q_batch:
                return x[sl]
            reps = np.concatenate(
                [x[sl], np.repeat(x[sl.start:sl.start + 1],
                                  q_batch - count, axis=0)])
            return reps

        ids = jnp.asarray(pad(ids_all))
        msk = jnp.asarray(pad(mask_all))
        refs = jnp.take(index_feats, jnp.asarray(pad(ref_idx)), axis=0)
        z_t = produce_zt(s1_params, refs, ids, msk)

        cands = jnp.take(index_feats, jnp.asarray(pad(cand_idx)), axis=0)
        out = score(s2_params, z_t, ids, msk, cands)
        logits[sl] = np.asarray(out[:count], np.float32)

        if do_groups:
            gcands = jnp.take(index_feats, jnp.asarray(pad(grp_idx)), axis=0)
            gout = score(s2_params, z_t, ids, msk, gcands)
            grp_logits[sl] = np.asarray(gout[:count], np.float32)

    if skip_mask is not None:
        logits[np.asarray(skip_mask, bool)] = SKIP_LOGIT

    # descending sort; stable on the negated scores for deterministic ties
    order = np.argsort(-logits, axis=-1, kind="stable")
    group_order = (np.argsort(-grp_logits, axis=-1, kind="stable")
                   if do_groups else None)
    return RerankOutput(logits, grp_logits, order, group_order)


def cirr_group_labels(members_no_ref: list[list[str]], group_order: np.ndarray,
                      target_names: list[str]) -> np.ndarray:
    """Re-sorted 5-member group -> boolean labels by target-name equality
    (validate_stage2.py:186-193)."""
    members = np.asarray(members_no_ref, dtype=object)
    sorted_names = np.take_along_axis(members, group_order, axis=1)
    targets = np.asarray(target_names, dtype=object)[:, None]
    return sorted_names == targets
