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
    """Jitted (z_t producer, [Qb, K] scorer, indexed scorer) triple."""

    @jax.jit
    def produce_zt(s1_params, ref_feats, ids, mask):
        return stage1.apply(s1_params, ref_feats, ids, mask, return_raw=True,
                            method=RetrievalModel.fuse)

    @jax.jit
    def score(s2_params, z_t, ids, mask, cand_feats):
        return reranker.apply(s2_params, z_t, ids, mask, cand_feats,
                              method=RerankerModel.score_per_query)

    @jax.jit
    def score_indexed(s2_params, z_t, ids, mask, unique_cand, pair_map):
        return reranker.apply(s2_params, z_t, ids, mask, unique_cand,
                              pair_map, method=RerankerModel.score_indexed)

    return produce_zt, score, score_indexed


def cluster_queries(cand_idx: np.ndarray, q_batch: int) -> np.ndarray:
    """Order queries so chunks of q_batch share candidates (maximizes the
    dedup win of the indexed scorer). Cheap heuristic: group by the top-1
    candidate — CIRR/FIQ queries retrieving the same best candidate share
    much of their top-K tail."""
    return np.argsort(cand_idx[:, 0], kind="stable")


def rerank(stage1, s1_params, reranker, s2_params, tokenizer, *,
           captions: list[str], reference_names: list[str],
           topk_names: np.ndarray, index_feats, index_names: list[str],
           text_len: int, q_batch: int = 8,
           skip_mask: np.ndarray | None = None,
           group_members: list[list[str]] | None = None,
           dedup: bool = False, dedup_cap: float = 0.625) -> RerankOutput:
    """Score every query's K candidates (and optional 5-member groups).

    index_feats: [N_idx, M, W] stage-II ViT features (device array).
    topk_names: [N, K] candidate names per query.
    skip_mask: [N] bool — True rows get SKIP_LOGIT instead of real scores.

    dedup=True: queries are processed in a clustered order and each chunk's
    candidate K/V projections run once per UNIQUE candidate (score_indexed)
    when the chunk's unique count fits the static dedup_cap bucket; chunks
    that don't compress fall back to the per-pair scorer. Output order is
    unchanged (results are scattered back). Default OFF: measured on v5e,
    XLA's gather materialization of the per-pair K/V outweighs the projection
    FLOPs saved (662 vs 1860 triplets/s) — revisit with a manual-DMA kernel.
    """
    n = len(captions)
    k = topk_names.shape[1]
    produce_zt, score, score_indexed = make_rerank_fns(stage1, reranker)

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

    # CIRR group members ride in the same scorer call as the top-K
    # candidates ([Q, K+5] pair grid) — one program per chunk instead of two
    if do_groups:
        cand_idx_all = np.concatenate([cand_idx, grp_idx], axis=1)
    else:
        cand_idx_all = cand_idx

    order = (cluster_queries(cand_idx, q_batch) if dedup and n > q_batch
             else np.arange(n))
    width = cand_idx_all.shape[1]
    u_cap = max(int(q_batch * width * dedup_cap) // 64 * 64, 64)

    for start in range(0, n, q_batch):
        rows = order[start:start + q_batch]
        count = len(rows)
        if count < q_batch:  # pad the tail chunk with repeats
            rows = np.concatenate(
                [rows, np.repeat(rows[:1], q_batch - count)])

        ids = jnp.asarray(ids_all[rows])
        msk = jnp.asarray(mask_all[rows])
        refs = jnp.take(index_feats, jnp.asarray(ref_idx[rows]), axis=0)
        z_t = produce_zt(s1_params, refs, ids, msk)

        chunk_cand = cand_idx_all[rows]
        uniq, inv = np.unique(chunk_cand, return_inverse=True)
        if dedup and len(uniq) <= u_cap:
            pad_uniq = np.pad(uniq, (0, u_cap - len(uniq)))
            unique_feats = jnp.take(index_feats, jnp.asarray(pad_uniq),
                                    axis=0)
            pair_map = jnp.asarray(inv.reshape(chunk_cand.shape), jnp.int32)
            out = score_indexed(s2_params, z_t, ids, msk, unique_feats,
                                pair_map)
        else:
            cands = jnp.take(index_feats, jnp.asarray(chunk_cand), axis=0)
            out = score(s2_params, z_t, ids, msk, cands)
        out = np.asarray(out[:count], np.float32)
        logits[rows[:count]] = out[:, :k]
        if do_groups:
            grp_logits[rows[:count]] = out[:, k:]

    if skip_mask is not None:
        logits[np.asarray(skip_mask, bool)] = SKIP_LOGIT

    # descending sort; stable on the negated scores for deterministic ties
    rank_order = np.argsort(-logits, axis=-1, kind="stable")
    group_order = (np.argsort(-grp_logits, axis=-1, kind="stable")
                   if do_groups else None)
    return RerankOutput(logits, grp_logits, rank_order, group_order)


def rerank_candidate_major(stage1, s1_params, reranker, s2_params, tokenizer, *,
                           captions: list[str], reference_names: list[str],
                           topk_names: np.ndarray, index_feats,
                           index_names: list[str], text_len: int,
                           skip_mask: np.ndarray | None = None,
                           group_members: list[list[str]] | None = None,
                           pairs_per_call: int = 512,
                           q_buckets: tuple[int, ...] = (8, 32, 128),
                           zt_batch: int = 32) -> RerankOutput:
    """Candidate-major re-rank scheduling: same outputs as ``rerank`` but the
    (query, candidate) pairs are grouped BY CANDIDATE, so each candidate's
    cross-attention K/V projections — the dominant FLOP term the reference
    recomputes per pair (blip_stage2.py:101-136) — run once per candidate and
    are broadcast across every query that ranks it (~90x reuse on CIRR val).

    Also unlike ``rerank`` (which computes skipped rows and overwrites them),
    skipped queries' top-K pairs are never scheduled — matching the
    reference's skip optimization compute-for-compute (validate_stage2.py:
    256-258) — while their 5-member groups are still scored
    (validate_stage2.py:261-269 runs groups regardless).

    Static shapes: per-candidate query lists are padded into ``q_buckets``
    and batched ``A`` candidates per call with A*B == pairs_per_call, so the
    whole evaluation compiles to one program per bucket size.
    """
    n = len(captions)
    k = topk_names.shape[1]
    produce_zt, _, _ = make_rerank_fns(stage1, reranker)

    @jax.jit
    def score_grid(p, z_t, ids, mask, cand):
        return reranker.apply(p, z_t, ids, mask, cand,
                              method=RerankerModel.score_grid)

    pos = {name: i for i, name in enumerate(index_names)}
    ref_idx = np.asarray([pos[r] for r in reference_names], np.int32)
    cand_idx = np.asarray(
        [[pos[nm] for nm in row] for row in topk_names], np.int32)
    ids_all, mask_all = tokenizer.encode(captions, text_len,
                                         set_enc_token=True)
    skip = (np.zeros(n, bool) if skip_mask is None
            else np.asarray(skip_mask, bool))

    do_groups = group_members is not None
    if do_groups:
        members_no_ref = [
            [m for m in g if m != r][:5]
            for g, r in zip(group_members, reference_names)]
        grp_idx = np.asarray(
            [[pos[m] for m in row] for row in members_no_ref], np.int32)

    # ---- 1. produce z_t for every query once (chunked, fixed shape) -------
    zt_chunks = []
    for start in range(0, n, zt_batch):
        rows = np.arange(start, min(start + zt_batch, n))
        if len(rows) < zt_batch:
            rows = np.concatenate(
                [rows, np.repeat(rows[:1], zt_batch - len(rows))])
        refs = jnp.take(index_feats, jnp.asarray(ref_idx[rows]), axis=0)
        zt_chunks.append(produce_zt(s1_params, refs,
                                    jnp.asarray(ids_all[rows]),
                                    jnp.asarray(mask_all[rows])))
    zt_all = jnp.concatenate(zt_chunks, axis=0)[:n]

    # ---- 2. pair lists per candidate --------------------------------------
    # entry: (query_row, kind, col); kind 0 = top-K slot, kind 1 = group slot
    per_cand: dict[int, list[tuple[int, int, int]]] = {}
    for qi in range(n):
        if not skip[qi]:
            for j in range(k):
                per_cand.setdefault(int(cand_idx[qi, j]), []).append((qi, 0, j))
        if do_groups:
            for j in range(grp_idx.shape[1]):
                per_cand.setdefault(int(grp_idx[qi, j]), []).append((qi, 1, j))

    # ---- 3. bucket each candidate's pairs into fixed-size chunks ----------
    buckets = sorted(q_buckets)
    chunks_by_b: dict[int, list[tuple[int, list]]] = {b: [] for b in buckets}
    for cid, entries in per_cand.items():
        step = buckets[-1]
        for s in range(0, len(entries), step):
            part = entries[s:s + step]
            b = next(bb for bb in buckets if bb >= len(part))
            chunks_by_b[b].append((cid, part))

    logits = np.full((n, k), SKIP_LOGIT, np.float32)
    grp_logits = np.zeros((n, 5), np.float32) if do_groups else None

    # ---- 4. batched candidate-major calls, dispatch all then fetch --------
    pending = []
    zrow_buf: dict[int, np.ndarray] = {}
    for b in buckets:
        chunks = chunks_by_b[b]
        if not chunks:
            continue
        a = max(1, pairs_per_call // b)
        for s in range(0, len(chunks), a):
            batch = chunks[s:s + a]
            while len(batch) < a:  # pad the call's candidate axis
                batch.append((batch[0][0], []))
            cand_ids = np.asarray([c for c, _ in batch], np.int32)
            rows = np.zeros((a, b), np.int32)
            valid = np.zeros((a, b), bool)
            qrow = np.zeros((a, b), np.int32)
            kind = np.zeros((a, b), np.int32)
            col = np.zeros((a, b), np.int32)
            for ai, (_, entries) in enumerate(batch):
                for bi, (qi, kd, cl) in enumerate(entries):
                    rows[ai, bi] = qi
                    valid[ai, bi] = True
                    qrow[ai, bi], kind[ai, bi], col[ai, bi] = qi, kd, cl
            z_t = jnp.take(zt_all, jnp.asarray(rows.ravel()),
                           axis=0).reshape(a, b, *zt_all.shape[1:])
            ids = jnp.asarray(ids_all[rows])
            msk = jnp.asarray(mask_all[rows])
            cand = jnp.take(index_feats, jnp.asarray(cand_ids), axis=0)
            scores = score_grid(s2_params, z_t, ids, msk, cand)
            pending.append((scores, valid, qrow, kind, col))

    for scores, valid, qrow, kind, col in pending:
        sc = np.asarray(scores, np.float32)
        tk = valid & (kind == 0)
        logits[qrow[tk], col[tk]] = sc[tk]
        if do_groups:
            gp = valid & (kind == 1)
            grp_logits[qrow[gp], col[gp]] = sc[gp]

    rank_order = np.argsort(-logits, axis=-1, kind="stable")
    group_order = (np.argsort(-grp_logits, axis=-1, kind="stable")
                   if do_groups else None)
    return RerankOutput(logits, grp_logits, rank_order, group_order)


def cirr_group_labels(members_no_ref: list[list[str]], group_order: np.ndarray,
                      target_names: list[str]) -> np.ndarray:
    """Re-sorted 5-member group -> boolean labels by target-name equality
    (validate_stage2.py:186-193)."""
    members = np.asarray(members_no_ref, dtype=object)
    sorted_names = np.take_along_axis(members, group_order, axis=1)
    targets = np.asarray(target_names, dtype=object)[:, None]
    return sorted_names == targets
