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
from candidate_reranking_cir_tpu.ops.quant import (
    Int8Bank,
    bank_len,
    take_rows,
)

SKIP_LOGIT = -99999.99  # validate_stage2.py:257


@dataclass
class RerankOutput:
    logits: np.ndarray                 # [N, K]
    group_logits: np.ndarray | None    # [N, 5] (CIRR) or None
    order: np.ndarray                  # [N, K] descending-score argsort
    group_order: np.ndarray | None


_FN_CACHE: dict = {}  # insertion-ordered; hits re-inserted -> LRU order
_FN_CACHE_MAX = 32  # per-process bound: evaluating many model instances
                    # (e.g. a checkpoint sweep) must not pin programs forever


def _cache_put(key, value):
    while len(_FN_CACHE) >= _FN_CACHE_MAX:
        # evict least-recently-used only: wholesale clear() would drop the
        # hot entry too, costing a multi-minute recompile on this rig
        _FN_CACHE.pop(next(iter(_FN_CACHE)))
    _FN_CACHE[key] = value
    return value


def _cache_get(key):
    value = _FN_CACHE.pop(key, None)
    if value is not None:
        _FN_CACHE[key] = value  # re-insert: mark most-recently-used
    return value


def make_rerank_fns(stage1: RetrievalModel, reranker: RerankerModel):
    """Jitted (z_t producer, [Qb, K] scorer, indexed scorer) triple.

    Memoized per (stage1, reranker) instance: a fresh ``jax.jit`` object per
    call would throw away the compilation cache, recompiling multi-minute
    programs on every evaluation (e.g. per Fashion-IQ category).
    """
    key = ("rerank_fns", id(stage1), id(reranker))
    cached = _cache_get(key)
    if cached is not None:
        return cached

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

    return _cache_put(key, (produce_zt, score, score_indexed))


def cluster_queries(cand_idx: np.ndarray, q_batch: int) -> np.ndarray:
    """Order queries so chunks of q_batch share candidates (maximizes the
    dedup win of the indexed scorer). Cheap heuristic: group by the top-1
    candidate — CIRR/FIQ queries retrieving the same best candidate share
    much of their top-K tail."""
    return np.argsort(cand_idx[:, 0], kind="stable")


def _shard0(mesh, *arrays):
    """device_put arrays with their leading axis sharded over the mesh."""
    from candidate_reranking_cir_tpu.parallel.mesh import batch_sharding

    return tuple(jax.device_put(a, batch_sharding(mesh, a.ndim))
                 for a in arrays)


def rerank(stage1, s1_params, reranker, s2_params, tokenizer, *,
           captions: list[str], reference_names: list[str],
           topk_names: np.ndarray, index_feats, index_names: list[str],
           text_len: int, q_batch: int = 8,
           skip_mask: np.ndarray | None = None,
           group_members: list[list[str]] | None = None,
           dedup: bool = False, dedup_cap: float = 0.625,
           mesh=None) -> RerankOutput:
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

    mesh: optional jax Mesh — re-ranking is embarrassingly parallel over
    queries, so each chunk's query axis is sharded over the data axis
    (q_batch must divide the mesh size).
    """
    from candidate_reranking_cir_tpu.parallel.mesh import fit_mesh

    n = len(captions)
    k = topk_names.shape[1]
    produce_zt, score, score_indexed = make_rerank_fns(stage1, reranker)
    mesh = fit_mesh(mesh, q_batch)

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
        refs = take_rows(index_feats, jnp.asarray(ref_idx[rows]))
        if mesh is not None:
            ids, msk, refs = _shard0(mesh, ids, msk, refs)
        z_t = produce_zt(s1_params, refs, ids, msk)

        chunk_cand = cand_idx_all[rows]
        uniq, inv = np.unique(chunk_cand, return_inverse=True)
        if dedup and len(uniq) <= u_cap:
            pad_uniq = np.pad(uniq, (0, u_cap - len(uniq)))
            unique_feats = take_rows(index_feats, jnp.asarray(pad_uniq))
            pair_map = jnp.asarray(inv.reshape(chunk_cand.shape), jnp.int32)
            if mesh is not None:
                # commit to the (possibly fit_mesh-shrunk) eval mesh: the
                # unique bank is shared across queries -> replicated; the
                # pair map is per-query -> sharded like ids/z_t
                from candidate_reranking_cir_tpu.parallel.mesh import (
                    replicated,
                )

                unique_feats = jax.device_put(unique_feats, replicated(mesh))
                (pair_map,) = _shard0(mesh, pair_map)
            out = score_indexed(s2_params, z_t, ids, msk, unique_feats,
                                pair_map)
        else:
            cands = take_rows(index_feats, jnp.asarray(chunk_cand))
            if mesh is not None:
                (cands,) = _shard0(mesh, cands)
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


def make_cand_major_fns(stage1: RetrievalModel, reranker: RerankerModel):
    """Memoized jitted programs for the candidate-major scheduler: the
    all-queries z_t scan and the per-bucket scoring scan."""
    key = ("cand_major_fns", id(stage1), id(reranker))
    cached = _cache_get(key)
    if cached is not None:
        return cached

    @jax.jit
    def produce_all_zt(s1_params, feats, ids, mask, ref_rows, row_chunks):
        def body(carry, rows):
            refs = take_rows(feats, jnp.take(ref_rows, rows))
            z = stage1.apply(s1_params, refs, jnp.take(ids, rows, axis=0),
                             jnp.take(mask, rows, axis=0), return_raw=True,
                             method=RetrievalModel.fuse)
            return carry, z
        _, zs = jax.lax.scan(body, 0.0, row_chunks)
        return zs.reshape(-1, *zs.shape[2:])

    @jax.jit
    def bucket_scan(s2_params, zt, ids, mask, feats, rows, cands):
        a, bb = rows.shape[1], rows.shape[2]

        def body(carry, xs):
            r, c = xs
            flat = r.reshape(-1)
            z = jnp.take(zt, flat, axis=0).reshape(a, bb, *zt.shape[1:])
            i = jnp.take(ids, flat, axis=0).reshape(a, bb, -1)
            m = jnp.take(mask, flat, axis=0).reshape(a, bb, -1)
            cf = take_rows(feats, c)
            s = reranker.apply(s2_params, z, i, m, cf,
                               method=RerankerModel.score_grid)
            return carry, s

        _, scores = jax.lax.scan(body, 0.0, (rows, cands))
        return scores  # [n_calls, A, B]

    return _cache_put(key, (produce_all_zt, bucket_scan))


def make_cand_major_sharded_fns(stage1: RetrievalModel,
                                reranker: RerankerModel, mesh):
    """shard_map variants of the candidate-major programs for a CORPUS-SHARDED
    feature bank (index_feats [N_pad, M, W] with the corpus axis split over
    the mesh — the production layout when the bank exceeds per-chip HBM,
    SURVEY.md section 5). Each chip scores only the candidates whose features
    it owns; reference-image rows for z_t are fetched with a masked local
    take + psum (a distributed gather over ICI)."""
    key = ("cand_major_sharded", id(stage1), id(reranker), id(mesh))
    cached = _cache_get(key)
    if cached is not None:
        return cached
    from jax.sharding import PartitionSpec as P

    def zt_body(s1_params, feats_shard, ids, mask, ref_rows, row_chunks):
        shard_size = feats_shard.shape[0]
        dev = jax.lax.axis_index("data")

        def gather_global(rows_global):
            local = rows_global - dev * shard_size
            ok = (local >= 0) & (local < shard_size)
            rows = jnp.take(feats_shard,
                            jnp.clip(local, 0, shard_size - 1), axis=0)
            rows = jnp.where(ok[:, None, None], rows, 0)
            return jax.lax.psum(rows, "data")

        def body(carry, rows):
            refs = gather_global(jnp.take(ref_rows, rows))
            z = stage1.apply(s1_params, refs, jnp.take(ids, rows, axis=0),
                             jnp.take(mask, rows, axis=0), return_raw=True,
                             method=RetrievalModel.fuse)
            return carry, z
        _, zs = jax.lax.scan(body, 0.0, row_chunks)
        return zs.reshape(-1, *zs.shape[2:])

    produce_all_zt = jax.jit(jax.shard_map(
        zt_body, mesh=mesh,
        in_specs=(P(), P("data"), P(), P(), P(), P()),
        out_specs=P(), check_vma=False))

    def scan_body(s2_params, zt, ids, mask, feats_shard, rows, cands_local):
        # this device's slice: rows [n_calls, A/n_dev, B], local candidate ids
        a, bb = rows.shape[1], rows.shape[2]

        def body(carry, xs):
            r, c = xs
            flat = r.reshape(-1)
            z = jnp.take(zt, flat, axis=0).reshape(a, bb, *zt.shape[1:])
            i = jnp.take(ids, flat, axis=0).reshape(a, bb, -1)
            m = jnp.take(mask, flat, axis=0).reshape(a, bb, -1)
            cf = jnp.take(feats_shard, c, axis=0)
            s = reranker.apply(s2_params, z, i, m, cf,
                               method=RerankerModel.score_grid)
            return carry, s

        _, scores = jax.lax.scan(body, 0.0, (rows, cands_local))
        return scores

    bucket_scan = jax.jit(jax.shard_map(
        scan_body, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P("data"), P(None, "data", None),
                  P(None, "data")),
        out_specs=P(None, "data", None), check_vma=False))

    return _cache_put(key, (produce_all_zt, bucket_scan))


def resolve_l_buckets(l_buckets, lengths: np.ndarray,
                      text_len: int) -> list[int]:
    """Static text-length buckets for the scheduler, smallest-sufficient
    assignment. 'auto' cuts at the 50th/90th length percentiles (rounded up
    to sublane multiples of 8); None keeps the single text_len bucket."""
    max_len = int(lengths.max()) if len(lengths) else text_len
    if l_buckets is None:
        return [text_len]
    if l_buckets == "auto":
        cand = {min(-(-int(np.percentile(lengths, p)) // 8) * 8, text_len)
                for p in (50, 90)}
        cand.add(min(-(-max_len // 8) * 8, text_len))
    else:
        cand = {int(b) for b in l_buckets if int(b) <= text_len}
    cand = {max(b, 8) for b in cand}
    if not cand or max(cand) < max_len:  # always one bucket fits every query
        cand.add(min(-(-max_len // 8) * 8, text_len))
    return sorted(cand)


def rerank_candidate_major(stage1, s1_params, reranker, s2_params, tokenizer, *,
                           captions: list[str], reference_names: list[str],
                           topk_names: np.ndarray, index_feats,
                           index_names: list[str], text_len: int,
                           skip_mask: np.ndarray | None = None,
                           group_members: list[list[str]] | None = None,
                           pairs_per_call: int = 256,
                           q_buckets: tuple[int, ...] = (4, 8, 16, 32, 64,
                                                         128),
                           l_buckets="auto",
                           zt_batch: int = 32, mesh=None,
                           index_sharded: bool = False) -> RerankOutput:
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
    and batched ``A`` candidates per call with A*B*L == pairs_per_call*Lmax
    FLOP-equivalent rows per call.

    l_buckets: text-length buckets. ~95% of grid time scales with the text
    width L (cross-attn scores/softmax, FFN, Q/out projections; only the
    per-candidate K/V projections are L-independent), and the reference runs
    each eval query at its OWN caption length (validate_stage2.py is bs=1 with
    pad-to-longest) while a single static bucket pads every caption to
    text_len. Queries are therefore grouped into static L-buckets (smallest
    bucket >= token count) and each bucket runs its own z_t scan + grid
    scans at the narrower width. Scores are BIT-exact across bucket widths:
    pad keys are masked additively (-10000 => exp underflows to 0.0) so real
    rows never read pad positions. 'auto' (default) cuts at the 50th/90th
    length percentiles; None restores the single text_len bucket.

    Dispatch: ALL of a bucket's calls run inside ONE jitted ``lax.scan`` —
    the row indices, token ids and features are uploaded to the device once
    and gathered inside the program, so the host issues one dispatch and one
    D2H fetch per bucket instead of hundreds of small transfers (which
    dominate wall-clock through the remote-TPU relay).

    mesh: optional jax Mesh — the candidate axis A of every call is sharded
    over the data axis (each chip scores its slice of candidates); A is
    rounded up to a multiple of the mesh size.

    index_sharded=True (requires mesh): ``index_feats`` holds the CORPUS-
    SHARDED bank from build_index(shard_index=True) — leading dim padded to
    a multiple of the mesh size and split over it. Pairs are scheduled onto
    the chip that owns each candidate's features (shard-local gathers, no
    bank replication); z_t reference rows are fetched with a masked
    local-take + psum distributed gather. The production layout for corpora
    beyond per-chip HBM (SURVEY.md section 5).
    """
    n = len(captions)
    k = topk_names.shape[1]
    n_dev = 1 if mesh is None else mesh.devices.size
    if index_sharded and mesh is None:
        raise ValueError("index_sharded=True requires a mesh")
    if index_sharded and isinstance(index_feats, Int8Bank):
        raise ValueError("int8 banks are not supported with index_sharded "
                         "(quantize halves the bank instead of sharding it)")
    if mesh is not None and zt_batch % n_dev != 0:
        zt_batch = ((zt_batch + n_dev - 1) // n_dev) * n_dev

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

    # ---- 1. shared device-resident inputs ----------------------------------
    rep = None
    if mesh is not None:
        from candidate_reranking_cir_tpu.parallel.mesh import replicated

        rep = replicated(mesh)
        if not index_sharded:  # sharded banks are already laid out P('data')
            index_feats = jax.device_put(index_feats, rep)
        s1_params = jax.device_put(s1_params, rep)
        s2_params = jax.device_put(s2_params, rep)

    if index_sharded:
        produce_all_zt, bucket_scan = make_cand_major_sharded_fns(
            stage1, reranker, mesh)
    else:
        produce_all_zt, bucket_scan = make_cand_major_fns(stage1, reranker)

    logits = np.full((n, k), SKIP_LOGIT, np.float32)
    grp_logits = np.zeros((n, 5), np.float32) if do_groups else None
    shard_size = bank_len(index_feats) // n_dev if index_sharded else 0
    # (device scores, scatter metadata) per dispatched scan: every bucket's
    # program is dispatched asynchronously and fetched only at the end, so
    # host-side scheduling of later buckets overlaps device compute
    pending: list[tuple] = []

    lengths = mask_all.sum(axis=1).astype(np.int32)
    lbs = resolve_l_buckets(l_buckets, lengths, text_len)
    assign = np.searchsorted(np.asarray(lbs), lengths)

    for lbi, lb in enumerate(lbs):
        qsel = np.nonzero(assign == lbi)[0]
        n_lb = len(qsel)
        if n_lb == 0:
            continue

        # ---- 2. this L-bucket's inputs, uploaded once ----------------------
        ids_dev = jnp.asarray(ids_all[qsel][:, :lb])
        mask_dev = jnp.asarray(mask_all[qsel][:, :lb])
        if rep is not None:
            ids_dev = jax.device_put(ids_dev, rep)
            mask_dev = jax.device_put(mask_dev, rep)

        # ---- 3. z_t for every bucket query in ONE scan program -------------
        n_zt = (n_lb + zt_batch - 1) // zt_batch
        zt_rows = np.zeros((n_zt, zt_batch), np.int32)
        for i in range(n_zt):
            rows = np.arange(i * zt_batch, min((i + 1) * zt_batch, n_lb))
            zt_rows[i, :len(rows)] = rows  # tail padding repeats row 0

        zt_all = produce_all_zt(s1_params, index_feats, ids_dev, mask_dev,
                                jnp.asarray(ref_idx[qsel]),
                                jnp.asarray(zt_rows))[:n_lb]

        # ---- 4. pair lists per candidate ------------------------------------
        # entry: (local_row, global_query, kind, col);
        # kind 0 = top-K slot, kind 1 = group slot
        per_cand: dict[int, list[tuple[int, int, int, int]]] = {}
        for li, qi in enumerate(qsel):
            qi = int(qi)
            if not skip[qi]:
                for j in range(k):
                    per_cand.setdefault(int(cand_idx[qi, j]), []).append(
                        (li, qi, 0, j))
            if do_groups:
                for j in range(grp_idx.shape[1]):
                    per_cand.setdefault(int(grp_idx[qi, j]), []).append(
                        (li, qi, 1, j))

        # ---- 5. bucket each candidate's pairs into fixed-size chunks --------
        # greedy decomposition largest-bucket-first so padding waste per
        # candidate is bounded by the smallest bucket (e.g. 100 pairs with
        # buckets (8,32,128) -> 32+32+32+8, 4 padded rows — NOT one 128-chunk
        # with 28 padded rows)
        buckets = sorted(q_buckets)
        chunks_by_b: dict[int, list[tuple[int, list]]] = \
            {b: [] for b in buckets}
        for cid, entries in per_cand.items():
            s = 0
            remaining = len(entries)
            for b in reversed(buckets):
                while remaining >= b:
                    chunks_by_b[b].append((cid, entries[s:s + b]))
                    s += b
                    remaining -= b
            if remaining:
                b = next(bb for bb in buckets if bb >= remaining)
                chunks_by_b[b].append((cid, entries[s:]))

        # constant FLOPs per call: narrower text buckets take proportionally
        # more pairs per grid call
        ppc = max(64, pairs_per_call * text_len // lb)

        # ---- 6. ONE scan program per (L, B) bucket ---------------------------
        # every bucket's calls run inside a single jitted lax.scan over
        # (rows [n_calls, A, B], cands [n_calls, A]); z_t/ids/mask/features
        # are gathered on device per call — one dispatch and one D2H fetch
        # per bucket instead of hundreds of small transfers
        for b in buckets:
            chunks = chunks_by_b[b]
            if not chunks:
                continue
            if index_sharded:
                # each chip scores only candidates whose features it owns:
                # the A axis is laid out as n_dev contiguous owner blocks and
                # cands holds shard-LOCAL indices
                a_dev = max(1, ppc // b // n_dev)
                a = a_dev * n_dev
                by_owner: list[list] = [[] for _ in range(n_dev)]
                for cid, entries in chunks:
                    by_owner[cid // shard_size].append((cid, entries))
                n_calls = max((len(lst) + a_dev - 1) // a_dev
                              for lst in by_owner)
                packed = []
                for d, lst in enumerate(by_owner):
                    lst = lst + [(d * shard_size, [])] * (n_calls * a_dev
                                                          - len(lst))
                    packed.append(lst)
            else:
                a = max(1, ppc // b)
                a = ((a + n_dev - 1) // n_dev) * n_dev  # shardable cand axis
                n_calls = (len(chunks) + a - 1) // a
                chunks = chunks + [(chunks[0][0], [])] * (n_calls * a
                                                          - len(chunks))

            rows = np.zeros((n_calls, a, b), np.int32)
            valid = np.zeros((n_calls, a, b), bool)
            qrow = np.zeros((n_calls, a, b), np.int32)
            kind = np.zeros((n_calls, a, b), np.int32)
            col = np.zeros((n_calls, a, b), np.int32)
            cands = np.zeros((n_calls, a), np.int32)

            def fill(ci, ai, cid, entries):
                cands[ci, ai] = cid - (ai // a_dev) * shard_size \
                    if index_sharded else cid
                for bi, (li, qi, kd, cl) in enumerate(entries):
                    rows[ci, ai, bi] = li
                    valid[ci, ai, bi] = True
                    qrow[ci, ai, bi], kind[ci, ai, bi], col[ci, ai, bi] = \
                        qi, kd, cl

            if index_sharded:
                for d, lst in enumerate(packed):
                    for idx, (cid, entries) in enumerate(lst):
                        ci, ai_local = divmod(idx, a_dev)
                        fill(ci, d * a_dev + ai_local, cid, entries)
            else:
                for idx, (cid, entries) in enumerate(chunks):
                    ci, ai = divmod(idx, a)
                    fill(ci, ai, cid, entries)

            rows_dev = jnp.asarray(rows)
            cands_dev = jnp.asarray(cands)
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                shard_a = NamedSharding(mesh, P(None, "data"))
                rows_dev = jax.device_put(
                    rows_dev, NamedSharding(mesh, P(None, "data", None)))
                cands_dev = jax.device_put(cands_dev, shard_a)
            pending.append((
                bucket_scan(s2_params, zt_all, ids_dev, mask_dev,
                            index_feats, rows_dev, cands_dev),
                valid, qrow, kind, col))

    for scores_dev, valid, qrow, kind, col in pending:
        scores = np.asarray(scores_dev, np.float32)
        tk = valid & (kind == 0)
        logits[qrow[tk], col[tk]] = scores[tk]
        if do_groups:
            gp = valid & (kind == 1)
            grp_logits[qrow[gp], col[gp]] = scores[gp]

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
