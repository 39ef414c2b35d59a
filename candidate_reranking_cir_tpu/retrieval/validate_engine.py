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
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from candidate_reranking_cir_tpu.data.captions import compose_fiq_eval
from candidate_reranking_cir_tpu.models.blip_retrieval import RetrievalModel
from candidate_reranking_cir_tpu.retrieval import metrics as M
from candidate_reranking_cir_tpu.retrieval.index import (
    build_index,
    iter_batches,
)
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

    @partial(jax.jit, static_argnames="query_group")
    def _fuse(p, ref_feats, ids, mask, query_group=1):
        return model.apply(p, ref_feats, ids, mask, query_group=query_group,
                           method=RetrievalModel.fuse)

    @partial(jax.jit, static_argnames="query_group")
    def _fuse_scan(p, index_feats, refs_idx, ids, mask, query_group=1):
        """Scan over S same-shape fusion batches in ONE device program:
        refs_idx [S, G] corpus rows, ids/mask [S, B, W] -> preds [S, B, E].
        The reference-feature gather runs inside the program, so a whole
        batch group costs one launch instead of 5-6 (gather + 2 H2D + fuse
        + slice + cast) x S — on the remote-relay rig each launch costs
        5-10 ms of submission latency, which dominated the fusion phase.
        Token ids/mask stay HOST-gathered: an r4 variant that uploaded the
        full id tables once and gathered rows inside the program measured
        ~4% slower — the host gathers are free (host idles during device
        compute; H2D is async) while in-program gathers spend device time."""
        def body(c, xs):
            ri, i, m = xs
            refs = jnp.take(index_feats, ri, axis=0)
            pred = model.apply(p, refs, i, m, query_group=query_group,
                               method=RetrievalModel.fuse)
            return c, pred

        _, out = jax.lax.scan(body, 0.0, (refs_idx, ids, mask))
        return out

    def embed(images):
        return _embed(params, images)

    def fuse(ref_feats, ids, mask, query_group=1):
        return _fuse(params, ref_feats, ids, mask, query_group=query_group)

    def fuse_scan(index_feats, refs_idx, ids, mask, query_group=1):
        return _fuse_scan(params, index_feats, refs_idx, ids, mask,
                          query_group=query_group)

    fuse.scan = fuse_scan
    return embed, fuse


def make_embed_scan(model: RetrievalModel, params):
    """Device-resident corpus embed: ONE dispatch for the whole index build.

    images [n_chunks, chunk, H, W, 3] (chunk ~32, the v5e ViT throughput
    peak) -> (raw [n_chunks, chunk, M, D], pooled [n_chunks, chunk, E]).
    A lax.scan keeps the per-chunk batch at the fast size while avoiding one
    relay round-trip per chunk (72 dispatches at CIRR-val scale measured
    ~4% of the eval wall-clock). For host-streamed corpora use the per-batch
    ``embed`` from make_stage1_fns (H2D overlaps compute there)."""
    @jax.jit
    def _embed_scan(p, images):
        def body(carry, xc):
            return carry, model.apply(p, xc, pool_and_normalize=True,
                                      method=RetrievalModel.embed_images)

        _, outs = jax.lax.scan(body, 0.0, images)
        return outs

    def embed_scan(images):
        return _embed_scan(params, images)

    return embed_scan


def schedule_fusion_batches(ref_idx: np.ndarray, bucket_of: np.ndarray,
                            q_batch: int, image_major: bool,
                            n_dev: int = 1) -> list[tuple]:
    """Decompose the query set into fixed-shape fusion batches.

    Returns a list of (query_group, width, rows, refs_rows, count):
    rows [G*Q] original query rows (image-contiguous; the tail may repeat
    rows already in the batch), refs_rows [G] corpus indices, count = number
    of REAL rows. Shared by every executor (per-batch dispatch, scan groups,
    the single-program eval) so the image-major decomposition and its
    padding invariants live in exactly one place.

    image_major: queries sharing a reference image are grouped with
    ``query_group`` in (8, 4, 2) via power-of-2 chunk decomposition
    (5 queries -> 4 + 1; never a padding query); leftovers go query-major.
    Batches within a family are ordered by padded width so narrow ones can
    run narrow.
    """
    batches: list[tuple] = []

    def emit_batch(rows, refs_rows, width, query_group, count):
        if __debug__ and count < len(rows):
            # no executor slices padded tails off (that would cost a launch
            # per batch) — correctness rests on every padded row being an
            # exact duplicate (same row, same ref) of a REAL row in this
            # batch. Guard the invariant at the single point every executor
            # shares, so a future scheduler edit that pads differently fails
            # loudly instead of silently emitting wrong features (ADVICE r4).
            real = {(int(rows[j]), int(refs_rows[j // query_group]))
                    for j in range(count)}
            pad = {(int(rows[j]), int(refs_rows[j // query_group]))
                   for j in range(count, len(rows))}
            assert pad <= real, (
                "padded tail rows are not duplicates of real rows: "
                f"{sorted(pad - real)[:4]}")
        batches.append((query_group, width, np.asarray(rows, np.int64),
                        np.asarray(refs_rows, np.int32), count))

    if image_major:
        group_sizes = [q for q in (8, 4, 2)
                       if q <= q_batch and (q_batch // q) % n_dev == 0]
    if image_major and group_sizes:
        by_img: dict[int, list[int]] = {}
        for row, r in enumerate(ref_idx):
            by_img.setdefault(int(r), []).append(row)
        chunks: dict[int, list[tuple[int, list[int]]]] = {}
        leftover = []
        for r, rows in by_img.items():
            rows.sort(key=lambda i: bucket_of[i])  # L-homogeneous chunks
            i, c = 0, len(rows)
            for q in group_sizes:
                while c >= q:
                    chunks.setdefault(q, []).append((r, rows[i:i + q]))
                    i += q
                    c -= q
            leftover.extend(rows[i:])
        singles = np.asarray(sorted(leftover, key=lambda i: bucket_of[i]),
                             np.int64)

        for q, chs in sorted(chunks.items(), reverse=True):
            # narrow batches: order chunks by their padded width
            chs.sort(key=lambda ch: int(bucket_of[ch[1]].max()))
            g = max(q_batch // q, 1)
            for start in range(0, len(chs), g):
                batch = chs[start:start + g]
                count = len(batch) * q
                if len(batch) < g:  # pad with repeats of the first chunk
                    batch = batch + [batch[0]] * (g - len(batch))
                rows = np.asarray([i for _, ch in batch for i in ch],
                                  np.int64)
                refs_rows = np.asarray([r for r, _ in batch], np.int32)
                width = int(bucket_of[rows[:count]].max())
                emit_batch(rows, refs_rows, width, q, count)
    else:
        singles = np.argsort(bucket_of, kind="stable")

    for start in range(0, len(singles), q_batch):
        rows = singles[start:start + q_batch]
        count = len(rows)
        width = int(bucket_of[rows].max())
        if count < q_batch:  # pad the tail with repeats
            rows = np.concatenate(
                [rows, np.repeat(rows[:1], q_batch - count)])
        emit_batch(rows, ref_idx[rows], width, 1, count)
    return batches


def resolve_buckets(tokenizer, captions, text_len: int, l_buckets):
    """Tokenize and assign each caption to its static L-bucket. Returns
    (ids_all [N, text_len], mask_all [N, text_len], bucket_of [N])."""
    from candidate_reranking_cir_tpu.retrieval.rerank import resolve_l_buckets

    ids_all, mask_all = tokenizer.encode(captions, text_len,
                                         set_enc_token=True)
    lens = mask_all.sum(axis=1)
    lbs = resolve_l_buckets(l_buckets, lens, text_len)
    bucket_of = np.asarray([next(b for b in lbs if b >= ln) for ln in lens])
    return ids_all, mask_all, bucket_of


def predict_queries(fuse_fn, tokenizer, captions: list[str], ref_names,
                    index_feats, index_names, text_len: int,
                    q_batch: int = 32, mesh=None,
                    l_buckets="auto", image_major: bool = True) -> np.ndarray:
    """Fused query features [N_q, E] via index-feature reuse.

    l_buckets: queries are grouped into static text-length buckets (same
    scheme as the stage-II scheduler, rerank.resolve_l_buckets) and each
    group's batches run at the narrower padded width — the fusion forward is
    ~95% L-proportional past the fixed cross-attn K/V term, and the additive
    -10000 pad masking makes the features bit-exact across pad widths
    (measured: L=16 runs 1.47x the L=40 rate on v5e). 'auto' (default) cuts
    at the 50th/90th length percentiles; None keeps the single text_len
    bucket. One compiled program per bucket width.

    image_major=True (default): queries that share a reference image are
    scheduled together and fused with ``query_group>1`` so each layer's
    image K/V projections — the dominant FLOP term of the fusion — run once
    per image instead of once per query. Per-image query counts are
    decomposed into power-of-2 chunks (5 queries -> 4 + 1), so there is
    never a padding query; the Q=1 leftovers run through the ordinary
    query-major path. Identical math to query-major (CIRR-val: ~1.8 queries
    share each reference on average). Under a mesh, a Q-bucket runs
    image-major only when the mesh divides its image count G = q_batch//Q
    (rows are image-contiguous, so sharding the G axis and the G*Q row axis
    cut at the same boundaries); other buckets fall back to query-major.

    mesh: optional jax Mesh — each fixed-size query batch is sharded over the
    data axis so fusion runs SPMD across the chips (q_batch must divide).

    Compile-count note: one program per (query_group, L-bucket, width)
    combination, plus one scan program per such combination with >= 2
    batches (scan lengths 8/2 reused across evals) — ~2x the query-major
    path's program count. First-eval warm-up through a remote-compile relay
    is correspondingly slower; pass l_buckets=None and image_major=False to
    trade steady-state throughput for minimum compiles.
    """
    from candidate_reranking_cir_tpu.parallel.mesh import (
        batch_sharding,
        fit_mesh,
    )

    mesh = fit_mesh(mesh, q_batch)
    pos = {n: i for i, n in enumerate(index_names)}
    ref_idx = np.asarray([pos[r] for r in ref_names], np.int32)
    n = len(captions)
    if n == 0:
        return np.empty((n, 0), np.float32)
    ids_all, mask_all, bucket_of = resolve_buckets(tokenizer, captions,
                                                   text_len, l_buckets)

    preds = []       # device arrays, scheduling order
    sched_rows = []  # original row index of each emitted pred row
    # single-device fast path: batches accumulate per (query_group, width)
    # and run as lax.scan groups — one launch per group instead of 5-6
    # device ops per batch (see make_stage1_fns._fuse_scan). Under a mesh
    # the per-batch sharded dispatch below is kept (virtual-mesh tests and
    # multi-chip runs don't pay the relay's launch latency).
    scan_fn = getattr(fuse_fn, "scan", None) if mesh is None else None
    pending: dict[tuple[int, int], list] = {}

    def dispatch(rows, refs_rows, width, query_group, count):
        """rows: [G*Q] original query rows, image-contiguous (tail padded
        with repeats of rows already in the batch — duplicate-invariant
        guarded in schedule_fusion_batches); refs_rows: [G] corpus
        indices; count: number of REAL rows. Keeps results ON DEVICE and
        defers all fetches (a per-batch np.asarray would sync every
        dispatch, serializing compute with the relay RTT)."""
        if scan_fn is not None:
            pending.setdefault((query_group, width), []).append(
                (np.asarray(rows, np.int32),
                 np.asarray(refs_rows, np.int32)))
            return
        refs = jnp.take(index_feats, jnp.asarray(refs_rows, np.int32), axis=0)
        ids = jnp.asarray(ids_all[rows][:, :width])
        msk = jnp.asarray(mask_all[rows][:, :width])
        if mesh is not None:
            refs = jax.device_put(refs, batch_sharding(mesh, refs.ndim))
            ids = jax.device_put(ids, batch_sharding(mesh, 2))
            msk = jax.device_put(msk, batch_sharding(mesh, 2))
        pred = fuse_fn(refs, ids, msk, query_group) if query_group > 1 \
            else fuse_fn(refs, ids, msk)
        preds.append(pred[:count].astype(jnp.float32))
        sched_rows.extend(rows[:count].tolist())

    def flush_pending():
        """Run the accumulated batch groups: scans of length 8/2 per
        (query_group, width) shape family, leftovers as direct calls.
        Padded tail rows are NOT sliced off per batch (that would cost one
        launch each); they are exact duplicates of real rows in the same
        batch (identical refs + ids — schedule_fusion_batches guards this),
        so the inverse permutation below can safely resolve a row to any of
        its copies."""
        for (q, width), batches in pending.items():
            i, nb = 0, len(batches)
            while nb - i >= 2:
                s = 8 if nb - i >= 8 else 2
                chunk = batches[i:i + s]
                rows_m = np.stack([c[0] for c in chunk])
                refs_m = np.stack([c[1] for c in chunk])
                out = scan_fn(index_feats, jnp.asarray(refs_m),
                              jnp.asarray(ids_all[rows_m][..., :width]),
                              jnp.asarray(mask_all[rows_m][..., :width]), q)
                preds.append(out.reshape(-1, out.shape[-1]))
                sched_rows.extend(rows_m.reshape(-1).tolist())
                i += s
            for rows, refs_rows in batches[i:]:
                refs = jnp.take(index_feats, jnp.asarray(refs_rows), axis=0)
                ids = jnp.asarray(ids_all[rows][:, :width])
                msk = jnp.asarray(mask_all[rows][:, :width])
                pred = fuse_fn(refs, ids, msk, q) if q > 1 \
                    else fuse_fn(refs, ids, msk)
                preds.append(pred)
                sched_rows.extend(rows.tolist())

    n_dev = mesh.devices.size if mesh is not None else 1
    for q, width, rows, refs_rows, count in schedule_fusion_batches(
            ref_idx, bucket_of, q_batch, image_major, n_dev):
        dispatch(rows, refs_rows, width, q, count)

    flush_pending()
    grouped = jnp.concatenate(preds) if len(preds) > 1 else preds[0]
    grouped = grouped.astype(jnp.float32)
    # scheduled rows may contain duplicates (batch-tail padding on the scan
    # path); every duplicate carries an identical prediction, so the last
    # write wins harmlessly. Coverage check: a scheduler bug that dropped a
    # row would otherwise leave a garbage index here and silently corrupt
    # every downstream ranking (ADVICE r4).
    inv = np.full(n, -1, np.int64)
    inv[np.asarray(sched_rows, np.int64)] = np.arange(len(sched_rows))
    missing = np.flatnonzero(inv < 0)
    assert missing.size == 0, (
        f"fusion scheduler dropped {missing.size} quer(ies): "
        f"rows {missing[:8].tolist()}...")
    return jnp.take(grouped, jnp.asarray(inv), axis=0)


def build_fusion_plan(batches: list[tuple], ids_all: np.ndarray,
                      mask_all: np.ndarray) -> tuple[tuple, np.ndarray]:
    """Stack scheduler batches into per-(query_group, width) families for a
    scan-per-family executor (the single-program eval).

    Returns (fams, inv): fams is a tuple of (refs [nb, G] int32,
    ids [nb, B, w] int32, mask [nb, B, w] int32) — query_group is recovered
    from the shapes as B // G — and inv [N_q] maps each original query row
    to its position in the concatenation of all family outputs flattened in
    family-then-batch order (padded duplicate rows resolve to any copy).
    """
    fam: dict[tuple[int, int], list] = {}
    for q, width, rows, refs_rows, count in batches:
        fam.setdefault((q, width), []).append((rows, refs_rows))

    fams, sched_rows = [], []
    for (q, width), entries in fam.items():
        rows_m = np.stack([e[0] for e in entries])          # [nb, B]
        refs_m = np.stack([e[1] for e in entries])          # [nb, G]
        fams.append((jnp.asarray(refs_m, jnp.int32),
                     jnp.asarray(ids_all[rows_m][..., :width], jnp.int32),
                     jnp.asarray(mask_all[rows_m][..., :width], jnp.int32)))
        sched_rows.extend(rows_m.reshape(-1).tolist())

    n = ids_all.shape[0]
    inv = np.full(n, -1, np.int64)
    inv[np.asarray(sched_rows, np.int64)] = np.arange(len(sched_rows))
    missing = np.flatnonzero(inv < 0)
    assert missing.size == 0, (
        f"fusion scheduler dropped {missing.size} quer(ies): "
        f"rows {missing[:8].tolist()}...")
    return tuple(fams), inv


_SINGLE_PROGRAM_CACHE: dict = {}


def make_single_program_eval(model: RetrievalModel):
    """ONE device program for the whole stage-I eval: corpus embed scan +
    every fusion family scan + full ranking / truncated top-k.

    The multi-launch path pays a ~10-15 ms submission gap per launch through
    the remote-execution relay (~12 launches at CIRR-val scale = 0.12-0.18 s
    of device idle, BASELINE.md r4); a v5e has ONE TensorCore, so embed and
    fusion cannot actually run concurrently — the only removable cost is
    that launch-gap exposure, and folding the entire evaluation into a
    single jitted program removes every gap at once (and is the lowest-host-
    overhead shape on local hardware too). Compiles once per (corpus size,
    family structure) — i.e. per dataset; prefer the multi-program
    ``predict_queries`` path when corpora change shape often or images must
    stream from host batch-by-batch.

    Returns run(params, imgs, fams, inv, ent, n_idx, width):
      imgs [n_chunks, chunk, H, W, 3] — device-resident corpus images,
      fams/inv from build_fusion_plan, ent [N_q, E] entity columns,
      n_idx/width static. -> (topk [N_q, width] int16/32, ranks [N_q, E]).
    """
    key = id(model)
    if key in _SINGLE_PROGRAM_CACHE:
        return _SINGLE_PROGRAM_CACHE[key]

    @partial(jax.jit, static_argnames=("n_idx", "width"))
    def run(p, imgs, fams, inv, ent, n_idx, width):
        def ebody(c, xc):
            return c, model.apply(p, xc, pool_and_normalize=True,
                                  method=RetrievalModel.embed_images)

        _, (raw, pooled) = jax.lax.scan(ebody, 0.0, imgs)
        # bfloat16 bank, matching build_index's feature_dtype default (so
        # both executors fuse from bit-identical reference features)
        bank = raw.reshape(-1, *raw.shape[2:])[:n_idx].astype(jnp.bfloat16)
        pooled = pooled.reshape(-1, pooled.shape[-1])[:n_idx]

        preds = []
        for refs, ids, msk in fams:
            q = ids.shape[1] // refs.shape[1]

            def fbody(c, xs, q=q):
                ri, i, m = xs
                r = jnp.take(bank, ri, axis=0)
                pred = model.apply(p, r, i, m, query_group=q,
                                   method=RetrievalModel.fuse)
                return c, pred

            _, out = jax.lax.scan(fbody, 0.0, (refs, ids, msk))
            preds.append(out.reshape(-1, out.shape[-1]).astype(jnp.float32))
        pred = jnp.concatenate(preds) if len(preds) > 1 else preds[0]
        pred = jnp.take(pred, inv, axis=0)
        return _ranked_body(pred, pooled.astype(jnp.float32), ent, width)

    if len(_SINGLE_PROGRAM_CACHE) > 8:
        _SINGLE_PROGRAM_CACHE.clear()
    _SINGLE_PROGRAM_CACHE[key] = run
    return run


# module-level jits: defining these inside their callers would create a fresh
# jit cache per call, recompiling the CIRR-val-scale ranking program on EVERY
# invocation (~5 s/call through the remote-compile relay vs 65 ms of compute —
# measured, tools/t_ranked_bd.py vs t_s1eval_phases.py)
@jax.jit
def _full_rank(p, idx):
    return jnp.argsort(1.0 - jnp.einsum("qe,ne->qn", p, idx),
                       axis=-1, stable=True)


def _ranked_body(p, idx, e, w):
    dist = 1.0 - jnp.einsum("qe,ne->qn", p.astype(jnp.float32), idx)
    # lax.top_k == stable ascending argsort truncated at w (both break
    # ties by lowest index); measured equal speed at CIRR-val scale
    # (308 vs 336 ms fused with the rank pass) — top_k fuses better
    _, topk = jax.lax.top_k(-dist, w)
    d_e = jnp.take_along_axis(dist, e, axis=1)          # [Q, E]
    less = (dist[:, None, :] < d_e[:, :, None]).sum(-1)
    ties = ((dist[:, None, :] == d_e[:, :, None])
            & (jnp.arange(dist.shape[1])[None, None, :]
               < e[:, :, None])).sum(-1)
    if idx.shape[0] < 2**15:  # indices fit int16: halves the topk D2H
        topk = topk.astype(jnp.int16)  # (relay ~29 MB/s; 8.4 MB at CIRR-val)
    return topk, less + ties


@partial(jax.jit, static_argnames="w")
def _ranked(p, idx, e, w):
    return _ranked_body(p, idx, e, w)


def full_ranking(pred: np.ndarray, pooled_index, mesh=None) -> np.ndarray:
    """Ascending-distance stable argsort over the whole corpus, on device.

    mesh: optional jax Mesh — the ranking is embarrassingly parallel over
    queries, so the query axis is sharded over the data axis and each chip
    argsorts its slice against the (replicated) pooled index.
    """
    pred = jnp.asarray(pred)
    if mesh is None:
        return np.asarray(_full_rank(pred.astype(jnp.float32),
                                     pooled_index.astype(jnp.float32)))

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
    return np.asarray(_full_rank(pred.astype(jnp.float32), index))[:n]


def ranked_slices(pred, pooled_index, width: int,
                  entity_idx: np.ndarray | None = None,
                  mesh=None) -> tuple[np.ndarray, np.ndarray | None]:
    """TPU-native replacement for transferring the full [N_q, N_idx] argsort:
    compute the distance matrix ONCE on device and return only what the
    metrics/submission layers consume —

    - the top-``width`` indices per query (== stable ascending-distance
      argsort truncated at width: lax.top_k on -distance breaks ties by
      lowest index, exactly like a stable argsort),
    - the EXACT stable global rank of each requested entity column
      (entity_idx [N_q, E]: target / reference / group members), via
      rank(e) = #(d < d_e) + #(d == d_e at a lower corpus index) — bitwise
      identical to the entity's position in the full stable argsort.

    At CIRR-val scale this cuts the D2H from ~38 MB (full order matrix) to
    ~width*4 bytes/query + a few rank columns; recall@{1..500}, subset
    metrics, top-K extraction and submissions are all reconstructed exactly
    (width must exceed the deepest consumer, +1 for CIRR's ref removal).

    mesh: query axis sharded over the data axis, index replicated.
    """
    pred = jnp.asarray(pred)
    n = pred.shape[0]
    ent = (jnp.asarray(entity_idx, jnp.int32) if entity_idx is not None
           else jnp.zeros((n, 1), jnp.int32))

    if mesh is not None:
        from candidate_reranking_cir_tpu.parallel.mesh import (
            batch_sharding,
            replicated,
        )

        n_dev = mesh.devices.size
        pad = (-n) % n_dev
        if pad:
            pred = jnp.concatenate(
                [pred, jnp.zeros((pad, pred.shape[1]), pred.dtype)])
            ent = jnp.concatenate([ent, jnp.zeros((pad, ent.shape[1]),
                                                  ent.dtype)])
        pred = jax.device_put(pred, batch_sharding(mesh, 2))
        ent = jax.device_put(ent, batch_sharding(mesh, 2))
        index = jax.device_put(pooled_index.astype(jnp.float32),
                               replicated(mesh))
    else:
        index = pooled_index.astype(jnp.float32)

    topk, ranks = _ranked(pred, index, ent, min(width,
                                                index.shape[0]))
    # fetch compact, upcast host-side: consumers always see int32 indices
    topk = np.asarray(topk)[:n].astype(np.int32, copy=False)
    ranks = np.asarray(ranks)[:n]
    return topk, (ranks if entity_idx is not None else None)


def run_single_program_eval(model, params, dataset_classic, tokenizer,
                            captions: list[str], ref_names: list[str],
                            ent_names: list[list[str]], *, text_len: int,
                            batch_size: int = 32, q_batch: int = 256,
                            image_major: bool = True, width: int = 501,
                            l_buckets="auto") -> tuple:
    """Single-program stage-I eval executor (see make_single_program_eval):
    loads the whole classic corpus to device, then runs embed + fusion +
    ranking as ONE launch. Returns (topk [N_q, w] int32 np, ranks np,
    index_names). Single-device only (no mesh)."""
    names_all, chunk_arrays = [], []
    for names, images in iter_batches(dataset_classic, batch_size):
        if len(names) < batch_size:  # pad to the compiled chunk shape
            pad = np.zeros((batch_size - len(names), *images.shape[1:]),
                           images.dtype)
            images = np.concatenate([images, pad])
        chunk_arrays.append(images)
        names_all.extend(names)
    imgs = jnp.asarray(np.stack(chunk_arrays))
    n_idx = len(names_all)

    pos = {nm: i for i, nm in enumerate(names_all)}
    ref_idx = np.asarray([pos[r] for r in ref_names], np.int32)
    ids_all, mask_all, bucket_of = resolve_buckets(tokenizer, captions,
                                                   text_len, l_buckets)
    batches = schedule_fusion_batches(ref_idx, bucket_of, q_batch,
                                      image_major)
    fams, inv = build_fusion_plan(batches, ids_all, mask_all)
    ent = np.asarray([[pos[nm] for nm in row] for row in ent_names],
                     np.int32)

    run = make_single_program_eval(model)
    topk, ranks = run(params, imgs, fams, jnp.asarray(inv),
                      jnp.asarray(ent), n_idx=n_idx,
                      width=min(width, n_idx))
    return (np.asarray(topk).astype(np.int32, copy=False),
            np.asarray(ranks), names_all)


def evaluate_cirr_stage1(model, params, dataset_classic, dataset_relative,
                         tokenizer, *, text_len: int, batch_size: int = 32,
                         save_topk_k: int | None = None, mesh=None,
                         image_major: bool = True,
                         q_batch: int = 256,
                         single_program: bool = False) -> tuple:
    """batch_size drives the ViT index embed (throughput peaks at small
    batch, tools/t_vit_sweep.py); q_batch drives the fusion scheduler
    (peaks at LARGE batch — 256 measured 14% over 128, tools/t_fusion_trace
    — so the two are deliberately decoupled).

    single_program=True: the whole evaluation (embed + fusion + ranking)
    runs as ONE device launch (make_single_program_eval) — fastest on rigs
    where per-launch submission latency is visible; requires the full
    corpus image stack in host memory and is single-device."""
    captions, refs, targets, groups = [], [], [], []
    for i in range(len(dataset_relative)):
        s = dataset_relative[i]
        captions.append(s["caption"])
        refs.append(s["reference_name"])
        targets.append(s["target_name"])
        groups.append(s["group_members"])
    members = [[m for m in g if m != r][:5] for g, r in zip(groups, refs)]
    width = max(501, (save_topk_k or 0) + 1)

    if single_program:
        assert mesh is None, "single_program eval is single-device"
        ent_names = [[t, r, *row]
                     for t, r, row in zip(targets, refs, members)]
        topk_idx, ranks, index_names = run_single_program_eval(
            model, params, dataset_classic, tokenizer, captions, refs,
            ent_names, text_len=text_len, batch_size=batch_size,
            q_batch=q_batch, image_major=image_major, width=width)
    else:
        embed, fuse = make_stage1_fns(model, params)
        raw, pooled, index_names = build_index(dataset_classic, embed,
                                               batch_size, pooled=True,
                                               mesh=mesh)
        pred = predict_queries(fuse, tokenizer, captions, refs, raw,
                               index_names, text_len, q_batch, mesh=mesh,
                               image_major=image_major)
        # device-side truncated ranking + exact entity ranks: metrics,
        # subset metrics and the top-k artifact only consume the first
        # ~max(500, k) columns, so the full [N_q, N_idx] order matrix never
        # leaves the device
        pos = {name: i for i, name in enumerate(index_names)}
        ent = np.asarray(
            [[pos[t], pos[r], *[pos[m] for m in row]]
             for t, r, row in zip(targets, refs, members)], np.int32)
        topk_idx, ranks = ranked_slices(pred, pooled, width, ent, mesh=mesh)
    ranking = M.cirr_ranking_from_ranks(
        topk_idx, index_names, targets, members,
        target_ranks=ranks[:, 0], ref_ranks=ranks[:, 1],
        member_ranks=ranks[:, 2:])
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
                        mesh=None, image_major: bool = True,
                        q_batch: int = 256,
                        single_program: bool = False) -> tuple:
    captions_pairs, refs, targets = [], [], []
    for i in range(len(dataset_relative)):
        s = dataset_relative[i]
        captions_pairs.append(s["captions"])
        refs.append(s["reference_name"])
        targets.append(s["target_name"])
    captions = compose_fiq_eval(captions_pairs)
    width = max(501, (save_topk_k or 0) + 1)

    if single_program:
        assert mesh is None, "single_program eval is single-device"
        topk_idx, ranks, index_names = run_single_program_eval(
            model, params, dataset_classic, tokenizer, captions, refs,
            [[t] for t in targets], text_len=text_len,
            batch_size=batch_size, q_batch=q_batch,
            image_major=image_major, width=width)
    else:
        embed, fuse = make_stage1_fns(model, params)
        raw, pooled, index_names = build_index(dataset_classic, embed,
                                               batch_size, pooled=True,
                                               mesh=mesh)
        pred = predict_queries(fuse, tokenizer, captions, refs, raw,
                               index_names, text_len, q_batch, mesh=mesh,
                               image_major=image_major)
        pos = {name: i for i, name in enumerate(index_names)}
        ent = np.asarray([[pos[t]] for t in targets], np.int32)
        topk_idx, ranks = ranked_slices(pred, pooled, width, ent, mesh=mesh)
    ranking = M.fiq_ranking_from_ranks(topk_idx, index_names, targets,
                                       target_ranks=ranks[:, 0])
    mets = M.fiq_metrics(ranking)

    payload = None
    if save_topk_k:
        payload = topk_payload(ranking, index_names, targets,
                               dataset_relative.split, k=save_topk_k,
                               dress_types=dress_types)
    return Stage1EvalResult(mets, ranking, index_names, targets), payload
