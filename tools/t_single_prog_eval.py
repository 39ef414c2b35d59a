"""A/B: stage-I eval multi-launch path vs the single-program executor.

Context (r5 verdict item 1): the r4 eval runs embed (1 launch), fusion (~12
scan-group launches) and ranking (1 launch) strictly back-to-back; the trace
shows ~10-15 ms of device idle per launch through the remote-execution relay
(BASELINE.md r4 interval analysis). A v5e has ONE TensorCore, so "overlap
embed with fusion" cannot reduce device-busy time — the only removable cost
is launch-gap exposure. make_single_program_eval folds the whole evaluation
into ONE jitted program (embed scan + per-family fusion scans + ranking),
removing every gap at once.

Workload: identical to bench.py's stage1_eval (CIRR-val scale, synthetic
device-resident corpus, documented caption-length model).

Usage: python tools/t_single_prog_eval.py [--repeats 3]
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bench import _BenchTokenizer, _stage1_models, caption_lengths, rand_params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--skip-multi", action="store_true")
    args = ap.parse_args()

    from candidate_reranking_cir_tpu.retrieval.validate_engine import (
        build_fusion_plan,
        make_embed_scan,
        make_single_program_eval,
        make_stage1_fns,
        predict_queries,
        ranked_slices,
        resolve_buckets,
        schedule_fusion_batches,
    )

    model, cfg = _stage1_models(train=False)
    L = cfg.text_len
    im = cfg.vit.image_size
    n_idx, n_q, embed_bs, q_batch = 2297, 4181, 32, 256

    ids0 = jnp.ones((2, L), jnp.int32)
    params = rand_params(
        jax.eval_shape(lambda: model.init(
            jax.random.key(0), jnp.zeros((2, im, im, 3)), ids0, ids0)),
        jax.random.key(1))

    n_batches = -(-n_idx // embed_bs)
    imgs = jax.random.normal(jax.random.key(2),
                             (n_batches, embed_bs, im, im, 3),
                             jnp.float32) * 0.3

    lengths = caption_lengths(n_q, L)
    index_names = [f"im{i}" for i in range(n_idx)]
    rng = np.random.default_rng(3)
    ref_idx = rng.integers(0, n_idx, size=n_q).astype(np.int32)
    ref_names = [index_names[i] for i in ref_idx]
    tok = _BenchTokenizer(lengths)
    captions = [f"caption {q}" for q in range(n_q)]
    ent = np.concatenate([rng.integers(0, n_idx, size=(n_q, 1)),
                          ref_idx[:, None],
                          rng.integers(0, n_idx, size=(n_q, 5))],
                         axis=1).astype(np.int32)

    def timed(fn, label):
        fn()  # compile
        times = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        times.sort()
        med = times[len(times) // 2]
        print(f"{label}: median {med:.3f} s ({n_q / med:.0f} q/s), "
              f"times {['%.3f' % t for t in times]}", flush=True)
        return med

    # --- multi-launch path (r4 production) --------------------------------
    if not args.skip_multi:
        _, fuse = make_stage1_fns(model, params)
        embed_scan = make_embed_scan(model, params)

        def run_multi():
            feats, pooled = embed_scan(imgs)
            bank = feats.reshape(-1, *feats.shape[2:])[:n_idx]
            pooled_index = pooled.reshape(-1, pooled.shape[-1])[:n_idx]
            pred = predict_queries(fuse, tok, captions, ref_names, bank,
                                   index_names, L, q_batch=q_batch)
            return ranked_slices(pred, pooled_index, 501, ent)

        print("compiling multi-launch path...", file=sys.stderr, flush=True)
        t_multi = timed(run_multi, "multi-launch")

    # --- single-program path ----------------------------------------------
    ids_all, mask_all, bucket_of = resolve_buckets(tok, captions, L, "auto")
    batches = schedule_fusion_batches(ref_idx, bucket_of, q_batch, True)
    fams, inv = build_fusion_plan(batches, ids_all, mask_all)
    inv_j = jnp.asarray(inv)
    ent_j = jnp.asarray(ent)
    prog = make_single_program_eval(model)

    def run_single():
        topk, ranks = prog(params, imgs, fams, inv_j, ent_j,
                           n_idx=n_idx, width=501)
        return np.asarray(topk), np.asarray(ranks)

    print("compiling single-program path...", file=sys.stderr, flush=True)
    t_single = timed(run_single, "single-program")

    if not args.skip_multi:
        print(f"single/multi: {t_multi / t_single:.3f}x", flush=True)


if __name__ == "__main__":
    main()
