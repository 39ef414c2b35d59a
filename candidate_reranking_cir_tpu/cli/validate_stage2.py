"""Stage-II validation CLI (reference validate_stage2.py:301-414)."""
from __future__ import annotations

import argparse

from candidate_reranking_cir_tpu.cli.common import (
    add_common_flags,
    build_stage1,
    build_stage2,
    get_mesh,
    get_tokenizer,
    get_transform,
    load_params,
    parse_l_buckets,
    print_metrics,
)
from candidate_reranking_cir_tpu.retrieval.validate2_engine import (
    evaluate_cirr_stage2,
    evaluate_fiq_stage2,
)


def main(argv=None):
    from candidate_reranking_cir_tpu.runtime.host import (
        enable_compilation_cache,
        limit_numpy_threads,
    )

    limit_numpy_threads()
    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    add_common_flags(parser)
    parser.add_argument("--stage1-path", type=str, required=True)
    parser.add_argument("--stage2-path", type=str, required=True)
    parser.add_argument("--top-k-path", type=str, required=True)
    parser.add_argument("--K-value", dest="k_value", type=int, default=50)
    parser.add_argument("--q-batch", type=int, default=8)
    parser.add_argument("--schedule", type=str, default="candidate_major",
                        choices=["candidate_major", "query_major"],
                        help="re-rank scheduling: group pairs by candidate "
                             "(K/V amortized over ~90 queries per corpus "
                             "image) or by query ([Qb, K] chunks)")
    parser.add_argument("--shard-index", action="store_true",
                        help="shard the corpus feature bank over the mesh "
                             "instead of replicating it (for corpora beyond "
                             "per-chip HBM); needs --mesh auto and the "
                             "candidate-major schedule")
    parser.add_argument("--index-int8", action="store_true",
                        help="quantize the corpus feature bank to per-token "
                             "int8 (~half the HBM; scores shift <1%% — "
                             "diverges from reference numerics, OFF for "
                             "parity runs)")
    parser.add_argument("--l-buckets", type=str, default="auto",
                        help="text-length buckets for the candidate-major "
                             "scheduler: 'auto' (length-percentile cuts), "
                             "'off' (single --text-len bucket), or a comma "
                             "list like '16,24,40'. Most grid compute scales "
                             "with text width; scores are bit-exact across "
                             "bucket widths")
    args = parser.parse_args(argv)
    if args.index_int8 and args.shard_index:
        parser.error("--index-int8 and --shard-index are mutually exclusive "
                     "(quantize halves the bank instead of sharding it)")

    tokenizer = get_tokenizer(args)  # cheap fail-fast before ckpt IO
    stage1, s1_cfg = build_stage1(args)
    reranker, s2_cfg = build_stage2(args)
    s1_params = load_params(args.stage1_path, 1, s1_cfg)
    s2_params = load_params(args.stage2_path, 2, s2_cfg)
    transform = get_transform(args)
    mesh = get_mesh(args)
    l_buckets = parse_l_buckets(args.l_buckets)

    if args.dataset.lower() == "cirr":
        mets = evaluate_cirr_stage2(
            stage1, s1_params, reranker, s2_params, tokenizer,
            data_root=args.data_root, transform=transform,
            top_k_path=args.top_k_path, k=args.k_value,
            text_len=args.text_len, q_batch=args.q_batch, mesh=mesh,
            schedule=args.schedule, l_buckets=l_buckets,
            index_int8=args.index_int8,
            shard_index=args.shard_index and mesh is not None)
        print_metrics(mets)
        print(f"recall_mean = {mets['mean_r5_rs1']:.2f}")
    elif args.dataset.lower() == "fashioniq":
        mets = evaluate_fiq_stage2(
            stage1, s1_params, reranker, s2_params, tokenizer,
            data_root=args.data_root, transform=transform,
            top_k_path=args.top_k_path, k=args.k_value,
            text_len=args.text_len, q_batch=args.q_batch, mesh=mesh,
            schedule=args.schedule, l_buckets=l_buckets,
            index_int8=args.index_int8,
            shard_index=args.shard_index and mesh is not None)
        print_metrics(mets)
    else:
        raise ValueError("Dataset should be either 'CIRR' or 'fashionIQ'")


if __name__ == "__main__":
    main()
