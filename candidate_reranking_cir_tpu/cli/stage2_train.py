"""Stage-II trainer CLI (reference stage2_train.py:562-658).

Loads a frozen stage-I model to produce z_t on the fly inside the jitted
train step, trains the dual-encoder re-ranker with CE over the B x B pair
grid. The reference's inner Python loop over queries (blip_stage2.py:78-94)
is one pair-grid program here, with candidate K/V computed once per candidate.
"""
from __future__ import annotations

import argparse
import time
from pathlib import Path

import jax
import numpy as np

from candidate_reranking_cir_tpu.cli.common import (
    add_common_flags,
    build_stage1,
    build_stage2,
    get_tokenizer,
    get_transform,
    load_params,
    parse_text_buckets,
    prescan_captions,
    print_metrics,
    text_bucket_slice,
)
from candidate_reranking_cir_tpu.config import TrainConfig
from candidate_reranking_cir_tpu.data.captions import compose_fiq_train
from candidate_reranking_cir_tpu.data.datasets import (
    CIRRDataset,
    FashionIQDataset,
)
from candidate_reranking_cir_tpu.data.loader import BatchLoader, prefetch
from candidate_reranking_cir_tpu.parallel.mesh import (
    make_mesh_for_batch,
    replicated,
    shard_state,
    shard_batch,
)
from candidate_reranking_cir_tpu.runtime.checkpoint import save_checkpoint
from candidate_reranking_cir_tpu.runtime.logging import (
    MetricsLogger,
    make_comet,
)
from candidate_reranking_cir_tpu.runtime.optim import make_optimizer
from candidate_reranking_cir_tpu.runtime.train_steps import (
    TrainState,
    make_stage2_train_step,
)


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    add_common_flags(parser)
    parser.add_argument("--experiment-name", type=str, default="exp0_s2")
    parser.add_argument("--output-dir", type=str, default="models")
    parser.add_argument("--stage1-path", type=str, required=True,
                        help="trained stage-I checkpoint")
    parser.add_argument("--pretrained", type=str, default="",
                        help="BLIP pretrain .pth for stage-II init (dual "
                             "duplication applied)")
    parser.add_argument("--top-k-path", type=str, required=True,
                        help="stage-I top-k file for validation")
    parser.add_argument("--K-value", dest="k_value", type=int, required=True)
    parser.add_argument("--num-epochs", default=100, type=int)
    parser.add_argument("--blip-max-epoch", default=80, type=int)
    parser.add_argument("--blip-learning-rate", default=2e-5, type=float)
    parser.add_argument("--batch-size", default=16, type=int)
    parser.add_argument("--blip-img-tune", action="store_true",
                        help="finetune the stage-II ViT (default: frozen "
                             "feature extractor, stage2_train.py:445-452)")
    parser.add_argument("--grad-accumulation-step", default=1, type=int)
    parser.add_argument("--validation-frequency", default=1, type=int)
    parser.add_argument("--weight-decay", default=0.05, type=float)
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("--api-key", type=str, default="")
    parser.add_argument("--workspace", type=str, default="")
    parser.add_argument("--fsdp", action="store_true",
                        help="shard params AND optimizer moments over the "
                             "mesh's data axis (ZeRO-style) instead of "
                             "replicating them")
    parser.add_argument("--resume", action="store_true",
                        help="resume from saved_models/blip_last")
    parser.add_argument("--text-len-buckets", type=str, default="auto",
                        help="per-batch static text-width buckets (the "
                             "reference trains pad-to-longest per batch): "
                             "'auto' (~60/80/100%% of --text-len), 'off', or "
                             "a comma list like '24,32'. One compiled "
                             "program per bucket")
    return parser.parse_args(argv)


def main(argv=None):
    from candidate_reranking_cir_tpu.runtime.host import (
        GracefulShutdown,
        enable_compilation_cache,
        limit_numpy_threads,
    )

    limit_numpy_threads()
    enable_compilation_cache()
    args = parse_args(argv)
    dataset_name = args.dataset.lower()
    assert dataset_name in ("cirr", "fashioniq")

    tokenizer = get_tokenizer(args)  # cheap fail-fast before ckpt IO
    stage1, s1_cfg = build_stage1(args)
    reranker, s2_cfg = build_stage2(args, remat=True)
    transform = get_transform(args)

    s1_params = load_params(args.stage1_path, 1, s1_cfg)
    if args.pretrained:
        s2_params = load_params(args.pretrained, 2, s2_cfg)
    else:
        d_img = np.zeros((2, args.image_size, args.image_size, 3), np.float32)
        d_ids = np.ones((2, args.text_len), np.int32)
        d_z = np.zeros((2, args.text_len, s2_cfg.text.hidden_size), np.float32)
        s2_params = reranker.init(jax.random.key(args.seed), d_img, d_ids,
                                  np.ones((2, args.text_len), np.int32), d_z)

    train_cfg = TrainConfig(
        learning_rate=args.blip_learning_rate, weight_decay=args.weight_decay,
        num_epochs=args.num_epochs, cosine_max_epoch=args.blip_max_epoch,
        batch_size=args.batch_size,
        grad_accumulation=args.grad_accumulation_step, seed=args.seed)

    rng = np.random.default_rng(args.seed)
    if dataset_name == "cirr":
        train_ds = CIRRDataset(args.data_root, "train", "relative", transform)
    else:
        train_ds = FashionIQDataset(args.data_root, "train",
                                    list(args.dress_types), "relative",
                                    transform)
    loader = BatchLoader(train_ds, args.batch_size, shuffle=True,
                         seed=args.seed)
    steps_per_epoch = max(len(loader), 1)
    prescan_captions(tokenizer, train_ds, args.text_len, dataset_name)

    # like the reference (stage2_train.py:96-99,138), a frozen ViT must be
    # invisible to AdamW: optax.adamw applies weight decay even to
    # zero-gradient params, which would otherwise slowly shrink the frozen
    # visual encoder over a long run
    freeze = () if args.blip_img_tune else ("params/visual_encoder",)
    tx, schedule = make_optimizer(train_cfg, s2_params, steps_per_epoch,
                                  freeze_prefixes=freeze)
    state = TrainState.create(s2_params, tx)

    mesh = make_mesh_for_batch(args.batch_size)
    training_path = Path(args.output_dir) / args.experiment_name
    start_epoch, skip_batches = 0, 0
    if args.resume:
        from candidate_reranking_cir_tpu.cli.stage1_train import try_resume

        state, start_epoch, skip_batches = try_resume(
            training_path / "saved_models" / "blip_last", state,
            with_skip=True)
    # per-epoch shuffle order is seed+epoch; align the loader's counter so a
    # resumed run sees the same batch order the original run would have
    loader.epoch = start_epoch
    logger = MetricsLogger(training_path, args.experiment_name, vars(args))
    comet = make_comet(args.api_key or None, args.workspace or None,
                       f"cir-stage2-{dataset_name}", args.experiment_name)
    step_fn = make_stage2_train_step(stage1, reranker,
                                     finetune_vit=args.blip_img_tune)
    # rbg dropout keys: threefry mask generation over the pair-grid
    # attention probs is VPU-bound (~20% of the stage-II step); the
    # hardware RngBitGenerator is statistically equivalent and cheap
    drop_rng = jax.random.key(args.seed, impl=args.dropout_rng)
    text_buckets = parse_text_buckets(args.text_len_buckets, args.text_len)

    best_metric = -1.0
    stop = GracefulShutdown()
    with jax.set_mesh(mesh):
        state = shard_state(mesh, state, args.fsdp)
        s1_params_dev = jax.device_put(s1_params, replicated(mesh))
        for epoch in range(start_epoch, args.num_epochs):
            t0 = time.time()
            running_loss, seen, steps_done = 0.0, 0, 0
            for bi, batch in enumerate(prefetch(iter(loader), 2)):
                if epoch == start_epoch and bi < skip_batches:
                    continue  # already applied before the preemption
                captions = batch["caption"] if dataset_name == "cirr" else \
                    compose_fiq_train(batch["captions"], rng)
                ids, mask = tokenizer.encode(captions, args.text_len,
                                             set_enc_token=True)
                ids, mask = text_bucket_slice(ids, mask, text_buckets)
                device_batch = shard_batch(mesh, {
                    "ref_images": batch["reference_image"].astype(np.float32),
                    "target_images": batch["target_image"].astype(np.float32),
                    "input_ids": ids, "attention_mask": mask,
                })
                state, loss = step_fn(state, s1_params_dev, device_batch,
                                      drop_rng)
                loss = float(loss)
                running_loss += loss * ids.shape[0]
                seen += ids.shape[0]
                steps_done = bi + 1
                comet.log_metric("step_loss", loss, step=int(state.step))
                if stop.requested:
                    break
            if stop.requested:  # preemption: save a resumable state, exit 0
                # epoch-1 re-enters the interrupted epoch; skip_batches skips
                # the steps already inside the optimizer state, so nothing is
                # double-applied and the step-indexed LR schedule stays exact.
                # steps_done stays 0 while still replaying skips (possible
                # when the prior preemption hit the epoch's final batch), so
                # never let a re-preemption lose the recorded skip count.
                applied = max(steps_done,
                              skip_batches if epoch == start_epoch else 0)
                save_checkpoint(
                    training_path / "saved_models" / "blip_last", state,
                    metadata={"epoch": epoch - 1,
                              "skip_batches": applied})
                print(f"preempted ({stop.signal_name}) at epoch {epoch}: "
                      "resumable checkpoint saved; restart with --resume")
                stop.restore()
                return
            epoch_loss = running_loss / max(seen, 1)
            print(f"[epoch {epoch}] loss={epoch_loss:.4f} "
                  f"lr={float(schedule(epoch * steps_per_epoch)):.2e} "
                  f"({time.time() - t0:.1f}s)")
            logger.log_train(epoch=epoch, train_epoch_loss=epoch_loss)
            comet.log_metric("epoch_loss", epoch_loss, epoch=epoch)

            if (epoch % args.validation_frequency == 0
                    or epoch == args.num_epochs - 1):
                best_metric = run_validation(
                    args, stage1, s1_params, reranker, state, tokenizer,
                    transform, dataset_name, epoch, logger, comet,
                    best_metric, training_path)
    stop.restore()
    print("training done")


def run_validation(args, stage1, s1_params, reranker, state, tokenizer,
                   transform, dataset_name, epoch, logger, comet, best_metric,
                   training_path):
    from candidate_reranking_cir_tpu.retrieval.validate2_engine import (
        evaluate_cirr_stage2,
        evaluate_fiq_stage2,
    )

    s2_params = jax.device_get(state.params)
    saved_dir = Path(training_path) / "saved_models"
    if dataset_name == "cirr":
        mets = evaluate_cirr_stage2(
            stage1, s1_params, reranker, s2_params, tokenizer,
            data_root=args.data_root, transform=transform,
            top_k_path=args.top_k_path, k=args.k_value,
            text_len=args.text_len)
        selection = mets["mean_r5_rs1"]
        ckpt_name = "blip_mean"
    else:
        mets = evaluate_fiq_stage2(
            stage1, s1_params, reranker, s2_params, tokenizer,
            data_root=args.data_root, transform=transform,
            top_k_path=args.top_k_path, k=args.k_value,
            text_len=args.text_len)
        selection = mets["average_recall"]
        ckpt_name = "blip"

    print_metrics(mets)
    logger.log_validation(epoch=epoch, **mets)
    for k, v in mets.items():
        comet.log_metric(k, v, epoch=epoch)

    save_checkpoint(saved_dir / "blip_last", state, metadata={"epoch": epoch})
    if selection > best_metric:
        best_metric = selection
        save_checkpoint(saved_dir / ckpt_name, state,
                        metadata={"epoch": epoch, "metric": selection})
        print(f"saved best ({ckpt_name}) at epoch {epoch}: {selection:.2f}")
    return best_metric


if __name__ == "__main__":
    main()
