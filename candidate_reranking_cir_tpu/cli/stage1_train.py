"""Stage-I trainer CLI (reference stage1_train.py:508-595).

Flag surface mirrors the reference; the training loop is a mesh-sharded jit
step (runtime/train_steps.py) fed by a prefetching host loader. Differences by
design:
- in-batch contrast becomes global-batch contrast across the mesh,
- gradient accumulation is optax.MultiSteps (reference: manual loss scaling),
- checkpoints are Orbax train states with true resume (reference saves but
  never reloads optimizer state).
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
    shard_state,
    shard_batch,
)
from candidate_reranking_cir_tpu.retrieval.validate_engine import (
    evaluate_cirr_stage1,
    evaluate_fiq_stage1,
)
from candidate_reranking_cir_tpu.runtime.checkpoint import save_checkpoint
from candidate_reranking_cir_tpu.runtime.logging import (
    MetricsLogger,
    make_comet,
)
from candidate_reranking_cir_tpu.runtime.optim import make_optimizer
from candidate_reranking_cir_tpu.runtime.train_steps import (
    TrainState,
    make_stage1_train_step,
)


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    add_common_flags(parser)
    parser.add_argument("--experiment-name", type=str, default="exp0")
    parser.add_argument("--output-dir", type=str, default="models")
    parser.add_argument("--pretrained", type=str, default="",
                        help="BLIP pretrain .pth to start from")
    parser.add_argument("--num-epochs", default=40, type=int)
    parser.add_argument("--blip-max-epoch", default=10, type=int,
                        help="cosine schedule period in epochs")
    parser.add_argument("--blip-learning-rate", default=2e-5, type=float)
    parser.add_argument("--batch-size", default=512, type=int)
    parser.add_argument("--blip-bs", default=16, type=int,
                        help="kept for flag parity; image embedding is one "
                             "fused jit program here")
    parser.add_argument("--blip-img-tune", action="store_true",
                        help="finetune the ViT (default: frozen)")
    parser.add_argument("--no-cache-target-features", action="store_true",
                        help="disable the target-feature cache. By default "
                             "(frozen ViT + deterministic transforms) the "
                             "pooled 256-d target features are embedded ONCE "
                             "for the whole train corpus and reused every "
                             "epoch — numerically identical, skips half of "
                             "each step's ViT work and half the image "
                             "decodes. The reference re-embeds every epoch.")
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
    parser.add_argument("--text-len-buckets", type=str, default="auto",
                        help="per-batch static text-width buckets (the "
                             "reference trains pad-to-longest per batch): "
                             "'auto' (~60/80/100%% of --text-len), 'off', or "
                             "a comma list like '24,32'")
    parser.add_argument("--resume", action="store_true",
                        help="resume from <output-dir>/<exp>/saved_models/"
                             "blip_last (full train state incl. optimizer — "
                             "a capability the reference lacks)")
    return parser.parse_args(argv)


def tokenize_batch(tokenizer, captions, text_len):
    return tokenizer.encode(captions, text_len, set_enc_token=True)


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
    model, cfg = build_stage1(args, remat=True)
    transform = get_transform(args)

    train_cfg = TrainConfig(
        learning_rate=args.blip_learning_rate, weight_decay=args.weight_decay,
        num_epochs=args.num_epochs, cosine_max_epoch=args.blip_max_epoch,
        batch_size=args.batch_size,
        grad_accumulation=args.grad_accumulation_step, seed=args.seed,
        finetune_vit=args.blip_img_tune,
        validation_frequency=args.validation_frequency)

    # datasets
    cache_targets = not args.blip_img_tune \
        and not args.no_cache_target_features
    rng = np.random.default_rng(args.seed)
    if dataset_name == "cirr":
        train_ds = CIRRDataset(args.data_root, "train", "relative", transform,
                               skip_target_image=cache_targets)
        classic_train = CIRRDataset(args.data_root, "train", "classic",
                                    transform)
    else:
        train_ds = FashionIQDataset(args.data_root, "train",
                                    list(args.dress_types), "relative",
                                    transform,
                                    skip_target_image=cache_targets)
        classic_train = FashionIQDataset(args.data_root, "train",
                                         list(args.dress_types), "classic",
                                         transform)
    loader = BatchLoader(train_ds, args.batch_size, shuffle=True,
                         seed=args.seed, workers=8)
    steps_per_epoch = max(len(loader), 1)
    prescan_captions(tokenizer, train_ds, args.text_len, dataset_name)

    # params: pretrained BLIP or fresh init
    if args.pretrained:
        params = load_params(args.pretrained, 1, cfg)
    else:
        dummy_img = np.zeros((2, args.image_size, args.image_size, 3),
                             np.float32)
        dummy_ids = np.ones((2, args.text_len), np.int32)
        params = model.init(jax.random.key(args.seed), dummy_img, dummy_ids,
                            np.ones((2, args.text_len), np.int32))

    freeze = () if args.blip_img_tune else ("params/visual_encoder",)
    tx, schedule = make_optimizer(train_cfg, params, steps_per_epoch,
                                  freeze_prefixes=freeze)
    state = TrainState.create(params, tx)

    mesh = make_mesh_for_batch(args.batch_size)
    training_path = Path(args.output_dir) / args.experiment_name
    start_epoch, skip_batches = 0, 0
    if args.resume:
        state, start_epoch, skip_batches = try_resume(
            training_path / "saved_models" / "blip_last", state,
            with_skip=True)
    # per-epoch shuffle order is seed+epoch; align the loader's counter so a
    # resumed run sees the same batch order the original run would have
    loader.epoch = start_epoch
    logger = MetricsLogger(training_path, args.experiment_name,
                           vars(args))
    comet = make_comet(args.api_key or None, args.workspace or None,
                       f"cir-stage1-{dataset_name}", args.experiment_name)
    step_fn = make_stage1_train_step(model, finetune_vit=args.blip_img_tune)
    # rbg dropout keys: threefry mask generation over the pair-grid
    # attention probs is VPU-bound (~20% of the stage-II step); the
    # hardware RngBitGenerator is statistically equivalent and cheap
    drop_rng = jax.random.key(args.seed, impl=args.dropout_rng)
    text_buckets = parse_text_buckets(args.text_len_buckets, args.text_len)

    # target-feature cache: with a frozen ViT and deterministic transforms
    # the pooled target features are constant — embed the train corpus once
    # and gather per batch ([B, 256] vs a second [B, 384, 384, 3] ViT pass)
    tgt_pooled_np, tgt_pos = None, None
    if cache_targets:
        from candidate_reranking_cir_tpu.retrieval.index import build_index
        from candidate_reranking_cir_tpu.retrieval.validate_engine import (
            make_stage1_fns,
        )

        print("caching pooled target features for the train corpus...")
        embed, _ = make_stage1_fns(model, jax.device_get(state.params))
        _, pooled, names = build_index(classic_train, embed, args.blip_bs,
                                       pooled=True, keep_raw=False)
        tgt_pooled_np = np.asarray(pooled, np.float32)
        tgt_pos = {nm: i for i, nm in enumerate(names)}

    best_metric = -1.0
    stop = GracefulShutdown()
    with jax.set_mesh(mesh):
        state = shard_state(mesh, state, args.fsdp)
        for epoch in range(start_epoch, args.num_epochs):
            t0 = time.time()
            running_loss, seen, steps_done = 0.0, 0, 0
            for bi, batch in enumerate(prefetch(iter(loader), 2)):
                if epoch == start_epoch and bi < skip_batches:
                    continue  # already applied before the preemption
                captions = batch["caption"] if dataset_name == "cirr" else \
                    compose_fiq_train(batch["captions"], rng)
                ids, mask = tokenize_batch(tokenizer, captions, args.text_len)
                ids, mask = text_bucket_slice(ids, mask, text_buckets)
                host_batch = {
                    "ref_images": batch["reference_image"].astype(np.float32),
                    "input_ids": ids, "attention_mask": mask,
                }
                if cache_targets:
                    rows = np.asarray([tgt_pos[nm]
                                       for nm in batch["target_name"]])
                    host_batch["target_pooled"] = tgt_pooled_np[rows]
                else:
                    host_batch["target_images"] = \
                        batch["target_image"].astype(np.float32)
                device_batch = shard_batch(mesh, host_batch)
                state, loss = step_fn(state, device_batch, drop_rng)
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
            lr = float(schedule(epoch * steps_per_epoch))
            print(f"[epoch {epoch}] loss={epoch_loss:.4f} lr={lr:.2e} "
                  f"({time.time() - t0:.1f}s)")
            logger.log_train(epoch=epoch, train_epoch_loss=epoch_loss)
            comet.log_metric("epoch_loss", epoch_loss, epoch=epoch)
            comet.log_metric("epoch_lr", lr, epoch=epoch)

            if (epoch % args.validation_frequency == 0
                    or epoch == args.num_epochs - 1):
                metrics, best_metric = run_validation(
                    args, model, state, tokenizer, transform, dataset_name,
                    epoch, logger, comet, best_metric, training_path)
    stop.restore()
    print("training done")


def try_resume(path, state, with_skip: bool = False):
    """Restore a full TrainState + next epoch from an Orbax checkpoint.

    with_skip=True also returns the number of already-applied batches to
    skip inside the first resumed epoch (recorded by mid-epoch preemption
    saves): the optimizer state contains those steps, so re-running them
    would double-apply those batches and shift the step-indexed LR schedule.
    Batch order is deterministic per (seed, epoch), so skipping reproduces
    the un-preempted run exactly (modulo the skipped batches' host decode).
    """
    import json

    from candidate_reranking_cir_tpu.runtime.checkpoint import (
        restore_checkpoint,
    )

    path = Path(path)
    if not path.exists():
        print(f"no checkpoint at {path}; starting fresh")
        return (state, 0, 0) if with_skip else (state, 0)
    restored = restore_checkpoint(path, state)
    state = state.replace(step=restored["step"], params=restored["params"],
                          opt_state=restored["opt_state"])
    meta = path / "framework_metadata.json"
    epoch, skip = 0, 0
    if meta.exists():
        md = json.loads(meta.read_text())
        epoch = md.get("epoch", -1) + 1
        skip = int(md.get("skip_batches", 0))
    extra = f", skipping {skip} already-applied batches" if skip else ""
    print(f"resumed from {path} at epoch {epoch} "
          f"(step {int(state.step)}){extra}")
    return (state, epoch, skip) if with_skip else (state, epoch)


def run_validation(args, model, state, tokenizer, transform, dataset_name,
                   epoch, logger, comet, best_metric, training_path):
    params = jax.device_get(state.params)
    saved_dir = Path(training_path) / "saved_models"
    if dataset_name == "cirr":
        classic = CIRRDataset(args.data_root, "val", "classic", transform)
        relative = CIRRDataset(args.data_root, "val", "relative", transform)
        result, _ = evaluate_cirr_stage1(
            model, params, classic, relative, tokenizer,
            text_len=args.text_len, batch_size=32)
        mets = result.metrics
        selection = mets["mean_r5_rs1"]  # stage1_train.py:497-499
        ckpt_name = "blip_mean"
    else:
        r10s, r50s = [], []
        mets = {}
        for dress in ("shirt", "dress", "toptee"):
            classic = FashionIQDataset(args.data_root, "val", [dress],
                                       "classic", transform)
            relative = FashionIQDataset(args.data_root, "val", [dress],
                                        "relative", transform)
            result, _ = evaluate_fiq_stage1(
                model, params, classic, relative, tokenizer,
                text_len=args.text_len, batch_size=32)
            mets.update({f"{dress}_{k}": v for k, v in
                         result.metrics.items()})
            r10s.append(result.metrics["recall_at10"])
            r50s.append(result.metrics["recall_at50"])
        selection = (float(np.mean(r10s)) + float(np.mean(r50s))) / 2
        mets["average_recall"] = selection
        ckpt_name = "blip"

    print_metrics(mets)
    logger.log_validation(epoch=epoch, **mets)
    for k, v in mets.items():
        comet.log_metric(k, v, epoch=epoch)

    save_checkpoint(saved_dir / "blip_last", state,
                    metadata={"epoch": epoch})
    if selection > best_metric:
        best_metric = selection
        save_checkpoint(saved_dir / ckpt_name, state,
                        metadata={"epoch": epoch, "metric": selection})
        print(f"saved best ({ckpt_name}) at epoch {epoch}: {selection:.2f}")
    return mets, best_metric


if __name__ == "__main__":
    main()
