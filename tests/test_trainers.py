"""Trainer CLI end-to-end: one epoch of stage-I and stage-II on a synthetic
CIRR dataset with tiny models, including checkpointing and resume."""
import json
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full train-loop epochs (CPU-minutes per test)

IMG = 32
N_IMAGES = 10
N_TRAIN = 8
N_VAL = 4

MODEL_CONFIG = {
    "vit": {"image_size": IMG, "patch_size": 8, "hidden_size": 24,
            "num_layers": 2, "num_heads": 4},
    "text": {"vocab_size": 256, "hidden_size": 24, "num_layers": 2,
             "num_heads": 4, "intermediate_size": 48, "encoder_width": 24,
             "merge_mlp_from": 1},
    "embed_dim": 16,
}


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    import PIL.Image

    root = tmp_path_factory.mktemp("train")
    base = root / "cirr_dataset"
    (base / "cirr" / "captions").mkdir(parents=True)
    (base / "cirr" / "image_splits").mkdir(parents=True)
    (base / "img").mkdir()

    rng = np.random.default_rng(0)
    names = [f"im{i}" for i in range(N_IMAGES)]
    relpath = {}
    for n in names:
        PIL.Image.fromarray(
            rng.integers(0, 255, size=(36, 40, 3), dtype=np.uint8)
        ).save(base / "img" / f"{n}.jpg")
        relpath[n] = f"img/{n}.jpg"

    def triplets(count):
        out = []
        for q in range(count):
            ref, tgt = names[q % N_IMAGES], names[(q + 3) % N_IMAGES]
            members = [ref, tgt] + [names[(q + 4 + j) % N_IMAGES]
                                    for j in range(4)]
            out.append({"pairid": q, "reference": ref,
                        "target_hard": tgt, "caption": f"a red dress {q}",
                        "img_set": {"members": members}})
        return out

    for split, count in (("train", N_TRAIN), ("val", N_VAL)):
        with open(base / "cirr" / "captions" / f"cap.rc2.{split}.json",
                  "w") as f:
            json.dump(triplets(count), f)
        with open(base / "cirr" / "image_splits" / f"split.rc2.{split}.json",
                  "w") as f:
            json.dump(relpath, f)

    (root / "model_config.json").write_text(json.dumps(MODEL_CONFIG))
    return root


def _common(root):
    return ["--dataset", "CIRR", "--data-root", str(root),
            "--allow-test-vocab",
            "--image-size", str(IMG), "--text-len", "10", "--no-bf16",
            "--model-config", str(root / "model_config.json")]


def test_stage1_trainer_one_epoch_and_resume(root, capsys):
    from candidate_reranking_cir_tpu.cli import stage1_train

    out_dir = root / "models"
    args = _common(root) + [
        "--experiment-name", "t1", "--output-dir", str(out_dir),
        "--num-epochs", "1", "--batch-size", "4", "--blip-max-epoch", "2",
        "--validation-frequency", "1"]
    stage1_train.main(args)
    text = capsys.readouterr().out
    assert "[epoch 0] loss=" in text
    exp = out_dir / "t1"
    assert (exp / "train_metrics.csv").exists()
    assert (exp / "validation_metrics.csv").exists()
    assert (exp / "saved_models" / "blip_last").exists()
    assert (exp / "saved_models" / "blip_mean").exists()
    # loss at random init ~ ln(batch)
    loss = float(text.split("loss=")[1].split(" ")[0])
    assert 0.3 < loss < 4.0

    # resume: epoch 0 done -> restarts at epoch 1
    stage1_train.main(args + ["--resume", "--num-epochs", "2"])
    text = capsys.readouterr().out
    assert "resumed from" in text and "[epoch 1] loss=" in text


def test_stage2_trainer_one_epoch(root, capsys, tmp_path):
    import jax

    from candidate_reranking_cir_tpu.cli import stage2_train, validate
    from candidate_reranking_cir_tpu.runtime.checkpoint import save_checkpoint

    # make a stage-I checkpoint + top-k file first
    from candidate_reranking_cir_tpu.config import (
        RetrievalModelConfig,
        TextEncoderConfig,
        ViTConfig,
    )
    from candidate_reranking_cir_tpu.models.blip_retrieval import (
        RetrievalModel,
    )

    s1 = RetrievalModel(RetrievalModelConfig(
        vit=ViTConfig(**MODEL_CONFIG["vit"]),
        text=TextEncoderConfig(**MODEL_CONFIG["text"]), embed_dim=16,
        text_len=10))
    imgs = np.zeros((2, IMG, IMG, 3), np.float32)
    ids = np.ones((2, 10), np.int32)
    s1_params = s1.init(jax.random.key(0), imgs, ids, ids)
    ckpt = tmp_path / "s1"
    save_checkpoint(ckpt, {"params": s1_params})

    topk = tmp_path / "topk.npz"
    validate.main(_common(root) + [
        "--stage1-path", str(ckpt), "--save-topk", "--k", "6",
        "--topk-out", str(topk), "--batch-size", "4"])
    capsys.readouterr()

    out_dir = root / "models2"
    stage2_train.main(_common(root) + [
        "--experiment-name", "t2", "--output-dir", str(out_dir),
        "--stage1-path", str(ckpt), "--top-k-path", str(topk),
        "--K-value", "4", "--num-epochs", "1", "--batch-size", "4",
        "--blip-max-epoch", "2", "--validation-frequency", "1"])
    text = capsys.readouterr().out
    assert "[epoch 0] loss=" in text
    assert (out_dir / "t2" / "saved_models" / "blip_mean").exists()
    loss = float(text.split("loss=")[1].split(" ")[0])
    # CE over a 4-row pair grid at random init ~ ln(4)
    assert 0.3 < loss < 3.5


def test_stage1_cached_targets_matches_uncached(root, capsys):
    """Target-feature cache (default with a frozen ViT): same training losses
    as re-embedding targets every step."""
    import re

    from candidate_reranking_cir_tpu.cli import stage1_train

    def run(extra, name):
        stage1_train.main(_common(root) + [
            "--experiment-name", name, "--output-dir",
            str(root / "models_cache"), "--num-epochs", "1",
            "--batch-size", "4", "--blip-max-epoch", "2",
            "--validation-frequency", "5"] + extra)
        out = capsys.readouterr().out
        m = re.search(r"\[epoch 0\] loss=([0-9.]+)", out)
        assert m, out
        return float(m.group(1))

    loss_cached = run([], "cache_on")
    loss_plain = run(["--no-cache-target-features"], "cache_off")
    assert abs(loss_cached - loss_plain) < 5e-4, (loss_cached, loss_plain)


def test_stage1_trainer_preemption_saves_resumable(root, capsys,
                                                   monkeypatch):
    """SIGTERM mid-training: the trainer finishes its current step, saves a
    resumable blip_last, and returns cleanly; --resume then re-runs the
    interrupted epoch. The signal is delivered deterministically from inside
    the first step's metric callback (handler runs on the next main-thread
    bytecode boundary, i.e. still mid-epoch)."""
    import os
    import signal

    from candidate_reranking_cir_tpu.cli import stage1_train
    from candidate_reranking_cir_tpu.runtime.logging import CometStub

    class KillerComet(CometStub):
        steps = 0

        def log_metric(self, name, *a, **k):
            if name == "step_loss":
                KillerComet.steps += 1
                if KillerComet.steps == 1:
                    os.kill(os.getpid(), signal.SIGTERM)

    monkeypatch.setattr(stage1_train, "make_comet",
                        lambda *a, **k: KillerComet())
    out_dir = root / "models_preempt"
    args = _common(root) + [
        "--experiment-name", "tp", "--output-dir", str(out_dir),
        "--num-epochs", "2", "--batch-size", "4", "--blip-max-epoch", "2",
        "--validation-frequency", "100"]

    stage1_train.main(args)  # returns instead of dying
    text = capsys.readouterr().out
    assert "preempted (SIGTERM) at epoch 0" in text
    assert "[epoch 0] loss=" not in text  # interrupted before epoch end
    assert (out_dir / "tp" / "saved_models" / "blip_last").exists()

    monkeypatch.setattr(stage1_train, "make_comet",
                        lambda *a, **k: CometStub())
    stage1_train.main(args + ["--resume", "--num-epochs", "1"])
    text = capsys.readouterr().out
    # the interrupted epoch 0 is re-entered, and the batch applied before
    # the preemption is skipped (not double-applied)
    assert "resumed from" in text and "at epoch 0" in text
    assert "skipping 1 already-applied batches" in text
    assert "[epoch 0] loss=" in text
