"""CLI integration tests: full command surface on a synthetic CIRR dataset
with tiny models (via --model-config) and Orbax checkpoints."""
import json
from pathlib import Path

import jax
import numpy as np
import pytest

from candidate_reranking_cir_tpu.models.blip_reranker import RerankerModel
from candidate_reranking_cir_tpu.models.blip_retrieval import RetrievalModel
from candidate_reranking_cir_tpu.config import (
    RerankerModelConfig,
    RetrievalModelConfig,
    TextEncoderConfig,
    ViTConfig,
)
from candidate_reranking_cir_tpu.runtime.checkpoint import save_checkpoint

IMG = 32
N_IMAGES = 12
N_QUERIES = 6

MODEL_CONFIG = {
    "vit": {"image_size": IMG, "patch_size": 8, "hidden_size": 24,
            "num_layers": 2, "num_heads": 4},
    "text": {"vocab_size": 256, "hidden_size": 24, "num_layers": 2,
             "num_heads": 4, "intermediate_size": 48, "encoder_width": 24,
             "hidden_dropout": 0.0, "attention_dropout": 0.0,
             "merge_mlp_from": 1},
    "embed_dim": 16,
}


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    """Synthetic CIRR dataset (val + test1) + tiny checkpoints + config."""
    import PIL.Image

    root = tmp_path_factory.mktemp("cliroot")
    base = root / "cirr_dataset"
    (base / "cirr" / "captions").mkdir(parents=True)
    (base / "cirr" / "image_splits").mkdir(parents=True)
    (base / "img").mkdir()

    rng = np.random.default_rng(0)
    names = [f"im{i}" for i in range(N_IMAGES)]
    relpath = {}
    for i, name in enumerate(names):
        arr = rng.integers(0, 255, size=(40, 36, 3), dtype=np.uint8)
        PIL.Image.fromarray(arr).save(base / "img" / f"{name}.jpg")
        relpath[name] = f"img/{name}.jpg"

    def triplets(split):
        out = []
        for q in range(N_QUERIES):
            ref, tgt = names[q], names[(q + 3) % N_IMAGES]
            members = [ref, tgt] + [names[(q + 5 + j) % N_IMAGES]
                                    for j in range(4)]
            t = {"pairid": q, "reference": ref,
                 "caption": f"a red dress {q}",
                 "img_set": {"members": members}}
            if split != "test1":
                t["target_hard"] = tgt
            out.append(t)
        return out

    for split in ("val", "test1"):
        with open(base / "cirr" / "captions" / f"cap.rc2.{split}.json",
                  "w") as f:
            json.dump(triplets(split), f)
        with open(base / "cirr" / "image_splits" / f"split.rc2.{split}.json",
                  "w") as f:
            json.dump(relpath, f)

    cfg_path = root / "model_config.json"
    cfg_path.write_text(json.dumps(MODEL_CONFIG))

    # tiny checkpoints
    vit = ViTConfig(**MODEL_CONFIG["vit"])
    text = TextEncoderConfig(**MODEL_CONFIG["text"])
    s1 = RetrievalModel(RetrievalModelConfig(vit=vit, text=text, embed_dim=16,
                                             text_len=10))
    s2 = RerankerModel(RerankerModelConfig(vit=vit, text=text, text_len=10))
    imgs = np.zeros((2, IMG, IMG, 3), np.float32)
    ids = np.ones((2, 10), np.int32)
    msk = np.ones((2, 10), np.int32)
    z = np.zeros((2, 10, 24), np.float32)
    s1_params = s1.init(jax.random.key(0), imgs, ids, msk)
    s2_params = s2.init(jax.random.key(1), imgs, ids, msk, z)
    save_checkpoint(root / "ckpt_s1", {"params": s1_params})
    save_checkpoint(root / "ckpt_s2", {"params": s2_params})
    return root


def _common(workdir):
    return ["--dataset", "CIRR", "--data-root", str(workdir),
            "--allow-test-vocab",
            "--image-size", str(IMG), "--text-len", "10", "--no-bf16",
            "--model-config", str(workdir / "model_config.json")]


@pytest.mark.slow
def test_cli_validate_and_stage2(workdir, capsys):
    from candidate_reranking_cir_tpu.cli import validate, validate_stage2

    topk = workdir / "cirr_topk_val.npz"
    validate.main(_common(workdir) + [
        "--stage1-path", str(workdir / "ckpt_s1"),
        "--save-topk", "--k", "8", "--topk-out", str(topk),
        "--batch-size", "4"])
    out = capsys.readouterr().out
    assert "recall_at1 =" in out and "group_recall_at1 =" in out
    assert topk.exists()

    validate_stage2.main(_common(workdir) + [
        "--stage1-path", str(workdir / "ckpt_s1"),
        "--stage2-path", str(workdir / "ckpt_s2"),
        "--top-k-path", str(topk), "--K-value", "4", "--q-batch", "4"])
    out = capsys.readouterr().out
    assert "recall_mean" in out


@pytest.mark.slow
def test_cli_submissions(workdir, capsys):
    from candidate_reranking_cir_tpu.cli import (
        cirr_test_submission,
        cirr_test_submission_stage2,
    )

    sub_dir = workdir / "submission"
    topk = workdir / "cirr_topk_test1.npz"
    cirr_test_submission.main(_common(workdir) + [
        "--stage1-path", str(workdir / "ckpt_s1"),
        "--submission-name", "tiny_stage1",
        "--out-dir", str(sub_dir),
        "--save-topk", "--k", "4", "--topk-out", str(topk),
        "--batch-size", "4"])
    p1 = sub_dir / "recall_submission_tiny_stage1.json"
    p2 = sub_dir / "recall_subset_submission_tiny_stage1.json"
    assert p1.exists() and p2.exists()
    sub = json.loads(p1.read_text())
    assert sub["version"] == "rc2" and sub["metric"] == "recall"
    assert len(sub["0"]) == min(50, N_IMAGES - 1)
    # reference image never appears in its own ranking
    assert "im0" not in sub["0"]
    subset = json.loads(p2.read_text())
    assert subset["metric"] == "recall_subset" and len(subset["0"]) == 3

    cirr_test_submission_stage2.main(_common(workdir) + [
        "--stage1-path", str(workdir / "ckpt_s1"),
        "--stage2-path", str(workdir / "ckpt_s2"),
        "--top-k-path", str(topk), "--K-value", "4",
        "--submission-name", "tiny_stage2",
        "--out-dir", str(sub_dir), "--q-batch", "4", "--batch-size", "4"])
    s2_file = sub_dir / "recall_submission_tiny_stage2.json"
    assert s2_file.exists()
    s2_sub = json.loads(s2_file.read_text())
    # stage-2 global list re-sorts the stage-1 top-k set
    assert set(s2_sub["0"]) == set(
        json.loads(p1.read_text())["0"][:4])


def test_text_bucket_helpers():
    from candidate_reranking_cir_tpu.cli.common import (
        parse_l_buckets,
        parse_text_buckets,
        text_bucket_slice,
    )

    assert parse_l_buckets("auto") == "auto"
    assert parse_l_buckets("off") is None
    assert parse_l_buckets("16,24,40") == (16, 24, 40)

    assert parse_text_buckets("off", 40) == ()
    assert parse_text_buckets("auto", 40) == (24, 32, 40)
    assert parse_text_buckets("24,32", 40) == (24, 32, 40)
    assert parse_text_buckets("64", 40) == (40,)  # > text_len dropped

    ids = np.arange(80, dtype=np.int32).reshape(2, 40)
    mask = np.zeros((2, 40), np.int32)
    mask[0, :9] = 1
    mask[1, :21] = 1  # batch max 21 -> bucket 24
    i2, m2 = text_bucket_slice(ids, mask, (24, 32, 40))
    assert i2.shape == (2, 24) and m2.shape == (2, 24)
    np.testing.assert_array_equal(i2, ids[:, :24])
    # no buckets: unchanged
    i3, m3 = text_bucket_slice(ids, mask, ())
    assert i3.shape == (2, 40)
    # longest caption exceeds every bucket: full width kept
    mask[1, :] = 1
    i4, _ = text_bucket_slice(ids, mask, (24, 32))
    assert i4.shape == (2, 40)


@pytest.mark.slow
def test_parity_ladder_self_consistent(workdir, tmp_path, capsys):
    """Drive the full parity ladder against self-generated 'reference'
    artifacts: our own top-k file and golden-named submissions. Every rung
    must PASS (the ladder is the round-3 gate for real published weights;
    this proves the orchestration + comparisons work end-to-end)."""
    from candidate_reranking_cir_tpu.cli import (
        cirr_test_submission,
        parity_ladder,
        validate,
    )

    # "reference" artifacts from the same tiny model: top-k file + goldens
    ref_topk = tmp_path / "ref_top_8_val.npz"
    validate.main(_common(workdir) + [
        "--stage1-path", str(workdir / "ckpt_s1"),
        "--save-topk", "--k", "8", "--topk-out", str(ref_topk),
        "--batch-size", "4"])
    goldens = tmp_path / "goldens"
    goldens.mkdir()
    test1_topk = tmp_path / "ref_top_8_test1.npz"
    cirr_test_submission.main(_common(workdir) + [
        "--stage1-path", str(workdir / "ckpt_s1"),
        "--submission-name", "stage1_0", "--out-dir", str(goldens),
        "--save-topk", "--k", "8", "--topk-out", str(test1_topk),
        "--batch-size", "4"])
    from candidate_reranking_cir_tpu.cli import cirr_test_submission_stage2

    cirr_test_submission_stage2.main(_common(workdir) + [
        "--stage1-path", str(workdir / "ckpt_s1"),
        "--stage2-path", str(workdir / "ckpt_s2"),
        "--top-k-path", str(test1_topk), "--K-value", "4",
        "--submission-name", "stage2_0", "--out-dir", str(goldens),
        "--batch-size", "4"])

    ladder_args = _common(workdir) + [
        # rung 0 (the reference-code differential) is covered directly by
        # tests/test_reference_differential.py; skipping it here keeps this
        # test from re-running the full-config torch comparison 3x
        "--reference-src", str(workdir / "no_reference_here"),
        "--stage1-ckpt", str(workdir / "ckpt_s1"),
        "--stage2-ckpt", str(workdir / "ckpt_s2"),
        "--reference-topk", str(ref_topk),
        "--goldens-dir", str(goldens),
        "--k-extract", "8", "--K-value", "4", "--batch-size", "4",
        "--report", str(tmp_path / "report.json"),
        "--work-dir", str(tmp_path / "work")]
    with pytest.raises(SystemExit) as e:
        parity_ladder.main(ladder_args)
    assert e.value.code == 0
    report = json.loads((tmp_path / "report.json").read_text())
    by_name = {r["rung"]: r for r in report["rungs"]}
    for rung in ("convert_stage1", "convert_stage2", "stage1_val",
                 "topk_vs_reference", "stage2_val", "golden_submissions"):
        assert by_name[rung]["status"] == "pass", by_name[rung]
    assert by_name["expected_metrics"]["status"] == "skip"
    assert by_name["topk_vs_reference"]["identical"] is True

    # second run with --expected fed from the first run's own metrics
    expected = {k: v for k, v in by_name["stage1_val"].items()
                if k not in ("rung", "status")}
    exp_path = tmp_path / "expected.json"
    exp_path.write_text(json.dumps(expected))
    with pytest.raises(SystemExit) as e:
        parity_ladder.main(ladder_args + ["--expected", str(exp_path)])
    assert e.value.code == 0
    report2 = json.loads((tmp_path / "report.json").read_text())
    by_name2 = {r["rung"]: r for r in report2["rungs"]}
    assert by_name2["expected_metrics"]["status"] == "pass"

    # a wrong published number must FAIL the ladder (nonzero exit)
    expected_bad = dict(expected)
    first_key = next(iter(expected_bad))
    expected_bad[first_key] = expected_bad[first_key] + 5.0
    exp_path.write_text(json.dumps(expected_bad))
    with pytest.raises(SystemExit) as e:
        parity_ladder.main(ladder_args + ["--expected", str(exp_path)])
    assert e.value.code == 1


def test_enable_compilation_cache(tmp_path, monkeypatch):
    """enable_compilation_cache points JAX's persistent cache at the host
    dir (relay remote-compiles are the dominant CLI startup cost), honors
    the opt-out, and actually writes entries for fresh compiles."""
    from candidate_reranking_cir_tpu.runtime import host

    monkeypatch.setenv("CRC_NO_COMPILE_CACHE", "1")
    assert host.enable_compilation_cache(str(tmp_path / "off")) is None
    assert not (tmp_path / "off").exists()

    monkeypatch.delenv("CRC_NO_COMPILE_CACHE", raising=False)
    cache_dir = host.enable_compilation_cache(str(tmp_path / "xla"))
    try:
        assert cache_dir == str(tmp_path / "xla")
        assert jax.config.jax_compilation_cache_dir == cache_dir
        # an uncached shape must land an entry in the directory
        x = np.asarray(np.random.default_rng(0).normal(size=(17, 19)),
                       np.float32)
        jax.jit(lambda a: (a * 2.0).sum())(x).block_until_ready()
        assert any(Path(cache_dir).iterdir())
    finally:  # tmp_path is deleted later — don't leave jax pointed at it
        jax.config.update("jax_compilation_cache_dir", None)
        from jax._src import compilation_cache as _cc

        _cc.reset_cache()
