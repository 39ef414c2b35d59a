"""Self-contained quickstart: generates a synthetic CIRR-format dataset and
drives the ENTIRE two-stage pipeline with tiny models —

  stage-I training (1 epoch) -> top-k extraction -> stage-II training
  (1 epoch) -> stage-II re-rank validation -> test1 submission JSONs

No downloads, no real data, finishes in a few minutes on CPU:

  python -m candidate_reranking_cir_tpu.demo --workdir /tmp/cir_demo
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

MODEL_CONFIG = {
    "vit": {"image_size": 32, "patch_size": 8, "hidden_size": 24,
            "num_layers": 2, "num_heads": 4},
    "text": {"vocab_size": 256, "hidden_size": 24, "num_layers": 2,
             "num_heads": 4, "intermediate_size": 48, "encoder_width": 24,
             "merge_mlp_from": 1},
    "embed_dim": 16,
}

CAPTION_BANK = [
    "make the dress red with short sleeves",
    "same shirt but blue and striped",
    "a dog instead of a cat on the image",
    "longer and darker with a belt",
    "brighter background and two people",
    "the same image but zoomed out",
]


def build_dataset(root: Path, n_images=16, n_train=12, n_val=6, n_test=6):
    import PIL.Image

    base = root / "cirr_dataset"
    (base / "cirr" / "captions").mkdir(parents=True, exist_ok=True)
    (base / "cirr" / "image_splits").mkdir(parents=True, exist_ok=True)
    (base / "img").mkdir(exist_ok=True)

    rng = np.random.default_rng(0)
    names = [f"im{i}" for i in range(n_images)]
    relpath = {}
    for i, n in enumerate(names):
        arr = rng.integers(0, 255, size=(40 + i % 7, 30 + i % 11, 3),
                           dtype=np.uint8)
        PIL.Image.fromarray(arr).save(base / "img" / f"{n}.jpg", quality=90)
        relpath[n] = f"img/{n}.jpg"

    def triplets(count, split):
        out = []
        for q in range(count):
            ref, tgt = names[q % n_images], names[(q + 5) % n_images]
            members = [ref, tgt] + [names[(q + 7 + j) % n_images]
                                    for j in range(4)]
            t = {"pairid": q, "reference": ref,
                 "caption": CAPTION_BANK[q % len(CAPTION_BANK)],
                 "img_set": {"members": members}}
            if split != "test1":
                t["target_hard"] = tgt
            out.append(t)
        return out

    for split, count in (("train", n_train), ("val", n_val),
                         ("test1", n_test)):
        with open(base / "cirr" / "captions" / f"cap.rc2.{split}.json",
                  "w") as f:
            json.dump(triplets(count, split), f)
        with open(base / "cirr" / "image_splits" / f"split.rc2.{split}.json",
                  "w") as f:
            json.dump(relpath, f)
    (root / "model_config.json").write_text(json.dumps(MODEL_CONFIG))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", type=str, default="/tmp/cir_demo")
    args = parser.parse_args(argv)
    root = Path(args.workdir)
    root.mkdir(parents=True, exist_ok=True)

    print("== generating synthetic CIRR dataset ==")
    build_dataset(root)

    # no vocab file -> the clearly-marked test tokenizer (near char-level),
    # where these captions need ~30 wordpieces; truncation is fine for a
    # synthetic demo (production runs use the real vocab + the default
    # fail-loud overflow policy)
    common = ["--dataset", "CIRR", "--data-root", str(root),
              "--image-size", "32", "--text-len", "12", "--no-bf16",
              "--text-overflow", "truncate",
              "--model-config", str(root / "model_config.json")]

    from candidate_reranking_cir_tpu.cli import (
        cirr_test_submission,
        cirr_test_submission_stage2,
        stage1_train,
        stage2_train,
        validate,
        validate_stage2,
    )

    print("\n== stage-I training (1 epoch) ==")
    stage1_train.main(common + [
        "--experiment-name", "demo_s1", "--output-dir", str(root / "models"),
        "--num-epochs", "1", "--batch-size", "4", "--blip-max-epoch", "2"])
    s1 = str(root / "models" / "demo_s1" / "saved_models" / "blip_mean")

    print("\n== stage-I validation + top-k extraction ==")
    topk = str(root / "cirr_top_8_val.npz")
    validate.main(common + ["--stage1-path", s1, "--save-topk", "--k", "8",
                            "--topk-out", topk, "--batch-size", "4"])

    print("\n== stage-II training (1 epoch) ==")
    stage2_train.main(common + [
        "--experiment-name", "demo_s2", "--output-dir", str(root / "models"),
        "--stage1-path", s1, "--top-k-path", topk, "--K-value", "4",
        "--num-epochs", "1", "--batch-size", "4", "--blip-max-epoch", "2"])
    s2 = str(root / "models" / "demo_s2" / "saved_models" / "blip_mean")

    print("\n== stage-II re-rank validation ==")
    validate_stage2.main(common + [
        "--stage1-path", s1, "--stage2-path", s2,
        "--top-k-path", topk, "--K-value", "4", "--q-batch", "4"])

    print("\n== test1 submissions ==")
    t1_topk = str(root / "cirr_top_4_test1.npz")
    cirr_test_submission.main(common + [
        "--stage1-path", s1, "--submission-name", "demo",
        "--out-dir", str(root / "submission"), "--save-topk", "--k", "4",
        "--topk-out", t1_topk, "--batch-size", "4"])
    cirr_test_submission_stage2.main(common + [
        "--stage1-path", s1, "--stage2-path", s2,
        "--top-k-path", t1_topk, "--K-value", "4",
        "--submission-name", "demo_stage2",
        "--out-dir", str(root / "submission"), "--q-batch", "4",
        "--batch-size", "4"])

    print("\n== online serving (in-process) ==")
    from candidate_reranking_cir_tpu.cli import serve as serve_cli

    serve_args = serve_cli.parse_args(common + [
        "--stage1-path", s1, "--stage2-path", s2, "--split", "val",
        "--rerank-k", "4", "--q-pad", "2", "--batch-size", "4"])
    engine = serve_cli.make_engine(serve_args)
    engine.warmup()
    req = serve_cli.request_from_json(engine, {
        "caption": CAPTION_BANK[0],
        "reference": engine.index.names[0], "k": 5})
    res = engine.handle([req])[0]
    print(f"query: {CAPTION_BANK[0]!r} (reference "
          f"{engine.index.names[0]})")
    print(f"  -> top-{len(res.ranking)}: {res.ranking} "
          f"(stage-II re-scored head: {res.reranked})")

    print(f"\ndemo complete — artifacts under {root}")


if __name__ == "__main__":
    main()
