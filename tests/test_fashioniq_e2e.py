"""Fashion-IQ end-to-end: dataset parsing, stage-I eval per category,
top-k artifact, stage-II re-rank with the {dress} path convention."""
import json

import jax
import numpy as np
import pytest

from candidate_reranking_cir_tpu.config import (
    RerankerModelConfig,
    RetrievalModelConfig,
    TextEncoderConfig,
    ViTConfig,
)
from candidate_reranking_cir_tpu.data.datasets import FashionIQDataset
from candidate_reranking_cir_tpu.data.preprocessing import make_transform
from candidate_reranking_cir_tpu.data.topk_io import save_topk_file
from candidate_reranking_cir_tpu.models.blip_reranker import RerankerModel
from candidate_reranking_cir_tpu.models.blip_retrieval import RetrievalModel
from candidate_reranking_cir_tpu.models.tokenizer import (
    WordPieceTokenizer,
    build_test_vocab,
)
from candidate_reranking_cir_tpu.retrieval.validate_engine import (
    evaluate_fiq_stage1,
)
from candidate_reranking_cir_tpu.retrieval.validate2_engine import (
    evaluate_fiq_stage2,

)

pytestmark = pytest.mark.slow  # FIQ end-to-end pipeline

IMG = 32
VIT = ViTConfig(image_size=IMG, patch_size=8, hidden_size=24, num_layers=1,
                num_heads=2)
TEXT = TextEncoderConfig(vocab_size=256, hidden_size=24, num_layers=1,
                         num_heads=2, intermediate_size=48, encoder_width=24,
                         hidden_dropout=0.0, attention_dropout=0.0,
                         merge_mlp_from=1)


@pytest.fixture(scope="module")
def fiq_root(tmp_path_factory):
    import PIL.Image

    root = tmp_path_factory.mktemp("fiq")
    base = root / "fashionIQ_dataset"
    (base / "captions").mkdir(parents=True)
    (base / "image_splits").mkdir(parents=True)
    (base / "images").mkdir()

    rng = np.random.default_rng(0)
    for dress in ("dress", "shirt"):
        names = [f"{dress}{i}" for i in range(8)]
        for n in names:
            PIL.Image.fromarray(
                rng.integers(0, 255, size=(40, 30, 3), dtype=np.uint8)
            ).save(base / "images" / f"{n}.jpg")
        caps = [{"candidate": names[q], "target": names[(q + 2) % 8],
                 "captions": [f"is more {dress}", f"has longer sleeves {q}"]}
                for q in range(5)]
        with open(base / "captions" / f"cap.{dress}.val.json", "w") as f:
            json.dump(caps, f)
        with open(base / "image_splits" / f"split.{dress}.val.json",
                  "w") as f:
            json.dump(names, f)
    return root


@pytest.fixture(scope="module")
def models():
    s1 = RetrievalModel(RetrievalModelConfig(vit=VIT, text=TEXT, embed_dim=16,
                                             text_len=12))
    s2 = RerankerModel(RerankerModelConfig(vit=VIT, text=TEXT, text_len=12))
    imgs = np.zeros((2, IMG, IMG, 3), np.float32)
    ids = np.ones((2, 12), np.int32)
    z = np.zeros((2, 12, 24), np.float32)
    return (s1, s1.init(jax.random.key(0), imgs, ids, ids),
            s2, s2.init(jax.random.key(1), imgs, ids, ids, z))


def test_fiq_dataset_and_stage1(fiq_root, models, tmp_path):
    s1, s1p, _, _ = models
    transform = make_transform("squarepad", IMG)  # exercises SquarePad too
    tok = WordPieceTokenizer(build_test_vocab())
    tok.overflow = "truncate"  # tiny text bucket by design

    classic = FashionIQDataset(fiq_root, "val", ["dress"], "classic",
                               transform)
    relative = FashionIQDataset(fiq_root, "val", ["dress"], "relative",
                                transform)
    assert len(classic) == 8 and len(relative) == 5
    s = relative[0]
    assert s["captions"] == ["is more dress", "has longer sleeves 0"]

    result, payload = evaluate_fiq_stage1(
        s1, s1p, classic, relative, tok, text_len=12, batch_size=4,
        save_topk_k=6, dress_types=["dress"])
    assert 0 <= result.metrics["recall_at10"] <= 100
    assert payload["dress_types"] == "dress"

    # multi-category concatenation
    both = FashionIQDataset(fiq_root, "val", ["dress", "shirt"], "relative",
                            transform)
    assert len(both) == 10


def test_fiq_stage2_with_dress_placeholder(fiq_root, models, tmp_path):
    s1, s1p, s2, s2p = models
    transform = make_transform("targetpad", IMG, 1.25)
    tok = WordPieceTokenizer(build_test_vocab())
    tok.overflow = "truncate"  # tiny text bucket by design

    for dress in ("dress", "shirt"):
        classic = FashionIQDataset(fiq_root, "val", [dress], "classic",
                                   transform)
        relative = FashionIQDataset(fiq_root, "val", [dress], "relative",
                                    transform)
        _, payload = evaluate_fiq_stage1(
            s1, s1p, classic, relative, tok, text_len=12, batch_size=4,
            save_topk_k=6, dress_types=[dress])
        save_topk_file(tmp_path / f"fiq_top_{dress}.npz", payload)

    mets = evaluate_fiq_stage2(
        s1, s1p, s2, s2p, tok, data_root=fiq_root, transform=transform,
        top_k_path=str(tmp_path / "fiq_top_{dress}.npz"), k=4, text_len=12,
        dress_types=("dress", "shirt"), q_batch=4, batch_size=4)
    assert "dress_recall_at10" in mets and "shirt_recall_at10" in mets
    assert mets["average_recall"] == pytest.approx(
        (mets["average_recall10"] + mets["average_recall50"]) / 2)
