"""Differential parity: the reference's OWN modules vs this framework.

Executes /root/reference/src's vit.py (via faithful timm-0.4.12 stubs),
med.py, nlvr_encoder.py and the blip_stage{1,2} fusion/embed wrappers on
CPU torch at the FULL production config
(12L/768H, 577 image tokens, vocab 30524) with random-seeded weights, pushes
their state dicts through runtime/convert.py, and asserts element-level
agreement (max-abs <= 1e-4, cosine >= 0.9999). The strongest correctness
statement available without the published checkpoints; also runs as rung 0
of cli/parity_ladder.py.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")

from candidate_reranking_cir_tpu.runtime import reference_diff

pytestmark = [
    pytest.mark.skipif(not reference_diff.reference_available(),
                       reason="reference sources not present"),
    # full-config differentials vs the reference torch code
    pytest.mark.slow,
]


@pytest.fixture(scope="module")
def ref():
    return reference_diff.load_reference()


def _assert(rec):
    assert rec["pass"], rec
    # the pass flag already enforces these; restate for a readable failure
    assert rec["max_abs"] <= 5e-4 and rec["cosine"] >= 0.9999, rec


def test_med_multimodal_matches_reference(ref):
    _assert(reference_diff.check_med_multimodal(ref))


def test_dual_stream_from_single_checkpoint_matches_reference(ref):
    """convert_dual_encoder's duplication of a single-stream MED dict must
    reproduce the reference's own duplication contract + merge schedule
    (blip_stage2.py:160-187, nlvr_encoder.py:286)."""
    _assert(reference_diff.check_dual_from_single(ref))


def test_dual_stream_twin_checkpoint_matches_reference(ref):
    """Native twin weights (asymmetric streams, real merge_layer) — the
    trained stage-II checkpoint path."""
    _assert(reference_diff.check_dual_twin(ref))


def test_stage1_fusion_matches_reference(ref):
    recs = reference_diff.check_stage1_fusion(ref)
    assert [r["check"] for r in recs] == [
        "stage1_train_logits", "stage1_eval_features", "stage1_raw_zt"]
    for rec in recs:
        _assert(rec)


def test_stage2_fusion_matches_reference(ref):
    recs = reference_diff.check_stage2_fusion(ref)
    assert [r["check"] for r in recs] == [
        "stage2_train_grid", "stage2_val_scores"]
    for rec in recs:
        _assert(rec)


def test_vit_matches_reference(ref):
    """The reference's own vit.py (VisionTransformer as create_vit builds
    it, blip.py:194-209) executed end to end via faithful timm-0.4.12
    stubs — closes the HF-proxy link: every stage-I/II module is now
    differentially anchored to reference code."""
    _assert(reference_diff.check_vit(ref))


def test_img_embed_matches_reference(ref):
    """blip_stage1.img_embed (blip_stage1.py:48-64): pixels -> raw [B,577,768]
    + pooled normalized 256-d, through the real reference ViT."""
    for rec in reference_diff.check_img_embed(ref):
        _assert(rec)
