import numpy as np
import pytest

from candidate_reranking_cir_tpu.retrieval.metrics import (
    cirr_metrics,
    cirr_ranking,
    fiq_metrics,
    fiq_ranking,
    reranked_labels,
)


def test_fiq_recall_closed_form():
    # 4 queries, 6 index images; targets placed at known ranks
    index = [f"im{i}" for i in range(6)]
    sorted_names = np.array([
        ["im0", "im1", "im2", "im3", "im4", "im5"],
        ["im1", "im0", "im2", "im3", "im4", "im5"],
        ["im2", "im3", "im0", "im1", "im4", "im5"],
        ["im5", "im4", "im3", "im2", "im1", "im0"],
    ], dtype=object)
    targets = ["im0", "im0", "im0", "im0"]  # ranks 1, 2, 3, 6
    res = fiq_ranking(sorted_names, targets)
    assert res.recall_at(1) == pytest.approx(25.0)
    assert res.recall_at(2) == pytest.approx(50.0)
    assert res.recall_at(3) == pytest.approx(75.0)
    assert res.recall_at(6) == pytest.approx(100.0)


def test_fiq_one_hot_assert():
    sorted_names = np.array([["a", "b", "a"]], dtype=object)
    with pytest.raises(AssertionError):
        fiq_ranking(sorted_names, ["a"])


def test_cirr_reference_removal_and_groups():
    # corpus of 6; query's reference image must be dropped from its ranking
    sorted_names = np.array([
        ["ref", "t", "g1", "g2", "g3", "g4"],
        ["g1", "ref", "g2", "t", "g3", "g4"],
    ], dtype=object)
    refs = ["ref", "ref"]
    targets = ["t", "t"]
    groups = [["ref", "t", "g1", "g2", "g3", "g4"]] * 2
    res = cirr_ranking(sorted_names, refs, targets, groups)
    # after removal: row0 = [t g1 g2 g3 g4], row1 = [g1 g2 t g3 g4]
    assert res.sorted_index_names.shape == (2, 5)
    assert res.recall_at(1) == pytest.approx(50.0)
    assert res.recall_at(3) == pytest.approx(100.0)
    # subset = group minus reference = 5 members, all present here
    assert res.group_labels.shape == (2, 5)
    assert res.subset_recall_at(1) == pytest.approx(50.0)
    assert res.subset_recall_at(3) == pytest.approx(100.0)

    m = cirr_metrics(res)
    assert m["mean_r5_rs1"] == pytest.approx(
        (m["recall_at5"] + m["group_recall_at1"]) / 2)


def test_reranked_labels_take_along_axis():
    labels = np.array([[False, True, False], [True, False, False]])
    order = np.array([[1, 0, 2], [2, 1, 0]])
    out = reranked_labels(labels, order)
    assert out.tolist() == [[True, False, False], [False, False, True]]
