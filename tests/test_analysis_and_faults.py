"""Analysis-script math and loader fault injection.

- rank_delta_by_initial_index: closed-form checks (identity order -> zero
  delta; full reversal -> antisymmetric deltas), plus the CLI writes output.
- fault injection: a corrupted image mid-corpus with skip_errors=True is
  dropped and backfilled by the BatchLoader, so every batch stays full and
  training-shaped (SURVEY.md section 5: the reference shrinks the batch,
  utils.py:99-106; XLA needs fixed shapes).
"""
import json

import numpy as np
import pytest

from analysis.plot_ranking_delta import main as plot_main
from analysis.plot_ranking_delta import rank_delta_by_initial_index


def test_rank_delta_identity_and_reversal():
    n, k = 7, 6
    identity = np.tile(np.arange(k), (n, 1))
    np.testing.assert_array_equal(
        rank_delta_by_initial_index(identity), np.zeros(k))

    reversal = np.tile(np.arange(k)[::-1], (n, 1))
    # initial position i moves to position k-1-i: delta = i - (k-1-i)
    expect = np.arange(k) - (k - 1 - np.arange(k))
    np.testing.assert_array_equal(
        rank_delta_by_initial_index(reversal), expect)

    # promotion of the last candidate to the front in every row
    order = np.tile(np.r_[k - 1, np.arange(k - 1)], (n, 1))
    delta = rank_delta_by_initial_index(order)
    assert delta[k - 1] == k - 1      # promoted all the way up
    assert (delta[: k - 1] == -1).all()  # everyone else demoted one slot


def test_plot_cli_writes_output(tmp_path, capsys):
    rng = np.random.default_rng(0)
    order = np.stack([rng.permutation(5) for _ in range(8)])
    np.savez(tmp_path / "order.npz", order=order)
    out = tmp_path / "fig8.png"
    plot_main(["--order", str(tmp_path / "order.npz"), "--out", str(out)])
    text = capsys.readouterr().out
    # either the figure was written or matplotlib is absent and deltas print
    assert out.exists() or "deltas" in text


def test_corrupt_image_dropped_and_backfilled(tmp_path):
    import PIL.Image

    from candidate_reranking_cir_tpu.data.datasets import CIRRDataset
    from candidate_reranking_cir_tpu.data.loader import BatchLoader
    from candidate_reranking_cir_tpu.data.preprocessing import make_transform

    base = tmp_path / "cirr_dataset"
    (base / "cirr" / "captions").mkdir(parents=True)
    (base / "cirr" / "image_splits").mkdir(parents=True)
    (base / "img").mkdir()
    rng = np.random.default_rng(0)
    names = [f"im{i}" for i in range(10)]
    relpath = {}
    for nm in names:
        PIL.Image.fromarray(
            rng.integers(0, 255, size=(36, 40, 3), dtype=np.uint8)
        ).save(base / "img" / f"{nm}.jpg")
        relpath[nm] = f"img/{nm}.jpg"
    # corrupt one image on disk (truncated JPEG)
    bad = base / "img" / "im4.jpg"
    bad.write_bytes(bad.read_bytes()[:60])

    triplets = [{"pairid": q, "reference": names[q],
                 "target_hard": names[(q + 2) % 10],
                 "caption": f"a red dress {q}",
                 "img_set": {"members": [names[q], names[(q + 2) % 10]]}}
                for q in range(8)]
    with open(base / "cirr" / "captions" / "cap.rc2.train.json", "w") as f:
        json.dump(triplets, f)
    with open(base / "cirr" / "image_splits" / "split.rc2.train.json",
              "w") as f:
        json.dump(relpath, f)

    transform = make_transform("targetpad", 32, 1.25)

    # default policy: fail loudly on the corrupt reference image
    strict = CIRRDataset(tmp_path, "train", "relative", transform)
    with pytest.raises(Exception):
        for i in range(len(strict)):
            strict[i]

    # skip_errors: the corrupt row returns None...
    ds = CIRRDataset(tmp_path, "train", "relative", transform,
                     skip_errors=True)
    assert any(ds[i] is None for i in range(len(ds)))

    # ...and the loader backfills so every batch stays full and fixed-shape
    loader = BatchLoader(ds, 4, shuffle=False, workers=2, drop_last=True)
    batches = list(iter(loader))
    assert len(batches) >= 1
    seen = []
    for b in batches:
        assert b["reference_image"].shape == (4, 32, 32, 3)
        seen += b["pair_id"] if "pair_id" in b else []
    # query 4 (corrupt reference im4) never appears
    all_caps = [c for b in batches for c in b["caption"]]
    assert "a red dress 4" not in all_caps
