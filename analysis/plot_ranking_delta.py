"""Re-ranking analysis: rank delta vs initial stage-I index (paper Fig. 8).

Script equivalent of the reference's analysis notebook
(analysis_plot/plot_ranking_delta_vs_init_index.ipynb). Two modes:

1. **labels mode** (the notebook's own math, works on the PUBLISHED
   artifacts): from a stage-I top-k labels file (`cirr_top_200_val.pt`'s
   'labels' [N, K] one-hot of the target's initial rank — or this repo's
   topk .npz) and a stage-II labels file
   (`analysis_plot/cirr_stageII_labels_val.pt`, a bare [N, K] one-hot of
   the target's re-ranked position), compute the mean target-rank delta per
   initial rank and the brings-forward summary the notebook prints.

     python -m analysis.plot_ranking_delta \
         --labels-stage1 cirr_top_200_val.pt \
         --labels-stage2 analysis_plot/cirr_stageII_labels_val.pt

   Alignment note: the notebook pairs the two files' .nonzero() lists by
   list position, which silently misaligns every query after the first row
   whose target fell outside one file's top-K. This script aligns by query
   row and drops only the queries absent from either file (count reported).

2. **order mode** (this repo's pipeline output): from the stage-II
   descending-score `order` array emitted by retrieval.rerank (saved as
   .npz), the mean signed rank change per initial position over ALL
   candidates (not just targets).

     python -m analysis.plot_ranking_delta --order rerank_order.npz
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def rank_delta_by_initial_index(order: np.ndarray) -> np.ndarray:
    """order: [N, K] — order[q, new_pos] = initial index of the candidate now
    at new_pos. Returns [K] mean delta (initial_pos - new_pos) per initial
    position; positive = promoted by the re-ranker."""
    n, k = order.shape
    new_pos_of_initial = np.empty_like(order)
    rows = np.arange(n)[:, None]
    new_pos_of_initial[rows, order] = np.arange(k)[None, :]
    deltas = np.arange(k)[None, :] - new_pos_of_initial
    return deltas.mean(axis=0)


def load_labels(path: str | Path) -> np.ndarray:
    """[N, K] one-hot target-position matrix from any supported container:
    the reference's .pt files (a bare tensor, or a dict with 'labels' as in
    cirr_top_200_val.pt) or this repo's topk .npz ('labels' key)."""
    path = Path(path)
    if path.suffix == ".npz":
        with np.load(path, allow_pickle=False) as z:
            return np.asarray(z["labels"])
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        obj = obj["labels"]
    arr = np.asarray(obj.numpy() if hasattr(obj, "numpy") else obj)
    if arr.ndim != 2:
        raise ValueError(f"{path}: expected [N, K] labels, got {arr.shape}")
    return arr


def target_positions(labels: np.ndarray) -> np.ndarray:
    """[N] target rank per query; -1 where the target is outside the top-K
    (all-zero row)."""
    pos = labels.argmax(axis=1)
    pos[labels.sum(axis=1) == 0] = -1
    return pos


def target_delta_by_initial_index(pos1: np.ndarray, pos2: np.ndarray,
                                  k: int) -> tuple[np.ndarray, np.ndarray,
                                                   dict]:
    """The notebook's Fig-8 quantity with row-correct alignment: for each
    initial rank i, the mean (i - reranked_rank) over queries whose target
    initially sat at i. Returns (deltas[k], counts[k], summary)."""
    both = (pos1 >= 0) & (pos2 >= 0)
    p1, p2 = pos1[both], pos2[both]
    deltas = np.zeros(k)
    counts = np.zeros(k, np.int64)
    for i in range(k):
        m = p1 == i
        counts[i] = int(m.sum())
        if counts[i]:
            deltas[i] = i - p2[m].mean()
    summary = {
        "queries": int(len(pos1)),
        "aligned": int(both.sum()),
        "dropped": int(len(pos1) - both.sum()),
        "stage1_avg_rank": float(p1.mean()) if len(p1) else float("nan"),
        "stage2_avg_rank": float(p2.mean()) if len(p2) else float("nan"),
        "brings_forward": float(p1.mean() - p2.mean()) if len(p1)
        else float("nan"),
    }
    return deltas, counts, summary


def _plot(x, y, out, xlabel, ylabel, scatter=False):
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib unavailable; values:")
        for i, d in zip(x, y):
            print(f"rank {i:3d}: {d:+.2f}")
        return
    fig, ax = plt.subplots(figsize=(6, 4))
    if scatter:
        ax.scatter(x, y, marker=".")
    else:
        ax.bar(x, y)
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.axhline(0, color="k", lw=0.5)
    fig.tight_layout()
    fig.savefig(out, dpi=150)
    print(f"saved {out}")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--order",
                        help=".npz with 'order' [N, K] from retrieval.rerank")
    parser.add_argument("--labels-stage1",
                        help="stage-I top-k labels: the reference's "
                             "cirr_top_200_val.pt / fiq_top_200_val_DTYPE.pt "
                             "or this repo's topk .npz")
    parser.add_argument("--labels-stage2",
                        help="stage-II re-ranked labels: the reference's "
                             "analysis_plot/*_stageII_labels_val*.pt")
    parser.add_argument("--out", default="ranking_delta.png")
    args = parser.parse_args(argv)

    if args.labels_stage1 or args.labels_stage2:
        if not (args.labels_stage1 and args.labels_stage2):
            parser.error("labels mode needs BOTH --labels-stage1 and "
                         "--labels-stage2")
        l1 = load_labels(args.labels_stage1)
        l2 = load_labels(args.labels_stage2)
        if l1.shape[0] != l2.shape[0]:
            parser.error(f"query-count mismatch: {l1.shape} vs {l2.shape}")
        k = min(l1.shape[1], l2.shape[1])
        deltas, counts, summary = target_delta_by_initial_index(
            target_positions(l1), target_positions(l2), k)
        for key, val in summary.items():
            print(f"{key}: {val}")
        _plot(np.arange(k), deltas, args.out, "initial stage-I target rank",
              "mean target rank delta after re-ranking")
        return

    if not args.order:
        parser.error("pass --order, or --labels-stage1 + --labels-stage2")
    with np.load(args.order) as z:
        order = z["order"]
    delta = rank_delta_by_initial_index(order)
    _plot(np.arange(len(delta)), delta, args.out, "initial stage-I rank",
          "mean rank delta after re-ranking")


if __name__ == "__main__":
    main()
