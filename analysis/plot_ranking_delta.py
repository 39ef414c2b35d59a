"""Re-ranking analysis: rank delta vs initial stage-I index (paper Fig. 8).

Script equivalent of the reference's analysis notebook
(analysis_plot/plot_ranking_delta_vs_init_index.ipynb): for each initial
stage-I rank i (position in the top-K list), the average signed rank change
after stage-II re-ranking, computed from a stage-I top-k file and the
stage-II descending-score order (the `order` array emitted by
retrieval.rerank, saved as .npz with key 'order', or a saved labels file).

Usage:
  python -m analysis.plot_ranking_delta --topk cirr_top_50_val.npz \
      --order rerank_order.npz --out fig8.png
"""
from __future__ import annotations

import argparse

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


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--order", required=True,
                        help=".npz with 'order' [N, K] from retrieval.rerank")
    parser.add_argument("--out", default="ranking_delta.png")
    args = parser.parse_args(argv)

    with np.load(args.order) as z:
        order = z["order"]
    delta = rank_delta_by_initial_index(order)

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6, 4))
        ax.bar(np.arange(len(delta)), delta)
        ax.set_xlabel("initial stage-I rank")
        ax.set_ylabel("mean rank delta after re-ranking")
        ax.axhline(0, color="k", lw=0.5)
        fig.tight_layout()
        fig.savefig(args.out, dpi=150)
        print(f"saved {args.out}")
    except ImportError:
        print("matplotlib unavailable; deltas:")
        for i, d in enumerate(delta):
            print(f"rank {i:3d}: {d:+.2f}")


if __name__ == "__main__":
    main()
