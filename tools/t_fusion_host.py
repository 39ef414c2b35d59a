"""Host-side share of the fusion phase: time predict_queries' pure-Python
scheduling (tokenize, bucket, image-major chunking, batch forming) with NO
device dispatch, at CIRR-val scale. Decides whether the fusion phase's
device-idle gap is host-build time or launch latency."""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

from bench import _BenchTokenizer, caption_lengths
from candidate_reranking_cir_tpu.retrieval.rerank import resolve_l_buckets


def main():
    n_idx, n_q, q_batch, L = 2297, 4181, 256, 32
    lengths = caption_lengths(n_q, L)
    rng = np.random.default_rng(3)
    ref_idx = rng.integers(0, n_idx, size=n_q).astype(np.int32)
    tok = _BenchTokenizer(lengths)
    captions = [f"caption {q}" for q in range(n_q)]

    for _ in range(3):
        t0 = time.perf_counter()
        ids_all, mask_all = tok.encode(captions, L, set_enc_token=True)
        t_tok = time.perf_counter()

        lens = mask_all.sum(axis=1)
        lbs = resolve_l_buckets("auto", lens, L)
        bucket_of = np.asarray([next(b for b in lbs if b >= ln)
                                for ln in lens])
        group_sizes = [8, 4, 2]
        by_img = {}
        for row, r in enumerate(ref_idx):
            by_img.setdefault(int(r), []).append(row)
        chunks, leftover = {}, []
        for r, rows in by_img.items():
            rows.sort(key=lambda i: bucket_of[i])
            i, c = 0, len(rows)
            for q in group_sizes:
                while c >= q:
                    chunks.setdefault(q, []).append((r, rows[i:i + q]))
                    i += q
                    c -= q
            leftover.extend(rows[i:])
        singles = np.asarray(sorted(leftover, key=lambda i: bucket_of[i]),
                             np.int64)
        pending = {}
        for q, chs in sorted(chunks.items(), reverse=True):
            chs.sort(key=lambda ch: int(bucket_of[ch[1]].max()))
            g = max(q_batch // q, 1)
            for start in range(0, len(chs), g):
                batch = chs[start:start + g]
                count = len(batch) * q
                if len(batch) < g:
                    batch = batch + [batch[0]] * (g - len(batch))
                rows = np.asarray([i for _, ch in batch for i in ch],
                                  np.int64)
                refs_rows = np.asarray([r for r, _ in batch], np.int32)
                width = int(bucket_of[rows[:count]].max())
                pending.setdefault((q, width), []).append((rows, refs_rows))
        for start in range(0, len(singles), q_batch):
            rows = singles[start:start + q_batch]
            if len(rows) < q_batch:
                rows = np.concatenate(
                    [rows, np.repeat(rows[:1], q_batch - len(rows))])
            pending.setdefault((1, int(bucket_of[rows].max())),
                               []).append((rows, ref_idx[rows]))
        t_build = time.perf_counter()

        # the np work flush_pending does per scan group (gathers + stacks)
        n_groups, n_rows = 0, 0
        for (q, width), batches in pending.items():
            i, nb = 0, len(batches)
            while nb - i >= 2:
                s = 8 if nb - i >= 8 else 2
                chunk = batches[i:i + s]
                rows_m = np.stack([c[0] for c in chunk])
                _ = np.stack([c[1] for c in chunk])
                _ = ids_all[rows_m][..., :width]
                _ = mask_all[rows_m][..., :width]
                n_rows += len(rows_m.reshape(-1).tolist())
                n_groups += 1
                i += s
            n_groups += nb - i
        t_flush = time.perf_counter()
        print(f"tokenize {t_tok-t0:.3f}s  build {t_build-t_tok:.3f}s  "
              f"flush-np {t_flush-t_build:.3f}s  "
              f"({n_groups} launches, {n_rows} scanned rows)", flush=True)


if __name__ == "__main__":
    main()
