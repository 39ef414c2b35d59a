"""Phase breakdown of the stage-I eval bench line: index embed vs query
fusion vs ranking, each synced by a D2H fetch."""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from bench import (
    _stage1_models, _BenchTokenizer, caption_lengths, measure_rtt,
    rand_params)
from candidate_reranking_cir_tpu.retrieval.validate_engine import (
    make_embed_scan, make_stage1_fns, predict_queries, ranked_slices)


def main():
    rtt = measure_rtt()
    model, cfg = _stage1_models(train=False)
    L = cfg.text_len
    im = cfg.vit.image_size
    n_idx, n_q, embed_bs, q_batch = 2297, 4181, 32, 256
    if len(sys.argv) > 2:
        embed_bs, q_batch = int(sys.argv[1]), int(sys.argv[2])

    ids0 = jnp.ones((2, L), jnp.int32)
    params = rand_params(
        jax.eval_shape(lambda: model.init(
            jax.random.key(0), jnp.zeros((2, im, im, 3)), ids0, ids0)),
        jax.random.key(1))
    _, fuse = make_stage1_fns(model, params)
    embed_scan = make_embed_scan(model, params)

    n_batches = -(-n_idx // embed_bs)
    imgs = jax.random.normal(jax.random.key(2),
                             (n_batches, embed_bs, im, im, 3),
                             jnp.float32) * 0.3
    lengths = caption_lengths(n_q, L)
    index_names = [f"im{i}" for i in range(n_idx)]
    rng = np.random.default_rng(3)
    ref_idx = rng.integers(0, n_idx, size=n_q)
    ref_names = [index_names[i] for i in ref_idx]
    tok = _BenchTokenizer(lengths)
    captions = [f"caption {q}" for q in range(n_q)]
    ent = np.concatenate([rng.integers(0, n_idx, size=(n_q, 1)),
                          ref_idx[:, None],
                          rng.integers(0, n_idx, size=(n_q, 5))],
                         axis=1).astype(np.int32)

    def phases():
        t0 = time.perf_counter()
        feats, pooled = embed_scan(imgs)
        float(jnp.sum(pooled[0, 0]))  # sync
        t1 = time.perf_counter()
        index_feats = feats.reshape(-1, *feats.shape[2:])[:n_idx]
        pooled_index = pooled.reshape(-1, pooled.shape[-1])[:n_idx]
        pred = predict_queries(fuse, tok, captions, ref_names, index_feats,
                               index_names, L, q_batch=q_batch)
        float(jnp.sum(pred[0]))  # sync (pred stays on device)
        t2 = time.perf_counter()
        out = ranked_slices(pred, pooled_index, 501, ent)
        _ = [np.asarray(o) for o in out]
        t3 = time.perf_counter()
        return t1 - t0, t2 - t1, t3 - t2

    phases()  # warm
    e, f, r = phases()
    print(f"embed {e:.3f}s ({n_idx/e:.0f} img/s)  fusion {f:.3f}s "
          f"({n_q/f:.0f} q/s)  ranking+slices {r:.3f}s", flush=True)
    e, f, r = phases()
    print(f"embed {e:.3f}s ({n_idx/e:.0f} img/s)  fusion {f:.3f}s "
          f"({n_q/f:.0f} q/s)  ranking+slices {r:.3f}s", flush=True)


if __name__ == "__main__":
    main()
