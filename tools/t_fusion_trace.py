"""Trace the ENTIRE stage-I eval fusion phase (predict_queries, image-major
+ scan dispatch) at CIRR-val scale: aggregate TPU op time vs wall-clock
(device-idle share) and the top ops. Companion to t_s1eval_phases.py."""
import sys

sys.path.insert(0, "/root/repo")
import glob
import gzip
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from bench import (
    _stage1_models, _BenchTokenizer, caption_lengths, measure_rtt,
    rand_params)
from candidate_reranking_cir_tpu.retrieval.validate_engine import (
    make_stage1_fns, predict_queries)


def main():
    measure_rtt()
    model, cfg = _stage1_models(train=False)
    L = cfg.text_len
    im = cfg.vit.image_size
    n_idx, n_q, q_batch = 2297, 4181, 128
    if len(sys.argv) > 1:
        q_batch = int(sys.argv[1])

    ids0 = jnp.ones((2, L), jnp.int32)
    params = rand_params(
        jax.eval_shape(lambda: model.init(
            jax.random.key(0), jnp.zeros((2, im, im, 3)), ids0, ids0)),
        jax.random.key(1))
    _, fuse = make_stage1_fns(model, params)

    rng = np.random.default_rng(3)
    index_feats = jnp.asarray(rng.normal(size=(n_idx, 577, 768)) * 0.05,
                              jnp.bfloat16)
    lengths = caption_lengths(n_q, L)
    index_names = [f"im{i}" for i in range(n_idx)]
    ref_idx = rng.integers(0, n_idx, size=n_q)
    ref_names = [index_names[i] for i in ref_idx]
    tok = _BenchTokenizer(lengths)
    captions = [f"caption {q}" for q in range(n_q)]

    def run():
        t0 = time.perf_counter()
        pred = predict_queries(fuse, tok, captions, ref_names, index_feats,
                               index_names, L, q_batch=q_batch)
        float(jnp.sum(pred[0]))
        return time.perf_counter() - t0

    run()  # compile
    wall = run()
    print(f"q_batch={q_batch} fusion wall {wall:.3f}s ({n_q/wall:.0f} q/s)",
          flush=True)

    os.system("rm -rf /tmp/jtrace_fusion")
    with jax.profiler.trace("/tmp/jtrace_fusion"):
        wall_t = run()
    files = glob.glob("/tmp/jtrace_fusion/**/*.trace.json.gz", recursive=True)
    for f in files:
        with gzip.open(f) as fh:
            data = json.load(fh)
        pids = {}
        for e in data.get("traceEvents", []):
            if e.get("ph") == "M" and e.get("name") == "process_name":
                pids[e["pid"]] = e["args"].get("name", "")
        agg, iv = {}, []
        for e in data.get("traceEvents", []):
            if e.get("ph") != "X" or not e.get("dur"):
                continue
            if "TPU" not in pids.get(e.get("pid"), "?"):
                continue
            name = e["name"][:70]
            agg[name] = agg.get(name, 0) + e["dur"]
            iv.append((e["ts"], e["ts"] + e["dur"]))
        # exact busy time: union of event intervals (events nest, so a
        # plain sum double-counts)
        iv.sort()
        busy, cur_s, cur_e = 0.0, None, None
        for s, t in iv:
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    busy += cur_e - cur_s
                cur_s, cur_e = s, t
            else:
                cur_e = max(cur_e, t)
        if cur_e is not None:
            busy += cur_e - cur_s
        print(f"traced wall {wall_t:.3f}s, TPU busy (interval union) "
              f"{busy/1e6:.3f}s ({busy/1e6/wall_t*100:.0f}%)", flush=True)
        for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:20]:
            print(f"{dur/1e3:9.2f} ms  {name}", flush=True)


if __name__ == "__main__":
    main()
