"""Profile one stage-I eval fuse call (B=256, L=28): where do the ~88 ms
per 256-query batch go? Op-level trace summary + timing sweep over q_batch."""
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

from bench import _stage1_models, measure_rtt, rand_params
from candidate_reranking_cir_tpu.models.blip_retrieval import RetrievalModel


def main():
    rtt = measure_rtt()
    model, cfg = _stage1_models(train=False)
    im = cfg.vit.image_size
    rng = np.random.default_rng(0)
    L = 28

    params = rand_params(
        jax.eval_shape(lambda: model.init(
            jax.random.key(0), jnp.zeros((2, im, im, 3)),
            jnp.ones((2, L), jnp.int32), jnp.ones((2, L), jnp.int32))),
        jax.random.key(1))

    @jax.jit
    def fuse(p, ref, ids, msk):
        return model.apply(p, ref, ids, msk, method=RetrievalModel.fuse)

    for B in (64, 128):
        ref = jnp.asarray(rng.normal(size=(B, 577, 768)) * 0.05, jnp.bfloat16)
        ids = jnp.asarray(rng.integers(10, 20000, size=(B, L)), jnp.int32)
        msk = jnp.ones((B, L), jnp.int32)
        out = fuse(params, ref, ids, msk)
        out.block_until_ready()
        n = 6
        t0 = time.perf_counter()
        outs = [fuse(params, ref, ids, msk) for _ in range(n)]
        for o in outs:
            o.block_until_ready()
        dt = (time.perf_counter() - t0 - rtt) / n
        print(f"fuse B={B} L={L}: {dt*1e3:7.2f} ms = {B/dt:6.0f} q/s",
              flush=True)

    B = 128
    ref = jnp.asarray(rng.normal(size=(B, 577, 768)) * 0.05, jnp.bfloat16)
    ids = jnp.asarray(rng.integers(10, 20000, size=(B, L)), jnp.int32)
    msk = jnp.ones((B, L), jnp.int32)
    os.system("rm -rf /tmp/jtrace_fuse")
    with jax.profiler.trace("/tmp/jtrace_fuse"):
        for _ in range(2):
            out = fuse(params, ref, ids, msk)
        out.block_until_ready()
    files = glob.glob("/tmp/jtrace_fuse/**/*.trace.json.gz", recursive=True)
    for f in files:
        with gzip.open(f) as fh:
            data = json.load(fh)
        pids = {}
        for e in data.get("traceEvents", []):
            if e.get("ph") == "M" and e.get("name") == "process_name":
                pids[e["pid"]] = e["args"].get("name", "")
        agg = {}
        for e in data.get("traceEvents", []):
            if e.get("ph") != "X" or not e.get("dur"):
                continue
            if "TPU" not in pids.get(e.get("pid"), "?"):
                continue
            agg[e["name"][:70]] = agg.get(e["name"][:70], 0) + e["dur"]
        for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
            print(f"{dur/1e3:9.2f} ms  {name}", flush=True)


if __name__ == "__main__":
    main()
