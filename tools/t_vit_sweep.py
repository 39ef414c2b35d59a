"""ViT-B/16 @ 384 forward throughput sweep: batch size x fused attention,
plus a profiler trace of the best config to find the non-matmul overhead.
The ViT forward is the dominant equal-FLOPs term of stage-I training (frozen
embeds at bs=512) and stage-I eval (2297-image index build)."""
import sys
import time

sys.path.insert(0, "/root/repo")
import dataclasses
import glob
import gzip
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from candidate_reranking_cir_tpu.config import vit_config
from candidate_reranking_cir_tpu.models.vit import VisionTransformer
from bench import measure_rtt, rand_params, vit_fwd_flops


def chain_time(fn, args, rtt, iters=6, warmup=2):
    @jax.jit
    def chain(*a):
        def body(c, _):
            out = fn(*a, c)
            return jnp.mean(out.astype(jnp.float32)) * 1e-9, None
        c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=iters)
        return c

    for _ in range(warmup):
        float(chain(*args))
    t0 = time.perf_counter()
    float(chain(*args))
    return max(time.perf_counter() - t0 - rtt, 1e-9) / iters


def main():
    rtt = measure_rtt()
    rng = np.random.default_rng(0)
    flops = vit_fwd_flops()

    results = {}
    for fused in (True, False):
        cfg = dataclasses.replace(vit_config("base", 384),
                                  fused_attention=fused)
        model = VisionTransformer(cfg, jnp.bfloat16)
        params = None
        for B in (32, 64, 128, 256):
            imgs = jnp.asarray(rng.normal(size=(B, 384, 384, 3)) * 0.3,
                               jnp.float32)
            if params is None:
                params = rand_params(
                    jax.eval_shape(
                        lambda: model.init(jax.random.key(0), imgs[:2])),
                    jax.random.key(1))

            def fwd(params, imgs, c):
                return model.apply(params, imgs + c)

            dt = chain_time(fwd, (params, imgs), rtt,
                            iters=max(2, 256 // B))
            rate = B / dt
            mfu = rate * flops / 197e12
            results[(fused, B)] = rate
            print(f"ViT fwd B={B:3d} fused={fused}: {dt*1e3:7.1f} ms "
                  f"= {rate:6.1f} img/s  mfu={mfu:.3f}", flush=True)

    # trace the best config
    best = max(results, key=results.get)
    fused, B = best
    cfg = dataclasses.replace(vit_config("base", 384), fused_attention=fused)
    model = VisionTransformer(cfg, jnp.bfloat16)
    imgs = jnp.asarray(rng.normal(size=(B, 384, 384, 3)) * 0.3, jnp.float32)
    params = rand_params(
        jax.eval_shape(lambda: model.init(jax.random.key(0), imgs[:2])),
        jax.random.key(1))
    fwd = jax.jit(lambda p, x: model.apply(p, x))
    jnp.mean(fwd(params, imgs).astype(jnp.float32)).block_until_ready()
    os.system("rm -rf /tmp/jtrace_vit")
    with jax.profiler.trace("/tmp/jtrace_vit"):
        out = None
        for _ in range(2):
            out = fwd(params, imgs)
        float(jnp.mean(out.astype(jnp.float32)))
    files = glob.glob("/tmp/jtrace_vit/**/*.trace.json.gz", recursive=True)
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
            lane = pids.get(e.get("pid"), "?")
            if "TPU" not in lane:
                continue
            agg[e["name"][:60]] = agg.get(e["name"][:60], 0) + e["dur"]
        for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:30]:
            print(f"{dur/1e3:9.2f} ms  {name}", flush=True)


if __name__ == "__main__":
    main()
