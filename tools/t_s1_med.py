"""Stage-I MED fusion fwd+bwd in isolation (ref ViT features precomputed):
how much of the 1.21 s train step is the text encoder, and what does remat
cost? Sweeps remat on/off at the real config (B=512, dropout on)."""
import sys
import time

sys.path.insert(0, "/root/repo")
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from candidate_reranking_cir_tpu.config import (
    RetrievalModelConfig,
    TextEncoderConfig,
    vit_config,
)
from candidate_reranking_cir_tpu.models.blip_retrieval import RetrievalModel
from bench import measure_rtt, rand_params, med_fwd_flops


def run(remat: bool, L: int, B: int, rtt, attn_dropout: float = 0.1,
        hidden_dropout: float = 0.1):
    cfg = RetrievalModelConfig(
        vit=vit_config("base", 384, remat=True, fused_attention=True),
        text=TextEncoderConfig(remat=remat, fused_attention=True,
                               attention_dropout=attn_dropout,
                               hidden_dropout=hidden_dropout))
    model = RetrievalModel(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    params = rand_params(
        jax.eval_shape(lambda: model.init(
            jax.random.key(0), jnp.zeros((2, 384, 384, 3)),
            jnp.ones((2, L), jnp.int32), jnp.ones((2, L), jnp.int32))),
        jax.random.key(1))
    ref = jnp.asarray(rng.normal(size=(B, 577, 768)) * 0.05, jnp.bfloat16)
    ids = jnp.asarray(rng.integers(10, 20000, size=(B, L)), jnp.int32)
    msk = jnp.ones((B, L), jnp.int32)
    tgt = rng.normal(size=(B, 256)).astype(np.float32)
    tgt = jnp.asarray(tgt / np.linalg.norm(tgt, axis=-1, keepdims=True))

    def loss_fn(p, ref, ids, msk, tgt, key):
        pred = model.apply(p, ref, ids, msk, deterministic=False,
                           rngs={"dropout": key},
                           method=RetrievalModel.fuse)
        logits = model.apply(p, pred, tgt,
                             method=RetrievalModel.contrastive_logits)
        lbl = jnp.arange(B)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32))
        return -jnp.mean(jnp.take_along_axis(lp, lbl[:, None], 1))

    @jax.jit
    def step(p, ref, ids, msk, tgt, key):
        loss, grads = jax.value_and_grad(loss_fn)(p, ref, ids, msk, tgt, key)
        return loss, jax.tree.map(lambda g: jnp.mean(jnp.abs(g)), grads)

    key = jax.random.key(3, impl="rbg")
    try:
        loss, _ = step(params, ref, ids, msk, tgt, key)
        float(loss)
    except Exception as e:
        print(f"remat={remat} L={L}: FAILED {type(e).__name__}: "
              f"{str(e)[:120]}", flush=True)
        return
    n = 4
    t0 = time.perf_counter()
    for _ in range(n):
        loss, _ = step(params, ref, ids, msk, tgt, key)
    float(loss)
    dt = (time.perf_counter() - t0 - rtt) / n
    tf = 3 * B * med_fwd_flops(float(L)) / dt / 1e12
    print(f"remat={remat} L={L} adrop={attn_dropout} hdrop={hidden_dropout}:"
          f" {dt*1e3:7.1f} ms = {B/dt:6.0f} pairs/s "
          f"({tf:5.1f} TF/s on 3x-fwd model)", flush=True)


def main():
    rtt = measure_rtt()
    run(True, 32, 512, rtt, attn_dropout=0.0)
    run(True, 32, 512, rtt, attn_dropout=0.0, hidden_dropout=0.0)


if __name__ == "__main__" and "--trace" not in sys.argv and "--hlo" not in sys.argv:
    main()


def trace(remat=True, L=32, B=512):
    import glob, gzip, json, os
    cfg = RetrievalModelConfig(
        vit=vit_config("base", 384, remat=True, fused_attention=True),
        text=TextEncoderConfig(remat=remat, fused_attention=True))
    model = RetrievalModel(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    params = rand_params(
        jax.eval_shape(lambda: model.init(
            jax.random.key(0), jnp.zeros((2, 384, 384, 3)),
            jnp.ones((2, L), jnp.int32), jnp.ones((2, L), jnp.int32))),
        jax.random.key(1))
    ref = jnp.asarray(rng.normal(size=(B, 577, 768)) * 0.05, jnp.bfloat16)
    ids = jnp.asarray(rng.integers(10, 20000, size=(B, L)), jnp.int32)
    msk = jnp.ones((B, L), jnp.int32)
    tgt = rng.normal(size=(B, 256)).astype(np.float32)
    tgt = jnp.asarray(tgt / np.linalg.norm(tgt, axis=-1, keepdims=True))

    def loss_fn(p, ref, ids, msk, tgt, key):
        pred = model.apply(p, ref, ids, msk, deterministic=False,
                           rngs={"dropout": key},
                           method=RetrievalModel.fuse)
        logits = model.apply(p, pred, tgt,
                             method=RetrievalModel.contrastive_logits)
        lbl = jnp.arange(B)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32))
        return -jnp.mean(jnp.take_along_axis(lp, lbl[:, None], 1))

    @jax.jit
    def step(p, ref, ids, msk, tgt, key):
        loss, grads = jax.value_and_grad(loss_fn)(p, ref, ids, msk, tgt, key)
        return loss, jax.tree.map(lambda g: jnp.mean(jnp.abs(g)), grads)

    key = jax.random.key(3, impl="rbg")
    loss, _ = step(params, ref, ids, msk, tgt, key)
    float(loss)
    os.system("rm -rf /tmp/jtrace_med")
    with jax.profiler.trace("/tmp/jtrace_med"):
        loss, _ = step(params, ref, ids, msk, tgt, key)
        float(loss)
    files = glob.glob("/tmp/jtrace_med/**/*.trace.json.gz", recursive=True)
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
            agg[e["name"][:66]] = agg.get(e["name"][:66], 0) + e["dur"]
        for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:30]:
            print(f"{dur/1e3:9.2f} ms  {name}", flush=True)


if __name__ == "__main__" and "--trace" in sys.argv and "--hlo" not in sys.argv:
    trace()


def dump_hlo(remat=True, L=32, B=512):
    cfg = RetrievalModelConfig(
        vit=vit_config("base", 384, remat=True, fused_attention=True),
        text=TextEncoderConfig(remat=remat, fused_attention=True))
    model = RetrievalModel(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    params = rand_params(
        jax.eval_shape(lambda: model.init(
            jax.random.key(0), jnp.zeros((2, 384, 384, 3)),
            jnp.ones((2, L), jnp.int32), jnp.ones((2, L), jnp.int32))),
        jax.random.key(1))
    ref = jnp.zeros((B, 577, 768), jnp.bfloat16)
    ids = jnp.ones((B, L), jnp.int32)
    msk = jnp.ones((B, L), jnp.int32)
    tgt = jnp.zeros((B, 256), jnp.float32)

    def loss_fn(p, ref, ids, msk, tgt, key):
        pred = model.apply(p, ref, ids, msk, deterministic=False,
                           rngs={"dropout": key},
                           method=RetrievalModel.fuse)
        logits = model.apply(p, pred, tgt,
                             method=RetrievalModel.contrastive_logits)
        lbl = jnp.arange(B)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32))
        return -jnp.mean(jnp.take_along_axis(lp, lbl[:, None], 1))

    def step(p, ref, ids, msk, tgt, key):
        loss, grads = jax.value_and_grad(loss_fn)(p, ref, ids, msk, tgt, key)
        return loss, jax.tree.map(lambda g: jnp.mean(jnp.abs(g)), grads)

    key = jax.random.key(3, impl="rbg")
    txt = jax.jit(step).lower(params, ref, ids, msk, tgt, key).compile().as_text()
    with open("/tmp/med_hlo.txt", "w") as f:
        f.write(txt)
    import re
    for ln in txt.splitlines():
        s = ln.strip()
        if re.match(r"%?copy[.\w]*\s*=", s):
            print(s[:220], flush=True)


if __name__ == "__main__" and "--hlo" in sys.argv:
    dump_hlo()
