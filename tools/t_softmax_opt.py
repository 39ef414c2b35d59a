"""Softmax micro-structure A/B for the fused eval attention kernel
(verdict r4 item 5: push the fusion phase's VPU-bound attention share).

Variants, selected via env (read at ops/pallas_attention.py import):
  base     — CRC_NO_SCALE_FOLD=1: per-score [Lq, M] fp32 scale multiply
             (the pre-r5 kernel)
  fold     — default: 1/sqrt(64) = 2^-3 folded into q ([Lq, D] multiply;
             bitwise-identical scores)
  fold+rcp — CRC_ATTN_RECIP=1: normalize with reciprocal-multiply instead
             of divide (NOT bitwise equal to jax.nn.softmax's divide)

Run without args to drive all three in subprocesses at the three hot
shapes; `--worker` runs one variant in-process (the kernels read the env
at import, so each variant needs a fresh interpreter).
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

SHAPES = (
    # (name, b, lq, m, bias) — folded [B, L, H*D] layout, hd=768, H=12
    ("xattn-im-major", 128, 56, 577, False),   # fusion cross-attn, Q=2 fold
    ("self-text", 256, 28, 28, True),          # fusion text self-attn
    ("vit-self", 32, 577, 577, False),         # ViT-B/384 embed phase
)


def worker():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from bench import measure_rtt
    from candidate_reranking_cir_tpu.ops.pallas_attention import (
        fused_attention_folded,
    )
    from candidate_reranking_cir_tpu.runtime.host import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    rtt = measure_rtt()
    rng = np.random.default_rng(0)
    out = {}
    for name, b, lq, m, with_bias in SHAPES:
        hd = 768
        q = jnp.asarray(rng.normal(size=(b, lq, hd)) * 0.05, jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(b, m, hd)) * 0.05, jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(b, m, hd)) * 0.05, jnp.bfloat16)
        bias = None
        if with_bias:
            bias = jnp.where(
                jnp.arange(m)[None, None, :] < m - 4, 0.0, -10000.0
            ) * jnp.ones((b, lq, m), jnp.float32)

        @jax.jit
        def probe(q, k, v, bias=bias):
            o = fused_attention_folded(q, k, v, bias, num_heads=12)
            return o[0, 0, :1].astype(jnp.float32)

        float(probe(q, k, v)[0])  # compile
        n = 30
        t0 = time.perf_counter()
        acc = [probe(q, k, v) for _ in range(n)]
        jax.block_until_ready(acc)
        dt = (time.perf_counter() - t0 - rtt) / n
        out[name] = dt * 1e3
        # checksum so variants can be cross-checked for drift
        o = fused_attention_folded(q, k, v, bias, num_heads=12)
        out[name + "_sum"] = float(o.astype(jnp.float32).sum())
    print(json.dumps(out), flush=True)


def main():
    if "--worker" in sys.argv:
        worker()
        return
    variants = (
        ("base", {"CRC_NO_SCALE_FOLD": "1"}),
        ("fold", {}),
        ("fold+rcp", {"CRC_ATTN_RECIP": "1"}),
    )
    results = {}
    for name, extra in variants:
        env = dict(os.environ)
        env.pop("CRC_NO_SCALE_FOLD", None)
        env.pop("CRC_ATTN_RECIP", None)
        env.update(extra)
        r = subprocess.run(
            [sys.executable, __file__, "--worker"], env=env,
            capture_output=True, text=True, timeout=3000)
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
        try:
            results[name] = json.loads(line)
        except json.JSONDecodeError:
            print(f"{name}: FAILED\n{r.stdout}\n{r.stderr[-2000:]}",
                  flush=True)
            continue
        print(name, line, flush=True)
    if "base" in results and "fold" in results:
        for shape_name, *_ in SHAPES:
            row = {v: results[v].get(shape_name) for v in results}
            print(f"{shape_name:16s} " + "  ".join(
                f"{v}={row[v]:.3f}ms" for v in row if row[v] is not None),
                flush=True)


if __name__ == "__main__":
    main()
