"""Entry-blocked folded attention: E batch entries per program (fewer,
fatter programs). Sweep E at ViT shapes [32, 577, 768]."""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from candidate_reranking_cir_tpu.ops.pallas_attention import _head_attention
from bench import measure_rtt
from tools.t_folded_attn import chain_time


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale, num_heads, head_dim,
            entries):
    for e in range(entries):
        for h in range(num_heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            o_ref[e, :, sl] = _head_attention(
                q_ref[e, :, sl], k_ref[e, :, sl], v_ref[e, :, sl], None,
                scale, o_ref.dtype)


def attn(q, k, v, num_heads, entries):
    b, lq, hd = q.shape
    m = k.shape[1]
    d = hd // num_heads
    spec = pl.BlockSpec((entries, lq, hd), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    spec_kv = pl.BlockSpec((entries, m, hd), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=2 * b * num_heads * lq * m * d * 2,
        bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
        transcendentals=b * num_heads * lq * m)
    return pl.pallas_call(
        functools.partial(_kernel, scale=d ** -0.5, num_heads=num_heads,
                          head_dim=d, entries=entries),
        grid=(b // entries,),
        in_specs=[spec, spec_kv, spec_kv],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, lq, hd), q.dtype),
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(q, k, v)


def main():
    rtt = measure_rtt()
    rng = np.random.default_rng(0)
    B, L, H, D = 32, 577, 12, 64
    q = jnp.asarray(rng.normal(size=(B, L, H * D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, L, H * D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, L, H * D)), jnp.bfloat16)
    base = None
    for E in (1, 2, 4, 8):
        try:
            t = chain_time(lambda q, k, v, E=E: attn(q, k, v, H, E),
                           (q, k, v), rtt)
        except Exception as ex:
            print(f"E={E}: FAILED {type(ex).__name__} {str(ex)[:100]}",
                  flush=True)
            continue
        if base is None:
            base = t
        print(f"E={E}: {t*1e3:.3f} ms ({base/t:.2f}x)", flush=True)

    # small-L case (MED fusion shapes): B=128, L=32, M=577
    Bs, Ls = 128, 32
    q2 = jnp.asarray(rng.normal(size=(Bs, Ls, H * D)), jnp.bfloat16)
    k2 = jnp.asarray(rng.normal(size=(Bs, L, H * D)), jnp.bfloat16)
    v2 = jnp.asarray(rng.normal(size=(Bs, L, H * D)), jnp.bfloat16)
    for E in (1, 4, 8, 16):
        try:
            t = chain_time(lambda q, k, v, E=E: attn(q, k, v, H, E),
                           (q2, k2, v2), rtt)
        except Exception as ex:
            print(f"small E={E}: FAILED {type(ex).__name__} {str(ex)[:100]}",
                  flush=True)
            continue
        print(f"small-L E={E}: {t*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
