"""Micro-benchmark of stage-II scoring components on the real chip.

Decomposes the [Q=8, K=50] pair-grid call to find where time goes:
KV projections, attention einsums + softmax, FFN, full dual layer.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

Q, K, L, M, H, D, HEADS = 8, 50, 40, 577, 768, 64, 12
PAIRS = Q * K
INTER = 3072


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16
    cand = jnp.asarray(rng.normal(size=(PAIRS, M, H)) * 0.02, bf)
    wk = jnp.asarray(rng.normal(size=(H, HEADS, D)) * 0.02, bf)
    states = jnp.asarray(rng.normal(size=(PAIRS, L, H)) * 0.02, bf)
    w_inter = jnp.asarray(rng.normal(size=(H, INTER)) * 0.02, bf)
    w_out = jnp.asarray(rng.normal(size=(INTER, H)) * 0.02, bf)
    q = jnp.asarray(rng.normal(size=(PAIRS, L, HEADS, D)) * 0.02, bf)
    k = jnp.asarray(rng.normal(size=(PAIRS, M, HEADS, D)) * 0.02, bf)
    v = jnp.asarray(rng.normal(size=(PAIRS, M, HEADS, D)) * 0.02, bf)

    @jax.jit
    def kv_proj(cand, wk):
        k = jnp.einsum("pmd,dhx->pmhx", cand, wk,
                       preferred_element_type=jnp.float32).astype(bf)
        v = jnp.einsum("pmd,dhx->pmhx", cand, wk,
                       preferred_element_type=jnp.float32).astype(bf)
        return k, v

    t = timeit(kv_proj, cand, wk)
    fl = 2 * PAIRS * M * H * H * 2
    print(f"kv_proj        {t*1e3:8.2f} ms  {fl/t/1e12:6.1f} TF/s")

    @jax.jit
    def attention(q, k, v):
        s = jnp.einsum("plhd,pmhd->phlm", q, k,
                       preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s.astype(jnp.float32) * 0.125, axis=-1).astype(bf)
        return jnp.einsum("phlm,pmhd->plhd", p, v,
                          preferred_element_type=jnp.float32).astype(bf)

    t = timeit(attention, q, k, v)
    fl = 2 * PAIRS * HEADS * L * M * D * 2
    print(f"attention      {t*1e3:8.2f} ms  {fl/t/1e12:6.1f} TF/s")

    @jax.jit
    def attention_bf16_softmax(q, k, v):
        s = jnp.einsum("plhd,pmhd->phlm", q, k,
                       preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s * 0.125, axis=-1).astype(bf)
        return jnp.einsum("phlm,pmhd->plhd", p, v,
                          preferred_element_type=jnp.float32).astype(bf)

    t = timeit(attention_bf16_softmax, q, k, v)
    print(f"attn(f32 sm)   {t*1e3:8.2f} ms  {fl/t/1e12:6.1f} TF/s")

    @jax.jit
    def ffn(states, w_inter, w_out):
        h = jnp.einsum("pld,di->pli", states, w_inter,
                       preferred_element_type=jnp.float32).astype(bf)
        h = jax.nn.gelu(h)
        return jnp.einsum("pli,id->pld", h, w_out,
                          preferred_element_type=jnp.float32).astype(bf)

    t = timeit(ffn, states, w_inter, w_out)
    fl = 2 * PAIRS * L * H * INTER * 2
    print(f"ffn            {t*1e3:8.2f} ms  {fl/t/1e12:6.1f} TF/s")

    # shared-candidate KV variant (training path): C=16 candidates
    cand16 = cand[:16]

    @jax.jit
    def kv_proj_shared(cand, wk):
        return jnp.einsum("cmd,dhx->cmhx", cand, wk,
                          preferred_element_type=jnp.float32).astype(bf)

    t = timeit(kv_proj_shared, cand16, wk)
    fl = 2 * 16 * M * H * H
    print(f"kv_proj(C=16)  {t*1e3:8.2f} ms  {fl/t/1e12:6.1f} TF/s")

    # pair-grid attention with shared K (broadcast over q)
    qg = jnp.asarray(rng.normal(size=(Q, K, L, HEADS, D)) * 0.02, bf)
    kg = jnp.asarray(rng.normal(size=(K, M, HEADS, D)) * 0.02, bf)

    @jax.jit
    def pair_attn(qg, kg):
        s = jnp.einsum("qclhd,ckhd->qchlk", qg, kg,
                       preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(bf)
        return jnp.einsum("qchlk,ckhd->qclhd", p, kg,
                          preferred_element_type=jnp.float32).astype(bf)

    t = timeit(pair_attn, qg, kg)
    fl = 2 * Q * K * HEADS * L * M * D * 2
    print(f"pair_attn      {t*1e3:8.2f} ms  {fl/t/1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()
