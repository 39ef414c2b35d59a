"""Stage-I train attention BACKWARD kernel variants at production shapes
(b=512 pairs, lq=32 text rows, m=577 image tokens, H=12, D=64, folded
[B, L, H*D] layout). The r3 floor table pins the folded bwd kernel at
~96 ms/step, bound by the dv/dk dots' K=32 (contraction = lq) / N=64
fragments. Variant B computes dv/dk TRANSPOSED (dv^T = g^T @ dropped:
N=577 fills the lanes, at the price of an in-kernel [64, 577] -> [577, 64]
transpose per head). Measures both plus the fwd kernel for scale."""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import measure_rtt
from candidate_reranking_cir_tpu.ops import pallas_attention_train as T
from candidate_reranking_cir_tpu.runtime.host import enable_compilation_cache

enable_compilation_cache()


def _bwd_kernel_folded_T(seed_ref, q_ref, k_ref, v_ref, b_ref, g_ref,
                         dq_ref, dk_ref, dv_ref, *, scale, num_heads,
                         head_dim, rate, has_bias, entries):
    pid = pl.program_id(0)
    seed = seed_ref[0]
    inv = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0
    for e in range(entries):
        b = pid * entries + e
        bias = b_ref[e].astype(jnp.float32) if has_bias else None
        for h in range(num_heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            q = q_ref[e, :, sl]
            k = k_ref[e, :, sl]
            v = v_ref[e, :, sl]
            g = g_ref[e, :, sl].astype(jnp.float32)
            probs = T._softmax_fp32(T._head_scores(q, k, bias, scale))
            if rate > 0.0:
                keep = T._keep_mask(seed, b, h, probs.shape, rate)
                dropped = jnp.where(keep, probs * inv, 0.0)
            else:
                keep = None
                dropped = probs
            # dv^T = g^T @ dropped: [D, lq] x [lq, m] -> [D, m] (N=m=577
            # fills the lanes; the plain dv form has N=D=64)
            dvT = jax.lax.dot_general(
                g, dropped, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dv_ref[e, :, sl] = dvT.T.astype(dv_ref.dtype)
            d_dropped = jax.lax.dot_general(
                g, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if keep is not None:
                d_probs = jnp.where(keep, d_dropped * inv, 0.0)
            else:
                d_probs = d_dropped
            d_scores = probs * (
                d_probs - jnp.sum(d_probs * probs, axis=-1, keepdims=True))
            d_scores = (d_scores * scale).astype(q.dtype)
            dq_ref[e, :, sl] = jax.lax.dot_general(
                d_scores, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dq_ref.dtype)
            dkT = jax.lax.dot_general(
                q, d_scores, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dk_ref[e, :, sl] = dkT.T.astype(dk_ref.dtype)


def bwd_T(q, k, v, bias, seed, g, rate, num_heads, interpret=False):
    b, lq, hd = q.shape
    m = k.shape[1]
    d = hd // num_heads
    entries = T._pick_entries(b, lq)
    bias3 = T._bias3_folded(bias, b, lq, m)
    seed_spec, q_spec, kv_spec, b_spec = T._specs_folded(
        num_heads, lq, m, hd, bias is not None, entries)
    cost = pl.CostEstimate(
        flops=5 * 2 * b * num_heads * lq * m * d,
        bytes_accessed=2 * (q.size + k.size + v.size) * q.dtype.itemsize,
        transcendentals=b * num_heads * lq * m)
    return pl.pallas_call(
        functools.partial(_bwd_kernel_folded_T, scale=d ** -0.5,
                          num_heads=num_heads, head_dim=d, rate=rate,
                          has_bias=bias is not None, entries=entries),
        grid=(b // entries,),
        in_specs=[seed_spec, q_spec, kv_spec, kv_spec, b_spec, q_spec],
        out_specs=(q_spec, kv_spec, kv_spec),
        out_shape=(jax.ShapeDtypeStruct((b, lq, hd), q.dtype),
                   jax.ShapeDtypeStruct((b, m, hd), k.dtype),
                   jax.ShapeDtypeStruct((b, m, hd), v.dtype)),
        cost_estimate=cost,
        compiler_params=T._COMPILER_PARAMS,
        interpret=interpret,
    )(seed, q, k, v, bias3, g)


def main():
    # --check-only: run the interpret-mode numerics cross-check (use
    # JAX_PLATFORMS=cpu — interpret mode through the remote-TPU relay
    # dispatches every op individually and never finishes).
    # --skip-check: timing only (the TPU half of the split run).
    check_only = "--check-only" in sys.argv
    skip_check = "--skip-check" in sys.argv
    rtt = 0.0 if check_only else measure_rtt()
    rng = np.random.default_rng(0)
    b, lq, m, hd, h = 512, 32, 577, 768, 12
    rate = 0.1
    q = jnp.asarray(rng.normal(size=(b, lq, hd)) * 0.05, jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, m, hd)) * 0.05, jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, m, hd)) * 0.05, jnp.bfloat16)
    g = jnp.asarray(rng.normal(size=(b, lq, hd)) * 0.05, jnp.bfloat16)
    seed = jnp.zeros((1,), jnp.int32)

    def timed(fn, n=10):
        # chain sequentially, keeping only scalars on device (10 full
        # gradient sets would be ~9 GB and OOM the chip)
        @jax.jit
        def probe(s):
            dq, dk, dv = fn(q, k, v, None, s, g)
            return (dq[0, 0, :1].astype(jnp.float32)
                    + dk[0, 0, :1].astype(jnp.float32)
                    + dv[0, 0, :1].astype(jnp.float32))
        float(probe(seed)[0])
        t0 = time.perf_counter()
        acc = [probe(seed) for _ in range(n)]
        jax.block_until_ready(acc)
        return (time.perf_counter() - t0 - rtt) / n

    # numerics cross-check in interpret mode at tiny shapes (no Mosaic
    # compile; same math, same dropout mask keying)
    if not skip_check:
        bs = 8
        o1 = T._bwd_impl_folded(q[:bs], k[:bs], v[:bs], None, seed, g[:bs],
                                rate=rate, num_heads=h, interpret=True)
        o2 = bwd_T(q[:bs], k[:bs], v[:bs], None, seed, g[:bs], rate=rate,
                   num_heads=h, interpret=True)
        for a, bb, nm in zip(o1, o2, ("dq", "dk", "dv")):
            d = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                      - bb.astype(jnp.float32))))
            print(f"max|Δ{nm}| = {d:.2e}", flush=True)
    if check_only:
        return

    for name, fn in (
            ("current", lambda *a: T._bwd_impl_folded(
                *a, rate=rate, num_heads=h, interpret=False)),
            ("transposed-dv/dk", lambda *a: bwd_T(*a, rate=rate,
                                                  num_heads=h))):
        try:
            dt = timed(fn)
            fl = 5 * 2 * b * h * lq * m * (hd // h)
            print(f"bwd {name:18s}: {dt*1e3:7.2f} ms  {fl/dt/1e12:6.1f} TF/s",
                  flush=True)
        except Exception as e:
            print(f"bwd {name:18s}: FAILED {type(e).__name__}: {e}",
                  flush=True)



if __name__ == "__main__":
    main()
