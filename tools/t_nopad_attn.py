"""Validate the no-host-pad eval kernel: numerics vs XLA attention at a
sweep of (lq, m) shapes incl. non-tile-aligned and bias paths, + speed."""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from candidate_reranking_cir_tpu.ops.attention import (
    dot_product_attention, make_additive_mask)
from bench import measure_rtt


def xla_ref(q, k, v, bias):
    return dot_product_attention(q, k, v, bias, fused=False)


def main():
    rtt = measure_rtt()
    rng = np.random.default_rng(0)
    H, D = 12, 64
    for (b, lq, m, with_bias, dtype) in [
        (2, 577, 577, False, jnp.bfloat16),   # ViT self-attn
        (2, 577, 577, False, jnp.float32),
        (3, 40, 577, False, jnp.bfloat16),    # text->image cross
        (3, 24, 24, True, jnp.bfloat16),      # text self with mask
        (2, 128, 128, False, jnp.bfloat16),   # exactly aligned (no garbage)
        (2, 5, 13, True, jnp.float32),        # tiny, CPU-test-like
        (1, 1200, 640, False, jnp.bfloat16),  # multi-block lq
    ]:
        q = jnp.asarray(rng.normal(size=(b, lq, H, D)) * 0.3, dtype)
        k = jnp.asarray(rng.normal(size=(b, m, H, D)) * 0.3, dtype)
        v = jnp.asarray(rng.normal(size=(b, m, H, D)) * 0.3, dtype)
        bias = None
        if with_bias:
            mask = (rng.random((b, m)) > 0.3).astype(np.float32)
            mask[:, 0] = 1.0
            bias = make_additive_mask(jnp.asarray(mask))
        a = dot_product_attention(q, k, v, bias, fused=True)
        r = xla_ref(q, k, v, bias)
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                    - r.astype(jnp.float32))))
        nan = bool(jnp.any(jnp.isnan(a)))
        tol = 3e-2 if dtype == jnp.bfloat16 else 2e-5
        status = "OK " if (err < tol and not nan) else "FAIL"
        print(f"{status} b={b} lq={lq} m={m} bias={with_bias} "
              f"{jnp.dtype(dtype).name}: maxerr={err:.2e} nan={nan}",
              flush=True)

    # speed at the ViT shape
    B, L = 32, 577
    q = jnp.asarray(rng.normal(size=(B, L, H, D)) * 0.05, jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, L, H, D)) * 0.05, jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, L, H, D)) * 0.05, jnp.bfloat16)

    @jax.jit
    def chain(q, k, v):
        def body(c, _):
            out = dot_product_attention(q + c.astype(q.dtype), k, v, None,
                                        fused=True)
            return jnp.mean(out.astype(jnp.float32)) * 1e-9, None
        c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=12)
        return c

    float(chain(q, k, v)); float(chain(q, k, v))
    t0 = time.perf_counter()
    float(chain(q, k, v))
    dt = max(time.perf_counter() - t0 - rtt, 1e-9) / 12
    print(f"ViT-shape attention: {dt*1e3:.3f} ms/call (was 1.679 padded)",
          flush=True)


if __name__ == "__main__":
    main()
