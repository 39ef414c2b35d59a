"""Standalone timings of the ViT block's pieces at B=32 (the embed/eval
shape): fc1 matmul alone, fc1+gelu, full FFN, LN, attention kernel — where
is the remaining non-MXU time?"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from bench import measure_rtt
from tools.t_folded_attn import chain_time

B, S, D, H = 32, 577, 768, 3072


def main():
    rtt = measure_rtt()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, S, D)) * 0.1, jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(D, H)) * 0.02, jnp.bfloat16)
    b1 = jnp.zeros((H,), jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(H, D)) * 0.02, jnp.bfloat16)
    b2 = jnp.zeros((D,), jnp.bfloat16)
    g = jnp.ones((D,), jnp.float32)
    bta = jnp.zeros((D,), jnp.float32)

    def t(name, fn, flops=None):
        dt = chain_time(fn, (x,), rtt, iters=30)
        extra = f"  {flops/dt/1e12:6.1f} TF/s" if flops else ""
        print(f"{name:28s} {dt*1e3:7.3f} ms{extra}", flush=True)
        return dt

    f1 = 2 * B * S * D * H
    t("fc1 matmul", lambda x: jnp.dot(
        x, w1, preferred_element_type=jnp.float32).astype(jnp.bfloat16), f1)
    t("fc1+bias+gelu(erf)", lambda x: jax.nn.gelu(
        (jnp.dot(x, w1, preferred_element_type=jnp.float32)
         .astype(jnp.bfloat16) + b1), approximate=False), f1)
    t("fc1+bias+gelu(tanh)", lambda x: jax.nn.gelu(
        (jnp.dot(x, w1, preferred_element_type=jnp.float32)
         .astype(jnp.bfloat16) + b1), approximate=True), f1)

    def ffn(x):
        h = (jnp.dot(x, w1, preferred_element_type=jnp.float32)
             .astype(jnp.bfloat16) + b1)
        h = jax.nn.gelu(h, approximate=False)
        return (jnp.dot(h, w2, preferred_element_type=jnp.float32)
                .astype(jnp.bfloat16) + b2)

    t("full FFN (erf)", ffn, 2 * f1)

    def ln(x):
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
        y = (x32 - mu) * jax.lax.rsqrt(var + 1e-6)
        return (y * g + bta).astype(jnp.bfloat16)

    t("LayerNorm fp32", ln)

    t("gelu(erf) on [B,S,3072]", None if False else (lambda x: jax.nn.gelu(
        jnp.broadcast_to(x[:, :, :1], (B, S, H)) + b1, approximate=False)))


if __name__ == "__main__" and "--variants" not in sys.argv:
    main()


def variants():
    rtt = measure_rtt()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, S, D)) * 0.1, jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(D, H)) * 0.02, jnp.bfloat16)
    b1f = jnp.zeros((H,), jnp.float32)
    f1 = 2 * B * S * D * H

    def t(name, fn):
        dt = chain_time(fn, (x,), rtt, iters=30)
        print(f"{name:34s} {dt*1e3:7.3f} ms  {f1/dt/1e12:6.1f} TF/s",
              flush=True)

    inv_sqrt2 = 0.7071067811865476

    def erf_fp32(x):
        h = jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1f
        g = 0.5 * h * (1.0 + jax.lax.erf(h * inv_sqrt2))
        return g.astype(jnp.bfloat16)

    t("fc1 + erf-gelu in fp32 epilogue", erf_fp32)

    def erf_bf16_lax(x):
        h = (jnp.dot(x, w1, preferred_element_type=jnp.float32)
             .astype(jnp.bfloat16) + b1f.astype(jnp.bfloat16))
        g = 0.5 * h * (1.0 + jax.lax.erf(h.astype(jnp.float32)
                                         * inv_sqrt2).astype(jnp.bfloat16))
        return g

    t("fc1 + lax.erf fp32 of bf16 h", erf_bf16_lax)


if __name__ == "__main__" and "--variants" in sys.argv:
    variants()


def _erf_rational(x):
    p = 0.3275911
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    e = poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * (1.0 - e)


def gelu_rational(x):
    x32 = x.astype(jnp.float32)
    y = 0.5 * x32 * (1.0 + _erf_rational(x32 * 0.7071067811865476))
    return y.astype(x.dtype)


def variants2():
    rtt = measure_rtt()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, S, D)) * 0.1, jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(D, H)) * 0.02, jnp.bfloat16)
    b1 = jnp.zeros((H,), jnp.bfloat16)
    f1 = 2 * B * S * D * H

    def t(name, fn):
        dt = chain_time(fn, (x,), rtt, iters=30)
        print(f"{name:34s} {dt*1e3:7.3f} ms  {f1/dt/1e12:6.1f} TF/s",
              flush=True)

    t("fc1 + rational-erf gelu", lambda x: gelu_rational(
        (jnp.dot(x, w1, preferred_element_type=jnp.float32)
         .astype(jnp.bfloat16) + b1)))

    # accuracy check vs lax.erf gelu on a wide range
    xs = jnp.asarray(np.linspace(-12, 12, 200001), jnp.float32)
    exact = 0.5 * xs * (1.0 + jax.lax.erf(xs * 0.7071067811865476))
    approx = 0.5 * xs * (1.0 + _erf_rational(xs * 0.7071067811865476))
    print("max |gelu_rational - gelu_erf| fp32:",
          float(jnp.max(jnp.abs(exact - approx))), flush=True)
    xb = jnp.asarray(np.linspace(-12, 12, 200001), jnp.bfloat16)
    eb = jax.nn.gelu(xb, approximate=False)
    ab = gelu_rational(xb)
    print("max bf16-domain diff:",
          float(jnp.max(jnp.abs(eb.astype(jnp.float32)
                                - ab.astype(jnp.float32)))), flush=True)


if __name__ == "__main__" and "--variants2" in sys.argv:
    variants2()
