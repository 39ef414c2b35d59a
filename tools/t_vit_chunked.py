"""ViT fwd at B=512: monolithic vs lax.scan-chunked (smaller live buffers).
At 512x577x768 the per-layer activations are ~454 MB; chunking may avoid
HBM pressure/spills."""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from candidate_reranking_cir_tpu.config import vit_config
from candidate_reranking_cir_tpu.models.vit import VisionTransformer
from bench import measure_rtt, rand_params

B = 512
ITERS = 4
cfg = vit_config("base", 384, fused_attention=True)
model = VisionTransformer(cfg, jnp.bfloat16)
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.normal(size=(B, 384, 384, 3)) * 0.3, jnp.float32)
params = rand_params(
    jax.eval_shape(lambda: model.init(jax.random.key(0), imgs[:2])),
    jax.random.key(1))
rtt = measure_rtt()


def chain(fn, n=ITERS, warmup=1):
    @jax.jit
    def run(p, x):
        def body(c, _):
            out = fn(p, x + c)
            return jnp.mean(out[0, 0, :1].astype(jnp.float32)) * 1e-9, None
        c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=n)
        return c
    for _ in range(warmup):
        float(run(params, imgs))
    t0 = time.perf_counter()
    float(run(params, imgs))
    return max(time.perf_counter() - t0 - rtt, 1e-9) / n


def mono(p, x):
    return model.apply(p, x)


def chunked(chunk):
    def fn(p, x):
        xs = x.reshape(B // chunk, chunk, *x.shape[1:])
        def body(c, xc):
            return c, model.apply(p, xc)
        _, outs = jax.lax.scan(body, 0.0, xs)
        return outs.reshape(B, *outs.shape[2:])
    return fn


dt = chain(mono)
print(f"mono B={B}: {dt*1e3:.0f} ms = {B/dt:.0f} img/s", flush=True)
for c in (64, 128, 256):
    dt = chain(chunked(c))
    print(f"scan chunks of {c}: {dt*1e3:.0f} ms = {B/dt:.0f} img/s",
          flush=True)
