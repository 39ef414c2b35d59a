"""Sub-phase breakdown of ranked_slices at CIRR-val scale: dist einsum vs
top_k vs entity-rank pass vs D2H fetch; plus alternative top-k forms."""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

Q, N, W, E = 4181, 2297, 501, 7
rng = np.random.default_rng(0)
pred = jnp.asarray(rng.normal(size=(Q, 256)).astype(np.float32))
idx = jnp.asarray(rng.normal(size=(N, 256)).astype(np.float32))
ent = jnp.asarray(rng.integers(0, N, size=(Q, E)).astype(np.int32))


def timeit(name, fn, n=3):
    fn()  # warm/compile
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{name:28s} {best*1e3:9.1f} ms", flush=True)
    return best


@jax.jit
def dist_only(p, i):
    d = 1.0 - jnp.einsum("qe,ne->qn", p, i)
    return jnp.sum(d)


@jax.jit
def dist_topk(p, i):
    d = 1.0 - jnp.einsum("qe,ne->qn", p, i)
    _, t = jax.lax.top_k(-d, W)
    return jnp.sum(t)


@jax.jit
def dist_argsort(p, i):
    d = 1.0 - jnp.einsum("qe,ne->qn", p, i)
    return jnp.sum(jnp.argsort(d, axis=-1, stable=True)[:, :W])


@jax.jit
def dist_sortpair(p, i):
    # single sort of (dist, iota) pairs; stable by construction
    d = 1.0 - jnp.einsum("qe,ne->qn", p, i)
    io = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), d.shape)
    _, t = jax.lax.sort((d, io), dimension=-1, num_keys=1, is_stable=True)
    return jnp.sum(t[:, :W])


@jax.jit
def ranks_only(p, i, e):
    d = 1.0 - jnp.einsum("qe,ne->qn", p, i)
    d_e = jnp.take_along_axis(d, e, axis=1)
    less = (d[:, None, :] < d_e[:, :, None]).sum(-1)
    ties = ((d[:, None, :] == d_e[:, :, None])
            & (jnp.arange(N)[None, None, :] < e[:, :, None])).sum(-1)
    return jnp.sum(less + ties)


@jax.jit
def full(p, i, e):
    d = 1.0 - jnp.einsum("qe,ne->qn", p, i)
    _, t = jax.lax.top_k(-d, W)
    d_e = jnp.take_along_axis(d, e, axis=1)
    less = (d[:, None, :] < d_e[:, :, None]).sum(-1)
    ties = ((d[:, None, :] == d_e[:, :, None])
            & (jnp.arange(N)[None, None, :] < e[:, :, None])).sum(-1)
    return t, less + ties


timeit("dist einsum", lambda: float(dist_only(pred, idx)))
timeit("dist+top_k(501)", lambda: float(dist_topk(pred, idx)))
timeit("dist+argsort[:501]", lambda: float(dist_argsort(pred, idx)))
timeit("dist+sortpair[:501]", lambda: float(dist_sortpair(pred, idx)))
timeit("dist+entity ranks", lambda: float(ranks_only(pred, idx, ent)))
timeit("full (device sync)",
       lambda: [float(jnp.sum(o)) for o in full(pred, idx, ent)])
timeit("full + D2H fetch",
       lambda: [np.asarray(o) for o in full(pred, idx, ent)])

# raw D2H relay bandwidth probe
big = jnp.zeros((Q, W), jnp.int32)
float(jnp.sum(big))
t0 = time.perf_counter()
_ = np.asarray(big)
dt = time.perf_counter() - t0
print(f"D2H fetch {Q*W*4/1e6:.1f} MB: {dt*1e3:.0f} ms "
      f"({Q*W*4/1e6/dt:.1f} MB/s)", flush=True)
