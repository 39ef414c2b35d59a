"""Online-serving latency/throughput on the real chip: full-size two-stage
stack, CIRR-val-sized synthetic index, production engine + micro-batcher.

Reports single-request latency percentiles (sequential closed loop) and
coalesced throughput (8 concurrent clients through the micro-batcher).
Includes the remote-relay RTT on this rig — production on-host latency is
lower by ~the printed RTT."""
import sys
import threading
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from candidate_reranking_cir_tpu.config import (
    RerankerModelConfig,
    RetrievalModelConfig,
)
from candidate_reranking_cir_tpu.models.blip_reranker import RerankerModel
from candidate_reranking_cir_tpu.models.blip_retrieval import RetrievalModel
from candidate_reranking_cir_tpu.models.tokenizer import (
    WordPieceTokenizer,
    build_test_vocab,
)
from candidate_reranking_cir_tpu.runtime.serve import (
    CIRServingEngine,
    MicroBatcher,
    ServeRequest,
    ServingIndex,
)
from bench import measure_rtt, rand_params

rtt = measure_rtt()
print(f"relay RTT ~{rtt*1000:.1f} ms")

s1_cfg = RetrievalModelConfig()
s2_cfg = RerankerModelConfig()
s1 = RetrievalModel(s1_cfg, dtype=jnp.bfloat16)
s2 = RerankerModel(s2_cfg, dtype=jnp.bfloat16)
L = s1_cfg.text_len
M = s1_cfg.vit.num_tokens
W = s1_cfg.text.encoder_width

ids = jnp.zeros((2, L), jnp.int32)
msk = jnp.ones((2, L), jnp.int32)
z0 = jnp.zeros((2, L, s2_cfg.text.hidden_size), jnp.bfloat16)
imgs = jnp.zeros((2, s1_cfg.vit.image_size, s1_cfg.vit.image_size, 3))
s1_params = rand_params(
    jax.eval_shape(lambda: s1.init(jax.random.key(0), imgs, ids, msk)),
    jax.random.key(1))
s2_params = rand_params(
    jax.eval_shape(lambda: s2.init(jax.random.key(0), imgs, ids, msk, z0)),
    jax.random.key(2))

n_idx = 2297  # CIRR-val corpus size
names = [f"im{i}" for i in range(n_idx)]
rng_np = np.random.default_rng(0)
pooled = rng_np.normal(size=(n_idx, s1_cfg.embed_dim)).astype(np.float32)
pooled /= np.linalg.norm(pooled, axis=-1, keepdims=True)
index = ServingIndex(
    names=names, pooled_s1=jnp.asarray(pooled),
    raw_s1=jax.random.normal(jax.random.key(3), (n_idx, M, W),
                             jnp.bfloat16) * 0.05,
    raw_s2=jax.random.normal(jax.random.key(4), (n_idx, M, W),
                             jnp.bfloat16) * 0.05)

tok = WordPieceTokenizer(build_test_vocab(
    ["make", "the", "dress", "red", "with", "short", "sleeves", "blue"]))
tok.overflow = "truncate"
if "--int8" in sys.argv:
    index.quantize()
    print(f"int8 banks: raw_s1+raw_s2 = "
          f"{(index.raw_s1.nbytes + index.raw_s2.nbytes)/2**20:.0f} MiB "
          f"(bf16 would be {2*2297*M*W*2/2**20:.0f} MiB)")
engine = CIRServingEngine(s1, s1_params, tok, index, text_len=L, q_pad=4,
                          reranker=s2, s2_params=s2_params, rerank_k=50)
t0 = time.perf_counter()
engine.warmup()
print(f"warmup (all serving programs compiled): "
      f"{time.perf_counter()-t0:.1f}s", flush=True)

# ---- single-request latency (sequential closed loop) -----------------------
reqs = [ServeRequest(caption=f"make the dress red {i}",
                     reference=names[i % n_idx], k=50) for i in range(64)]
lat = []
for r in reqs[:20]:
    t0 = time.perf_counter()
    engine.handle([r])
    lat.append(time.perf_counter() - t0)
lat.sort()
n_lat = len(lat)
p50 = lat[n_lat // 2]
p90 = lat[min(int(0.9 * n_lat), n_lat - 1)]
print(f"single-request latency (rank@2297 + rerank@50, incl. relay RTT): "
      f"p50 {p50*1000:.0f} ms, p90 {p90*1000:.0f} ms", flush=True)

# ---- coalesced throughput (8 concurrent clients) ----------------------------
batcher = MicroBatcher(engine, window_ms=3)
done = []
t0 = time.perf_counter()

def client(k):
    for r in reqs[k::8]:
        batcher.submit(r)
        done.append(1)

threads = [threading.Thread(target=client, args=(k,)) for k in range(8)]
for t in threads:
    t.start()
for t in threads:
    t.join()
dt = time.perf_counter() - t0
stats = batcher.stats()
batcher.close()
print(f"8 concurrent clients, 64 requests: {len(done)/dt:.1f} req/s "
      f"(mean wave occupancy {stats['mean_wave_occupancy']}, "
      f"p50 {stats['latency_p50_s']*1000:.0f} ms)", flush=True)
