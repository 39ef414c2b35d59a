"""Online CIR serving engine: stage-I rank + optional stage-II re-rank.

A production surface the reference (a research repo) does not have: load the
trained two-stage stack once, embed the corpus once (or load a cached index),
then answer (reference image, modification text) queries at low latency.

TPU-shaped: every device program is compiled once at a fixed query-batch
shape ``q_pad`` (requests are padded up, results trimmed), the corpus index
is device-resident in bf16, ranking is ``jax.lax.top_k`` (never a full-corpus
argsort per request), and re-ranking reuses the offline pair-grid scorer
(retrieval/rerank.rerank) at the same [q_pad, K] shape.

Semantics match the offline engines: the reference image is removed from its
own ranking (validate.py:207-210), stage-II re-sorts only the top
``rerank_k`` candidates and leaves the tail stage-I-ordered (the reference's
two-stage contract, cirr_test_submission_stage2.py:93-106), and z_t fusion
for re-ranking runs over the STAGE-II ViT's features
(validate_stage2.py:244).
"""
from __future__ import annotations

import threading
import queue
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from candidate_reranking_cir_tpu.models.blip_retrieval import RetrievalModel
from candidate_reranking_cir_tpu.models.blip_reranker import RerankerModel
from candidate_reranking_cir_tpu.ops.quant import (
    Int8Bank,
    quantize_bank,
    take_rows,
)
from candidate_reranking_cir_tpu.ops.topk import cosine_scores, cosine_topk
from candidate_reranking_cir_tpu.retrieval.rerank import rerank


@dataclass
class ServeRequest:
    caption: str
    reference: str | None = None       # corpus image name
    reference_image: np.ndarray | None = None  # preprocessed [H, W, 3] fp32
    k: int = 50


@dataclass
class ServeResult:
    ranking: list[str]
    scores: list[float]
    reranked: int = 0   # how many head entries were stage-II re-scored


def params_fingerprint(params) -> str:
    """Cheap content fingerprint of a parameter tree (leaf count, total
    size, float64 checksum) — guards index caches against serving rankings
    from stale weights."""
    leaves = jax.tree_util.tree_leaves(params)
    total = 0.0
    size = 0
    for leaf in leaves:
        a = np.asarray(leaf)
        size += a.size
        if np.issubdtype(a.dtype, np.floating):
            total += float(a.astype(np.float64).sum())
    return f"{len(leaves)}:{size}:{total:.6e}"


@dataclass
class ServingIndex:
    """Device-resident corpus banks. ``raw_s2`` only when stage-II serves.

    ``fingerprint`` records what produced the index (checkpoint checksums,
    dataset/split/transform); the cache loader refuses a mismatched cache
    instead of silently ranking against stale embeddings.

    Supports INCREMENTAL updates without a rebuild (the production corpus
    changes; recompiling per size would stall serving): banks are padded to
    a power-of-two ``capacity`` and a ``valid`` mask tombstones removed
    rows, so every compiled program keeps a static shape until capacity
    doubles. Removed slots are reused by later additions."""
    names: list[str]
    pooled_s1: jax.Array          # [capacity, E] fp32
    raw_s1: jax.Array             # [capacity, M, W] bf16 (reference fusion)
    raw_s2: jax.Array | None = None  # [capacity, M, W] bf16 (stage-II ViT)
    fingerprint: dict | None = None
    valid: jax.Array | None = None   # [capacity] bool; None = all valid
    pos: dict = field(default_factory=dict)

    def __post_init__(self):
        if not self.pos:
            self.pos = {nm: i for i, nm in enumerate(self.names)}
        if self.valid is None:
            self.valid = jnp.ones(self.capacity, bool)

    @property
    def capacity(self) -> int:
        return self.pooled_s1.shape[0]

    @property
    def n_valid(self) -> int:
        return len(self.pos)

    def _assert_mutable(self):
        if isinstance(self.raw_s1, Int8Bank) or \
                isinstance(self.raw_s2, Int8Bank):
            raise ValueError("a quantized index is immutable — apply "
                             "add/remove before quantize(), or rebuild")

    def _grow_to(self, capacity: int):
        pad = capacity - self.capacity
        if pad <= 0:
            return

        def grow(a):
            if a is None:
                return None
            shape = (pad, *a.shape[1:])
            return jnp.concatenate([a, jnp.zeros(shape, a.dtype)])

        self.pooled_s1 = grow(self.pooled_s1)
        self.raw_s1 = grow(self.raw_s1)
        self.raw_s2 = grow(self.raw_s2)
        self.valid = jnp.concatenate([self.valid, jnp.zeros(pad, bool)])
        self.names = self.names + [f"__free_{i}__"
                                   for i in range(self.capacity - pad,
                                                  self.capacity)]

    def add_rows(self, names: list[str], pooled, raw1, raw2=None):
        """Append embedded rows, reusing tombstoned slots first; grows the
        banks to the next power of two when full (the ranking program
        recompiles once per doubling, not per addition)."""
        self._assert_mutable()
        for nm in names:
            if nm in self.pos:
                raise ValueError(f"{nm!r} is already indexed")
        if (raw2 is None) != (self.raw_s2 is None):
            raise ValueError("stage-II features must match the index")
        used = set(self.pos.values())
        free = [i for i in range(self.capacity) if i not in used]
        need = len(names) - len(free)
        if need > 0:
            new_cap = max(2 * self.capacity, self.capacity + need)
            new_cap = 1 << (new_cap - 1).bit_length()  # next power of two
            start = self.capacity
            self._grow_to(new_cap)
            free = free + list(range(start, self.capacity))
        rows = jnp.asarray(free[:len(names)])
        self.pooled_s1 = self.pooled_s1.at[rows].set(
            jnp.asarray(pooled, self.pooled_s1.dtype))
        self.raw_s1 = self.raw_s1.at[rows].set(
            jnp.asarray(raw1, self.raw_s1.dtype))
        if raw2 is not None:
            self.raw_s2 = self.raw_s2.at[rows].set(
                jnp.asarray(raw2, self.raw_s2.dtype))
        self.valid = self.valid.at[rows].set(True)
        for nm, row in zip(names, free):
            self.names[row] = nm
            self.pos[nm] = row

    def remove_rows(self, names: list[str]):
        """Tombstone rows: the valid mask sinks them below every real
        candidate (-inf similarity); their slots are reused by add_rows."""
        self._assert_mutable()
        rows = []
        for nm in names:
            if nm not in self.pos:
                raise ValueError(f"{nm!r} is not indexed")
            rows.append(self.pos.pop(nm))
        for row in rows:
            self.names[row] = f"__tombstone_{row}__"
        self.valid = self.valid.at[jnp.asarray(rows)].set(False)

    def quantize(self):
        """Convert the raw token banks to symmetric per-token int8 (~half
        the HBM; see ops/quant.py for the accuracy tradeoff). The pooled
        ranking bank stays fp32 — it is [N, 256], negligible."""
        if not isinstance(self.raw_s1, Int8Bank):
            self.raw_s1 = quantize_bank(self.raw_s1)
        if self.raw_s2 is not None and not isinstance(self.raw_s2, Int8Bank):
            self.raw_s2 = quantize_bank(self.raw_s2)
        return self

    def save(self, path):
        """npz cache; bf16 stored as a uint16 bit view (npz has no bf16).
        Caches always store the full-precision banks — quantize AFTER
        loading so one cache serves both modes. Tombstoned/free slots are
        compacted out, so the cache holds exactly the live corpus."""
        import json

        if isinstance(self.raw_s1, Int8Bank) or \
                isinstance(self.raw_s2, Int8Bank):
            raise ValueError("save the index before quantize(): caches store "
                             "full-precision banks")

        live = sorted(self.pos.values())
        rows = np.asarray(live)
        arrs = {
            # str dtype (not object): load() stays allow_pickle=False, so a
            # tampered cache can never execute code (same rule as topk_io)
            "names": np.asarray([str(self.names[i]) for i in live]),
            "pooled_s1": np.asarray(self.pooled_s1, np.float32)[rows],
            "raw_s1": np.asarray(self.raw_s1)[rows].view(np.uint16),
            "fingerprint": np.asarray(json.dumps(self.fingerprint or {})),
        }
        if self.raw_s2 is not None:
            arrs["raw_s2"] = np.asarray(self.raw_s2)[rows].view(np.uint16)
        np.savez(path, **arrs)

    @classmethod
    def load(cls, path, expect_fingerprint: dict | None = None):
        """expect_fingerprint: when given, every key present in BOTH dicts
        must match, else ValueError — a cache built from different weights,
        split, or preprocessing must never silently serve."""
        import json

        import ml_dtypes

        z = np.load(path, allow_pickle=False)
        bf16 = lambda a: jnp.asarray(a.view(ml_dtypes.bfloat16))
        stored = (json.loads(str(z["fingerprint"]))
                  if "fingerprint" in z else {})
        if expect_fingerprint:
            bad = {k: (stored.get(k), v) for k, v in
                   expect_fingerprint.items()
                   if k in stored and stored[k] != v}
            if bad or not stored:
                raise ValueError(
                    f"index cache {path} does not match the current "
                    f"configuration (mismatched: {sorted(bad)} or no "
                    "fingerprint recorded) — delete it or point "
                    "--index-cache elsewhere to rebuild")
        return cls(names=[str(n) for n in z["names"]],
                   pooled_s1=jnp.asarray(z["pooled_s1"]),
                   raw_s1=bf16(z["raw_s1"]),
                   raw_s2=bf16(z["raw_s2"]) if "raw_s2" in z else None,
                   fingerprint=stored or None)


def build_serving_index(stage1, s1_params, classic_dataset, *,
                        reranker=None, s2_params=None,
                        batch_size: int = 16) -> ServingIndex:
    """Embed the whole corpus with the stage-I ViT (raw + pooled) and, when
    a re-ranker is given, the stage-II ViT (raw) — the serving equivalent of
    the offline extract_index_features (utils.py:25-72)."""
    from candidate_reranking_cir_tpu.retrieval.index import build_index

    @jax.jit
    def embed_s1(p, images):
        return stage1.apply(p, images, pool_and_normalize=True,
                            method=RetrievalModel.embed_images)

    raw1, pooled, names = build_index(
        classic_dataset, lambda im: embed_s1(s1_params, im), batch_size,
        pooled=True)
    raw2 = None
    if reranker is not None:
        @jax.jit
        def embed_s2(p, images):
            return reranker.apply(p, images,
                                  method=RerankerModel.embed_images)

        raw2, _, names2 = build_index(
            classic_dataset, lambda im: embed_s2(s2_params, im), batch_size,
            pooled=False)
        assert names2 == names
    return ServingIndex(names=names, pooled_s1=jnp.asarray(pooled),
                        raw_s1=raw1, raw_s2=raw2)


class CIRServingEngine:
    """Batched request handler over pre-compiled programs.

    q_pad: the static query-batch width. Incoming batches are padded to it
    (requests beyond q_pad are handled in successive waves).
    """

    def __init__(self, stage1, s1_params, tokenizer, index: ServingIndex, *,
                 text_len: int = 40, q_pad: int = 4,
                 reranker=None, s2_params=None, rerank_k: int = 50,
                 max_k: int = 100):
        self.stage1 = stage1
        self.s1_params = s1_params
        self.tokenizer = tokenizer
        self.index = index
        self.text_len = text_len
        self.q_pad = q_pad
        self.reranker = reranker
        self.s2_params = s2_params
        # static stage-II depth: one compiled [q_pad, K] grid regardless of
        # which requests share a wave (per-request k only trims the output);
        # recomputed on corpus updates (a corpus grown past the initial size
        # should re-rank at the full requested depth)
        self._req_rerank_k = rerank_k
        self.rerank_k = min(rerank_k, max(1, index.n_valid - 1))
        # +1 head-room so removing the reference still leaves max_k results;
        # bounded by capacity (not n_valid) so incremental additions never
        # shrink the compiled ranking depth
        self._req_max_k = max_k
        self.max_k = min(max_k + 1, index.capacity)

        @jax.jit
        def fuse_pooled(p, ref_feats, ids, mask):
            return stage1.apply(p, ref_feats, ids, mask,
                                method=RetrievalModel.fuse)

        @jax.jit
        def topk(pooled_index, valid, preds):
            sims = cosine_scores(preds, pooled_index)
            # tombstoned/free slots sink below every real candidate
            sims = jnp.where(valid[None, :], sims, -jnp.inf)
            return jax.lax.top_k(sims, self.max_k)

        @jax.jit
        def embed_image_s1(p, images):
            return stage1.apply(p, images, method=RetrievalModel.embed_images)

        @jax.jit
        def embed_s1_full(p, images):
            return stage1.apply(p, images, pool_and_normalize=True,
                                method=RetrievalModel.embed_images)

        self._embed_s1_full = embed_s1_full
        self._fuse_pooled = fuse_pooled
        self._topk = topk
        self._embed_image_s1 = embed_image_s1
        if reranker is not None:
            @jax.jit
            def embed_image_s2(p, images):
                return reranker.apply(p, images,
                                      method=RerankerModel.embed_images)

            self._embed_image_s2 = embed_image_s2

    def warmup(self):
        """Compile every serving program before traffic arrives — at the
        production shapes: the full-depth ranking AND the [q_pad, rerank_k]
        stage-II grid, so the first real request pays no XLA compile."""
        first = next(iter(self.index.pos))
        # clamp to the compiled ranking depth: a k past _req_max_k is a
        # client error by contract (_validate), and the compiled programs
        # depend on max_k/q_pad, not on the probe's k
        req = ServeRequest(caption="warm up", reference=first,
                           k=max(1, min(self.index.n_valid - 1,
                                        self._req_max_k)))
        self.handle([req])

    # ---- incremental corpus updates ----------------------------------------

    def add_images(self, names: list[str], images) -> None:
        """Index new corpus images without a rebuild: embed with the same
        stage-I (+stage-II) encoders and write into free bank slots. Banks
        grow by capacity doubling, so the ranking program recompiles at most
        O(log N) times over the corpus lifetime; additions are visible to
        the next request."""
        images = np.asarray(images, np.float32)
        if images.ndim != 4 or len(names) != images.shape[0]:
            raise ValueError("images must be [len(names), H, W, 3] "
                             "preprocessed float32")
        pooled, raw1, raw2 = [], [], []
        for i in range(len(names)):  # [1, ...] embeds: one compiled shape
            img = jnp.asarray(images[i:i + 1])
            r1, pl = self._embed_s1_full(self.s1_params, img)
            raw1.append(r1[0])
            pooled.append(pl[0])
            if self.reranker is not None:
                raw2.append(self._embed_image_s2(self.s2_params, img)[0])
        self.index.add_rows(
            names, jnp.stack(pooled), jnp.stack(raw1),
            jnp.stack(raw2) if raw2 else None)
        self.max_k = min(self._req_max_k + 1, self.index.capacity)
        self.rerank_k = min(self._req_rerank_k,
                            max(1, self.index.n_valid - 1))

    def remove_images(self, names: list[str]) -> None:
        """Tombstone corpus images: immediately absent from rankings; their
        slots are reused by later add_images."""
        self.index.remove_rows(names)
        self.rerank_k = min(self._req_rerank_k,
                            max(1, self.index.n_valid - 1))

    # ---- internals ---------------------------------------------------------

    def _validate(self, r: ServeRequest):
        """Fail fast with actionable messages (one bad request must not cost
        its wave-mates anything — see MicroBatcher's per-request retry)."""
        if not r.caption or not isinstance(r.caption, str):
            raise ValueError("caption (non-empty string) is required")
        if r.reference is None and r.reference_image is None:
            raise ValueError("either reference (a corpus image name) or "
                             "reference_path/reference_image is required")
        if r.reference is not None and r.reference not in self.index.pos:
            raise ValueError(f"unknown reference {r.reference!r}: not in the "
                             f"indexed corpus ({len(self.index.names)} "
                             "images)")
        if r.k < 1:
            raise ValueError(f"k must be >= 1, got {r.k}")
        if r.k > self._req_max_k:
            raise ValueError(
                f"k={r.k} exceeds this server's compiled ranking depth "
                f"max_k={self._req_max_k}; restart with a larger --max-k")

    def _ref_feats(self, requests, bank, embed_fn):
        """[B, M, W] reference features: corpus rows by name, or on-the-fly
        embeds for requests carrying a new image (memoized per request, so
        wave padding never recomputes a ViT forward)."""
        feats = []
        dtype = (jnp.bfloat16 if isinstance(bank, Int8Bank)
                 else bank.dtype)
        embed_cache: dict[int, jax.Array] = {}
        for r in requests:
            if r.reference_image is not None:
                if id(r) not in embed_cache:
                    img = jnp.asarray(r.reference_image)[None]
                    embed_cache[id(r)] = embed_fn(img)[0].astype(dtype)
                feats.append(embed_cache[id(r)])
            else:
                feats.append(take_rows(
                    bank, self.index.pos[r.reference], dtype=dtype))
        return jnp.stack(feats)

    def handle(self, requests: list[ServeRequest]) -> list[ServeResult]:
        for r in requests:
            self._validate(r)
        out: list[ServeResult] = []
        for start in range(0, len(requests), self.q_pad):
            out.extend(self._handle_wave(requests[start:start + self.q_pad]))
        return out

    def _handle_wave(self, requests) -> list[ServeResult]:
        n = len(requests)
        padded = list(requests) + [requests[0]] * (self.q_pad - n)

        ids, mask = self.tokenizer.encode([r.caption for r in padded],
                                          self.text_len, set_enc_token=True)
        ref1 = self._ref_feats(padded, self.index.raw_s1,
                               lambda im: self._embed_image_s1(
                                   self.s1_params, im))
        preds = self._fuse_pooled(self.s1_params, ref1, jnp.asarray(ids),
                                  jnp.asarray(mask))
        sims, idx = self._topk(self.index.pooled_s1, self.index.valid,
                               preds)
        sims = np.asarray(sims[:n], np.float32)
        idx = np.asarray(idx[:n])

        results = []
        names = self.index.names
        for qi, r in enumerate(requests):
            ranked = [(names[j], float(s))
                      for j, s in zip(idx[qi], sims[qi])
                      if np.isfinite(s)  # skip tombstoned/free slots
                      and (r.reference is None or names[j] != r.reference)]
            ranked = ranked[:r.k]
            results.append(ServeResult(ranking=[nm for nm, _ in ranked],
                                       scores=[s for _, s in ranked]))

        if self.reranker is not None:
            self._rerank_wave(requests, results)
        return results

    def _rerank_wave(self, requests, results):
        """Stage-II re-scores each query's head in ONE [q_pad, rerank_k]
        pair-grid call (static shape — a co-batched small-k request never
        changes the compiled program or another request's re-rank depth);
        the tail keeps stage-I order. Per-request depth is
        min(rerank_k, len(ranking)); shorter rows are padded with their last
        candidate and the padded scores are discarded. Requests whose
        reference is an uploaded image (not a corpus row) keep their stage-I
        order — z_t fusion needs the reference's corpus features."""
        rows = [qi for qi, r in enumerate(requests)
                if r.reference is not None and results[qi].ranking]
        if not rows:
            return
        kk = self.rerank_k
        depths = [min(kk, len(results[qi].ranking)) for qi in rows]
        topk_names = np.asarray(
            [[results[qi].ranking[min(j, d - 1)] for j in range(kk)]
             for qi, d in zip(rows, depths)], dtype=object)
        out = rerank(
            self.stage1, self.s1_params, self.reranker, self.s2_params,
            self.tokenizer,
            captions=[requests[qi].caption for qi in rows],
            reference_names=[requests[qi].reference for qi in rows],
            topk_names=topk_names,
            index_feats=self.index.raw_s2, index_names=self.index.names,
            text_len=self.text_len, q_batch=self.q_pad)
        for oi, (qi, d) in enumerate(zip(rows, depths)):
            res = results[qi]
            order = [j for j in out.order[oi] if j < d]
            head = [res.ranking[j] for j in order]
            head_scores = [float(out.logits[oi, j]) for j in order]
            res.ranking = head + res.ranking[d:]
            res.scores = head_scores + res.scores[d:]
            res.reranked = d


class _AdminOp:
    """Queue marker: a corpus mutation to run on the worker between waves."""

    def __init__(self, fn):
        self.fn = fn


class MicroBatcher:
    """Thread-safe request coalescing: concurrent callers block on their own
    future while a single worker drains the queue in waves of up to q_pad,
    amortizing one compiled program across them."""

    def __init__(self, engine: CIRServingEngine, window_ms: float = 3.0):
        self.engine = engine
        self.window = window_ms / 1000.0
        self.q: queue.Queue = queue.Queue()
        self._stop = threading.Event()
        self._lock = threading.Lock()
        # taken around every (check _stop, enqueue) pair and by close()
        # around _stop.set(): once close() holds it, no new item can slip
        # into the queue after the worker's final drain, so no caller is
        # ever left blocked on ev.wait()
        self._submit_lock = threading.Lock()
        self._requests = 0
        self._waves = 0
        self._errors = 0
        self._latencies: list[float] = []  # rolling, last 1024
        self.worker = threading.Thread(target=self._run, daemon=True)
        self.worker.start()

    def stats(self) -> dict:
        """Serving counters: totals, wave occupancy, latency percentiles
        (seconds, over the last 1024 requests)."""
        with self._lock:
            lats = sorted(self._latencies)
            n = len(lats)
            pct = (lambda p: lats[min(int(p * n), n - 1)]) if n else \
                (lambda p: 0.0)
            return {
                "requests": self._requests,
                "waves": self._waves,
                "errors": self._errors,
                "mean_wave_occupancy": round(
                    self._requests / self._waves, 3) if self._waves else 0.0,
                "latency_p50_s": round(pct(0.50), 4),
                "latency_p95_s": round(pct(0.95), 4),
                "latency_p99_s": round(pct(0.99), 4),
            }

    def submit(self, request: ServeRequest) -> ServeResult:
        import time

        t0 = time.perf_counter()
        ev = threading.Event()
        slot: dict = {}
        with self._submit_lock:
            if self._stop.is_set():
                raise RuntimeError("server is shutting down")
            self.q.put((request, ev, slot))
        ev.wait()
        with self._lock:
            self._latencies.append(time.perf_counter() - t0)
            if len(self._latencies) > 1024:
                del self._latencies[:512]
        if "error" in slot:
            raise slot["error"]
        return slot["result"]

    def submit_admin(self, fn):
        """Run a corpus mutation ON THE WORKER THREAD, strictly between
        waves — index updates never interleave with an in-flight wave's
        host-side result assembly."""
        ev = threading.Event()
        slot: dict = {}
        with self._submit_lock:
            if self._stop.is_set():
                raise RuntimeError("server is shutting down")
            self.q.put((_AdminOp(fn), ev, slot))
        ev.wait()
        if "error" in slot:
            raise slot["error"]
        return slot["result"]

    def _run(self):
        import time

        while not self._stop.is_set():
            try:
                first = self.q.get(timeout=0.1)
            except queue.Empty:
                continue
            if isinstance(first[0], _AdminOp):
                self._run_admin(first)
                continue
            batch = [first]
            admin_item = None
            # absolute deadline: the first request waits at most ONE window
            # regardless of how many stragglers trickle in behind it
            deadline = time.monotonic() + self.window
            while len(batch) < self.engine.q_pad:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    item = self.q.get(timeout=remaining)
                except queue.Empty:
                    break
                if isinstance(item[0], _AdminOp):
                    admin_item = item  # flush the wave first, then mutate
                    break
                batch.append(item)
            self._serve_batch(batch)
            if admin_item is not None:
                self._run_admin(admin_item)
        # shutdown: fail anything still queued instead of leaving callers
        # blocked on ev.wait() forever
        while True:
            try:
                _, ev, slot = self.q.get_nowait()
            except queue.Empty:
                break
            slot["error"] = RuntimeError("server is shutting down")
            ev.set()

    def _run_admin(self, item):
        op, ev, slot = item
        try:
            slot["result"] = op.fn()
        except Exception as e:
            slot["error"] = e
        ev.set()

    def _serve_batch(self, batch):
        reqs = [b[0] for b in batch]
        with self._lock:
            self._requests += len(reqs)
            self._waves += 1
        try:
            results = self.engine.handle(reqs)
            for (_, ev, slot), res in zip(batch, results):
                slot["result"] = res
                ev.set()
        except Exception:
            # one bad request must not fail its wave-mates: isolate by
            # retrying each request alone, so only the offender errors
            for req, ev, slot in batch:
                try:
                    slot["result"] = self.engine.handle([req])[0]
                except Exception as e:
                    with self._lock:
                        self._errors += 1
                    slot["error"] = e
                ev.set()

    def close(self):
        with self._submit_lock:
            self._stop.set()
        self.worker.join(timeout=5)
        # items enqueued before _stop became visible but after the worker's
        # final drain (or if the worker died): fail them rather than leave
        # their callers blocked forever
        while True:
            try:
                _, ev, slot = self.q.get_nowait()
            except queue.Empty:
                break
            slot["error"] = RuntimeError("server is shutting down")
            ev.set()
