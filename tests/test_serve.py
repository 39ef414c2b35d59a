"""Serving subsystem tests: engine semantics (reference removal, stage-II
head re-scoring, uploaded-image references), index cache round-trip, the
micro-batcher, and the HTTP transport end-to-end on an ephemeral port."""
import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

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
    ServingIndex,

)

pytestmark = pytest.mark.slow  # serving stack fixture compiles the engines (~30 s)

IMG = 32
N = 10
VIT = ViTConfig(image_size=IMG, patch_size=8, hidden_size=24, num_layers=2,
                num_heads=4)
TEXT = TextEncoderConfig(vocab_size=256, hidden_size=24, num_layers=2,
                         num_heads=4, intermediate_size=48, encoder_width=24,
                         hidden_dropout=0.0, attention_dropout=0.0,
                         merge_mlp_from=1)


@pytest.fixture(scope="module")
def stack():
    import jax.numpy as jnp

    s1_cfg = RetrievalModelConfig(vit=VIT, text=TEXT, embed_dim=16,
                                  text_len=10)
    s2_cfg = RerankerModelConfig(vit=VIT, text=TEXT, text_len=10)
    s1 = RetrievalModel(s1_cfg)
    s2 = RerankerModel(s2_cfg)
    imgs = np.zeros((2, IMG, IMG, 3), np.float32)
    ids = np.ones((2, 10), np.int32)
    msk = np.ones((2, 10), np.int32)
    z = np.zeros((2, 10, 24), np.float32)
    s1_params = s1.init(jax.random.key(0), imgs, ids, msk)
    s2_params = s2.init(jax.random.key(1), imgs, ids, msk, z)
    tok = WordPieceTokenizer(build_test_vocab())
    tok.overflow = "truncate"

    rng = np.random.default_rng(0)
    names = [f"im{i}" for i in range(N)]
    m = (IMG // 8) ** 2 + 1
    raw1 = jnp.asarray(rng.normal(size=(N, m, 24)) * 0.1, jnp.float32)
    raw2 = jnp.asarray(rng.normal(size=(N, m, 24)) * 0.1, jnp.float32)
    pooled = rng.normal(size=(N, 16)).astype(np.float32)
    pooled /= np.linalg.norm(pooled, axis=-1, keepdims=True)
    index = ServingIndex(names=names, pooled_s1=jnp.asarray(pooled),
                         raw_s1=raw1, raw_s2=raw2)
    return s1, s1_params, s2, s2_params, tok, index


def make_engine(stack, with_reranker=True, q_pad=3):
    s1, s1_params, s2, s2_params, tok, index = stack
    return CIRServingEngine(
        s1, s1_params, tok, index, text_len=10, q_pad=q_pad,
        reranker=s2 if with_reranker else None,
        s2_params=s2_params if with_reranker else None,
        rerank_k=4, max_k=N)


def test_stage1_serving_removes_reference(stack):
    eng = make_engine(stack, with_reranker=False)
    res = eng.handle([ServeRequest(caption="red dress",
                                   reference="im3", k=N)])[0]
    assert "im3" not in res.ranking
    assert len(res.ranking) == N - 1
    assert res.reranked == 0
    # scores descend (stage-I cosine order)
    assert res.scores == sorted(res.scores, reverse=True)


def test_stage2_head_reranked(stack):
    eng = make_engine(stack)
    k = 8
    res1 = make_engine(stack, with_reranker=False).handle(
        [ServeRequest(caption="blue shirt", reference="im1", k=k)])[0]
    res2 = eng.handle([ServeRequest(caption="blue shirt", reference="im1",
                                    k=k)])[0]
    assert res2.reranked == 4
    # head is a permutation of the stage-I head; tail identical
    assert sorted(res2.ranking[:4]) == sorted(res1.ranking[:4])
    assert res2.ranking[4:] == res1.ranking[4:]
    # head scores are re-ranker logits, descending
    assert res2.scores[:4] == sorted(res2.scores[:4], reverse=True)


def test_multi_wave_and_uploaded_reference(stack):
    eng = make_engine(stack, q_pad=2)
    rng = np.random.default_rng(3)
    img = rng.normal(size=(IMG, IMG, 3)).astype(np.float32) * 0.3
    reqs = [ServeRequest(caption=f"cap {i}", reference=f"im{i}", k=5)
            for i in range(3)]
    reqs.append(ServeRequest(caption="uploaded", reference=None,
                             reference_image=img, k=5))
    out = eng.handle(reqs)  # 4 requests -> 2 waves at q_pad=2
    assert len(out) == 4
    for i in range(3):
        assert f"im{i}" not in out[i].ranking
        assert out[i].reranked == 4
    # uploaded reference: full k results, stage-I order only
    assert len(out[3].ranking) == 5
    assert out[3].reranked == 0


def test_engine_results_independent_of_batching(stack):
    eng = make_engine(stack, q_pad=4)
    reqs = [ServeRequest(caption=f"colorful {i}", reference=f"im{i}", k=6)
            for i in range(4)]
    batched = eng.handle(reqs)
    single = [eng.handle([r])[0] for r in reqs]
    for b, s in zip(batched, single):
        assert b.ranking == s.ranking
        np.testing.assert_allclose(b.scores, s.scores, rtol=1e-4, atol=1e-5)


def test_index_cache_roundtrip(stack, tmp_path):
    *_, index = stack
    p = tmp_path / "index.npz"
    index.save(p)
    back = ServingIndex.load(p)
    assert back.names == index.names
    np.testing.assert_array_equal(np.asarray(back.pooled_s1),
                                  np.asarray(index.pooled_s1))
    # bf16 bit-exact through the uint16 view
    np.testing.assert_array_equal(
        np.asarray(back.raw_s1).view(np.uint16),
        np.asarray(index.raw_s1).view(np.uint16))
    assert back.raw_s2 is not None


def test_micro_batcher_concurrent(stack):
    eng = make_engine(stack, q_pad=4)
    eng.warmup()
    batcher = MicroBatcher(eng, window_ms=20)
    results = {}

    def call(i):
        results[i] = batcher.submit(
            ServeRequest(caption=f"cap {i}", reference=f"im{i}", k=5))

    threads = [threading.Thread(target=call, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    stats = batcher.stats()
    batcher.close()
    assert set(results) == set(range(6))
    for i, res in results.items():
        assert f"im{i}" not in res.ranking
        assert len(res.ranking) == 5
    assert stats["requests"] == 6 and stats["errors"] == 0
    assert 1 <= stats["waves"] <= 6
    assert stats["latency_p99_s"] >= stats["latency_p50_s"] > 0


def test_http_server_end_to_end(stack):
    from candidate_reranking_cir_tpu.cli.serve import make_http_server

    eng = make_engine(stack)
    eng.warmup()
    server = make_http_server(eng, 0, window_ms=5)  # ephemeral port
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health == {"status": "ok", "corpus": N}

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/statsz", timeout=30) as r:
            stats0 = json.loads(r.read())
        assert stats0["requests"] == 0

        body = json.dumps({"caption": "a red hat", "reference": "im2",
                           "k": 5}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/rank", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        assert len(out["ranking"]) == 5 and "im2" not in out["ranking"]
        assert out["reranked"] == 4

        # malformed request -> 400 with an error payload
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/rank", data=b"{not json",
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(bad, timeout=30)
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()
        server.batcher.close()


def test_per_request_k_does_not_truncate_wavemates(stack):
    """A co-batched small-k request must not shrink another request's
    re-rank depth (the grid runs at the static rerank_k width)."""
    eng = make_engine(stack, q_pad=2)
    small = ServeRequest(caption="tiny", reference="im0", k=2)
    big = ServeRequest(caption="large", reference="im1", k=8)
    out = eng.handle([small, big])
    assert out[0].reranked == 2 and len(out[0].ranking) == 2
    assert out[1].reranked == 4 and len(out[1].ranking) == 8
    # identical to scoring 'big' alone
    alone = eng.handle([big])[0]
    assert out[1].ranking == alone.ranking


def test_validation_messages(stack):
    eng = make_engine(stack, with_reranker=False)
    with pytest.raises(ValueError, match="caption"):
        eng.handle([ServeRequest(caption="", reference="im0")])
    with pytest.raises(ValueError, match="reference"):
        eng.handle([ServeRequest(caption="x")])
    with pytest.raises(ValueError, match="unknown reference"):
        eng.handle([ServeRequest(caption="x", reference="nope.png")])
    with pytest.raises(ValueError, match="k must be"):
        eng.handle([ServeRequest(caption="x", reference="im0", k=0)])


def test_micro_batcher_isolates_bad_requests(stack):
    """One invalid request in a coalesced wave errors alone; wave-mates
    still get their results."""
    eng = make_engine(stack, with_reranker=False, q_pad=4)
    eng.warmup()
    batcher = MicroBatcher(eng, window_ms=50)
    results, errors = {}, {}

    def call(i, ref):
        try:
            results[i] = batcher.submit(
                ServeRequest(caption=f"c {i}", reference=ref, k=3))
        except ValueError as e:
            errors[i] = str(e)

    threads = [
        threading.Thread(target=call, args=(0, "im0")),
        threading.Thread(target=call, args=(1, "does-not-exist")),
        threading.Thread(target=call, args=(2, "im2")),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    stats = batcher.stats()
    batcher.close()
    assert set(results) == {0, 2} and set(errors) == {1}
    assert "unknown reference" in errors[1]
    assert stats["errors"] == 1


def test_index_cache_fingerprint_mismatch(stack, tmp_path):
    *_, index = stack
    index.fingerprint = {"stage1": "abc", "split": "val"}
    p = tmp_path / "fp.npz"
    index.save(p)
    # matching expectation loads fine
    ServingIndex.load(p, expect_fingerprint={"stage1": "abc", "split": "val"})
    # stale weights -> refuse
    with pytest.raises(ValueError, match="does not match"):
        ServingIndex.load(p, expect_fingerprint={"stage1": "OTHER"})
    # cache without a fingerprint also refuses when one is expected
    index.fingerprint = None
    index.save(p)
    with pytest.raises(ValueError, match="does not match"):
        ServingIndex.load(p, expect_fingerprint={"stage1": "abc"})


class _MemDataset:
    """In-memory 'classic' dataset for index building in tests."""
    mode = "classic"

    def __init__(self, names, images):
        self._names = names
        self._images = images
        self.index_names = names

    def __len__(self):
        return len(self._names)

    def __getitem__(self, i):
        return {"name": self._names[i], "image": self._images[i]}


def test_incremental_updates_match_fresh_index(stack):
    """add_images/remove_images: an incrementally-built index serves the
    same rankings as a fresh build of the same corpus; removal tombstones
    take effect immediately; slots are reused; capacity doubles on growth."""
    from candidate_reranking_cir_tpu.runtime.serve import (
        CIRServingEngine,
        ServeRequest,
        build_serving_index,
    )

    s1, s1_params, s2, s2_params, tok, _ = stack
    rng = np.random.default_rng(9)
    names12 = [f"img{i}" for i in range(12)]
    imgs12 = (rng.normal(size=(12, IMG, IMG, 3)) * 0.3).astype(np.float32)

    idx_full = build_serving_index(
        s1, s1_params, _MemDataset(names12, imgs12),
        reranker=s2, s2_params=s2_params, batch_size=4)
    idx_inc = build_serving_index(
        s1, s1_params, _MemDataset(names12[:8], imgs12[:8]),
        reranker=s2, s2_params=s2_params, batch_size=4)

    eng_full = CIRServingEngine(s1, s1_params, tok, idx_full, text_len=10,
                                q_pad=2, reranker=s2, s2_params=s2_params,
                                rerank_k=4, max_k=12)
    eng_inc = CIRServingEngine(s1, s1_params, tok, idx_inc, text_len=10,
                               q_pad=2, reranker=s2, s2_params=s2_params,
                               rerank_k=4, max_k=12)

    assert idx_inc.capacity == 8
    eng_inc.add_images(names12[8:], imgs12[8:])
    assert idx_inc.capacity == 16  # grew to the next power of two
    assert idx_inc.n_valid == 12

    req = ServeRequest(caption="a red dress", reference="img2", k=8)
    res_full = eng_full.handle([req])[0]
    res_inc = eng_inc.handle([req])[0]
    assert res_inc.ranking == res_full.ranking
    np.testing.assert_allclose(res_inc.scores, res_full.scores,
                               rtol=1e-4, atol=1e-5)
    # querying BY a freshly added reference works (its features are indexed)
    res_new = eng_inc.handle([ServeRequest(caption="blue", reference="img10",
                                           k=5)])[0]
    assert len(res_new.ranking) == 5 and "img10" not in res_new.ranking

    # removal: tombstoned immediately, rejected as a reference
    eng_inc.remove_images(["img5"])
    assert idx_inc.n_valid == 11
    res_after = eng_inc.handle([req])[0]
    assert "img5" not in res_after.ranking
    with pytest.raises(ValueError, match="unknown reference"):
        eng_inc.handle([ServeRequest(caption="x", reference="img5")])

    # the freed slot is reused: capacity unchanged by the next addition
    extra = (rng.normal(size=(1, IMG, IMG, 3)) * 0.3).astype(np.float32)
    eng_inc.add_images(["img_extra"], extra)
    assert idx_inc.capacity == 16 and idx_inc.n_valid == 12
    res_extra = eng_inc.handle([ServeRequest(caption="x",
                                             reference="img_extra", k=5)])[0]
    assert len(res_extra.ranking) == 5

    # duplicate-name rejection
    with pytest.raises(ValueError, match="already indexed"):
        eng_inc.add_images(["img0"], extra)


def test_incremental_index_cache_compacts(stack, tmp_path):
    from candidate_reranking_cir_tpu.runtime.serve import (
        CIRServingEngine,
        ServeRequest,
        ServingIndex,
        build_serving_index,
    )

    s1, s1_params, s2, s2_params, tok, _ = stack
    rng = np.random.default_rng(11)
    names = [f"pic{i}" for i in range(6)]
    imgs = (rng.normal(size=(6, IMG, IMG, 3)) * 0.3).astype(np.float32)
    idx = build_serving_index(s1, s1_params, _MemDataset(names, imgs),
                              reranker=s2, s2_params=s2_params, batch_size=3)
    eng = CIRServingEngine(s1, s1_params, tok, idx, text_len=10, q_pad=2,
                           reranker=s2, s2_params=s2_params, rerank_k=3,
                           max_k=6)
    eng.remove_images(["pic1"])
    extra = (rng.normal(size=(2, IMG, IMG, 3)) * 0.3).astype(np.float32)
    eng.add_images(["pic6", "pic7"], extra)

    p = tmp_path / "inc.npz"
    idx.save(p)
    back = ServingIndex.load(p)
    assert sorted(back.names) == sorted(idx.pos)  # compacted: live rows only
    assert back.capacity == back.n_valid == 7

    eng2 = CIRServingEngine(s1, s1_params, tok, back, text_len=10, q_pad=2,
                            reranker=s2, s2_params=s2_params, rerank_k=3,
                            max_k=6)
    req = ServeRequest(caption="green hat", reference="pic6", k=4)
    r1 = eng.handle([req])[0]
    r2 = eng2.handle([req])[0]
    assert r1.ranking == r2.ranking


def test_http_admin_endpoints(stack, tmp_path):
    """POST /admin/add indexes a new image (decoded with the serving
    transform); /admin/remove tombstones; both 404 unless --enable-admin."""
    import PIL.Image

    from candidate_reranking_cir_tpu.cli.serve import make_http_server
    from candidate_reranking_cir_tpu.data.preprocessing import make_transform
    from candidate_reranking_cir_tpu.runtime.serve import (
        CIRServingEngine,
        build_serving_index,
    )

    s1, s1_params, s2, s2_params, tok, _ = stack
    rng = np.random.default_rng(21)
    names = [f"base{i}" for i in range(6)]
    imgs = (rng.normal(size=(6, IMG, IMG, 3)) * 0.3).astype(np.float32)
    idx = build_serving_index(s1, s1_params, _MemDataset(names, imgs),
                              reranker=s2, s2_params=s2_params, batch_size=3)
    eng = CIRServingEngine(s1, s1_params, tok, idx, text_len=10, q_pad=2,
                           reranker=s2, s2_params=s2_params, rerank_k=3,
                           max_k=6)
    eng._transform = make_transform("targetpad", IMG, 1.25)
    eng.warmup()

    new_img = tmp_path / "new.jpg"
    PIL.Image.fromarray(
        rng.integers(0, 255, size=(40, 36, 3), dtype=np.uint8)).save(new_img)

    def post(port, path, obj):
        body = json.dumps(obj).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            return json.loads(r.read())

    # admin disabled: 404
    server0 = make_http_server(eng, 0, window_ms=5, enable_admin=False)
    port0 = server0.server_address[1]
    threading.Thread(target=server0.serve_forever, daemon=True).start()
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            post(port0, "/admin/add", {"names": ["x"],
                                       "paths": [str(new_img)]})
        assert e.value.code == 404
    finally:
        server0.shutdown()
        server0.batcher.close()

    server = make_http_server(eng, 0, window_ms=5, enable_admin=True)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        out = post(port, "/admin/add", {"names": ["fresh"],
                                        "paths": [str(new_img)]})
        assert out == {"added": 1, "corpus": 7}
        # the new image is immediately rankable AND usable as a reference
        res = post(port, "/rank", {"caption": "a red dress",
                                   "reference": "fresh", "k": 5})
        assert len(res["ranking"]) == 5 and "fresh" not in res["ranking"]
        res2 = post(port, "/rank", {"caption": "a red dress",
                                    "reference": "base0", "k": 6})
        assert "fresh" in res2["ranking"]

        out = post(port, "/admin/remove", {"names": ["fresh"]})
        assert out == {"removed": 1, "corpus": 6}
        res3 = post(port, "/rank", {"caption": "a red dress",
                                    "reference": "base0", "k": 6})
        assert "fresh" not in res3["ranking"]
    finally:
        server.shutdown()
        server.batcher.close()


def test_rerank_depth_grows_with_corpus(stack):
    """An engine built on a tiny corpus re-ranks at the full requested
    depth once additions make the corpus big enough."""
    from candidate_reranking_cir_tpu.runtime.serve import (
        CIRServingEngine,
        ServeRequest,
        build_serving_index,
    )

    s1, s1_params, s2, s2_params, tok, _ = stack
    rng = np.random.default_rng(33)
    imgs = (rng.normal(size=(8, IMG, IMG, 3)) * 0.3).astype(np.float32)
    idx = build_serving_index(s1, s1_params,
                              _MemDataset([f"t{i}" for i in range(3)],
                                          imgs[:3]),
                              reranker=s2, s2_params=s2_params, batch_size=3)
    eng = CIRServingEngine(s1, s1_params, tok, idx, text_len=10, q_pad=2,
                           reranker=s2, s2_params=s2_params, rerank_k=5,
                           max_k=8)
    assert eng.rerank_k == 2  # capped by the 3-image corpus
    eng.add_images([f"t{i}" for i in range(3, 8)], imgs[3:])
    assert eng.rerank_k == 5  # full requested depth after growth
    res = eng.handle([ServeRequest(caption="x", reference="t0", k=7)])[0]
    assert res.reranked == 5 and len(res.ranking) == 7


def test_warmup_with_corpus_larger_than_max_k(stack):
    """Regression: warmup() used to probe with k = n_valid - 1, which the
    k > max_k validation (added for silent-truncation safety) rejects
    whenever the corpus outgrows the compiled ranking depth — i.e. every
    production-sized server crashed at startup. The probe must clamp."""
    s1, s1_params, s2, s2_params, tok, index = stack
    eng = CIRServingEngine(
        s1, s1_params, tok, index, text_len=10, q_pad=3,
        reranker=s2, s2_params=s2_params, rerank_k=4, max_k=3)  # 3 < N
    eng.warmup()
    out = eng.handle([ServeRequest(caption="red", reference="im0", k=3)])
    assert len(out[0].ranking) == 3
