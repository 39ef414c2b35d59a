"""int8 feature-bank tests: quantization error bound, gather equivalence,
scheduler integration (scores close to the bf16 bank), serving integration,
and the unsupported-combination guard."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from candidate_reranking_cir_tpu.ops.quant import (
    Int8Bank,
    bank_len,
    dequantize,
    quantize_bank,
    take_rows,
)


def test_quantize_error_bound(rng):
    feats = rng.normal(size=(6, 17, 32)).astype(np.float32) * \
        rng.uniform(0.01, 10.0, size=(6, 17, 1))  # wildly varying row scales
    bank = quantize_bank(feats)
    assert bank.q.dtype == jnp.int8
    assert bank.shape == feats.shape
    back = np.asarray(dequantize(bank, jnp.float32))
    # symmetric per-row quantization: |err| <= scale/2 = max|row|/254
    row_max = np.abs(feats).max(axis=-1, keepdims=True)
    assert (np.abs(back - feats) <= row_max / 254 + 1e-7).all()
    # ~half the bytes of bf16
    assert bank.nbytes < feats.size * 2 * 0.6


def test_take_rows_dispatch(rng):
    feats = rng.normal(size=(8, 5, 16)).astype(np.float32)
    bank = quantize_bank(feats)
    idx = jnp.asarray([3, 0, 7])
    plain = take_rows(jnp.asarray(feats), idx)
    quant = take_rows(bank, idx, dtype=jnp.float32)
    assert plain.shape == quant.shape == (3, 5, 16)
    np.testing.assert_allclose(np.asarray(quant), feats[[3, 0, 7]],
                               atol=0.05, rtol=0.01)
    assert bank_len(bank) == bank_len(jnp.asarray(feats)) == 8
    # pytree round-trip (jit boundary)
    leaves, td = jax.tree_util.tree_flatten(bank)
    back = jax.tree_util.tree_unflatten(td, leaves)
    assert isinstance(back, Int8Bank)

    @jax.jit
    def gather(b, i):
        return take_rows(b, i, dtype=jnp.float32)

    np.testing.assert_array_equal(np.asarray(gather(bank, idx)),
                                  np.asarray(quant))


def _tiny_stack():
    from candidate_reranking_cir_tpu.config import (
        RerankerModelConfig,
        RetrievalModelConfig,
        TextEncoderConfig,
        ViTConfig,
    )
    from candidate_reranking_cir_tpu.models.blip_reranker import RerankerModel
    from candidate_reranking_cir_tpu.models.blip_retrieval import (
        RetrievalModel,
    )
    from candidate_reranking_cir_tpu.models.tokenizer import (
        WordPieceTokenizer,
        build_test_vocab,
    )

    vit = ViTConfig(image_size=32, patch_size=8, hidden_size=24, num_layers=2,
                    num_heads=4)
    text = TextEncoderConfig(vocab_size=256, hidden_size=24, num_layers=2,
                             num_heads=4, intermediate_size=48,
                             encoder_width=24, hidden_dropout=0.0,
                             attention_dropout=0.0, merge_mlp_from=1)
    s1 = RetrievalModel(RetrievalModelConfig(vit=vit, text=text, embed_dim=16,
                                             text_len=10))
    s2 = RerankerModel(RerankerModelConfig(vit=vit, text=text, text_len=10))
    imgs = np.zeros((2, 32, 32, 3), np.float32)
    ids = np.ones((2, 10), np.int32)
    s1p = s1.init(jax.random.key(0), imgs, ids, ids)
    s2p = s2.init(jax.random.key(1), imgs, ids, ids,
                  np.zeros((2, 10, 24), np.float32))
    tok = WordPieceTokenizer(build_test_vocab())
    tok.overflow = "truncate"
    return s1, s1p, s2, s2p, tok


@pytest.mark.slow
def test_rerank_with_int8_bank_close_to_bf16(rng):
    from candidate_reranking_cir_tpu.retrieval.rerank import (
        rerank_candidate_major,
    )

    s1, s1p, s2, s2p, tok = _tiny_stack()
    n_idx, n_q, k = 12, 5, 3
    names = [f"im{i}" for i in range(n_idx)]
    feats = jnp.asarray(rng.normal(size=(n_idx, 17, 24)) * 0.1, jnp.float32)
    topk = np.empty((n_q, k), object)
    refs = []
    for q in range(n_q):
        sel = rng.choice(n_idx, size=k + 1, replace=False)
        topk[q] = [names[i] for i in sel[:k]]
        refs.append(names[sel[k]])
    kw = dict(captions=[f"a red dress {q}" for q in range(n_q)],
              reference_names=refs, topk_names=topk, index_names=names,
              text_len=10, pairs_per_call=8, q_buckets=(2, 4), zt_batch=4)

    full = rerank_candidate_major(s1, s1p, s2, s2p, tok, index_feats=feats,
                                  **kw)
    quant = rerank_candidate_major(s1, s1p, s2, s2p, tok,
                                   index_feats=quantize_bank(feats), **kw)
    # per-element quantization error ~0.4% -> logits shift slightly but stay
    # close after 2 dual layers on tiny random weights
    np.testing.assert_allclose(quant.logits, full.logits, atol=0.05,
                               rtol=0.05)


@pytest.mark.slow
def test_int8_with_sharded_index_rejected(rng):
    from candidate_reranking_cir_tpu.parallel.mesh import make_mesh
    from candidate_reranking_cir_tpu.retrieval.rerank import (
        rerank_candidate_major,
    )

    s1, s1p, s2, s2p, tok = _tiny_stack()
    feats = quantize_bank(rng.normal(size=(8, 17, 24)).astype(np.float32))
    with pytest.raises(ValueError, match="int8"):
        rerank_candidate_major(
            s1, s1p, s2, s2p, tok, captions=["x"], reference_names=["im0"],
            topk_names=np.asarray([["im1"]], object), index_feats=feats,
            index_names=[f"im{i}" for i in range(8)], text_len=10,
            mesh=make_mesh(), index_sharded=True)


@pytest.mark.slow
def test_serving_with_int8_index(rng):
    from candidate_reranking_cir_tpu.runtime.serve import (
        CIRServingEngine,
        ServeRequest,
        ServingIndex,
    )

    s1, s1p, s2, s2p, tok = _tiny_stack()
    n = 10
    names = [f"im{i}" for i in range(n)]
    pooled = rng.normal(size=(n, 16)).astype(np.float32)
    pooled /= np.linalg.norm(pooled, axis=-1, keepdims=True)
    raw1 = jnp.asarray(rng.normal(size=(n, 17, 24)) * 0.1, jnp.float32)
    raw2 = jnp.asarray(rng.normal(size=(n, 17, 24)) * 0.1, jnp.float32)
    index = ServingIndex(names=names, pooled_s1=jnp.asarray(pooled),
                         raw_s1=raw1, raw_s2=raw2)
    bf16_eng = CIRServingEngine(s1, s1p, tok, index, text_len=10, q_pad=2,
                                reranker=s2, s2_params=s2p, rerank_k=4,
                                max_k=n)
    res_full = bf16_eng.handle([ServeRequest(caption="blue", reference="im1",
                                             k=6)])[0]

    # caches must store full precision
    import pathlib
    import tempfile

    with pytest.raises(ValueError, match="quantize"):
        q_index = ServingIndex(names=names, pooled_s1=jnp.asarray(pooled),
                               raw_s1=raw1, raw_s2=raw2).quantize()
        q_index.save(pathlib.Path(tempfile.mkdtemp()) / "x.npz")

    eng = CIRServingEngine(s1, s1p, tok, q_index, text_len=10, q_pad=2,
                           reranker=s2, s2_params=s2p, rerank_k=4, max_k=n)
    res_q = eng.handle([ServeRequest(caption="blue", reference="im1",
                                     k=6)])[0]
    assert len(res_q.ranking) == 6 and res_q.reranked == 4
    # the pooled ranking bank is NOT quantized, but the reference-image
    # fusion features come from the quantized raw_s1 bank, so the cosine
    # order can shift at the k-boundary — assert strong overlap, not
    # equality (a boundary flip under different rounding is legitimate)
    assert len(set(res_q.ranking) & set(res_full.ranking)) >= 5


def test_cli_rejects_int8_plus_shard_index():
    from candidate_reranking_cir_tpu.cli import validate_stage2

    with pytest.raises(SystemExit) as e:
        validate_stage2.main([
            "--dataset", "CIRR", "--data-root", ".", "--stage1-path", "x",
            "--stage2-path", "y", "--top-k-path", "z",
            "--index-int8", "--shard-index"])
    assert e.value.code == 2  # argparse error, before any work
