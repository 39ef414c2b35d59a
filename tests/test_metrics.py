import numpy as np
import pytest

from candidate_reranking_cir_tpu.retrieval.metrics import (
    cirr_metrics,
    cirr_ranking,
    fiq_metrics,
    fiq_ranking,
    reranked_labels,
)


def test_fiq_recall_closed_form():
    # 4 queries, 6 index images; targets placed at known ranks
    index = [f"im{i}" for i in range(6)]
    sorted_names = np.array([
        ["im0", "im1", "im2", "im3", "im4", "im5"],
        ["im1", "im0", "im2", "im3", "im4", "im5"],
        ["im2", "im3", "im0", "im1", "im4", "im5"],
        ["im5", "im4", "im3", "im2", "im1", "im0"],
    ], dtype=object)
    targets = ["im0", "im0", "im0", "im0"]  # ranks 1, 2, 3, 6
    res = fiq_ranking(sorted_names, targets)
    assert res.recall_at(1) == pytest.approx(25.0)
    assert res.recall_at(2) == pytest.approx(50.0)
    assert res.recall_at(3) == pytest.approx(75.0)
    assert res.recall_at(6) == pytest.approx(100.0)


def test_fiq_one_hot_assert():
    sorted_names = np.array([["a", "b", "a"]], dtype=object)
    with pytest.raises(AssertionError):
        fiq_ranking(sorted_names, ["a"])


def test_cirr_reference_removal_and_groups():
    # corpus of 6; query's reference image must be dropped from its ranking
    sorted_names = np.array([
        ["ref", "t", "g1", "g2", "g3", "g4"],
        ["g1", "ref", "g2", "t", "g3", "g4"],
    ], dtype=object)
    refs = ["ref", "ref"]
    targets = ["t", "t"]
    groups = [["ref", "t", "g1", "g2", "g3", "g4"]] * 2
    res = cirr_ranking(sorted_names, refs, targets, groups)
    # after removal: row0 = [t g1 g2 g3 g4], row1 = [g1 g2 t g3 g4]
    assert res.sorted_index_names.shape == (2, 5)
    assert res.recall_at(1) == pytest.approx(50.0)
    assert res.recall_at(3) == pytest.approx(100.0)
    # subset = group minus reference = 5 members, all present here
    assert res.group_labels.shape == (2, 5)
    assert res.subset_recall_at(1) == pytest.approx(50.0)
    assert res.subset_recall_at(3) == pytest.approx(100.0)

    m = cirr_metrics(res)
    assert m["mean_r5_rs1"] == pytest.approx(
        (m["recall_at5"] + m["group_recall_at1"]) / 2)


def test_reranked_labels_take_along_axis():
    labels = np.array([[False, True, False], [True, False, False]])
    order = np.array([[1, 0, 2], [2, 1, 0]])
    out = reranked_labels(labels, order)
    assert out.tolist() == [[True, False, False], [False, False, True]]


# ---------------------------------------------------------------------------
# device-side truncated ranking ≡ full-argsort path


def _synthetic_eval(n_idx=40, n_q=23, seed=0, ties=True):
    rng = np.random.default_rng(seed)
    pred = rng.normal(size=(n_q, 8)).astype(np.float32)
    pooled = rng.normal(size=(n_idx, 8)).astype(np.float32)
    if ties:
        # duplicated index rows force EXACT distance ties -> exercises the
        # stable tie-break (lowest corpus index first) in both paths
        pooled[1] = pooled[7] = pooled[30]
        pooled[12] = pooled[3]
    index_names = [f"im{i}" for i in range(n_idx)]
    refs, targets, groups = [], [], []
    for q in range(n_q):
        sel = rng.choice(n_idx, size=6, replace=False)
        refs.append(index_names[sel[0]])
        targets.append(index_names[sel[1]])
        groups.append([index_names[i] for i in sel])
    return pred, pooled, index_names, refs, targets, groups


@pytest.mark.parametrize("width", [12, 40, 64])
def test_ranked_slices_equals_full_argsort_cirr(width):
    from candidate_reranking_cir_tpu.retrieval.metrics import (
        cirr_ranking_from_ranks,
        rank_names,
    )
    from candidate_reranking_cir_tpu.retrieval.validate_engine import (
        full_ranking,
        ranked_slices,
    )

    pred, pooled, index_names, refs, targets, groups = _synthetic_eval()
    # old path: full stable argsort + name-level label construction
    names_sorted = rank_names(full_ranking(pred, pooled), index_names)
    old = cirr_ranking(names_sorted, refs, targets, groups)

    pos = {n: i for i, n in enumerate(index_names)}
    members = [[m for m in g if m != r][:5] for g, r in zip(groups, refs)]
    ent = np.asarray([[pos[t], pos[r], *[pos[m] for m in row]]
                      for t, r, row in zip(targets, refs, members)], np.int32)
    topk_idx, ranks = ranked_slices(pred, pooled, width, ent)
    new = cirr_ranking_from_ranks(topk_idx, index_names, targets, members,
                                  target_ranks=ranks[:, 0],
                                  ref_ranks=ranks[:, 1],
                                  member_ranks=ranks[:, 2:])

    w = new.sorted_index_names.shape[1]
    np.testing.assert_array_equal(new.sorted_index_names,
                                  old.sorted_index_names[:, :w])
    np.testing.assert_array_equal(new.labels, old.labels[:, :w])
    np.testing.assert_array_equal(new.group_labels, old.group_labels)
    for k in (1, 2, 5, 10):
        if k <= w:
            assert new.recall_at(k) == old.recall_at(k)
    for k in (1, 2, 3):
        assert new.subset_recall_at(k) == old.subset_recall_at(k)


def test_ranked_slices_equals_full_argsort_fiq():
    from candidate_reranking_cir_tpu.retrieval.metrics import (
        fiq_ranking_from_ranks,
        rank_names,
    )
    from candidate_reranking_cir_tpu.retrieval.validate_engine import (
        full_ranking,
        ranked_slices,
    )

    pred, pooled, index_names, _, targets, _ = _synthetic_eval(seed=3)
    names_sorted = rank_names(full_ranking(pred, pooled), index_names)
    old = fiq_ranking(names_sorted, targets)

    pos = {n: i for i, n in enumerate(index_names)}
    ent = np.asarray([[pos[t]] for t in targets], np.int32)
    topk_idx, ranks = ranked_slices(pred, pooled, 40, ent)
    new = fiq_ranking_from_ranks(topk_idx, index_names, targets,
                                 target_ranks=ranks[:, 0])
    np.testing.assert_array_equal(new.sorted_index_names,
                                  old.sorted_index_names)
    np.testing.assert_array_equal(new.labels, old.labels)


def test_ranked_slices_mesh_matches_single_device():
    from candidate_reranking_cir_tpu.retrieval.validate_engine import (
        ranked_slices,
    )

    pred, pooled, index_names, refs, targets, groups = _synthetic_eval(
        n_q=19, seed=5)  # 19 does not divide the mesh -> exercises padding
    pos = {n: i for i, n in enumerate(index_names)}
    ent = np.asarray([[pos[t], pos[r]] for t, r in zip(targets, refs)],
                     np.int32)
    a_idx, a_rank = ranked_slices(pred, pooled, 16, ent)
    from candidate_reranking_cir_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    b_idx, b_rank = ranked_slices(pred, pooled, 16, ent, mesh=mesh)
    np.testing.assert_array_equal(a_idx, b_idx)
    np.testing.assert_array_equal(a_rank, b_rank)


@pytest.mark.slow
def test_predict_queries_l_buckets_bit_exact():
    """Bucketed fusion widths must not change the features: pad keys are
    additively masked at -10000, so their softmax weight underflows to
    exactly 0.0 regardless of the padded width. (Verified max-abs-diff 0.0
    on TPU; the CPU backend's reduction tree re-associates per shape, so a
    1-ulp tolerance is allowed here.)"""
    import jax.numpy as jnp

    from candidate_reranking_cir_tpu.config import (
        RetrievalModelConfig,
        TextEncoderConfig,
        ViTConfig,
    )
    from candidate_reranking_cir_tpu.models.blip_retrieval import (
        RetrievalModel,
    )
    from candidate_reranking_cir_tpu.models.tokenizer import (
        WordPieceTokenizer,
        build_test_vocab,
    )
    from candidate_reranking_cir_tpu.retrieval.validate_engine import (
        make_stage1_fns,
        predict_queries,
    )

    cfg = RetrievalModelConfig(
        vit=ViTConfig(image_size=16, patch_size=8, hidden_size=16,
                      num_layers=1, num_heads=2),
        text=TextEncoderConfig(vocab_size=128, hidden_size=16, num_layers=2,
                               num_heads=2, intermediate_size=32,
                               encoder_width=16, hidden_dropout=0.0,
                               attention_dropout=0.0),
        embed_dim=8, text_len=32)
    model = RetrievalModel(cfg)
    import jax

    params = model.init(jax.random.key(0), jnp.zeros((2, 16, 16, 3)),
                        jnp.ones((2, 32), jnp.int32),
                        jnp.ones((2, 32), jnp.int32))
    _, fuse = make_stage1_fns(model, params)
    tok = WordPieceTokenizer(build_test_vocab())
    tok.overflow = "truncate"

    rng = np.random.default_rng(0)
    n_idx, n_q = 6, 11
    index_names = [f"im{i}" for i in range(n_idx)]
    feats = jnp.asarray(rng.normal(scale=0.1, size=(n_idx, 5, 16)),
                        jnp.float32)
    caps = ["a", "a red dress with the same image of a dog and a cat",
            "red blue dog", "the dress is red and blue and the dog is",
            "cat", "dog cat dress shirt red blue", "a dog",
            "same same same same", "red", "a cat wearing a red dress",
            "blue shirt"]
    refs = [index_names[i] for i in rng.integers(0, n_idx, n_q)]

    kw = dict(text_len=32, q_batch=4)
    bucketed = np.asarray(predict_queries(fuse, tok, caps, refs, feats,
                                          index_names, l_buckets="auto",
                                          **kw))
    single = np.asarray(predict_queries(fuse, tok, caps, refs, feats,
                                        index_names, l_buckets=None, **kw))
    np.testing.assert_allclose(bucketed, single, rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_embed_scan_matches_per_batch_embed():
    """make_embed_scan (one-dispatch index build) must equal the per-batch
    embed exactly."""
    import jax
    import jax.numpy as jnp
    from candidate_reranking_cir_tpu.config import (
        RetrievalModelConfig,
        TextEncoderConfig,
        ViTConfig,
    )
    from candidate_reranking_cir_tpu.models.blip_retrieval import (
        RetrievalModel,
    )
    from candidate_reranking_cir_tpu.retrieval.validate_engine import (
        make_embed_scan,
        make_stage1_fns,
    )

    cfg = RetrievalModelConfig(
        vit=ViTConfig(image_size=16, patch_size=8, hidden_size=16,
                      num_layers=1, num_heads=2),
        text=TextEncoderConfig(vocab_size=128, hidden_size=16, num_layers=1,
                               num_heads=2, intermediate_size=32,
                               encoder_width=16),
        embed_dim=8, text_len=8)
    model = RetrievalModel(cfg)
    params = model.init(jax.random.key(0), jnp.zeros((2, 16, 16, 3)),
                        jnp.ones((2, 8), jnp.int32),
                        jnp.ones((2, 8), jnp.int32))
    embed, _ = make_stage1_fns(model, params)
    embed_scan = make_embed_scan(model, params)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(3, 4, 16, 16, 3)), jnp.float32)
    raw_s, pooled_s = embed_scan(imgs)
    assert raw_s.shape[:2] == (3, 4) and pooled_s.shape == (3, 4, 8)
    for i in range(3):
        raw_b, pooled_b = embed(imgs[i])
        np.testing.assert_allclose(np.asarray(raw_s[i]), np.asarray(raw_b),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(pooled_s[i]),
                                   np.asarray(pooled_b), atol=1e-6)
