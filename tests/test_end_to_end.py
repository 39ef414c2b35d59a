"""End-to-end pipeline test on a synthetic CIRR-format dataset:
stage-I validation -> top-k artifact -> stage-II re-rank evaluation.

Exercises dataset parsing, PIL preprocessing, index building, query fusion,
ranking/metrics, top-k IO, and the batched re-rank engine on tiny models.
"""
import json
from pathlib import Path

import jax
import numpy as np
import pytest

from candidate_reranking_cir_tpu.config import (
    RerankerModelConfig,
    RetrievalModelConfig,
    TextEncoderConfig,
    ViTConfig,
)
from candidate_reranking_cir_tpu.data.datasets import CIRRDataset
from candidate_reranking_cir_tpu.data.preprocessing import make_transform
from candidate_reranking_cir_tpu.data.topk_io import (
    load_topk_file,
    save_topk_file,
)
from candidate_reranking_cir_tpu.models.blip_reranker import RerankerModel
from candidate_reranking_cir_tpu.models.blip_retrieval import RetrievalModel
from candidate_reranking_cir_tpu.models.tokenizer import (
    WordPieceTokenizer,
    build_test_vocab,
)
from candidate_reranking_cir_tpu.retrieval import metrics as M
from candidate_reranking_cir_tpu.retrieval.index import build_index
from candidate_reranking_cir_tpu.retrieval.rerank import rerank
from candidate_reranking_cir_tpu.retrieval.validate_engine import (
    evaluate_cirr_stage1,
)

N_IMAGES = 12
N_QUERIES = 6
IMG = 32

VIT = ViTConfig(image_size=IMG, patch_size=8, hidden_size=24, num_layers=2,
                num_heads=4)
TEXT = TextEncoderConfig(vocab_size=256, hidden_size=24, num_layers=2,
                         num_heads=4, intermediate_size=48, encoder_width=24,
                         hidden_dropout=0.0, attention_dropout=0.0,
                         merge_mlp_from=1)


@pytest.fixture(scope="module")
def cirr_root(tmp_path_factory):
    """Fake CIRR dataset: 12 jpegs, 6 val triplets with 6-member groups."""
    import PIL.Image

    root = tmp_path_factory.mktemp("data")
    base = root / "cirr_dataset"
    (base / "cirr" / "captions").mkdir(parents=True)
    (base / "cirr" / "image_splits").mkdir(parents=True)
    (base / "img").mkdir()

    rng = np.random.default_rng(0)
    names = [f"im{i}" for i in range(N_IMAGES)]
    relpath = {}
    for i, name in enumerate(names):
        arr = rng.integers(0, 255, size=(40 + i, 30 + 2 * i, 3),
                           dtype=np.uint8)
        p = base / "img" / f"{name}.jpg"
        PIL.Image.fromarray(arr).save(p, quality=92)
        relpath[name] = f"img/{name}.jpg"

    triplets = []
    for q in range(N_QUERIES):
        ref = names[q]
        tgt = names[(q + 3) % N_IMAGES]
        members = [ref, tgt] + [names[(q + 5 + j) % N_IMAGES] for j in
                                range(4)]
        triplets.append({
            "pairid": q,
            "reference": ref,
            "target_hard": tgt,
            "caption": f"the dress is red and blue {q}",
            "img_set": {"members": members},
        })

    with open(base / "cirr" / "captions" / "cap.rc2.val.json", "w") as f:
        json.dump(triplets, f)
    with open(base / "cirr" / "image_splits" / "split.rc2.val.json", "w") as f:
        json.dump(relpath, f)
    return root


@pytest.fixture(scope="module")
def models():
    s1_cfg = RetrievalModelConfig(vit=VIT, text=TEXT, embed_dim=16, text_len=10)
    s2_cfg = RerankerModelConfig(vit=VIT, text=TEXT, text_len=10)
    s1 = RetrievalModel(s1_cfg)
    s2 = RerankerModel(s2_cfg)
    imgs = np.zeros((2, IMG, IMG, 3), np.float32)
    ids = np.ones((2, 10), np.int32)
    msk = np.ones((2, 10), np.int32)
    z = np.zeros((2, 10, 24), np.float32)
    s1_params = s1.init(jax.random.key(0), imgs, ids, msk)
    s2_params = s2.init(jax.random.key(1), imgs, ids, msk, z)
    return s1, s1_params, s2, s2_params


@pytest.fixture(scope="module")
def tokenizer():
    tok = WordPieceTokenizer(build_test_vocab())
    tok.overflow = "truncate"  # tiny text bucket by design
    return tok


def test_dataset_parsing(cirr_root):
    transform = make_transform("targetpad", IMG, 1.25)
    classic = CIRRDataset(cirr_root, "val", "classic", transform)
    assert len(classic) == N_IMAGES
    s = classic[0]
    assert s["image"].shape == (IMG, IMG, 3)
    # CLIP normalization: values roughly in [-2.2, 2.7]
    assert -3 < s["image"].min() and s["image"].max() < 3

    relative = CIRRDataset(cirr_root, "val", "relative", transform)
    assert len(relative) == N_QUERIES
    q = relative[0]
    assert q["reference_name"] == "im0" and q["target_name"] == "im3"
    assert len(q["group_members"]) == 6


def test_stage1_eval_and_topk_roundtrip(cirr_root, models, tokenizer,
                                        tmp_path):
    s1, s1_params, _, _ = models
    transform = make_transform("targetpad", IMG, 1.25)
    classic = CIRRDataset(cirr_root, "val", "classic", transform)
    relative = CIRRDataset(cirr_root, "val", "relative", transform)

    result, payload = evaluate_cirr_stage1(
        s1, s1_params, classic, relative, tokenizer, text_len=10,
        batch_size=4, save_topk_k=8)

    mets = result.metrics
    # random model: sane recall bounds and monotonicity
    assert 0 <= mets["recall_at1"] <= mets["recall_at5"] <= \
        mets["recall_at10"] <= 100
    # group recall@3 over 5 members with random scores ~ around 60;
    # exact-one-hot asserts inside guarantee correctness of labels
    assert 0 <= mets["group_recall_at1"] <= mets["group_recall_at3"] <= 100
    assert payload["sorted_index_names"].shape == (N_QUERIES, 8)
    assert payload["labels"].shape == (N_QUERIES, 8)
    assert payload["group_labels"].shape == (N_QUERIES, 5)

    # roundtrip npz AND torch .pt interop
    for name in ("topk.npz", "topk.pt"):
        path = tmp_path / name
        save_topk_file(path, payload)
        loaded = load_topk_file(path)
        assert loaded["split"] == "val"
        np.testing.assert_array_equal(
            np.asarray(loaded["labels"], bool), payload["labels"])
        assert ([str(x) for x in loaded["sorted_index_names"][0]]
                == [str(x) for x in payload["sorted_index_names"][0]])


@pytest.mark.slow
def test_single_program_eval_matches_multi_program(cirr_root, models,
                                                   tokenizer):
    """evaluate_cirr_stage1(single_program=True) — the whole eval as ONE
    device program (embed scan + fusion family scans + ranking) — must
    reproduce the multi-launch path's metrics, ranking names and payload
    exactly (same scheduler, same math, different executor)."""
    s1, s1_params, _, _ = models
    transform = make_transform("targetpad", IMG, 1.25)
    classic = CIRRDataset(cirr_root, "val", "classic", transform)
    relative = CIRRDataset(cirr_root, "val", "relative", transform)

    kw = dict(text_len=10, batch_size=4, save_topk_k=8, q_batch=4)
    res_multi, pay_multi = evaluate_cirr_stage1(
        s1, s1_params, classic, relative, tokenizer, **kw)
    res_single, pay_single = evaluate_cirr_stage1(
        s1, s1_params, classic, relative, tokenizer, single_program=True,
        **kw)

    assert res_single.metrics == res_multi.metrics
    np.testing.assert_array_equal(res_single.ranking.sorted_index_names,
                                  res_multi.ranking.sorted_index_names)
    np.testing.assert_array_equal(res_single.ranking.labels,
                                  res_multi.ranking.labels)
    np.testing.assert_array_equal(pay_single["sorted_index_names"],
                                  pay_multi["sorted_index_names"])
    np.testing.assert_array_equal(pay_single["labels"], pay_multi["labels"])


@pytest.mark.slow
def test_stage2_rerank_end_to_end(cirr_root, models, tokenizer, tmp_path):
    s1, s1_params, s2, s2_params = models
    transform = make_transform("targetpad", IMG, 1.25)
    classic = CIRRDataset(cirr_root, "val", "classic", transform)
    relative = CIRRDataset(cirr_root, "val", "relative", transform)

    # stage-I top-k
    _, payload = evaluate_cirr_stage1(
        s1, s1_params, classic, relative, tokenizer, text_len=10,
        batch_size=4, save_topk_k=8)
    topk_path = tmp_path / "topk.npz"
    payload["split"] = "val"
    save_topk_file(topk_path, payload)

    k = 4
    relative_k = CIRRDataset(cirr_root, "val", "relative", transform,
                             load_topk=topk_path, k=k)
    samples = [relative_k[i] for i in range(len(relative_k))]
    captions = [s["caption"] for s in samples]
    refs = [s["reference_name"] for s in samples]
    targets = [s["target_name"] for s in samples]
    groups = [s["group_members"] for s in samples]
    topk_names = np.stack([np.asarray(s["topk_names"]) for s in samples])
    topk_labels = np.stack([s["topk_labels"] for s in samples])

    # stage-II index with the stage-II ViT
    import jax.numpy as jnp

    @jax.jit
    def embed(images):
        return s2.apply(s2_params, images, method=RerankerModel.embed_images)

    raw, _, index_names = build_index(classic, embed, 4, pooled=False)

    skip = ~topk_labels.any(axis=1)
    out = rerank(s1, s1_params, s2, s2_params, tokenizer,
                 captions=captions, reference_names=refs,
                 topk_names=topk_names, index_feats=raw,
                 index_names=index_names, text_len=10, q_batch=4,
                 skip_mask=skip, group_members=groups)

    assert out.logits.shape == (N_QUERIES, k)
    assert out.group_logits.shape == (N_QUERIES, 5)
    # skipped rows carry the sentinel
    if skip.any():
        assert (out.logits[skip] < -90000).all()

    labels2 = M.reranked_labels(topk_labels, out.order)
    assert labels2.shape == (N_QUERIES, k)
    # a query whose target was in top-k still has exactly one positive
    np.testing.assert_array_equal(labels2.sum(1), topk_labels.sum(1))

    # group labels: one positive each (target always among the 5 non-ref)
    from candidate_reranking_cir_tpu.retrieval.rerank import cirr_group_labels

    members_no_ref = [[m for m in g if m != r][:5]
                      for g, r in zip(groups, refs)]
    glabels = cirr_group_labels(members_no_ref, out.group_order, targets)
    np.testing.assert_array_equal(glabels.sum(1), np.ones(N_QUERIES))

    # candidate-major scheduling: same logits as the query-major path
    # (skipped rows carry the sentinel in both; groups scored in both)
    from candidate_reranking_cir_tpu.retrieval.rerank import (
        rerank_candidate_major,
    )

    out_cm = rerank_candidate_major(
        s1, s1_params, s2, s2_params, tokenizer,
        captions=captions, reference_names=refs, topk_names=topk_names,
        index_feats=raw, index_names=index_names, text_len=10,
        skip_mask=skip, group_members=groups,
        pairs_per_call=16, q_buckets=(2, 8), zt_batch=4)
    np.testing.assert_allclose(out_cm.logits, out.logits,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(out_cm.group_logits, out.group_logits,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(out_cm.order, out.order)


@pytest.mark.slow
def test_mesh_eval_matches_single_device(cirr_root, models, tokenizer,
                                         tmp_path):
    """Engine-level multi-chip wiring: stage-I and stage-II evaluation on the
    8-device mesh produce metrics identical to the single-device run."""
    from candidate_reranking_cir_tpu.parallel.mesh import make_mesh
    from candidate_reranking_cir_tpu.retrieval.validate2_engine import (
        evaluate_cirr_stage2,
    )

    s1, s1_params, s2, s2_params = models
    transform = make_transform("targetpad", IMG, 1.25)
    classic = CIRRDataset(cirr_root, "val", "classic", transform)
    relative = CIRRDataset(cirr_root, "val", "relative", transform)
    mesh = make_mesh()

    res_1dev, payload = evaluate_cirr_stage1(
        s1, s1_params, classic, relative, tokenizer, text_len=10,
        batch_size=4, save_topk_k=8)
    res_mesh, payload_m = evaluate_cirr_stage1(
        s1, s1_params, classic, relative, tokenizer, text_len=10,
        batch_size=8, save_topk_k=8, mesh=mesh)
    assert res_mesh.metrics == res_1dev.metrics
    np.testing.assert_array_equal(payload_m["labels"], payload["labels"])
    np.testing.assert_array_equal(payload_m["sorted_index_names"],
                                  payload["sorted_index_names"])

    topk_path = tmp_path / "topk_mesh.npz"
    payload["split"] = "val"
    save_topk_file(topk_path, payload)

    common = dict(data_root=cirr_root, transform=transform,
                  top_k_path=topk_path, k=4, text_len=10, batch_size=4)
    mets_1dev = evaluate_cirr_stage2(
        s1, s1_params, s2, s2_params, tokenizer,
        schedule="query_major", q_batch=4, **common)
    mets_mesh = evaluate_cirr_stage2(
        s1, s1_params, s2, s2_params, tokenizer, mesh=mesh,
        schedule="candidate_major", batch_size=8,
        **{k: v for k, v in common.items() if k != "batch_size"})
    for key, val in mets_1dev.items():
        assert abs(mets_mesh[key] - val) < 1e-9, (key, mets_mesh[key], val)


@pytest.mark.slow
def test_sharded_index_eval_matches_replicated(cirr_root, models, tokenizer,
                                               tmp_path):
    """Corpus-sharded feature bank (build_index shard_index=True +
    rerank_candidate_major index_sharded=True): identical stage-II metrics to
    the replicated-bank run — each chip scores only its own candidates and
    z_t reference rows arrive via the distributed psum gather."""
    from candidate_reranking_cir_tpu.parallel.mesh import make_mesh
    from candidate_reranking_cir_tpu.retrieval.validate2_engine import (
        evaluate_cirr_stage2,
    )

    s1, s1_params, s2, s2_params = models
    transform = make_transform("targetpad", IMG, 1.25)
    classic = CIRRDataset(cirr_root, "val", "classic", transform)
    relative = CIRRDataset(cirr_root, "val", "relative", transform)
    mesh = make_mesh()

    _, payload = evaluate_cirr_stage1(
        s1, s1_params, classic, relative, tokenizer, text_len=10,
        batch_size=4, save_topk_k=8)
    topk_path = tmp_path / "topk_shard.npz"
    payload["split"] = "val"
    save_topk_file(topk_path, payload)

    common = dict(data_root=cirr_root, transform=transform,
                  top_k_path=topk_path, k=4, text_len=10, batch_size=8,
                  mesh=mesh, schedule="candidate_major")
    mets_rep = evaluate_cirr_stage2(s1, s1_params, s2, s2_params, tokenizer,
                                    **common)
    mets_shard = evaluate_cirr_stage2(s1, s1_params, s2, s2_params, tokenizer,
                                      shard_index=True, **common)
    for key, val in mets_rep.items():
        assert abs(mets_shard[key] - val) < 1e-9, (key, mets_shard[key], val)


@pytest.mark.slow
def test_rerank_dedup_with_shrunk_mesh(cirr_root, models, tokenizer,
                                       tmp_path):
    """Regression: rerank(dedup=True) on a mesh that fit_mesh shrinks (q_batch
    not divisible by the device count) must reshard the unique-candidate bank
    and pair map onto the fitted mesh instead of crashing with incompatible
    devices."""
    from candidate_reranking_cir_tpu.parallel.mesh import make_mesh

    s1, s1_params, s2, s2_params = models
    transform = make_transform("targetpad", IMG, 1.25)
    classic = CIRRDataset(cirr_root, "val", "classic", transform)
    relative = CIRRDataset(cirr_root, "val", "relative", transform)

    _, payload = evaluate_cirr_stage1(
        s1, s1_params, classic, relative, tokenizer, text_len=10,
        batch_size=4, save_topk_k=4)
    samples_names = payload["sorted_index_names"]

    @jax.jit
    def embed(images):
        return s2.apply(s2_params, images, method=RerankerModel.embed_images)

    mesh = make_mesh()
    raw, _, index_names = build_index(classic, embed, 8, pooled=False,
                                      mesh=mesh)
    captions = [f"the dress {i}" for i in range(N_QUERIES)]
    refs = [f"im{i}" for i in range(N_QUERIES)]

    out_ref = rerank(s1, s1_params, s2, s2_params, tokenizer,
                     captions=captions, reference_names=refs,
                     topk_names=samples_names, index_feats=raw,
                     index_names=index_names, text_len=10, q_batch=4)
    # q_batch=4 on 8 devices -> fit_mesh shrinks to 4; dedup branch active
    out = rerank(s1, s1_params, s2, s2_params, tokenizer,
                 captions=captions, reference_names=refs,
                 topk_names=samples_names, index_feats=raw,
                 index_names=index_names, text_len=10, q_batch=4,
                 dedup=True, mesh=mesh)
    np.testing.assert_allclose(out.logits, out_ref.logits, rtol=2e-4,
                               atol=2e-4)


@pytest.mark.slow
def test_candidate_major_fuzz_equals_query_major(models, tokenizer):
    """Randomized workloads (sizes, skips, group presence, duplicate
    candidates across queries): candidate-major scheduling must reproduce the
    query-major logits exactly (up to fp reassociation)."""
    import jax.numpy as jnp

    from candidate_reranking_cir_tpu.retrieval.rerank import (
        rerank_candidate_major,
    )

    s1, s1_params, s2, s2_params = models
    rng = np.random.default_rng(11)
    m_tokens = (IMG // 8) ** 2 + 1

    for trial in range(3):
        n_idx = int(rng.integers(12, 20))
        n_q = int(rng.integers(3, 9))
        k = int(rng.integers(2, 6))
        do_groups = bool(trial % 2)
        index_names = [f"im{i}" for i in range(n_idx)]
        feats = jnp.asarray(rng.normal(size=(n_idx, m_tokens, 24)) * 0.1,
                            jnp.float32)
        topk = np.empty((n_q, k), object)
        refs, groups = [], []
        for q in range(n_q):
            sel = rng.choice(n_idx, size=k + 6, replace=False)
            topk[q] = [index_names[i] for i in sel[:k]]
            refs.append(index_names[sel[k]])
            groups.append([index_names[i] for i in sel[k:]])
        skip = rng.random(n_q) < 0.3
        # variable word counts so the auto L-bucketing (l_buckets='auto')
        # splits queries across text widths; query-major scores everything
        # at the full text_len bucket — the comparison proves L-invariance
        captions = [" ".join(["red"] * int(rng.integers(1, 8)))
                    for _ in range(n_q)]
        kw = dict(captions=captions, reference_names=refs, topk_names=topk,
                  index_feats=feats, index_names=index_names, text_len=10,
                  skip_mask=skip,
                  group_members=groups if do_groups else None)

        out_qm = rerank(s1, s1_params, s2, s2_params, tokenizer,
                        q_batch=4, **kw)
        out_cm = rerank_candidate_major(
            s1, s1_params, s2, s2_params, tokenizer,
            pairs_per_call=8, q_buckets=(2, 4), zt_batch=4, **kw)
        np.testing.assert_allclose(out_cm.logits, out_qm.logits,
                                   rtol=3e-4, atol=3e-4)
        if do_groups:
            np.testing.assert_allclose(out_cm.group_logits,
                                       out_qm.group_logits,
                                       rtol=3e-4, atol=3e-4)


@pytest.mark.slow
def test_l_bucket_resolution():
    from candidate_reranking_cir_tpu.retrieval.rerank import resolve_l_buckets

    lengths = np.asarray([5, 9, 9, 10, 12, 13, 14, 15, 16, 33])
    assert resolve_l_buckets(None, lengths, 40) == [40]
    # explicit buckets must still cover the longest query
    assert resolve_l_buckets((8, 16), lengths, 40) == [8, 16, 40]
    assert resolve_l_buckets((8, 16, 40), lengths, 40) == [8, 16, 40]
    # auto: percentile cuts rounded up to multiples of 8, max covered
    auto = resolve_l_buckets("auto", lengths, 40)
    assert auto[-1] >= 33 and all(b % 8 == 0 for b in auto)
    # buckets never exceed text_len
    assert resolve_l_buckets((64,), lengths, 40) == [40]


@pytest.mark.slow
def test_l_bucketed_scores_match_single_bucket(models, tokenizer):
    """Mixed-length captions scored through narrow L-buckets equal the
    single-bucket scores: pad keys are masked additively (-10000 =>
    exp underflows to 0.0), so scores are invariant to pad width."""
    import jax.numpy as jnp

    from candidate_reranking_cir_tpu.retrieval.rerank import (
        rerank_candidate_major,
    )

    s1, s1_params, s2, s2_params = models
    rng = np.random.default_rng(5)
    m_tokens = (IMG // 8) ** 2 + 1
    n_idx, n_q, k = 14, 6, 3
    index_names = [f"im{i}" for i in range(n_idx)]
    feats = jnp.asarray(rng.normal(size=(n_idx, m_tokens, 24)) * 0.1,
                        jnp.float32)
    topk = np.empty((n_q, k), object)
    refs, groups = [], []
    for q in range(n_q):
        sel = rng.choice(n_idx, size=k + 6, replace=False)
        topk[q] = [index_names[i] for i in sel[:k]]
        refs.append(index_names[sel[k]])
        groups.append([index_names[i] for i in sel[k:]])
    captions = [" ".join(["blue"] * w) for w in (1, 2, 5, 9, 3, 7)]
    kw = dict(captions=captions, reference_names=refs, topk_names=topk,
              index_feats=feats, index_names=index_names, text_len=12,
              group_members=groups, pairs_per_call=8, q_buckets=(2, 4),
              zt_batch=4)

    out_one = rerank_candidate_major(s1, s1_params, s2, s2_params, tokenizer,
                                     l_buckets=None, **kw)
    out_bkt = rerank_candidate_major(s1, s1_params, s2, s2_params, tokenizer,
                                     l_buckets=(8, 12), **kw)
    np.testing.assert_allclose(out_bkt.logits, out_one.logits,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out_bkt.group_logits, out_one.group_logits,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(out_bkt.order, out_one.order)


@pytest.mark.slow
def test_image_major_fusion_matches_query_major():
    """predict_queries(image_major=True) — reference-image-major K/V
    amortization with power-of-2 query chunks — must produce the same
    features as the query-major path (identical math, different schedule)."""
    import jax.numpy as jnp

    from candidate_reranking_cir_tpu.config import (
        RetrievalModelConfig,
        TextEncoderConfig,
        vit_config,
    )
    from candidate_reranking_cir_tpu.models.blip_retrieval import RetrievalModel
    from candidate_reranking_cir_tpu.models.tokenizer import (
        WordPieceTokenizer,
        build_test_vocab,
    )
    from candidate_reranking_cir_tpu.retrieval.validate_engine import (
        make_stage1_fns,
        predict_queries,
    )

    rng = np.random.default_rng(11)
    cfg = RetrievalModelConfig(
        vit=vit_config("base", 64),
        text=TextEncoderConfig(num_layers=2, vocab_size=256,
                               hidden_size=64, num_heads=4,
                               intermediate_size=128),
    )
    # tiny vit to init, but fusion consumes raw features directly
    import dataclasses
    cfg = dataclasses.replace(
        cfg, vit=dataclasses.replace(cfg.vit, hidden_size=64, num_layers=1,
                                     num_heads=2))
    model = RetrievalModel(cfg, dtype=jnp.float32)
    tok = WordPieceTokenizer(build_test_vocab())

    n_idx, n_q, M, W = 7, 23, 9, 64
    index_feats = jnp.asarray(rng.normal(size=(n_idx, M, W)), jnp.float32)
    index_names = [f"im{i}" for i in range(n_idx)]
    # skewed sharing: image 0 gets many queries (exercises 8/4/2/1 chunks)
    ref_rows = [0] * 11 + [1] * 5 + [2] * 3 + [3] * 2 + [4, 5]
    ref_names = [index_names[i] for i in ref_rows]
    caps = [f"q {'x ' * (i % 5)}{i}" for i in range(n_q)]

    ids = jnp.ones((2, 8), jnp.int32)
    params = model.init(jax.random.key(0),
                        jnp.zeros((2, 64, 64, 3)), ids, ids)
    _, fuse = make_stage1_fns(model, params)

    out_im = np.asarray(predict_queries(
        fuse, tok, caps, ref_names, index_feats, index_names, 24,
        q_batch=8, image_major=True))
    out_qm = np.asarray(predict_queries(
        fuse, tok, caps, ref_names, index_feats, index_names, 24,
        q_batch=8, image_major=False))
    np.testing.assert_allclose(out_im, out_qm, atol=2e-5)


@pytest.mark.slow
def test_image_major_fusion_with_fused_attention():
    """image_major + fused_attention=True on the text encoder: the grouped
    cross-attention rows (Q*L) can cross the folded-kernel threshold — the
    interpret-mode kernel must still match the query-major XLA path."""
    import dataclasses

    import jax.numpy as jnp

    from candidate_reranking_cir_tpu.config import (
        RetrievalModelConfig,
        TextEncoderConfig,
        vit_config,
    )
    from candidate_reranking_cir_tpu.models.blip_retrieval import RetrievalModel
    from candidate_reranking_cir_tpu.models.tokenizer import (
        WordPieceTokenizer,
        build_test_vocab,
    )
    from candidate_reranking_cir_tpu.retrieval.validate_engine import (
        make_stage1_fns,
        predict_queries,
    )

    rng = np.random.default_rng(13)
    text = TextEncoderConfig(num_layers=2, vocab_size=256, hidden_size=64,
                             num_heads=2, intermediate_size=128,
                             encoder_width=64)
    vit = dataclasses.replace(vit_config("base", 64), hidden_size=64,
                              num_layers=1, num_heads=2)
    tok = WordPieceTokenizer(build_test_vocab())

    n_idx, n_q, M = 4, 18, 300  # M >= MIN_KV=256 so the kernels engage
    index_feats = jnp.asarray(rng.normal(size=(n_idx, M, 64)), jnp.float32)
    index_names = [f"im{i}" for i in range(n_idx)]
    ref_rows = [0] * 9 + [1] * 5 + [2] * 3 + [3]
    ref_names = [index_names[i] for i in ref_rows]
    caps = [f"q {i}" for i in range(n_q)]
    ids = jnp.ones((2, 8), jnp.int32)

    outs = {}
    for fused in (False, True):
        cfg = RetrievalModelConfig(
            vit=vit, text=dataclasses.replace(text, fused_attention=fused))
        model = RetrievalModel(cfg, dtype=jnp.float32)
        params = model.init(jax.random.key(0), jnp.zeros((2, 64, 64, 3)),
                            ids, ids)
        _, fuse = make_stage1_fns(model, params)
        outs[fused] = np.asarray(predict_queries(
            fuse, tok, caps, ref_names, index_feats, index_names, 24,
            q_batch=8, image_major=fused))  # fused: image-major; plain: qm
    np.testing.assert_allclose(outs[True], outs[False], atol=2e-5)
