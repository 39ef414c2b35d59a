"""Multi-device tests on the 8-device virtual CPU mesh: sharded train steps,
global contrastive equivalence, sharded top-k."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from candidate_reranking_cir_tpu.config import (
    RerankerModelConfig,
    RetrievalModelConfig,
    TextEncoderConfig,
    TrainConfig,
    ViTConfig,
)
from candidate_reranking_cir_tpu.models.blip_reranker import RerankerModel
from candidate_reranking_cir_tpu.models.blip_retrieval import RetrievalModel
from candidate_reranking_cir_tpu.ops.topk import cosine_topk, sharded_cosine_topk
from candidate_reranking_cir_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
    shard_batch,
)
from candidate_reranking_cir_tpu.runtime.optim import make_optimizer
from candidate_reranking_cir_tpu.runtime.train_steps import (
    TrainState,
    make_stage1_train_step,
    make_stage2_train_step,
)

VIT = ViTConfig(image_size=16, patch_size=8, hidden_size=16, num_layers=2,
                num_heads=2)
TEXT = TextEncoderConfig(vocab_size=64, hidden_size=16, num_layers=2,
                         num_heads=2, intermediate_size=32, encoder_width=16,
                         merge_mlp_from=1)
S1 = RetrievalModelConfig(vit=VIT, text=TEXT, embed_dim=8, text_len=6)
S2 = RerankerModelConfig(vit=VIT, text=TEXT, text_len=6)


def _stage1_batch(b, rng):
    return {
        "ref_images": rng.normal(size=(b, 16, 16, 3)).astype(np.float32),
        "target_images": rng.normal(size=(b, 16, 16, 3)).astype(np.float32),
        "input_ids": rng.integers(4, 60, size=(b, 6)).astype(np.int32),
        "attention_mask": np.ones((b, 6), np.int32),
    }


def test_eight_devices_present():
    assert jax.device_count() == 8


@pytest.mark.slow
def test_stage1_train_step_sharded():
    mesh = make_mesh()
    model = RetrievalModel(S1)
    rng = np.random.default_rng(0)
    batch = _stage1_batch(16, rng)
    params = model.init(jax.random.key(0), batch["ref_images"],
                        batch["input_ids"], batch["attention_mask"])
    tx, _ = make_optimizer(TrainConfig(), params, steps_per_epoch=10,
                           freeze_prefixes=("params/visual_encoder",))
    state = TrainState.create(params, tx)

    with jax.set_mesh(mesh):
        rep = replicated(mesh)
        state = jax.device_put(state, rep)
        sharded = shard_batch(mesh, batch)
        step = make_stage1_train_step(model, donate=False)
        new_state, loss = step(state, sharded, jax.random.key(1))
        assert np.isfinite(float(loss))
        assert int(new_state.step) == 1

        # frozen ViT must not move
        old_v = jax.tree.leaves(state.params["params"]["visual_encoder"])
        new_v = jax.tree.leaves(new_state.params["params"]["visual_encoder"])
        for a, b in zip(old_v, new_v):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # text encoder must move
        moved = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(
                jax.tree.leaves(state.params["params"]["text_encoder"]),
                jax.tree.leaves(new_state.params["params"]["text_encoder"])))
        assert moved


@pytest.mark.slow
def test_stage1_global_contrast_matches_single_device():
    """Sharded loss == single-device loss on identical inputs (the global-batch
    contrast is exact, not an approximation)."""
    from candidate_reranking_cir_tpu.runtime.train_steps import stage1_loss

    model = RetrievalModel(S1)
    rng = np.random.default_rng(1)
    batch = _stage1_batch(8, rng)
    params = model.init(jax.random.key(0), batch["ref_images"],
                        batch["input_ids"], batch["attention_mask"])

    loss_single, _ = jax.jit(
        lambda p, b: stage1_loss(model, p, b, None, finetune_vit=False,
                                 train=False))(params, batch)

    mesh = make_mesh()
    with jax.set_mesh(mesh):
        sharded = shard_batch(mesh, batch)
        params_r = jax.device_put(params, replicated(mesh))
        loss_sharded, _ = jax.jit(
            lambda p, b: stage1_loss(model, p, b, None, finetune_vit=False,
                                     train=False))(params_r, sharded)
    np.testing.assert_allclose(float(loss_single), float(loss_sharded),
                               rtol=2e-5)


@pytest.mark.slow
def test_stage2_train_step_sharded():
    mesh = make_mesh()
    s1 = RetrievalModel(S1)
    s2 = RerankerModel(S2)
    rng = np.random.default_rng(2)
    b = 8
    batch = _stage1_batch(b, rng)
    s1_params = s1.init(jax.random.key(0), batch["ref_images"],
                        batch["input_ids"], batch["attention_mask"])
    z_t_dummy = jnp.ones((b, 6, TEXT.hidden_size))
    s2_params = s2.init(jax.random.key(1), batch["target_images"],
                        batch["input_ids"], batch["attention_mask"], z_t_dummy)
    tx, _ = make_optimizer(TrainConfig(), s2_params, steps_per_epoch=10)
    state = TrainState.create(s2_params, tx)

    with jax.set_mesh(mesh):
        state = jax.device_put(state, replicated(mesh))
        s1_params = jax.device_put(s1_params, replicated(mesh))
        sharded = shard_batch(mesh, batch)
        step = make_stage2_train_step(s1, s2, donate=False)
        new_state, loss = step(state, s1_params, sharded, jax.random.key(3))
        assert np.isfinite(float(loss))
        assert int(new_state.step) == 1


def test_sharded_topk_matches_global():
    rng = np.random.default_rng(3)
    n, e, k, q = 64, 16, 5, 4
    pred = rng.normal(size=(q, e)).astype(np.float32)
    index = rng.normal(size=(n, e)).astype(np.float32)

    ref_scores, ref_idx = jax.jit(lambda p, i: cosine_topk(p, i, k))(pred, index)

    mesh = make_mesh()
    shard_n = n // 8

    def shard_fn(pred, index_shard):
        dev = jax.lax.axis_index("data")
        return sharded_cosine_topk(pred, index_shard, k, "data",
                                   dev * shard_n)

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P("data", None)),
        out_specs=(P(), P()), check_vma=False)
    scores, idx = fn(pred, index)
    np.testing.assert_allclose(np.asarray(scores), np.asarray(ref_scores),
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))


@pytest.mark.slow
def test_rerank_scoring_sharded_over_queries():
    """Stage-II [Q, K] scoring with the query axis sharded across the mesh:
    multi-chip eval is one jit with sharded inputs, numerically equal to
    single-device."""
    import dataclasses

    mesh = make_mesh()
    s2 = RerankerModel(S2)
    rng = np.random.default_rng(7)
    Q, K, L, M = 8, 4, 6, 5  # Q divisible by 8 devices
    ids = jnp.asarray(rng.integers(4, 60, size=(Q, L)), jnp.int32)
    mask = jnp.ones((Q, L), jnp.int32)
    z_t = jnp.asarray(rng.normal(size=(Q, L, TEXT.hidden_size)), jnp.float32)
    cand = jnp.asarray(rng.normal(size=(Q, K, M, TEXT.encoder_width)),
                       jnp.float32)
    imgs = jnp.zeros((2, 16, 16, 3))
    params = s2.init(jax.random.key(0), imgs, ids[:2], mask[:2], z_t[:2])

    @jax.jit
    def score(params, z_t, ids, mask, cand):
        return s2.apply(params, z_t, ids, mask, cand,
                        method=RerankerModel.score_per_query)

    ref = score(params, z_t, ids, mask, cand)

    with jax.set_mesh(mesh):
        params_r = jax.device_put(params, replicated(mesh))
        batch = shard_batch(mesh, {"z": z_t, "i": ids, "m": mask, "c": cand})
        out = score(params_r, batch["z"], batch["i"], batch["m"], batch["c"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.slow
def test_build_index_sharded_over_mesh():
    """Corpus embedding with the batch sharded across the 8-device mesh
    equals the single-device result."""
    from candidate_reranking_cir_tpu.retrieval.index import build_index

    class SyntheticClassic:
        def __init__(self, n):
            rng = np.random.default_rng(11)
            self.items = [
                {"name": f"im{i}",
                 "image": rng.normal(size=(16, 16, 3)).astype(np.float32)}
                for i in range(n)]

        def __len__(self):
            return len(self.items)

        def __getitem__(self, i):
            return self.items[i]

    from candidate_reranking_cir_tpu.models.blip_retrieval import (
        RetrievalModel,
    )

    model = RetrievalModel(S1)
    ds = SyntheticClassic(20)
    imgs = np.stack([ds[i]["image"] for i in range(2)])
    params = model.init(jax.random.key(0), imgs,
                        np.ones((2, 6), np.int32), np.ones((2, 6), np.int32))

    @jax.jit
    def embed(images):
        return model.apply(params, images, pool_and_normalize=True,
                           method=RetrievalModel.embed_images)

    raw_ref, pooled_ref, names_ref = build_index(ds, embed, 8,
                                                 feature_dtype=jnp.float32)

    mesh = make_mesh()
    with jax.set_mesh(mesh):
        raw_sh, pooled_sh, names_sh = build_index(
            ds, embed, 8, feature_dtype=jnp.float32, mesh=mesh)
    assert names_sh == names_ref
    np.testing.assert_allclose(np.asarray(raw_sh), np.asarray(raw_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(pooled_sh), np.asarray(pooled_ref),
                               atol=1e-5)


@pytest.mark.slow
def test_fsdp_matches_replicated_and_shards_opt_state():
    """ZeRO-style FSDP: identical losses/params to the replicated run over
    multiple steps, with params AND optimizer moments actually sharded
    (per-device bytes shrink by the mesh size for divisible leaves)."""
    from candidate_reranking_cir_tpu.parallel.mesh import shard_state

    mesh = make_mesh()
    n_dev = mesh.devices.size
    s1 = RetrievalModel(S1)
    s2 = RerankerModel(S2)
    rng = np.random.default_rng(4)
    b = 8
    batch = _stage1_batch(b, rng)
    s1_params = s1.init(jax.random.key(0), batch["ref_images"],
                        batch["input_ids"], batch["attention_mask"])
    z_t_dummy = jnp.ones((b, 6, TEXT.hidden_size))
    s2_params = s2.init(jax.random.key(1), batch["target_images"],
                        batch["input_ids"], batch["attention_mask"], z_t_dummy)

    def run(fsdp):
        tx, _ = make_optimizer(TrainConfig(), s2_params, steps_per_epoch=10)
        state = TrainState.create(s2_params, tx)
        with jax.set_mesh(mesh):
            state = shard_state(mesh, state, fsdp)
            s1p = jax.device_put(s1_params, replicated(mesh))
            sharded = shard_batch(mesh, batch)
            step = make_stage2_train_step(s1, s2, donate=False)
            losses = []
            for i in range(3):
                state, loss = step(state, s1p, sharded, jax.random.key(7))
                losses.append(float(loss))
        return losses, state

    losses_rep, _ = run(fsdp=False)
    losses_fsdp, state_fsdp = run(fsdp=True)
    np.testing.assert_allclose(losses_fsdp, losses_rep, rtol=1e-5)

    # params and optimizer moments are genuinely sharded: some leaf's
    # per-device shard is 1/n_dev of the full array, in BOTH trees
    def max_shrink(tree):
        shrink = 1.0
        for leaf in jax.tree.leaves(tree):
            if hasattr(leaf, "sharding") and leaf.size > 0:
                shard = leaf.addressable_shards[0].data
                shrink = min(shrink, shard.size / leaf.size)
        return shrink

    assert max_shrink(state_fsdp.params) == 1.0 / n_dev
    assert max_shrink(state_fsdp.opt_state) == 1.0 / n_dev


@pytest.mark.slow
def test_predict_queries_image_major_sharded():
    """Image-major fusion under an 8-device mesh: Q-buckets whose image
    count divides the mesh run grouped (rows are image-contiguous, so the
    G and G*Q shardings cut at the same boundaries); result must equal the
    unmeshed query-major features."""
    from candidate_reranking_cir_tpu.models.tokenizer import (
        WordPieceTokenizer,
        build_test_vocab,
    )
    from candidate_reranking_cir_tpu.retrieval.validate_engine import (
        make_stage1_fns,
        predict_queries,
    )

    rng = np.random.default_rng(5)
    model = RetrievalModel(S1, dtype=jnp.float32)
    tok = WordPieceTokenizer(build_test_vocab())
    n_idx, M = 6, 5
    index_feats = jnp.asarray(rng.normal(size=(n_idx, M, 16)), jnp.float32)
    index_names = [f"im{i}" for i in range(n_idx)]
    ref_rows = [0] * 9 + [1] * 4 + [2] * 2 + [3] * 2 + [4]
    n_q = len(ref_rows)
    ref_names = [index_names[i] for i in ref_rows]
    caps = [f"q {i}" for i in range(n_q)]

    ids = jnp.ones((2, 6), jnp.int32)
    params = model.init(jax.random.key(0), jnp.zeros((2, 16, 16, 3)),
                        ids, ids)
    _, fuse = make_stage1_fns(model, params)
    mesh = make_mesh()

    out_sharded = np.asarray(predict_queries(
        fuse, tok, caps, ref_names, index_feats, index_names, 6,
        q_batch=16, mesh=mesh, image_major=True))
    out_ref = np.asarray(predict_queries(
        fuse, tok, caps, ref_names, index_feats, index_names, 6,
        q_batch=16, image_major=False))
    np.testing.assert_allclose(out_sharded, out_ref, atol=2e-5)
