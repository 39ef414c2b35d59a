"""HLO communication-structure audits on the 8-device virtual CPU mesh.

The numeric mesh tests (test_parallel.py) prove the sharded programs compute
the right VALUES — but on a 1-chip rig a sharding regression that silently
replicates (or reshards through host-speed collectives) would pass every
value test while destroying real multi-chip performance. These tests pin the
COMPILED communication structure instead: they lower each production mesh
program and assert on the collective ops in ``compiled.as_text()`` —
expected collectives present (the global-contrast all-gather, gradient
reductions), pathological ones absent (all-to-all on replicated-param
paths), and FSDP parameter/optimizer shardings actually sharded on output.

Counts are asserted as presence/absence, not exact numbers — XLA is free to
re-balance how many ops implement a reduction, but it cannot make a global
contrast happen with zero gathers, nor grad-sync happen with zero reduces.
"""
import re

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from candidate_reranking_cir_tpu.config import (
    RerankerModelConfig,
    RetrievalModelConfig,
    TextEncoderConfig,
    TrainConfig,
    ViTConfig,
)
from candidate_reranking_cir_tpu.models.blip_reranker import RerankerModel
from candidate_reranking_cir_tpu.models.blip_retrieval import RetrievalModel
from candidate_reranking_cir_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
    shard_state,
)
from candidate_reranking_cir_tpu.runtime.optim import make_optimizer
from candidate_reranking_cir_tpu.runtime.train_steps import (
    TrainState,
    make_stage1_train_step,
    make_stage2_train_step,
)
import pytest

VIT = ViTConfig(image_size=16, patch_size=8, hidden_size=16, num_layers=2,
                num_heads=2)
TEXT = TextEncoderConfig(vocab_size=64, hidden_size=16, num_layers=2,
                         num_heads=2, intermediate_size=32, encoder_width=16,
                         merge_mlp_from=1)
S1 = RetrievalModelConfig(vit=VIT, text=TEXT, embed_dim=8, text_len=6)
S2 = RerankerModelConfig(vit=VIT, text=TEXT, text_len=6)

_COLLECTIVE = re.compile(
    r"\b(all-gather|all-reduce|reduce-scatter|all-to-all|collective-permute)")


def collective_counts(compiled) -> dict[str, int]:
    counts = {"all-gather": 0, "all-reduce": 0, "reduce-scatter": 0,
              "all-to-all": 0, "collective-permute": 0}
    for m in _COLLECTIVE.finditer(compiled.as_text()):
        counts[m.group(1)] += 1
    return counts


def _batch(b, rng):
    return {
        "ref_images": rng.normal(size=(b, 16, 16, 3)).astype(np.float32),
        "target_images": rng.normal(size=(b, 16, 16, 3)).astype(np.float32),
        "input_ids": rng.integers(4, 60, size=(b, 6)).astype(np.int32),
        "attention_mask": np.ones((b, 6), np.int32),
    }


def _models_and_params(rng):
    s1, s2 = RetrievalModel(S1), RerankerModel(S2)
    batch = _batch(16, rng)
    s1_params = s1.init(jax.random.key(0), batch["ref_images"][:2],
                        batch["input_ids"][:2], batch["attention_mask"][:2])
    z = jnp.ones((2, 6, TEXT.hidden_size))
    s2_params = s2.init(jax.random.key(1), batch["target_images"][:2],
                        batch["input_ids"][:2], batch["attention_mask"][:2], z)
    return s1, s2, s1_params, s2_params, batch


def _sharded_leaves(tree):
    """(n_sharded, n_total) over a sharding pytree (scalars excluded)."""
    leaves = [s for s in jax.tree.leaves(tree) if getattr(s, "spec", None)
              is not None and len(s.spec)]
    sharded = sum(1 for s in leaves if any(p is not None for p in s.spec))
    return sharded, len(jax.tree.leaves(tree))


@pytest.mark.slow
def test_stage1_step_collectives_replicated_params():
    """Global-batch contrast + DP grad sync: the compiled stage-I step must
    gather the target features (>=1 all-gather) and reduce gradients (>=1
    all-reduce); it must NOT reshard activations through all-to-all or
    collective-permute (params and index replicated, batch-dim-only
    sharding never needs them)."""
    rng = np.random.default_rng(0)
    s1, _, s1_params, _, batch = _models_and_params(rng)
    mesh = make_mesh()
    tx, _ = make_optimizer(TrainConfig(), s1_params, 10,
                           freeze_prefixes=("params/visual_encoder",))
    step = make_stage1_train_step(s1, finetune_vit=False, donate=False)
    with jax.set_mesh(mesh):
        state = jax.device_put(TrainState.create(s1_params, tx),
                               replicated(mesh))
        sb = shard_batch(mesh, batch)
        counts = collective_counts(step.lower(state, sb,
                                              jax.random.key(2)).compile())
    assert counts["all-gather"] >= 1, counts
    assert counts["all-reduce"] >= 1, counts
    assert counts["all-to-all"] == 0, counts
    assert counts["collective-permute"] == 0, counts


@pytest.mark.slow
def test_stage1_step_fsdp_shards_params_and_moments():
    """Under FSDP the step must still gather + reduce, and — the actual ZeRO
    contract — the UPDATED state coming out of the program must keep both
    params and AdamW moments sharded: a silent replication here would pass
    every numeric test and forfeit the memory win."""
    rng = np.random.default_rng(1)
    s1, _, s1_params, _, batch = _models_and_params(rng)
    mesh = make_mesh()
    tx, _ = make_optimizer(TrainConfig(), s1_params, 10,
                           freeze_prefixes=("params/visual_encoder",))
    step = make_stage1_train_step(s1, finetune_vit=False, donate=False)
    with jax.set_mesh(mesh):
        state = shard_state(mesh, TrainState.create(s1_params, tx), fsdp=True)
        sb = shard_batch(mesh, batch)
        compiled = step.lower(state, sb, jax.random.key(2)).compile()
    counts = collective_counts(compiled)
    assert counts["all-gather"] >= 1, counts
    assert counts["all-reduce"] + counts["reduce-scatter"] >= 1, counts

    out_state = compiled.output_shardings[0]
    p_sharded, p_total = _sharded_leaves(out_state.params)
    o_sharded, _ = _sharded_leaves(out_state.opt_state)
    # every multi-dim leaf whose largest dim divides 8 shards; at this config
    # that is the overwhelming majority of the tree
    assert p_sharded >= p_total // 2, (p_sharded, p_total)
    assert o_sharded >= p_sharded, (o_sharded, p_sharded)


@pytest.mark.slow
def test_stage2_step_collectives():
    """The stage-II pair-grid step scores every local query against the
    GLOBAL candidate batch: target features / z_t must be gathered (>=1
    all-gather) and gradients reduced; batch-dim sharding alone must not
    need all-to-all."""
    rng = np.random.default_rng(2)
    s1, s2, s1_params, s2_params, batch = _models_and_params(rng)
    mesh = make_mesh()
    tx, _ = make_optimizer(TrainConfig(), s2_params, 10)
    step = make_stage2_train_step(s1, s2, donate=False)
    with jax.set_mesh(mesh):
        state = jax.device_put(TrainState.create(s2_params, tx),
                               replicated(mesh))
        s1_rep = jax.device_put(s1_params, replicated(mesh))
        sb = shard_batch(mesh, batch)
        counts = collective_counts(
            step.lower(state, s1_rep, sb, jax.random.key(3)).compile())
    assert counts["all-gather"] >= 1, counts
    assert counts["all-reduce"] >= 1, counts
    assert counts["all-to-all"] == 0, counts
    assert counts["collective-permute"] == 0, counts


def test_full_ranking_is_communication_free():
    """Ranking is embarrassingly parallel over queries (replicated index,
    query-sharded distances): the compiled program must contain ZERO
    collectives — any appearing here means the index or the argsort got
    accidentally resharded."""
    from candidate_reranking_cir_tpu.retrieval.validate_engine import (
        _full_rank,
    )

    rng = np.random.default_rng(3)
    mesh = make_mesh()
    with jax.set_mesh(mesh):
        pred = jax.device_put(
            jnp.asarray(rng.normal(size=(16, 8)), jnp.float32),
            batch_sharding(mesh, 2))
        index = jax.device_put(
            jnp.asarray(rng.normal(size=(32, 8)), jnp.float32),
            replicated(mesh))
        counts = collective_counts(_full_rank.lower(pred, index).compile())
    assert all(v == 0 for v in counts.values()), counts


@pytest.mark.slow
def test_sharded_rerank_zt_gather_uses_psum_only():
    """The corpus-sharded candidate-major z_t producer fetches reference
    rows with a masked local take + psum (rerank.py zt_body.gather_global):
    the compiled program must carry that reduction (>=1 all-reduce) and no
    all-to-all (the bank never reshards)."""
    from candidate_reranking_cir_tpu.retrieval.rerank import (
        make_cand_major_sharded_fns,
    )

    rng = np.random.default_rng(4)
    s1, s2, s1_params, s2_params, _ = _models_and_params(rng)
    mesh = make_mesh()
    produce_all_zt, _ = make_cand_major_sharded_fns(s1, s2, mesh)

    n_idx, n_q, m = 16, 8, (16 // 8) ** 2 + 1
    feats = jax.device_put(
        jnp.asarray(rng.normal(size=(n_idx, m, TEXT.encoder_width)) * 0.05,
                    jnp.float32), batch_sharding(mesh, 3))
    ids = jnp.asarray(rng.integers(4, 60, size=(n_q, 6)), jnp.int32)
    mask = jnp.ones((n_q, 6), jnp.int32)
    ref_rows = jnp.asarray(rng.integers(0, n_idx, size=n_q), jnp.int32)
    row_chunks = jnp.arange(n_q, dtype=jnp.int32).reshape(2, 4)
    with jax.set_mesh(mesh):
        s1_rep = jax.device_put(s1_params, replicated(mesh))
        compiled = produce_all_zt.lower(s1_rep, feats, ids, mask, ref_rows,
                                        row_chunks).compile()
    counts = collective_counts(compiled)
    assert counts["all-reduce"] >= 1, counts
    assert counts["all-to-all"] == 0, counts
