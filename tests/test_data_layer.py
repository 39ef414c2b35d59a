"""Data-layer tests: loaders, captions, schedules, config round-trip."""
import numpy as np
import pytest

from candidate_reranking_cir_tpu.data.captions import (
    compose_fiq_eval,
    compose_fiq_train,
)
from candidate_reranking_cir_tpu.data.loader import BatchLoader, prefetch


class ListDataset:
    def __init__(self, items):
        self.items = items

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def test_batch_loader_backfills_errors():
    items = [{"x": np.full((2,), i, np.float32)} for i in range(10)]
    items[3] = None  # simulated decode failure
    items[7] = None
    loader = BatchLoader(ListDataset(items), 4, drop_last=True)
    batches = list(loader)
    # 8 good samples -> 2 full batches of 4
    assert len(batches) == 2
    got = np.concatenate([b["x"][:, 0] for b in batches])
    assert set(got.tolist()) == {0, 1, 2, 4, 5, 6, 8, 9}


def test_batch_loader_shuffle_epochs_differ():
    items = [{"x": np.full((1,), i, np.float32)} for i in range(32)]
    loader = BatchLoader(ListDataset(items), 8, shuffle=True, seed=1)
    e1 = np.concatenate([b["x"][:, 0] for b in loader])
    e2 = np.concatenate([b["x"][:, 0] for b in loader])
    assert set(e1.tolist()) == set(e2.tolist()) == set(range(32))
    assert not np.array_equal(e1, e2)


def test_prefetch_propagates_errors():
    def gen():
        yield 1
        raise RuntimeError("boom")

    it = prefetch(gen(), 2)
    assert next(it) == 1
    with pytest.raises(RuntimeError):
        list(it)


def test_fiq_eval_caption_rule():
    caps = [["Is longer.", "has short sleeves?"]]
    assert compose_fiq_eval(caps) == ["Is longer and has short sleeves"]


def test_fiq_train_caption_distribution():
    rng = np.random.default_rng(0)
    caps = [["red dress", "blue trim"]] * 400
    out = compose_fiq_train(caps, rng)
    both = sum(1 for c in out if " and " in c)
    single = len(out) - both
    # ~50% combined, ~50% single
    assert 120 < both < 280 and 120 < single < 280
    assert {c for c in out} <= {"Red dress and blue trim",
                                "Blue trim and red dress",
                                "Red dress", "Blue trim"}


def test_lr_schedules():
    import jax.numpy as jnp

    from candidate_reranking_cir_tpu.runtime.optim import (
        cosine_epoch_schedule,
        exp_epoch_schedule,
        step_epoch_schedule,
        warmup_schedule,
    )

    cos = cosine_epoch_schedule(1e-4, 0.0, 10, steps_per_epoch=5)
    assert float(cos(0)) == pytest.approx(1e-4)
    # constant within an epoch
    assert float(cos(0)) == float(cos(4))
    assert float(cos(5)) < float(cos(4))
    assert float(cos(50)) == pytest.approx(0.0, abs=1e-9)

    w = warmup_schedule(0.0, 1e-4, 100)
    assert float(w(0)) == 0.0
    assert float(w(50)) == pytest.approx(5e-5)
    assert float(w(200)) == pytest.approx(1e-4)

    st = step_epoch_schedule(1e-4, 1e-6, 0.5, 10)
    assert float(st(0)) == pytest.approx(1e-4)
    assert float(st(10)) == pytest.approx(5e-5)

    ex = exp_epoch_schedule(1e-4, 0.9, 10)
    assert float(ex(10)) == pytest.approx(9e-5)


def test_config_roundtrip(tmp_path):
    from candidate_reranking_cir_tpu.config import (
        ExperimentConfig,
        load_config,
        save_config,
    )

    cfg = ExperimentConfig()
    p = tmp_path / "cfg.json"
    save_config(cfg, p)
    loaded = load_config(p)
    assert loaded == cfg

    # packaged YAML defaults parse
    from pathlib import Path

    import candidate_reranking_cir_tpu

    pkg = Path(candidate_reranking_cir_tpu.__file__).parent
    for name in ("cirr.yaml", "fashioniq.yaml"):
        c = load_config(pkg / "configs" / name)
        assert c.stage1.text.vocab_size == 30524
        assert c.stage2.text.merge_mlp_from == 6


def test_resolve_fiq_topk_path_conventions():
    from candidate_reranking_cir_tpu.data.topk_io import resolve_fiq_topk_path

    # this repo's convention
    assert resolve_fiq_topk_path("fiq_top_{dress}.npz", "shirt") \
        == "fiq_top_shirt.npz"
    # reference convention (utils.py:195, validate_stage2.py:144)
    assert resolve_fiq_topk_path(
        "models/stage1/fashionIQ/fiq_top_200_val_DTYPE.pt", "toptee") \
        == "models/stage1/fashionIQ/fiq_top_200_val_toptee.pt"
    # no placeholder -> unchanged
    assert resolve_fiq_topk_path("one_file.npz", "dress") == "one_file.npz"


def test_url_checkpoint_cached_fetch(tmp_path, monkeypatch):
    from candidate_reranking_cir_tpu.runtime import checkpoint as C

    assert C.is_url("https://x.org/blip.pth")
    assert not C.is_url("/models/blip.pt")

    calls = []

    def fake_urlretrieve(url, dst):
        calls.append(url)
        from pathlib import Path

        Path(dst).write_bytes(b"ckpt")

    import urllib.request

    monkeypatch.setattr(urllib.request, "urlretrieve", fake_urlretrieve)
    p1 = C.download_cached_file("https://x.org/dir/blip.pth",
                                cache_dir=tmp_path)
    assert p1.read_bytes() == b"ckpt" and p1.name == "blip.pth"
    p2 = C.download_cached_file("https://x.org/dir/blip.pth",
                                cache_dir=tmp_path)
    assert p2 == p1 and len(calls) == 1  # second call hits the cache
