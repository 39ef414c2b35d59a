"""Checkpoint save/load.

Two formats:
- **Native (Orbax)**: full train state (params + optimizer + step), supporting
  true mid-training resume — which the reference lacks entirely (it saves
  optimizer state but never reloads it, SURVEY.md section 5).
- **Interop (torch .pt)**: read the reference's published checkpoints through
  runtime/convert.py; the loader auto-detects format by extension.

Save-policy parity with the reference (stage1_train.py:494-503): a rolling
"last" checkpoint every validation epoch plus a best-metric checkpoint
("blip" for Fashion-IQ, "blip_mean" for CIRR; utils.py:135-179).
"""
from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import numpy as np


def save_checkpoint(path: str | Path, state, *, metadata: dict | None = None):
    """Orbax-backed save of a TrainState (or any pytree)."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.tree.map(np.asarray, _to_pure_tree(state)), force=True)
    ckptr.wait_until_finished()
    if metadata:
        import json

        (path / "framework_metadata.json").write_text(json.dumps(metadata))


def restore_checkpoint(path: str | Path, target=None):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    tgt = _to_pure_tree(target) if target is not None else None
    restored = ckptr.restore(Path(path).absolute(), tgt)
    return restored


def _to_pure_tree(state):
    """TrainState -> plain dict (tx is not serializable)."""
    if hasattr(state, "params") and hasattr(state, "opt_state"):
        return {"step": state.step, "params": state.params,
                "opt_state": state.opt_state}
    return state


def is_url(path: str | Path) -> bool:
    from urllib.parse import urlparse

    return urlparse(str(path)).scheme in ("http", "https")


def download_cached_file(url: str, cache_dir: str | Path | None = None) -> Path:
    """Fetch a pretrained checkpoint by URL into a local cache and return the
    cached path (reference capability, blip.py:215-222 via timm's
    download_cached_file). Skips the download when the cached file exists."""
    from urllib.parse import urlparse
    from urllib.request import urlretrieve

    cache_dir = Path(cache_dir or Path.home() / ".cache"
                     / "candidate_reranking_cir_tpu" / "checkpoints")
    cache_dir.mkdir(parents=True, exist_ok=True)
    fname = Path(urlparse(url).path).name or "checkpoint.pth"
    cached = cache_dir / fname
    if not cached.exists():
        print(f"downloading {url} -> {cached}")
        tmp = cached.with_suffix(cached.suffix + ".part")
        urlretrieve(url, tmp)
        tmp.rename(cached)
    return cached


def load_model_params(path: str | Path, stage: int, cfg) -> Any:
    """Load model params from a native Orbax dir, a torch .pt/.pth file
    (reference formats, converted on the fly), or an http(s) URL to a torch
    checkpoint (fetched into the local cache first, matching blip.py:215-222)."""
    if is_url(path):
        path = download_cached_file(str(path))
    path = Path(path)
    if path.is_dir():
        restored = restore_checkpoint(path)
        return restored["params"] if "params" in restored else restored
    from candidate_reranking_cir_tpu.runtime import convert

    sd = convert.load_torch_state(str(path))
    if stage == 1:
        return convert.convert_stage1(sd, cfg)
    return convert.convert_stage2(sd, cfg)
