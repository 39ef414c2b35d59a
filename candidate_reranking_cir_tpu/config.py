"""Typed configuration tree.

The reference scatters configuration across argparse CLIs, YAML model configs, JSON
BertConfigs and module-level globals (see reference utils.py:181-214,
validate.py:362-369). Here everything is collapsed into one dataclass tree that can be
loaded from / dumped to YAML or JSON and passed explicitly.
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any


@dataclass(frozen=True)
class TextEncoderConfig:
    """BERT-family encoder hyperparameters (reference configs/med_config.json)."""

    vocab_size: int = 30524          # 30522 bert-base-uncased + [DEC] + [ENC]
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    encoder_width: int = 768         # width of cross-attended (image) features
    layer_norm_eps: float = 1e-12
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    pad_token_id: int = 0
    initializer_range: float = 0.02
    # dual-stream re-ranker only: layers >= merge_mlp_from use MLP-merge for the twin
    # cross-attention outputs; earlier layers average (reference nlvr_encoder.py:286)
    merge_mlp_from: int = 6
    # route attention through the Pallas VMEM-resident kernel where eligible
    fused_attention: bool = False
    # sow every layer's attention probabilities into the 'intermediates'
    # collection (the reference's save_attention_map hooks, med.py:129-133);
    # read back via mutable=['intermediates']. Forces query-major fusion
    # scheduling so sowed probs keep the per-query [B, H, L, M] layout.
    capture_attention: bool = False
    # additionally register the probs as flax perturbations (the reference's
    # save_attn_gradients backward hook): jax.grad w.r.t. 'perturbations'
    # yields dLoss/dAttnProbs. Same query-major forcing as capture.
    perturb_attention: bool = False
    # rematerialize each layer in backward (required to train the pair-grid
    # dual encoder on one chip: saved attention scores otherwise need ~50 GB,
    # the same blow-up that costs the reference ~70 GB on A100)
    remat: bool = False
    # checkpoint policy under remat: '' recomputes everything (min memory);
    # 'dots' saves matmul outputs without batch dims (FFN/projections) and
    # recomputes only attention/elementwise — faster backward, more memory
    remat_policy: str = ""

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


@dataclass(frozen=True)
class ViTConfig:
    """ViT hyperparameters (reference vit.py:113-194, blip.py:194-209)."""

    image_size: int = 384
    patch_size: int = 16
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    layer_norm_eps: float = 1e-6
    dropout: float = 0.0
    attention_dropout: float = 0.0
    drop_path_rate: float = 0.0      # stage-II uses 0.1 (reference blip_stage2.py:37)
    remat: bool = False              # activation checkpointing per block
    remat_policy: str = ""           # '' | 'dots' (see TextEncoderConfig)
    fused_attention: bool = False    # Pallas fused attention kernel
    scan_unroll: int = 1             # nn.scan unroll factor for the block stack

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def num_tokens(self) -> int:
        return self.num_patches + 1  # + CLS

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def vit_config(size: str = "base", image_size: int = 384, **kw) -> ViTConfig:
    """Factory mirroring reference blip.py:194-209 ('base' | 'large')."""
    if size == "base":
        return ViTConfig(image_size=image_size, hidden_size=768, num_layers=12,
                         num_heads=12, **kw)
    if size == "large":
        return ViTConfig(image_size=image_size, hidden_size=1024, num_layers=24,
                         num_heads=16, **kw)
    raise ValueError(f"unknown vit size {size!r} (expected 'base' or 'large')")


@dataclass(frozen=True)
class RetrievalModelConfig:
    """Stage-I model (reference blip_stage1.py:15-93)."""

    vit: ViTConfig = field(default_factory=ViTConfig)
    text: TextEncoderConfig = field(default_factory=TextEncoderConfig)
    embed_dim: int = 256
    temp_init: float = 0.07
    text_len: int = 40               # static text bucket (reference pads to longest)


@dataclass(frozen=True)
class RerankerModelConfig:
    """Stage-II model (reference blip_stage2.py:19-136)."""

    vit: ViTConfig = field(default_factory=lambda: ViTConfig(drop_path_rate=0.1))
    text: TextEncoderConfig = field(default_factory=TextEncoderConfig)
    text_len: int = 40


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout. 1-D data axis by default; params can be sharded over the
    same axis FSDP-style for larger configs."""

    data_axis: str = "data"
    fsdp: bool = False               # shard params over the data axis (ZeRO-3 style)


@dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 2e-5
    min_lr: float = 0.0
    weight_decay: float = 0.05
    num_epochs: int = 40
    cosine_max_epoch: int = 10       # cosine schedule period (reference utils.py:216)
    batch_size: int = 512
    grad_accumulation: int = 1
    seed: int = 0
    finetune_vit: bool = False       # reference --blip-img-tune (off by default)
    validation_frequency: int = 1
    bf16: bool = True


@dataclass(frozen=True)
class DataConfig:
    dataset: str = "cirr"            # 'cirr' | 'fashioniq'
    data_root: str = ""              # directory holding cirr_dataset/ fashionIQ_dataset/
    image_size: int = 384
    target_ratio: float = 1.25
    transform: str = "targetpad"     # 'targetpad' | 'squarepad'
    dress_types: tuple[str, ...] = ("dress", "shirt", "toptee")
    num_workers: int = 8
    top_k_path: str = ""
    k_value: int = 50


@dataclass(frozen=True)
class ExperimentConfig:
    stage1: RetrievalModelConfig = field(default_factory=RetrievalModelConfig)
    stage2: RerankerModelConfig = field(default_factory=RerankerModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    data: DataConfig = field(default_factory=DataConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    experiment_name: str = "exp0"
    output_dir: str = "models"


# ---------------------------------------------------------------------------
# (De)serialization


def _from_dict(cls, d: dict[str, Any]):
    kw = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        if dataclasses.is_dataclass(f.type) if isinstance(f.type, type) else False:
            v = _from_dict(f.type, v)
        elif f.name in _NESTED:
            v = _from_dict(_NESTED[f.name], v)
        elif f.name == "dress_types":
            v = tuple(v)
        kw[f.name] = v
    return cls(**kw)


_NESTED = {
    "vit": ViTConfig,
    "text": TextEncoderConfig,
    "stage1": RetrievalModelConfig,
    "stage2": RerankerModelConfig,
    "train": TrainConfig,
    "data": DataConfig,
    "mesh": MeshConfig,
}


def to_dict(cfg) -> dict[str, Any]:
    return dataclasses.asdict(cfg)


def load_config(path: str | Path) -> ExperimentConfig:
    path = Path(path)
    text = path.read_text()
    if path.suffix in (".yaml", ".yml"):
        import yaml

        d = yaml.safe_load(text)
    else:
        d = json.loads(text)
    return _from_dict(ExperimentConfig, d)


def save_config(cfg, path: str | Path) -> None:
    Path(path).write_text(json.dumps(to_dict(cfg), indent=2))
