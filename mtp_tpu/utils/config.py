"""Dataclass config system.

Replaces the reference's two config mechanisms (argparse in
Multi-Task_Pretrain/main_pretrain.py:29-87 and 60+ mmengine python-dict
configs under RS_Tasks_Finetune/*/configs/mtp/) with one typed, serializable
config tree.  Configs are plain frozen dataclasses so they can be closed over
by jitted functions as static values.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence, Tuple


def asdict(cfg: Any) -> dict:
    return dataclasses.asdict(cfg)


def to_json(cfg: Any) -> str:
    return json.dumps(asdict(cfg), indent=2, default=str)


def replace(cfg, **kw):
    return dataclasses.replace(cfg, **kw)


@dataclass(frozen=True)
class BackboneConfig:
    """ViT+RVSA backbone hyper-parameters.

    Mirrors the factory settings of the reference `vit_b_rvsa` / `vit_l_rvsa`
    (Multi-Task_Pretrain/backbone/vit_win_rvsa_v3_wsz7.py:819-865).
    """

    name: str = "vit_b_rvsa"
    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    # every `interval`-th block (1-indexed) is full attention, rest are RVSA
    interval: int = 3
    window_size: int = 7
    out_indices: Tuple[int, ...] = (3, 5, 7, 11)
    drop_path_rate: float = 0.1
    drop_rate: float = 0.0
    use_abs_pos_emb: bool = True
    # None disables layer-scale (reference init_values=None in both factories)
    init_values: Optional[float] = None
    # remat every transformer block (reference use_checkpoint)
    remat: bool = False
    # nn.scan over (interval)-block groups: ~interval× faster jit compiles;
    # param tree becomes block_groups/{rvsa_p,full}/... with a stacked
    # leading group axis (the checkpoint converter handles both layouts)
    scan: bool = False
    # fused Pallas attention kernel for the window/full attention hot loop
    pallas_attn: bool = False
    # compute dtype ("bfloat16" or "float32"); params always float32
    dtype: str = "bfloat16"


def vit_b_rvsa(img_size: int = 224, **kw) -> BackboneConfig:
    kw.setdefault("out_indices", (3, 5, 7, 11))
    return BackboneConfig(
        name="vit_b_rvsa", img_size=img_size, embed_dim=768, depth=12,
        num_heads=12, interval=3, **kw)


def vit_l_rvsa(img_size: int = 224, **kw) -> BackboneConfig:
    kw.setdefault("out_indices", (7, 11, 15, 23))
    return BackboneConfig(
        name="vit_l_rvsa", img_size=img_size, embed_dim=1024, depth=24,
        num_heads=16, interval=6, **kw)


BACKBONES = {"vit_b_rvsa": vit_b_rvsa, "vit_l_rvsa": vit_l_rvsa}


@dataclass(frozen=True)
class OptimizerConfig:
    """AdamW + layer decay + grad clip, as used across the reference recipes
    (main_pretrain.py:424-457, mmcv_custom/layer_decay_optimizer_constructor_vit.py)."""

    lr: float = 1e-4
    weight_decay: float = 0.05
    betas: Tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8
    layer_decay: float = 0.9
    clip_norm: float = 5.0


@dataclass(frozen=True)
class ScheduleConfig:
    """LR schedule: linear warmup then cosine (pretrain) or poly (seg finetune)."""

    kind: str = "cosine"  # cosine | poly | constant | step
    total_steps: int = 1000
    warmup_steps: int = 0
    warmup_ratio: float = 1e-6
    min_lr_ratio: float = 0.0
    poly_power: float = 1.0
    # kind='step' (reference MultiStepLR, e.g. milestones [8,11]/12 epochs):
    # LR multiplied by step_gamma at each fraction of total_steps
    step_milestones: tuple = (8 / 12, 11 / 12)
    step_gamma: float = 0.1


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh shape. data = batch sharding over ICI, model = tensor
    parallelism (Megatron-style sharding of attention heads / MLP hidden)."""

    data: int = -1  # -1: all remaining devices
    model: int = 1


@dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 64  # global
    seed: int = 2023
    log_every: int = 50
    ckpt_every: int = 1000
    eval_every: int = 1000
    mesh: MeshConfig = field(default_factory=MeshConfig)
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    schedule: ScheduleConfig = field(default_factory=ScheduleConfig)


@dataclass(frozen=True)
class SlideConfig:
    """Sliding-window inference geometry (reference
    semantic_segmentation/encoder_decoder.py:253-310; finetune configs use
    crop 384/512, stride 256)."""

    crop: int = 512
    stride: int = 256


@dataclass(frozen=True)
class TaskConfig:
    """One downstream task recipe."""

    task: str = "classification"  # classification|segmentation|detection_h|detection_r|instseg|change_detection
    num_classes: int = 10
    backbone: BackboneConfig = field(default_factory=vit_b_rvsa)
    train: TrainConfig = field(default_factory=TrainConfig)
    slide: Optional[SlideConfig] = None
    ignore_index: int = 255
