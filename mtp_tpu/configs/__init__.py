"""Config registry: named recipes mirroring the reference's 60+ mmengine
configs (RS_Tasks_Finetune/*/configs/mtp/) plus the pretraining CLI.

Each entry is a zero-arg factory returning a `Recipe`; list them with
`available()`, build with `get(name)`.  Names follow the reference file
names: `<head>_<backbone>_<size>_<init>_<dataset>`.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

from mtp_tpu.utils.config import (BackboneConfig, MeshConfig, OptimizerConfig,
                                  ScheduleConfig, SlideConfig, TaskConfig,
                                  TrainConfig, vit_b_rvsa, vit_l_rvsa)


@dataclasses.dataclass(frozen=True)
class Recipe:
    name: str
    task: TaskConfig
    # dataset construction hints (paths are user-supplied at runtime)
    dataset: str = ""
    notes: str = ""


_REGISTRY: Dict[str, Callable[[], Recipe]] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn
    return deco


def available():
    return sorted(_REGISTRY)


def get(name: str) -> Recipe:
    return _REGISTRY[name]()


def _cls(backbone: BackboneConfig, num_classes: int, steps: int,
         lr: float = 2.5e-4, layer_decay: float = 0.9) -> TaskConfig:
    """Scene-classification recipe shape (reference mmpretrain configs:
    AdamW lr 2.5e-4, layer decay 0.9, warmup + cosine)."""
    return TaskConfig(
        task="classification", num_classes=num_classes, backbone=backbone,
        train=TrainConfig(
            batch_size=64,
            optimizer=OptimizerConfig(lr=lr, weight_decay=0.05,
                                      layer_decay=layer_decay),
            schedule=ScheduleConfig(kind="cosine", total_steps=steps,
                                    warmup_steps=steps // 20)))


def _seg(backbone: BackboneConfig, num_classes: int, steps: int = 80000,
         lr: float = 6e-5, crop: int = 512) -> TaskConfig:
    """Segmentation recipe shape (reference mmseg configs: AdamW 6e-5,
    poly schedule, 80k iters, slide eval stride 256)."""
    return TaskConfig(
        task="segmentation", num_classes=num_classes, backbone=backbone,
        train=TrainConfig(
            batch_size=8,
            optimizer=OptimizerConfig(lr=lr, weight_decay=0.05,
                                      layer_decay=0.9),
            schedule=ScheduleConfig(kind="poly", total_steps=steps,
                                    warmup_steps=1500, poly_power=1.0)),
        slide=SlideConfig(crop=crop, stride=256))


def _cd(backbone: BackboneConfig, steps: int = 40000) -> TaskConfig:
    return TaskConfig(
        task="change_detection", num_classes=2, backbone=backbone,
        train=TrainConfig(
            batch_size=8,
            optimizer=OptimizerConfig(lr=6e-5, weight_decay=0.05,
                                      layer_decay=0.9),
            schedule=ScheduleConfig(kind="poly", total_steps=steps,
                                    warmup_steps=1000)))


def _det(backbone: BackboneConfig, num_classes: int, steps: int = 90000,
         lr: float = 1e-4) -> TaskConfig:
    return TaskConfig(
        task="detection_h", num_classes=num_classes, backbone=backbone,
        train=TrainConfig(
            batch_size=8,
            optimizer=OptimizerConfig(lr=lr, weight_decay=0.05,
                                      layer_decay=0.9, clip_norm=35.0),
            schedule=ScheduleConfig(kind="cosine", total_steps=steps,
                                    warmup_steps=500)))


# --- scene classification (reference Scene_Classification/configs/mtp) -----

@register("vit-rvsa-b-224-mae-mtp_eurosat")
def _():
    return Recipe("vit-rvsa-b-224-mae-mtp_eurosat",
                  _cls(vit_b_rvsa(224, drop_path_rate=0.1), 10, 10000),
                  dataset="eurosat", notes="OA target 98.76 (BASELINE.md)")


@register("vit-rvsa-l-224-mae-mtp_eurosat")
def _():
    return Recipe("vit-rvsa-l-224-mae-mtp_eurosat",
                  _cls(vit_l_rvsa(224, drop_path_rate=0.3, scan=True), 10, 10000),
                  dataset="eurosat", notes="OA target 98.78")


@register("vit-rvsa-b-224-mae-mtp_resisc45")
def _():
    return Recipe("vit-rvsa-b-224-mae-mtp_resisc45",
                  _cls(vit_b_rvsa(224, drop_path_rate=0.1), 45, 12000),
                  dataset="resisc45", notes="OA target 95.57")


# --- semantic segmentation (reference Semantic_Segmentation/configs/mtp) ----

@register("rvsa-b-upernet-384-mae-mtp-spacenetv1")
def _():
    return Recipe("rvsa-b-upernet-384-mae-mtp-spacenetv1",
                  _seg(vit_b_rvsa(384, drop_path_rate=0.1), 2, crop=384),
                  dataset="spacenetv1", notes="mIoU target 79.63")


@register("rvsa-l-upernet-384-mae-mtp-spacenetv1")
def _():
    return Recipe("rvsa-l-upernet-384-mae-mtp-spacenetv1",
                  _seg(vit_l_rvsa(384, drop_path_rate=0.3, scan=True), 2,
                       crop=384),
                  dataset="spacenetv1", notes="mIoU target 79.54")


@register("rvsa-b-upernet-512-mae-mtp-loveda")
def _():
    return Recipe("rvsa-b-upernet-512-mae-mtp-loveda",
                  _seg(vit_b_rvsa(512, drop_path_rate=0.1), 7, crop=512),
                  dataset="loveda", notes="mIoU target 52.39")


@register("rvsa-l-upernet-512-mae-mtp-loveda")
def _():
    return Recipe("rvsa-l-upernet-512-mae-mtp-loveda",
                  _seg(vit_l_rvsa(512, drop_path_rate=0.3, scan=True), 7,
                       crop=512),
                  dataset="loveda", notes="mIoU target 54.17")


# --- change detection (reference Change_Detection/configs/mtp) -------------

@register("rvsa-b-unet-256-mae-mtp_levir")
def _():
    return Recipe("rvsa-b-unet-256-mae-mtp_levir",
                  _cd(vit_b_rvsa(256, drop_path_rate=0.1)),
                  dataset="levir", notes="F1 target 92.22")


@register("rvsa-l-unet-256-mae-mtp_levir")
def _():
    return Recipe("rvsa-l-unet-256-mae-mtp_levir",
                  _cd(vit_l_rvsa(256, drop_path_rate=0.3, scan=True)),
                  dataset="levir", notes="F1 target 92.67")


@register("rvsa-b-unet-256-mae-mtp_whu")
def _():
    return Recipe("rvsa-b-unet-256-mae-mtp_whu",
                  _cd(vit_b_rvsa(256, drop_path_rate=0.1)),
                  dataset="whu", notes="F1 target 94.32")


# --- horizontal detection (reference Horizontal_Detection/configs/mtp) ------

@register("faster_rcnn_rvsa_b_800_mae_mtp_dior")
def _():
    return Recipe("faster_rcnn_rvsa_b_800_mae_mtp_dior",
                  _det(vit_b_rvsa(800, drop_path_rate=0.1), 20),
                  dataset="dior", notes="AP50 target 79.00; Faster R-CNN")


@register("faster_rcnn_rvsa_l_800_mae_mtp_dior")
def _():
    return Recipe("faster_rcnn_rvsa_l_800_mae_mtp_dior",
                  _det(vit_l_rvsa(800, drop_path_rate=0.3, scan=True), 20),
                  dataset="dior", notes="AP50 target 81.70")


@register("retinanet_rvsa_l_416_mae_mtp_xview")
def _():
    return Recipe("retinanet_rvsa_l_416_mae_mtp_xview",
                  _det(vit_l_rvsa(416, drop_path_rate=0.3, scan=True), 60),
                  dataset="xview", notes="AP50 target 19.40; RetinaNet head")


# --- rotated detection (reference Rotated_Detection/configs/mtp) ------------

@register("oriented_rcnn_rvsa_b_800_mae_mtp_diorr")
def _():
    t = _det(vit_b_rvsa(800, drop_path_rate=0.1), 20)
    return Recipe("oriented_rcnn_rvsa_b_800_mae_mtp_diorr",
                  dataclasses.replace(t, task="detection_r"),
                  dataset="dior-r", notes="mAP target 71.29; Oriented R-CNN")


@register("oriented_rcnn_rvsa_l_1024_mae_mtp_dota")
def _():
    t = _det(vit_l_rvsa(1024, drop_path_rate=0.3, scan=True), 15)
    return Recipe("oriented_rcnn_rvsa_l_1024_mae_mtp_dota",
                  dataclasses.replace(t, task="detection_r"),
                  dataset="dota10", notes="mAP target 81.66 (multi-scale)")


# --- InternImage-XL variants (reference pairs it with every task) ----------

def _internimage_xl(img_size: int, **kw):
    from mtp_tpu.models.backbones import internimage_backbone_config
    return internimage_backbone_config("internimage_xl", img_size, **kw)


@register("internimage-xl-224-imp-mtp_eurosat")
def _():
    return Recipe("internimage-xl-224-imp-mtp_eurosat",
                  _cls(_internimage_xl(224), 10, 10000),
                  dataset="eurosat", notes="OA target 99.24")


@register("internimage-xl-upernet-512-imp-mtp-loveda")
def _():
    return Recipe("internimage-xl-upernet-512-imp-mtp-loveda",
                  _seg(_internimage_xl(512), 7, crop=512),
                  dataset="loveda", notes="mIoU target 54.17")


@register("internimage-xl-unet-256-imp-mtp_levir")
def _():
    return Recipe("internimage-xl-unet-256-imp-mtp_levir",
                  _cd(_internimage_xl(256)),
                  dataset="levir", notes="F1 target 92.54")


# --- multi-task pretraining (reference Multi-Task_Pretrain) -----------------

@register("mtp_vit_b_rvsa_448_samrs")
def _():
    return Recipe(
        "mtp_vit_b_rvsa_448_samrs",
        TaskConfig(
            task="multitask", num_classes=0,
            backbone=vit_b_rvsa(448, drop_path_rate=0.1),
            train=TrainConfig(
                batch_size=24,
                optimizer=OptimizerConfig(lr=1e-4, weight_decay=0.05,
                                          layer_decay=0.9),
                schedule=ScheduleConfig(kind="cosine", total_steps=80000,
                                        warmup_steps=2000))),
        dataset="samrs", notes="SOTA+SIOR+FAST joint pretraining")


@register("mtp_vit_l_rvsa_448_samrs")
def _():
    return Recipe(
        "mtp_vit_l_rvsa_448_samrs",
        TaskConfig(
            task="multitask", num_classes=0,
            backbone=vit_l_rvsa(448, drop_path_rate=0.1, scan=True),
            train=TrainConfig(
                batch_size=24,
                optimizer=OptimizerConfig(lr=1e-4, weight_decay=0.05,
                                          layer_decay=0.9),
                schedule=ScheduleConfig(kind="cosine", total_steps=80000,
                                        warmup_steps=2000))),
        dataset="samrs", notes="flagship pretraining recipe")
