"""Two-stage detectors: Faster R-CNN / Mask R-CNN / Oriented R-CNN.

Capability parity with the reference detector shells
(instance_segmentation/{two_stage,mask_rcnn}.py and
rotated_detection/{two_stage,oriented_rcnn}.py) re-designed fixed-shape:

- proposals, RoI samples and detections are padded tensors with masks,
- assignment/sampling runs vmapped per image inside the jitted train step,
- the rotated variant swaps coder (midpoint/delta-t), RoIAlign (rotated) and
  NMS IoU (polygon) but shares all of the control flow.

The per-dataset *final* layers (fc_cls / fc_reg / conv_logits) are separate
modules so the multi-task pretrainer can hold 3 copies (reference
models.py:129-190) while single-task finetuning uses one.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mtp_tpu.heads.fpn import FPN
from mtp_tpu.heads.roi_heads import (FCNMaskTrunk, Shared2FCTrunk,
                                     bbox_head_loss, mask_head_loss)
from mtp_tpu.heads.rpn import RPNHead, RPNOut, gen_proposals, optax_sigmoid_ce
from mtp_tpu.models.backbones import build_backbone
from mtp_tpu.ops.anchors import AnchorGenerator
from mtp_tpu.ops.assign import max_iou_assign, random_sample
from mtp_tpu.ops.boxes import bbox_overlaps, delta_decode, delta_encode
from mtp_tpu.ops.nms import NEG_INF, batched_nms
from mtp_tpu.ops.roi_align import (ROI_ATLAS as _ROI_ATLAS, map_roi_levels,
                                   map_rroi_levels,
                                   multilevel_roi_align_fused,
                                   roi_align, roi_align_rotated)
from mtp_tpu.ops.rotated_boxes import (delta_decode_rbox, delta_encode_rbox,
                                       hbox_to_rbox, midpoint_encode,
                                       rbox2hbox_overlaps, rbox_overlaps,
                                       rbox_to_hbox)
from mtp_tpu.utils.config import BackboneConfig

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class DetConfig:
    """Static detection hyper-params (values = reference config dicts)."""

    num_classes: int = 20
    rotated: bool = False
    with_mask: bool = False
    # rpn train
    rpn_pos_iou: float = 0.7
    rpn_neg_iou: float = 0.3
    rpn_min_pos_iou: float = 0.3
    rpn_num: int = 256
    rpn_pos_fraction: float = 0.5
    rpn_smooth_l1_beta: Optional[float] = None  # oriented: 1/9
    # proposals
    nms_pre: int = 2000
    max_proposals: int = 1000
    rpn_nms_iou: float = 0.7
    # rcnn train
    rcnn_pos_iou: float = 0.5
    rcnn_neg_iou: float = 0.5
    rcnn_num: int = 512
    rcnn_pos_fraction: float = 0.25
    rcnn_match_low_quality: bool = True  # rotated rcnn: False
    # rcnn bbox std
    bbox_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)
    reg_class_agnostic: bool = False    # rotated: True
    rcnn_smooth_l1_beta: Optional[float] = None  # rotated: 1.0
    # test
    score_thr: float = 0.05
    test_nms_iou: float = 0.5           # rotated: 0.1 (nms_rotated)
    max_per_img: int = 100              # rotated: 2000 in ref; padded here
    # roi
    roi_size: int = 7
    mask_roi_size: int = 14
    mask_size: int = 28
    mask_upsample: str = "deconv"  # deconv | carafe | nearest | bilinear
    fpn_strides: Tuple[int, ...] = (4, 8, 16, 32)
    # max gts per image after padding
    max_gts: int = 100


def oriented_rcnn_cfg(num_classes: int) -> DetConfig:
    """Oriented R-CNN hyper-params (rotated_detection/oriented_rcnn.py:18-145)."""
    return DetConfig(
        num_classes=num_classes, rotated=True,
        rpn_smooth_l1_beta=1.0 / 9.0, rpn_nms_iou=0.8,
        nms_pre=2000, max_proposals=1000,
        rcnn_match_low_quality=False, reg_class_agnostic=True,
        bbox_stds=(0.1, 0.1, 0.2, 0.2, 0.1), rcnn_smooth_l1_beta=1.0,
        test_nms_iou=0.1, max_per_img=200)


class TwoStageDetector(nn.Module):
    """Backbone + FPN + RPN + RoI trunk (+ mask trunk) with inline final
    layers.  For multi-task pretraining use the trunks directly with external
    final layers (see tasks/multitask.py)."""

    backbone_cfg: BackboneConfig
    det: DetConfig
    fpn_channels: int = 256

    def setup(self):
        d = self.det
        dtype = jnp.dtype(self.backbone_cfg.dtype)
        self.backbone = build_backbone(self.backbone_cfg)
        self.neck = FPN(self.fpn_channels, num_outs=5, dtype=dtype, name="neck")
        self.rpn_head = RPNHead(self.fpn_channels, 3,
                                6 if d.rotated else 4, dtype=dtype,
                                name="rpn_head")
        self.bbox_trunk = Shared2FCTrunk(1024, dtype=dtype, name="bbox_trunk")
        reg_dim = 5 if d.rotated else 4
        reg_out = reg_dim if d.reg_class_agnostic else reg_dim * d.num_classes
        self.fc_cls = nn.Dense(d.num_classes + 1, dtype=jnp.float32,
                               name="fc_cls")
        self.fc_reg = nn.Dense(reg_out, dtype=jnp.float32, name="fc_reg")
        if d.with_mask:
            self.mask_trunk = FCNMaskTrunk(
                256, upsample=d.mask_upsample, dtype=dtype,
                name="mask_trunk")
            self.conv_logits = nn.Conv(d.num_classes, (1, 1),
                                       dtype=jnp.float32, name="conv_logits")

    # -- stages -------------------------------------------------------------
    def features(self, x: Array, deterministic: bool = True) -> Tuple[Array, ...]:
        return self.neck(self.backbone(x, deterministic))

    def rpn(self, feats: Sequence[Array]) -> RPNOut:
        return self.rpn_head(feats)

    def roi_feats(self, feats: Sequence[Array], rois: Array, batch_idx: Array,
                  out_size: int) -> Array:
        """Multilevel RoIAlign with static all-level compute + select.
        rois: (R, 4) hbox or (R, 5) rbox."""
        d = self.det
        if _ROI_ATLAS:
            return multilevel_roi_align_fused(
                feats[:4], rois, batch_idx, out_size, d.fpn_strides,
                rotated=d.rotated, clockwise=True)
        if d.rotated:
            lvls = map_rroi_levels(rois, 4)
            outs = jnp.stack([
                roi_align_rotated(f, rois, batch_idx, out_size, 1.0 / s,
                                  clockwise=True)
                for f, s in zip(feats[:4], d.fpn_strides)], axis=0)
        else:
            lvls = map_roi_levels(rois, 4)
            outs = jnp.stack([
                roi_align(f, rois, batch_idx, out_size, 1.0 / s)
                for f, s in zip(feats[:4], d.fpn_strides)], axis=0)
        return jnp.take_along_axis(outs, lvls[None, :, None, None, None],
                                   axis=0)[0]

    def box_head(self, feats: Sequence[Array], rois: Array,
                 batch_idx: Array) -> Tuple[Array, Array]:
        rf = self.roi_feats(feats, rois, batch_idx, self.det.roi_size)
        x = self.bbox_trunk(rf)
        return self.fc_cls(x), self.fc_reg(x)

    def mask_head_logits(self, feats: Sequence[Array], rois: Array,
                         batch_idx: Array) -> Array:
        rf = self.roi_feats(feats, rois, batch_idx, self.det.mask_roi_size)
        return self.conv_logits(self.mask_trunk(rf))

    # -- init path ----------------------------------------------------------
    def __call__(self, x: Array):
        """Runs every submodule once so flax creates all params."""
        feats = self.features(x)
        rpn_out = self.rpn(feats)
        B = x.shape[0]
        R = 8
        if self.det.rotated:
            rois = jnp.tile(jnp.asarray([[32., 32., 16., 8., 0.1]]), (R, 1))
        else:
            rois = jnp.tile(jnp.asarray([[16., 16., 48., 48.]]), (R, 1))
        bidx = jnp.zeros((R,), jnp.int32)
        cls, reg = self.box_head(feats, rois, bidx)
        if self.det.with_mask:
            self.mask_head_logits(feats, rois, bidx)
        return rpn_out, cls, reg
