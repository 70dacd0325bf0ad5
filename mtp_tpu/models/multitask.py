"""Multi-task pretraining model: one shared encoder, three task decoders,
nine per-dataset final layers.

Capability parity with `MutliTaskPretrnFramework`
(Multi-Task_Pretrain/models.py:28-222):

- the three dataset batches are concatenated into ONE encoder forward
  (reference :329-335) — on TPU this is exactly the right design: one big
  batch keeps the MXU full and the split afterwards is free,
- semantic segmentation: UperNet trunk (channels 256) shared, per-dataset
  dropout+1x1 heads (:129-140); the trunk's BN runs per dataset batch like
  the reference's 3 separate `_forward_feature` calls,
- instance segmentation (Mask R-CNN) and rotated detection (Oriented R-CNN):
  shared FPN neck + RPN + RoI trunks per task, per-dataset final
  fc_cls/fc_reg/conv_logits (:150-180),
- class-count policy (`background == True`): ss heads predict `classes`
  channels (background included), detection heads `classes - 1` foreground
  classes (:54-66).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mtp_tpu.heads.fpn import FPN
from mtp_tpu.heads.roi_heads import FCNMaskTrunk, Shared2FCTrunk
from mtp_tpu.heads.rpn import RPNHead
from mtp_tpu.heads.upernet import UperNetHead
from mtp_tpu.models.detector import DetConfig, oriented_rcnn_cfg
from mtp_tpu.models.backbones import build_backbone
from mtp_tpu.ops.roi_align import (ROI_ATLAS as _ROI_ATLAS, map_roi_levels,
                                   map_rroi_levels,
                                   multilevel_roi_align_fused,
                                   roi_align, roi_align_rotated)
from mtp_tpu.ops.rotated_boxes import rbox_to_hbox
from mtp_tpu.utils.config import BackboneConfig

Array = jax.Array

# SAMRS dataset class counts including background (reference main_pretrain.py
# passes classes1..3 = 18 (SOTA), 20 (SIOR), 37 (FAST) with --background True)
# total class counts incl. background: SOTA 18+1, SIOR 20+1, FAST 37+1
# (reference main_pretrain.py:150-157 with the default --background True)
SAMRS_CLASSES = (19, 21, 38)


def default_det_h(num_classes: int) -> DetConfig:
    return DetConfig(num_classes=num_classes, with_mask=True)


class MultiTaskPretrainModel(nn.Module):
    cfg: BackboneConfig
    classes: Tuple[int, int, int] = SAMRS_CLASSES  # incl. background
    det_overrides: Dict[str, Any] = dataclasses.field(default_factory=dict)
    # task-subset selection (reference `--tasks`, main_pretrain.py:32; the
    # torch model constructs every decoder but gates forward/loss on
    # args.tasks — models.py:375,386,435).  Same here: all params exist
    # (checkpoint layout is task-independent), only selected branches run.
    tasks: Tuple[str, ...] = ("ss", "is", "rd")
    # det branch batching across datasets.  Exact either way; measured A/B
    # on the v5e relay chip (tools/bench_extras/detmulti_ab.py): the
    # concatenated form runs PAST this chip's op-size throughput knee
    # (is+mask 370 vs 146 ms, rd 276 vs 58 ms fwd+bwd) — sequential
    # per-dataset branches are the default; flip on for hardware where
    # larger ops amortize (direct-attached pods).
    det_multi: bool = False

    @property
    def det_h_cfgs(self):
        return [dataclasses.replace(default_det_h(c - 1), **self.det_overrides)
                for c in self.classes]

    @property
    def det_r_cfgs(self):
        ov = dict(self.det_overrides)
        ov.pop("with_mask", None)
        return [dataclasses.replace(oriented_rcnn_cfg(c - 1), **ov)
                for c in self.classes]

    def setup(self):
        dtype = jnp.dtype(self.cfg.dtype)
        self.encoder = build_backbone(self.cfg, name="encoder")

        # --- semantic segmentation ---
        self.ss_trunk = UperNetHead(0, channels=256, with_classifier=False,
                                    dtype=dtype, name="ss_trunk")
        self.ss_heads = [nn.Conv(c, (1, 1), dtype=jnp.float32,
                                 name=f"ss_head_{i}")
                         for i, c in enumerate(self.classes)]

        # --- instance segmentation (Mask R-CNN) ---
        self.is_neck = FPN(256, 5, dtype=dtype, name="is_neck")
        self.is_rpn = RPNHead(256, 3, 4, dtype=dtype, name="is_rpn")
        self.is_bbox_trunk = Shared2FCTrunk(1024, dtype=dtype,
                                            name="is_bbox_trunk")
        self.is_mask_trunk = FCNMaskTrunk(256, dtype=dtype,
                                          name="is_mask_trunk")
        self.is_fc_cls = [nn.Dense(c, dtype=jnp.float32, name=f"is_fc_cls_{i}")
                          for i, c in enumerate(c0 for c0 in
                                                [c - 1 + 1 for c in self.classes])]
        self.is_fc_reg = [nn.Dense((c - 1) * 4, dtype=jnp.float32,
                                   name=f"is_fc_reg_{i}")
                          for i, c in enumerate(self.classes)]
        self.is_mask_conv = [nn.Conv(c - 1, (1, 1), dtype=jnp.float32,
                                     name=f"is_mask_conv_{i}")
                             for i, c in enumerate(self.classes)]

        # --- rotated detection (Oriented R-CNN) ---
        self.rd_neck = FPN(256, 5, dtype=dtype, name="rd_neck")
        self.rd_rpn = RPNHead(256, 3, 6, dtype=dtype, name="rd_rpn")
        self.rd_bbox_trunk = Shared2FCTrunk(1024, dtype=dtype,
                                            name="rd_bbox_trunk")
        self.rd_fc_cls = [nn.Dense(c, dtype=jnp.float32, name=f"rd_fc_cls_{i}")
                          for i, c in enumerate([c - 1 + 1 for c in self.classes])]
        self.rd_fc_reg = [nn.Dense(5, dtype=jnp.float32, name=f"rd_fc_reg_{i}")
                          for i in range(3)]

    # -- shared pieces ------------------------------------------------------
    def encode(self, images: Array, deterministic: bool = True):
        """One concatenated encoder forward for all datasets."""
        return self.encoder(images, deterministic)

    def _roi_feats(self, feats, rois, bidx, out_size, rotated):
        strides = (4, 8, 16, 32)
        if _ROI_ATLAS:
            return multilevel_roi_align_fused(
                feats[:4], rois, bidx, out_size, strides, rotated=rotated,
                clockwise=True)
        if rotated:
            lvls = map_rroi_levels(rois, 4)
            outs = jnp.stack([
                roi_align_rotated(f, rois, bidx, out_size, 1.0 / s,
                                  clockwise=True)
                for f, s in zip(feats[:4], strides)], axis=0)
        else:
            lvls = map_roi_levels(rois, 4)
            outs = jnp.stack([roi_align(f, rois, bidx, out_size, 1.0 / s)
                              for f, s in zip(feats[:4], strides)], axis=0)
        return jnp.take_along_axis(outs, lvls[None, :, None, None, None],
                                   axis=0)[0]

    # -- per-task heads ------------------------------------------------------
    def ss_logits(self, enc_feats, d: int, train: bool, deterministic: bool):
        x = self.ss_trunk(enc_feats, train, deterministic)
        if not deterministic:
            # Dropout2d(0.1): drop whole channels (reference ss heads
            # models.py:129-140)
            keep = jax.random.bernoulli(
                self.make_rng("dropout"), 0.9,
                (x.shape[0], 1, 1, x.shape[-1]))
            x = jnp.where(keep, x / 0.9, 0.0).astype(x.dtype)
        return self.ss_heads[d](x)

    def is_forward(self, enc_feats):
        feats = self.is_neck(enc_feats)
        return feats, self.is_rpn(feats)

    def is_box_fn(self, feats, d: int):
        def fn(rois, bidx):
            x = self.is_bbox_trunk(self._roi_feats(feats, rois, bidx, 7, False))
            return self.is_fc_cls[d](x), self.is_fc_reg[d](x)
        return fn

    def is_mask_fn(self, feats, d: int):
        def fn(rois, bidx):
            x = self.is_mask_trunk(self._roi_feats(feats, rois, bidx, 14, False))
            return self.is_mask_conv[d](x)
        return fn

    # segmented variants (training): ONE RoIAlign + trunk pass over the
    # concatenated 3-dataset roi set, per-dataset final layers on static
    # row slices (see det_loss_multi)
    def is_box_multi_fn(self, feats):
        def fn(rois, bidx, segs):
            x = self.is_bbox_trunk(self._roi_feats(feats, rois, bidx, 7, False))
            return [(self.is_fc_cls[d](x[s:e]), self.is_fc_reg[d](x[s:e]))
                    for d, (s, e) in enumerate(segs)]
        return fn

    def is_mask_multi_fn(self, feats):
        def fn(rois, bidx, segs):
            x = self.is_mask_trunk(self._roi_feats(feats, rois, bidx, 14, False))
            return [self.is_mask_conv[d](x[s:e])
                    for d, (s, e) in enumerate(segs)]
        return fn

    def rd_forward(self, enc_feats):
        feats = self.rd_neck(enc_feats)
        return feats, self.rd_rpn(feats)

    def rd_box_fn(self, feats, d: int):
        def fn(rois, bidx):
            x = self.rd_bbox_trunk(self._roi_feats(feats, rois, bidx, 7, True))
            return self.rd_fc_cls[d](x), self.rd_fc_reg[d](x)
        return fn

    def rd_box_multi_fn(self, feats):
        def fn(rois, bidx, segs):
            x = self.rd_bbox_trunk(self._roi_feats(feats, rois, bidx, 7, True))
            return [(self.rd_fc_cls[d](x[s:e]), self.rd_fc_reg[d](x[s:e]))
                    for d, (s, e) in enumerate(segs)]
        return fn

    # -- joint loss ----------------------------------------------------------
    def loss(self, batches: Sequence[Dict[str, Array]], rng: Array,
             anchors: np.ndarray, deterministic: bool = False):
        """Joint 3-dataset × 3-task loss (reference models.py:309-468 train
        branch + utils.parse_losses).

        Each batches[d] dict: image (B_d, H, W, 3), ss_label (B_d, H, W),
        gt_boxes/gt_labels/gt_valid/gt_masks (horizontal + masks),
        r_gt_boxes/r_gt_labels/r_gt_valid (rotated).
        """
        from mtp_tpu.core.train import seg_xent

        sizes = [b["image"].shape[0] for b in batches]
        offs = np.cumsum([0] + sizes)
        images = jnp.concatenate([b["image"] for b in batches], axis=0)
        H, W = images.shape[1:3]

        enc = self.encode(images, deterministic)

        enc_split = [[lvl[offs[d]:offs[d + 1]] for lvl in enc]
                     for d in range(3)]

        losses: Dict[str, Array] = {}
        total = 0.0

        # --- semantic segmentation (per-dataset trunk pass, reference
        #     models.py:345-351; gated on 'ss' in tasks like models.py:375) ---
        from mtp_tpu.heads.upernet import resize_bilinear
        for d in range(3) if "ss" in self.tasks else ():
            logits = self.ss_logits(enc_split[d], d, train=not deterministic,
                                    deterministic=deterministic)
            label = batches[d]["ss_label"]
            logits = resize_bilinear(logits, label.shape[1:3])
            l = seg_xent(logits, label, 255)
            losses[f"ss_d{d}"] = l
            total = total + l

        # --- instance segmentation (gate: models.py:386) ---
        # The shared neck+RPN always run once over the concatenated batch;
        # `det_multi` decides whether the per-dataset loss pipelines
        # (proposals, assign/sample, RoIAlign, trunks, heads) run as one
        # concatenated pass (exact — no norm layers couple samples) or as
        # three per-dataset passes.  See the field docstring for the
        # measured A/B that makes sequential the default here.
        from mtp_tpu.heads.rpn import RPNOut
        from mtp_tpu.tasks.detection import det_loss_core, det_loss_multi
        rngs = jax.random.split(rng, 2)

        def _split_rpn(rpn_all, d):
            return RPNOut(rpn_all.cls_scores[offs[d]:offs[d + 1]],
                          rpn_all.deltas[offs[d]:offs[d + 1]])

        if "is" in self.tasks:
            feats_h_all, rpn_h_all = self.is_forward(enc)
            if self.det_multi:
                tot, mets = det_loss_multi(
                    self.det_h_cfgs, anchors, (H, W), rpn_h_all,
                    self.is_box_multi_fn(feats_h_all),
                    self.is_mask_multi_fn(feats_h_all),
                    batches, rngs[0])
            else:
                tot, mets = 0.0, []
                ks = jax.random.split(rngs[0], 3)
                for d in range(3):
                    fd = [lvl[offs[d]:offs[d + 1]] for lvl in feats_h_all]
                    t, m = det_loss_core(
                        self.det_h_cfgs[d], anchors, (H, W),
                        _split_rpn(rpn_h_all, d), self.is_box_fn(fd, d),
                        self.is_mask_fn(fd, d), batches[d], ks[d])
                    tot, mets = tot + t, mets + [m]
            for d, m in enumerate(mets):
                for k, v in m.items():
                    if k.startswith("loss"):
                        losses[f"is_d{d}_{k}"] = v
            total = total + tot

        # --- rotated detection (gate: models.py:435) ---
        if "rd" in self.tasks:
            feats_r_all, rpn_r_all = self.rd_forward(enc)
            rbatches = [{"image": b["image"],
                         "gt_boxes": b["r_gt_boxes"],
                         "gt_labels": b["r_gt_labels"],
                         "gt_valid": b["r_gt_valid"]} for b in batches]
            if self.det_multi:
                tot, mets = det_loss_multi(
                    self.det_r_cfgs, anchors, (H, W), rpn_r_all,
                    self.rd_box_multi_fn(feats_r_all), None,
                    rbatches, rngs[1])
            else:
                tot, mets = 0.0, []
                ks = jax.random.split(rngs[1], 3)
                for d in range(3):
                    fd = [lvl[offs[d]:offs[d + 1]] for lvl in feats_r_all]
                    t, m = det_loss_core(
                        self.det_r_cfgs[d], anchors, (H, W),
                        _split_rpn(rpn_r_all, d), self.rd_box_fn(fd, d),
                        None, rbatches[d], ks[d])
                    tot, mets = tot + t, mets + [m]
            for d, m in enumerate(mets):
                for k, v in m.items():
                    if k.startswith("loss"):
                        losses[f"rd_d{d}_{k}"] = v
            total = total + tot

        return total, losses

    # -- validation ----------------------------------------------------------
    def predict(self, images: Array, d: int, anchors: np.ndarray):
        """Eval branch for dataset d (reference models.py:470-725): ss class
        map + horizontal + rotated padded detections."""
        from mtp_tpu.heads.upernet import resize_bilinear
        from mtp_tpu.tasks.detection import det_predict_core

        B, H, W, _ = images.shape
        enc = self.encode(images, deterministic=True)
        ss_pred = det_h = det_r = None
        if "ss" in self.tasks:
            ss = self.ss_logits(enc, d, train=False, deterministic=True)
            ss_pred = resize_bilinear(ss, (H, W)).argmax(-1)
        if "is" in self.tasks:
            feats_h, rpn_h = self.is_forward(enc)
            det_h = det_predict_core(self.det_h_cfgs[d], anchors, (H, W), B,
                                     rpn_h, self.is_box_fn(feats_h, d),
                                     self.is_mask_fn(feats_h, d))
        if "rd" in self.tasks:
            feats_r, rpn_r = self.rd_forward(enc)
            det_r = det_predict_core(self.det_r_cfgs[d], anchors, (H, W), B,
                                     rpn_r, self.rd_box_fn(feats_r, d))
        return ss_pred, det_h, det_r

    # -- init path -----------------------------------------------------------
    def __call__(self, images: Array):
        """Runs all submodules once for parameter creation."""
        enc = self.encode(images)
        for d in range(3):
            self.ss_logits(enc, d, train=True, deterministic=True)
        feats_h, rpn_h = self.is_forward(enc)
        feats_r, rpn_r = self.rd_forward(enc)
        rois_h = jnp.tile(jnp.asarray([[8., 8., 40., 40.]]), (4, 1))
        rois_r = jnp.tile(jnp.asarray([[24., 24., 16., 8., 0.1]]), (4, 1))
        bidx = jnp.zeros((4,), jnp.int32)
        for d in range(3):
            self.is_box_fn(feats_h, d)(rois_h, bidx)
            self.is_mask_fn(feats_h, d)(rois_h, bidx)
            self.rd_box_fn(feats_r, d)(rois_r, bidx)
        return rpn_h, rpn_r
