"""Detection task driver (horizontal Faster/Mask R-CNN, rotated Oriented
R-CNN, RetinaNet) — fit/evaluate wiring like the other task drivers.

Eval protocols match the reference suites: DIOR AP50 (VOC-style), COCO
mAP for instance segmentation, DIOR-R/DOTA rotated mAP.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mtp_tpu.core.optim import make_optimizer, make_schedule, vit_layer_id
from mtp_tpu.core.train import TrainState, create_state, make_train_step, shard_state
from mtp_tpu.eval.det_map import eval_coco_map, eval_map
from mtp_tpu.models.detector import DetConfig, TwoStageDetector, oriented_rcnn_cfg
from mtp_tpu.models.retinanet import (RetinaConfig, RetinaNet, retina_anchors,
                                      retinanet_loss, retinanet_predict)
from mtp_tpu.parallel.mesh import make_mesh
from mtp_tpu.tasks.detection import (anchors_for, detection_loss,
                                     detection_predict)
from mtp_tpu.utils.config import TaskConfig


class DetectionTask:
    """head: 'faster_rcnn' | 'mask_rcnn' | 'oriented_rcnn' | 'retinanet'."""

    def __init__(self, cfg: TaskConfig, head: str = "faster_rcnn",
                 det_overrides: Optional[dict] = None, mesh=None):
        self.cfg = cfg
        self.head = head
        ov = det_overrides or {}
        s = cfg.backbone.img_size
        if head == "retinanet":
            self.det = RetinaConfig(num_classes=cfg.num_classes, **ov)
            self.model = RetinaNet(cfg.backbone, self.det)
            self.anchors = retina_anchors(self.det, (s, s))
        else:
            if head == "oriented_rcnn":
                base = oriented_rcnn_cfg(cfg.num_classes)
            else:
                base = DetConfig(num_classes=cfg.num_classes,
                                 with_mask=(head == "mask_rcnn"))
            self.det = dataclasses.replace(base, **ov)
            self.model = TwoStageDetector(cfg.backbone, self.det)
            self.anchors = anchors_for(self.det, (s, s))
        self.mesh = mesh if mesh is not None else make_mesh(cfg.train.mesh)
        self._tx = None
        self._step_fn = None

    @property
    def rotated(self):
        return self.head == "oriented_rcnn"

    def init_state(self, rng: jax.Array,
                   pretrained_backbone: Optional[dict] = None) -> TrainState:
        cfg = self.cfg
        s = cfg.backbone.img_size
        variables = self.model.init(rng, jnp.zeros((1, s, s, 3), jnp.float32))
        params = dict(variables["params"])
        from mtp_tpu.models.vit_rvsa import rescale_block_init
        params["backbone"] = rescale_block_init(params["backbone"],
                                                cfg.backbone.depth)
        if pretrained_backbone is not None:
            params["backbone"] = pretrained_backbone

        schedule = make_schedule(cfg.train.schedule, cfg.train.optimizer.lr)

        from mtp_tpu.models.backbones import layer_id_fn_for
        layer_id = layer_id_fn_for(cfg.backbone, root="backbone/")

        self._tx = make_optimizer(
            cfg.train.optimizer, schedule, params, cfg.backbone.depth,
            layer_id_fn=layer_id,
            scan_interval=(cfg.backbone.interval if cfg.backbone.scan else None))
        state = create_state(params, self._tx, rng, init_opt=False)
        return shard_state(self.mesh, state, self._tx)

    def train_step_fn(self):
        if self._step_fn is not None:
            return self._step_fn
        model = self.model
        anchors = self.anchors
        head = self.head

        def loss_fn(params, batch_stats, batch, rng):
            if head == "retinanet":
                total, m = retinanet_loss(model, {"params": params}, batch,
                                          anchors, rng)
            else:
                total, m = detection_loss(model, {"params": params}, batch,
                                          rng, anchors)
            metrics = {k: v for k, v in m.items()}
            return total, (metrics, batch_stats)

        self._step_fn = make_train_step(loss_fn, self._tx, self.mesh)
        return self._step_fn

    def fit(self, state: TrainState, data: Iterator[Dict[str, np.ndarray]],
            steps: int, log_every: int = 50,
            log_fn: Callable[[int, dict], None] = None,
            **ckpt_kw) -> Tuple[TrainState, dict]:
        from mtp_tpu.tasks._fit import fit_loop
        return fit_loop(self, state, data, steps, log_every=log_every,
                        log_fn=log_fn, **ckpt_kw)

    # -- eval -----------------------------------------------------------------
    def predict_fn(self):
        """Memoized — a fresh jit per call would recompile on every
        periodic validation."""
        if getattr(self, "_predict", None) is not None:
            return self._predict
        model = self.model
        anchors = self.anchors
        head = self.head

        @jax.jit
        def predict(params, images):
            if head == "retinanet":
                return retinanet_predict(model, {"params": params}, images,
                                         anchors)
            return detection_predict(model, {"params": params}, images,
                                     anchors)

        self._predict = predict
        return predict

    def evaluate(self, state: TrainState,
                 data: Iterator[Dict[str, np.ndarray]],
                 iou_thr: float = 0.5,
                 coco: bool = False) -> Dict[str, float]:
        """VOC AP50 by default (DIOR/DIOR-R protocol); `coco=True` runs the
        full COCO protocol — for mask_rcnn that includes segm (mask-IoU) AP
        like the reference IS metric (instance_segmentation/metric.py:22
        evaluates ['bbox', 'segm'])."""
        from mtp_tpu.eval.masks import paste_masks

        predict = self.predict_fn()
        with_mask = coco and self.head == "mask_rcnn"
        per_image = []
        for batch in data:
            dets = predict(state.params, jnp.asarray(batch["image"]))
            H, W = batch["image"].shape[1:3]
            for i in range(len(batch["image"])):
                v = np.asarray(dets.valid[i])
                gv = np.asarray(batch["gt_valid"][i])
                rec = {
                    "det_boxes": np.asarray(dets.boxes[i])[v],
                    "det_scores": np.asarray(dets.scores[i])[v],
                    "det_labels": np.asarray(dets.labels[i])[v],
                    "gt_boxes": np.asarray(batch["gt_boxes"][i])[gv],
                    "gt_labels": np.asarray(batch["gt_labels"][i])[gv],
                }
                if with_mask and dets.mask_logits is not None \
                        and ("gt_masks" in batch or "gt_mask_crops" in batch):
                    probs = 1.0 / (1.0 + np.exp(
                        -np.asarray(dets.mask_logits[i])[v]))
                    rec["det_masks"] = paste_masks(probs, rec["det_boxes"],
                                                   H, W)
                    if "gt_mask_crops" in batch:
                        # box-aligned crops paste back exactly
                        gm = paste_masks(
                            np.asarray(batch["gt_mask_crops"][i])[gv],
                            rec["gt_boxes"], H, W)
                    else:
                        gm = np.asarray(batch["gt_masks"][i])[gv]
                        # stride-s map → upsample to image resolution
                        if gm.ndim == 3 and gm.shape[1:] != (H, W):
                            ry, rx = H // gm.shape[1], W // gm.shape[2]
                            gm = np.repeat(np.repeat(gm, ry, 1), rx, 2)
                    rec["gt_masks"] = (gm > 0.5).astype(np.uint8)
                per_image.append(rec)
        if coco and not self.rotated:
            from mtp_tpu.eval.coco_eval import evaluate_coco_bbox_segm
            return evaluate_coco_bbox_segm(per_image, self.cfg.num_classes)
        return eval_map(per_image, self.cfg.num_classes, iou_thr,
                        rotated=self.rotated)
