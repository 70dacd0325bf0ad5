"""RetinaNet single-stage detector (Xview horizontal-detection recipe).

Capability parity with the reference config
(RS_Tasks_Finetune/Horizontal_Detection/configs/mtp/xview/
retinanet_rvsa_l_416_mae_mtp_xview.py:227-268): RetinaHead with 4 stacked
convs, anchor octave_base_scale 4 × 3 scales/octave × ratios (0.5, 1, 2) on
strides (8..128), focal loss (gamma 2, alpha 0.25) + L1, MaxIoU assigner
(0.5/0.4, min_pos_iou 0), NMS test (score_thr 0.05, iou 0.5, top 100).

Fixed-shape TPU design: loss runs over ALL anchors with validity masks (no
sampling — RetinaNet trains on every anchor), prediction pads to max_per_img.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mtp_tpu.heads.fpn import FPN
from mtp_tpu.models.backbones import build_backbone
from mtp_tpu.ops.anchors import AnchorGenerator
from mtp_tpu.ops.assign import max_iou_assign
from mtp_tpu.ops.boxes import delta_decode, delta_encode
from mtp_tpu.ops.nms import NEG_INF, batched_nms
from mtp_tpu.tasks.detection import Detections
from mtp_tpu.utils.config import BackboneConfig

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class RetinaConfig:
    num_classes: int = 60
    stacked_convs: int = 4
    feat_channels: int = 256
    octave_base_scale: float = 4.0
    scales_per_octave: int = 3
    ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    pos_iou: float = 0.5
    neg_iou: float = 0.4
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    score_thr: float = 0.05
    nms_pre: int = 1000
    nms_iou: float = 0.5
    max_per_img: int = 100
    max_gts: int = 100


def retina_anchors(cfg: RetinaConfig, img_hw: Tuple[int, int]) -> np.ndarray:
    scales = tuple(cfg.octave_base_scale * 2 ** (i / cfg.scales_per_octave)
                   for i in range(cfg.scales_per_octave))
    gen = AnchorGenerator(strides=cfg.strides, scales=scales,
                          ratios=cfg.ratios)
    sizes = [((img_hw[0] + s - 1) // s, (img_hw[1] + s - 1) // s)
             for s in cfg.strides]
    return gen.grid_flat(sizes)


class RetinaNet(nn.Module):
    backbone_cfg: BackboneConfig
    det: RetinaConfig

    def setup(self):
        dtype = jnp.dtype(self.backbone_cfg.dtype)
        d = self.det
        A = len(d.ratios) * d.scales_per_octave
        self.backbone = build_backbone(self.backbone_cfg)
        # reference neck (retinanet_rvsa_l_416_mae_mtp_xview.py:220-226):
        # start_level=1 (strides 8..64) + 2 learned extra convs on the last
        # backbone input (strides 64→128), giving strides 8..128
        self.neck = FPN(d.feat_channels, num_outs=5, start_level=1,
                        add_extra_convs="on_input", dtype=dtype, name="neck")
        self.cls_convs = [nn.Conv(d.feat_channels, (3, 3), padding=1,
                                  dtype=dtype, name=f"cls_conv_{i}")
                          for i in range(d.stacked_convs)]
        self.reg_convs = [nn.Conv(d.feat_channels, (3, 3), padding=1,
                                  dtype=dtype, name=f"reg_conv_{i}")
                          for i in range(d.stacked_convs)]
        # retina bias init: prior prob 0.01 for the focal classifier
        bias_init = nn.initializers.constant(-np.log((1 - 0.01) / 0.01))
        self.retina_cls = nn.Conv(A * d.num_classes, (3, 3), padding=1,
                                  dtype=jnp.float32, bias_init=bias_init,
                                  name="retina_cls")
        self.retina_reg = nn.Conv(A * 4, (3, 3), padding=1,
                                  dtype=jnp.float32, name="retina_reg")

    def __call__(self, x: Array, deterministic: bool = True
                 ) -> Tuple[Array, Array]:
        """→ cls logits (B, A_total, K), deltas (B, A_total, 4).

        FPN levels: RetinaNet uses strides 8..128, i.e. the backbone pyramid
        shifted one level up with two extra downsampled levels."""
        d = self.det
        feats = self.neck(self.backbone(x, deterministic))
        cls_out, reg_out = [], []
        B = x.shape[0]
        for f in feats:
            c = f
            for conv in self.cls_convs:
                c = nn.relu(conv(c))
            cls_out.append(self.retina_cls(c).reshape(B, -1, d.num_classes))
            r = f
            for conv in self.reg_convs:
                r = nn.relu(conv(r))
            reg_out.append(self.retina_reg(r).reshape(B, -1, 4))
        return (jnp.concatenate(cls_out, axis=1),
                jnp.concatenate(reg_out, axis=1))


def focal_loss(logits: Array, labels: Array, valid: Array, num_classes: int,
               gamma: float, alpha: float) -> Array:
    """Sigmoid focal loss, summed and normalized by num positives
    (mmdet FocalLoss semantics).  labels: -1 ignore, num_classes = bg."""
    y = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * y + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    p_t = p * y + (1 - p) * (1 - y)
    a_t = alpha * y + (1 - alpha) * (1 - y)
    loss = a_t * (1 - p_t) ** gamma * ce
    loss = jnp.where(valid[..., None], loss, 0.0)
    fg = ((labels >= 0) & (labels < num_classes) & valid).sum()
    return loss.sum() / jnp.maximum(fg, 1)


def retinanet_loss(model: RetinaNet, variables, batch: Dict[str, Array],
                   anchors: np.ndarray,
                   rng: Array = None) -> Tuple[Array, Dict[str, Array]]:
    det = model.det
    rngs = {"dropout": rng} if rng is not None else None
    cls_logits, deltas = model.apply(variables, batch["image"],
                                     deterministic=rng is None, rngs=rngs)
    A = jnp.asarray(anchors)

    def one(cls_l, dl, gb, gl, gv):
        assign = max_iou_assign(A, gb, gv, gl, det.pos_iou, det.neg_iou,
                                0.0, True)
        # labels: fg class for pos, num_classes (=all-zero one-hot) for neg,
        # -1 (masked) for ignore
        labels = jnp.where(assign.gt_inds > 0, assign.labels, det.num_classes)
        valid = assign.gt_inds >= 0
        lc = focal_loss(cls_l, labels, valid, det.num_classes,
                        det.focal_gamma, det.focal_alpha)
        pos = assign.gt_inds > 0
        tgt = delta_encode(A, gb[jnp.clip(assign.gt_inds - 1, 0, None)])
        lr = jnp.where(pos[:, None], jnp.abs(dl - tgt), 0.0).sum() / \
            jnp.maximum(pos.sum(), 1)
        return {"loss_cls": lc, "loss_bbox": lr}

    losses = jax.vmap(one)(cls_logits, deltas, batch["gt_boxes"],
                           batch["gt_labels"], batch["gt_valid"])
    losses = {k: v.mean() for k, v in losses.items()}
    return losses["loss_cls"] + losses["loss_bbox"], losses


def retinanet_predict(model: RetinaNet, variables, images: Array,
                      anchors: np.ndarray) -> Detections:
    det = model.det
    cls_logits, deltas = model.apply(variables, images, deterministic=True)
    A = jnp.asarray(anchors)
    B = images.shape[0]
    H, W = images.shape[1:3]
    K = det.num_classes

    def prep(cls_l, dl):
        """Score top-k + decode (vmapped); NMS runs natively batched
        below — vmapping it is 28x slower on TPU (see ops/nms.py)."""
        probs = jax.nn.sigmoid(cls_l)  # (A_total, K)
        flat = probs.reshape(-1)
        top_s, top_i = jax.lax.top_k(
            jnp.where(flat > det.score_thr, flat, NEG_INF),
            min(det.max_per_img * 10, flat.shape[0]))
        a_i = top_i // K
        c_i = (top_i % K).astype(jnp.int32)
        boxes = delta_decode(A[a_i], dl[a_i], max_shape=(H, W))
        return boxes, top_s, c_i

    cand_b, cand_s, cand_l = jax.vmap(prep)(cls_logits, deltas)
    keep_i, scores = batched_nms(cand_b, cand_s, cand_l, det.nms_iou,
                                 det.max_per_img)
    boxes = jnp.take_along_axis(cand_b, keep_i[..., None], axis=1)
    labels = jnp.take_along_axis(cand_l, keep_i, axis=1)
    return Detections(boxes, scores, labels, scores > NEG_INF / 2)
