"""RPN head (horizontal + oriented) with fixed-shape proposal generation.

Capability parity with the reference `MTP_IS_RPNHead`
(instance_segmentation/rpn_head.py) and `MTP_RD_OrientedRPNHead`
(rotated_detection/rpn_head.py:320): shared 3x3 conv → 1x1 objectness +
1x1 regression per anchor; training samples 256 anchors (BCE + L1/SmoothL1);
proposal generation takes global top-`nms_pre` scored anchors, decodes,
clips, and runs fixed-shape NMS.

TPU notes: with `level_sizes` given, top-`nms_pre` is taken PER LEVEL with
static per-level k (the reference rule, instance_segmentation/rpn_head.py:
236-304) and the per-level winners concatenate before one joint NMS; without
it the top-k is global across levels (the round-1/2 deviation, kept as the
fallback).  Proposal lists are padded to `max_per_img` with -inf scores
instead of being ragged.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mtp_tpu.ops.boxes import delta_decode
from mtp_tpu.ops.nms import NEG_INF, nms, nms_batched
from mtp_tpu.ops.rotated_boxes import midpoint_decode

Array = jax.Array


class RPNOut(NamedTuple):
    cls_scores: Array   # (B, A_total) objectness logits, flattened over levels
    deltas: Array       # (B, A_total, 4 or 6)


class RPNHead(nn.Module):
    feat_channels: int = 256
    num_base_anchors: int = 3
    delta_dim: int = 4  # 6 for the oriented (midpoint-offset) RPN
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[Array]) -> RPNOut:
        conv = nn.Conv(self.feat_channels, (3, 3), padding=1,
                       dtype=self.dtype, name="rpn_conv")
        cls = nn.Conv(self.num_base_anchors, (1, 1), dtype=jnp.float32,
                      name="rpn_cls")
        reg = nn.Conv(self.num_base_anchors * self.delta_dim, (1, 1),
                      dtype=jnp.float32, name="rpn_reg")
        scores, deltas = [], []
        for f in feats:
            h = nn.relu(conv(f))
            B = h.shape[0]
            s = cls(h).reshape(B, -1)                      # (B, H*W*A)
            d = reg(h).reshape(B, -1, self.delta_dim)      # (B, H*W*A, D)
            scores.append(s)
            deltas.append(d)
        return RPNOut(jnp.concatenate(scores, axis=1),
                      jnp.concatenate(deltas, axis=1))


def gen_proposals(rpn_out: RPNOut, anchors: Array,
                  img_shape: Tuple[int, int], nms_pre: int = 2000,
                  max_per_img: int = 1000, iou_thr: float = 0.7,
                  rotated: bool = False,
                  level_sizes: Optional[Sequence[int]] = None
                  ) -> Tuple[Array, Array]:
    """Fixed-shape proposal generation.

    anchors (A_total, 4) constants.  level_sizes: static per-level flat
    anchor counts — when given, top-k runs per level (reference semantics);
    the per-level k = min(nms_pre, level_size) is compile-time constant.
    Returns (boxes (B, max_per_img, 4|5), scores (B, max_per_img) with
    -inf padding)."""

    def topk(scores):
        if not level_sizes:
            return jax.lax.top_k(scores, min(nms_pre, scores.shape[0]))
        tops, idxs, off = [], [], 0
        for sz in level_sizes:
            s, i = jax.lax.top_k(
                jax.lax.dynamic_slice_in_dim(scores, off, sz, 0),
                min(nms_pre, sz))
            tops.append(s)
            idxs.append(i + off)
            off += sz
        return jnp.concatenate(tops), jnp.concatenate(idxs)

    def one(scores, deltas):
        """Top-k + decode only — cheap to vmap.  NMS runs natively
        batched below: vmapping it batches the suppression loop's
        dynamic slices into gathers (measured 28x slower on-chip)."""
        top_s, idx = topk(scores)
        a = anchors[idx]
        d = deltas[idx]
        if rotated:
            boxes = midpoint_decode(a, d)
            # clip centers into the image
            h, w = img_shape
            boxes = boxes.at[:, 0].set(jnp.clip(boxes[:, 0], 0, w))
            boxes = boxes.at[:, 1].set(jnp.clip(boxes[:, 1], 0, h))
        else:
            boxes = delta_decode(a, d, max_shape=img_shape)
        return boxes, top_s

    boxes, top_s = jax.vmap(one)(rpn_out.cls_scores, rpn_out.deltas)
    if rotated:
        from mtp_tpu.ops.rotated_boxes import rbox_to_hbox
        # oriented RPN uses horizontal NMS on the bounding boxes
        nms_in = rbox_to_hbox(boxes.reshape(-1, 5)).reshape(
            boxes.shape[0], -1, 4)
    else:
        nms_in = boxes
    keep_idx, keep_s = nms_batched(nms_in, top_s, iou_thr, max_per_img)
    return jnp.take_along_axis(
        boxes, keep_idx[..., None], axis=1), keep_s


def rpn_loss(rpn_out: RPNOut, anchors: Array, sample, target_deltas: Array,
             smooth_l1_beta: Optional[float] = None) -> dict:
    """Loss on sampled anchor slots.

    sample: SampleResult over the flat anchor set (per image, vmapped by the
    caller).  target_deltas (num, D) encode gt against the sampled anchors.
    BCE objectness on valid slots; L1 (or SmoothL1) regression on positives,
    normalized by the number of sampled slots (mmdet avg_factor semantics).
    """
    logits = rpn_out.cls_scores[sample.inds]
    labels = sample.is_pos.astype(jnp.float32)
    valid = sample.valid
    bce = optax_sigmoid_ce(logits, labels)
    n_valid = jnp.maximum(valid.sum(), 1)
    loss_cls = jnp.where(valid, bce, 0.0).sum() / n_valid

    d = rpn_out.deltas[sample.inds]
    diff = d - target_deltas
    if smooth_l1_beta:
        ad = jnp.abs(diff)
        l1 = jnp.where(ad < smooth_l1_beta,
                       0.5 * ad * ad / smooth_l1_beta,
                       ad - 0.5 * smooth_l1_beta)
    else:
        l1 = jnp.abs(diff)
    loss_reg = jnp.where(sample.is_pos[:, None], l1, 0.0).sum() / n_valid
    return {"loss_rpn_cls": loss_cls, "loss_rpn_bbox": loss_reg}


def optax_sigmoid_ce(logits: Array, labels: Array) -> Array:
    zeros = jnp.zeros_like(logits)
    return jnp.maximum(logits, zeros) - logits * labels + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))
