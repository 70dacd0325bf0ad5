"""Fixed-shape NMS for TPU.

The reference uses mmcv's CUDA `batched_nms` / `nms_rotated`.  TPU cannot do
data-dependent shapes, so this is the padded-tensor design from SURVEY.md §7:
inputs are fixed-size (score = -inf marks padding), output is a fixed-size
keep mask + top-k selection.  The suppression loop is a `lax.fori_loop` over
boxes in score order against a precomputed IoU matrix — O(N²) memory, N ≤ a
few thousand, which the VPU handles easily.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from mtp_tpu.ops.boxes import bbox_overlaps

Array = jax.Array

NEG_INF = -1e10


def nms_mask(ious: Array, scores: Array, iou_thr: float) -> Array:
    """Greedy NMS keep mask given a pairwise IoU matrix.

    ious (N, N) for boxes already in ANY order; scores (N,) with padding at
    -inf.  Returns bool (N,) keep mask.  Sequential over the N boxes in
    descending score order.
    """
    n = scores.shape[0]
    order = jnp.argsort(-scores)  # high→low
    ious_o = ious[order][:, order]
    valid = scores[order] > NEG_INF / 2

    def body(i, state):
        keep, alive = state
        take = alive[i] & valid[i]
        keep = keep.at[i].set(take)
        sup = ious_o[i] > iou_thr
        alive = jnp.where(take, alive & (~sup | (jnp.arange(n) <= i)), alive)
        return keep, alive

    keep0 = jnp.zeros((n,), bool)
    alive0 = jnp.ones((n,), bool)
    keep_o, _ = jax.lax.fori_loop(0, n, body, (keep0, alive0))
    # scatter back to input order
    keep = jnp.zeros((n,), bool).at[order].set(keep_o)
    return keep


def nms(boxes: Array, scores: Array, iou_thr: float,
        max_out: int, iou_fn: Callable[[Array, Array], Array] = None
        ) -> Tuple[Array, Array]:
    """Fixed-shape NMS.

    boxes (N, 4[+]), scores (N,) with -inf padding → (idx (max_out,),
    keep_scores (max_out,)); idx is into the input, padded entries have
    score -inf (idx points at an arbitrary suppressed slot).
    """
    iou_fn = iou_fn or (lambda a, b: bbox_overlaps(a, b))
    ious = iou_fn(boxes, boxes)
    keep = nms_mask(ious, scores, iou_thr)
    kept_scores = jnp.where(keep, scores, NEG_INF)
    top_scores, idx = jax.lax.top_k(kept_scores, max_out)
    return idx, top_scores


def batched_nms(boxes: Array, scores: Array, idxs: Array, iou_thr: float,
                max_out: int,
                iou_fn: Callable[[Array, Array], Array] = None,
                class_agnostic: bool = False) -> Tuple[Array, Array]:
    """Category-aware NMS via the coordinate-offset trick (mmcv batched_nms):
    boxes of different `idxs` never overlap after shifting by idx * extent.

    For rotated boxes pass a custom iou_fn and pre-offset centers upstream.
    """
    if class_agnostic:
        return nms(boxes, scores, iou_thr, max_out, iou_fn)
    # translate per class: x1y1x2y2 boxes shift all 4 coords, (cx, cy, w, h,
    # theta) rboxes shift only the center.
    ndim = 4 if boxes.shape[-1] == 4 else 2
    if ndim == 4:
        # corners bounded by max|coord| on both sides → 2x + 1 separates
        extent = jnp.max(jnp.abs(boxes)) * 2.0 + 1.0
    else:
        # rotated: centers span ±max|cx,cy| (decoded boxes can be negative)
        # and each box reaches up to sqrt(w²+h²)/2 ≤ √2·max(w,h)/2 beyond
        # its center, on both of the two adjacent clusters
        extent = (jnp.max(jnp.abs(boxes[..., :2])) * 2.0
                  + jnp.sqrt(2.0) * jnp.max(jnp.abs(boxes[..., 2:4])) + 1.0)
    off = idxs.astype(boxes.dtype)[:, None] * extent  # (N, 1)
    shifted = boxes.at[..., :ndim].add(
        jnp.broadcast_to(off, boxes[..., :ndim].shape))
    return nms(shifted, scores, iou_thr, max_out, iou_fn)
