"""Horizontal box ops: IoU/IoF overlaps and the DeltaXYWH box coder.

Semantics match mmdet's `bbox_overlaps` and `DeltaXYWHBBoxCoder` (used by the
reference RPN/RCNN heads, instance_segmentation/mask_rcnn.py:28-41), with
fixed-shape jnp implementations: invalid/padded boxes are handled by masks,
never by filtering.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def box_area(boxes: Array) -> Array:
    """(..., 4) x1y1x2y2 → area; degenerate boxes clamp to 0."""
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0)
    return w * h


def bbox_overlaps(a: Array, b: Array, mode: str = "iou",
                  eps: float = 1e-6) -> Array:
    """Pairwise overlaps of a (N, 4) vs b (M, 4) → (N, M).

    mode 'iou': inter/union; 'iof': inter/area(a)."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = box_area(a)[:, None]
    if mode == "iof":
        denom = area_a
    else:
        denom = area_a + box_area(b)[None, :] - inter
    return inter / jnp.maximum(denom, eps)


# ---------------------------------------------------------------------------
# DeltaXYWH coder (mmdet semantics incl. wh_ratio_clip)
# ---------------------------------------------------------------------------

def delta_encode(proposals: Array, gts: Array,
                 means: Sequence[float] = (0., 0., 0., 0.),
                 stds: Sequence[float] = (1., 1., 1., 1.)) -> Array:
    """(..., 4), (..., 4) → deltas (..., 4)."""
    px = (proposals[..., 0] + proposals[..., 2]) * 0.5
    py = (proposals[..., 1] + proposals[..., 3]) * 0.5
    pw = proposals[..., 2] - proposals[..., 0]
    ph = proposals[..., 3] - proposals[..., 1]
    gx = (gts[..., 0] + gts[..., 2]) * 0.5
    gy = (gts[..., 1] + gts[..., 3]) * 0.5
    gw = gts[..., 2] - gts[..., 0]
    gh = gts[..., 3] - gts[..., 1]
    pw = jnp.maximum(pw, 1e-6)
    ph = jnp.maximum(ph, 1e-6)
    d = jnp.stack([(gx - px) / pw, (gy - py) / ph,
                   jnp.log(jnp.maximum(gw, 1e-6) / pw),
                   jnp.log(jnp.maximum(gh, 1e-6) / ph)], axis=-1)
    means = jnp.asarray(means, d.dtype)
    stds = jnp.asarray(stds, d.dtype)
    return (d - means) / stds


def delta_decode(rois: Array, deltas: Array,
                 means: Sequence[float] = (0., 0., 0., 0.),
                 stds: Sequence[float] = (1., 1., 1., 1.),
                 max_shape: Optional[Tuple[int, int]] = None,
                 wh_ratio_clip: float = 16 / 1000) -> Array:
    """rois (..., 4), deltas (..., 4) → decoded boxes (..., 4)."""
    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    d = deltas * stds + means
    dx, dy, dw, dh = d[..., 0], d[..., 1], d[..., 2], d[..., 3]
    max_ratio = abs(math.log(wh_ratio_clip))
    dw = jnp.clip(dw, -max_ratio, max_ratio)
    dh = jnp.clip(dh, -max_ratio, max_ratio)

    px = (rois[..., 0] + rois[..., 2]) * 0.5
    py = (rois[..., 1] + rois[..., 3]) * 0.5
    pw = rois[..., 2] - rois[..., 0]
    ph = rois[..., 3] - rois[..., 1]

    gx = px + pw * dx
    gy = py + ph * dy
    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)
    x1, y1 = gx - gw * 0.5, gy - gh * 0.5
    x2, y2 = gx + gw * 0.5, gy + gh * 0.5
    out = jnp.stack([x1, y1, x2, y2], axis=-1)
    if max_shape is not None:
        h, w = max_shape
        out = jnp.stack([jnp.clip(out[..., 0], 0, w), jnp.clip(out[..., 1], 0, h),
                         jnp.clip(out[..., 2], 0, w), jnp.clip(out[..., 3], 0, h)],
                        axis=-1)
    return out
