"""Rotated-box geometry: conversions, rotated IoU (polygon clipping), and the
two rotated coders used by Oriented R-CNN.

Replaces mmcv/mmrotate CUDA ops (`box_iou_rotated`, coders referenced by
rotated_detection/oriented_rcnn.py:30-68) with fixed-shape jnp math:

- rboxes are (cx, cy, w, h, theta[rad]); angle_version 'le90' normalizes
  theta to [-pi/2, pi/2) with w as the long edge after regularization,
- rotated IoU collects the intersection polygon's candidate vertices
  (corners-inside + edge crossings) and reduces them with an angle-sorted
  masked shoelace — fully vectorized over the (N, M) pair grid, no
  per-pair control flow (VPU-friendly: everything is masked arithmetic),
- `DeltaXYWHTRBoxCoder` implements proj_xy + edge_swap le90 semantics,
- `MidpointOffsetCoder` implements the Oriented-RPN 6-param encoding
  (hbb deltas + top/right midpoint offsets) per the Oriented R-CNN paper.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from mtp_tpu.ops.boxes import bbox_overlaps

Array = jax.Array
PI = math.pi


# ---------------------------------------------------------------------------
# conversions
# ---------------------------------------------------------------------------

def norm_angle_le90(theta: Array) -> Array:
    """Normalize to [-pi/2, pi/2)."""
    return (theta + PI / 2) % PI - PI / 2


def regularize_le90(rbox: Array) -> Array:
    """Ensure w >= h by swapping edges (theta += pi/2), then normalize."""
    cx, cy, w, h, t = jnp.moveaxis(rbox, -1, 0)
    swap = w < h
    w2 = jnp.where(swap, h, w)
    h2 = jnp.where(swap, w, h)
    t2 = norm_angle_le90(jnp.where(swap, t + PI / 2, t))
    return jnp.stack([cx, cy, w2, h2, t2], axis=-1)


def rbox_to_corners(rbox: Array) -> Array:
    """(..., 5) → (..., 4, 2) corner points (counter-clockwise in math axes)."""
    cx, cy, w, h, t = jnp.moveaxis(rbox, -1, 0)
    cos, sin = jnp.cos(t), jnp.sin(t)
    dx = jnp.stack([-w, w, w, -w], axis=-1) * 0.5
    dy = jnp.stack([-h, -h, h, h], axis=-1) * 0.5
    x = cx[..., None] + dx * cos[..., None] - dy * sin[..., None]
    y = cy[..., None] + dx * sin[..., None] + dy * cos[..., None]
    return jnp.stack([x, y], axis=-1)


def rbox_to_hbox(rbox: Array) -> Array:
    """Axis-aligned bounding box (..., 4) x1y1x2y2 of rotated boxes."""
    c = rbox_to_corners(rbox)
    return jnp.concatenate([c.min(axis=-2), c.max(axis=-2)], axis=-1)


def hbox_to_rbox(hbox: Array) -> Array:
    """(..., 4) → (..., 5) with theta = 0."""
    cx = (hbox[..., 0] + hbox[..., 2]) * 0.5
    cy = (hbox[..., 1] + hbox[..., 3]) * 0.5
    w = hbox[..., 2] - hbox[..., 0]
    h = hbox[..., 3] - hbox[..., 1]
    return regularize_le90(jnp.stack([cx, cy, w, h, jnp.zeros_like(w)], -1))


def qbox_to_rbox(quad: Array) -> Array:
    """Quadrilateral (..., 8) → best-fit rbox (..., 5), le90.

    Uses the mmrotate qbox2rbox approach: the minimum-area rectangle of the
    4 points, computed by testing each edge direction as the orientation
    (exact for arbitrary quads since the min-area rect is edge-aligned with
    the hull)."""
    pts = quad.reshape(quad.shape[:-1] + (4, 2))

    def one(p):  # p (4, 2)
        e = jnp.roll(p, -1, axis=0) - p  # 4 edge vectors
        ang = jnp.arctan2(e[:, 1], e[:, 0])  # candidate orientations

        def rect_for(a):
            c, s = jnp.cos(-a), jnp.sin(-a)
            rot = jnp.stack([jnp.stack([c, -s]), jnp.stack([s, c])])
            q = p @ rot.T
            mn, mx = q.min(0), q.max(0)
            wh = mx - mn
            area = wh[0] * wh[1]
            center_local = (mn + mx) / 2
            inv = jnp.stack([jnp.stack([c, s]), jnp.stack([-s, c])])
            center = center_local @ inv.T
            return area, jnp.concatenate([center, wh, a[None]])

        areas, rects = jax.vmap(rect_for)(ang)
        best = jnp.argmin(areas)
        return rects[best]

    flat = pts.reshape(-1, 4, 2)
    out = jax.vmap(one)(flat).reshape(quad.shape[:-1] + (5,))
    return regularize_le90(out)


# ---------------------------------------------------------------------------
# rotated IoU (vectorized candidate-vertex intersection)
# ---------------------------------------------------------------------------


def _intersection_area(ca: Array, cb: Array) -> Array:
    """Intersection area of convex CCW quads, fully vectorized.

    ca, cb (..., 4, 2) broadcastable → (...).  Candidate-vertex method (the
    approach of mmcv's CUDA box_iou_rotated_utils.hpp): the intersection
    polygon's vertices are a subset of {corners of A inside B} ∪ {corners
    of B inside A} ∪ {the 16 edge-edge crossings}.  The ≤24 candidates are
    ordered by a static angle argsort around the valid-candidate centroid
    (invalid candidates sort to the ring's tail) and reduced with a
    masked-ring shoelace — no per-pair dynamic indexing, so the whole
    (N, M) pair grid runs as plain VPU array math.  The previous
    Sutherland–Hodgman formulation emitted vertices with `.at[cnt].set`
    inside per-pair fori_loops; double-vmapped those lower to serialized
    scatters (measured: 525 ms for ONE (128, 1000) grid → rotated test NMS
    8.9 s; this path: ~ms)."""
    lead = jnp.broadcast_shapes(ca.shape[:-2], cb.shape[:-2])
    ca = jnp.broadcast_to(ca, lead + (4, 2))
    cb = jnp.broadcast_to(cb, lead + (4, 2))
    a1, a2 = ca, jnp.roll(ca, -1, axis=-2)
    b1, b2 = cb, jnp.roll(cb, -1, axis=-2)

    def inside(p, v1, v2):
        """p (..., 4, 2) inside the CCW quad with edges v1→v2 (..., 4, 2)."""
        pc = p[..., :, None, :]
        e1 = v1[..., None, :, :]
        e2 = v2[..., None, :, :]
        s = ((e2[..., 0] - e1[..., 0]) * (pc[..., 1] - e1[..., 1])
             - (e2[..., 1] - e1[..., 1]) * (pc[..., 0] - e1[..., 0]))
        return jnp.all(s >= 0.0, axis=-1)                      # (..., 4)

    a_in_b = inside(ca, b1, b2)
    b_in_a = inside(cb, a1, a2)

    # 16 segment-segment crossings: A edge p + t·r vs B edge q + u·s
    p = a1[..., :, None, :]
    r = (a2 - a1)[..., :, None, :]
    q = b1[..., None, :, :]
    s = (b2 - b1)[..., None, :, :]
    rxs = r[..., 0] * s[..., 1] - r[..., 1] * s[..., 0]
    qp = q - p
    safe = jnp.where(jnp.abs(rxs) < 1e-12, 1e-12, rxs)
    t = (qp[..., 0] * s[..., 1] - qp[..., 1] * s[..., 0]) / safe
    u = (qp[..., 0] * r[..., 1] - qp[..., 1] * r[..., 0]) / safe
    x_ok = ((jnp.abs(rxs) > 1e-12) & (t >= 0.0) & (t <= 1.0)
            & (u >= 0.0) & (u <= 1.0))                         # (..., 4, 4)
    xpts = p + t[..., None] * r                                # (..., 4, 4, 2)

    pts = jnp.concatenate(
        [ca, cb, xpts.reshape(lead + (16, 2))], axis=-2)       # (..., 24, 2)
    val = jnp.concatenate(
        [a_in_b, b_in_a, x_ok.reshape(lead + (16,))], axis=-1)  # (..., 24)

    cnt = jnp.sum(val, axis=-1)                                # (...,)
    ctr = (jnp.sum(jnp.where(val[..., None], pts, 0.0), axis=-2)
           / jnp.maximum(cnt, 1)[..., None])
    ang = jnp.where(val, jnp.arctan2(pts[..., 1] - ctr[..., None, 1],
                                     pts[..., 0] - ctr[..., None, 0]),
                    jnp.inf)                                   # invalid last

    # order by angle WITHOUT a sort: XLA sorts/gathers over a tiny minor
    # axis with a huge batch count are a TPU slow path (argsort+gathers
    # measured 4× the rest of this function combined).  rank = count of
    # strictly-smaller entries (index tie-break) is an exact permutation;
    # the reorder and the ring-closure "next" lookup become one-hot masked
    # sums over the (24, 24) compare grid — pure VPU.
    k = jnp.arange(24)
    rank = jnp.sum((ang[..., None, :] < ang[..., :, None])
                   | ((ang[..., None, :] == ang[..., :, None])
                      & (k[None, :] < k[:, None])), axis=-1)   # (..., 24)
    oh = rank[..., None, :] == k[:, None]                      # (..., r, i)
    x = jnp.sum(jnp.where(oh, pts[..., None, :, 0], 0.0), axis=-1)
    y = jnp.sum(jnp.where(oh, pts[..., None, :, 1], 0.0), axis=-1)
    cntn = cnt[..., None, None]                                # (..., 1, 1)
    nxt_oh = jnp.where(k[:, None] + 1 < cntn, k[None, :] == k[:, None] + 1,
                       (k[None, :] == 0) & (k[:, None] < cntn))
    xn = jnp.sum(jnp.where(nxt_oh, x[..., None, :], 0.0), axis=-1)
    yn = jnp.sum(jnp.where(nxt_oh, y[..., None, :], 0.0), axis=-1)
    area = 0.5 * jnp.abs(jnp.sum(x * yn - xn * y, axis=-1))
    return jnp.where(cnt >= 3, area, 0.0)


def _ccw(c: Array) -> Array:
    """Force counter-clockwise winding (shoelace-signed)."""
    x, y = c[..., 0], c[..., 1]
    area2 = jnp.sum(x * jnp.roll(y, -1, axis=-1)
                    - jnp.roll(x, -1, axis=-1) * y, axis=-1)
    return jnp.where(area2[..., None, None] < 0, c[..., ::-1, :], c)


def rbox_overlaps(a: Array, b: Array, eps: float = 1e-6,
                  mode: str = "iou") -> Array:
    """Pairwise rotated IoU: a (N, 5) vs b (M, 5) → (N, M)."""
    ca = _ccw(rbox_to_corners(a))  # (N, 4, 2)
    cb = _ccw(rbox_to_corners(b))  # (M, 4, 2)
    inter = _intersection_area(ca[:, None], cb[None, :])
    area_a = (a[:, 2] * a[:, 3])[:, None]
    area_b = (b[:, 2] * b[:, 3])[None, :]
    if mode == "iof":
        denom = area_a
    else:
        denom = area_a + area_b - inter
    return inter / jnp.maximum(denom, eps)


def quad_overlaps(a: Array, b: Array, eps: float = 1e-6) -> Array:
    """Pairwise convex-quadrilateral IoU: a (N, 8) vs b (M, 8) → (N, M)
    (mmcv `box_iou_quadri` semantics — the qbox path of the reference
    rotated-det merge, rotated_detection/metric.py:150,533)."""
    ca = a.reshape(-1, 4, 2)
    cb = b.reshape(-1, 4, 2)

    def shoelace(c):
        x, y = c[..., 0], c[..., 1]
        return 0.5 * jnp.abs(jnp.sum(
            x * jnp.roll(y, -1, axis=-1) - jnp.roll(x, -1, axis=-1) * y,
            axis=-1))

    area_a = shoelace(ca)[:, None]
    area_b = shoelace(cb)[None, :]
    inter = _intersection_area(_ccw(ca)[:, None], _ccw(cb)[None, :])
    return inter / jnp.maximum(area_a + area_b - inter, eps)


def rbox2hbox_overlaps(rboxes: Array, hboxes: Array) -> Array:
    """mmrotate RBbox2HBboxOverlaps2D: IoU of rbox *bounding boxes* vs
    hboxes (used by the oriented-RPN assigner, max_iou_assigner.py:21-80)."""
    return bbox_overlaps(rbox_to_hbox(rboxes), hboxes)


# ---------------------------------------------------------------------------
# DeltaXYWHT rbox coder (le90, proj_xy, edge_swap)
# ---------------------------------------------------------------------------

def delta_encode_rbox(proposals: Array, gts: Array,
                      means: Sequence[float] = (0., 0., 0., 0., 0.),
                      stds: Sequence[float] = (0.1, 0.1, 0.2, 0.2, 0.1)) -> Array:
    """proposals/gts (..., 5) → deltas (..., 5)."""
    px, py, pw, ph, pt = jnp.moveaxis(proposals, -1, 0)
    gx, gy, gw, gh, gt_ = jnp.moveaxis(gts, -1, 0)
    pw = jnp.maximum(pw, 1e-6)
    ph = jnp.maximum(ph, 1e-6)

    cos, sin = jnp.cos(pt), jnp.sin(pt)
    # proj_xy: project center offset onto the proposal's axes
    dx = (cos * (gx - px) + sin * (gy - py)) / pw
    dy = (-sin * (gx - px) + cos * (gy - py)) / ph

    # edge_swap: pick the gt parameterization (w,h,theta) vs (h,w,theta+90°)
    # with the smaller normalized angle delta
    dt1 = norm_angle_le90(gt_ - pt)
    dt2 = norm_angle_le90(gt_ - pt + PI / 2)
    swap = jnp.abs(dt2) < jnp.abs(dt1)
    dw = jnp.log(jnp.maximum(jnp.where(swap, gh, gw), 1e-6) / pw)
    dh = jnp.log(jnp.maximum(jnp.where(swap, gw, gh), 1e-6) / ph)
    dt = jnp.where(swap, dt2, dt1) / PI  # angle normalized by pi (le90)

    d = jnp.stack([dx, dy, dw, dh, dt], axis=-1)
    means = jnp.asarray(means, d.dtype)
    stds = jnp.asarray(stds, d.dtype)
    return (d - means) / stds


def delta_decode_rbox(rois: Array, deltas: Array,
                      means: Sequence[float] = (0., 0., 0., 0., 0.),
                      stds: Sequence[float] = (0.1, 0.1, 0.2, 0.2, 0.1),
                      wh_ratio_clip: float = 16 / 1000) -> Array:
    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    d = deltas * stds + means
    dx, dy, dw, dh, dt = jnp.moveaxis(d, -1, 0)
    max_ratio = abs(math.log(wh_ratio_clip))
    dw = jnp.clip(dw, -max_ratio, max_ratio)
    dh = jnp.clip(dh, -max_ratio, max_ratio)

    px, py, pw, ph, pt = jnp.moveaxis(rois, -1, 0)
    cos, sin = jnp.cos(pt), jnp.sin(pt)
    gx = px + pw * dx * cos - ph * dy * sin
    gy = py + pw * dx * sin + ph * dy * cos
    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)
    gt_ = norm_angle_le90(dt * PI + pt)
    return regularize_le90(jnp.stack([gx, gy, gw, gh, gt_], axis=-1))


# ---------------------------------------------------------------------------
# MidpointOffset coder (Oriented RPN: hbox anchor → 6-param oriented proposal)
# ---------------------------------------------------------------------------

def midpoint_encode(anchors: Array, gts_rbox: Array,
                    means: Sequence[float] = (0.,) * 6,
                    stds: Sequence[float] = (1., 1., 1., 1., 0.5, 0.5)) -> Array:
    """anchors (..., 4) hbox, gts (..., 5) rbox → (..., 6) deltas.

    Per Oriented R-CNN: (dx, dy, dw, dh) encode the gt's axis-aligned bbox
    against the anchor; (da, db) are the offsets of the top-edge and
    right-edge midpoints of the rotated box along the hbb edges."""
    corners = rbox_to_corners(gts_rbox)  # (..., 4, 2)
    xmin = corners[..., 0].min(-1)
    xmax = corners[..., 0].max(-1)
    ymin = corners[..., 1].min(-1)
    ymax = corners[..., 1].max(-1)
    gx = (xmin + xmax) * 0.5
    gy = (ymin + ymax) * 0.5
    gw = xmax - xmin
    gh = ymax - ymin

    # vertex with min y (top) and vertex with max x (right)
    top_i = corners[..., 1].argmin(-1)
    right_i = corners[..., 0].argmax(-1)
    x_top = jnp.take_along_axis(corners[..., 0], top_i[..., None], -1)[..., 0]
    y_right = jnp.take_along_axis(corners[..., 1], right_i[..., None], -1)[..., 0]
    da = (x_top - gx) / jnp.maximum(gw, 1e-6)
    db = (y_right - gy) / jnp.maximum(gh, 1e-6)

    px = (anchors[..., 0] + anchors[..., 2]) * 0.5
    py = (anchors[..., 1] + anchors[..., 3]) * 0.5
    pw = jnp.maximum(anchors[..., 2] - anchors[..., 0], 1e-6)
    ph = jnp.maximum(anchors[..., 3] - anchors[..., 1], 1e-6)

    d = jnp.stack([(gx - px) / pw, (gy - py) / ph,
                   jnp.log(jnp.maximum(gw, 1e-6) / pw),
                   jnp.log(jnp.maximum(gh, 1e-6) / ph), da, db], axis=-1)
    means = jnp.asarray(means, d.dtype)
    stds = jnp.asarray(stds, d.dtype)
    return (d - means) / stds


def midpoint_decode(anchors: Array, deltas: Array,
                    means: Sequence[float] = (0.,) * 6,
                    stds: Sequence[float] = (1., 1., 1., 1., 0.5, 0.5),
                    wh_ratio_clip: float = 16 / 1000) -> Array:
    """(..., 4) hbox anchors + (..., 6) deltas → oriented proposals (..., 5).

    Reconstructs the midpoint parallelogram and converts it to the rbox with
    the same diagonals (Oriented R-CNN proposal rectification)."""
    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    d = deltas * stds + means
    dx, dy, dw, dh, da, db = jnp.moveaxis(d, -1, 0)
    max_ratio = abs(math.log(wh_ratio_clip))
    dw = jnp.clip(dw, -max_ratio, max_ratio)
    dh = jnp.clip(dh, -max_ratio, max_ratio)

    px = (anchors[..., 0] + anchors[..., 2]) * 0.5
    py = (anchors[..., 1] + anchors[..., 3]) * 0.5
    pw = jnp.maximum(anchors[..., 2] - anchors[..., 0], 1e-6)
    ph = jnp.maximum(anchors[..., 3] - anchors[..., 1], 1e-6)

    gx = px + pw * dx
    gy = py + ph * dy
    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)
    da = jnp.clip(da, -0.5, 0.5)
    db = jnp.clip(db, -0.5, 0.5)

    # the rotated rectangle's vertices each touch one hbb edge: top vertex on
    # the top edge at x = gx + da*gw, right vertex on the right edge at
    # y = gy + db*gh; the opposite vertices follow by central symmetry
    #
    # Rectification = mmrotate MidpointOffsetCoder.delta2bbox: scale each
    # vertex radially to the LONGEST diagonal (u' ⟂-symmetric pairs at equal
    # radius form an exact rectangle: (v'-u')·(v'+u') = |v'|²-|u'|² = 0).
    # NOT a min-area rectangle — min-area collapses to a zero-height box
    # whenever the parallelogram degenerates toward a line (random-init RPN
    # deltas hit this), which exploded the downstream encode targets.
    u = jnp.stack([da * gw, -gh / 2], -1)        # top - center
    v = jnp.stack([gw / 2, db * gh], -1)         # right - center
    ru = jnp.linalg.norm(u, axis=-1)
    rv = jnp.linalg.norm(v, axis=-1)
    r = jnp.maximum(ru, rv)
    u = u * (r / jnp.maximum(ru, 1e-6))[..., None]
    v = v * (r / jnp.maximum(rv, 1e-6))[..., None]
    e1 = v - u
    w = jnp.linalg.norm(e1, axis=-1)
    h = jnp.linalg.norm(v + u, axis=-1)
    theta = jnp.arctan2(e1[..., 1], e1[..., 0])
    rect = jnp.stack([gx, gy, w, h, theta], axis=-1)
    return regularize_le90(rect)
