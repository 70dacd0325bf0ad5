"""RoIAlign (horizontal + rotated) as bilinear grid sampling — TPU-native.

Replaces mmcv's CUDA `RoIAlign` / `RoIAlignRotated` (used by the reference
RoI heads).  Each RoI bin is sampled at a fixed `sampling_ratio`² grid of
points (bilinear, like torchvision aligned=True), then averaged.

Deviation from mmcv: sampling_ratio=0 ("adaptive" — ceil(roi/out) samples per
bin) is data-dependent and cannot be static; we default to 2 samples/bin,
the value mmcv effectively uses for typical RoI sizes and the standard choice
in TPU detection stacks.  Numerics are otherwise identical (aligned=True
half-pixel offset).

The multi-level extractor computes all levels for all RoIs and selects by the
mmdet scale rule — 4x the RoIAlign FLOPs but fully static, and RoIAlign is
a negligible fraction of the backbone cost.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mtp_tpu.ops.grid_sample import grid_sample

Array = jax.Array

# Atlas-packed multilevel RoI extraction (1x gather/scatter instead of the
# 4x all-level-and-select form); MTP_ROI_ATLAS=0 restores the old path.
import os as _os

ROI_ATLAS = _os.environ.get("MTP_ROI_ATLAS", "1") == "1"


def _bin_grid(out_size: int, sampling: int) -> jnp.ndarray:
    """Normalized sample offsets within a RoI: (out*sampling,) in [0, 1]."""
    n = out_size * sampling
    # center of each of the n sample cells
    return (jnp.arange(n, dtype=jnp.float32) + 0.5) / n


def roi_align(feat: Array, rois: Array, batch_idx: Array, out_size: int,
              spatial_scale: float, sampling: int = 2) -> Array:
    """feat (B, H, W, C); rois (R, 4) x1y1x2y2 in image coords;
    batch_idx (R,) int32 → (R, out, out, C)."""
    B, H, W, C = feat.shape
    R = rois.shape[0]
    n = out_size * sampling

    x1 = rois[:, 0] * spatial_scale - 0.5
    y1 = rois[:, 1] * spatial_scale - 0.5
    x2 = rois[:, 2] * spatial_scale - 0.5
    y2 = rois[:, 3] * spatial_scale - 0.5
    w = x2 - x1
    h = y2 - y1

    g = _bin_grid(out_size, sampling)
    sx = x1[:, None] + w[:, None] * g[None, :]   # (R, n)
    sy = y1[:, None] + h[:, None] * g[None, :]

    # to grid_sample coords [-1, 1], align_corners=True over (W-1)
    gx = sx / jnp.maximum(W - 1, 1) * 2.0 - 1.0
    gy = sy / jnp.maximum(H - 1, 1) * 2.0 - 1.0
    grid = jnp.stack([jnp.broadcast_to(gx[:, None, :], (R, n, n)),
                      jnp.broadcast_to(gy[:, :, None], (R, n, n))], axis=-1)

    per_roi = feat[batch_idx]  # (R, H, W, C) gather
    sampled = grid_sample(per_roi, grid, align_corners=True,
                          padding_mode="border")
    # average pool sampling² cells per bin
    sampled = sampled.reshape(R, out_size, sampling, out_size, sampling, C)
    return sampled.mean(axis=(2, 4))


def roi_align_rotated(feat: Array, rois: Array, batch_idx: Array,
                      out_size: int, spatial_scale: float,
                      sampling: int = 2, clockwise: bool = False) -> Array:
    """Rotated RoIAlign: rois (R, 5) = (cx, cy, w, h, angle[rad]).

    mmcv RoIAlignRotated semantics (angle rotates the box around its center;
    clockwise=False means positive angle = counter-clockwise in image coords).
    """
    B, H, W, C = feat.shape
    R = rois.shape[0]
    n = out_size * sampling

    cx = rois[:, 0] * spatial_scale - 0.5
    cy = rois[:, 1] * spatial_scale - 0.5
    rw = rois[:, 2] * spatial_scale
    rh = rois[:, 3] * spatial_scale
    ang = rois[:, 4]
    if clockwise:
        ang = -ang

    g = _bin_grid(out_size, sampling) - 0.5      # centered offsets [-0.5, 0.5]
    ox = rw[:, None] * g[None, :]                 # (R, n) local x
    oy = rh[:, None] * g[None, :]                 # (R, n) local y
    cos = jnp.cos(ang)[:, None, None]
    sin = jnp.sin(ang)[:, None, None]
    lx = ox[:, None, :]                           # (R, 1, n) broadcast rows=y
    ly = oy[:, :, None]                           # (R, n, 1)
    sx = cx[:, None, None] + lx * cos - ly * sin
    sy = cy[:, None, None] + lx * sin + ly * cos

    gx = sx / jnp.maximum(W - 1, 1) * 2.0 - 1.0
    gy = sy / jnp.maximum(H - 1, 1) * 2.0 - 1.0
    grid = jnp.stack([gx, gy], axis=-1)           # (R, n, n, 2)

    per_roi = feat[batch_idx]
    sampled = grid_sample(per_roi, grid, align_corners=True,
                          padding_mode="border")
    sampled = sampled.reshape(R, out_size, sampling, out_size, sampling, C)
    return sampled.mean(axis=(2, 4))


def map_roi_levels(rois: Array, num_levels: int, finest_scale: int = 56) -> Array:
    """mmdet SingleRoIExtractor level mapping: floor(log2(sqrt(area)/56))."""
    scale = jnp.sqrt(jnp.maximum(
        (rois[:, 2] - rois[:, 0]) * (rois[:, 3] - rois[:, 1]), 1e-6))
    lvl = jnp.floor(jnp.log2(scale / finest_scale + 1e-6))
    return jnp.clip(lvl, 0, num_levels - 1).astype(jnp.int32)


def map_rroi_levels(rrois: Array, num_levels: int,
                    finest_scale: int = 56) -> Array:
    """mmrotate RotatedSingleRoIExtractor mapping: scale = sqrt(w*h) of the
    rotated box itself (not its bounding box)."""
    scale = jnp.sqrt(jnp.maximum(rrois[:, 2] * rrois[:, 3], 1e-6))
    lvl = jnp.floor(jnp.log2(scale / finest_scale + 1e-6))
    return jnp.clip(lvl, 0, num_levels - 1).astype(jnp.int32)


def multilevel_roi_align(feats: Sequence[Array], rois: Array, batch_idx: Array,
                         out_size: int, strides: Sequence[int],
                         sampling: int = 2) -> Array:
    """Compute RoIAlign on every level, select per-RoI level (static shapes)."""
    lvls = map_roi_levels(rois, len(feats))
    outs = jnp.stack([
        roi_align(f, rois, batch_idx, out_size, 1.0 / s, sampling)
        for f, s in zip(feats, strides)], axis=0)  # (L, R, out, out, C)
    return jnp.take_along_axis(
        outs, lvls[None, :, None, None, None], axis=0)[0]


def multilevel_roi_align_fused(feats: Sequence[Array], rois: Array,
                               batch_idx: Array, out_size: int,
                               strides: Sequence[int], sampling: int = 2,
                               rotated: bool = False,
                               clockwise: bool = False) -> Array:
    """Multilevel RoIAlign with ONE gather over a packed level atlas.

    The all-level-and-select form (`multilevel_roi_align`) computes 4x the
    gathers and — in training — 4x the backward scatters.  Here the FPN
    levels are flattened and concatenated into a (B, ΣHW, C) atlas; each
    RoI's bilinear taps become flat indices offset by its assigned level,
    so the whole extraction is a single 4-tap gather (and its transpose a
    single scatter).  Numerics match roi_align/roi_align_rotated with
    border padding and align_corners=True (identical sample grid; level
    selection by the same mmdet scale rule).
    """
    L = len(feats)
    B, _, _, C = feats[0].shape
    R = rois.shape[0]
    n = out_size * sampling

    hs = np.array([f.shape[1] for f in feats])
    ws = np.array([f.shape[2] for f in feats])
    offs = np.concatenate([[0], np.cumsum(hs * ws)])
    S = int(offs[-1])
    atlas = jnp.concatenate(
        [f.reshape(B, -1, C) for f in feats], axis=1).reshape(B * S, C)

    if rotated:
        lvls = map_rroi_levels(rois, L)
    else:
        lvls = map_roi_levels(rois, L)
    inv_stride = jnp.asarray(1.0 / np.asarray(strides, np.float32))[lvls]
    Hl = jnp.asarray(hs, jnp.float32)[lvls]          # (R,)
    Wl = jnp.asarray(ws, jnp.float32)[lvls]
    off = jnp.asarray(offs[:-1], jnp.int32)[lvls]
    Wl_i = jnp.asarray(ws, jnp.int32)[lvls]

    g = _bin_grid(out_size, sampling)
    if rotated:
        cx = rois[:, 0] * inv_stride - 0.5
        cy = rois[:, 1] * inv_stride - 0.5
        rw = rois[:, 2] * inv_stride
        rh = rois[:, 3] * inv_stride
        ang = -rois[:, 4] if clockwise else rois[:, 4]
        gc = g - 0.5
        ox = rw[:, None] * gc[None, :]               # (R, n)
        oy = rh[:, None] * gc[None, :]
        cos = jnp.cos(ang)[:, None, None]
        sin = jnp.sin(ang)[:, None, None]
        lx = ox[:, None, :]                          # (R, 1, n)
        ly = oy[:, :, None]                          # (R, n, 1)
        sx = cx[:, None, None] + lx * cos - ly * sin
        sy = cy[:, None, None] + lx * sin + ly * cos
    else:
        x1 = rois[:, 0] * inv_stride - 0.5
        y1 = rois[:, 1] * inv_stride - 0.5
        w = (rois[:, 2] - rois[:, 0]) * inv_stride
        h = (rois[:, 3] - rois[:, 1]) * inv_stride
        sx = jnp.broadcast_to(
            (x1[:, None] + w[:, None] * g[None, :])[:, None, :], (R, n, n))
        sy = jnp.broadcast_to(
            (y1[:, None] + h[:, None] * g[None, :])[:, :, None], (R, n, n))

    # border padding: clamp into the roi's own level extent
    ix = jnp.clip(sx, 0.0, (Wl - 1.0)[:, None, None])
    iy = jnp.clip(sy, 0.0, (Hl - 1.0)[:, None, None])
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx1 = ix - x0
    wy1 = iy - y0

    base = (batch_idx.astype(jnp.int32) * S + off)[:, None, None]
    xmax = (Wl_i - 1)[:, None, None]
    ymax = jnp.asarray(hs, jnp.int32)[lvls][:, None, None] - 1

    out = None
    for dx, dy, wx, wy in ((0, 0, 1 - wx1, 1 - wy1), (1, 0, wx1, 1 - wy1),
                           (0, 1, 1 - wx1, wy1), (1, 1, wx1, wy1)):
        xi = jnp.minimum(x0.astype(jnp.int32) + dx, xmax)
        yi = jnp.minimum(y0.astype(jnp.int32) + dy, ymax)
        lin = base + yi * Wl_i[:, None, None] + xi   # (R, n, n)
        vals = jnp.take(atlas, lin, axis=0)          # (R, n, n, C)
        tap = vals * (wx * wy)[..., None].astype(atlas.dtype)
        out = tap if out is None else out + tap

    out = out.reshape(R, out_size, sampling, out_size, sampling, C)
    return out.mean(axis=(2, 4))
