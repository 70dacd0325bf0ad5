"""Instance-mask pasting: RoI mask grids → full-image binary masks.

Capability parity with the reference `_do_paste_mask`
(instance_segmentation/mask_head.py:401): each (m, m) mask probability grid
is bilinearly resampled onto its box extent and thresholded.  Host-side
numpy (eval-time only, after D2H of the padded detections).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def crop_masks_to_boxes(masks: np.ndarray, boxes: np.ndarray,
                        size: int) -> np.ndarray:
    """Inverse of paste_masks: resample each full-res (H, W) instance mask
    over its box extent onto a (size, size) grid (bilinear at output-pixel
    centers, zeros outside the image).

    An instance mask is zero outside its own bbox, so the box-aligned crop
    is a lossless re-parameterization up to grid resolution — the source
    for device-side mask targets (reference mask_target crops the full-res
    gt mask per proposal; a stride-4 decimated map aliases thin objects)."""
    N = len(masks)
    out = np.zeros((N, size, size), np.float32)
    for i in range(N):
        M = np.asarray(masks[i], np.float32)
        H, W = M.shape
        x1, y1, x2, y2 = [float(v) for v in boxes[i][:4]]
        xs = x1 + (np.arange(size) + 0.5) / size * (x2 - x1) - 0.5
        ys = y1 + (np.arange(size) + 0.5) / size * (y2 - y1) - 0.5
        x0 = np.floor(xs).astype(np.int64)
        y0 = np.floor(ys).astype(np.int64)
        fx = xs - x0
        fy = ys - y0

        def take(yy, xx):
            v = ((yy >= 0) & (yy < H))[:, None] & ((xx >= 0) & (xx < W))[None, :]
            return M[yy.clip(0, H - 1)[:, None],
                     xx.clip(0, W - 1)[None, :]] * v

        top = take(y0, x0) * (1 - fx)[None, :] + take(y0, x0 + 1) * fx[None, :]
        bot = take(y0 + 1, x0) * (1 - fx)[None, :] + take(y0 + 1, x0 + 1) * fx[None, :]
        out[i] = top * (1 - fy)[:, None] + bot * fy[:, None]
    return out


def paste_masks(mask_probs: np.ndarray, boxes: np.ndarray, height: int,
                width: int, thr: float = 0.5) -> np.ndarray:
    """mask_probs (N, m, m) in [0,1]; boxes (N, 4) x1y1x2y2 →
    (N, height, width) uint8."""
    N, m, _ = mask_probs.shape
    out = np.zeros((N, height, width), np.uint8)
    for i in range(N):
        x1, y1, x2, y2 = boxes[i]
        x1i, y1i = int(np.floor(x1)), int(np.floor(y1))
        x2i, y2i = int(np.ceil(x2)), int(np.ceil(y2))
        x1i, y1i = max(x1i, 0), max(y1i, 0)
        x2i, y2i = min(x2i, width), min(y2i, height)
        bw, bh = x2i - x1i, y2i - y1i
        if bw <= 0 or bh <= 0:
            continue
        # sample the mask grid at the centers of the output pixels
        # (grid aligned to the box extent, align_corners=False + zero padding
        # — reference _do_paste_mask / detectron2 grid_sample semantics: the
        # outermost ring fades toward 0 instead of clamping to the border)
        ys = (np.arange(bh) + y1i + 0.5 - y1) / max(y2 - y1, 1e-6) * m - 0.5
        xs = (np.arange(bw) + x1i + 0.5 - x1) / max(x2 - x1, 1e-6) * m - 0.5
        y0 = np.floor(ys).astype(np.int64)
        x0 = np.floor(xs).astype(np.int64)
        y1f = ys - y0
        x1f = xs - x0
        g = mask_probs[i]

        def take(yy, xx):
            v = (((yy >= 0) & (yy < m))[:, None]
                 & ((xx >= 0) & (xx < m))[None, :])
            return g[yy.clip(0, m - 1)[:, None], xx.clip(0, m - 1)[None, :]] * v

        top = take(y0, x0) * (1 - x1f) + take(y0, x0 + 1) * x1f
        bot = take(y0 + 1, x0) * (1 - x1f) + take(y0 + 1, x0 + 1) * x1f
        patch = top * (1 - y1f)[:, None] + bot * y1f[:, None]
        out[i, y1i:y2i, x1i:x2i] = (patch >= thr).astype(np.uint8)
    return out


def paste_masks_device(mask_probs, boxes, height: int, width: int,
                       thr: float = 0.5):
    """Device-side `paste_masks` (same `_do_paste_mask` grid-sample
    semantics, instance_segmentation/mask_head.py:401): one batched
    bilinear resample on the chip instead of the per-instance numpy loop.

    NOT used by the eval loops on this relay-attached chip: measured
    SLOWER end-to-end than the numpy loop (tiny-source gathers at 40M
    points + a full-resolution D2H per batch outweigh the host loop,
    which only touches each box's extent — PERF.md).  Kept for
    direct-attached deployments where the transfer economics differ.

    mask_probs (N, m, m) jnp/np in [0,1]; boxes (N, 4) → uint8 jax array
    (N, height, width); fetch with np.asarray at the call site."""
    return _paste_jit(mask_probs, boxes, height, width, thr)


def _paste_impl(mask_probs, boxes, height: int, width: int, thr: float):
    import jax.numpy as jnp

    from mtp_tpu.ops.grid_sample import grid_sample

    mask_probs = jnp.asarray(mask_probs, jnp.float32)
    boxes = jnp.asarray(boxes, jnp.float32)
    N = mask_probs.shape[0]
    x1, y1, x2, y2 = (boxes[:, i] for i in range(4))
    # output-pixel centers mapped into [0, 1] box coords, then to the
    # [-1, 1] align_corners=False grid; outside-box pixels fall outside
    # [-1, 1] and zero-pad exactly like the numpy path
    gy = ((jnp.arange(height, dtype=jnp.float32)[None, :] + 0.5
           - y1[:, None]) / jnp.maximum(y2 - y1, 1e-6)[:, None]) * 2.0 - 1.0
    gx = ((jnp.arange(width, dtype=jnp.float32)[None, :] + 0.5
           - x1[:, None]) / jnp.maximum(x2 - x1, 1e-6)[:, None]) * 2.0 - 1.0
    grid = jnp.stack(
        [jnp.broadcast_to(gx[:, None, :], (N, height, width)),
         jnp.broadcast_to(gy[:, :, None], (N, height, width))], axis=-1)
    out = grid_sample(mask_probs[..., None], grid, align_corners=False,
                      padding_mode="zeros")[..., 0]
    return (out >= thr).astype(jnp.uint8)


def _lazy_paste_jit():
    import functools

    import jax
    return functools.partial(jax.jit, static_argnums=(2, 3, 4))(_paste_impl)


class _PasteJit:
    _fn = None

    def __call__(self, *a):
        if _PasteJit._fn is None:
            _PasteJit._fn = _lazy_paste_jit()
        return _PasteJit._fn(*a)


_paste_jit = _PasteJit()
