"""Instance-mask pasting: RoI mask grids → full-image binary masks.

Capability parity with the reference `_do_paste_mask`
(instance_segmentation/mask_head.py:401): each (m, m) mask probability grid
is bilinearly resampled onto its box extent and thresholded.  Host-side
numpy (eval-time only, after D2H of the padded detections).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


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
        # (grid aligned to the box extent, align_corners=False semantics)
        ys = (np.arange(bh) + y1i + 0.5 - y1) / max(y2 - y1, 1e-6) * m - 0.5
        xs = (np.arange(bw) + x1i + 0.5 - x1) / max(x2 - x1, 1e-6) * m - 0.5
        y0 = np.clip(np.floor(ys), 0, m - 1).astype(np.int64)
        x0 = np.clip(np.floor(xs), 0, m - 1).astype(np.int64)
        y1f = np.clip(ys - y0, 0.0, 1.0)
        x1f = np.clip(xs - x0, 0.0, 1.0)
        y1c = np.clip(y0 + 1, 0, m - 1)
        x1c = np.clip(x0 + 1, 0, m - 1)
        g = mask_probs[i]
        top = g[y0][:, x0] * (1 - x1f) + g[y0][:, x1c] * x1f
        bot = g[y1c][:, x0] * (1 - x1f) + g[y1c][:, x1c] * x1f
        patch = top * (1 - y1f)[:, None] + bot * y1f[:, None]
        out[i, y1i:y2i, x1i:x2i] = (patch >= thr).astype(np.uint8)
    return out
