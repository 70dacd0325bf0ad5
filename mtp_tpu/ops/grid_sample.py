"""Bilinear grid sampling (NHWC), the TPU equivalent of torch
`F.grid_sample(..., mode='bilinear')`.

This is the primitive under RVSA attention's rotated-window K/V sampling
(reference backbone/vit_win_rvsa_v3_wsz7.py:397-404), the pure-PyTorch DCNv3
spec (`backbone/ops_dcnv3/functions/dcnv3_func.py:174`), and rotated RoIAlign.
Implemented as a vectorized gather — XLA lowers this to an efficient TPU
gather; the contraction-heavy work around it stays on the MXU.

Semantics match torch exactly (verified in tests/test_grid_sample.py):
- grid last dim is (x, y) in [-1, 1]
- align_corners=True:  ix = (x+1)/2 * (W-1)
- align_corners=False: ix = ((x+1)*W - 1) / 2
- padding_mode 'zeros': out-of-bounds corner taps contribute 0
- padding_mode 'border': coordinates clamped to the edge
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample(img: jax.Array, grid: jax.Array, *, align_corners: bool = True,
                padding_mode: str = "zeros") -> jax.Array:
    """Sample `img` (N, H, W, C) at `grid` (N, Hg, Wg, 2) → (N, Hg, Wg, C)."""
    N, H, W, C = img.shape
    gshape = grid.shape
    assert gshape[0] == N and gshape[-1] == 2, (img.shape, grid.shape)

    x = grid[..., 0].astype(jnp.float32)
    y = grid[..., 1].astype(jnp.float32)
    if align_corners:
        ix = (x + 1.0) * 0.5 * (W - 1)
        iy = (y + 1.0) * 0.5 * (H - 1)
    else:
        ix = ((x + 1.0) * W - 1.0) * 0.5
        iy = ((y + 1.0) * H - 1.0) * 0.5

    if padding_mode == "border":
        ix = jnp.clip(ix, 0.0, W - 1)
        iy = jnp.clip(iy, 0.0, H - 1)
    elif padding_mode != "zeros":
        raise ValueError(padding_mode)

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    # corner weights (bilinear)
    wx1 = ix - x0
    wx0 = 1.0 - wx1
    wy1 = iy - y0
    wy0 = 1.0 - wy1

    def tap(xc, yc, wx, wy):
        if padding_mode == "zeros":
            valid = (xc >= 0) & (xc <= W - 1) & (yc >= 0) & (yc <= H - 1)
            w = jnp.where(valid, wx * wy, 0.0)
        else:
            w = wx * wy
        xi = jnp.clip(xc, 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(yc, 0, H - 1).astype(jnp.int32)
        lin = yi * W + xi  # (N, ...)
        flat = img.reshape(N, H * W, C)
        batch = jnp.arange(N).reshape((N,) + (1,) * (lin.ndim - 1))
        vals = flat[batch, lin]  # (N, ..., C)
        return vals * w[..., None].astype(img.dtype)

    out = (tap(x0, y0, wx0, wy0) + tap(x1, y0, wx1, wy0)
           + tap(x0, y1, wx0, wy1) + tap(x1, y1, wx1, wy1))
    return out.astype(img.dtype)
