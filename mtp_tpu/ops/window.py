"""Window partition / reverse for (B, H, W, C) feature maps (NHWC, TPU-native
layout).  Equivalent capability to reference
backbone/vit_win_rvsa_v3_wsz7.py:113-140 but kept as pure reshapes so XLA can
fuse them away."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def window_partition(x: jax.Array, ws: int) -> jax.Array:
    """(B, H, W, C) → (B * H/ws * W/ws, ws*ws, C)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B * (H // ws) * (W // ws), ws * ws, C)


def window_reverse(wins: jax.Array, ws: int, H: int, W: int) -> jax.Array:
    """(B*nh*nw, ws*ws, C) → (B, H, W, C)."""
    nh, nw = H // ws, W // ws
    B = wins.shape[0] // (nh * nw)
    x = wins.reshape(B, nh, nw, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, -1)


def pad_hw(x: jax.Array, ws: int) -> tuple[jax.Array, tuple[int, int, int, int]]:
    """Symmetrically zero-pad H and W (dims 1, 2) up to multiples of ws.

    Returns padded tensor and (top, bottom, left, right) — the reference pads
    top = pad//2 (vit_win_rvsa_v3_wsz7.py:298-303)."""
    B, H, W, C = x.shape
    ph = (ws - H % ws) % ws
    pw = (ws - W % ws) % ws
    pt, pb = ph // 2, ph - ph // 2
    pl, pr = pw // 2, pw - pw // 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
    return x, (pt, pb, pl, pr)
