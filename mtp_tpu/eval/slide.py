"""Sliding-window inference, compiled as one jitted scan over crops.

Capability parity with the reference `slide_inference`
(Multi-Task_Pretrain/semantic_segmentation/encoder_decoder.py:253-310): crops
of `crop` pixels on a `stride` grid, edge crops shifted inward so every crop
is full-size, overlapping logits averaged by a count map.

TPU-native design: the crop origins are static (computed at trace time), so
the whole loop is a `lax.scan` with `dynamic_slice`/`dynamic_update_slice` —
one XLA program, no host round-trips per crop, double-buffered by XLA.  The
scan carries fp32 accumulators in HBM; each step runs the full backbone+head
on one (B, crop, crop, 3) tile.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mtp_tpu.utils.config import SlideConfig


def slide_origins(H: int, W: int, crop: int, stride: int) -> np.ndarray:
    """Static (n, 2) array of (y, x) crop origins (reference grid rule)."""
    hg = max(int(np.ceil((H - crop) / stride)) + 1, 1)
    wg = max(int(np.ceil((W - crop) / stride)) + 1, 1)
    out = []
    for i in range(hg):
        for j in range(wg):
            y1 = min(i * stride, max(H - crop, 0))
            x1 = min(j * stride, max(W - crop, 0))
            out.append((y1, x1))
    return np.asarray(out, np.int32)


def slide_inference(apply_fn: Callable[[jax.Array], jax.Array],
                    images: jax.Array, num_classes: int,
                    cfg: SlideConfig = SlideConfig()) -> jax.Array:
    """apply_fn: (B, crop, crop, 3) → full-res crop logits (B, crop, crop, K).

    images: (B, H, W, 3).  Returns averaged logits (B, H, W, K) fp32.
    For H, W <= crop this degenerates to a single whole-image call.
    """
    B, H, W, _ = images.shape
    crop = min(cfg.crop, H, W)
    if H <= cfg.crop and W <= cfg.crop:
        return apply_fn(images).astype(jnp.float32)

    origins = jnp.asarray(slide_origins(H, W, crop, cfg.stride))

    def body(carry, origin):
        preds, count = carry
        y, x = origin[0], origin[1]
        tile = jax.lax.dynamic_slice(images, (0, y, x, 0), (B, crop, crop, images.shape[3]))
        logits = apply_fn(tile).astype(jnp.float32)
        patch = jax.lax.dynamic_slice(preds, (0, y, x, 0), (B, crop, crop, num_classes))
        preds = jax.lax.dynamic_update_slice(preds, patch + logits, (0, y, x, 0))
        cpatch = jax.lax.dynamic_slice(count, (0, y, x, 0), (1, crop, crop, 1))
        count = jax.lax.dynamic_update_slice(count, cpatch + 1.0, (0, y, x, 0))
        return (preds, count), None

    preds0 = jnp.zeros((B, H, W, num_classes), jnp.float32)
    count0 = jnp.zeros((1, H, W, 1), jnp.float32)
    (preds, count), _ = jax.lax.scan(body, (preds0, count0), origins)
    return preds / count
