"""UNet decode head for change detection.

Capability parity with the reference `UNetHead`
(Change_Detection/opencd/models/decode_heads/unet_head.py:210-...): features
reversed (coarsest first), each DecoderBlock does nearest 2x upsample →
concat bilinear-resized skip → two Conv-BN-ReLU; final 2x bilinear upsample
→ dropout → 1x1 classifier.  With the RVSA CD backbone all skips are
16-stride maps, so the decoder progressively upsamples 16→8→4→2→1 stride and
the final 2x overshoots input resolution exactly as the reference does (the
loss/predict path resizes logits to label size).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mtp_tpu.heads.fpn import upsample_nearest
from mtp_tpu.heads.upernet import resize_bilinear

Array = jax.Array


class ConvBNReLU(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn")(x)
        return nn.relu(x)


class DecoderBlock(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, skip: Array = None,
                 train: bool = False) -> Array:
        B, H, W, C = x.shape
        x = upsample_nearest(x, (H * 2, W * 2))
        if skip is not None:
            skip = resize_bilinear(skip, (H * 2, W * 2))
            x = jnp.concatenate([x, skip], axis=-1)
        x = ConvBNReLU(self.out_channels, dtype=self.dtype, name="conv1")(x, train)
        x = ConvBNReLU(self.out_channels, dtype=self.dtype, name="conv2")(x, train)
        return x


class UNetHead(nn.Module):
    num_classes: int
    decoder_channels: Tuple[int, ...] = (512, 256, 128, 64)
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[Array], train: bool = False,
                 deterministic: bool = True) -> Array:
        feats = list(feats)[::-1]  # coarsest (deepest) first
        x = feats[0]
        skips = feats[1:]
        for i, ch in enumerate(self.decoder_channels):
            skip = skips[i] if i < len(skips) else None
            x = DecoderBlock(ch, dtype=self.dtype, name=f"block_{i}")(
                x, skip, train)
        B, H, W, _ = x.shape
        x = resize_bilinear(x, (H * 2, W * 2))
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                       name="conv_seg")(x)
