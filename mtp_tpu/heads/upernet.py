"""UperNet decode head (PSP + FPN fusion), TPU-native.

Equivalent capability to mmseg `UPerHead` as configured by the reference
(Multi-Task_Pretrain/semantic_segmentation/encoder_decoder.py:75-87 and the
finetune seg configs): pool_scales (1,2,3,6), channels 512, BN+ReLU conv
modules, bilinear align_corners=False resizes, dropout 0.1 before the 1x1
classifier.

SyncBN note: under jit with the batch dim sharded over the mesh, flax
BatchNorm's `jnp.mean` over the batch axis is computed globally by GSPMD
(partial sums + all-reduce over ICI) — i.e. plain BatchNorm here IS SyncBN;
no process-group code needed (SURVEY.md §2.4).

The final per-dataset 1x1 classifier can be disabled (`with_classifier=False`)
so the multi-task pretrainer can swap dataset-specific heads in, mirroring
`_forward_feature` + external semseghead (reference models.py:345-351).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def resize_bilinear(x: Array, size: Tuple[int, int],
                    align_corners: bool = False) -> Array:
    """NHWC bilinear resize matching torch F.interpolate semantics."""
    B, H, W, C = x.shape
    h, w = size
    if (H, W) == (h, w):
        return x
    if align_corners:
        # torch align_corners=True == jax.image 'linear' with corner alignment
        scale = ((H - 1) / max(h - 1, 1), (W - 1) / max(w - 1, 1))
        ys = jnp.arange(h, dtype=jnp.float32) * scale[0]
        xs = jnp.arange(w, dtype=jnp.float32) * scale[1]
    else:
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) * (H / h) - 0.5
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) * (W / w) - 0.5
    y0 = jnp.clip(jnp.floor(ys), 0, H - 1)
    x0 = jnp.clip(jnp.floor(xs), 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    wy = jnp.clip(ys - y0, 0.0, 1.0)
    wx = jnp.clip(xs - x0, 0.0, 1.0)
    y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)
    x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)

    top = x[:, y0i][:, :, x0i] * (1 - wx)[None, None, :, None] + \
          x[:, y0i][:, :, x1i] * wx[None, None, :, None]
    bot = x[:, y1i][:, :, x0i] * (1 - wx)[None, None, :, None] + \
          x[:, y1i][:, :, x1i] * wx[None, None, :, None]
    out = top * (1 - wy)[None, :, None, None] + bot * wy[None, :, None, None]
    return out.astype(x.dtype)


class ConvModule(nn.Module):
    """Conv + BatchNorm + ReLU (the mmcv ConvModule default used throughout)."""

    features: int
    kernel: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        pad = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    padding=pad, use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn")(x)
        return nn.relu(x)


class PSPModule(nn.Module):
    """Pyramid pooling over the coarsest feature map."""

    channels: int
    pool_scales: Tuple[int, ...] = (1, 2, 3, 6)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        B, H, W, C = x.shape
        outs = [x]
        for i, s in enumerate(self.pool_scales):
            # adaptive average pool to (s, s): mean over equal bins
            # (H, W are multiples of the pool bins in all shipped configs;
            #  otherwise fall back to a strided reduce via resize)
            if H % s == 0 and W % s == 0:
                p = x.reshape(B, s, H // s, s, W // s, C).mean((2, 4))
            else:
                p = resize_bilinear(x, (s, s))
            p = ConvModule(self.channels, kernel=1, dtype=self.dtype,
                           name=f"pool_{i}")(p, train)
            outs.append(resize_bilinear(p, (H, W)))
        x = jnp.concatenate(outs, axis=-1)
        return ConvModule(self.channels, kernel=3, dtype=self.dtype,
                          name="bottleneck")(x, train)


class UperNetHead(nn.Module):
    """PSP + top-down FPN fusion producing a stride-4 feature map, plus an
    optional 1x1 classifier."""

    num_classes: int
    channels: int = 512
    pool_scales: Tuple[int, ...] = (1, 2, 3, 6)
    dropout: float = 0.1
    align_corners: bool = False
    with_classifier: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[Array], train: bool = False,
                 deterministic: bool = True) -> Array:
        laterals = [
            ConvModule(self.channels, kernel=1, dtype=self.dtype,
                       name=f"lateral_{i}")(f, train)
            for i, f in enumerate(feats[:-1])
        ]
        laterals.append(PSPModule(self.channels, self.pool_scales,
                                  dtype=self.dtype, name="psp")(feats[-1], train))

        for i in range(len(laterals) - 1, 0, -1):
            h, w = laterals[i - 1].shape[1:3]
            laterals[i - 1] = laterals[i - 1] + resize_bilinear(
                laterals[i], (h, w), self.align_corners)

        outs = [
            ConvModule(self.channels, kernel=3, dtype=self.dtype,
                       name=f"fpn_{i}")(laterals[i], train)
            for i in range(len(laterals) - 1)
        ]
        outs.append(laterals[-1])

        h, w = outs[0].shape[1:3]
        outs = [resize_bilinear(o, (h, w), self.align_corners) for o in outs]
        x = jnp.concatenate(outs, axis=-1)
        x = ConvModule(self.channels, kernel=3, dtype=self.dtype,
                       name="fpn_bottleneck")(x, train)

        if not self.with_classifier:
            return x
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                       name="conv_seg")(x)
