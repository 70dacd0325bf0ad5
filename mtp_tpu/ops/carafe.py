"""CARAFE: Content-Aware ReAssembly of FEatures (upsampling op).

The reference mask head optionally upsamples with mmcv's CUDA `CARAFEPack`
(instance_segmentation/mask_head.py:10,99-107).  TPU-native formulation:
the k×k neighborhoods are materialized once with a dilated-patch extraction
(pure XLA, fuses into the surrounding convs) and reassembled with an
einsum over the kernel dimension — no scatter/gather kernels needed.

Semantics follow mmcv CARAFEPack: 1×1 channel compressor → encoder conv
predicting σ²·k² reassembly kernels → pixel-shuffle to the upsampled grid →
softmax over k² → weighted sum of the SOURCE pixel's k×k neighborhood for
each upsampled position.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def carafe_reassemble(x: Array, masks: Array, kernel: int = 5,
                      scale: int = 2) -> Array:
    """x (B, H, W, C); masks (B, σH, σW, k²) (already normalized) →
    (B, σH, σW, C).

    Each upsampled position (i, j) reads the k×k neighborhood of its source
    pixel (i//σ, j//σ) (zero padding at borders) weighted by its mask."""
    B, H, W, C = x.shape
    k = kernel
    # (B, H, W, k²·C): neighborhoods, feature-major per patch position
    patches = jax.lax.conv_general_dilated_patches(
        x, filter_shape=(k, k), window_strides=(1, 1),
        padding=((k // 2, k // 2), (k // 2, k // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # conv_general_dilated_patches yields channels ordered (C, k, k)
    patches = patches.reshape(B, H, W, C, k * k)
    # nearest-upsample the source neighborhoods to the output grid
    patches = jnp.repeat(jnp.repeat(patches, scale, axis=1), scale, axis=2)
    return jnp.einsum("bhwck,bhwk->bhwc", patches,
                      masks.astype(patches.dtype))


class CARAFEPack(nn.Module):
    """Kernel-prediction + reassembly module (mmcv CARAFEPack defaults:
    up_kernel 5, encoder kernel 3, compressed channels 64)."""

    scale: int = 2
    up_kernel: int = 5
    encoder_kernel: int = 3
    compressed_channels: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        B, H, W, C = x.shape
        s, k = self.scale, self.up_kernel
        c = nn.Conv(self.compressed_channels, (1, 1), dtype=self.dtype,
                    name="channel_compressor")(x)
        m = nn.Conv(s * s * k * k, (self.encoder_kernel,) * 2,
                    padding=self.encoder_kernel // 2, dtype=self.dtype,
                    name="content_encoder")(c)
        # pixel shuffle: (B, H, W, σ·σ·k²) → (B, σH, σW, k²)
        m = m.reshape(B, H, W, s, s, k * k)
        m = m.transpose(0, 1, 3, 2, 4, 5).reshape(B, H * s, W * s, k * k)
        m = jax.nn.softmax(m.astype(jnp.float32), axis=-1)
        return carafe_reassemble(x, m, kernel=k, scale=s)
