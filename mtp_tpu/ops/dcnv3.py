"""DCNv3 (deformable convolution v3) for TPU.

The reference implements this as a CUDA/HIP extension
(backbone/ops_dcnv3/src/) with a pure-PyTorch fallback
(`dcnv3_core_pytorch`, functions/dcnv3_func.py:174-240) that is the semantic
spec; this module reproduces those semantics as fused jnp (gather + masked
reduction on the VPU, projections on the MXU).  Offsets/masks come from the
module wrapper (modules/dcnv3.py:91-207): depthwise conv → linear offset /
softmax mask, xavier-init input/output projections, zero-init regressors.

Layout is NHWC throughout (the reference core is also channels-last).
Sampling uses bilinear interpolation with align_corners=False and zero
padding, matching F.grid_sample in the spec.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mtp_tpu.ops.grid_sample import grid_sample

Array = jax.Array


def dcnv3_core(x: Array, offset: Array, mask: Array, *, kernel: int = 3,
               stride: int = 1, pad: int = 1, dilation: int = 1,
               group: int = 4, offset_scale: float = 1.0) -> Array:
    """x (N, H, W, G*C'); offset (N, Ho, Wo, G*K*K*2); mask (N, Ho, Wo, G*K*K)
    (already softmaxed) → (N, Ho, Wo, G*C')."""
    N, H, W, C = x.shape
    gc = C // group
    K = kernel
    P = K * K
    x_pad = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    _, H_in, W_in, _ = x_pad.shape
    Ho, Wo = offset.shape[1:3]

    # reference point centers (normalized to padded size), spec
    # `_get_reference_points`
    base = (dilation * (K - 1)) // 2 + 0.5
    ref_y = (base + np.arange(Ho, dtype=np.float32) * stride) / H_in
    ref_x = (base + np.arange(Wo, dtype=np.float32) * stride) / W_in

    # kernel tap offsets (normalized), spec `_generate_dilation_grids`
    start = -((dilation * (K - 1)) // 2)
    taps = start + np.arange(K, dtype=np.float32) * dilation
    # meshgrid(x, y) 'ij' then stack (x/W, y/H): tap index p = ix * K + iy
    tx, ty = np.meshgrid(taps, taps, indexing="ij")
    grid_x = (tx.reshape(-1) / W_in)  # (P,)
    grid_y = (ty.reshape(-1) / H_in)

    off = offset.reshape(N, Ho, Wo, group, P, 2)
    loc_x = (ref_x[None, None, :, None, None]
             + grid_x[None, None, None, None, :] * offset_scale
             + off[..., 0] * offset_scale / W_in)
    loc_y = (ref_y[None, :, None, None, None]
             + grid_y[None, None, None, None, :] * offset_scale
             + off[..., 1] * offset_scale / H_in)
    # to [-1, 1] grid_sample coords
    gx = 2.0 * loc_x - 1.0  # (N, Ho, Wo, G, P)
    gy = 2.0 * loc_y - 1.0

    # per-group sampling
    xg = x_pad.reshape(N, H_in, W_in, group, gc).transpose(0, 3, 1, 2, 4)
    xg = xg.reshape(N * group, H_in, W_in, gc)
    g = jnp.stack([gx, gy], axis=-1).transpose(0, 3, 1, 2, 4, 5)
    g = g.reshape(N * group, Ho * Wo, P, 2)
    sampled = grid_sample(xg, g, align_corners=False, padding_mode="zeros")
    # (N*G, Ho*Wo, P, gc) weighted by mask → (N*G, Ho*Wo, gc)
    m = mask.reshape(N, Ho, Wo, group, P).transpose(0, 3, 1, 2, 4)
    m = m.reshape(N * group, Ho * Wo, P, 1)
    out = (sampled * m.astype(sampled.dtype)).sum(axis=2)
    out = out.reshape(N, group, Ho, Wo, gc).transpose(0, 2, 3, 1, 4)
    return out.reshape(N, Ho, Wo, group * gc)


class DCNv3(nn.Module):
    """The full DCNv3 block (input/output proj + dw-conv offset/mask
    regressors + core), NHWC."""

    channels: int
    kernel: int = 3
    stride: int = 1
    pad: int = 1
    dilation: int = 1
    group: int = 4
    offset_scale: float = 1.0
    # Pallas one-hot matmul sampling core (ops/dcnv3_pallas.py) instead of
    # the XLA gather path — no gathers, no backward scatter
    pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        N, H, W, C = x.shape
        P = self.kernel * self.kernel
        xav = nn.initializers.xavier_uniform()

        proj = nn.Dense(self.channels, dtype=self.dtype, kernel_init=xav,
                        name="input_proj")(x)

        # depthwise conv → LN → GELU → offset/mask linears (zero-init)
        h = nn.Conv(self.channels, (self.kernel, self.kernel),
                    padding=(self.kernel - 1) // 2,
                    feature_group_count=self.channels, dtype=self.dtype,
                    name="dw_conv")(x)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="dw_norm")(h)
        h = nn.gelu(h, approximate=False)
        offset = nn.Dense(self.group * P * 2, dtype=jnp.float32,
                          kernel_init=nn.initializers.zeros,
                          name="offset")(h)
        mask = nn.Dense(self.group * P, dtype=jnp.float32,
                        kernel_init=nn.initializers.zeros, name="mask")(h)
        mask = jax.nn.softmax(mask.reshape(N, H, W, self.group, P), axis=-1)
        mask = mask.reshape(N, H, W, self.group * P)

        if self.pallas:
            from mtp_tpu.ops.dcnv3_pallas import dcnv3_core_onehot as core
        else:
            core = dcnv3_core
        out = core(proj, offset, mask, kernel=self.kernel,
                   stride=self.stride, pad=self.pad,
                   dilation=self.dilation, group=self.group,
                   offset_scale=self.offset_scale)
        return nn.Dense(self.channels, dtype=self.dtype, kernel_init=xav,
                        name="output_proj")(out)
