"""FPN neck (mmdet FPN semantics: lateral 1x1 + output 3x3 convs, top-down
nearest upsampling, extra max-pool level).  Used on top of the backbone's
simple-FPN pyramid by the detection stacks (reference configs: in 4 levels,
out 256 channels, num_outs 5)."""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def upsample_nearest(x: Array, size: Tuple[int, int]) -> Array:
    B, H, W, C = x.shape
    h, w = size
    ry, rx = h // H, w // W
    x = jnp.repeat(jnp.repeat(x, ry, axis=1), rx, axis=2)
    return x[:, :h, :w]


class FPN(nn.Module):
    """start_level drops the first backbone levels before the laterals
    (mmdet FPN start_level); extra levels beyond the laterals are max-pooled
    by default or, with add_extra_convs='on_input', stride-2 3x3 convs whose
    first input is the LAST backbone feature (the RetinaNet neck:
    reference retinanet_rvsa_l_416_mae_mtp_xview.py:220-226 —
    start_level=1, add_extra_convs='on_input', num_outs=5)."""

    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    add_extra_convs: str = ""  # "" (max-pool) | "on_input"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[Array]) -> Tuple[Array, ...]:
        used = list(feats[self.start_level:])
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"lateral_{i}")(f)
            for i, f in enumerate(used)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + upsample_nearest(
                laterals[i], laterals[i - 1].shape[1:3])
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name=f"fpn_conv_{i}")(laterals[i])
            for i in range(len(laterals))
        ]
        if self.add_extra_convs == "on_input":
            x = feats[-1]
            for i in range(len(outs), self.num_outs):
                x = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                            padding=1, dtype=self.dtype,
                            name=f"fpn_conv_{i}")(x)
                outs.append(x)
        else:
            while len(outs) < self.num_outs:
                outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return tuple(outs)
