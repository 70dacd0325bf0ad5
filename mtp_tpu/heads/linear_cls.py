"""Scene-classification head: global average pool + linear classifier.

Equivalent to the mmpretrain `GlobalAveragePooling` + `LinearClsHead` used by
the reference scene-classification configs
(RS_Tasks_Finetune/Scene_Classification/configs/mtp/*: LinearClsHead on the
backbone's last feature map).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class LinearClsHead(nn.Module):
    num_classes: int

    @nn.compact
    def __call__(self, feat: jax.Array) -> jax.Array:
        """feat: (B, H, W, C) → logits (B, num_classes)."""
        x = feat.mean(axis=(1, 2)).astype(jnp.float32)
        return nn.Dense(self.num_classes, name="fc",
                        kernel_init=nn.initializers.truncated_normal(0.02))(x)
