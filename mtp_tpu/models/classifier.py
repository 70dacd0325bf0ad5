"""Image classifier: ViT+RVSA backbone → GAP → linear head.

Capability parity with the reference scene-classification recipe
(RS_Tasks_Finetune/Scene_Classification/configs/mtp/eurosat/
vit-rvsa-b-224-mae-mtp_eurosat.py:185-213: ImageClassifier +
GlobalAveragePooling + LinearClsHead on the last pyramid level).
"""

from __future__ import annotations

import jax
from flax import linen as nn

from mtp_tpu.heads.linear_cls import LinearClsHead
from mtp_tpu.models.backbones import build_backbone
from mtp_tpu.utils.config import BackboneConfig


class ImageClassifier(nn.Module):
    cfg: BackboneConfig
    num_classes: int

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        feats = build_backbone(self.cfg)(x, deterministic)
        return LinearClsHead(self.num_classes, name="head")(feats[-1])
