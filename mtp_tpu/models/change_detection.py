"""Siamese change detection: shared RVSA encoder on two epochs → abs-diff
fusion → UNet decoder.

Capability parity with the reference CD recipe (SiamEncoderDecoder +
FeatureFusionNeck(policy='abs_diff') + UNetHead, configs/mtp/levir/
rvsa-l-unet-256-mae-mtp_levir.py:167-213).  The encoder runs on both images
with shared weights — expressed as one batched forward over the stacked
pair (2B batch), which XLA executes as a single large-batch program instead
of two sequential towers.  The backbone is used `features_only` (raw
16-stride maps; the reference CD backbone comments out the FPN ops,
Change_Detection/opencd/models/backbones/vit_rvsa_mtp.py:859-861).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mtp_tpu.heads.unet import UNetHead
from mtp_tpu.heads.upernet import resize_bilinear
from mtp_tpu.models.backbones import build_backbone
from mtp_tpu.utils.config import BackboneConfig

Array = jax.Array


class SiamChangeDetector(nn.Module):
    cfg: BackboneConfig
    num_classes: int = 2
    fusion: str = "abs_diff"  # FeatureFusionNeck policies: abs_diff | concat | sum

    @nn.compact
    def __call__(self, img_a: Array, img_b: Array, train: bool = False,
                 deterministic: bool = True) -> Array:
        """(B, H, W, 3) x2 → change logits (B, 2H, 2W, num_classes)
        (the UNet over-upsamples; callers resize to label size)."""
        B = img_a.shape[0]
        both = jnp.concatenate([img_a, img_b], axis=0)
        backbone = build_backbone(self.cfg)
        if self.cfg.name.startswith("internimage"):
            feats = backbone(both, deterministic)  # native pyramid
        else:
            # ViT CD variant feeds raw 16-stride features (reference
            # vit_rvsa_mtp.py:859-861 comments the FPN ops out)
            feats = backbone(both, deterministic, features_only=True)
        fused = []
        for f in feats:
            fa, fb = f[:B], f[B:]
            if self.fusion == "abs_diff":
                fused.append(jnp.abs(fa - fb))
            elif self.fusion == "sum":
                fused.append(fa + fb)
            elif self.fusion == "concat":
                fused.append(jnp.concatenate([fa, fb], axis=-1))
            else:
                raise ValueError(self.fusion)
        return UNetHead(self.num_classes, name="decode_head")(
            fused, train, deterministic)

    def predict(self, img_a: Array, img_b: Array) -> Array:
        logits = self(img_a, img_b, train=False, deterministic=True)
        return resize_bilinear(logits, img_a.shape[1:3])
