"""Encoder-decoder semantic segmentor: ViT+RVSA → UperNet.

Capability parity with the reference `MTP_SS_UperNet`
(Multi-Task_Pretrain/semantic_segmentation/encoder_decoder.py) and the
finetune `EncoderDecoder` seg configs.  Returns stride-4 logits; full-size
upsampling + softmax happen in the loss / slide-inference wrappers.
"""

from __future__ import annotations

import jax
from flax import linen as nn

from mtp_tpu.heads.upernet import UperNetHead, resize_bilinear
from mtp_tpu.models.backbones import build_backbone
from mtp_tpu.utils.config import BackboneConfig


class Segmentor(nn.Module):
    cfg: BackboneConfig
    num_classes: int
    channels: int = 512

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 deterministic: bool = True) -> jax.Array:
        """(B, H, W, 3) → stride-4 logits (B, H/4, W/4, num_classes)."""
        feats = build_backbone(self.cfg)(x, deterministic)
        return UperNetHead(self.num_classes, channels=self.channels,
                           name="decode_head")(feats, train, deterministic)

    def predict(self, x: jax.Array) -> jax.Array:
        """Full-resolution logits (B, H, W, num_classes), eval mode."""
        logits = self(x, train=False, deterministic=True)
        return resize_bilinear(logits, x.shape[1:3])
