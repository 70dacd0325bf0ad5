"""RoI heads: shared-2FC box trunk, FCN mask trunk, and their losses.

Capability parity with the reference trunks whose *final* layers are external
so the multi-task pretrainer can swap per-dataset classifiers in:
- `MTP_IS_Shared2FCBBoxHead` (instance_segmentation/bbox_head.py:226) returns
  penultimate (x_cls, x_reg) features; fc_cls/fc_reg live outside,
- `MTP_IS_FCNMaskHead` (instance_segmentation/mask_head.py:30) returns the
  upsampled conv features; conv_logits lives outside,
- same split for the rotated head (`MTP_RD_Shared2FCBBoxHead`).

For single-task finetuning the wrapper modules below also provide the final
layers inline.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


class Shared2FCTrunk(nn.Module):
    """Flatten RoI features → fc1 → fc2 (both shared by cls and reg)."""

    fc_out: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, roi_feats: Array) -> Array:
        """(R, s, s, C) → (R, fc_out)."""
        x = roi_feats.reshape(roi_feats.shape[0], -1)
        x = nn.relu(nn.Dense(self.fc_out, dtype=self.dtype, name="fc1")(x))
        x = nn.relu(nn.Dense(self.fc_out, dtype=self.dtype, name="fc2")(x))
        return x


class BBoxHead(nn.Module):
    """Trunk + final cls/reg layers (single-task variant)."""

    num_classes: int
    reg_dim: int = 4          # 5 for rotated
    reg_class_agnostic: bool = False
    fc_out: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, roi_feats: Array) -> Tuple[Array, Array]:
        x = Shared2FCTrunk(self.fc_out, dtype=self.dtype, name="trunk")(roi_feats)
        cls = nn.Dense(self.num_classes + 1, dtype=jnp.float32,
                       name="fc_cls")(x)
        reg_out = self.reg_dim if self.reg_class_agnostic \
            else self.reg_dim * self.num_classes
        reg = nn.Dense(reg_out, dtype=jnp.float32, name="fc_reg")(x)
        return cls, reg


class FCNMaskTrunk(nn.Module):
    """4x conv3x3 + 2x upsample (final 1x1 logits external or inline).

    upsample: 'deconv' (reference default) | 'carafe' (mmcv CARAFEPack
    option of the reference FCNMaskHead, mask_head.py:10,99) | 'nearest' |
    'bilinear'."""

    conv_out: int = 256
    num_convs: int = 4
    upsample: str = "deconv"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, roi_feats: Array) -> Array:
        x = roi_feats
        for i in range(self.num_convs):
            x = nn.relu(nn.Conv(self.conv_out, (3, 3), padding=1,
                                dtype=self.dtype, name=f"conv_{i}")(x))
        if self.upsample == "deconv":
            x = nn.relu(nn.ConvTranspose(self.conv_out, (2, 2),
                                         strides=(2, 2), dtype=self.dtype,
                                         name="upsample")(x))
        elif self.upsample == "carafe":
            from mtp_tpu.ops.carafe import CARAFEPack
            x = nn.relu(CARAFEPack(scale=2, dtype=self.dtype,
                                   name="upsample_carafe")(x))
        elif self.upsample in ("nearest", "bilinear"):
            B, H, W, C = x.shape
            if self.upsample == "nearest":
                x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            else:
                import jax.image
                x = jax.image.resize(x, (B, H * 2, W * 2, C), "bilinear")
        else:
            raise ValueError(f"unknown upsample {self.upsample!r}")
        return x


class MaskHead(nn.Module):
    num_classes: int
    conv_out: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, roi_feats: Array) -> Array:
        x = FCNMaskTrunk(self.conv_out, dtype=self.dtype, name="trunk")(roi_feats)
        return nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                       name="conv_logits")(x)


# ---------------------------------------------------------------------------
# losses (mmdet semantics)
# ---------------------------------------------------------------------------

def bbox_head_loss(cls_logits: Array, reg_pred: Array, sample,
                   target_deltas: Array, num_classes: int,
                   reg_class_agnostic: bool = False,
                   smooth_l1_beta: Optional[float] = None) -> dict:
    """cls: softmax CE over classes + background (bg = num_classes index);
    reg: L1/SmoothL1 on positive slots, class-specific unless agnostic.
    Normalization: CE by valid slots, reg by valid slots (mmdet avg_factor)."""
    R = cls_logits.shape[0]
    labels = jnp.where(sample.is_pos, sample.labels, num_classes)
    valid = sample.valid
    ce = -jax.nn.log_softmax(cls_logits)[jnp.arange(R), labels]
    n_valid = jnp.maximum(valid.sum(), 1)
    loss_cls = jnp.where(valid, ce, 0.0).sum() / n_valid
    acc = jnp.where(valid, cls_logits.argmax(-1) == labels, 0).sum() / n_valid

    if reg_class_agnostic:
        reg = reg_pred.reshape(R, -1)
    else:
        D = target_deltas.shape[-1]
        reg = reg_pred.reshape(R, num_classes, D)[
            jnp.arange(R), jnp.clip(sample.labels, 0, num_classes - 1)]
    diff = reg - target_deltas
    if smooth_l1_beta:
        ad = jnp.abs(diff)
        l1 = jnp.where(ad < smooth_l1_beta, 0.5 * ad * ad / smooth_l1_beta,
                       ad - 0.5 * smooth_l1_beta)
    else:
        l1 = jnp.abs(diff)
    loss_reg = jnp.where(sample.is_pos[:, None], l1, 0.0).sum() / n_valid
    return {"loss_cls": loss_cls, "loss_bbox": loss_reg, "acc": acc * 100.0}


def mask_head_loss(mask_logits: Array, mask_targets: Array, sample) -> dict:
    """BCE over the per-slot gt-class mask channel, averaged over positive
    slots (mmdet CrossEntropyLoss(use_mask=True)).

    mask_logits (R, m, m, K); mask_targets (R, m, m) in [0, 1]."""
    R, m, _, K = mask_logits.shape
    sel = mask_logits[jnp.arange(R), :, :,
                      jnp.clip(sample.labels, 0, K - 1)]
    z = sel
    y = mask_targets
    bce = jnp.maximum(z, 0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z)))
    per_roi = bce.mean(axis=(1, 2))
    n_pos = jnp.maximum(sample.is_pos.sum(), 1)
    return {"loss_mask": jnp.where(sample.is_pos, per_roi, 0.0).sum() / n_pos}
