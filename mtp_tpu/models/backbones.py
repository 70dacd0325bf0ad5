"""Backbone factory: one place that maps a BackboneConfig to a module.

The reference pairs every task with either ViT-B/L+RVSA or InternImage-XL
(models.py:85-104); here `cfg.name` selects the family:
- "vit_b_rvsa" / "vit_l_rvsa" → ViTRVSA (simple-FPN pyramid, equal channels)
- "internimage_xl" / "internimage_t" → InternImage (native pyramid,
  doubling channels)

Both return 4 NHWC levels at strides 4/8/16/32 and accept
`(x, deterministic)`; ViTRVSA additionally supports `features_only`.
"""

from __future__ import annotations

import dataclasses

from flax import linen as nn

from mtp_tpu.models.internimage import (InternImage, internimage_t,
                                        internimage_xl)
from mtp_tpu.models.vit_rvsa import ViTRVSA
from mtp_tpu.utils.config import BackboneConfig


def build_backbone(cfg: BackboneConfig, name: str = "backbone") -> nn.Module:
    if cfg.name.startswith("internimage"):
        icfg = internimage_xl() if cfg.name.endswith("xl") else internimage_t()
        # BackboneConfig.pallas_attn doubles as the generic "use Pallas
        # kernels" switch: for InternImage it selects the one-hot DCNv3 core
        icfg = dataclasses.replace(icfg, dtype=cfg.dtype,
                                   drop_path_rate=cfg.drop_path_rate,
                                   remat=cfg.remat, scan=cfg.scan,
                                   pallas_dcn=cfg.pallas_attn)
        return InternImage(icfg, name=name)
    return ViTRVSA(cfg, name=name)


def internimage_backbone_config(variant: str = "internimage_xl",
                                img_size: int = 224, **kw) -> BackboneConfig:
    """A BackboneConfig shell for InternImage (ViT-specific fields unused by
    the factory; depth is the total layer count for layer-decay grouping)."""
    depths = (5, 5, 24, 5) if variant.endswith("xl") else (4, 4, 18, 4)
    return BackboneConfig(name=variant, img_size=img_size,
                          embed_dim=192 if variant.endswith("xl") else 64,
                          depth=sum(depths), num_heads=1, interval=10 ** 9,
                          out_indices=(0, 1, 2, 3), **kw)


def layer_id_fn_for(cfg: BackboneConfig, root: str = "backbone/"):
    """Layer-decay id function for a task whose params nest the backbone
    under `root`; picks the ViT or InternImage mapping by cfg.name."""
    from mtp_tpu.core.optim import vit_layer_id

    if cfg.name.startswith("internimage"):
        depths = (5, 5, 24, 5) if cfg.name.endswith("xl") else (4, 4, 18, 4)
        base = lambda p, n: internimage_layer_id(p, n, depths)
    else:
        base = vit_layer_id

    def fn(path: str, num_layers: int) -> int:
        if path.startswith(root):
            return base(path[len(root):], num_layers)
        return num_layers - 1

    return fn


def internimage_layer_id(path: str, num_layers: int,
                         depths=(5, 5, 24, 5)) -> int:
    """Layer-decay mapping for InternImage (reference
    mmcv_custom/custom_layer_decay_optimizer_constructor.py:63): stem → 0,
    stageS_layerL → cumulative layer index + 1, downsamples → end of their
    stage, heads/norms → num_layers - 1."""
    import re
    if "stem" in path:
        return 0
    m = re.search(r"stage(\d+)_layer(\d+)", path)
    if m:
        s, l = int(m.group(1)), int(m.group(2))
        return sum(depths[:s]) + l + 1
    m = re.search(r"down(\d+)_", path)
    if m:
        s = int(m.group(1))
        return sum(depths[:s + 1])
    return num_layers - 1
