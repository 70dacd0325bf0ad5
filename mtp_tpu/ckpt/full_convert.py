"""Full finetuned-model converters: released torch checkpoints → flax trees.

The backbone-only converter (ckpt/torch_convert.py) covers the pretraining
artifact (`*_encoder.pth`); these converters additionally ingest the released
FINETUNED checkpoints — backbone + task head — so a real released model can
be evaluated end to end (tools/validate.py):

- segmentation: mmseg `EncoderDecoder` with `UPerHead`
  (RS_Tasks_Finetune/Semantic_Segmentation/configs/mtp/*: decode_head.
  psp_modules/bottleneck/lateral_convs/fpn_convs/fpn_bottleneck/conv_seg),
- classification: mmpretrain `ImageClassifier` with `LinearClsHead`
  (head.fc),
- change detection: opencd `SiamEncoderDecoder` with `UNetHead`
  (decode_head.blocks.{i}.conv{1,2}.{0=conv,1=bn}, conv_seg;
  Change_Detection/opencd/models/decode_heads/unet_head.py:22-62,210).

Outputs are `{"params": ..., "batch_stats": ...}` variable dicts matching
`models/{segmentor,classifier,change_detection}.py` module naming.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from mtp_tpu.ckpt.torch_convert import (_t, convert_backbone,
                                        load_torch_checkpoint, to_scan_layout)
from mtp_tpu.utils.config import BackboneConfig


def _put(tree: dict, path: str, val):
    node = tree
    parts = path.split("/")
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = np.asarray(_t(val), np.float32)


def _conv(sd, src, params, dst, transpose=True):
    w = _t(sd[src + ".weight"])
    _put(params, dst + "/kernel",
         w.transpose(2, 3, 1, 0) if transpose else w)
    if src + ".bias" in sd:
        _put(params, dst + "/bias", sd[src + ".bias"])


def _bn(sd, src, params, stats, dst):
    _put(params, dst + "/scale", sd[src + ".weight"])
    _put(params, dst + "/bias", sd[src + ".bias"])
    _put(stats, dst + "/mean", sd[src + ".running_mean"])
    _put(stats, dst + "/var", sd[src + ".running_var"])


def _convmodule(sd, src, params, stats, dst):
    """mmcv ConvModule (src.conv + src.bn) → our ConvModule (dst/conv+bn)."""
    _conv(sd, src + ".conv", params, dst + "/conv")
    _bn(sd, src + ".bn", params, stats, dst + "/bn")


def convert_upernet_head(sd: Dict[str, np.ndarray],
                         prefix: str = "decode_head."
                         ) -> Tuple[dict, dict]:
    """mmseg UPerHead state_dict → (params, batch_stats) for
    heads/upernet.UperNetHead."""
    p, s = {}, {}
    g = lambda k: prefix + k
    for k in range(4):  # pool_scales (1, 2, 3, 6)
        _convmodule(sd, g(f"psp_modules.{k}.1"), p, s, f"psp/pool_{k}")
    _convmodule(sd, g("bottleneck"), p, s, "psp/bottleneck")
    for i in range(3):
        _convmodule(sd, g(f"lateral_convs.{i}"), p, s, f"lateral_{i}")
        _convmodule(sd, g(f"fpn_convs.{i}"), p, s, f"fpn_{i}")
    _convmodule(sd, g("fpn_bottleneck"), p, s, "fpn_bottleneck")
    _conv(sd, g("conv_seg"), p, "conv_seg")
    return p, s


def convert_unet_head(sd: Dict[str, np.ndarray],
                      prefix: str = "decode_head.",
                      n_blocks: int = 4) -> Tuple[dict, dict]:
    """opencd UNetHead state_dict → (params, batch_stats) for
    heads/unet.UNetHead (Conv2dReLU = Sequential(0=conv, 1=bn, 2=relu))."""
    p, s = {}, {}
    g = lambda k: prefix + k
    for i in range(n_blocks):
        for c in ("conv1", "conv2"):
            _conv(sd, g(f"blocks.{i}.{c}.0"), p, f"block_{i}/{c}/conv")
            _bn(sd, g(f"blocks.{i}.{c}.1"), p, s, f"block_{i}/{c}/bn")
    _conv(sd, g("conv_seg"), p, "conv_seg")
    return p, s


def convert_linear_head(sd: Dict[str, np.ndarray],
                        prefix: str = "head.") -> dict:
    """mmpretrain LinearClsHead (head.fc) → heads/linear_cls naming."""
    return {"fc": {"kernel": np.asarray(sd[prefix + "fc.weight"].T, np.float32),
                   "bias": np.asarray(sd[prefix + "fc.bias"], np.float32)}}


def _split_prefix(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def convert_full_checkpoint(path: str, task: str, cfg: BackboneConfig,
                            grid: Optional[Tuple[int, int]] = None) -> dict:
    """Released finetuned checkpoint → flax variables for the matching task
    model.  task: segmentation | classification | change_detection.

    The torch tree is `backbone.* + (decode_head|head).*` (mm convention);
    the flax tree nests under the module names used by models/*.py.
    """
    sd = load_torch_checkpoint(path)
    bb_sd = _split_prefix(sd, "backbone.")
    backbone = convert_backbone(bb_sd, cfg, grid)
    if cfg.scan:
        backbone = to_scan_layout(backbone, cfg.depth, cfg.interval)

    if task == "segmentation":
        head_p, head_s = convert_upernet_head(sd)
        return {"params": {"backbone": backbone, "decode_head": head_p},
                "batch_stats": {"decode_head": head_s}}
    if task == "change_detection":
        # the CD backbone variant comments the FPN ops out (reference
        # vit_rvsa_mtp.py:859-861): the released ckpt still CARRIES fpn1/2
        # params but the model never runs them — drop on conversion
        backbone.pop("fpn", None)
        head_p, head_s = convert_unet_head(sd)
        return {"params": {"backbone": backbone, "decode_head": head_p},
                "batch_stats": {"decode_head": head_s}}
    if task == "classification":
        return {"params": {"backbone": backbone,
                           "head": convert_linear_head(sd)},
                "batch_stats": {}}
    raise ValueError(f"unsupported task for full conversion: {task}")
