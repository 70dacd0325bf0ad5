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
  Change_Detection/opencd/models/decode_heads/unet_head.py:22-62,210),
- horizontal detection: mmdet `FasterRCNN` (neck.lateral_convs/fpn_convs,
  rpn_head.rpn_{conv,cls,reg}, roi_head.bbox_head.{shared_fcs,fc_cls,fc_reg};
  RS_Tasks_Finetune/Horizontal_Detection/configs/mtp/dior/
  faster_rcnn_rvsa_l_800_mae_mtp_dior.py:220-248) and `RetinaNet`
  (bbox_head.{cls,reg}_convs + retina_{cls,reg};
  .../xview/retinanet_rvsa_l_416_mae_mtp_xview.py:220-268),
- rotated detection: mmrotate `OrientedRCNN` — same key families as
  FasterRCNN (OrientedRPNHead keeps the rpn_{conv,cls,reg} names with 6
  deltas/anchor; RotatedShared2FCBBoxHead keeps shared_fcs/fc_cls/fc_reg).

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


def _dense(sd, src, params, dst):
    """torch nn.Linear → flax Dense (weight (out, in) → kernel (in, out))."""
    _put(params, dst + "/kernel", _t(sd[src + ".weight"]).T)
    _put(params, dst + "/bias", sd[src + ".bias"])


def _dense_hwc(sd, src, params, dst, spatial: int, channels: int):
    """Linear whose torch input is a CHW-flattened RoI feature, converted for
    our HWC-flattened trunk (heads/roi_heads.Shared2FCTrunk reshapes
    (R, s, s, C) row-major): (out, C·s·s) → (s·s·C, out)."""
    w = _t(sd[src + ".weight"])
    out = w.shape[0]
    w = w.reshape(out, channels, spatial, spatial).transpose(2, 3, 1, 0)
    _put(params, dst + "/kernel", w.reshape(spatial * spatial * channels, out))
    _put(params, dst + "/bias", sd[src + ".bias"])


def convert_fpn_neck(sd: Dict[str, np.ndarray], prefix: str = "neck.",
                     n_lateral: int = 4, n_fpn: Optional[int] = None) -> dict:
    """mmdet FPN state_dict → heads/fpn.FPN params.  The detection necks
    carry no norm (norm_cfg unset in every mtp config): lateral_convs.{i}.conv
    → lateral_{i}, fpn_convs.{i}.conv → fpn_conv_{i}.  n_fpn counts ALL
    fpn_convs incl. 'on_input' extra levels (RetinaNet: 3 lateral + 5 fpn)."""
    p = {}
    g = lambda k: prefix + k
    for i in range(n_lateral):
        _conv(sd, g(f"lateral_convs.{i}.conv"), p, f"lateral_{i}")
    for i in range(n_fpn if n_fpn is not None else n_lateral):
        _conv(sd, g(f"fpn_convs.{i}.conv"), p, f"fpn_conv_{i}")
    return p


def convert_rpn_head(sd: Dict[str, np.ndarray],
                     prefix: str = "rpn_head.") -> dict:
    """mmdet RPNHead / mmrotate OrientedRPNHead → heads/rpn.RPNHead params
    (rpn_conv 3x3 shared, rpn_cls/rpn_reg 1x1; same names both families —
    reference faster_rcnn_..._dior.py:226-240, oriented_rcnn rpn_head)."""
    p = {}
    for k in ("rpn_conv", "rpn_cls", "rpn_reg"):
        _conv(sd, prefix + k, p, k)
    return p


def convert_bbox_head(sd: Dict[str, np.ndarray],
                      prefix: str = "roi_head.bbox_head.",
                      roi_size: int = 7) -> Tuple[dict, dict, dict]:
    """mmdet Shared2FCBBoxHead → (trunk params, fc_cls, fc_reg).

    shared_fcs.0 consumes the CHW-flattened RoIAlign output in torch; our
    trunk flattens HWC, so its kernel is spatially permuted on conversion
    (channel count derived from the weight's in_features).
    shared_fcs.1 / fc_cls / fc_reg operate on feature vectors (plain T)."""
    p_trunk, p_cls, p_reg = {}, {}, {}
    g = lambda k: prefix + k
    channels = _t(sd[g("shared_fcs.0.weight")]).shape[1] // (roi_size ** 2)
    _dense_hwc(sd, g("shared_fcs.0"), p_trunk, "fc1", roi_size, channels)
    _dense(sd, g("shared_fcs.1"), p_trunk, "fc2")
    _dense(sd, g("fc_cls"), p_cls, ".")
    _dense(sd, g("fc_reg"), p_reg, ".")
    return p_trunk, p_cls["."], p_reg["."]


def convert_retina_head(sd: Dict[str, np.ndarray],
                        prefix: str = "bbox_head.",
                        stacked_convs: int = 4) -> dict:
    """mmdet RetinaHead → models/retinanet.RetinaNet top-level params
    (cls_convs.{i}.conv → cls_conv_{i}, retina_cls/retina_reg 3x3)."""
    p = {}
    g = lambda k: prefix + k
    for i in range(stacked_convs):
        _conv(sd, g(f"cls_convs.{i}.conv"), p, f"cls_conv_{i}")
        _conv(sd, g(f"reg_convs.{i}.conv"), p, f"reg_conv_{i}")
    _conv(sd, g("retina_cls"), p, "retina_cls")
    _conv(sd, g("retina_reg"), p, "retina_reg")
    return p


def _split_prefix(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def convert_mask_trunk(sd: Dict[str, np.ndarray],
                       prefix: str = "roi_head.mask_head.",
                       num_convs: int = 4) -> dict:
    """mmdet FCNMaskHead trunk (convs.{i}.conv + deconv upsample; the final
    conv_logits is external in the MTP pretrainer) → heads/roi_heads.
    FCNMaskTrunk params.  torch ConvTranspose2d (in, out, kh, kw) → flax
    ConvTranspose (kh, kw, in, out)."""
    p = {}
    g = lambda k: prefix + k
    for i in range(num_convs):
        _conv(sd, g(f"convs.{i}.conv"), p, f"conv_{i}")
    w = _t(sd[g("upsample.weight")])
    _put(p, "upsample/kernel", np.ascontiguousarray(w.transpose(2, 3, 0, 1)))
    if g("upsample.bias") in sd:
        _put(p, "upsample/bias", sd[g("upsample.bias")])
    return p


def _shared2fc_trunk(sd: Dict[str, np.ndarray], prefix: str,
                     roi_size: int = 7) -> dict:
    """Shared2FC trunk only (the MTP pretrainer externalizes fc_cls/fc_reg,
    reference models.py:156-190 — the decoder bbox_head carries just
    shared_fcs.{0,1})."""
    p = {}
    g = lambda k: prefix + k
    channels = _t(sd[g("shared_fcs.0.weight")]).shape[1] // (roi_size ** 2)
    _dense_hwc(sd, g("shared_fcs.0"), p, "fc1", roi_size, channels)
    _dense(sd, g("shared_fcs.1"), p, "fc2")
    return p


def convert_multitask_checkpoint(path: str, cfg: BackboneConfig,
                                 grid: Optional[Tuple[int, int]] = None
                                 ) -> dict:
    """Released FULL MTP pretraining checkpoint (main_pretrain.py:823-829
    saves the 9-head `MutliTaskPretrnFramework` state_dict) → flax variables
    for models/multitask.MultiTaskPretrainModel — enables warm-starting our
    pretraining or a 9-way eval from the released artifact (the encoder-only
    sibling converts via ckpt/torch_convert.py already).

    torch key families (reference models.py:112-190):
      encoder.*                                → encoder
      semsegdecoder.decode_head.*              → ss_trunk (+ batch_stats)
      semseghead_{d+1}.1.*                     → ss_head_{d}  (Sequential:
                                                 0=Dropout2d, 1=Conv2d)
      inssegdecoder.neck|rpn_head|roi_head.*   → is_neck/is_rpn/is_bbox_trunk
                                                 /is_mask_trunk
      inssegroiboxhead_fc_{cls,reg}{d+1}       → is_fc_{cls,reg}_{d}
      inssegroimaskhead_conv{d+1}              → is_mask_conv_{d}
      rotdetdecoder.*                          → rd_neck/rd_rpn/rd_bbox_trunk
      rotdetroiboxhead_fc_{cls,reg}{d+1}       → rd_fc_{cls,reg}_{d}
    """
    sd = load_torch_checkpoint(path)
    bb_sd = _split_prefix(sd, "encoder.")
    if cfg.name.startswith("internimage"):
        from mtp_tpu.ckpt.torch_convert import (convert_internimage,
                                                to_stage_scan_layout)
        depths = (5, 5, 24, 5) if cfg.name.endswith("xl") else (4, 4, 18, 4)
        backbone = convert_internimage(bb_sd, depths)
        if cfg.scan:
            backbone = to_stage_scan_layout(backbone, depths)
    else:
        backbone = convert_backbone(bb_sd, cfg, grid)
        if cfg.scan:
            backbone = to_scan_layout(backbone, cfg.depth, cfg.interval)

    params: dict = {"encoder": backbone}
    stats: dict = {}

    # semantic segmentation: shared UperNet trunk (SyncBN stats) + 3 heads.
    # The torch UPerHead is built with num_classes=1, so its conv_seg exists
    # in the checkpoint but is never used (per-dataset heads replace it,
    # models.py:345-351) — dropped here (our trunk has with_classifier=False).
    trunk_p, trunk_s = convert_upernet_head(sd, "semsegdecoder.decode_head.")
    trunk_p.pop("conv_seg", None)
    params["ss_trunk"], stats["ss_trunk"] = trunk_p, trunk_s
    for d in range(3):
        hp = {}
        _conv(sd, f"semseghead_{d + 1}.1", hp, ".")
        params[f"ss_head_{d}"] = hp["."]

    # instance segmentation (Mask R-CNN with externalized finals)
    params["is_neck"] = convert_fpn_neck(sd, "inssegdecoder.neck.")
    params["is_rpn"] = convert_rpn_head(sd, "inssegdecoder.rpn_head.")
    params["is_bbox_trunk"] = _shared2fc_trunk(
        sd, "inssegdecoder.roi_head.bbox_head.")
    params["is_mask_trunk"] = convert_mask_trunk(
        sd, "inssegdecoder.roi_head.mask_head.")
    for d in range(3):
        pc, pr, pm = {}, {}, {}
        _dense(sd, f"inssegroiboxhead_fc_cls{d + 1}", pc, ".")
        _dense(sd, f"inssegroiboxhead_fc_reg{d + 1}", pr, ".")
        _conv(sd, f"inssegroimaskhead_conv{d + 1}", pm, ".")
        params[f"is_fc_cls_{d}"] = pc["."]
        params[f"is_fc_reg_{d}"] = pr["."]
        params[f"is_mask_conv_{d}"] = pm["."]

    # rotated detection (Oriented R-CNN with externalized finals)
    params["rd_neck"] = convert_fpn_neck(sd, "rotdetdecoder.neck.")
    params["rd_rpn"] = convert_rpn_head(sd, "rotdetdecoder.rpn_head.")
    params["rd_bbox_trunk"] = _shared2fc_trunk(
        sd, "rotdetdecoder.roi_head.bbox_head.")
    for d in range(3):
        pc, pr = {}, {}
        _dense(sd, f"rotdetroiboxhead_fc_cls{d + 1}", pc, ".")
        _dense(sd, f"rotdetroiboxhead_fc_reg{d + 1}", pr, ".")
        params[f"rd_fc_cls_{d}"] = pc["."]
        params[f"rd_fc_reg_{d}"] = pr["."]

    return {"params": params, "batch_stats": {"ss_trunk": trunk_s}}


def convert_full_checkpoint(path: str, task: str, cfg: BackboneConfig,
                            grid: Optional[Tuple[int, int]] = None) -> dict:
    """Released finetuned checkpoint → flax variables for the matching task
    model.  task: segmentation | classification | change_detection |
    detection_h | detection_r (the detection tasks auto-detect RetinaHead vs
    two-stage from the key inventory).

    The torch tree is `backbone.* + head/neck/rpn/roi keys` (mm convention);
    the flax tree nests under the module names used by models/*.py.
    """
    if task == "multitask":
        return convert_multitask_checkpoint(path, cfg, grid)
    sd = load_torch_checkpoint(path)
    bb_sd = _split_prefix(sd, "backbone.")
    if cfg.name.startswith("internimage"):
        from mtp_tpu.ckpt.torch_convert import (convert_internimage,
                                                to_stage_scan_layout)
        depths = (5, 5, 24, 5) if cfg.name.endswith("xl") else (4, 4, 18, 4)
        backbone = convert_internimage(bb_sd, depths)
        if cfg.scan:
            backbone = to_stage_scan_layout(backbone, depths)
    else:
        backbone = convert_backbone(bb_sd, cfg, grid)
        if cfg.scan:
            backbone = to_scan_layout(backbone, cfg.depth, cfg.interval)

    if task in ("detection_h", "detection_r"):
        if "bbox_head.retina_cls.weight" in sd:
            params = {"backbone": backbone,
                      "neck": convert_fpn_neck(sd, n_lateral=3, n_fpn=5),
                      **convert_retina_head(sd)}
            return {"params": params, "batch_stats": {}}
        trunk, fc_cls, fc_reg = convert_bbox_head(sd)
        params = {"backbone": backbone,
                  "neck": convert_fpn_neck(sd),
                  "rpn_head": convert_rpn_head(sd),
                  "bbox_trunk": trunk, "fc_cls": fc_cls, "fc_reg": fc_reg}
        return {"params": params, "batch_stats": {}}

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
