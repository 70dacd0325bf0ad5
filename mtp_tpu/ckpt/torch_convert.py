"""PyTorch → JAX weight converter for the released MTP checkpoints.

Implements the same loading semantics as the reference loaders:
- prefix surgery `module.` / `encoder.`  (backbone/vit_win_rvsa_v3_wsz7.py:
  722-728 and scripts/change_ckpt.py),
- abs pos-embed: strip the MAE cls token and bicubically resize to the target
  grid (:744-768; cls-token presence rule from the finetune loader
  vit_rvsa_mtp.py:688-692),
- full-attention rel-pos tables bicubically resized on resolution change
  (finetune loader vit_rvsa_mtp.py:737-765).

Interpolations are done with torch.nn.functional.interpolate on host so the
numerics match the reference loaders bit-for-bit; the converted tree is plain
numpy and feeds straight into the flax modules.

Layout maps (torch → flax):
- Linear  weight (out, in)        → kernel (in, out)
- Conv2d  weight (out, in, kh, kw)→ kernel (kh, kw, in, out)
- ConvT2d weight (in, out, kh, kw)→ kernel (kh, kw, in, out)
- LayerNorm weight/bias           → scale/bias
- 1x1 Conv (sampling regressors)  → Dense kernel (in, out)
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import numpy as np

from mtp_tpu.utils.config import BackboneConfig


def _t(x):  # torch tensor → numpy
    return x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)


def strip_prefixes(sd: Dict[str, "np.ndarray"]) -> Dict[str, "np.ndarray"]:
    """`module.` then `encoder.` prefix surgery, as in the reference loaders
    and scripts/change_ckpt.py."""
    keys = sorted(sd.keys())
    if keys and keys[0].startswith("module."):
        sd = {k[len("module."):]: v for k, v in sd.items()}
        keys = sorted(sd.keys())
    # encoder-only artifacts (every key under encoder.) lose the prefix; a
    # FULL pretrain state_dict (encoder.* + semsegdecoder.* + ...) must keep
    # it — its first sorted key also starts with "encoder.", so the check
    # has to be all(), not keys[0]
    if keys and all(k.startswith("encoder.") for k in keys):
        sd = {k[len("encoder."):]: v for k, v in sd.items()}
    return sd


def unwrap_checkpoint(ckpt) -> Dict[str, "np.ndarray"]:
    """Accept {state_dict}/{model}/raw dicts (reference :715-720)."""
    if "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    elif "model" in ckpt:
        ckpt = ckpt["model"]
    return strip_prefixes(dict(ckpt))


def _interp_bicubic(arr: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Bicubic resize of a (1, C, h, w) array with torch semantics."""
    import torch
    import torch.nn.functional as F
    t = torch.from_numpy(np.ascontiguousarray(arr)).float()
    out = F.interpolate(t, size=size, mode="bicubic", align_corners=False)
    return out.numpy()


def convert_pos_embed(pe: np.ndarray, grid: Tuple[int, int],
                      has_cls_token: bool) -> np.ndarray:
    """(1, N(+1), D) torch pos_embed → (1, H, W, D) flax param."""
    pe = _t(pe)
    extra = 1 if has_cls_token else 0
    tokens = pe[:, extra:]
    d = tokens.shape[-1]
    orig = int(round(tokens.shape[1] ** 0.5))
    tokens = tokens.reshape(1, orig, orig, d)
    if (orig, orig) != tuple(grid):
        tokens = _interp_bicubic(tokens.transpose(0, 3, 1, 2), tuple(grid))
        tokens = tokens.transpose(0, 2, 3, 1)
    return tokens.astype(np.float32)


def convert_rel_pos_table(tbl: np.ndarray, new_len: int) -> np.ndarray:
    """(L, C) decomposed rel-pos table → (new_len, C), bicubic on both axes
    exactly like the finetune loader (it resizes head_dim too, a no-op when
    head_dim matches)."""
    tbl = _t(tbl)
    if tbl.shape[0] == new_len:
        return tbl.astype(np.float32)
    out = _interp_bicubic(tbl[None, None], (new_len, tbl.shape[1]))
    return out[0, 0].astype(np.float32)


def convert_backbone(state_dict: Dict[str, "np.ndarray"],
                     cfg: BackboneConfig,
                     grid: Optional[Tuple[int, int]] = None) -> dict:
    """torch RVSA backbone state_dict → flax param tree for `ViTRVSA`.

    grid: target token grid (Hp, Wp); defaults to img_size/patch_size.
    Ignores keys with no flax counterpart (`norm.*` — defined but unused in
    the reference forward)."""
    sd = {k: _t(v) for k, v in state_dict.items()}
    g = grid or (cfg.img_size // cfg.patch_size,) * 2
    p: dict = {}

    def put(path: str, val: np.ndarray):
        node = p
        parts = path.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = np.asarray(val, np.float32)

    # patch embed
    put("patch_embed/kernel", sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0))
    put("patch_embed/bias", sd["patch_embed.proj.bias"])

    if "pos_embed" in sd:
        put("pos_embed", convert_pos_embed(sd["pos_embed"], g,
                                           has_cls_token="cls_token" in sd))

    full_rel_len = {"h": 2 * g[0] - 1, "w": 2 * g[1] - 1}

    for i in range(cfg.depth):
        t = f"blocks.{i}."
        f = f"blocks_{i}/"
        full = ((i + 1) % cfg.interval == 0)

        put(f + "norm1/scale", sd[t + "norm1.weight"])
        put(f + "norm1/bias", sd[t + "norm1.bias"])
        put(f + "norm2/scale", sd[t + "norm2.weight"])
        put(f + "norm2/bias", sd[t + "norm2.bias"])
        put(f + "mlp/fc1/kernel", sd[t + "mlp.fc1.weight"].T)
        put(f + "mlp/fc1/bias", sd[t + "mlp.fc1.bias"])
        put(f + "mlp/fc2/kernel", sd[t + "mlp.fc2.weight"].T)
        put(f + "mlp/fc2/bias", sd[t + "mlp.fc2.bias"])
        if t + "gamma_1" in sd:
            put(f + "gamma_1", sd[t + "gamma_1"])
            put(f + "gamma_2", sd[t + "gamma_2"])

        a = t + "attn."
        fa = f + "attn/"
        put(fa + "qkv/kernel", sd[a + "qkv.weight"].T)
        if a + "qkv.bias" in sd:
            put(fa + "qkv/bias", sd[a + "qkv.bias"])
        put(fa + "proj/kernel", sd[a + "proj.weight"].T)
        put(fa + "proj/bias", sd[a + "proj.bias"])

        if full:
            put(fa + "rel_pos_h", convert_rel_pos_table(
                sd[a + "full_attn_rel_pos_h"], full_rel_len["h"]))
            put(fa + "rel_pos_w", convert_rel_pos_table(
                sd[a + "full_attn_rel_pos_w"], full_rel_len["w"]))
        else:
            put(fa + "rel_pos_h", sd[a + "rel_pos_h"])
            put(fa + "rel_pos_w", sd[a + "rel_pos_w"])
            put(fa + "relative_position_bias_table",
                sd[a + "relative_position_bias_table"])
            # sampling regressors: Sequential index 2 is the 1x1 conv
            for name in ("sampling_offsets", "sampling_scales", "sampling_angles"):
                w = sd[a + name + ".2.weight"]  # (out, in, 1, 1)
                put(fa + name + "/kernel", w[:, :, 0, 0].T)
                put(fa + name + "/bias", sd[a + name + ".2.bias"])

    # simple FPN.  torch ConvTranspose2d (in, out, kh, kw) → flax ConvTranspose
    # kernel (kh, kw, in, out) with the spatial dims FLIPPED: torch's
    # transposed conv correlates with the flipped kernel relative to
    # lax.conv_transpose (verified in tests/test_torch_convert.py).
    def deconv(src, dst):
        w = sd[src + ".weight"][:, :, ::-1, ::-1]
        put(dst + "/kernel", np.ascontiguousarray(w.transpose(2, 3, 0, 1)))
        put(dst + "/bias", sd[src + ".bias"])

    deconv("fpn1.0", "fpn/fpn1_deconv1")
    put("fpn/fpn1_norm/ln/scale", sd["fpn1.1.ln.weight"])
    put("fpn/fpn1_norm/ln/bias", sd["fpn1.1.ln.bias"])
    deconv("fpn1.3", "fpn/fpn1_deconv2")
    deconv("fpn2.0", "fpn/fpn2_deconv1")
    return p


def to_scan_layout(params: dict, depth: int, interval: int) -> dict:
    """Restack an unrolled param tree (blocks_i) into the scanned layout
    (block_groups/{rvsa_p, full}/... with a leading group axis)."""
    out = {k: v for k, v in params.items() if not k.startswith("blocks_")}
    G = depth // interval
    groups: dict = {}
    for pos in range(interval):
        name = "full" if pos == interval - 1 else f"rvsa_{pos}"
        per_g = [params[f"blocks_{g * interval + pos}"] for g in range(G)]
        groups[name] = jax.tree_util.tree_map(
            lambda *leaves: np.stack(leaves, axis=0), *per_g)
    out["block_groups"] = groups
    return out


def from_scan_layout(params: dict, depth: int, interval: int) -> dict:
    """Inverse of `to_scan_layout` (for exporting scanned checkpoints back
    to the unrolled naming, e.g. for torch-side consumers)."""
    out = {k: v for k, v in params.items() if k != "block_groups"}
    G = depth // interval
    for pos in range(interval):
        name = "full" if pos == interval - 1 else f"rvsa_{pos}"
        stacked = params["block_groups"][name]
        for g in range(G):
            out[f"blocks_{g * interval + pos}"] = jax.tree_util.tree_map(
                lambda leaf: np.asarray(leaf[g]), stacked)
    return out


def to_stage_scan_layout(params: dict, depths: Tuple[int, ...]) -> dict:
    """Restack an unrolled InternImage tree (stage{s}_layer{i}) into the
    scanned layout (stage{s}_layers/l/... with a leading layer axis)."""
    out = {k: v for k, v in params.items()
           if not (k.startswith("stage") and "_layer" in k
                   and not k.endswith("_layers"))}
    for s, depth in enumerate(depths):
        per_l = [params[f"stage{s}_layer{i}"] for i in range(depth)]
        out[f"stage{s}_layers"] = {"l": jax.tree_util.tree_map(
            lambda *leaves: np.stack(leaves, axis=0), *per_l)}
    return out


def from_stage_scan_layout(params: dict, depths: Tuple[int, ...]) -> dict:
    """Inverse of `to_stage_scan_layout`."""
    out = {k: v for k, v in params.items() if not k.endswith("_layers")}
    for s, depth in enumerate(depths):
        stacked = params[f"stage{s}_layers"]["l"]
        for i in range(depth):
            out[f"stage{s}_layer{i}"] = jax.tree_util.tree_map(
                lambda leaf: np.asarray(leaf[i]), stacked)
    return out


def load_torch_checkpoint(path: str) -> Dict[str, "np.ndarray"]:
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return unwrap_checkpoint(ckpt)


def convert_internimage(state_dict: Dict[str, "np.ndarray"],
                        depths: Tuple[int, ...]) -> dict:
    """Reference InternImage state_dict → flax param tree
    (models/internimage.py naming).  Key families (intern_image.py):
    patch_embed.conv{1,2}/norm{1,2}, levels.{s}.blocks.{i}.{gamma1,gamma2,
    norm1.0,norm2.0,dcn.*,mlp.*}, levels.{s}.norm.0 (pre-norm variants),
    levels.{s}.downsample.{conv,norm.1}."""
    sd = strip_prefixes(state_dict)
    params: dict = {}

    def put(path: str, val: np.ndarray):
        node = params
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(val)

    def conv(src: str, dst: str):
        put(dst + "/kernel", sd[src + ".weight"].transpose(2, 3, 1, 0))
        if src + ".bias" in sd:
            put(dst + "/bias", sd[src + ".bias"])

    def dense(src: str, dst: str):
        put(dst + "/kernel", sd[src + ".weight"].T)
        if src + ".bias" in sd:
            put(dst + "/bias", sd[src + ".bias"])

    def norm(src: str, dst: str):
        put(dst + "/scale", sd[src + ".weight"])
        put(dst + "/bias", sd[src + ".bias"])

    conv("patch_embed.conv1", "stem_conv1")
    norm("patch_embed.norm1.1", "stem_norm1")
    conv("patch_embed.conv2", "stem_conv2")
    norm("patch_embed.norm2.1", "stem_norm2")

    for s, depth in enumerate(depths):
        for i in range(depth):
            src = f"levels.{s}.blocks.{i}"
            dst = f"stage{s}_layer{i}"
            for g in ("gamma1", "gamma2"):
                if f"{src}.{g}" in sd:
                    put(f"{dst}/{g}", sd[f"{src}.{g}"])
            norm(f"{src}.norm1.0", f"{dst}/norm1")
            norm(f"{src}.norm2.0", f"{dst}/norm2")
            conv(f"{src}.dcn.dw_conv.0", f"{dst}/dcn/dw_conv")
            norm(f"{src}.dcn.dw_conv.1.1", f"{dst}/dcn/dw_norm")
            for lin in ("offset", "mask", "input_proj", "output_proj"):
                dense(f"{src}.dcn.{lin}", f"{dst}/dcn/{lin}")
            dense(f"{src}.mlp.fc1", f"{dst}/mlp/fc1")
            dense(f"{src}.mlp.fc2", f"{dst}/mlp/fc2")
        if f"levels.{s}.norm.0.weight" in sd:  # pre-norm variants
            norm(f"levels.{s}.norm.0", f"stage{s}_norm")
        if f"levels.{s}.downsample.conv.weight" in sd:
            conv(f"levels.{s}.downsample.conv", f"down{s}_conv")
            norm(f"levels.{s}.downsample.norm.1", f"down{s}_norm")
    return params


def convert_backbone_checkpoint(path: str, cfg: BackboneConfig,
                                grid: Optional[Tuple[int, int]] = None) -> dict:
    if cfg.name.startswith("internimage"):
        depths = (5, 5, 24, 5) if cfg.name.endswith("xl") else (4, 4, 18, 4)
        p = convert_internimage(load_torch_checkpoint(path), depths)
        return to_stage_scan_layout(p, depths) if cfg.scan else p
    p = convert_backbone(load_torch_checkpoint(path), cfg, grid)
    return to_scan_layout(p, cfg.depth, cfg.interval) if cfg.scan else p
