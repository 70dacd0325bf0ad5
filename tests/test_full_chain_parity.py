"""Full-chain checkpoint parity: torch-layout state_dict → converter → flax
backbone forward == a torch-side oracle of the whole reference forward
(patch embed → pos embed → blocks → simple FPN).

This is the correctness anchor for loading the released MTP weights: if this
holds for random weights at these shapes, the converter + model reproduce the
reference computation for any checkpoint.
"""

import pytest

pytestmark = pytest.mark.slow  # heavy e2e: full train-step compile

import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from mtp_tpu.ckpt.torch_convert import convert_backbone, to_scan_layout
from mtp_tpu.models.vit_rvsa import ViTRVSA
from mtp_tpu.utils.config import BackboneConfig
from tests.test_rvsa_parity import full_attention_oracle, rvsa_oracle
from tests.test_torch_convert import fake_torch_sd

T = torch.from_numpy

CFG = BackboneConfig(img_size=28, patch_size=14, embed_dim=16, depth=2,
                     num_heads=2, interval=2, out_indices=(0, 1, 1, 1),
                     dtype="float32")


def _ln(x, w, b):
    return F.layer_norm(x, (x.shape[-1],), T(w), T(b), eps=1e-6).numpy()


def torch_backbone_oracle(x, sd, cfg):
    """Compose the verified per-module oracles into the full forward."""
    B = x.shape[0]
    d = cfg.embed_dim
    # patch embed (conv) + abs pos embed
    t = F.conv2d(T(x).permute(0, 3, 1, 2), T(sd["patch_embed.proj.weight"]),
                 T(sd["patch_embed.proj.bias"]), stride=cfg.patch_size)
    t = t.permute(0, 2, 3, 1).numpy()  # (B, Hp, Wp, D)
    g = t.shape[1]
    t = t + sd["pos_embed"].reshape(1, g, g, d)

    feats = {}
    for i in range(cfg.depth):
        p = f"blocks.{i}."
        full = (i + 1) % cfg.interval == 0
        h = _ln(T(t), sd[p + "norm1.weight"], sd[p + "norm1.bias"])
        attn_params = {
            "qkv": {"kernel": sd[p + "attn.qkv.weight"].T,
                    "bias": sd[p + "attn.qkv.bias"]},
            "proj": {"kernel": sd[p + "attn.proj.weight"].T,
                     "bias": sd[p + "attn.proj.bias"]},
        }
        if full:
            attn_params["rel_pos_h"] = sd[p + "attn.full_attn_rel_pos_h"]
            attn_params["rel_pos_w"] = sd[p + "attn.full_attn_rel_pos_w"]
            a = full_attention_oracle(h, attn_params, cfg.num_heads)
        else:
            attn_params["rel_pos_h"] = sd[p + "attn.rel_pos_h"]
            attn_params["rel_pos_w"] = sd[p + "attn.rel_pos_w"]
            attn_params["relative_position_bias_table"] = \
                sd[p + "attn.relative_position_bias_table"]
            for nm in ("sampling_offsets", "sampling_scales", "sampling_angles"):
                attn_params[nm] = {
                    "kernel": sd[p + f"attn.{nm}.2.weight"][:, :, 0, 0].T,
                    "bias": sd[p + f"attn.{nm}.2.bias"]}
            a = rvsa_oracle(h, attn_params, cfg.num_heads)
        t = t + a
        h = _ln(T(t), sd[p + "norm2.weight"], sd[p + "norm2.bias"])
        h = T(h) @ T(sd[p + "mlp.fc1.weight"].T) + T(sd[p + "mlp.fc1.bias"])
        h = F.gelu(h)
        h = h @ T(sd[p + "mlp.fc2.weight"].T) + T(sd[p + "mlp.fc2.bias"])
        t = t + h.numpy()
        feats[i] = t

    taps = [feats[i] for i in cfg.out_indices]

    def deconv(x, wk, bk):
        y = F.conv_transpose2d(T(x).permute(0, 3, 1, 2), T(sd[wk]),
                               T(sd[bk]), stride=2)
        return y.permute(0, 2, 3, 1).numpy()

    f1 = deconv(taps[0], "fpn1.0.weight", "fpn1.0.bias")
    f1 = _ln(T(f1), sd["fpn1.1.ln.weight"], sd["fpn1.1.ln.bias"])
    f1 = F.gelu(T(f1)).numpy()
    f1 = deconv(f1, "fpn1.3.weight", "fpn1.3.bias")
    f2 = deconv(taps[1], "fpn2.0.weight", "fpn2.0.bias")
    f3 = taps[2]
    f4 = F.max_pool2d(T(taps[3]).permute(0, 3, 1, 2), 2).permute(0, 2, 3, 1).numpy()
    return [f1, f2, f3, f4]


def test_converted_checkpoint_full_forward_parity():
    sd = fake_torch_sd(CFG, seed=7)
    params = convert_backbone(sd, CFG)
    x = np.random.default_rng(3).standard_normal((2, 28, 28, 3)).astype(np.float32)

    ours = jax.jit(lambda p: ViTRVSA(CFG).apply({"params": p}, jnp.asarray(x)))(params)
    ref = torch_backbone_oracle(x, sd, CFG)
    for a, b in zip(ours, ref):
        np.testing.assert_allclose(np.asarray(a), b, atol=5e-4, rtol=1e-3)


def test_converted_checkpoint_scan_layout_parity():
    import dataclasses
    sd = fake_torch_sd(CFG, seed=9)
    params = to_scan_layout(convert_backbone(sd, CFG), CFG.depth, CFG.interval)
    cfg_s = dataclasses.replace(CFG, scan=True)
    x = np.random.default_rng(4).standard_normal((1, 28, 28, 3)).astype(np.float32)
    ours = jax.jit(lambda p: ViTRVSA(cfg_s).apply({"params": p}, jnp.asarray(x)))(params)
    ref = torch_backbone_oracle(x, sd, CFG)
    for a, b in zip(ours, ref):
        np.testing.assert_allclose(np.asarray(a), b, atol=5e-4, rtol=1e-3)
