"""Checkpoint converter tests: torch→flax layout maps, prefix surgery,
pos-embed interpolation, and end-to-end load into the flax backbone."""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from mtp_tpu.ckpt.torch_convert import (convert_backbone, convert_pos_embed,
                                        strip_prefixes, unwrap_checkpoint)
from mtp_tpu.models.vit_rvsa import ViTRVSA, init_backbone
from mtp_tpu.utils.config import BackboneConfig

CFG = BackboneConfig(img_size=28, patch_size=14, embed_dim=16, depth=2,
                     num_heads=2, interval=2, out_indices=(0, 1, 1, 1),
                     dtype="float32")
# interval=2: block0 RVSA, block1 full attention; grid 2x2


def fake_torch_sd(cfg: BackboneConfig, seed=0):
    """Fabricate a reference-schema state_dict with the torch layouts."""
    g = cfg.img_size // cfg.patch_size
    d, hd = cfg.embed_dim, cfg.embed_dim // cfg.num_heads
    rng = np.random.default_rng(seed)
    r = lambda *s: rng.standard_normal(s).astype(np.float32) * 0.1
    sd = {
        "patch_embed.proj.weight": r(d, 3, cfg.patch_size, cfg.patch_size),
        "patch_embed.proj.bias": r(d),
        "pos_embed": r(1, g * g, d),
        "fpn1.0.weight": r(d, d, 2, 2), "fpn1.0.bias": r(d),
        "fpn1.1.ln.weight": r(d), "fpn1.1.ln.bias": r(d),
        "fpn1.3.weight": r(d, d, 2, 2), "fpn1.3.bias": r(d),
        "fpn2.0.weight": r(d, d, 2, 2), "fpn2.0.bias": r(d),
        "norm.weight": r(d), "norm.bias": r(d),  # unused by forward
    }
    for i in range(cfg.depth):
        t = f"blocks.{i}."
        full = (i + 1) % cfg.interval == 0
        sd.update({
            t + "norm1.weight": r(d), t + "norm1.bias": r(d),
            t + "norm2.weight": r(d), t + "norm2.bias": r(d),
            t + "mlp.fc1.weight": r(4 * d, d), t + "mlp.fc1.bias": r(4 * d),
            t + "mlp.fc2.weight": r(d, 4 * d), t + "mlp.fc2.bias": r(d),
            t + "attn.qkv.weight": r(3 * d, d), t + "attn.qkv.bias": r(3 * d),
            t + "attn.proj.weight": r(d, d), t + "attn.proj.bias": r(d),
        })
        if full:
            sd[t + "attn.full_attn_rel_pos_h"] = r(2 * g - 1, hd)
            sd[t + "attn.full_attn_rel_pos_w"] = r(2 * g - 1, hd)
        else:
            sd[t + "attn.rel_pos_h"] = r(13, hd)
            sd[t + "attn.rel_pos_w"] = r(13, hd)
            sd[t + "attn.relative_position_bias_table"] = r(169, cfg.num_heads)
            for nm, o in (("sampling_offsets", 2), ("sampling_scales", 2),
                          ("sampling_angles", 1)):
                sd[t + f"attn.{nm}.2.weight"] = r(cfg.num_heads * o, d, 1, 1)
                sd[t + f"attn.{nm}.2.bias"] = r(cfg.num_heads * o)
    return sd


def test_prefix_surgery():
    # DDP-saved encoder-only checkpoint: module. then encoder. prefixes
    sd = {"module.encoder.patch_embed.proj.weight": np.zeros(1),
          "module.encoder.blocks.0.norm1.weight": np.zeros(1)}
    out = unwrap_checkpoint(sd)
    assert set(out) == {"patch_embed.proj.weight", "blocks.0.norm1.weight"}
    # reference rule: encoder filter applies only when the first sorted key
    # starts with 'encoder' — a mixed encoder/decoder dict stays untouched
    mixed = {"encoder.a": np.zeros(1), "decoder.b": np.zeros(1)}
    assert set(strip_prefixes(mixed)) == {"encoder.a", "decoder.b"}


def test_pos_embed_cls_and_resize():
    rng = np.random.default_rng(0)
    pe = rng.standard_normal((1, 50, 8)).astype(np.float32)  # 7x7 + cls
    out = convert_pos_embed(pe, (14, 14), has_cls_token=True)
    assert out.shape == (1, 14, 14, 8)
    # torch-reference check
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(pe[:, 1:].reshape(1, 7, 7, 8).transpose(0, 3, 1, 2)),
        size=(14, 14), mode="bicubic", align_corners=False)
    np.testing.assert_allclose(out.transpose(0, 3, 1, 2), ref.numpy(),
                               atol=1e-6)
    # no-op path
    same = convert_pos_embed(pe, (7, 7), has_cls_token=True)
    np.testing.assert_allclose(same.reshape(1, 49, 8), pe[:, 1:], atol=0)


def test_converted_tree_loads_and_layouts_match():
    sd = fake_torch_sd(CFG)
    params = convert_backbone(sd, CFG)

    # every leaf must match the flax-init structure exactly
    ref = init_backbone(CFG, jax.random.PRNGKey(0))
    ref_paths = {"/".join(str(getattr(p, "key", p)) for p in kp): l.shape
                 for kp, l in jax.tree_util.tree_flatten_with_path(ref)[0]}
    got_paths = {"/".join(str(getattr(p, "key", p)) for p in kp): l.shape
                 for kp, l in jax.tree_util.tree_flatten_with_path(params)[0]}
    assert ref_paths == got_paths, (
        set(ref_paths) ^ set(got_paths),
        {k: (ref_paths.get(k), got_paths.get(k))
         for k in ref_paths if ref_paths.get(k) != got_paths.get(k)})

    # patch-embed conv layout: flax apply == torch conv2d
    x = np.random.default_rng(1).standard_normal((1, 28, 28, 3)).astype(np.float32)
    model = ViTRVSA(CFG)
    feats = jax.jit(lambda p, x: model.apply({"params": p}, x))(params, jnp.asarray(x))
    assert [f.shape for f in feats] == [
        (1, 8, 8, 16), (1, 4, 4, 16), (1, 2, 2, 16), (1, 1, 1, 16)]

    conv_ref = torch.nn.functional.conv2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(sd["patch_embed.proj.weight"]),
        torch.from_numpy(sd["patch_embed.proj.bias"]), stride=14)
    from flax import linen as nn
    conv = nn.Conv(16, (14, 14), strides=(14, 14), padding="VALID")
    out = conv.apply({"params": {"kernel": params["patch_embed"]["kernel"],
                                 "bias": params["patch_embed"]["bias"]}},
                     jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               conv_ref.numpy(), atol=1e-4)


def test_deconv_layout_matches_torch():
    """flax ConvTranspose with converted kernel == torch ConvTranspose2d.
    The conversion flips the spatial dims (torch transposed conv correlates
    with the flipped kernel relative to lax.conv_transpose)."""
    from flax import linen as nn
    rng = np.random.default_rng(2)
    w = rng.standard_normal((6, 4, 2, 2)).astype(np.float32)  # (in, out, kh, kw)
    b = rng.standard_normal(4).astype(np.float32)
    x = rng.standard_normal((1, 5, 5, 6)).astype(np.float32)

    ref = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(w),
        torch.from_numpy(b), stride=2).numpy()

    kern = np.ascontiguousarray(w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1))
    deconv = nn.ConvTranspose(4, (2, 2), strides=(2, 2))
    out = deconv.apply({"params": {"kernel": kern, "bias": b}},
                       jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               atol=1e-4)
