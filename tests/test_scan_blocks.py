"""Scanned block-group backbone: numerically identical to the unrolled one
(given restacked params), and layer-decay scales match per block."""

import pytest

pytestmark = pytest.mark.slow  # heavy e2e: full train-step compile

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from mtp_tpu.ckpt.torch_convert import from_scan_layout, to_scan_layout
from mtp_tpu.core.optim import layer_decay_scales
from mtp_tpu.models.vit_rvsa import ViTRVSA, init_backbone
from mtp_tpu.utils.config import BackboneConfig

CFG = BackboneConfig(img_size=56, patch_size=14, embed_dim=32, depth=4,
                     num_heads=2, interval=2, out_indices=(0, 1, 2, 3),
                     dtype="float32", drop_path_rate=0.0)
CFG_SCAN = dataclasses.replace(CFG, scan=True)


def test_scan_matches_unrolled():
    params = init_backbone(CFG, jax.random.PRNGKey(0))
    scan_params = to_scan_layout(params, CFG.depth, CFG.interval)

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 56, 56, 3))
    out_a = jax.jit(lambda p: ViTRVSA(CFG).apply({"params": p}, x))(params)
    out_b = jax.jit(lambda p: ViTRVSA(CFG_SCAN).apply({"params": p}, x))(scan_params)
    for a, b in zip(out_a, out_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5,
                                   rtol=1e-5)


def test_scan_layout_roundtrip():
    params = init_backbone(CFG, jax.random.PRNGKey(0))
    back = from_scan_layout(to_scan_layout(params, 4, 2), 4, 2)
    for (ka, va), (kb, vb) in zip(
            sorted(jax.tree_util.tree_flatten_with_path(params)[0],
                   key=lambda t: str(t[0])),
            sorted(jax.tree_util.tree_flatten_with_path(back)[0],
                   key=lambda t: str(t[0]))):
        assert str(ka) == str(kb)
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


def test_scan_init_structure_matches_restack():
    """Flax init of the scanned model produces the same tree structure as a
    restacked unrolled init."""
    scan_init = init_backbone(CFG_SCAN, jax.random.PRNGKey(0))
    restacked = to_scan_layout(init_backbone(CFG, jax.random.PRNGKey(0)), 4, 2)
    sa = {str(k): v.shape for k, v in
          jax.tree_util.tree_flatten_with_path(scan_init)[0]}
    sb = {str(k): np.asarray(v).shape for k, v in
          jax.tree_util.tree_flatten_with_path(restacked)[0]}
    assert sa == sb, set(sa) ^ set(sb)


def test_scan_layer_decay_scales():
    params = to_scan_layout(init_backbone(CFG, jax.random.PRNGKey(0)), 4, 2)
    scales = layer_decay_scales(params, depth=4, rate=0.5, scan_interval=2)
    # block i gets 0.5^(6 - (i+1) - 1) = 0.5^(4-i)
    rvsa0 = scales["block_groups"]["rvsa_0"]["attn"]["qkv"]["kernel"]
    full = scales["block_groups"]["full"]["attn"]["qkv"]["kernel"]
    np.testing.assert_allclose(np.asarray(rvsa0).ravel()[:2],
                               [0.5 ** 4, 0.5 ** 2])  # blocks 0 and 2
    np.testing.assert_allclose(np.asarray(full).ravel()[:2],
                               [0.5 ** 3, 0.5 ** 1])  # blocks 1 and 3
    assert scales["pos_embed"] == 0.5 ** 5


def test_internimage_stage_layout_roundtrip():
    from mtp_tpu.ckpt.torch_convert import (from_stage_scan_layout,
                                            to_stage_scan_layout)
    import dataclasses
    from mtp_tpu.models.internimage import InternImage, internimage_t

    cfg = dataclasses.replace(internimage_t(), channels=16,
                              depths=(2, 3, 2, 2), groups=(2, 4, 8, 16),
                              dtype="float32")
    m = InternImage(cfg)
    x = jnp.zeros((1, 32, 32, 3))
    p = jax.tree.map(np.asarray,
                     m.init(jax.random.PRNGKey(0), x)["params"])
    back = from_stage_scan_layout(to_stage_scan_layout(p, cfg.depths),
                                  cfg.depths)
    jax.tree.map(np.testing.assert_array_equal, p, back)


def test_internimage_scanned_layer_decay_scales():
    """Per-slice layer-decay scales of the scanned InternImage layout equal
    the unrolled per-layer scales (reference stage-cumulative ids)."""
    import dataclasses
    from mtp_tpu.ckpt.torch_convert import to_stage_scan_layout
    from mtp_tpu.core.optim import layer_decay_scales
    from mtp_tpu.models.backbones import internimage_layer_id
    from mtp_tpu.models.internimage import InternImage, internimage_t

    depths = (2, 2, 3, 2)
    cfg = dataclasses.replace(internimage_t(), channels=16, depths=depths,
                              groups=(2, 4, 8, 16), dtype="float32")
    m = InternImage(cfg)
    x = jnp.zeros((1, 32, 32, 3))
    p = jax.tree.map(np.asarray, m.init(jax.random.PRNGKey(0), x)["params"])
    depth = sum(depths)
    rate = 0.9
    lid = lambda s, n: internimage_layer_id(s, n, depths)
    flat_ref = layer_decay_scales(p, depth, rate, lid)
    ps = to_stage_scan_layout(p, depths)
    flat_scan = layer_decay_scales(ps, depth, rate, lid)
    # stage 2 (starts after 4 layers), slice 1 → layer id 6
    sc = np.asarray(flat_scan["stage2_layers"]["l"]["mlp"]["fc1"]["kernel"])
    ref0 = np.asarray(flat_ref["stage2_layer0"]["mlp"]["fc1"]["kernel"])
    ref1 = np.asarray(flat_ref["stage2_layer1"]["mlp"]["fc1"]["kernel"])
    assert sc.shape[0] == 3 and sc.ndim == 3
    np.testing.assert_allclose(sc[0].ravel()[0], ref0, rtol=1e-6)
    np.testing.assert_allclose(sc[1].ravel()[0], ref1, rtol=1e-6)
    # stem/downsample scales unchanged by the layout
    np.testing.assert_allclose(
        np.asarray(flat_scan["stem_conv1"]["kernel"]),
        np.asarray(flat_ref["stem_conv1"]["kernel"]))
