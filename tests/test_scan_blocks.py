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
