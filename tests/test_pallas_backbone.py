"""Backbone with pallas_attn=True matches the jnp path (interpret mode is
forced on CPU via the pltpu helper)."""

import pytest

pytestmark = pytest.mark.slow  # heavy e2e: full train-step compile

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from mtp_tpu.models.vit_rvsa import ViTRVSA, init_backbone
from mtp_tpu.utils.config import BackboneConfig

CFG = BackboneConfig(img_size=56, patch_size=14, embed_dim=32, depth=2,
                     num_heads=2, interval=2, out_indices=(0, 1, 1, 1),
                     dtype="float32", drop_path_rate=0.0)


def test_pallas_backbone_matches():
    params = init_backbone(CFG, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 56, 56, 3))
    ref = jax.jit(lambda p: ViTRVSA(CFG).apply({"params": p}, x))(params)
    cfg_p = dataclasses.replace(CFG, pallas_attn=True)
    with pltpu.force_tpu_interpret_mode():
        got = jax.jit(lambda p: ViTRVSA(cfg_p).apply({"params": p}, x))(params)
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5,
                                   rtol=1e-4)


def test_pallas_backbone_flash_path_matches():
    """Grid above 1024 tokens (34×34): the full-attention block takes the
    q-blocked flash kernel; outputs must match the jnp path."""
    cfg = BackboneConfig(img_size=272, patch_size=8, embed_dim=32, depth=2,
                         num_heads=2, interval=2, out_indices=(0, 1, 1, 1),
                         dtype="float32", drop_path_rate=0.0)
    params = init_backbone(cfg, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 272, 272, 3))
    ref = jax.jit(lambda p: ViTRVSA(cfg).apply({"params": p}, x))(params)
    cfg_p = dataclasses.replace(cfg, pallas_attn=True)
    with pltpu.force_tpu_interpret_mode():
        got = jax.jit(lambda p: ViTRVSA(cfg_p).apply({"params": p}, x))(params)
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5,
                                   rtol=1e-4)
