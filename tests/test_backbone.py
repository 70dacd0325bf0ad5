"""Backbone-level checks: pyramid shapes, init rescaling, remat equivalence."""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mtp_tpu.utils.config import BackboneConfig
from mtp_tpu.models.vit_rvsa import ViTRVSA, init_backbone

TINY = BackboneConfig(img_size=64, embed_dim=32, depth=4, num_heads=2,
                      interval=3, out_indices=(0, 1, 2, 3), dtype="float32",
                      drop_path_rate=0.0)


def test_pyramid_shapes():
    params = init_backbone(TINY, jax.random.PRNGKey(0))
    model = ViTRVSA(TINY)
    x = jnp.zeros((2, 64, 64, 3))
    feats = jax.jit(lambda p, x: model.apply({"params": p}, x))(params, x)
    # strides 4, 8, 16, 32
    assert [f.shape for f in feats] == [
        (2, 16, 16, 32), (2, 8, 8, 32), (2, 4, 4, 32), (2, 2, 2, 32)]


def test_features_only():
    params = init_backbone(TINY, jax.random.PRNGKey(0))
    model = ViTRVSA(TINY)
    x = jnp.zeros((1, 64, 64, 3))
    feats = jax.jit(lambda p, x: model.apply(
        {"params": p}, x, features_only=True))(params, x)
    assert all(f.shape == (1, 4, 4, 32) for f in feats)


def test_init_rescale():
    """fix_init_weight semantics: proj/fc2 kernels divided by sqrt(2(l+1))."""
    model = ViTRVSA(TINY)
    raw = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    fixed = init_backbone(TINY, jax.random.PRNGKey(0))
    for i in range(TINY.depth):
        r = 1.0 / math.sqrt(2.0 * (i + 1))
        np.testing.assert_allclose(
            np.asarray(fixed[f"blocks_{i}"]["mlp"]["fc2"]["kernel"]),
            np.asarray(raw[f"blocks_{i}"]["mlp"]["fc2"]["kernel"]) * r,
            rtol=1e-6)


def test_remat_matches():
    params = init_backbone(TINY, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    import dataclasses
    cfg_r = dataclasses.replace(TINY, remat=True)
    out_a = jax.jit(lambda p: ViTRVSA(TINY).apply({"params": p}, x))(params)
    out_b = jax.jit(lambda p: ViTRVSA(cfg_r).apply({"params": p}, x))(params)
    for a, b in zip(out_a, out_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_backbone_flops_estimator():
    """Analytic FLOPs (reference flops() analog): ViT-B/224 lands at the
    published ~17.6 GFLOP; quadratic term makes 384 > 2.9x the 224 count
    for ViT-L."""
    from mtp_tpu.models.vit_rvsa import backbone_flops
    from mtp_tpu.utils.config import vit_b_rvsa, vit_l_rvsa
    b224 = backbone_flops(vit_b_rvsa(224), (224, 224))
    assert 16e9 < b224 < 20e9
    l224 = backbone_flops(vit_l_rvsa(224), (224, 224))
    l384 = backbone_flops(vit_l_rvsa(384), (384, 384))
    assert l384 / l224 > 2.9
