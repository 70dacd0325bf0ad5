"""InternImage backbone tests: pyramid shapes, UperNet composition, grads."""

import pytest

pytestmark = pytest.mark.slow  # heavy e2e: full model forward+grad compiles

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from mtp_tpu.models.internimage import (InternImage, InternImageConfig,
                                        internimage_t, internimage_xl)

TINY = dataclasses.replace(internimage_t(), channels=16, depths=(2, 2, 2, 2),
                           groups=(2, 4, 8, 16), dtype="float32",
                           drop_path_rate=0.0)


def test_pyramid_shapes_and_channels():
    m = InternImage(TINY)
    x = jnp.zeros((2, 64, 64, 3))
    p = jax.jit(lambda r: m.init(r, x))(jax.random.PRNGKey(0))["params"]
    outs = jax.jit(lambda p, x: m.apply({"params": p}, x))(p, x)
    assert [o.shape for o in outs] == [
        (2, 16, 16, 16), (2, 8, 8, 32), (2, 4, 4, 64), (2, 2, 2, 128)]


def test_xl_config_matches_reference():
    cfg = internimage_xl()
    assert cfg.channels == 192
    assert cfg.depths == (5, 5, 24, 5)
    assert cfg.groups == (12, 24, 48, 96)
    assert cfg.post_norm and cfg.layer_scale == 1e-5 and cfg.offset_scale == 2.0


def test_with_upernet_and_grad():
    from mtp_tpu.heads.upernet import UperNetHead
    m = InternImage(TINY)
    head = UperNetHead(num_classes=3, channels=32, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))

    def fwd(pm, ph):
        feats = m.apply({"params": pm}, x)
        return head.apply(ph, feats, train=False)

    pm = jax.jit(lambda r: m.init(r, x))(jax.random.PRNGKey(0))["params"]
    feats = jax.jit(lambda p, x: m.apply({"params": p}, x))(pm, x)
    ph = head.init(jax.random.PRNGKey(2), feats, train=False)
    out = jax.jit(fwd)(pm, {"params": ph["params"],
                            "batch_stats": ph["batch_stats"]})
    assert out.shape == (1, 16, 16, 3)

    g = jax.jit(jax.grad(lambda p: jnp.sum(
        m.apply({"params": p}, x)[0] ** 2)))(pm)
    assert all(np.isfinite(np.asarray(t)).all() for t in jax.tree.leaves(g))
