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


def test_scan_matches_unrolled():
    """Scanned stages (restacked params) produce the unrolled outputs."""
    from mtp_tpu.ckpt.torch_convert import to_stage_scan_layout
    m = InternImage(TINY)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 32, 32, 3))
    p = jax.jit(lambda r: m.init(r, x))(jax.random.PRNGKey(0))["params"]
    ref = jax.jit(lambda p, x: m.apply({"params": p}, x))(p, x)

    cfg_s = dataclasses.replace(TINY, scan=True)
    ms = InternImage(cfg_s)
    ps = to_stage_scan_layout(jax.tree.map(np.asarray, p), TINY.depths)
    got = jax.jit(lambda p, x: ms.apply({"params": p}, x))(ps, x)
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5,
                                   rtol=1e-4)


def test_remat_matches_and_grads():
    """remat=True (the reference's with_cp analog) is numerically identical
    and differentiable, in both unrolled and scanned layouts."""
    from mtp_tpu.ckpt.torch_convert import to_stage_scan_layout
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 32, 32, 3))
    m = InternImage(TINY)
    p = jax.jit(lambda r: m.init(r, x))(jax.random.PRNGKey(0))["params"]

    def loss(mod, pp):
        return sum(jnp.sum(o.astype(jnp.float32) ** 2)
                   for o in mod.apply({"params": pp}, x))

    ref = float(jax.jit(lambda pp: loss(m, pp))(p))
    for cfg in (dataclasses.replace(TINY, remat=True),
                dataclasses.replace(TINY, remat=True, scan=True)):
        mod = InternImage(cfg)
        pp = (to_stage_scan_layout(jax.tree.map(np.asarray, p), TINY.depths)
              if cfg.scan else p)
        l, g = jax.jit(jax.value_and_grad(lambda pp: loss(mod, pp)))(pp)
        assert abs(float(l) - ref) / abs(ref) < 1e-5
        gn = float(sum(jnp.sum(t ** 2) for t in jax.tree.leaves(g)))
        assert np.isfinite(gn) and gn > 0


def test_scan_train_mode_drop_path():
    """Scanned + stochastic depth: train-mode apply runs with dropout rng and
    differs from eval (drop path active), stays finite."""
    cfg = dataclasses.replace(TINY, scan=True, drop_path_rate=0.2)
    m = InternImage(cfg)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 32, 32, 3))
    p = jax.jit(lambda r: m.init(r, x))(jax.random.PRNGKey(0))["params"]
    ev = jax.jit(lambda p, x: m.apply({"params": p}, x))(p, x)
    tr = jax.jit(lambda p, x, r: m.apply({"params": p}, x, False,
                                         rngs={"dropout": r}))(
        p, x, jax.random.PRNGKey(6))
    assert all(np.isfinite(np.asarray(t, np.float32)).all() for t in tr)
    assert not np.allclose(np.asarray(ev[0]), np.asarray(tr[0]))
