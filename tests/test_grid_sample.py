"""Parity of mtp_tpu.ops.grid_sample vs torch.nn.functional.grid_sample.

Mirrors the reference's kernel test pattern (ops_dcnv3/test.py): the torch CPU
op is the semantic oracle for our TPU primitive.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from mtp_tpu.ops.grid_sample import grid_sample


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("padding", ["zeros", "border"])
def test_matches_torch(align, padding):
    rng = np.random.default_rng(0)
    N, H, W, C = 3, 9, 11, 5
    img = rng.standard_normal((N, H, W, C)).astype(np.float32)
    # include out-of-range coords to exercise padding
    grid = rng.uniform(-1.6, 1.6, (N, 6, 7, 2)).astype(np.float32)

    ours = grid_sample(jnp.asarray(img), jnp.asarray(grid),
                       align_corners=align, padding_mode=padding)

    theirs = F.grid_sample(
        torch.from_numpy(img).permute(0, 3, 1, 2),
        torch.from_numpy(grid),
        mode="bilinear", padding_mode=padding, align_corners=align,
    ).permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5, rtol=1e-5)


def test_grad_finite():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
    grid = jnp.asarray(rng.uniform(-1.2, 1.2, (2, 5, 5, 2)).astype(np.float32))

    def loss(im, g):
        return jnp.sum(grid_sample(im, g) ** 2)

    gi, gg = jax.grad(loss, argnums=(0, 1))(img, grid)
    assert np.isfinite(np.asarray(gi)).all()
    assert np.isfinite(np.asarray(gg)).all()


def test_grad_matches_torch():
    rng = np.random.default_rng(2)
    img = rng.standard_normal((1, 7, 7, 3)).astype(np.float32)
    grid = rng.uniform(-1.1, 1.1, (1, 4, 4, 2)).astype(np.float32)

    def loss(im, g):
        return jnp.sum(grid_sample(im, g) * jnp.arange(48).reshape(1, 4, 4, 3))

    gi, gg = jax.grad(loss, argnums=(0, 1))(jnp.asarray(img), jnp.asarray(grid))

    t_img = torch.from_numpy(img).permute(0, 3, 1, 2).requires_grad_(True)
    t_grid = torch.from_numpy(grid).requires_grad_(True)
    out = F.grid_sample(t_img, t_grid, mode="bilinear", padding_mode="zeros",
                        align_corners=True).permute(0, 2, 3, 1)
    (out * torch.arange(48.0).reshape(1, 4, 4, 3)).sum().backward()

    np.testing.assert_allclose(np.asarray(gi), t_img.grad.permute(0, 2, 3, 1).numpy(),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gg), t_grid.grad.numpy(), atol=1e-4, rtol=1e-4)


def test_pallas_tier_matches_gather(monkeypatch):
    """pallas=True (dcnv3_sample one-tap tier) matches the gather path in
    values and in img/grid gradients, including out-of-bounds coordinates
    under zeros padding (interpret mode on CPU)."""
    monkeypatch.setenv("MTP_PALLAS_INTERPRET", "1")
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.standard_normal((2, 9, 11, 5)), jnp.float32)
    grid = jnp.asarray(rng.uniform(-1.3, 1.3, (2, 6, 7, 2)), jnp.float32)

    for ac in (True, False):
        a = grid_sample(img, grid, align_corners=ac)
        b = grid_sample(img, grid, align_corners=ac, pallas=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5, err_msg=f"ac={ac}")

    def loss(fn):
        def f(im, g):
            out = fn(im, g)
            return jnp.sum(out * jnp.arange(out.size).reshape(out.shape))
        return f

    gi, gg = jax.grad(loss(grid_sample), argnums=(0, 1))(img, grid)
    pi, pg = jax.grad(loss(lambda im, g: grid_sample(im, g, pallas=True)),
                      argnums=(0, 1))(img, grid)
    np.testing.assert_allclose(np.asarray(gi), np.asarray(pi), atol=1e-3,
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gg), np.asarray(pg), atol=1e-2,
                               rtol=1e-3)
