"""Parity of the Pallas one-hot DCNv3 path (`ops/dcnv3_pallas.py`) against
the jnp gather path (`dcnv3_core`, itself oracle-verified vs the reference
`dcnv3_core_pytorch` in test_dcnv3.py).  Runs the kernel in interpret mode
(CPU lane)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mtp_tpu.ops.dcnv3 import dcnv3_core
from mtp_tpu.ops.dcnv3_pallas import dcnv3_core_onehot


def _inputs(seed, N, H, W, G, gc, K, off_std=2.0, quarter=False):
    rng = np.random.default_rng(seed)
    C = G * gc
    x = rng.standard_normal((N, H, W, C)).astype(np.float32)
    off = (rng.standard_normal((N, H, W, G * K * K * 2)) * off_std
           ).astype(np.float32)
    if quarter:
        # snap sampling points to x.25/x.75: the jnp core rounds coordinates
        # through the reference's normalized representation, the kernel
        # computes pixel-space directly — within ~ULP(H) of an integer the
        # two can pick different hat subgradients (an O(1) dpy jump on a
        # measure-~H·eps set).  Quarter fractions keep every coordinate far
        # from the discontinuity.
        off = np.float32(np.round(off * 2) / 2 + 0.25)
    m = rng.uniform(0, 1, (N, H, W, G * K * K)).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(off), jnp.asarray(m)


@pytest.mark.parametrize("shape", [(2, 9, 11, 3, 4), (1, 8, 8, 2, 16)])
def test_forward_matches_core(shape):
    N, H, W, G, gc = shape
    x, off, m = _inputs(0, N, H, W, G, gc, 3)
    ref = dcnv3_core(x, off, m, kernel=3, group=G, offset_scale=1.5)
    out = dcnv3_core_onehot(x, off, m, kernel=3, group=G, offset_scale=1.5,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)


def test_forward_far_offsets_zero_padding():
    """Samples far outside the map must contribute exactly zero."""
    x, off, m = _inputs(1, 1, 8, 8, 2, 4, 3, off_std=20.0)
    ref = dcnv3_core(x, off, m, kernel=3, group=2)
    out = dcnv3_core_onehot(x, off, m, kernel=3, group=2, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)


def test_grads_match_core():
    x, off, m = _inputs(2, 1, 8, 10, 2, 4, 3)

    def loss(fn):
        return lambda x, o, m: jnp.sum(jnp.sin(fn(x, o, m)))

    f_ref = lambda x, o, m: dcnv3_core(x, o, m, kernel=3, group=2,
                                       offset_scale=1.5)
    f_our = lambda x, o, m: dcnv3_core_onehot(
        x, o, m, kernel=3, group=2, offset_scale=1.5, interpret=True)
    gr = jax.grad(loss(f_ref), argnums=(0, 1, 2))(x, off, m)
    go = jax.grad(loss(f_our), argnums=(0, 1, 2))(x, off, m)
    for name, a, b in zip(["dx", "doffset", "dmask"], gr, go):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4,
                                   rtol=1e-3, err_msg=name)


@pytest.mark.parametrize("off_std", [0.8, 30.0])
def test_chunked_path_matches_core(off_std):
    """48² map spans multiple 512-column chunks: small offsets activate only
    the chunks the tile touches, huge offsets activate (and must correctly
    sum) many — both must agree with the jnp path."""
    N, H, W, G, gc = 1, 48, 48, 1, 4
    x, off, m = _inputs(4, N, H, W, G, gc, 3, off_std=off_std, quarter=True)
    from mtp_tpu.ops import dcnv3_pallas
    assert dcnv3_pallas._chunk_cols(H * W) == 512
    ref = dcnv3_core(x, off, m, kernel=3, group=G, offset_scale=1.0)
    out = dcnv3_core_onehot(x, off, m, kernel=3, group=G, offset_scale=1.0,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)

    def loss(fn):
        return lambda x, o, m: jnp.sum(jnp.sin(fn(x, o, m)))

    gr = jax.grad(loss(lambda x, o, m: dcnv3_core(x, o, m, group=G)),
                  argnums=(0, 1, 2))(x, off, m)
    go = jax.grad(loss(lambda x, o, m: dcnv3_core_onehot(
        x, o, m, group=G, interpret=True)), argnums=(0, 1, 2))(x, off, m)
    for name, a, b in zip(["dx", "doffset", "dmask"], gr, go):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4,
                                   rtol=1e-3, err_msg=name)


def test_split_backward_large_map():
    """96² map crosses the fused-backward VMEM threshold → the split
    dimg/coord kernel pair must produce the same grads."""
    N, H, W, G, gc = 1, 96, 96, 1, 4
    x, off, m = _inputs(5, N, H, W, G, gc, 3, off_std=1.5, quarter=True)

    def loss(fn):
        return lambda x, o, m: jnp.sum(jnp.sin(fn(x, o, m)))

    gr = jax.grad(loss(lambda x, o, m: dcnv3_core(x, o, m, group=G)),
                  argnums=(0, 1, 2))(x, off, m)
    go = jax.grad(loss(lambda x, o, m: dcnv3_core_onehot(
        x, o, m, group=G, interpret=True)), argnums=(0, 1, 2))(x, off, m)
    for name, a, b in zip(["dx", "doffset", "dmask"], gr, go):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4,
                                   rtol=1e-3, err_msg=name)


def test_packed_tier_large_map():
    """144² map rides the lane-packed fori tier with a 144→192 width pad —
    packing, in-kernel unpack reshape, and the padded-column zero semantics
    must all match the jnp path fwd+grad."""
    from mtp_tpu.ops import dcnv3_pallas
    N, H, W, G, gc = 1, 144, 144, 1, 4
    CH, rpc, Wk, packed = dcnv3_pallas._plan(H * W, W)
    assert packed and Wk == 192
    x, off, m = _inputs(6, N, H, W, G, gc, 3, off_std=1.5, quarter=True)
    ref = dcnv3_core(x, off, m, kernel=3, group=G)
    out = dcnv3_core_onehot(x, off, m, kernel=3, group=G, interpret=True)
    # tolerance grows with H: the jnp core rounds coordinates through the
    # reference's normalized-[0,1] representation while the kernel computes
    # pixel-space directly — the two diverge by ~ULP(H) per coordinate,
    # which moves bilinear weights by ~1e-5·H
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=4e-4, rtol=1e-4)

    def loss(fn):
        return lambda x, o, m: jnp.sum(jnp.sin(fn(x, o, m)))

    gr = jax.grad(loss(lambda x, o, m: dcnv3_core(x, o, m, group=G)),
                  argnums=(0, 1, 2))(x, off, m)
    go = jax.grad(loss(lambda x, o, m: dcnv3_core_onehot(
        x, o, m, group=G, interpret=True)), argnums=(0, 1, 2))(x, off, m)
    for name, a, b in zip(["dx", "doffset", "dmask"], gr, go):
        # grad tolerance also carries the ~1e-5·H coordinate divergence
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-4,
                                   rtol=1e-3, err_msg=name)


def test_stride_two():
    x, off, m = _inputs(3, 1, 10, 10, 2, 4, 3)
    off = off[:, ::2, ::2]
    m = m[:, ::2, ::2]
    ref = dcnv3_core(x, off, m, kernel=3, stride=2, group=2)
    out = dcnv3_core_onehot(x, off, m, kernel=3, stride=2, group=2,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)


def test_bgpack_tier_matches_core():
    """BG=64 on an 8×8 map routes through the bg-packed tier (Gp=8,
    _bg_pack): forward and all four grads must match the jnp core."""
    from mtp_tpu.ops.dcnv3_pallas import _bg_pack

    N, H, W, G, gc = 4, 8, 8, 16, 8
    assert _bg_pack(N * G, H * W) == 8
    x, off, m = _inputs(3, N, H, W, G, gc, 3, quarter=True)

    ref_fn = lambda x, o, m: jnp.sum(
        dcnv3_core(x, o, m, kernel=3, group=G, offset_scale=1.2) ** 2)
    new_fn = lambda x, o, m: jnp.sum(
        dcnv3_core_onehot(x, o, m, kernel=3, group=G, offset_scale=1.2,
                          interpret=True) ** 2)
    ref, ref_g = jax.value_and_grad(ref_fn, argnums=(0, 1, 2))(x, off, m)
    new, new_g = jax.value_and_grad(new_fn, argnums=(0, 1, 2))(x, off, m)
    np.testing.assert_allclose(float(new), float(ref), rtol=2e-5)
    for a, b, name in zip(new_g, ref_g, ("dx", "doff", "dm")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=6e-5,
                                   rtol=2e-4, err_msg=name)


def test_bgpack_tier_multi_tile():
    """14² map (PT=2 row tiles per bg) through the packed layout."""
    from mtp_tpu.ops.dcnv3_pallas import _bg_pack

    N, H, W, G, gc = 2, 14, 14, 32, 4
    assert _bg_pack(N * G, H * W) == 8
    x, off, m = _inputs(4, N, H, W, G, gc, 3, quarter=True)
    ref = dcnv3_core(x, off, m, kernel=3, group=G)
    out = dcnv3_core_onehot(x, off, m, kernel=3, group=G, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=1e-5)
