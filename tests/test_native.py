"""Native C++ host kernels: build, parity vs python fallbacks."""

import math

import numpy as np
import pytest

from mtp_tpu.utils.native import (get_lib, rbox_iou_native, rle_decode_native,
                                  rle_encode_native)


pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="g++ build unavailable")


def test_rle_roundtrip_native():
    rng = np.random.default_rng(0)
    mask = (rng.uniform(size=(33, 21)) > 0.5).astype(np.uint8)
    counts = rle_encode_native(mask)
    back = rle_decode_native(np.asarray(counts, np.int64), 33, 21)
    np.testing.assert_array_equal(back, mask)


def test_rle_matches_python_path():
    from mtp_tpu.data.parsers import mask_to_rle, rle_to_mask
    rng = np.random.default_rng(1)
    mask = (rng.uniform(size=(17, 19)) > 0.7).astype(np.uint8)
    # full pipeline (uses native under the hood) must round-trip
    np.testing.assert_array_equal(rle_to_mask(mask_to_rle(mask)), mask)


def test_rbox_iou_native_matches_jnp():
    import jax.numpy as jnp
    from mtp_tpu.ops.rotated_boxes import rbox_overlaps
    rng = np.random.default_rng(2)
    n, m = 8, 6
    a = np.stack([rng.uniform(20, 60, n), rng.uniform(20, 60, n),
                  rng.uniform(5, 25, n), rng.uniform(5, 15, n),
                  rng.uniform(-math.pi / 2, math.pi / 2, n)], -1).astype(np.float32)
    b = np.stack([rng.uniform(20, 60, m), rng.uniform(20, 60, m),
                  rng.uniform(5, 25, m), rng.uniform(5, 15, m),
                  rng.uniform(-math.pi / 2, math.pi / 2, m)], -1).astype(np.float32)
    native = rbox_iou_native(a, b)
    ref = np.asarray(rbox_overlaps(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(native, ref, atol=1e-4)


def test_rbox_iou_identity():
    a = np.asarray([[10, 10, 8, 4, 0.7]], np.float32)
    np.testing.assert_allclose(rbox_iou_native(a, a), [[1.0]], atol=1e-5)


def test_mask_iou_packed_matches_dense():
    """C++ packed-popcount mask IoU == dense matmul reference, incl. crowd
    union semantics and non-multiple-of-8 widths."""
    from mtp_tpu.utils.native import mask_iou_native
    rng = np.random.default_rng(1)
    D, G, H, W = 7, 5, 37, 53  # odd sizes exercise bit padding
    dt = (rng.uniform(size=(D, H, W)) < 0.4).astype(np.uint8)
    gt = (rng.uniform(size=(G, H, W)) < 0.4).astype(np.uint8)
    crowd = np.zeros(G, bool)
    crowd[2] = True
    res = mask_iou_native(dt, gt, crowd)
    if res is None:
        import pytest
        pytest.skip("native lib unavailable")
    ious, da, ga = res
    d = dt.reshape(D, -1).astype(np.float64)
    g = gt.reshape(G, -1).astype(np.float64)
    inter = d @ g.T
    ad, ag = d.sum(1), g.sum(1)
    union = np.where(crowd[None, :], ad[:, None],
                     ad[:, None] + ag[None, :] - inter)
    np.testing.assert_allclose(ious, inter / np.maximum(union, 1e-12),
                               atol=1e-12)
    np.testing.assert_allclose(da, ad)
    np.testing.assert_allclose(ga, ag)


def test_quad_iou_matches_jnp_kernel():
    from mtp_tpu.utils.native import quad_iou_native
    from mtp_tpu.eval.det_map import rbox_to_quad_np
    rng = np.random.default_rng(2)
    rb = np.stack([rng.uniform(20, 80, 12), rng.uniform(20, 80, 12),
                   rng.uniform(5, 30, 12), rng.uniform(5, 30, 12),
                   rng.uniform(-1.5, 1.5, 12)], -1).astype(np.float32)
    quads = rbox_to_quad_np(rb)
    res = quad_iou_native(quads[:7], quads[7:])
    if res is None:
        import pytest
        pytest.skip("native lib unavailable")
    import jax.numpy as jnp
    from mtp_tpu.ops.rotated_boxes import quad_overlaps
    ref = np.asarray(quad_overlaps(jnp.asarray(quads[:7]),
                                   jnp.asarray(quads[7:])))
    np.testing.assert_allclose(res, ref, atol=2e-4)
