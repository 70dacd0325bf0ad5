"""Rotated-geometry tests: IoU vs shapely-free analytic cases, coder
roundtrips, conversions."""

import math

import numpy as np
import jax
import jax.numpy as jnp

from mtp_tpu.ops.rotated_boxes import (delta_decode_rbox, delta_encode_rbox,
                                       hbox_to_rbox, midpoint_decode,
                                       midpoint_encode, norm_angle_le90,
                                       qbox_to_rbox, rbox2hbox_overlaps,
                                       rbox_overlaps, rbox_to_corners,
                                       rbox_to_hbox, regularize_le90)

PI = math.pi


def test_corners_axis_aligned():
    r = jnp.asarray([[10., 10., 8., 4., 0.]])
    c = np.asarray(rbox_to_corners(r))[0]
    assert set(map(tuple, c.round(5))) == {(6., 8.), (14., 8.), (14., 12.), (6., 12.)}


def test_corners_rotated_90():
    r = jnp.asarray([[0., 0., 8., 4., PI / 2]])
    hb = np.asarray(rbox_to_hbox(r))[0]
    np.testing.assert_allclose(hb, [-2, -4, 2, 4], atol=1e-5)


def test_iou_identical_and_disjoint():
    a = jnp.asarray([[10., 10., 8., 4., 0.3], [50., 50., 8., 4., -0.7]])
    iou = np.asarray(rbox_overlaps(a, a))
    np.testing.assert_allclose(np.diag(iou), 1.0, atol=1e-4)
    assert iou[0, 1] < 1e-6


def test_iou_analytic_cross():
    """Two 8x2 boxes crossing at 90° through the same center:
    inter = 2x2 = 4, union = 16+16-4 = 28."""
    a = jnp.asarray([[0., 0., 8., 2., 0.]])
    b = jnp.asarray([[0., 0., 8., 2., PI / 2]])
    iou = float(rbox_overlaps(a, b)[0, 0])
    np.testing.assert_allclose(iou, 4.0 / 28.0, atol=1e-5)


def test_iou_45deg_squares():
    """Unit square vs itself rotated 45°: intersection is a regular octagon
    with area 2*(sqrt(2)-1) ≈ 0.8284; union = 2 - inter."""
    a = jnp.asarray([[0., 0., 1., 1., 0.]])
    b = jnp.asarray([[0., 0., 1., 1., PI / 4]])
    inter = 2 * (math.sqrt(2) - 1)
    expect = inter / (2 - inter)
    np.testing.assert_allclose(float(rbox_overlaps(a, b)[0, 0]), expect,
                               atol=1e-4)


def test_iou_matches_hbox_case():
    """At theta=0 rotated IoU equals horizontal IoU."""
    rng = np.random.default_rng(0)
    xy = rng.uniform(20, 60, (12, 2)).astype(np.float32)
    wh = rng.uniform(5, 25, (12, 2)).astype(np.float32)
    hb = np.concatenate([xy - wh / 2, xy + wh / 2], -1)
    rb = np.concatenate([xy, wh, np.zeros((12, 1), np.float32)], -1)
    from mtp_tpu.ops.boxes import bbox_overlaps
    got = np.asarray(rbox_overlaps(jnp.asarray(rb), jnp.asarray(rb)))
    ref = np.asarray(bbox_overlaps(jnp.asarray(hb), jnp.asarray(hb)))
    np.testing.assert_allclose(got, ref, atol=1e-3)


def test_rbox2hbox_overlaps():
    r = jnp.asarray([[10., 10., 8., 4., PI / 2]])  # hbb = 8x4 rotated → 4x8
    h = jnp.asarray([[8., 6., 12., 14.]])          # exactly the hbb
    np.testing.assert_allclose(np.asarray(rbox2hbox_overlaps(r, h)), 1.0,
                               atol=1e-5)


def test_regularize_le90():
    r = jnp.asarray([[0., 0., 2., 8., 0.2]])
    out = np.asarray(regularize_le90(r))[0]
    assert out[2] >= out[3]
    np.testing.assert_allclose(out[2:4], [8, 2], atol=1e-6)
    np.testing.assert_allclose(out[4], norm_angle_le90(jnp.asarray(0.2 + PI / 2)),
                               atol=1e-6)


def test_delta_rbox_roundtrip():
    rng = np.random.default_rng(1)
    n = 32
    props = np.stack([rng.uniform(20, 80, n), rng.uniform(20, 80, n),
                      rng.uniform(8, 30, n), rng.uniform(4, 8, n),
                      rng.uniform(-PI / 2, PI / 2, n)], -1).astype(np.float32)
    gts = np.stack([rng.uniform(20, 80, n), rng.uniform(20, 80, n),
                    rng.uniform(8, 30, n), rng.uniform(4, 8, n),
                    rng.uniform(-PI / 2 + 1e-3, PI / 2 - 1e-3, n)], -1).astype(np.float32)
    gts = np.asarray(regularize_le90(jnp.asarray(gts)))
    d = delta_encode_rbox(jnp.asarray(props), jnp.asarray(gts))
    back = np.asarray(delta_decode_rbox(jnp.asarray(props), d))
    # roundtrip reproduces the gt box geometry (corners match even if the
    # (w,h,theta) parameterization was edge-swapped)
    cb = np.asarray(rbox_to_corners(jnp.asarray(back)))
    cg = np.asarray(rbox_to_corners(jnp.asarray(gts)))
    # compare as unordered point sets per box
    for i in range(n):
        got = sorted(map(tuple, cb[i].round(2)))
        exp = sorted(map(tuple, cg[i].round(2)))
        np.testing.assert_allclose(got, exp, atol=0.15)


def test_midpoint_roundtrip():
    rng = np.random.default_rng(2)
    n = 24
    anchors_xy = rng.uniform(30, 70, (n, 2))
    anchors_wh = rng.uniform(10, 40, (n, 2))
    anchors = np.concatenate([anchors_xy - anchors_wh / 2,
                              anchors_xy + anchors_wh / 2], -1).astype(np.float32)
    gts = np.stack([rng.uniform(30, 70, n), rng.uniform(30, 70, n),
                    rng.uniform(10, 30, n), rng.uniform(5, 10, n),
                    rng.uniform(-PI / 2 + 0.05, PI / 2 - 0.05, n)], -1).astype(np.float32)
    gts = np.asarray(regularize_le90(jnp.asarray(gts)))

    d = midpoint_encode(jnp.asarray(anchors), jnp.asarray(gts))
    back = np.asarray(midpoint_decode(jnp.asarray(anchors), d))
    # the decoded rbox has the same hbb and the same midpoint offsets —
    # i.e. IoU with the original gt should be high (exact when the gt is a
    # rectangle, which it is)
    iou = np.asarray(rbox_overlaps(jnp.asarray(back), jnp.asarray(gts)))
    np.testing.assert_array_less(0.98, np.diag(iou))


def test_qbox_to_rbox():
    # an axis-aligned rectangle as a quad
    quad = jnp.asarray([[2., 2., 10., 2., 10., 6., 2., 6.]])
    r = np.asarray(qbox_to_rbox(quad))[0]
    np.testing.assert_allclose(r[:4], [6, 4, 8, 4], atol=1e-4)
    # rotated square quad
    s = math.sqrt(2)
    quad2 = jnp.asarray([[0., -s, s, 0., 0., s, -s, 0.]])  # 2x2 square at 45°
    r2 = np.asarray(qbox_to_rbox(quad2))[0]
    np.testing.assert_allclose(r2[2] * r2[3], 4.0, atol=1e-3)


def test_hbox_to_rbox():
    h = jnp.asarray([[0., 0., 4., 10.]])
    r = np.asarray(hbox_to_rbox(h))[0]
    np.testing.assert_allclose(r[:4], [2, 5, 10, 4], atol=1e-6)  # long edge first


def test_quad_overlaps():
    """Convex-quad IoU (box_iou_quadri semantics): axis-aligned squares as
    quads reproduce hbox IoU; rotated quad matches rbox_overlaps."""
    import jax.numpy as jnp
    import numpy as np
    from mtp_tpu.ops.rotated_boxes import quad_overlaps, rbox_overlaps, rbox_to_corners

    a = jnp.asarray([[0., 0., 4., 0., 4., 4., 0., 4.]])
    b = jnp.asarray([[2., 0., 6., 0., 6., 4., 2., 4.]])
    iou = np.asarray(quad_overlaps(a, b))[0, 0]
    np.testing.assert_allclose(iou, 8.0 / 24.0, atol=1e-5)

    rb = jnp.asarray([[10., 10., 6., 4., 0.5], [11., 9., 5., 3., -0.3]])
    quads = rbox_to_corners(rb).reshape(-1, 8)
    got = np.asarray(quad_overlaps(quads, quads))
    want = np.asarray(rbox_overlaps(rb, rb))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_merge_qbox():
    """qbox patch merge: quads translate by (x,y) on all corners and
    duplicates collapse under quad NMS (reference nms_quadri branch)."""
    import numpy as np
    from mtp_tpu.eval.det_map import merge_dota_patches

    q = np.asarray([[10., 10., 30., 10., 30., 20., 10., 20.]], np.float32)
    per_patch = {
        "P1__1__0___0": {"det_boxes": q, "det_scores": np.asarray([0.9], np.float32),
                         "det_labels": np.asarray([0])},
        "P1__1__512___0": {"det_boxes": q - np.asarray([512., 0.] * 4, np.float32),
                           "det_scores": np.asarray([0.8], np.float32),
                           "det_labels": np.asarray([0])},
    }
    m = merge_dota_patches(per_patch, 1, box_type="qbox")
    assert set(m) == {"P1"} and len(m["P1"]["det_boxes"]) == 1
    np.testing.assert_allclose(m["P1"]["det_boxes"][0], q[0], atol=1e-4)
