"""Detection op tests: IoU/coder vs naive numpy, NMS vs a greedy reference,
anchors vs hand-computed values, assigner/sampler invariants, RoIAlign
numerics."""

import numpy as np
import jax
import jax.numpy as jnp

from mtp_tpu.ops.boxes import bbox_overlaps, delta_decode, delta_encode
from mtp_tpu.ops.anchors import AnchorGenerator, base_anchors
from mtp_tpu.ops.nms import NEG_INF, batched_nms, nms
from mtp_tpu.ops.assign import max_iou_assign, random_sample
from mtp_tpu.ops.roi_align import map_roi_levels, roi_align, roi_align_rotated


def np_iou(a, b):
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    aa = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    ab = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / np.maximum(aa[:, None] + ab[None] - inter, 1e-6)


def rand_boxes(rng, n, size=100):
    xy = rng.uniform(0, size, (n, 2))
    wh = rng.uniform(5, 40, (n, 2))
    return np.concatenate([xy, xy + wh], -1).astype(np.float32)


def test_iou_matches_numpy():
    rng = np.random.default_rng(0)
    a, b = rand_boxes(rng, 12), rand_boxes(rng, 7)
    got = np.asarray(bbox_overlaps(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, np_iou(a, b), atol=1e-5)


def test_delta_coder_roundtrip():
    rng = np.random.default_rng(1)
    props = rand_boxes(rng, 20)
    gts = rand_boxes(rng, 20)
    stds = (0.1, 0.1, 0.2, 0.2)
    d = delta_encode(jnp.asarray(props), jnp.asarray(gts), stds=stds)
    back = delta_decode(jnp.asarray(props), d, stds=stds)
    np.testing.assert_allclose(np.asarray(back), gts, atol=1e-3)


def test_delta_decode_clamps():
    rois = jnp.asarray([[0., 0., 10., 10.]])
    deltas = jnp.asarray([[0., 0., 99., 99.]])  # extreme growth clipped
    out = np.asarray(delta_decode(rois, deltas))
    assert np.isfinite(out).all()
    # dw clipped at |log(16/1000)| = 4.135 → growth factor ≤ 62.5
    assert (out[0, 2] - out[0, 0]) <= 10 * 62.6


def test_base_anchors_mmdet_values():
    # stride 4, scale 8, ratios 0.5/1/2 → areas = (4*8)² with aspect ratios
    b = base_anchors(4, [8], [0.5, 1.0, 2.0])
    w = b[:, 2] - b[:, 0]
    h = b[:, 3] - b[:, 1]
    np.testing.assert_allclose(w * h, [32 * 32] * 3, rtol=1e-5)
    np.testing.assert_allclose(h / w, [0.5, 1.0, 2.0], rtol=1e-5)
    # centered at origin (center_offset 0)
    np.testing.assert_allclose(b[:, 0] + b[:, 2], 0, atol=1e-5)


def test_grid_anchor_layout():
    gen = AnchorGenerator(strides=(8,), scales=(8,), ratios=(1.0,))
    a = gen.grid([(2, 3)])[0]
    assert a.shape == (6, 4)
    # location-major: second anchor shifted by stride in x
    np.testing.assert_allclose(a[1] - a[0], [8, 0, 8, 0])
    np.testing.assert_allclose(a[3] - a[0], [0, 8, 0, 8])


def greedy_nms_ref(boxes, scores, thr):
    order = np.argsort(-scores)
    keep = []
    sup = np.zeros(len(boxes), bool)
    for i in order:
        if scores[i] <= NEG_INF / 2 or sup[i]:
            continue
        keep.append(i)
        ious = np_iou(boxes[i:i + 1], boxes)[0]
        sup |= ious > thr
        sup[i] = True  # self-overlap, but already kept
    return keep


def test_nms_matches_greedy():
    rng = np.random.default_rng(2)
    boxes = rand_boxes(rng, 64, 60)
    scores = rng.uniform(0, 1, 64).astype(np.float32)
    scores[50:] = NEG_INF  # padding
    idx, s = jax.jit(nms, static_argnums=(2, 3))(
        jnp.asarray(boxes), jnp.asarray(scores), 0.5, 20)
    got = [int(i) for i, sc in zip(np.asarray(idx), np.asarray(s))
           if sc > NEG_INF / 2]
    assert got == greedy_nms_ref(boxes, scores, 0.5)[:20]  # capped at max_out


def test_nms_batched_lanes_match_single():
    """B>1 routes through lax.map over the single-lane kernel (the
    ride-along-batch form hit a flat ~234 ms wall on chip for any B ≥ 2);
    every lane must equal the standalone B=1 result exactly."""
    from mtp_tpu.ops.nms import nms_batched
    rng = np.random.default_rng(3)
    B, N = 3, 96
    boxes = np.stack([rand_boxes(rng, N, 60) for _ in range(B)])
    scores = rng.uniform(0, 1, (B, N)).astype(np.float32)
    scores[:, 80:] = NEG_INF  # padding
    bi, bs_ = jax.jit(nms_batched, static_argnums=(2, 3))(
        jnp.asarray(boxes), jnp.asarray(scores), 0.5, 20)
    for b in range(B):
        si, ss = jax.jit(nms, static_argnums=(2, 3))(
            jnp.asarray(boxes[b]), jnp.asarray(scores[b]), 0.5, 20)
        np.testing.assert_array_equal(np.asarray(bi[b]), np.asarray(si))
        np.testing.assert_allclose(np.asarray(bs_[b]), np.asarray(ss))


def test_batched_nms_classes_dont_suppress():
    boxes = jnp.asarray([[0, 0, 10, 10], [0, 0, 10, 10]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8])
    # same class: one suppressed
    i1, s1 = batched_nms(boxes, scores, jnp.asarray([0, 0]), 0.5, 2)
    assert (np.asarray(s1) > NEG_INF / 2).sum() == 1
    # different classes: both kept
    i2, s2 = batched_nms(boxes, scores, jnp.asarray([0, 1]), 0.5, 2)
    assert (np.asarray(s2) > NEG_INF / 2).sum() == 2


def test_assigner_rules():
    anchors = jnp.asarray([
        [0, 0, 10, 10],     # iou 1.0 with gt0
        [0, 0, 9, 10],      # high iou with gt0
        [50, 50, 60, 60],   # iou 0 → negative
        [0, 0, 4, 10],      # iou 0.4 → between thresholds → ignore
    ], jnp.float32)
    gts = jnp.asarray([[0, 0, 10, 10], [0, 0, 0, 0]], jnp.float32)
    valid = jnp.asarray([True, False])
    labels = jnp.asarray([3, 0], jnp.int32)
    res = max_iou_assign(anchors, gts, valid, labels,
                         pos_iou_thr=0.7, neg_iou_thr=0.3, min_pos_iou=0.3)
    gi = np.asarray(res.gt_inds)
    assert gi[0] == 1 and gi[1] == 1   # pos
    assert gi[2] == 0                   # neg
    assert gi[3] == -1                  # ignore
    assert np.asarray(res.labels)[0] == 3


def test_low_quality_match():
    # gt1's best anchor has IoU 0.35 (< pos_thr) but >= min_pos_iou → matched
    anchors = jnp.asarray([[0, 0, 10, 10], [20, 20, 26, 34]], jnp.float32)
    gts = jnp.asarray([[0, 0, 10, 10], [20, 20, 30, 30]], jnp.float32)
    valid = jnp.asarray([True, True])
    res = max_iou_assign(anchors, gts, valid, pos_iou_thr=0.7,
                         neg_iou_thr=0.3, min_pos_iou=0.3,
                         match_low_quality=True)
    assert np.asarray(res.gt_inds)[1] == 2


def test_sampler_counts_and_validity():
    A = 100
    gt_inds = np.zeros(A, np.int32)
    gt_inds[:10] = 1          # 10 positives
    gt_inds[10:20] = -1       # ignored
    from mtp_tpu.ops.assign import AssignResult
    res = AssignResult(jnp.asarray(gt_inds), jnp.ones(A) * 0.5,
                       jnp.where(jnp.asarray(gt_inds) > 0, 2, -1))
    s = random_sample(res, jax.random.PRNGKey(0), num=32, pos_fraction=0.25)
    is_pos = np.asarray(s.is_pos)
    valid = np.asarray(s.valid)
    assert is_pos.sum() == 8            # expected_pos = 8 ≤ 10 available
    assert valid.all()                  # 80 negatives available to fill
    # sampled indices map back to true positives
    assert all(gt_inds[i] == 1 for i in np.asarray(s.inds)[is_pos])
    # positives sorted first
    assert is_pos[:8].all()

    # only 3 positives available → 3 pos + 29 neg
    gt_inds2 = np.zeros(A, np.int32)
    gt_inds2[:3] = 1
    res2 = AssignResult(jnp.asarray(gt_inds2), jnp.ones(A) * 0.5,
                        jnp.where(jnp.asarray(gt_inds2) > 0, 2, -1))
    s2 = random_sample(res2, jax.random.PRNGKey(1), num=32, pos_fraction=0.25)
    assert np.asarray(s2.is_pos).sum() == 3
    assert np.asarray(s2.valid).all()


def test_roi_align_constant_field():
    """On a constant feature map every RoI bin equals the constant."""
    feat = jnp.full((1, 16, 16, 3), 5.0)
    rois = jnp.asarray([[2., 2., 10., 10.], [0., 0., 16., 16.]])
    out = roi_align(feat, rois, jnp.zeros(2, jnp.int32), 7, 1.0)
    np.testing.assert_allclose(np.asarray(out), 5.0, atol=1e-5)


def test_roi_align_linear_field():
    """On f(x,y)=x the bin average equals the bin-center x coordinate."""
    W = 32
    xs = jnp.broadcast_to(jnp.arange(W, dtype=jnp.float32)[None, :], (W, W))
    feat = xs[None, :, :, None]
    rois = jnp.asarray([[4., 4., 20., 20.]])
    out = np.asarray(roi_align(feat, rois, jnp.zeros(1, jnp.int32), 4, 1.0))[0, :, :, 0]
    # n = 4*2 = 8 sample cells over w=16; first bin averages cells 0,1 at
    # offsets (0.5/8, 1.5/8) → x = 3.5 + 16*(0.0625+0.1875)/2 = 5.5
    expect0 = (4 - 0.5) + 16 * (0.0625 + 0.1875) / 2
    np.testing.assert_allclose(out[0, 0], expect0, atol=1e-4)
    # rows constant in a horizontal-gradient field
    np.testing.assert_allclose(out[0], out[3], atol=1e-4)


def test_roi_align_rotated_matches_horizontal_at_zero_angle():
    rng = np.random.default_rng(3)
    feat = jnp.asarray(rng.standard_normal((1, 24, 24, 4)).astype(np.float32))
    # box (4,6)-(18,14) as rotated (cx=11, cy=10, w=14, h=8, 0)
    h_out = roi_align(feat, jnp.asarray([[4., 6., 18., 14.]]),
                      jnp.zeros(1, jnp.int32), 7, 1.0)
    r_out = roi_align_rotated(feat, jnp.asarray([[11., 10., 14., 8., 0.]]),
                              jnp.zeros(1, jnp.int32), 7, 1.0)
    np.testing.assert_allclose(np.asarray(h_out), np.asarray(r_out), atol=1e-5)


def test_roi_align_rotated_90deg():
    """Rotating the RoI by 90° == transposing the sampled patch of a field."""
    W = 24
    xs = jnp.broadcast_to(jnp.arange(W, dtype=jnp.float32)[None, :], (W, W))
    feat = xs[None, :, :, None]  # f = x
    base = np.asarray(roi_align_rotated(
        feat, jnp.asarray([[12., 12., 8., 8., 0.]]), jnp.zeros(1, jnp.int32),
        4, 1.0))[0, :, :, 0]
    rot = np.asarray(roi_align_rotated(
        feat, jnp.asarray([[12., 12., 8., 8., np.pi / 2]]),
        jnp.zeros(1, jnp.int32), 4, 1.0))[0, :, :, 0]
    # after +90° the local x axis points along image +y; f=x depends only on
    # image x = cx - ly (local y) → columns constant, decreasing with row
    np.testing.assert_allclose(rot[:, 0], rot[:, 3], atol=1e-4)
    np.testing.assert_allclose(base[0, :], base[3, :], atol=1e-4)
    assert rot[0, 0] > rot[3, 0]


def test_map_roi_levels():
    rois = jnp.asarray([
        [0, 0, 20, 20],      # scale 20 → lvl 0
        [0, 0, 112, 112],    # scale 112 → lvl 1
        [0, 0, 224, 224],    # lvl 2
        [0, 0, 448, 448],    # lvl 3
        [0, 0, 1000, 1000],  # clipped to 3
    ], jnp.float32)
    np.testing.assert_array_equal(np.asarray(map_roi_levels(rois, 4)),
                                  [0, 1, 2, 3, 3])


def test_batched_nms_rotated_no_cross_class_overlap():
    """Rotated boxes of different classes must never suppress each other,
    even when the box extent is larger than the center coordinates."""
    from mtp_tpu.ops.rotated_boxes import rbox_overlaps
    # center near 1, huge w/h: naive +max-center offset would still overlap
    boxes = jnp.asarray([[1.0, 1.0, 40.0, 40.0, 0.0],
                         [1.0, 1.0, 40.0, 40.0, 0.0]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8])
    iou_fn = lambda a, b: rbox_overlaps(a, b)
    _, s_diff = batched_nms(boxes, scores, jnp.asarray([0, 1]), 0.1, 2,
                            iou_fn=iou_fn)
    assert (np.asarray(s_diff) > NEG_INF / 2).sum() == 2  # both kept
    _, s_same = batched_nms(boxes, scores, jnp.asarray([0, 0]), 0.1, 2,
                            iou_fn=iou_fn)
    assert (np.asarray(s_same) > NEG_INF / 2).sum() == 1  # one suppressed

    # negative centers: class-0 at (+M,+M) and class-1 at (-M,-M) land ~1
    # unit apart under a naive 2*max|coord|+1 extent when w/h are large
    M = 30.0
    boxes = jnp.asarray([[M, M, 45.0, 40.0, 0.3],
                         [-M, -M, 45.0, 40.0, 0.3]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8])
    _, s_neg = batched_nms(boxes, scores, jnp.asarray([0, 1]), 0.1, 2,
                           iou_fn=iou_fn)
    assert (np.asarray(s_neg) > NEG_INF / 2).sum() == 2  # both kept


def test_blocked_nms_matches_sequential_greedy():
    """The blocked nms_mask is an exact reformulation of sequential greedy
    NMS — compare against a numpy reference on random inputs, including
    padding and n not a multiple of the block size."""
    from mtp_tpu.ops.nms import nms_mask, NEG_INF
    from mtp_tpu.ops.boxes import bbox_overlaps

    rng = np.random.default_rng(0)
    for n, blk in ((37, 8), (100, 16), (200, 128)):
        xy = rng.uniform(0, 80, (n, 2)).astype(np.float32)
        wh = rng.uniform(5, 40, (n, 2)).astype(np.float32)
        boxes = np.concatenate([xy, xy + wh], -1)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        scores[-5:] = NEG_INF  # padding
        ious = np.asarray(bbox_overlaps(jnp.asarray(boxes),
                                        jnp.asarray(boxes)))

        # numpy sequential greedy
        order = np.argsort(-scores)
        alive = np.ones(n, bool)
        keep_ref = np.zeros(n, bool)
        for oi in order:
            if scores[oi] <= NEG_INF / 2 or not alive[oi]:
                continue
            keep_ref[oi] = True
            sup = ious[oi] > 0.5
            lower = scores < scores[oi]
            alive &= ~(sup & lower)

        got = np.asarray(nms_mask(jnp.asarray(ious), jnp.asarray(scores),
                                  0.5, block=blk))
        np.testing.assert_array_equal(got, keep_ref, err_msg=f"n={n} blk={blk}")

        # the on-the-fly blocked nms() (no materialized IoU matrix) must
        # select exactly the sequential-greedy winners, in score order
        idx, s = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5,
                     max_out=n, block=blk)
        idx, s = np.asarray(idx), np.asarray(s)
        kept = idx[s > NEG_INF / 2]
        ref_kept = order[keep_ref[order]]  # score-ordered reference winners
        np.testing.assert_array_equal(kept, ref_kept,
                                      err_msg=f"nms() n={n} blk={blk}")


def test_carafe_reassembly():
    """CARAFE semantics: uniform kernels = nearest-upsampled k×k box mean;
    a one-hot center kernel = exact nearest upsample."""
    from mtp_tpu.ops.carafe import carafe_reassemble, CARAFEPack

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 3)).astype(np.float32))
    k, s = 3, 2
    B, H, W, C = x.shape

    # one-hot kernel at the patch center == nearest upsample
    m = np.zeros((1, H * s, W * s, k * k), np.float32)
    m[..., (k * k) // 2] = 1.0
    out = np.asarray(carafe_reassemble(x, jnp.asarray(m), kernel=k, scale=s))
    want = np.repeat(np.repeat(np.asarray(x), s, 1), s, 2)
    np.testing.assert_allclose(out, want, atol=1e-6)

    # uniform kernel == box mean with zero padding
    m = np.full((1, H * s, W * s, k * k), 1.0 / (k * k), np.float32)
    out = np.asarray(carafe_reassemble(x, jnp.asarray(m), kernel=k, scale=s))
    xp = np.pad(np.asarray(x), ((0, 0), (1, 1), (1, 1), (0, 0)))
    want_src = sum(xp[:, dy:dy + H, dx:dx + W] for dy in range(3)
                   for dx in range(3)) / 9.0
    want = np.repeat(np.repeat(want_src, s, 1), s, 2)
    np.testing.assert_allclose(out, want, atol=1e-5)

    # the full pack initializes and upsamples 2x
    pack = CARAFEPack(scale=2)
    params = pack.init(jax.random.PRNGKey(0), x)
    y = pack.apply(params, x)
    assert y.shape == (1, 8, 8, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_mask_trunk_carafe_option():
    from mtp_tpu.heads.roi_heads import FCNMaskTrunk
    x = jnp.zeros((2, 14, 14, 8))
    for up in ("deconv", "carafe", "nearest", "bilinear"):
        trunk = FCNMaskTrunk(16, upsample=up)
        params = trunk.init(jax.random.PRNGKey(0), x)
        y = trunk.apply(params, x)
        assert y.shape == (2, 28, 28, 16), up


def test_gen_proposals_per_level_topk():
    """Per-level nms_pre (reference rpn_head rule): a level whose scores are
    globally dominated still contributes its own top-k candidates."""
    from mtp_tpu.heads.rpn import RPNOut, gen_proposals
    from mtp_tpu.tasks.detection import anchor_level_sizes, anchors_for

    img = (64, 64)
    sizes = anchor_level_sizes(img)
    A = jnp.asarray(anchors_for(None, img))
    total = int(A.shape[0])
    assert sum(sizes) == total

    rng = np.random.default_rng(0)
    # level 0 scores in [10, 11] dominate; deeper levels in [0, 1]
    scores = rng.uniform(0, 1, (1, total)).astype(np.float32)
    scores[0, :sizes[0]] += 10.0
    deltas = np.zeros((1, total, 4), np.float32)
    out = RPNOut(jnp.asarray(scores), jnp.asarray(deltas))

    k = 8
    # global top-k: every candidate comes from level 0
    bg, sg = gen_proposals(out, A, img, nms_pre=k, max_per_img=8,
                           iou_thr=0.99)
    # per-level: deeper levels contribute (scores below 10 present).
    # max_per_img exceeds level 0's k, so lower levels survive the NMS cap.
    bl, sl = gen_proposals(out, A, img, nms_pre=k, max_per_img=32,
                           iou_thr=0.99, level_sizes=sizes)
    sg, sl = np.asarray(sg[0]), np.asarray(sl[0])
    assert (sg[sg > NEG_INF / 2] > 10).all()
    assert (sl[sl > NEG_INF / 2] < 10).any()

    # equivalence when k covers every level fully
    bg2, sg2 = gen_proposals(out, A, img, nms_pre=total, max_per_img=16,
                             iou_thr=0.99)
    bl2, sl2 = gen_proposals(out, A, img, nms_pre=total, max_per_img=16,
                             iou_thr=0.99, level_sizes=sizes)
    np.testing.assert_allclose(np.asarray(sg2), np.asarray(sl2))
    np.testing.assert_allclose(np.asarray(bg2), np.asarray(bl2))


def test_multilevel_roi_align_fused_matches_select():
    """The atlas-packed single-gather extractor must reproduce the
    all-level-compute-and-select path exactly (same sample grid, border
    padding, level rule) — forward AND gradient wrt the features."""
    from mtp_tpu.ops.roi_align import (multilevel_roi_align,
                                       multilevel_roi_align_fused,
                                       map_rroi_levels, roi_align_rotated)

    rng = np.random.default_rng(3)
    B, C = 2, 8
    strides = (4, 8, 16, 32)
    feats = [jnp.asarray(rng.standard_normal(
        (B, 64 // (s // 4), 64 // (s // 4), C)).astype(np.float32))
        for s in strides]

    # horizontal rois spanning all levels (sizes 8..600 px in image coords)
    R = 24
    x1 = rng.uniform(0, 200, R)
    y1 = rng.uniform(0, 200, R)
    sz = np.exp(rng.uniform(np.log(8), np.log(600), R))
    rois = jnp.asarray(
        np.stack([x1, y1, x1 + sz, y1 + sz * rng.uniform(0.5, 2, R)],
                 -1).astype(np.float32))
    bidx = jnp.asarray(rng.integers(0, B, R).astype(np.int32))

    ref = multilevel_roi_align(feats, rois, bidx, 7, strides)
    got = multilevel_roi_align_fused(feats, rois, bidx, 7, strides)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # gradient wrt features must agree too (training uses the transpose)
    def loss_ref(fs):
        return (multilevel_roi_align(fs, rois, bidx, 7, strides) ** 2).sum()

    def loss_fus(fs):
        return (multilevel_roi_align_fused(fs, rois, bidx, 7,
                                           strides) ** 2).sum()

    g_ref = jax.grad(loss_ref)(feats)
    g_fus = jax.grad(loss_fus)(feats)
    for a, b in zip(g_ref, g_fus):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)

    # rotated: compare against the rotated select path
    rrois = jnp.asarray(np.stack(
        [rng.uniform(50, 400, R), rng.uniform(50, 400, R),
         np.exp(rng.uniform(np.log(8), np.log(600), R)),
         np.exp(rng.uniform(np.log(8), np.log(300), R)),
         rng.uniform(-1.5, 1.5, R)], -1).astype(np.float32))
    lvls = map_rroi_levels(rrois, 4)
    outs = jnp.stack([roi_align_rotated(f, rrois, bidx, 7, 1.0 / s,
                                        clockwise=True)
                      for f, s in zip(feats, strides)], axis=0)
    ref_r = jnp.take_along_axis(outs, lvls[None, :, None, None, None],
                                axis=0)[0]
    got_r = multilevel_roi_align_fused(feats, rrois, bidx, 7, strides,
                                       rotated=True, clockwise=True)
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(ref_r),
                               rtol=1e-5, atol=1e-5)


def test_sampler_positive_prefix_bound():
    """The mask branch runs on the first int(num*pos_fraction) sampled
    slots only (tasks/detection.py) — valid iff random_sample (a) caps
    positives at expected_pos and (b) packs them all into that prefix."""
    from mtp_tpu.ops.assign import AssignResult
    rng = np.random.default_rng(7)
    A, num, pf = 400, 64, 0.25
    cap = int(num * pf)
    for trial in range(5):
        gt_inds = rng.choice([0, 1, 2, 3], A,
                             p=[0.5, 0.2, 0.2, 0.1]).astype(np.int32)
        res = AssignResult(jnp.asarray(gt_inds), jnp.ones(A) * 0.5,
                           jnp.where(jnp.asarray(gt_inds) > 0, 1, -1))
        s = random_sample(res, jax.random.PRNGKey(trial), num=num,
                          pos_fraction=pf)
        is_pos = np.asarray(s.is_pos)
        assert is_pos.sum() <= cap
        assert not is_pos[cap:].any(), "positive escaped the mask prefix"
