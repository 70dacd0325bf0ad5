"""det_loss_multi segmenting invariants (multitask detection batching).

The multitask pretrainer runs the shared detection stack ONCE over the
concatenated 3-dataset batch (reference models.py:224-307 runs it per
dataset); only the per-dataset final layers and loss reductions act on
static row slices.  These tests pin the properties that rewrite must
preserve:

- segment independence: a segment's losses depend only on its own data
  (no leakage through concatenation, common-G padding, sampling, or the
  positive-prefix mask rows);
- padding invariance: padding a segment's gts to the common G is a no-op;
- heterogeneous heads: segments may differ in num_classes (and nothing
  else — enforced).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtp_tpu.heads.rpn import RPNOut
from mtp_tpu.models.detector import DetConfig
from mtp_tpu.tasks.detection import anchors_for, det_loss_multi

HW = (64, 64)


def small_det(num_classes=4, with_mask=False):
    return DetConfig(num_classes=num_classes, with_mask=with_mask,
                     nms_pre=64, max_proposals=32, rpn_num=32, rcnn_num=16,
                     max_gts=8)


def make_batch(seed, n, G, ncls, with_crops=False):
    r = np.random.default_rng(seed)
    xy = r.uniform(4, 40, (n, G, 2)).astype(np.float32)
    wh = r.uniform(6, 20, (n, G, 2)).astype(np.float32)
    valid = np.zeros((n, G), bool)
    valid[:, : max(1, G // 2)] = True
    b = {
        "image": np.zeros((n, HW[0], HW[1], 3), np.float32),
        "gt_boxes": np.concatenate([xy, xy + wh], -1),
        "gt_labels": r.integers(0, ncls, (n, G)).astype(np.int32),
        "gt_valid": valid,
    }
    if with_crops:
        b["gt_mask_crops"] = (r.uniform(0, 1, (n, G, 56, 56)) > 0.5).astype(
            np.float32)
    return b


def seg_fns(dets, seed=0, mask=False):
    """Deterministic per-segment final layers (fixed random weights)."""
    r = np.random.default_rng(seed)
    Ws = []
    for det in dets:
        K = det.num_classes
        Wc = r.standard_normal((4, K + 1)).astype(np.float32) * 0.1
        Wr = r.standard_normal((4, K * 4)).astype(np.float32) * 0.1
        Wm = r.standard_normal((4, 28 * 28 * K)).astype(np.float32) * 0.01
        Ws.append((Wc, Wr, Wm))

    def box_fn(rois, bidx, segs):
        out = []
        for (Wc, Wr, _), (s, e) in zip(Ws, segs):
            x = rois[s:e, :4] * 0.01
            out.append((x @ Wc, x @ Wr))
        return out

    def mask_fn(rois, bidx, segs):
        out = []
        for (_, _, Wm), (s, e) in zip(Ws, segs):
            x = rois[s:e, :4] * 0.01
            K = Wm.shape[1] // (28 * 28)
            out.append((x @ Wm).reshape(e - s, 28, 28, K))
        return out

    return box_fn, (mask_fn if mask else None)


def rpn_for(seed, B):
    A = anchors_for(None, HW).shape[0]
    r = np.random.default_rng(seed)
    return RPNOut(jnp.asarray(r.standard_normal((B, A)), jnp.float32),
                  jnp.asarray(r.standard_normal((B, A, 4)) * 0.1,
                              jnp.float32))


def run(dets, batches, mask=False, seed=3):
    anchors = anchors_for(None, HW)
    B = sum(b["image"].shape[0] for b in batches)
    box_fn, mask_fn = seg_fns(dets, mask=mask)
    total, mets = det_loss_multi(dets, anchors, HW, rpn_for(7, B), box_fn,
                                 mask_fn, batches, jax.random.PRNGKey(seed))
    return float(total), jax.tree.map(np.asarray, mets)


@pytest.mark.parametrize("mask", [False, True])
def test_segment_independence(mask):
    """Perturbing segment 1's gts must not change segment 0's losses at all
    (and vice versa) — the leakage classes are exactly what the concat
    rewrite could break."""
    det = small_det(with_mask=mask)
    bA = make_batch(1, 2, 6, det.num_classes, with_crops=mask)
    bB = make_batch(2, 2, 6, det.num_classes, with_crops=mask)
    bB2 = make_batch(22, 2, 6, det.num_classes, with_crops=mask)

    _, m1 = run([det, det], [bA, bB], mask=mask)
    _, m2 = run([det, det], [bA, bB2], mask=mask)
    for k in m1[0]:
        np.testing.assert_array_equal(m1[0][k], m2[0][k], err_msg=k)
    # B's data DID change, so its losses must differ (sanity that the
    # perturbation was seen at all)
    assert any(not np.array_equal(m1[1][k], m2[1][k]) for k in m1[1])

    # symmetric: perturb segment 0
    bA2 = make_batch(11, 2, 6, det.num_classes, with_crops=mask)
    _, m3 = run([det, det], [bA2, bB], mask=mask)
    for k in m1[1]:
        np.testing.assert_array_equal(m1[1][k], m3[1][k], err_msg=k)


def test_padding_invariance_common_G():
    """Segments with different gt counts pad to a common G internally;
    pre-padding by hand must be a no-op."""
    det = small_det()
    bA = make_batch(1, 2, 5, det.num_classes)
    bB = make_batch(2, 2, 8, det.num_classes)

    def prepad(b, G):
        out = dict(b)
        for k in ("gt_boxes", "gt_labels", "gt_valid"):
            pad = [(0, 0), (0, G - b[k].shape[1])] + \
                  [(0, 0)] * (b[k].ndim - 2)
            out[k] = np.pad(b[k], pad)
        return out

    t1, m1 = run([det, det], [bA, bB])
    t2, m2 = run([det, det], [prepad(bA, 8), bB])
    assert t1 == t2
    for d in range(2):
        for k in m1[d]:
            np.testing.assert_array_equal(m1[d][k], m2[d][k], err_msg=k)


def test_heterogeneous_num_classes():
    detA, detB = small_det(4), small_det(7)
    bA = make_batch(1, 2, 6, 4)
    bB = make_batch(2, 3, 6, 7)
    total, mets = run([detA, detB], [bA, bB])
    assert np.isfinite(total)
    assert len(mets) == 2
    for m in mets:
        assert {"loss_rpn_cls", "loss_rpn_bbox", "loss_cls",
                "loss_bbox"} <= set(m)
        assert all(np.isfinite(v).all() for v in m.values())


def test_rejects_mismatched_hparams():
    detA = small_det(4)
    detB = dataclasses.replace(small_det(4), rcnn_num=8)
    bA = make_batch(1, 1, 4, 4)
    bB = make_batch(2, 1, 4, 4)
    with pytest.raises(ValueError, match="num_classes"):
        run([detA, detB], [bA, bB])
