"""COCO-protocol evaluator tests against analytically-known values
(pycocotools is not installed here; fixtures are built so the exact
COCOeval output is derivable by hand — 101-point interpolation, crowd
re-matching, ignore propagation, area ranges, maxDets sweep)."""

import numpy as np

from mtp_tpu.eval.coco_eval import evaluate_coco, evaluate_coco_bbox_segm


def det(boxes, scores, labels):
    return {"det_boxes": np.asarray(boxes, np.float32),
            "det_scores": np.asarray(scores, np.float32),
            "det_labels": np.asarray(labels, np.int64)}


def gt(boxes, labels, **kw):
    out = {"gt_boxes": np.asarray(boxes, np.float32),
           "gt_labels": np.asarray(labels, np.int64)}
    out.update({k: np.asarray(v) for k, v in kw.items()})
    return out


def test_perfect_detection():
    im = {**det([[10, 10, 50, 50]], [0.9], [0]),
          **gt([[10, 10, 50, 50]], [0])}
    r = evaluate_coco([im], num_classes=1)
    assert r["mAP"] == 100.0 and r["AP50"] == 100.0 and r["AP75"] == 100.0
    assert r["AR@100"] == 100.0
    # 40x40 box = 1600 px² → medium; small/large have no gts → -1
    assert r["AP_m"] == 100.0 and r["AP_s"] == -1.0 and r["AP_l"] == -1.0


def test_half_recall_is_50p5():
    """One of two gts found: AP = 51/101 (the classic 101-point value)."""
    im = {**det([[10, 10, 50, 50]], [0.9], [0]),
          **gt([[10, 10, 50, 50], [100, 100, 140, 140]], [0, 0])}
    r = evaluate_coco([im], num_classes=1)
    np.testing.assert_allclose(r["mAP"], 100 * 51 / 101, atol=1e-6)
    assert r["AR@100"] == 50.0


def test_false_positive_after_tp():
    """TP at score .9 then FP at .8: precision envelope keeps AP at 51/101
    for the found gt (prec 1.0 up to rec 0.5, then drops)."""
    im = {**det([[10, 10, 50, 50], [200, 200, 240, 240]], [0.9, 0.8], [0, 0]),
          **gt([[10, 10, 50, 50], [100, 100, 140, 140]], [0, 0])}
    r = evaluate_coco([im], num_classes=1)
    np.testing.assert_allclose(r["mAP"], 100 * 51 / 101, atol=1e-6)


def test_crowd_gt_absorbs_extra_dets():
    """A det matched to a crowd gt is ignored (neither TP nor FP), and crowd
    gts can absorb multiple dets."""
    im = {**det([[10, 10, 50, 50], [60, 60, 80, 80], [65, 65, 85, 85]],
                [0.9, 0.8, 0.7], [0, 0, 0]),
          **gt([[10, 10, 50, 50], [55, 55, 90, 90]], [0, 0],
               gt_crowd=[False, True])}
    # crowd IoU = inter/det-area: the two small dets are fully inside
    r = evaluate_coco([im], num_classes=1)
    assert r["mAP"] == 100.0, r  # crowd gt is ignored, det ignored with it


def test_ignore_gt():
    im = {**det([[10, 10, 50, 50], [100, 100, 140, 140]], [0.9, 0.8], [0, 0]),
          **gt([[10, 10, 50, 50], [100, 100, 140, 140]], [0, 0],
               gt_ignore=[False, True])}
    r = evaluate_coco([im], num_classes=1)
    # the ignored gt doesn't count; its matched det is ignored too
    assert r["mAP"] == 100.0


def test_area_ranges():
    """Small (16²=256) and large (400²) gts: AP_s only scores the small one;
    out-of-range dets that match in-range gts still count there."""
    im = {**det([[0, 0, 16, 16], [0, 0, 400, 400]], [0.9, 0.8], [0, 0]),
          **gt([[0, 0, 16, 16], [0, 0, 400, 400]], [0, 0])}
    r = evaluate_coco([im], num_classes=1)
    assert r["mAP"] == 100.0
    assert r["AP_s"] == 100.0 and r["AP_l"] == 100.0
    assert r["AP_m"] == -1.0  # no medium gt
    assert r["AR_s"] == 100.0 and r["AR_l"] == 100.0


def test_maxdets_sweep():
    """Two gts, two correct dets: AR@1 = 50, AR@10/100 = 100."""
    im = {**det([[10, 10, 50, 50], [100, 100, 140, 140]], [0.9, 0.8], [0, 0]),
          **gt([[10, 10, 50, 50], [100, 100, 140, 140]], [0, 0])}
    r = evaluate_coco([im], num_classes=1)
    assert r["AR@1"] == 50.0
    assert r["AR@10"] == 100.0 and r["AR@100"] == 100.0
    # AP unaffected (matching uses the largest maxDet)
    assert r["mAP"] == 100.0


def test_iou_threshold_sweep():
    """gt 0..40 with det shifted +10 in x: inter 30·40, union 50·40 →
    IoU 0.6, so the det counts at thresholds .5/.55/.6 only → mAP 3/10."""
    im = {**det([[10, 0, 50, 40]], [0.9], [0]),
          **gt([[0, 0, 40, 40]], [0])}
    r = evaluate_coco([im], num_classes=1)
    assert r["AP50"] == 100.0
    assert r["AP75"] == 0.0
    np.testing.assert_allclose(r["mAP"], 100 * 3 / 10, atol=1e-6)


def test_multiclass_mean():
    """AP averages over classes with gts; class without gts excluded."""
    im = {**det([[10, 10, 50, 50], [100, 100, 140, 140]], [0.9, 0.8], [0, 1]),
          **gt([[10, 10, 50, 50], [100, 100, 140, 140], [200, 200, 240, 240]],
               [0, 1, 1])}
    r = evaluate_coco([im], num_classes=3)
    want = (100.0 + 100 * 51 / 101) / 2  # class0 perfect, class1 half-recall
    np.testing.assert_allclose(r["mAP"], want, atol=1e-6)


def square_mask(h, w, y0, x0, y1, x1):
    m = np.zeros((h, w), np.uint8)
    m[y0:y1, x0:x1] = 1
    return m


def test_segm_map():
    """Mask AP: identical mask → 100; a det whose MASK misses (box overlaps)
    scores zero on segm but full on bbox — the reason the reference
    evaluates both (instance_segmentation/metric.py:22)."""
    H = W = 64
    gt_m = square_mask(H, W, 8, 8, 40, 40)
    im = {
        **det([[8, 8, 40, 40]], [0.9], [0]),
        **gt([[8, 8, 40, 40]], [0]),
        "det_masks": np.stack([gt_m]),
        "gt_masks": np.stack([gt_m]),
    }
    r = evaluate_coco_bbox_segm([im], num_classes=1)
    assert r["mAP"] == 100.0 and r["segm_mAP"] == 100.0

    # shifted mask: IoU = 16/48 = 0.33 < 0.5 → segm zero, bbox still 100
    im2 = dict(im, det_masks=np.stack([square_mask(H, W, 8, 24, 40, 56)]))
    r2 = evaluate_coco_bbox_segm([im2], num_classes=1)
    assert r2["mAP"] == 100.0
    assert r2["segm_mAP"] == 0.0


def test_segm_crowd_iou_uses_det_area():
    """Crowd mask IoU denominator = det area: a small det inside a big crowd
    mask matches it and is ignored."""
    H = W = 64
    crowd_m = square_mask(H, W, 0, 0, 64, 64)
    gt_m = square_mask(H, W, 8, 8, 24, 24)
    im = {
        **det([[8, 8, 24, 24], [40, 40, 56, 56]], [0.9, 0.8], [0, 0]),
        **gt([[8, 8, 24, 24], [0, 0, 64, 64]], [0, 0],
             gt_crowd=[False, True]),
        "det_masks": np.stack([gt_m, square_mask(H, W, 40, 40, 56, 56)]),
        "gt_masks": np.stack([gt_m, crowd_m]),
    }
    r = evaluate_coco([im], num_classes=1, iou_type="segm")
    assert r["mAP"] == 100.0, r


def test_eval_coco_map_alias():
    from mtp_tpu.eval.det_map import eval_coco_map
    im = {**det([[10, 10, 50, 50]], [0.9], [0]),
          **gt([[10, 10, 50, 50]], [0])}
    r = eval_coco_map([im], num_classes=1)
    assert r["mAP"] == 100.0 and r["AP50"] == 100.0
    assert "AR@100" in r and "AP_s" in r


def test_zero_detections():
    """Images with no detections at all must not crash (regression:
    reshape of a (0,H,W) mask stack) and give AP/AR = 0."""
    im = {**det(np.zeros((0, 4)), np.zeros(0), np.zeros(0, np.int64)),
          **gt([[8, 8, 40, 40]], [0]),
          "det_masks": np.zeros((0, 16, 16), np.uint8),
          "gt_masks": np.ones((1, 16, 16), np.uint8)}
    r = evaluate_coco_bbox_segm([im], num_classes=1)
    assert r["mAP"] == 0.0 and r["segm_mAP"] == 0.0 and r["AR@100"] == 0.0
