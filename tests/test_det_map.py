"""mAP evaluation tests with hand-computed expectations + DOTA merge."""

import numpy as np

from mtp_tpu.eval.det_map import (average_precision, eval_coco_map, eval_map,
                                  merge_dota_patches, parse_patch_id,
                                  rbox_to_quad_np, write_dota_submission)


def test_average_precision_perfect():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 1.0])
    assert average_precision(rec, prec) == 1.0


def test_eval_map_simple():
    # 2 gts, 2 dets: one perfect match, one FP → AP = area under
    # P(R): (1.0 @ r0.5); precision drops to 0.5 after the FP
    im = {
        "det_boxes": np.array([[0, 0, 10, 10], [50, 50, 60, 60]], np.float32),
        "det_scores": np.array([0.9, 0.8], np.float32),
        "det_labels": np.array([0, 0]),
        "gt_boxes": np.array([[0, 0, 10, 10], [80, 80, 90, 90]], np.float32),
        "gt_labels": np.array([0, 0]),
    }
    res = eval_map([im], num_classes=1)
    assert abs(res["mAP"] - 50.0) < 1e-3  # recall .5 at precision 1


def test_eval_map_rotated():
    im = {
        "det_boxes": np.array([[20, 20, 10, 6, 0.3]], np.float32),
        "det_scores": np.array([0.9], np.float32),
        "det_labels": np.array([0]),
        "gt_boxes": np.array([[20, 20, 10, 6, 0.3]], np.float32),
        "gt_labels": np.array([0]),
    }
    res = eval_map([im], num_classes=1, rotated=True)
    assert res["mAP"] == 100.0


def test_eval_map_ignores_difficult():
    im = {
        "det_boxes": np.array([[0, 0, 10, 10]], np.float32),
        "det_scores": np.array([0.9], np.float32),
        "det_labels": np.array([0]),
        "gt_boxes": np.array([[0, 0, 10, 10]], np.float32),
        "gt_labels": np.array([0]),
        "gt_ignore": np.array([True]),
    }
    res = eval_map([im], num_classes=1)
    # only an ignored gt: class has no countable gts → excluded (mAP 0)
    assert res["AP"][0] == -1


def test_coco_map_perfect():
    im = {
        "det_boxes": np.array([[0, 0, 10, 10]], np.float32),
        "det_scores": np.array([0.9], np.float32),
        "det_labels": np.array([0]),
        "gt_boxes": np.array([[0, 0, 10, 10]], np.float32),
        "gt_labels": np.array([0]),
    }
    res = eval_coco_map([im], num_classes=1)
    assert res["mAP"] > 99.0 and res["AP50"] > 99.0


def test_parse_patch_id():
    # standard mmrotate split names: base__rate__x___y (reference
    # rotated_detection/metric.py:489-497 takes split('__')[0] + first
    # '__x___y' group)
    assert parse_patch_id("P0006__1__0___512") == ("P0006", 0, 512, 1.0)
    assert parse_patch_id("P0006__0.5__1024___512") == ("P0006", 1024, 512, 0.5)
    # legacy two-segment form still parses
    assert parse_patch_id("P0006__1024___512") == ("P0006", 1024, 512, 1.0)
    assert parse_patch_id("P0006") == ("P0006", 0, 0, 1.0)


def test_merge_dota(tmp_path):
    per_patch = {
        "P1__1__0___0": {
            "det_boxes": np.array([[100, 100, 20, 10, 0.2]], np.float32),
            "det_scores": np.array([0.9], np.float32),
            "det_labels": np.array([0]),
        },
        "P1__1__512___0": {
            # after +512 x-offset this duplicates the first box → NMS'd away
            "det_boxes": np.array([[100 - 512, 100, 20, 10, 0.2]], np.float32),
            "det_scores": np.array([0.8], np.float32),
            "det_labels": np.array([0]),
        },
    }
    merged = merge_dota_patches(per_patch, num_classes=1)
    assert set(merged) == {"P1"}
    assert len(merged["P1"]["det_boxes"]) == 1
    np.testing.assert_allclose(merged["P1"]["det_boxes"][0][:2], [100, 100])

    write_dota_submission(merged, ["ship"], str(tmp_path / "sub"),
                          str(tmp_path / "sub.zip"))
    txt = (tmp_path / "sub" / "Task1_ship.txt").read_text().strip()
    assert txt.startswith("P1 0.9")
    assert (tmp_path / "sub.zip").exists()


def test_merge_dota_multiscale():
    """Patches of one image at different split rates merge under ONE base id
    (reference: img_id.split('__')[0]); with rescale_by_rate the 0.5-scale
    detection lands on the same original-image coordinates and is NMS'd."""
    per_patch = {
        "P0006__0.5__0___0": {
            # coords in the 0.5x-resized image: (50,50) w=10 → orig (100,100) w=20
            "det_boxes": np.array([[50, 50, 10, 5, 0.2]], np.float32),
            "det_scores": np.array([0.8], np.float32),
            "det_labels": np.array([0]),
        },
        "P0006__1__512___0": {
            "det_boxes": np.array([[100 - 512, 100, 20, 10, 0.2]], np.float32),
            "det_scores": np.array([0.9], np.float32),
            "det_labels": np.array([0]),
        },
    }
    # reference-exact merge: one base id, no rate rescale → 2 survivors
    merged = merge_dota_patches(per_patch, num_classes=1)
    assert set(merged) == {"P0006"}
    assert len(merged["P0006"]["det_boxes"]) == 2

    # rate-aware merge: the duplicate collapses
    merged = merge_dota_patches(per_patch, num_classes=1,
                                rescale_by_rate=True)
    assert set(merged) == {"P0006"}
    assert len(merged["P0006"]["det_boxes"]) == 1
    np.testing.assert_allclose(merged["P0006"]["det_boxes"][0][:4],
                               [100, 100, 20, 10])


def test_rbox_to_quad():
    q = rbox_to_quad_np(np.array([[10., 10., 4., 2., 0.]]))
    assert sorted(q[0][::2].tolist()) == [8, 8, 12, 12]
    assert sorted(q[0][1::2].tolist()) == [9, 9, 11, 11]


def test_coco_results_export(tmp_path):
    from mtp_tpu.eval.coco_results import detections_to_coco_json
    from mtp_tpu.data.parsers import rle_to_mask
    per_image = [{
        "det_boxes": np.array([[2., 3., 10., 9.]], np.float32),
        "det_scores": np.array([0.7], np.float32),
        "det_labels": np.array([1]),
        "mask_probs": np.ones((1, 4, 4), np.float32),
    }]
    out = tmp_path / "res.json"
    res = detections_to_coco_json(per_image, image_ids=[42], cat_ids=[3, 7],
                                  path=str(out), with_masks=True,
                                  image_sizes=[(16, 16)])
    assert res[0]["image_id"] == 42 and res[0]["category_id"] == 7
    assert res[0]["bbox"] == [2.0, 3.0, 8.0, 6.0]
    m = rle_to_mask(res[0]["segmentation"])
    assert m.shape == (16, 16) and m[5, 5] == 1 and m[0, 0] == 0
    import json as _json
    assert abs(_json.load(open(out))[0]["score"] - 0.7) < 1e-6
