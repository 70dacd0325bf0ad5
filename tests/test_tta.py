"""TTA merge tests with a fake predictor: coordinate unmapping for scales and
flips, cross-variant NMS dedup."""

import numpy as np

from mtp_tpu.eval.tta import tta_detect


def test_flip_and_scale_unmap_hbox():
    W = H = 100
    gt = np.asarray([[10., 20., 30., 40.]], np.float32)

    def predict(imgs):
        # detect the gt in whatever frame we're given: infer scale/flip from
        # the image content channel trick
        s = imgs.shape[1] / H
        flipped = imgs[0, 0, 0, 0] > imgs[0, 0, -1, 0]
        b = gt * s
        if flipped:
            x1 = imgs.shape[2] - b[:, 2:3]
            x2 = imgs.shape[2] - b[:, 0:1]
            b = np.concatenate([x1, b[:, 1:2], x2, b[:, 3:4]], 1)
        return [{"det_boxes": b.astype(np.float32),
                 "det_scores": np.asarray([0.9], np.float32),
                 "det_labels": np.asarray([0])} for _ in range(len(imgs))]

    # gradient image so the fake predictor can detect flips
    img = np.tile(np.arange(W, dtype=np.float32)[None, :, None], (H, 1, 3))[None]
    merged = tta_detect(predict, img, scales=(1.0, 0.5), flip=True,
                        rotated=False, nms_iou=0.5, num_classes=1)
    # all 4 variants map back onto the same box → one detection survives NMS
    assert len(merged[0]["det_boxes"]) == 1
    np.testing.assert_allclose(merged[0]["det_boxes"][0], gt[0], atol=1.5)


def test_noninteger_scale_unmap_exact():
    """scale=0.7 on W=50 resizes to 35 px (int truncation): unmapping must
    use the ACTUAL 35/50 factor and flip against 35, not 50*0.7."""
    W = H = 50
    gt = np.asarray([[10., 12., 30., 40.]], np.float32)

    def predict(imgs):
        sy = imgs.shape[1] / H
        sx = imgs.shape[2] / W
        flipped = imgs[0, 0, 0, 0] > imgs[0, 0, -1, 0]
        b = gt * np.asarray([sx, sy, sx, sy], np.float32)
        if flipped:
            x1 = imgs.shape[2] - b[:, 2:3]
            x2 = imgs.shape[2] - b[:, 0:1]
            b = np.concatenate([x1, b[:, 1:2], x2, b[:, 3:4]], 1)
        return [{"det_boxes": b.astype(np.float32),
                 "det_scores": np.asarray([0.9], np.float32),
                 "det_labels": np.asarray([0])} for _ in range(len(imgs))]

    img = np.tile(np.arange(W, dtype=np.float32)[None, :, None], (H, 1, 3))[None]
    merged = tta_detect(predict, img, scales=(0.7,), flip=True,
                        rotated=False, nms_iou=0.5, num_classes=1)
    assert len(merged[0]["det_boxes"]) == 1
    # exact round-trip (the fake predictor is noise-free)
    np.testing.assert_allclose(merged[0]["det_boxes"][0], gt[0], atol=1e-4)


def test_rotated_flip_unmap():
    W = H = 64
    gt = np.asarray([[20., 30., 16., 8., 0.4]], np.float32)

    def predict(imgs):
        flipped = imgs[0, 0, 0, 0] > imgs[0, 0, -1, 0]
        b = gt.copy()
        if flipped:
            b[:, 0] = W - b[:, 0]
            b[:, 4] = -b[:, 4]
        return [{"det_boxes": b, "det_scores": np.asarray([0.8], np.float32),
                 "det_labels": np.asarray([2])} for _ in range(len(imgs))]

    img = np.tile(np.arange(W, dtype=np.float32)[None, :, None], (H, 1, 3))[None]
    merged = tta_detect(predict, img, scales=(1.0,), flip=True, rotated=True,
                        nms_iou=0.1, num_classes=3)
    assert len(merged[0]["det_boxes"]) == 1
    np.testing.assert_allclose(merged[0]["det_boxes"][0], gt[0], atol=1e-4)
    assert merged[0]["det_labels"][0] == 2
