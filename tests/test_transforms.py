"""Joint augmentation tests: flips/resize/crop keep all label types
consistent."""

import numpy as np

from mtp_tpu.data.transforms import (crop, flip, masks_to_boxes, normalize,
                                     pad_to_divisor, photometric_distortion,
                                     random_crop, resize)


def make_sample(H=40, W=60):
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
    seg = np.zeros((H, W), np.int32)
    seg[10:20, 10:30] = 2
    masks = np.zeros((2, H, W), np.uint8)
    masks[0, 10:20, 10:30] = 1
    masks[1, 25:35, 40:55] = 1
    hboxes = masks_to_boxes(masks)
    rboxes = np.array([[20., 15., 20., 10., 0.3],
                       [47., 30., 15., 8., -0.5]], np.float32)
    return {"image": img, "sem_seg": seg, "hboxes": hboxes,
            "labels": np.array([1, 2], np.int32), "masks": masks,
            "rboxes": rboxes, "rlabels": np.array([0, 1], np.int32)}


def test_hflip_consistency():
    s = make_sample()
    f = flip(s, "horizontal")
    W = s["image"].shape[1]
    # boxes track the flipped masks exactly
    np.testing.assert_allclose(f["hboxes"], masks_to_boxes(f["masks"]))
    # rbox center mirrored, angle negated
    np.testing.assert_allclose(f["rboxes"][:, 0], W - s["rboxes"][:, 0])
    np.testing.assert_allclose(f["rboxes"][:, 4], -s["rboxes"][:, 4])
    # double flip = identity
    f2 = flip(f, "horizontal")
    np.testing.assert_allclose(f2["hboxes"], s["hboxes"])
    np.testing.assert_array_equal(f2["image"], s["image"])


def test_vflip_and_diagonal():
    s = make_sample()
    for d in ("vertical", "diagonal"):
        f = flip(s, d)
        np.testing.assert_allclose(f["hboxes"], masks_to_boxes(f["masks"]),
                                   err_msg=d)


def test_resize_keep_ratio():
    s = make_sample(40, 60)
    r = resize(s, (120, 120), keep_ratio=True)  # factor 2
    assert r["image"].shape[:2] == (80, 120)
    np.testing.assert_allclose(r["hboxes"], s["hboxes"] * 2)
    np.testing.assert_allclose(r["rboxes"][:, :4], s["rboxes"][:, :4] * 2)
    np.testing.assert_allclose(r["rboxes"][:, 4], s["rboxes"][:, 4])
    assert r["sem_seg"].shape == (80, 120)
    assert set(np.unique(r["sem_seg"])) <= {0, 2}


def test_crop_filters_and_shifts():
    s = make_sample()
    c = crop(s, 5, 5, 20, 30)  # keeps instance 0 only
    assert len(c["hboxes"]) == 1
    np.testing.assert_allclose(c["hboxes"][0], [5, 5, 25, 15])
    assert c["labels"].tolist() == [1]
    assert len(c["rboxes"]) == 1  # first rbox center (20,15) inside
    np.testing.assert_allclose(c["rboxes"][0][:2], [15, 10])


def test_crop_empty_returns_none():
    s = make_sample()
    assert crop(s, 0, 0, 5, 5) is None  # no instance survives


def test_random_crop_resamples():
    s = make_sample()
    rng = np.random.default_rng(3)
    c = random_crop(s, (20, 20), rng)
    assert c["image"].shape[:2] == (20, 20)


def test_normalize_pad():
    s = make_sample(33, 45)
    n = pad_to_divisor(normalize(s), 32)
    assert n["image"].shape[:2] == (64, 64)
    assert (n["sem_seg"][40:] == 255).all()
    assert n["masks"].shape[1:] == (64, 64)


def test_photometric_shapes():
    s = make_sample()
    rng = np.random.default_rng(1)
    p = photometric_distortion(s, rng)
    assert p["image"].shape == s["image"].shape
    assert p["image"].min() >= 0 and p["image"].max() <= 255
    # labels untouched
    np.testing.assert_array_equal(p["hboxes"], s["hboxes"])


def test_random_crop_cat_max_ratio():
    """mmseg RandomCrop cat_max_ratio: reject crops dominated by one class
    (seg recipes use 0.75)."""
    from mtp_tpu.data import transforms as T
    seg = np.zeros((64, 64), np.int32)
    seg[:, 32:] = 1  # two half-planes
    s = {"image": np.zeros((64, 64, 3), np.float32), "sem_seg": seg}
    rng = np.random.default_rng(0)
    for _ in range(10):
        c = T.random_crop(s, (32, 32), rng, cat_max_ratio=0.75,
                          max_tries=50)
        _, counts = np.unique(c["sem_seg"], return_counts=True)
        assert len(counts) == 2 and counts.max() / counts.sum() <= 0.75


def test_flip_rbox_vertical_and_diagonal():
    from mtp_tpu.data import transforms as T
    s = {"image": np.zeros((100, 60, 3), np.float32),
         "rboxes": np.asarray([[10.0, 20.0, 8.0, 4.0, 0.3]], np.float32)}
    v = T.flip(s, "vertical")
    np.testing.assert_allclose(v["rboxes"][0], [10, 80, 8, 4, -0.3])
    d = T.flip(s, "diagonal")
    np.testing.assert_allclose(d["rboxes"][0], [50, 80, 8, 4, 0.3])


def test_random_crop_allow_negative_and_recompute():
    """MTP_RandomCrop pretraining flags (utils.py:48-51): empty crops kept
    with zero-length instance arrays; boxes recomputed from cropped masks."""
    from mtp_tpu.data import transforms as T
    masks = np.zeros((1, 64, 64), np.uint8)
    masks[0, 4:10, 4:12] = 1
    s = {"image": np.zeros((64, 64, 3), np.float32),
         "hboxes": np.asarray([[4, 4, 12, 10]], np.float32),
         "labels": np.asarray([0], np.int64), "masks": masks,
         "rboxes": np.asarray([[8, 7, 8, 6, 0.0]], np.float32),
         "rlabels": np.asarray([1], np.int64)}
    # force a crop region with no instances: crop the bottom-right corner
    c = T.crop(s, 32, 32, 32, 32)
    assert c is None  # default: resample signal
    rng = np.random.default_rng(0)
    got_empty = False
    for _ in range(50):
        c = T.random_crop(s, (32, 32), rng, allow_negative=True,
                          recompute_bbox=True)
        assert c is not None
        if len(c["hboxes"]) == 0:
            got_empty = True
            assert c["masks"].shape == (0, 32, 32)
            assert len(c["rboxes"]) == 0
        else:
            # recomputed box == tight box of the cropped mask
            ys, xs = np.nonzero(c["masks"][0])
            np.testing.assert_allclose(
                c["hboxes"][0],
                [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1])
    assert got_empty
