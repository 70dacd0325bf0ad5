"""Composed pipeline tests: mtp pretraining pipeline end-to-end to a fixed
shape; CD pipeline keeps A/B geometry aligned."""

import numpy as np

from mtp_tpu.data.pipelines import (cd_train_pipeline, cls_train_pipeline,
                                    filter_small_instances,
                                    mtp_train_pipeline, mtp_valid_pipeline,
                                    seg_train_pipeline)
from mtp_tpu.data.transforms import masks_to_boxes


def make_sample(H=96, W=120):
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
    seg = np.zeros((H, W), np.int32)
    seg[20:60, 20:80] = 3
    masks = np.zeros((2, H, W), np.uint8)
    masks[0, 20:60, 20:80] = 1
    masks[1, 70:90, 90:115] = 1
    return {"image": img, "sem_seg": seg, "hboxes": masks_to_boxes(masks),
            "labels": np.array([1, 2], np.int32), "masks": masks,
            "rboxes": np.array([[50., 40., 50., 30., 0.2]], np.float32),
            "rlabels": np.array([0], np.int32)}


def test_mtp_train_pipeline_shapes():
    pipe = mtp_train_pipeline(64)
    for seed in range(5):
        s = pipe(make_sample(), np.random.default_rng(seed))
        assert s["image"].shape == (64, 64, 3)
        assert s["sem_seg"].shape == (64, 64)
        # normalized: roughly zero-mean
        assert abs(float(s["image"].mean())) < 3.0
        if len(s["hboxes"]):
            assert s["masks"].shape[1:] == (64, 64)
            b = s["hboxes"]
            assert (b[:, 2] > b[:, 0]).all() and (b[:, 3] > b[:, 1]).all()
            assert (b >= -1e-3).all() and (b <= 64 + 1e-3).all()


def test_mtp_valid_pipeline():
    s = mtp_valid_pipeline(64)(make_sample(), np.random.default_rng(0))
    assert s["image"].shape == (64, 64, 3)


def test_filter_small():
    s = make_sample()
    s["masks"][1] = 0  # empty mask → filtered by_mask
    out = filter_small_instances(s)
    assert len(out["hboxes"]) == 1 and out["labels"].tolist() == [1]


def test_cls_pipeline():
    s = {"image": np.random.default_rng(0).uniform(0, 255, (80, 100, 3)).astype(np.float32),
         "cls_label": np.int32(3)}
    out = cls_train_pipeline(48)(s, np.random.default_rng(1))
    assert out["image"].shape == (48, 48, 3)
    assert out["cls_label"] == 3


def test_cd_pipeline_geometry_aligned():
    rng = np.random.default_rng(2)
    a = rng.uniform(0, 255, (80, 80, 3)).astype(np.float32)
    b = a.copy()
    label = np.zeros((80, 80), np.int32)
    label[10:30, 40:70] = 1
    out = cd_train_pipeline(48)({"image_a": a, "image_b": b, "label": label},
                                np.random.default_rng(3))
    assert out["image_a"].shape == (48, 48, 3)
    assert out["image_b"].shape == (48, 48, 3)
    assert out["label"].shape == (48, 48)
    # same geometric transform on both: normalized images should still be
    # equal (photometric jitter differs, so compare structure via argmax row)
    assert out["image_a"].shape == out["image_b"].shape


def test_loader_multiprocess_matches_single():
    """num_workers>0 forks decode workers; round-robin consumption keeps
    batch order identical to the in-process path."""
    import numpy as np
    from mtp_tpu.data.loader import Loader

    class DS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            r = np.random.default_rng(i)
            return {"image": r.standard_normal((8, 8, 3)).astype(np.float32),
                    "cls_label": np.int32(i % 3)}

    def collate(samples):
        return {"image": np.stack([s["image"] for s in samples]),
                "label": np.asarray([s["cls_label"] for s in samples])}

    l0 = Loader(DS(), 2, collate, shuffle=True, seed=7, num_workers=0)
    l2 = Loader(DS(), 2, collate, shuffle=True, seed=7, num_workers=2)
    b0 = list(l0.epoch(0))
    b2 = list(l2.epoch(0))
    assert len(b0) == len(b2) == 5
    for a, b in zip(b0, b2):
        np.testing.assert_array_equal(a["label"], b["label"])
        np.testing.assert_allclose(a["image"], b["image"])


def test_loader_multiprocess_error_propagates():
    import numpy as np
    import pytest
    from mtp_tpu.data.loader import Loader

    class Bad:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            if i == 2:
                raise ValueError("boom")
            return {"image": np.zeros((4, 4, 3), np.float32)}

    loader = Loader(Bad(), 2, lambda ss: {"n": len(ss)}, shuffle=False,
                    num_workers=2)
    with pytest.raises(RuntimeError, match="boom"):
        list(loader.epoch(0))


def test_cd_pipeline_ab_geometry_aligned():
    """Rotation/flip/crop draws must be identical on A and B (open-cd
    MultiImg semantics): a bright spot lands at the same place in both."""
    from mtp_tpu.data.pipelines import cd_train_pipeline
    rng = np.random.default_rng(3)
    img = np.zeros((128, 128, 3), np.float32)
    img[90:96, 20:26] = 255.0
    label = np.zeros((128, 128), np.int32)
    label[90:96, 20:26] = 1
    label[:, 64:] = 1  # ensure multi-class crops exist for cat_max_ratio
    pipe = cd_train_pipeline(crop=64)
    for _ in range(8):
        out = pipe({"image_a": img.copy(), "image_b": img.copy(),
                    "label": label.copy()}, rng)
        a, b = out["image_a"], out["image_b"]
        assert a.shape == (64, 64, 3) and b.shape == (64, 64, 3)
        # photometric differs per image but is pixel-wise: the spot (if in
        # crop) must sit at identical coordinates
        ya, xa = np.unravel_index(np.argmax(a.sum(-1)), a.shape[:2])
        yb, xb = np.unravel_index(np.argmax(b.sum(-1)), b.shape[:2])
        assert (ya, xa) == (yb, xb)
