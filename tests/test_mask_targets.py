"""Mask-target fidelity: box-aligned full-res crops vs the legacy stride-4
decimated map (round-1 verdict: thin structures alias at stride 4 —
reference mask targets crop full-res gt masks)."""

import numpy as np
import jax.numpy as jnp

from mtp_tpu.data.loader import collate_detection
from mtp_tpu.eval.masks import crop_masks_to_boxes, paste_masks
from mtp_tpu.ops.roi_align import roi_align
from mtp_tpu.tasks.detection import mask_targets_from_crops


def thin_bar_sample(H=128, W=128, bar_y=33, bar_h=2):
    """A 2-px-thin horizontal structure (a ship wake / road at small GSD):
    stride-4 decimation at offset 33 drops it entirely."""
    mask = np.zeros((H, W), np.float32)
    mask[bar_y:bar_y + bar_h, 20:100] = 1.0
    box = np.asarray([20.0, float(bar_y), 100.0, float(bar_y + bar_h)])
    return mask, box


def test_crop_roundtrip_paste():
    mask, box = thin_bar_sample()
    crop = crop_masks_to_boxes(mask[None], box[None], 56)
    assert crop.shape == (1, 56, 56)
    assert crop.max() > 0.99  # the thin bar is fully resolved in the crop
    pasted = paste_masks(crop, box[None], 128, 128)
    inter = (pasted[0] * mask).sum()
    union = np.maximum(pasted[0], mask).sum()
    assert inter / union > 0.8  # near-lossless round trip


def test_thin_structure_targets_crop_vs_stride4():
    mask, box = thin_bar_sample()
    m = 28

    # crop path: target for the gt box itself
    crops = crop_masks_to_boxes(mask[None], box[None], 56)[None]  # (1,1,56,56)
    tgt_crop = np.asarray(mask_targets_from_crops(
        jnp.asarray(crops), jnp.asarray(box[None, None]),
        jnp.asarray(box[None]), jnp.asarray([0]), m))[0]

    # legacy path: stride-4 decimation then RoIAlign
    dec = mask[::4, ::4][None, :, :, None]
    tgt_s4 = np.asarray(roi_align(jnp.asarray(dec), jnp.asarray(box[None]),
                                  jnp.asarray([0]), m, 0.25))[0, ..., 0]

    # ground truth target: full-res crop at the roi
    want = crop_masks_to_boxes(mask[None], box[None], m)[0]

    err_crop = np.abs(tgt_crop - want).mean()
    err_s4 = np.abs(tgt_s4 - want).mean()
    assert err_crop < 0.05, err_crop
    # the decimated map lost the 2-px bar (rows 33-34 not on the stride grid)
    assert err_s4 > 10 * max(err_crop, 1e-3), (err_crop, err_s4)


def test_roi_outside_gt_box_reads_zero():
    mask, box = thin_bar_sample()
    crops = crop_masks_to_boxes(mask[None], box[None], 56)[None]
    # roi entirely right of the gt box → target all zeros
    roi = np.asarray([[110.0, 30.0, 126.0, 40.0]], np.float32)
    tgt = np.asarray(mask_targets_from_crops(
        jnp.asarray(crops), jnp.asarray(box[None, None]),
        jnp.asarray(roi), jnp.asarray([0]), 28))
    assert tgt.max() == 0.0


def test_collate_emits_crops_by_default():
    mask, box = thin_bar_sample(H=64, W=64, bar_y=17)
    s = {"image": np.zeros((64, 64, 3), np.float32),
         "hboxes": box[None].astype(np.float32),
         "labels": np.asarray([1], np.int32),
         "masks": mask[None]}
    b = collate_detection([s], max_gts=4, with_masks=True)
    assert "gt_mask_crops" in b and b["gt_mask_crops"].shape == (1, 4, 56, 56)
    assert b["gt_mask_crops"][0, 0].max() > 0.99
    # legacy mode still available
    b2 = collate_detection([s], max_gts=4, with_masks=True,
                           mask_mode="stride")
    assert "gt_masks" in b2 and b2["gt_masks"].shape == (1, 4, 16, 16)


def test_paste_masks_device_matches_numpy():
    """The batched device paste must reproduce the numpy reference
    (itself oracle-verified vs _do_paste_mask)."""
    import numpy as np
    from mtp_tpu.eval.masks import paste_masks, paste_masks_device

    rng = np.random.default_rng(0)
    N, m, H, W = 7, 14, 64, 80
    probs = rng.uniform(0, 1, (N, m, m)).astype(np.float32)
    x1 = rng.uniform(-5, 60, N)
    y1 = rng.uniform(-5, 45, N)
    boxes = np.stack([x1, y1, x1 + rng.uniform(4, 30, N),
                      y1 + rng.uniform(4, 30, N)], -1).astype(np.float32)
    ref = paste_masks(probs, boxes, H, W)
    out = np.asarray(paste_masks_device(probs, boxes, H, W))
    # bilinear values straddling the 0.5 threshold can flip on fp noise —
    # allow a sliver of disagreeing pixels
    mismatch = (ref != out).mean()
    assert mismatch < 0.002, mismatch
