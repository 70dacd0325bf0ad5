"""Detection end-to-end: loss computes/decreases, predict returns sane padded
detections, for both Faster R-CNN (+mask) and Oriented R-CNN — tiny configs."""

import pytest

pytestmark = pytest.mark.slow  # heavy e2e: full train-step compile

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mtp_tpu.models.detector import DetConfig, TwoStageDetector, oriented_rcnn_cfg
from mtp_tpu.tasks.detection import (anchors_for, detection_loss,
                                     detection_predict)
from mtp_tpu.utils.config import BackboneConfig

BB = BackboneConfig(img_size=64, patch_size=16, embed_dim=32, depth=2,
                    num_heads=2, interval=2, out_indices=(0, 0, 1, 1),
                    dtype="float32", drop_path_rate=0.0)

SMALL = dict(num_classes=3, nms_pre=256, max_proposals=64, rpn_num=64,
             rcnn_num=32, max_per_img=16, max_gts=8)


def make_batch(rotated, with_mask=False, B=2, size=64, G=8, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.standard_normal((B, size, size, 3)).astype(np.float32) * 0.1
    n_valid = 3
    if rotated:
        boxes = np.zeros((B, G, 5), np.float32)
        boxes[:, :n_valid, 0] = rng.uniform(16, 48, (B, n_valid))
        boxes[:, :n_valid, 1] = rng.uniform(16, 48, (B, n_valid))
        boxes[:, :n_valid, 2] = rng.uniform(12, 20, (B, n_valid))
        boxes[:, :n_valid, 3] = rng.uniform(6, 10, (B, n_valid))
        boxes[:, :n_valid, 4] = rng.uniform(-1.2, 1.2, (B, n_valid))
    else:
        xy = rng.uniform(8, 40, (B, G, 2))
        wh = rng.uniform(8, 20, (B, G, 2))
        boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    labels = rng.integers(0, 3, (B, G)).astype(np.int32)
    valid = np.zeros((B, G), bool)
    valid[:, :n_valid] = True
    batch = {"image": img, "gt_boxes": boxes, "gt_labels": labels,
             "gt_valid": valid}
    if with_mask:
        m = np.zeros((B, G, size // 4, size // 4), np.float32)
        m[:, :, 4:12, 4:12] = 1.0
        batch["gt_masks"] = m
    return batch


@pytest.mark.parametrize("rotated", [False, True])
def test_detection_loss_and_predict(rotated):
    if rotated:
        det = dataclasses.replace(oriented_rcnn_cfg(3), **{
            k: v for k, v in SMALL.items() if k != "num_classes"})
    else:
        det = DetConfig(**SMALL)
    model = TwoStageDetector(BB, det)
    batch = make_batch(rotated)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(batch["image"][:1]))
    anchors = anchors_for(det, (64, 64))

    @jax.jit
    def loss_fn(variables, batch, rng):
        return detection_loss(model, variables, batch, rng, anchors)

    total, metrics = loss_fn(variables,
                             jax.tree.map(jnp.asarray, batch),
                             jax.random.PRNGKey(1))
    assert np.isfinite(float(total)), metrics
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)
    assert float(metrics["loss_rpn_cls"]) > 0

    dets = jax.jit(lambda v, im: detection_predict(model, v, im, anchors))(
        variables, jnp.asarray(batch["image"]))
    N = det.max_per_img
    assert dets.boxes.shape == (2, N, 5 if rotated else 4)
    assert dets.scores.shape == (2, N)
    v = np.asarray(dets.valid)
    s = np.asarray(dets.scores)
    # valid dets have finite scores above threshold
    assert (s[v] > det.score_thr).all()


def test_detection_train_decreases():
    det = DetConfig(**SMALL)
    model = TwoStageDetector(BB, det)
    batch = jax.tree.map(jnp.asarray, make_batch(False))
    variables = model.init(jax.random.PRNGKey(0), batch["image"][:1])
    anchors = anchors_for(det, (64, 64))

    import optax
    tx = optax.adam(1e-3)
    params = variables["params"]
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, rng):
        def lf(p):
            total, m = detection_loss(model, {"params": p}, batch, rng, anchors)
            return total, m
        (l, m), g = jax.value_and_grad(lf, has_aux=True)(params)
        up, opt2 = tx.update(g, opt)
        return optax.apply_updates(params, up), opt2, l

    losses = []
    for i in range(6):
        params, opt, l = step(params, opt, jax.random.PRNGKey(i))
        losses.append(float(l))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_mask_rcnn_loss():
    det = DetConfig(with_mask=True, **SMALL)
    model = TwoStageDetector(BB, det)
    batch = make_batch(False, with_mask=True)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(batch["image"][:1]))
    anchors = anchors_for(det, (64, 64))
    total, metrics = jax.jit(
        lambda v, b, r: detection_loss(model, v, b, r, anchors))(
        variables, jax.tree.map(jnp.asarray, batch), jax.random.PRNGKey(1))
    assert "loss_mask" in metrics and np.isfinite(float(metrics["loss_mask"]))

    dets = jax.jit(lambda v, im: detection_predict(model, v, im, anchors))(
        variables, jnp.asarray(batch["image"]))
    assert dets.mask_logits.shape == (2, det.max_per_img, 28, 28)


def test_no_gt_image_all_negatives():
    """An image with zero valid gts must still produce finite losses."""
    det = DetConfig(**SMALL)
    model = TwoStageDetector(BB, det)
    batch = make_batch(False)
    batch["gt_valid"][:] = False
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(batch["image"][:1]))
    anchors = anchors_for(det, (64, 64))
    total, metrics = jax.jit(
        lambda v, b, r: detection_loss(model, v, b, r, anchors))(
        variables, jax.tree.map(jnp.asarray, batch), jax.random.PRNGKey(1))
    assert np.isfinite(float(total))
    assert float(metrics["loss_bbox"]) == 0.0  # no positives → no reg loss
