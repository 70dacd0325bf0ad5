"""RetinaNet: anchors, loss finiteness/decrease, padded prediction."""

import pytest

pytestmark = pytest.mark.slow  # heavy e2e: full train-step compile

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from mtp_tpu.models.retinanet import (RetinaConfig, RetinaNet, focal_loss,
                                      retina_anchors, retinanet_loss,
                                      retinanet_predict)
from mtp_tpu.utils.config import BackboneConfig

BB = BackboneConfig(img_size=64, patch_size=16, embed_dim=32, depth=2,
                    num_heads=2, interval=2, out_indices=(0, 0, 1, 1),
                    dtype="float32", drop_path_rate=0.0)
DET = RetinaConfig(num_classes=5, max_per_img=16, nms_pre=128, max_gts=8)


def batch(seed=0, B=2, G=8):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(4, 40, (B, G, 2))
    wh = rng.uniform(8, 20, (B, G, 2))
    valid = np.zeros((B, G), bool)
    valid[:, :4] = True
    return {
        "image": rng.standard_normal((B, 64, 64, 3)).astype(np.float32) * 0.1,
        "gt_boxes": np.concatenate([xy, xy + wh], -1).astype(np.float32),
        "gt_labels": rng.integers(0, 5, (B, G)).astype(np.int32),
        "gt_valid": valid,
    }


def test_anchor_count():
    a = retina_anchors(DET, (64, 64))
    # strides 8..128 on 64²: 8²+4²+2²+1+1 = 86 locations × 9 anchors
    assert a.shape == (86 * 9, 4)
    # octave scales: base size stride*4
    w0 = a[4, 2] - a[4, 0]  # ratio 1.0 anchor at stride 8... check any area
    areas = (a[:9, 2] - a[:9, 0]) * (a[:9, 3] - a[:9, 1])
    np.testing.assert_allclose(sorted(set(np.round(areas, 2)))[0],
                               (8 * 4) ** 2, rtol=1e-3)


def test_focal_loss_basics():
    logits = jnp.asarray([[10.0, -10.0], [-10.0, -10.0]])
    labels = jnp.asarray([0, 2])  # second = background (num_classes=2)
    valid = jnp.asarray([True, True])
    l = focal_loss(logits, labels, valid, 2, 2.0, 0.25)
    assert float(l) < 0.1  # confident & correct → tiny loss
    wrong = jnp.asarray([[-10.0, 10.0], [10.0, 10.0]])
    l2 = focal_loss(wrong, labels, valid, 2, 2.0, 0.25)
    assert float(l2) > 1.0


def test_loss_and_predict():
    model = RetinaNet(BB, DET)
    b = batch()
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(b["image"][:1]))
    anchors = retina_anchors(DET, (64, 64))
    total, losses = jax.jit(
        lambda v, b: retinanet_loss(model, v, b, anchors))(
        variables, jax.tree.map(jnp.asarray, b))
    assert np.isfinite(float(total)), losses
    assert float(losses["loss_bbox"]) > 0  # anchors do match gts at octave scales

    dets = jax.jit(lambda v, im: retinanet_predict(model, v, im, anchors))(
        variables, jnp.asarray(b["image"]))
    assert dets.boxes.shape == (2, 16, 4)
    s = np.asarray(dets.scores)
    v = np.asarray(dets.valid)
    assert (s[v] > DET.score_thr).all() if v.any() else True


def test_train_decreases():
    import optax
    model = RetinaNet(BB, DET)
    b = jax.tree.map(jnp.asarray, batch())
    variables = model.init(jax.random.PRNGKey(0), b["image"][:1])
    anchors = retina_anchors(DET, (64, 64))
    tx = optax.adam(1e-3)
    params = variables["params"]
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        (l, _), g = jax.value_and_grad(
            lambda p: retinanet_loss(model, {"params": p}, b, anchors),
            has_aux=True)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, l

    losses = []
    for _ in range(6):
        params, opt, l = step(params, opt)
        losses.append(float(l))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
