"""End-to-end task tests on an 8-virtual-device CPU mesh: loss decreases,
sliding-window inference averages correctly, TP mesh compiles and runs."""

import pytest

pytestmark = pytest.mark.slow  # heavy e2e: full train-step compile

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mtp_tpu.utils.config import (BackboneConfig, MeshConfig, OptimizerConfig,
                                  ScheduleConfig, SlideConfig, TaskConfig,
                                  TrainConfig)

TINY_BB = BackboneConfig(img_size=32, patch_size=8, embed_dim=32, depth=2,
                         num_heads=2, interval=2, out_indices=(0, 1),
                         dtype="float32", drop_path_rate=0.0)
# patch_size 8 → FPN variant differs; use 16 with small image instead
TINY_BB = BackboneConfig(img_size=64, patch_size=16, embed_dim=32, depth=2,
                         num_heads=2, interval=2, out_indices=(0, 0, 1, 1),
                         dtype="float32", drop_path_rate=0.0)


def synth_cls_batches(n, bs, img, classes, seed=0):
    rng = np.random.default_rng(seed)
    while True:
        labels = rng.integers(0, classes, bs)
        # class-dependent mean so the task is learnable
        images = rng.standard_normal((bs, img, img, 3)).astype(np.float32) * 0.1
        images += labels[:, None, None, None] / classes
        yield {"image": images, "label": labels}


def synth_seg_batches(bs, img, classes, seed=0):
    rng = np.random.default_rng(seed)
    while True:
        images = rng.standard_normal((bs, img, img, 3)).astype(np.float32) * 0.1
        labels = np.zeros((bs, img, img), np.int64)
        labels[:, :, img // 2:] = 1  # left/right split, learnable from pixels
        images[:, :, img // 2:, 0] += 1.0
        yield {"image": images, "label": labels}


def test_classification_loss_decreases():
    from mtp_tpu.tasks.classification import ClassificationTask
    cfg = TaskConfig(
        task="classification", num_classes=4, backbone=TINY_BB,
        train=TrainConfig(
            batch_size=8,
            optimizer=OptimizerConfig(lr=1e-3, layer_decay=0.9),
            schedule=ScheduleConfig(kind="constant", total_steps=30),
            mesh=MeshConfig(data=8, model=1)))
    task = ClassificationTask(cfg)
    state = task.init_state(jax.random.PRNGKey(0))
    data = synth_cls_batches(30, 8, 64, 4)
    losses = []
    step = task.train_step_fn()
    from mtp_tpu.parallel.mesh import batch_sharding
    sh = batch_sharding(task.mesh)
    for i in range(25):
        b = next(data)
        b = {k: jax.device_put(jnp.asarray(v), sh) for k, v in b.items()}
        state, m = step(state, b)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_classification_tp_mesh():
    """dp=4 × tp=2: params TP-sharded, step runs, finite loss."""
    from mtp_tpu.tasks.classification import ClassificationTask
    cfg = TaskConfig(
        task="classification", num_classes=4, backbone=TINY_BB,
        train=TrainConfig(
            optimizer=OptimizerConfig(lr=1e-3),
            schedule=ScheduleConfig(kind="constant", total_steps=10),
            mesh=MeshConfig(data=4, model=2)))
    task = ClassificationTask(cfg)
    state = task.init_state(jax.random.PRNGKey(0))
    qkv = state.params["backbone"]["blocks_0"]["attn"]["qkv"]["kernel"]
    assert "model" in str(qkv.sharding.spec)
    data = synth_cls_batches(5, 8, 64, 4)
    state, metrics = task.fit(state, data, steps=3)
    assert np.isfinite(metrics["loss"])


def test_segmentation_e2e_and_slide():
    from mtp_tpu.tasks.segmentation import SegmentationTask
    cfg = TaskConfig(
        task="segmentation", num_classes=2, backbone=TINY_BB,
        train=TrainConfig(
            optimizer=OptimizerConfig(lr=3e-3),
            schedule=ScheduleConfig(kind="poly", total_steps=40),
            mesh=MeshConfig(data=8, model=1)),
        slide=SlideConfig(crop=64, stride=32))
    task = SegmentationTask(cfg)
    state = task.init_state(jax.random.PRNGKey(0))
    data = synth_seg_batches(8, 64, 2)
    state, metrics = task.fit(state, data, steps=30)
    assert np.isfinite(metrics["loss"])
    assert metrics["acc"] > 60.0, metrics  # task is trivially separable

    # eval on a larger image exercising the slide path (96 > crop 64)
    rng = np.random.default_rng(1)
    big = rng.standard_normal((8, 96, 96, 3)).astype(np.float32) * 0.1
    label = np.zeros((8, 96, 96), np.int64)
    label[:, :, 48:] = 1
    big[:, :, 48:, 0] += 1.0
    res = task.evaluate(state, iter([{"image": big, "label": label}]))
    assert res["mIoU"] > 50.0, res


def test_slide_inference_count_average():
    """Slide averaging must equal the plain forward when logits are position
    independent."""
    from mtp_tpu.eval.slide import slide_inference, slide_origins

    def apply_fn(tile):
        # logits = mean pixel value per image, broadcast
        m = tile.mean(axis=(1, 2, 3), keepdims=True)
        return jnp.broadcast_to(m, tile.shape[:3] + (1,)) * 0 + 1.0

    imgs = jnp.ones((2, 96, 80, 3))
    out = slide_inference(apply_fn, imgs, 1, SlideConfig(crop=64, stride=32))
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)
    # origins cover the full extent
    org = slide_origins(96, 80, 64, 32)
    assert org[:, 0].max() + 64 == 96 and org[:, 1].max() + 64 == 80


def test_classification_scan_tp_mesh():
    """scan=True AND model>1 (VERDICT r2 item 10): the stacked block_groups
    layout must compose with the Megatron TP rules — stacked qkv kernels get
    'model' on their LAST axis, per-slice layer-decay applies, and the step
    trains to a finite loss."""
    import dataclasses

    from mtp_tpu.tasks.classification import ClassificationTask
    bb = dataclasses.replace(TINY_BB, depth=4, out_indices=(0, 1, 2, 3),
                             scan=True)
    cfg = TaskConfig(
        task="classification", num_classes=4, backbone=bb,
        train=TrainConfig(
            optimizer=OptimizerConfig(lr=1e-3),
            schedule=ScheduleConfig(kind="constant", total_steps=10),
            mesh=MeshConfig(data=4, model=2)))
    task = ClassificationTask(cfg)
    state = task.init_state(jax.random.PRNGKey(0))
    bg = state.params["backbone"]["block_groups"]
    for blk in ("rvsa_0", "full"):
        qkv = bg[blk]["attn"]["qkv"]["kernel"]
        assert qkv.ndim == 3 and qkv.shape[0] == 2  # stacked groups
        spec = qkv.sharding.spec
        assert spec[-1] == "model", spec   # column-parallel on the last axis
        proj = bg[blk]["attn"]["proj"]["kernel"]
        assert proj.sharding.spec[-2] == "model", proj.sharding.spec
    data = synth_cls_batches(5, 8, 64, 4)
    state, metrics = task.fit(state, data, steps=3)
    assert np.isfinite(metrics["loss"])
