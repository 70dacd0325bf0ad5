"""Detection task driver e2e (Faster R-CNN + RetinaNet heads), mask pasting,
and orbax checkpoint save/restore round-trip."""

import pytest

pytestmark = pytest.mark.slow  # heavy e2e: full train-step compile

import numpy as np
import jax
import jax.numpy as jnp

from mtp_tpu.tasks.detection_task import DetectionTask
from mtp_tpu.utils.config import (BackboneConfig, MeshConfig, OptimizerConfig,
                                  ScheduleConfig, TaskConfig, TrainConfig)

BB = BackboneConfig(img_size=64, patch_size=16, embed_dim=32, depth=2,
                    num_heads=2, interval=2, out_indices=(0, 0, 1, 1),
                    dtype="float32", drop_path_rate=0.0)

CFG = TaskConfig(task="detection_h", num_classes=3, backbone=BB,
                 train=TrainConfig(
                     optimizer=OptimizerConfig(lr=1e-3),
                     schedule=ScheduleConfig(kind="constant", total_steps=10),
                     mesh=MeshConfig(data=2, model=1)))

OV = dict(nms_pre=128, max_proposals=32, rpn_num=32, rcnn_num=16,
          max_per_img=8)


def batches(seed=0, B=2, G=6):
    rng = np.random.default_rng(seed)
    while True:
        xy = rng.uniform(8, 40, (B, G, 2))
        wh = rng.uniform(8, 20, (B, G, 2))
        valid = np.zeros((B, G), bool)
        valid[:, :3] = True
        yield {
            "image": rng.standard_normal((B, 64, 64, 3)).astype(np.float32) * 0.1,
            "gt_boxes": np.concatenate([xy, xy + wh], -1).astype(np.float32),
            "gt_labels": rng.integers(0, 3, (B, G)).astype(np.int32),
            "gt_valid": valid,
        }


def test_faster_rcnn_task_fit_and_eval():
    task = DetectionTask(CFG, head="faster_rcnn", det_overrides=OV)
    state = task.init_state(jax.random.PRNGKey(0))
    gen = batches()
    state, m = task.fit(state, gen, steps=3)
    assert np.isfinite(m["loss"])
    res = task.evaluate(state, iter([next(gen)]))
    assert "mAP" in res and np.isfinite(res["mAP"])


def test_retinanet_task():
    ov = dict(nms_pre=64, max_per_img=8)
    task = DetectionTask(CFG, head="retinanet", det_overrides=ov)
    state = task.init_state(jax.random.PRNGKey(0))
    gen = batches()
    state, m = task.fit(state, gen, steps=2)
    assert np.isfinite(m["loss"])
    res = task.evaluate(state, iter([next(gen)]))
    assert np.isfinite(res["mAP"])


def test_paste_masks():
    from mtp_tpu.eval.masks import paste_masks
    probs = np.ones((1, 4, 4), np.float32)
    out = paste_masks(probs, np.asarray([[2.0, 3.0, 9.0, 8.0]]), 12, 12)
    assert out.shape == (1, 12, 12)
    assert out[0, 4, 4] == 1 and out[0, 0, 0] == 0
    # area ≈ box area
    assert abs(int(out[0].sum()) - 7 * 5) <= 7 + 5
    # half-on mask: left half 1s
    probs2 = np.zeros((1, 4, 4), np.float32)
    probs2[0, :, :2] = 1.0
    out2 = paste_masks(probs2, np.asarray([[0.0, 0.0, 8.0, 8.0]]), 8, 8)
    assert out2[0, 4, 1] == 1 and out2[0, 4, 6] == 0


def test_orbax_roundtrip(tmp_path):
    from mtp_tpu.ckpt.store import CheckpointStore
    from mtp_tpu.tasks.classification import ClassificationTask
    import dataclasses
    cfg = dataclasses.replace(CFG, task="classification", num_classes=4)
    task = ClassificationTask(cfg)
    state = task.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    data = iter([{"image": rng.standard_normal((2, 64, 64, 3)).astype(np.float32),
                  "label": rng.integers(0, 4, 2)} for _ in range(3)])
    state, _ = task.fit(state, data, steps=3)

    store = CheckpointStore(str(tmp_path / "ckpt"))
    store.save(int(state.step), state, wait=True)
    assert store.latest_step() == 3

    fresh = task.init_state(jax.random.PRNGKey(1))
    restored = store.restore(fresh)
    assert int(restored.step) == 3
    a = np.asarray(state.params["head"]["fc"]["kernel"])
    b = np.asarray(restored.params["head"]["fc"]["kernel"])
    np.testing.assert_array_equal(a, b)

    # restored state must TRAIN: a restore that commits leaves to a single
    # device while others sit on the mesh makes the jitted step reject the
    # state (regression: opt_state came back SingleDeviceSharding)
    data = iter([{"image": rng.standard_normal((2, 64, 64, 3)).astype(np.float32),
                  "label": rng.integers(0, 4, 2)} for _ in range(2)])
    restored, m = task.fit(restored, data, steps=2)
    assert int(restored.step) == 5 and np.isfinite(m["loss"])
    store.close()


def test_opt_state_shardings_committed_and_tp():
    """shard_state gives the optimizer state explicit mesh shardings:
    moments inherit the param layout (TP-sharded qkv moments), scalars are
    replicated — never uncommitted single-device leaves."""
    import dataclasses
    import jax.tree_util as jtu
    from jax.sharding import NamedSharding
    from mtp_tpu.tasks.classification import ClassificationTask

    cfg = dataclasses.replace(
        CFG, task="classification", num_classes=4,
        train=dataclasses.replace(CFG.train, mesh=MeshConfig(data=2, model=2)))
    task = ClassificationTask(cfg)
    state = task.init_state(jax.random.PRNGKey(0))
    for kp, leaf in jtu.tree_flatten_with_path(state.opt_state)[0]:
        assert isinstance(leaf.sharding, NamedSharding), (
            jtu.keystr(kp), leaf.sharding)
        ks = jtu.keystr(kp)
        if "qkv" in ks and "kernel" in ks:
            assert "model" in str(leaf.sharding.spec), (ks, leaf.sharding.spec)
