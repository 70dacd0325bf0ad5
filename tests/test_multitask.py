"""Multi-task pretraining e2e: 9-way joint loss computes and decreases,
encoder-only export round-trips into a finetune task."""

import pytest

pytestmark = pytest.mark.slow  # heavy e2e: full train-step compile

import numpy as np
import jax
import jax.numpy as jnp

from mtp_tpu.tasks.multitask import MultiTaskPretrainTask
from mtp_tpu.utils.config import (BackboneConfig, MeshConfig, OptimizerConfig,
                                  ScheduleConfig, TaskConfig, TrainConfig)

BB = BackboneConfig(img_size=64, patch_size=16, embed_dim=32, depth=2,
                    num_heads=2, interval=2, out_indices=(0, 0, 1, 1),
                    dtype="float32", drop_path_rate=0.0)

CFG = TaskConfig(task="multitask", num_classes=0, backbone=BB,
                 train=TrainConfig(
                     optimizer=OptimizerConfig(lr=1e-3),
                     schedule=ScheduleConfig(kind="cosine", total_steps=20,
                                             warmup_steps=2),
                     mesh=MeshConfig(data=2, model=1)))

DET_OVERRIDES = dict(nms_pre=128, max_proposals=32, rpn_num=32, rcnn_num=16,
                     max_per_img=8)

CLASSES = (4, 5, 6)


def synth_batch(seed=0, B=2, size=64, G=6):
    rng = np.random.default_rng(seed)
    out = {}
    for d in range(3):
        img = rng.standard_normal((B, size, size, 3)).astype(np.float32) * 0.1
        ss = rng.integers(0, CLASSES[d], (B, size, size)).astype(np.int32)
        xy = rng.uniform(8, 40, (B, G, 2))
        wh = rng.uniform(8, 16, (B, G, 2))
        boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
        rbox = np.stack([rng.uniform(16, 48, (B, G)), rng.uniform(16, 48, (B, G)),
                         rng.uniform(10, 18, (B, G)), rng.uniform(5, 8, (B, G)),
                         rng.uniform(-1.2, 1.2, (B, G))], -1).astype(np.float32)
        valid = np.zeros((B, G), bool)
        valid[:, :3] = True
        out[f"d{d}"] = {
            "image": img, "ss_label": ss,
            "gt_boxes": boxes,
            "gt_labels": rng.integers(0, CLASSES[d] - 1, (B, G)).astype(np.int32),
            "gt_valid": valid,
            "gt_masks": np.ones((B, G, size // 4, size // 4), np.float32),
            "r_gt_boxes": rbox,
            "r_gt_labels": rng.integers(0, CLASSES[d] - 1, (B, G)).astype(np.int32),
            "r_gt_valid": valid,
        }
    return out


def data_gen():
    i = 0
    while True:
        yield synth_batch(seed=i)
        i += 1


# The e2e is split into train / validation halves so each piece compiles
# and completes in bounded time on the 1-core host (the train-step and the
# 3 predict programs are the two compile humps; with the persistent compile
# cache in conftest.py, reruns are minutes, not tens of minutes).

def _make_task():
    return MultiTaskPretrainTask(CFG, classes=CLASSES,
                                 det_overrides=DET_OVERRIDES)


def test_multitask_pretrain_train_e2e(tmp_path):
    task = _make_task()
    state = task.init_state(jax.random.PRNGKey(0))

    # 9-way loss keys present after one step
    step = task.train_step_fn()
    from mtp_tpu.parallel.mesh import batch_sharding
    sh = batch_sharding(task.mesh)
    batch = jax.tree.map(lambda v: jax.device_put(jnp.asarray(v), sh),
                         synth_batch())
    state, metrics = step(state, batch)
    keys = set(metrics)
    for d in range(3):
        assert f"ss_d{d}" in keys
        assert f"is_d{d}_loss_cls" in keys
        assert f"is_d{d}_loss_mask" in keys
        assert f"rd_d{d}_loss_cls" in keys
    assert np.isfinite(float(metrics["loss"]))

    # loss decreases over a few steps
    losses = [float(metrics["loss"])]
    gen = data_gen()
    for i in range(6):
        b = jax.tree.map(lambda v: jax.device_put(jnp.asarray(v), sh), next(gen))
        state, m = step(state, b)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert min(losses[1:]) < losses[0], losses

    # encoder-only export feeds a finetune task
    from mtp_tpu.ckpt.store import load_encoder, save_encoder
    p = str(tmp_path / "encoder.npz")
    save_encoder(p, jax.tree.map(np.asarray, state.params["encoder"]))
    enc = load_encoder(p)

    from mtp_tpu.tasks.classification import ClassificationTask
    import dataclasses
    ccfg = dataclasses.replace(CFG, task="classification", num_classes=4)
    ctask = ClassificationTask(ccfg)
    cstate = ctask.init_state(jax.random.PRNGKey(1), pretrained_backbone=enc)
    got = np.asarray(cstate.params["backbone"]["blocks_0"]["attn"]["qkv"]["kernel"])
    want = np.asarray(state.params["encoder"]["blocks_0"]["attn"]["qkv"]["kernel"])
    np.testing.assert_allclose(got, want, atol=0)


def test_multitask_validation_protocol():
    """9-way validation branch (reference validation()) on a fresh state;
    IS reports the COCO protocol incl. segm (mask-IoU) mAP like the
    reference IS metric."""
    task = _make_task()
    state = task.init_state(jax.random.PRNGKey(0))
    res = task.evaluate(state, iter([synth_batch(seed=99)]))
    for d in range(3):
        for k in (f"ss_d{d}_mIoU", f"is_d{d}_mAP50", f"is_d{d}_mAP",
                  f"is_d{d}_segm_mAP", f"rd_d{d}_mAP50"):
            assert k in res and np.isfinite(res[k]), (k, res)
    assert "mtp_accuracy" in res


def test_allocate_batch_sizes():
    from mtp_tpu.tasks.multitask import allocate_batch_sizes
    # SAMRS-like lengths (SOTA 17480, SIOR 23463, FAST 64147 patches)
    sizes = allocate_batch_sizes(24, (17480, 23463, 64147), mode="ratio")
    assert sum(sizes) == 24 and min(sizes) >= 1
    assert sizes[2] > sizes[1] > sizes[0]
    assert allocate_batch_sizes(24, (1, 1, 1), mode="avg") == (8, 8, 8)
    # rounding drift spreads instead of landing on one dataset
    assert allocate_batch_sizes(8, (8, 4, 4), mode="avg") == (3, 3, 2)
    # negative drift never starves a min-size dataset
    assert allocate_batch_sizes(4, (100, 1, 1), mode="ratio") == (2, 1, 1)
    import pytest
    with pytest.raises(ValueError):
        allocate_batch_sizes(2, (5, 5, 5), mode="avg")
