"""Accuracy gates: overfit-train through the REAL train step, then assert
the REAL eval path reports a GOOD metric (VERDICT r4 item 1).

The reference's correctness evidence is its committed finetune logs with
final metric values (RS_Tasks_Finetune/*/logs/*.json, e.g. eurosat
rvsa-l-mae-mtp.json ends at accuracy/top1=98.78).  Real datasets are not
mounted here, so the achievable proxy is: train a tiny-dim model on a FIXED
learnable fixture until it overfits, run `task.evaluate` (the same predict →
unpad → NMS → mAP pipeline real validation uses), and assert the metric
reaches a high absolute value.  A miscalibrated predict path (score
thresholds, test-time delta decode, NMS config, eval matching) fails these
gates even while every loss-decreases test passes.

Calibration (CPU, fixed seeds): horizontal reaches mAP 87-100 by step 50,
rotated 75-87.5 by step 50; gates assert >= 60 at step 150 for margin.
"""

import pytest

pytestmark = pytest.mark.slow  # heavy e2e: full train-step compiles

import numpy as np
import jax
import jax.numpy as jnp

from mtp_tpu.tasks.detection_task import DetectionTask
from mtp_tpu.utils.config import (BackboneConfig, MeshConfig, OptimizerConfig,
                                  ScheduleConfig, TaskConfig, TrainConfig)

BB = BackboneConfig(img_size=64, patch_size=16, embed_dim=32, depth=2,
                    num_heads=2, interval=2, out_indices=(0, 0, 1, 1),
                    dtype="float32", drop_path_rate=0.0)

OV = dict(nms_pre=128, max_proposals=32, rpn_num=64, rcnn_num=32,
          max_per_img=8, max_gts=8)


def det_cfg(rotated, steps, lr=1e-3):
    return TaskConfig(
        task="detection_r" if rotated else "detection_h",
        num_classes=2, backbone=BB,
        train=TrainConfig(
            optimizer=OptimizerConfig(lr=lr, layer_decay=1.0),
            schedule=ScheduleConfig(kind="constant", total_steps=steps),
            mesh=MeshConfig(data=1, model=1)))


def det_fixture(rotated, B=4, size=64, G=8, seed=0, with_mask=False):
    """Learnable detection fixture: 2 solid axis-aligned rectangles per
    image, class = which RGB channel is bright; geometry fixed per seed so
    a fixed-batch loop can overfit.  Box sizes 26-40px sit at the stride-4
    scale-8 anchors (32px) so the RPN assigner gets IoU>=0.5 matches."""
    rng = np.random.default_rng(seed)
    img = np.zeros((B, size, size, 3), np.float32)
    boxes = np.zeros((B, G, 5 if rotated else 4), np.float32)
    labels = np.zeros((B, G), np.int32)
    valid = np.zeros((B, G), bool)
    masks = np.zeros((B, G, size // 4, size // 4), np.float32)
    for b in range(B):
        for j in range(2):
            w, h = int(rng.integers(26, 40)), int(rng.integers(22, 36))
            x = int(rng.integers(2, size - w - 2))
            y = int(rng.integers(2, size - h - 2))
            cls = int(rng.integers(0, 2))
            img[b, y:y + h, x:x + w, cls] = 1.0
            if rotated:
                # le90 canonical: width = the long side
                if w >= h:
                    boxes[b, j] = (x + w / 2, y + h / 2, w, h, 0.0)
                else:
                    boxes[b, j] = (x + w / 2, y + h / 2, h, w, np.pi / 2)
            else:
                boxes[b, j] = (x, y, x + w, y + h)
            masks[b, j, y // 4:(y + h) // 4, x // 4:(x + w) // 4] = 1.0
            labels[b, j] = cls
            valid[b, j] = True
    batch = {"image": img, "gt_boxes": boxes, "gt_labels": labels,
             "gt_valid": valid}
    if with_mask:
        batch["gt_masks"] = masks
    return batch


def _overfit_and_eval(head, rotated, steps=150):
    task = DetectionTask(det_cfg(rotated, steps), head=head,
                         det_overrides=OV)
    state = task.init_state(jax.random.PRNGKey(0))
    batch = det_fixture(rotated)
    init = task.evaluate(state, iter([batch]))
    jb = jax.tree.map(jnp.asarray, batch)
    step = task.train_step_fn()
    for _ in range(steps):
        state, m = step(state, jb)
    final = task.evaluate(state, iter([batch]))
    return init, final, m


def test_faster_rcnn_overfit_map_gate():
    """Train->predict->eval agreement, horizontal: the evaluated VOC AP50
    must reach a HIGH value after overfitting (calibrated 87-100 by step
    150; gate at 60)."""
    init, final, m = _overfit_and_eval("faster_rcnn", rotated=False)
    assert np.isfinite(m["loss"])
    assert final["mAP"] >= 60.0, (init, final)
    assert final["mAP"] >= init["mAP"] + 50.0, (init, final)


def test_oriented_rcnn_overfit_map_gate():
    """Rotated counterpart (DIOR-R protocol eval path: rotated IoU matching,
    nms_rotated, midpoint/delta decode).  Calibrated 75-87.5 by step 150;
    gate at 60."""
    init, final, m = _overfit_and_eval("oriented_rcnn", rotated=True)
    assert np.isfinite(m["loss"])
    assert final["mAP"] >= 60.0, (init, final)
    assert final["mAP"] >= init["mAP"] + 50.0, (init, final)


def test_multitask_overfit_mtp_accuracy_gate():
    """9-way multitask: overfit the joint model on a learnable 3-dataset
    fixture, then run the REAL `task.evaluate` (per-dataset mIoU + COCO
    bbox/segm + rotated mAP + averaged mtp_accuracy) and assert the metric
    rises materially from init (reference: validation()'s averaged MTP
    accuracy, main_pretrain.py:645-667).  Calibrated: 9.3 -> 91.2 by step
    50 (CPU, fixed seeds); gated at >= 70 after 60 steps."""
    from mtp_tpu.tasks.multitask import MultiTaskPretrainTask

    steps = 60
    cfg = TaskConfig(
        task="multitask", num_classes=0, backbone=BB,
        train=TrainConfig(
            optimizer=OptimizerConfig(lr=1e-3, layer_decay=1.0),
            schedule=ScheduleConfig(kind="constant", total_steps=steps),
            mesh=MeshConfig(data=1, model=1)))
    classes = (3, 3, 3)  # incl. background: 2 fg classes per dataset
    task = MultiTaskPretrainTask(
        cfg, classes=classes,
        det_overrides=dict(nms_pre=128, max_proposals=32, rpn_num=64,
                           rcnn_num=32, max_per_img=8, max_gts=8))
    state = task.init_state(jax.random.PRNGKey(0))

    batch = {}
    for d in range(3):
        rng = np.random.default_rng(100 + d)
        B, size, G = 2, 64, 8
        img = np.zeros((B, size, size, 3), np.float32)
        ss = np.zeros((B, size, size), np.int32)
        boxes = np.zeros((B, G, 4), np.float32)
        rboxes = np.zeros((B, G, 5), np.float32)
        labels = np.zeros((B, G), np.int32)
        valid = np.zeros((B, G), bool)
        masks = np.zeros((B, G, size // 4, size // 4), np.float32)
        for b in range(B):
            for j in range(2):
                w, h = int(rng.integers(26, 40)), int(rng.integers(22, 36))
                x = int(rng.integers(2, size - w - 2))
                y = int(rng.integers(2, size - h - 2))
                cls = int(rng.integers(0, 2))
                img[b, y:y + h, x:x + w, cls] = 1.0
                ss[b, y:y + h, x:x + w] = cls + 1
                boxes[b, j] = (x, y, x + w, y + h)
                if w >= h:
                    rboxes[b, j] = (x + w / 2, y + h / 2, w, h, 0.0)
                else:
                    rboxes[b, j] = (x + w / 2, y + h / 2, h, w, np.pi / 2)
                masks[b, j, y // 4:(y + h) // 4, x // 4:(x + w) // 4] = 1.0
                labels[b, j] = cls
                valid[b, j] = True
        batch[f"d{d}"] = {
            "image": img, "ss_label": ss,
            "gt_boxes": boxes, "gt_labels": labels, "gt_valid": valid,
            "gt_masks": masks,
            "r_gt_boxes": rboxes, "r_gt_labels": labels.copy(),
            "r_gt_valid": valid.copy(),
        }

    init = task.evaluate(state, iter([batch]))
    jb = jax.tree.map(jnp.asarray, batch)
    step = task.train_step_fn()
    for _ in range(steps):
        state, m = step(state, jb)
    final = task.evaluate(state, iter([batch]))
    assert np.isfinite(float(m["loss"]))
    assert final["mtp_accuracy"] >= 70.0, (init, final)
    assert final["mtp_accuracy"] >= init["mtp_accuracy"] + 50.0, (init, final)
    # every one of the 9 task×dataset metrics must have moved off zero
    for d in range(3):
        assert final[f"ss_d{d}_mIoU"] > 50.0, final
        assert final[f"is_d{d}_mAP50"] > 40.0, final
        assert final[f"rd_d{d}_mAP50"] > 40.0, final
