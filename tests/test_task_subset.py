"""Task-subset selection (reference main_pretrain.py --tasks; the torch
model gates forward/loss on args.tasks at models.py:375,386,435 while every
decoder is still constructed).  Our MultiTaskPretrainModel mirrors that: the
param tree is task-independent, only selected branches run."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mtp_tpu.models.multitask import MultiTaskPretrainModel
from mtp_tpu.tasks.detection import anchors_for
from mtp_tpu.tasks.multitask import MultiTaskPretrainTask
from mtp_tpu.utils.config import (BackboneConfig, MeshConfig, OptimizerConfig,
                                  ScheduleConfig, TaskConfig, TrainConfig)

BB = BackboneConfig(img_size=64, patch_size=16, embed_dim=32, depth=2,
                    num_heads=2, interval=2, out_indices=(0, 0, 1, 1),
                    dtype="float32", drop_path_rate=0.0)
CLASSES = (4, 5, 6)
DET_OVERRIDES = dict(nms_pre=64, max_proposals=16, rpn_num=16, rcnn_num=8,
                     max_per_img=4)


def _batches(B=1, size=64, G=4, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for d in range(3):
        xy = rng.uniform(8, 40, (B, G, 2))
        wh = rng.uniform(8, 16, (B, G, 2))
        valid = np.zeros((B, G), bool)
        valid[:, :2] = True
        out.append({
            "image": rng.standard_normal((B, size, size, 3)).astype(np.float32) * 0.1,
            "ss_label": rng.integers(0, CLASSES[d], (B, size, size)).astype(np.int32),
            "gt_boxes": np.concatenate([xy, xy + wh], -1).astype(np.float32),
            "gt_labels": rng.integers(0, CLASSES[d] - 1, (B, G)).astype(np.int32),
            "gt_valid": valid,
            "gt_masks": np.ones((B, G, size // 4, size // 4), np.float32),
            "r_gt_boxes": np.stack(
                [rng.uniform(16, 48, (B, G)), rng.uniform(16, 48, (B, G)),
                 rng.uniform(10, 18, (B, G)), rng.uniform(5, 8, (B, G)),
                 rng.uniform(-1.2, 1.2, (B, G))], -1).astype(np.float32),
            "r_gt_labels": rng.integers(0, CLASSES[d] - 1, (B, G)).astype(np.int32),
            "r_gt_valid": valid,
        })
    return jax.tree.map(jnp.asarray, out)


def _loss_keys(tasks):
    model = MultiTaskPretrainModel(BB, CLASSES, dict(DET_OVERRIDES),
                                   tasks=tasks)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((2, 64, 64, 3), jnp.float32))
    anchors = anchors_for(None, (64, 64))
    (total, losses), _ = model.apply(
        variables, _batches(), jax.random.PRNGKey(1), anchors, False,
        method=MultiTaskPretrainModel.loss,
        rngs={"dropout": jax.random.PRNGKey(2)}, mutable=["batch_stats"])
    assert np.isfinite(float(total))
    return variables, set(losses)


def test_subset_loss_keys_and_param_tree():
    v_ss, keys_ss = _loss_keys(("ss",))
    assert keys_ss == {"ss_d0", "ss_d1", "ss_d2"}

    v_full, keys_full = _loss_keys(("ss", "is", "rd"))
    assert any(k.startswith("is_d1") for k in keys_full)
    assert any(k.startswith("rd_d2") for k in keys_full)

    # decoder construction is task-independent (reference builds every
    # decoder regardless of --tasks): identical param trees
    ss_tree = jax.tree_util.tree_structure(v_ss["params"])
    full_tree = jax.tree_util.tree_structure(v_full["params"])
    assert ss_tree == full_tree


def test_subset_grads_flow_only_into_selected_heads():
    model = MultiTaskPretrainModel(BB, CLASSES, dict(DET_OVERRIDES),
                                   tasks=("is",))
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((2, 64, 64, 3), jnp.float32))
    anchors = anchors_for(None, (64, 64))
    batches = _batches()

    def loss_fn(params):
        (total, _), _ = model.apply(
            {"params": params, **{k: v for k, v in variables.items()
                                  if k != "params"}},
            batches, jax.random.PRNGKey(1), anchors, False,
            method=MultiTaskPretrainModel.loss,
            rngs={"dropout": jax.random.PRNGKey(2)}, mutable=["batch_stats"])
        return total

    grads = jax.grad(loss_fn)(variables["params"])
    l2 = {k: float(sum(jnp.sum(jnp.square(x))
                       for x in jax.tree_util.tree_leaves(v)))
          for k, v in grads.items()}
    assert l2["encoder"] > 0
    assert l2["is_rpn"] > 0 and l2["is_bbox_trunk"] > 0
    assert l2["ss_trunk"] == 0 and l2["ss_head_0"] == 0
    assert l2["rd_rpn"] == 0 and l2["rd_bbox_trunk"] == 0


def test_subset_inactive_params_frozen_through_train_step():
    """torch AdamW never touches grad=None params; with a --tasks subset the
    gated-off decoders must stay bit-identical through real train steps
    (optax add_decayed_weights would otherwise decay zero-grad leaves)."""
    cfg = TaskConfig(task="multitask", num_classes=0, backbone=BB,
                     train=TrainConfig(
                         optimizer=OptimizerConfig(lr=1e-2, weight_decay=0.5),
                         schedule=ScheduleConfig(kind="cosine", total_steps=20,
                                                 warmup_steps=0),
                         mesh=MeshConfig(data=1, model=1)))
    task = MultiTaskPretrainTask(cfg, classes=CLASSES,
                                 det_overrides=DET_OVERRIDES, tasks=("ss",))
    state = task.init_state(jax.random.PRNGKey(0))
    before = jax.tree.map(np.asarray, state.params)
    step = task.train_step_fn()
    batch = {f"d{d}": b for d, b in enumerate(_batches(B=1, seed=4))}
    for _ in range(2):
        state, _ = step(state, batch)
    after = jax.tree.map(np.asarray, state.params)
    for k in before:
        changed = any(
            not np.array_equal(a, b) for a, b in zip(
                jax.tree_util.tree_leaves(after[k]),
                jax.tree_util.tree_leaves(before[k])))
        if k.startswith(("is_", "rd_")):
            assert not changed, f"inactive branch {k} moved"
        elif k == "encoder" or k.startswith("ss_"):
            assert changed, f"active branch {k} did not train"


def test_subset_validation_metrics():
    cfg = TaskConfig(task="multitask", num_classes=0, backbone=BB,
                     train=TrainConfig(
                         optimizer=OptimizerConfig(lr=1e-3),
                         schedule=ScheduleConfig(kind="cosine", total_steps=20,
                                                 warmup_steps=2),
                         mesh=MeshConfig(data=1, model=1)))
    task = MultiTaskPretrainTask(cfg, classes=CLASSES,
                                 det_overrides=DET_OVERRIDES, tasks=("ss",))
    state = task.init_state(jax.random.PRNGKey(0))
    batch = {f"d{d}": b for d, b in enumerate(_batches(B=2, seed=3))}
    res = task.evaluate(state, iter([batch]))
    assert all(np.isfinite(res[f"ss_d{d}_mIoU"]) for d in range(3))
    assert not any(k.startswith(("is_", "rd_")) for k in res)
    assert "mtp_accuracy" in res

    with pytest.raises(ValueError):
        MultiTaskPretrainTask(cfg, classes=CLASSES, tasks=())
    with pytest.raises(ValueError):
        MultiTaskPretrainTask(cfg, classes=CLASSES, tasks=("ss", "bogus"))
