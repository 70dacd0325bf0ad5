"""End-to-end SAMRS data-path integration: synthetic on-disk dataset (images
+ COCO instance json + seg PNGs + DOTA txts) → MultiTaskDataset → pretrain
pipeline → Loader/collate_multitask → one multitask training step."""

import pytest

pytestmark = pytest.mark.slow  # heavy e2e: full train-step compile

import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from PIL import Image

from mtp_tpu.data.datasets import MultiTaskDataset
from mtp_tpu.data.loader import Loader, collate_multitask
from mtp_tpu.data.parsers import mask_to_rle
from mtp_tpu.data.pipelines import mtp_train_pipeline


CLASSES = ("background", "plane", "ship")  # 3 incl. background


def build_dataset(root, n=6, size=48):
    img_dir = root / "images"
    seg_dir = root / "segs"
    rot_dir = root / "rboxes"
    for d in (img_dir, seg_dir, rot_dir):
        d.mkdir()
    rng = np.random.default_rng(0)
    images, annotations = [], []
    ann_id = 0
    for i in range(n):
        name = f"im{i}.png"
        Image.fromarray(rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
                        ).save(img_dir / name)
        # one instance per image
        mask = np.zeros((size, size), np.uint8)
        y0, x0 = rng.integers(4, size // 2, 2)
        mask[y0:y0 + 12, x0:x0 + 16] = 1
        images.append({"id": i, "file_name": name, "height": size,
                       "width": size})
        annotations.append({
            "id": ann_id, "image_id": i, "category_id": int(rng.integers(0, 2)),
            "bbox": [int(x0), int(y0), 16, 12], "area": 192, "iscrowd": 0,
            "segmentation": mask_to_rle(mask)})
        ann_id += 1
        # semantic map (class+1 convention) + rotated annotation
        seg = mask.astype(np.uint8) * 2
        Image.fromarray(seg).save(seg_dir / f"im{i}.png")
        cx, cy = x0 + 8, y0 + 6
        quad = f"{cx-8} {cy-4} {cx+8} {cy-4} {cx+8} {cy+4} {cx-8} {cy+4}"
        (rot_dir / f"im{i}.txt").write_text(f"{quad} ship 0\n")

    ann_json = root / "ins.json"
    ann_json.write_text(json.dumps({
        "images": images, "annotations": annotations,
        "categories": [{"id": 0, "name": "plane"}, {"id": 1, "name": "ship"}],
    }))
    return MultiTaskDataset(str(img_dir), str(ann_json), str(seg_dir),
                            str(rot_dir), CLASSES, rot_format="dota",
                            pipeline=mtp_train_pipeline(32))


def test_samrs_path_to_train_step(tmp_path):
    ds = build_dataset(tmp_path)
    assert len(ds) == 6
    s = ds[0]
    assert s["image"].shape == (32, 32, 3)
    assert s["sem_seg"].shape == (32, 32)

    loader = Loader(ds, batch_size=2,
                    collate=lambda xs: collate_multitask(xs, max_gts=4,
                                                         mask_stride=4))
    batch_d = next(iter(loader.epoch(0)))
    assert batch_d["image"].shape == (2, 32, 32, 3)
    # masks collate as box-aligned full-res crops (mask-target fidelity)
    assert batch_d["gt_mask_crops"].shape == (2, 4, 56, 56)
    assert batch_d["r_gt_boxes"].shape == (2, 4, 5)

    # one real multitask step over the on-disk data (same batch for all 3
    # pseudo-datasets)
    from mtp_tpu.tasks.multitask import MultiTaskPretrainTask
    from mtp_tpu.utils.config import (BackboneConfig, MeshConfig,
                                      OptimizerConfig, ScheduleConfig,
                                      TaskConfig, TrainConfig)
    bb = BackboneConfig(img_size=32, patch_size=16, embed_dim=32, depth=2,
                        num_heads=2, interval=2, out_indices=(0, 0, 1, 1),
                        dtype="float32", drop_path_rate=0.0)
    cfg = TaskConfig(task="multitask", num_classes=0, backbone=bb,
                     train=TrainConfig(
                         optimizer=OptimizerConfig(lr=1e-3),
                         schedule=ScheduleConfig(kind="constant",
                                                 total_steps=5),
                         mesh=MeshConfig(data=2, model=1)))
    task = MultiTaskPretrainTask(
        cfg, classes=(3, 3, 3),
        det_overrides=dict(nms_pre=32, max_proposals=8, rpn_num=8,
                           rcnn_num=4, max_per_img=4))
    state = task.init_state(jax.random.PRNGKey(0))
    # collate_multitask already produced the joint dict; fan out to 3 datasets
    batch = {f"d{d}": {k: v for k, v in batch_d.items()} for d in range(3)}
    state, metrics = task.fit(state, iter([batch]), steps=1)
    assert np.isfinite(metrics["loss"]), metrics
