"""Real-data CLI training: on-disk fixture datasets for every task family,
trained end-to-end through `python -m mtp_tpu.cli.train <recipe>
--data-root ...` (reference: tools/train.py <config> with data_root in the
config; VERDICT round-1 item #2)."""

import pytest

pytestmark = pytest.mark.slow  # heavy e2e: full train-step compile

import json
import os

import numpy as np
from PIL import Image

from mtp_tpu.cli.train import main as train_main


def _img(path, h=64, w=64, seed=0):
    rng = np.random.default_rng(seed)
    Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8)).save(path)


def _seg(path, h=64, w=64, k=2, seed=0):
    rng = np.random.default_rng(seed)
    Image.fromarray(rng.integers(0, k, (h, w)).astype(np.uint8)).save(path)


def _run(recipe, data_root, extra=()):
    argv = [recipe, "--data-root", str(data_root), "--steps", "2",
            "--batch-size", "2", "--img-size", "64", "--mesh-data", "2",
            "--work-dir", str(data_root) + "/wd", "--max-gts", "8",
            "--eval-after"] + list(extra)
    assert train_main(argv) == 0


def test_cli_classification_real(tmp_path, capsys):
    for split in ("train", "val"):
        for ci, c in enumerate(("forest", "river")):
            d = tmp_path / split / c
            d.mkdir(parents=True)
            for i in range(4):
                _img(d / f"{i}.png", seed=ci * 10 + i)
    # recipe has 10 classes but the fixture has 2 — num_classes comes from
    # the recipe, labels 0/1 are valid logits indices
    _run("vit-rvsa-b-224-mae-mtp_eurosat", tmp_path)
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "eval" in out and "top1" in out["eval"]


def test_cli_segmentation_real(tmp_path, capsys):
    for split in ("train", "val"):
        (tmp_path / "img_dir" / split).mkdir(parents=True)
        (tmp_path / "ann_dir" / split).mkdir(parents=True)
        for i in range(4):
            _img(tmp_path / "img_dir" / split / f"{i}.png", seed=i)
            _seg(tmp_path / "ann_dir" / split / f"{i}.png", k=2, seed=i)
    _run("rvsa-b-upernet-384-mae-mtp-spacenetv1", tmp_path)
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "eval" in out and "mIoU" in out["eval"]


def test_cli_change_detection_real(tmp_path, capsys):
    for split in ("train", "val"):
        for sub in ("A", "B", "label"):
            (tmp_path / split / sub).mkdir(parents=True)
        for i in range(4):
            _img(tmp_path / split / "A" / f"{i}.png", seed=i)
            _img(tmp_path / split / "B" / f"{i}.png", seed=i + 50)
            _seg(tmp_path / split / "label" / f"{i}.png", k=2, seed=i)
    _run("rvsa-b-unet-256-mae-mtp_levir", tmp_path)
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "eval" in out


def _coco_json(path, n_imgs, classes=("plane", "ship")):
    images, anns = [], []
    aid = 0
    rng = np.random.default_rng(0)
    for i in range(n_imgs):
        images.append({"id": i, "file_name": f"{i}.png",
                       "width": 64, "height": 64})
        for _ in range(3):
            x, y = rng.integers(4, 30, 2)
            w, h = rng.integers(8, 20, 2)
            anns.append({"id": aid, "image_id": i, "iscrowd": 0,
                         "category_id": int(rng.integers(1, 3)),
                         "bbox": [int(x), int(y), int(w), int(h)],
                         "area": int(w * h)})
            aid += 1
    with open(path, "w") as f:
        json.dump({"images": images, "annotations": anns,
                   "categories": [{"id": i + 1, "name": c}
                                  for i, c in enumerate(classes)]}, f)


def test_cli_detection_h_real(tmp_path, capsys):
    (tmp_path / "images").mkdir()
    for i in range(4):
        _img(tmp_path / "images" / f"{i}.png", seed=i)
    _coco_json(tmp_path / "train.json", 4)
    _coco_json(tmp_path / "val.json", 4)
    _run("faster_rcnn_rvsa_b_800_mae_mtp_dior", tmp_path,
         extra=["--det-overrides",
                '{"nms_pre":64,"max_proposals":16,"rpn_num":16,'
                '"rcnn_num":8,"max_per_img":4}'])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "eval" in out and "mAP" in out["eval"]


def test_cli_detection_r_real(tmp_path, capsys):
    """DIOR-R layout: VOC robndbox xmls under {split}/annfiles."""
    from mtp_tpu.data.datasets import DIOR_CLASSES
    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        (tmp_path / split / "images").mkdir(parents=True)
        (tmp_path / split / "annfiles").mkdir(parents=True)
        for i in range(4):
            _img(tmp_path / split / "images" / f"{i}.png", seed=i)
            objs = []
            for _ in range(3):
                cx, cy = rng.uniform(16, 48, 2)
                w, h = rng.uniform(8, 16, 2)
                a = rng.uniform(-1.2, 1.2)
                cls = DIOR_CLASSES[int(rng.integers(0, 20))]
                objs.append(
                    f"<object><name>{cls}</name><robndbox>"
                    f"<cx>{cx:.1f}</cx><cy>{cy:.1f}</cy><w>{w:.1f}</w>"
                    f"<h>{h:.1f}</h><angle>{a:.3f}</angle>"
                    f"</robndbox></object>")
            (tmp_path / split / "annfiles" / f"{i}.xml").write_text(
                "<annotation>" + "".join(objs) + "</annotation>")
    _run("oriented_rcnn_rvsa_b_800_mae_mtp_diorr", tmp_path,
         extra=["--det-overrides",
                '{"nms_pre":64,"max_proposals":16,"rpn_num":16,'
                '"rcnn_num":8,"max_per_img":4}'])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "eval" in out and "mAP" in out["eval"]


def test_cli_format_only_submission(tmp_path, capsys):
    """DOTA submission path (reference mmrotate-0.3.4 --format-only):
    predict pre-tiled patches, merge multi-scale ids, write Task1 txts +
    zip + FAIR1M xmls."""
    from mtp_tpu.cli.test import main as test_main

    img_dir = tmp_path / "test" / "images"
    img_dir.mkdir(parents=True)
    # two patches of P0001 (two scales) + one of P0002
    for name, seed in (("P0001__1.0__0___0", 1), ("P0001__0.5__0___32", 2),
                       ("P0002__1.0__0___0", 3)):
        _img(img_dir / f"{name}.png", seed=seed)
    argv = ["oriented_rcnn_rvsa_b_1024_mae_mtp_dota10",
            "--data-root", str(tmp_path), "--split", "test",
            "--format-only", "--fair1m", "--rescale-by-rate", "--tta-flip",
            "--img-size", "64", "--batch-size", "2", "--mesh-data", "1",
            "--submission-dir", str(tmp_path / "submit")]
    assert test_main(argv) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["patches"] == 3 and out["images"] == 2  # P0001 merged
    from mtp_tpu.data.datasets import DOTA10_CLASSES
    txts = sorted(os.listdir(tmp_path / "submit"))
    assert txts == sorted(f"Task1_{c}.txt" for c in DOTA10_CLASSES)
    assert (tmp_path / "submit.zip").exists()
    xmls = os.listdir(str(tmp_path / "submit") + "_xml")
    assert sorted(x[:-4] for x in xmls) == ["P0001", "P0002"]
    # every submission line references a merged base id
    for t in txts:
        for line in open(tmp_path / "submit" / t):
            assert line.split()[0] in ("P0001", "P0002")


def test_cli_seg_label_export_and_loveda_shift(tmp_path, capsys):
    """--save-labels: raw uint8 label PNGs for every test image at source
    resolution (reference --out), chainable into loveda-shift."""
    from mtp_tpu.cli.test import main as test_main

    d = tmp_path / "img_dir" / "val"
    d.mkdir(parents=True)
    for i in range(3):
        _img(d / f"im{i}.png", h=48, w=40, seed=i)
    out = tmp_path / "out"
    assert test_main(["rvsa-b-upernet-384-mae-mtp-spacenetv1",
                      "--data-root", str(tmp_path), "--split", "val",
                      "--save-labels", str(out), "--img-size", "64",
                      "--batch-size", "2", "--mesh-data", "1"]) == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["images"] == 3
    from PIL import Image as PILImage
    a = np.asarray(PILImage.open(out / "im0.png"))
    assert a.shape == (48, 40) and a.dtype == np.uint8

    # submission chain: subtract 1 (LoveDA server convention)
    import subprocess, sys as _sys
    r = subprocess.run(
        [_sys.executable, "tools/prepare_datasets.py", "loveda-shift",
         "--pred-dir", str(out), "--out-dir", str(tmp_path / "shifted")],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    b = np.asarray(PILImage.open(tmp_path / "shifted" / "im0.png"))
    assert b.shape == (48, 40)
