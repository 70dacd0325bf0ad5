"""Serving-artifact export (cli/export.py + serving.py): StableHLO
roundtrip with weights separated from the program, outputs matching the
live model."""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full predict-fn lowering per test

from mtp_tpu.cli.export import main as export_main
from mtp_tpu.serving import load_artifact


def test_classification_export_roundtrip(tmp_path, capsys):
    out = tmp_path / "art"
    assert export_main(["vit-rvsa-b-224-mae-mtp_eurosat", "--out", str(out),
                        "--img-size", "64", "--batch-size", "2"]) == 0
    serve, meta = load_artifact(str(out))
    assert meta["task"] == "classification" and meta["batch_size"] == 2

    x = np.random.default_rng(0).standard_normal((2, 64, 64, 3)) \
        .astype(np.float32)
    logits = np.asarray(serve(x))
    assert logits.shape == (2, meta["num_classes"])

    # parity vs the live model with the same (deterministic PRNGKey(0)) init
    import jax
    from mtp_tpu import configs
    from mtp_tpu.cli.train import build_task
    import dataclasses
    recipe = configs.get("vit-rvsa-b-224-mae-mtp_eurosat")
    rcfg = dataclasses.replace(
        recipe.task, backbone=dataclasses.replace(recipe.task.backbone,
                                                  img_size=64))
    task, cfg = build_task(dataclasses.replace(recipe, task=rcfg), 1, 1)
    state = task.init_state(jax.random.PRNGKey(0))
    live = np.asarray(task.model.apply({"params": state.params}, x,
                                       deterministic=True))
    # bf16 backbone: the exported and live programs fuse differently, so
    # agreement is at bf16 resolution, not f32
    np.testing.assert_allclose(logits, live, atol=2e-2, rtol=2e-2)


def test_detection_export_dict_outputs(tmp_path):
    out = tmp_path / "art"
    assert export_main([
        "faster_rcnn_rvsa_b_800_mae_mtp_dior", "--out", str(out),
        "--img-size", "64", "--batch-size", "1",
        "--det-overrides",
        '{"nms_pre":64,"max_proposals":16,"rpn_num":16,"rcnn_num":8,'
        '"max_per_img":4}']) == 0
    serve, meta = load_artifact(str(out))
    x = np.zeros((1, 64, 64, 3), np.float32)
    d = serve(x)
    assert set(d) >= {"boxes", "scores", "labels", "valid"}
    assert np.asarray(d["boxes"]).shape[0] == 1
    spec = json.load(open(os.path.join(out, "meta.json")))
    assert spec["inputs"][0]["shape"] == [1, 64, 64, 3]
