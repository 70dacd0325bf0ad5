"""Config registry + CLI surface tests."""

import pytest

pytestmark = pytest.mark.slow  # heavy e2e: full train-step compile

import json
import subprocess
import sys

from mtp_tpu import configs


def test_registry_builds():
    names = configs.available()
    assert len(names) >= 15
    for n in names:
        r = configs.get(n)
        assert r.name == n
        assert r.task.backbone.embed_dim in (192, 768, 1024)  # incl. InternImage-XL
        if "rvsa_l" in n or "rvsa-l" in n:
            assert r.task.backbone.depth == 24


def test_recipe_families_cover_reference_suites():
    names = " ".join(configs.available())
    for frag in ("eurosat", "resisc45", "spacenetv1", "loveda", "levir",
                 "whu", "dior", "diorr", "dota", "xview", "samrs"):
        assert frag in names, frag


def test_cli_list_runs():
    out = subprocess.run(
        [sys.executable, "-m", "mtp_tpu.cli.train", "list"],
        capture_output=True, text=True,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": "/root/repo", "HOME": "/root"})
    assert out.returncode == 0, out.stderr
    assert "mtp_vit_l_rvsa_448_samrs" in out.stdout


def test_recipe_hyperparams_match_reference_configs():
    """Spot-check optimizer/schedule numbers against the reference config
    files they cite (lr/schedule drift caught in round 2)."""
    cls = configs.get("vit-rvsa-l-224-mae-mtp_eurosat").task.train
    assert cls.optimizer.lr == 6e-5 and cls.schedule.kind == "cosine"

    seg = configs.get("rvsa-l-upernet-384-mae-mtp-spacenetv1").task.train
    assert seg.optimizer.lr == 6e-5
    assert seg.schedule.kind == "cosine" and seg.schedule.warmup_steps == 1500

    det = configs.get("faster_rcnn_rvsa_l_800_mae_mtp_dior").task.train
    assert det.optimizer.lr == 1e-4 and det.schedule.kind == "step"
    assert det.schedule.step_gamma == 0.1

    cd = configs.get("rvsa-l-unet-256-mae-mtp_levir").task.train
    assert cd.optimizer.lr == 6e-5 and cd.schedule.kind == "cosine"

    mtp = configs.get("mtp_vit_l_rvsa_448_samrs").task.train
    assert mtp.optimizer.lr == 6e-5 and mtp.schedule.warmup_steps == 0
    ii = configs.get("mtp_internimage_xl_448_samrs").task.train
    assert ii.optimizer.lr == 2e-5 and ii.optimizer.layer_decay == 0.94


def test_epochs_flag_guards():
    from mtp_tpu.cli.train import main as train_main
    with pytest.raises(SystemExit, match="data-root"):
        train_main(["vit-rvsa-b-224-mae-mtp_eurosat", "--epochs", "2",
                    "--synthetic"])
    with pytest.raises(SystemExit, match="not both"):
        train_main(["vit-rvsa-b-224-mae-mtp_eurosat", "--epochs", "2",
                    "--steps", "5", "--data-root", "/nonexistent"])


def test_internimage_recipe_optimizer_point():
    """Reference intern-xl configs: layer_decay 0.94 everywhere, lr 2e-5
    for cls/seg/CD, detection keeps 1e-4."""
    o = configs.get("intern-xl-224-imp-mtp_eurosat").task.train.optimizer
    assert o.lr == 2e-5 and o.layer_decay == 0.94
    o = configs.get(
        "faster_rcnn_intern_xl_800_imp_mtp_dior").task.train.optimizer
    assert o.lr == 1e-4 and o.layer_decay == 0.94
