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
