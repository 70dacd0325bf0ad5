"""InternImage as the backbone of the task wrappers (classification +
segmentation + CD fusion), incl. the InternImage layer-decay mapping."""

import pytest

pytestmark = pytest.mark.slow  # heavy e2e: full train-step compile

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from mtp_tpu.models.backbones import (internimage_backbone_config,
                                      internimage_layer_id, layer_id_fn_for)
from mtp_tpu.utils.config import (MeshConfig, OptimizerConfig, ScheduleConfig,
                                  TaskConfig, TrainConfig)

# a tiny internimage variant for tests
BB = dataclasses.replace(
    internimage_backbone_config("internimage_t", img_size=64),
    dtype="float32", drop_path_rate=0.0)


def test_layer_id_mapping():
    depths = (4, 4, 18, 4)
    n = sum(depths) + 2
    assert internimage_layer_id("stem_conv1/kernel", n, depths) == 0
    assert internimage_layer_id("stage0_layer0/dcn/offset/kernel", n, depths) == 1
    assert internimage_layer_id("stage1_layer3/mlp/fc1/kernel", n, depths) == 8
    assert internimage_layer_id("stage2_layer17/norm1/scale", n, depths) == 26
    assert internimage_layer_id("down0_conv/kernel", n, depths) == 4
    assert internimage_layer_id("head/kernel", n, depths) == n - 1
    fn = layer_id_fn_for(BB)
    assert fn("backbone/stage0_layer0/dcn/offset/kernel", n) == 1
    assert fn("head/fc/kernel", n) == n - 1


def test_internimage_classifier_trains():
    from mtp_tpu.tasks.classification import ClassificationTask
    cfg = TaskConfig(
        task="classification", num_classes=3, backbone=BB,
        train=TrainConfig(optimizer=OptimizerConfig(lr=1e-3),
                          schedule=ScheduleConfig(kind="constant",
                                                  total_steps=10),
                          mesh=MeshConfig(data=2, model=1)))
    task = ClassificationTask(cfg)
    state = task.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)

    def gen():
        while True:
            y = rng.integers(0, 3, 4)
            x = rng.standard_normal((4, 64, 64, 3)).astype(np.float32) * 0.1
            x += y[:, None, None, None]
            yield {"image": x, "label": y}

    state, m = task.fit(state, gen(), steps=5)
    assert np.isfinite(m["loss"])


def test_internimage_segmentor_shapes():
    from mtp_tpu.models.segmentor import Segmentor
    model = Segmentor(BB, num_classes=3, channels=32)
    x = jnp.zeros((1, 64, 64, 3))
    v = jax.jit(lambda r: model.init(r, x, train=False))(jax.random.PRNGKey(0))
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(v, x)
    assert out.shape == (1, 16, 16, 3)


def test_internimage_change_detection():
    from mtp_tpu.models.change_detection import SiamChangeDetector
    model = SiamChangeDetector(BB, num_classes=2)
    a = jnp.zeros((1, 64, 64, 3))
    v = jax.jit(lambda r: model.init(r, a, a, train=False))(jax.random.PRNGKey(0))
    out = jax.jit(lambda v, a: model.apply(v, a, a, train=False))(v, a)
    # 4 decoder blocks upsample from stride 32 (coarsest) → 2, final x2 → 1
    assert out.shape[0] == 1 and out.shape[-1] == 2
