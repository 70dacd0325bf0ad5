"""Change-detection task driver (LEVIR / WHU / SVCD / OSCD recipe shape).

batch dict: image_a, image_b (B, H, W, 3); label (B, H, W) {0, 1, 255=ignore}.
Metric: change-class F1 (open-cd convention) plus mIoU/aAcc.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mtp_tpu.core.optim import make_optimizer, make_schedule, vit_layer_id
from mtp_tpu.core.train import (TrainState, create_state, make_train_step,
                                seg_xent, shard_state)
from mtp_tpu.eval.metrics import SegAccumulator
from mtp_tpu.heads.upernet import resize_bilinear
from mtp_tpu.models.change_detection import SiamChangeDetector
from mtp_tpu.models.vit_rvsa import rescale_block_init
from mtp_tpu.parallel.mesh import make_mesh, put_batch
from mtp_tpu.utils.config import TaskConfig


class ChangeDetectionTask:
    def __init__(self, cfg: TaskConfig, mesh=None):
        self.cfg = cfg
        self.model = SiamChangeDetector(cfg.backbone, cfg.num_classes)
        self.mesh = mesh if mesh is not None else make_mesh(cfg.train.mesh)
        self._tx = None
        self._step_fn = None

    def init_state(self, rng: jax.Array,
                   pretrained_backbone: Optional[dict] = None,
                   frozen_backbone: bool = False) -> TrainState:
        cfg = self.cfg
        s = cfg.backbone.img_size
        zeros = jnp.zeros((1, s, s, cfg.backbone.in_chans), jnp.float32)
        variables = self.model.init(rng, zeros, zeros, train=True)
        params = dict(variables["params"])
        params["backbone"] = rescale_block_init(params["backbone"],
                                                cfg.backbone.depth)
        if pretrained_backbone is not None:
            params["backbone"] = pretrained_backbone
        batch_stats = variables.get("batch_stats", {})

        schedule = make_schedule(cfg.train.schedule, cfg.train.optimizer.lr)

        from mtp_tpu.models.backbones import layer_id_fn_for
        layer_id = layer_id_fn_for(cfg.backbone, root="backbone/")

        frozen_mask = None
        if frozen_backbone:
            # reference `frozen_stages` analog (CD backbone vit_rvsa_mtp.py:
            # 820-836): freeze the whole encoder via zeroed updates
            frozen_mask = jax.tree_util.tree_map_with_path(
                lambda p, _: str(getattr(p[0], "key", "")) == "backbone", params)
        self._tx = make_optimizer(cfg.train.optimizer, schedule, params,
                                  cfg.backbone.depth, layer_id_fn=layer_id,
                                  frozen_mask=frozen_mask,
                                  scan_interval=(cfg.backbone.interval if cfg.backbone.scan else None))
        state = create_state(params, self._tx, rng, batch_stats=batch_stats,
                             init_opt=False)
        return shard_state(self.mesh, state, self._tx)

    def train_step_fn(self):
        if self._step_fn is not None:
            return self._step_fn
        model = self.model
        ignore = self.cfg.ignore_index

        def loss_fn(params, batch_stats, batch, rng):
            out, updates = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch["image_a"], batch["image_b"], train=True,
                deterministic=False, rngs={"dropout": rng},
                mutable=["batch_stats"])
            labels = batch["label"]
            logits = resize_bilinear(out, labels.shape[1:3])
            loss = seg_xent(logits, labels, ignore)
            valid = labels != ignore
            acc = jnp.where(valid, logits.argmax(-1) == labels, 0).sum() / \
                jnp.maximum(valid.sum(), 1) * 100.0
            return loss, ({"acc": acc}, updates["batch_stats"])

        self._step_fn = make_train_step(loss_fn, self._tx, self.mesh)
        return self._step_fn

    def fit(self, state: TrainState, data: Iterator[Dict[str, np.ndarray]],
            steps: int, log_every: int = 50,
            log_fn: Callable[[int, dict], None] = None,
            **ckpt_kw) -> Tuple[TrainState, dict]:
        from mtp_tpu.tasks._fit import fit_loop
        return fit_loop(self, state, data, steps, log_every=log_every,
                        log_fn=log_fn, **ckpt_kw)

    def predict_fn(self):
        """Jitted (variables, image_a, image_b) → per-pixel change map.
        Memoized — a fresh jit per call would recompile on every periodic
        validation."""
        if getattr(self, "_predict", None) is not None:
            return self._predict
        model = self.model

        @jax.jit
        def predict(variables, a, b):
            logits = model.apply(variables, a, b, train=False,
                                 deterministic=True)
            return resize_bilinear(logits, a.shape[1:3]).argmax(-1)

        self._predict = predict
        return predict

    def evaluate(self, state: TrainState,
                 data: Iterator[Dict[str, np.ndarray]]) -> Dict[str, float]:
        predict = self.predict_fn()

        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        acc = SegAccumulator(self.cfg.num_classes, self.cfg.ignore_index)
        for batch in data:
            a = put_batch(self.mesh, batch["image_a"])
            b = put_batch(self.mesh, batch["image_b"])
            pred = predict(variables, a, b)
            acc.add(np.asarray(pred), batch["label"])
        res = acc.evaluate()
        # change-class F1 (open-cd headline metric)
        res["F1_change"] = res["Fscore"][1] if len(res["Fscore"]) > 1 else 0.0
        return res
