"""Semantic-segmentation task driver (SpaceNet / LoveDA recipe shape).

End-to-end equivalent of the reference mmseg flow: Segmentor (ViT+RVSA →
UperNet), pixel CE with ignore_index, poly schedule, sliding-window eval with
mIoU (the north-star workload, BASELINE.md).
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
from mtp_tpu.eval.slide import slide_inference
from mtp_tpu.heads.upernet import resize_bilinear
from mtp_tpu.models.segmentor import Segmentor
from mtp_tpu.models.vit_rvsa import rescale_block_init
from mtp_tpu.parallel.mesh import make_mesh, put_batch
from mtp_tpu.utils.config import SlideConfig, TaskConfig


class SegmentationTask:
    def __init__(self, cfg: TaskConfig, mesh=None):
        self.cfg = cfg
        self.model = Segmentor(cfg.backbone, cfg.num_classes)
        self.mesh = mesh if mesh is not None else make_mesh(cfg.train.mesh)
        self._tx = None
        self._step_fn = None

    def init_state(self, rng: jax.Array,
                   pretrained_backbone: Optional[dict] = None) -> TrainState:
        cfg = self.cfg
        shape = (1, cfg.backbone.img_size, cfg.backbone.img_size,
                 cfg.backbone.in_chans)
        variables = self.model.init(rng, jnp.zeros(shape, jnp.float32),
                                    train=True)
        params = dict(variables["params"])
        params["backbone"] = rescale_block_init(params["backbone"],
                                                cfg.backbone.depth)
        if pretrained_backbone is not None:
            params["backbone"] = pretrained_backbone
        batch_stats = variables.get("batch_stats", {})

        schedule = make_schedule(cfg.train.schedule, cfg.train.optimizer.lr)

        from mtp_tpu.models.backbones import layer_id_fn_for
        layer_id = layer_id_fn_for(cfg.backbone, root="backbone/")

        self._tx = make_optimizer(cfg.train.optimizer, schedule, params,
                                  cfg.backbone.depth, layer_id_fn=layer_id,
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
            images, labels = batch["image"], batch["label"]
            out, updates = model.apply(
                {"params": params, "batch_stats": batch_stats}, images,
                train=True, deterministic=False, rngs={"dropout": rng},
                mutable=["batch_stats"])
            logits = resize_bilinear(out, labels.shape[1:3])
            loss = seg_xent(logits, labels, ignore)
            acc = jnp.where(labels != ignore,
                            logits.argmax(-1) == labels, 0).sum() / \
                jnp.maximum((labels != ignore).sum(), 1) * 100.0
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

    # -- inference ----------------------------------------------------------
    def predict_fn(self, slide: Optional[SlideConfig] = None):
        """Jitted (variables, images) → per-pixel class predictions.
        Memoized per slide config — a fresh jit per call would recompile on
        every periodic validation."""
        model = self.model
        slide = slide or self.cfg.slide
        num_classes = self.cfg.num_classes
        cache = getattr(self, "_predict_cache", None)
        if cache is None:
            cache = self._predict_cache = {}
        if slide in cache:
            return cache[slide]

        def apply_crop(variables, tile):
            out = model.apply(variables, tile, train=False, deterministic=True)
            return resize_bilinear(out, tile.shape[1:3])

        @jax.jit
        def predict(variables, images):
            if slide is None:
                logits = apply_crop(variables, images)
            else:
                logits = slide_inference(lambda t: apply_crop(variables, t),
                                         images, num_classes, slide)
            return logits.argmax(-1)

        cache[slide] = predict
        return predict

    def evaluate(self, state: TrainState,
                 data: Iterator[Dict[str, np.ndarray]],
                 slide: Optional[SlideConfig] = None) -> Dict[str, float]:
        predict = self.predict_fn(slide)
        acc = SegAccumulator(self.cfg.num_classes, self.cfg.ignore_index)
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        for batch in data:
            images = put_batch(self.mesh, batch["image"])
            pred = predict(variables, images)
            acc.add(np.asarray(pred), batch["label"])
        return acc.evaluate()
