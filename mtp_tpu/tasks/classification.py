"""Scene-classification task driver (EuroSAT / RESISC-45 recipe shape).

End-to-end equivalent of the reference's mmpretrain flow
(RS_Tasks_Finetune/Scene_Classification): build classifier, AdamW+layer-decay,
warmup+cosine schedule, jitted sharded train step, top-k accuracy eval.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mtp_tpu.core.optim import make_optimizer, make_schedule
from mtp_tpu.core.train import (TrainState, create_state, make_train_step,
                                shard_state, softmax_xent)
from mtp_tpu.eval.metrics import topk_accuracy
from mtp_tpu.models.classifier import ImageClassifier
from mtp_tpu.models.vit_rvsa import rescale_block_init
from mtp_tpu.parallel.mesh import make_mesh, put_batch
from mtp_tpu.utils.config import TaskConfig


class ClassificationTask:
    def __init__(self, cfg: TaskConfig, mesh=None):
        self.cfg = cfg
        self.model = ImageClassifier(cfg.backbone, cfg.num_classes)
        self.mesh = mesh if mesh is not None else make_mesh(cfg.train.mesh)
        schedule = make_schedule(cfg.train.schedule, cfg.train.optimizer.lr)
        self._schedule_cfg = schedule
        self._tx = None
        self._step_fn = None

    # -- init ---------------------------------------------------------------
    def init_state(self, rng: jax.Array,
                   pretrained_backbone: Optional[dict] = None) -> TrainState:
        cfg = self.cfg
        shape = (1, cfg.backbone.img_size, cfg.backbone.img_size,
                 cfg.backbone.in_chans)
        variables = self.model.init(rng, jnp.zeros(shape, jnp.float32))
        params = dict(variables["params"])
        params["backbone"] = rescale_block_init(params["backbone"],
                                                cfg.backbone.depth)
        if pretrained_backbone is not None:
            params["backbone"] = pretrained_backbone

        schedule = make_schedule(cfg.train.schedule, cfg.train.optimizer.lr)

        from mtp_tpu.models.backbones import layer_id_fn_for
        layer_id = layer_id_fn_for(cfg.backbone, root="backbone/")

        self._tx = make_optimizer(cfg.train.optimizer, schedule, params,
                                  cfg.backbone.depth, layer_id_fn=layer_id,
                                  scan_interval=(cfg.backbone.interval if cfg.backbone.scan else None))
        state = create_state(params, self._tx, rng, init_opt=False)
        return shard_state(self.mesh, state, self._tx)

    # -- train --------------------------------------------------------------
    def train_step_fn(self):
        if self._step_fn is not None:
            return self._step_fn

        model = self.model

        def loss_fn(params, batch_stats, batch, rng):
            images, labels = batch["image"], batch["label"]
            logits = model.apply({"params": params}, images,
                                 deterministic=False, rngs={"dropout": rng})
            loss = softmax_xent(logits, labels)
            acc = (logits.argmax(-1) == labels).mean() * 100.0
            return loss, ({"acc": acc}, batch_stats)

        self._step_fn = make_train_step(loss_fn, self._tx, self.mesh)
        return self._step_fn

    def fit(self, state: TrainState, data: Iterator[Dict[str, np.ndarray]],
            steps: int, log_every: int = 50,
            log_fn: Callable[[int, dict], None] = None,
            **ckpt_kw) -> Tuple[TrainState, dict]:
        from mtp_tpu.tasks._fit import fit_loop
        return fit_loop(self, state, data, steps, log_every=log_every,
                        log_fn=log_fn, **ckpt_kw)

    # -- eval ---------------------------------------------------------------
    def evaluate(self, state: TrainState,
                 data: Iterator[Dict[str, np.ndarray]]) -> Dict[str, float]:
        model = self.model

        # memoized: a fresh @jax.jit closure per evaluate() call would
        # recompile on every periodic validation (minutes on the remote
        # compile server)
        if getattr(self, "_eval_fwd", None) is None:
            @jax.jit
            def fwd(params, images):
                return model.apply({"params": params}, images,
                                   deterministic=True)
            self._eval_fwd = fwd
        fwd = self._eval_fwd

        tot, hits = 0, {"top1": 0.0, "top5": 0.0}
        for batch in data:
            images = put_batch(self.mesh, batch["image"])
            logits = fwd(state.params, images)
            accs = topk_accuracy(logits, jnp.asarray(batch["label"]))
            n = images.shape[0]
            tot += n
            for k in hits:
                hits[k] += float(accs[k]) * n
        return {k: v / max(tot, 1) for k, v in hits.items()}
