"""Shared training loop for all task drivers.

Reference anchors: the hand-written while-loop in
Multi-Task_Pretrain/main_pretrain.py:689-840 (periodic checkpoint + the
encoder-only export :821-829) and the mmengine IterBasedTrainLoop the
finetune suites use.  Every task family gets the same crash-safe periodic
checkpointing, not just multitask.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mtp_tpu.parallel.mesh import batch_sharding


def _save(ckpt, state, encoder_path: Optional[str], wait: bool = False):
    ckpt.save(int(state.step), state, wait=wait)
    if encoder_path:
        from mtp_tpu.ckpt.store import save_encoder
        key = "encoder" if "encoder" in state.params else "backbone"
        save_encoder(encoder_path,
                     jax.tree.map(np.asarray, state.params[key]))


def fit_loop(task, state, data: Iterator[Dict], steps: int, *,
             log_every: int = 50,
             log_fn: Optional[Callable[[int, dict], None]] = None,
             ckpt=None, ckpt_every: int = 1000,
             encoder_path: Optional[str] = None) -> Tuple["TrainState", dict]:
    """Run `steps` optimizer steps.  With a CheckpointStore, saves every
    `ckpt_every` steps plus once at the end; `encoder_path` additionally
    exports the encoder/backbone-only .npz (the finetune artifact,
    reference main_pretrain.py:827-829)."""
    step_fn = task.train_step_fn()
    sh = batch_sharding(task.mesh)
    metrics = {}
    for i in range(steps):
        batch = next(data)
        batch = jax.tree.map(
            lambda v: jax.device_put(jnp.asarray(v), sh), batch)
        state, metrics = step_fn(state, batch)
        if log_fn and (i % log_every == 0 or i == steps - 1):
            log_fn(i, {k: float(v) for k, v in metrics.items()})
        if ckpt is not None and (i + 1) % ckpt_every == 0 and i != steps - 1:
            _save(ckpt, state, encoder_path)
    if ckpt is not None:
        _save(ckpt, state, encoder_path, wait=True)
    return state, {k: float(v) for k, v in metrics.items()}
