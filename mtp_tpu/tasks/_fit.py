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
    import time as _time

    step_fn = task.train_step_fn()
    sh = batch_sharding(task.mesh)
    metrics = {}
    t_data = 0.0  # host pipeline + H2D per log window (reference data_time)
    t_mark = _time.perf_counter()
    n_since = 0
    for i in range(steps):
        t0 = _time.perf_counter()
        batch = next(data)
        batch = jax.tree.map(
            lambda v: jax.device_put(jnp.asarray(v), sh), batch)
        t_data += _time.perf_counter() - t0
        state, metrics = step_fn(state, batch)
        n_since += 1
        if log_fn and (i % log_every == 0 or i == steps - 1):
            m = {k: float(v) for k, v in metrics.items()}  # syncs the step
            wall = _time.perf_counter() - t_mark
            m["data_time"] = round(t_data / n_since, 4)
            m["step_time"] = round(wall / n_since, 4)
            log_fn(i, m)
            t_data = 0.0
            n_since = 0
            t_mark = _time.perf_counter()
        if ckpt is not None and (i + 1) % ckpt_every == 0 and i != steps - 1:
            _save(ckpt, state, encoder_path)
    if ckpt is not None:
        _save(ckpt, state, encoder_path, wait=True)
    return state, {k: float(v) for k, v in metrics.items()}
