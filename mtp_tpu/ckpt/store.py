"""Checkpoint store: orbax save/restore of TrainState + encoder-only export.

Capability parity with the reference checkpointing
(main_pretrain.py:821-829): periodic full checkpoints {step, params,
opt_state, batch_stats, rng} plus a separate encoder-only checkpoint — the
artifact every finetune recipe consumes — and `--ft/--resume` style restore
(:478-505).  orbax gives atomic async saves and sharding-aware restore.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from mtp_tpu.core.train import TrainState


class CheckpointStore:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True)
        self.mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: TrainState, wait: bool = False) -> None:
        self.mgr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self.mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.mgr.latest_step()

    def restore(self, state_like: TrainState,
                step: Optional[int] = None) -> Optional[TrainState]:
        step = step if step is not None else self.mgr.latest_step()
        if step is None:
            return None
        restored = self.mgr.restore(
            step, args=ocp.args.StandardRestore(state_like))

        # Re-place every leaf onto state_like's sharding: orbax can hand
        # scalar leaves back single-device, which then clashes with the
        # mesh-replicated leaves inside the jitted step.
        def place(r, like):
            if hasattr(like, "sharding"):
                return jax.device_put(r, like.sharding)
            return r

        return jax.tree.map(place, restored, state_like)

    def close(self):
        self.mgr.wait_until_finished()
        self.mgr.close()


def save_encoder(path: str, backbone_params: Any) -> None:
    """Standalone encoder-only artifact (numpy .npz tree), the analog of
    `last_*_pretrn_model_encoder.pth`."""
    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(backbone_params)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in kp)
        flat[key] = np.asarray(leaf)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **flat)


def load_encoder(path: str) -> dict:
    """Restore the nested param dict from an encoder .npz."""
    flat = np.load(path)
    tree: dict = {}
    for key in flat.files:
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = flat[key]
    return tree


def save_variables(path: str, variables: dict) -> None:
    """Full model variables ({'params': ..., 'batch_stats': ...}) as one
    .npz — the artifact tools/validate.py produces from a released
    finetuned torch checkpoint."""
    save_encoder(path, variables)


def load_variables(path: str) -> dict:
    """Inverse of save_variables; load_encoder's flattening is shared, so a
    file is a full-variables artifact iff its keys start with 'params/'."""
    return load_encoder(path)


def npz_is_full_variables(path: str) -> bool:
    with np.load(path) as flat:
        return any(k.startswith("params/") for k in flat.files)
