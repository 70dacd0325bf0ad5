"""Device mesh + sharding rules.

The reference scales exclusively with DDP over NCCL
(Multi-Task_Pretrain/main_pretrain.py:508-524).  The TPU-native equivalent is
a `jax.sharding.Mesh` with the batch dimension sharded over the `data` axis
and (optionally) Megatron-style tensor parallelism over the `model` axis;
XLA inserts the gradient all-reduces / all-gathers over ICI.
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mtp_tpu.utils.config import MeshConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(cfg: MeshConfig = MeshConfig(), devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    model = cfg.model if cfg.model > 0 else 1
    data = cfg.data if cfg.data > 0 else n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs more than {n} devices")
    arr = np.asarray(devices[:data * model]).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_batch(mesh: Mesh, x) -> jax.Array:
    """device_put a host batch with the data-axis sharding when the batch
    divides the data-mesh size, replicated otherwise (eval batches — e.g.
    the bs-1 original-resolution seg/CD protocol or a ragged final batch —
    must not crash on divisibility)."""
    x = jnp.asarray(x)
    d = mesh.shape.get(DATA_AXIS, 1)
    sh = batch_sharding(mesh) if x.shape[0] % d == 0 else replicated(mesh)
    return jax.device_put(x, sh)


# ---------------------------------------------------------------------------
# Multi-host (multi-process) data feeding
#
# The reference feeds a pod with DistributedSampler over up to 32 SLURM
# ranks (main_pretrain.py:236-251, Readme.md:233-240).  The TPU-native
# equivalent (SURVEY §2.4 "per-host data loading replaces
# DistributedSampler"): every process materializes ONLY the global-batch
# rows its addressable devices own, and the global jax.Array is assembled
# with `jax.make_array_from_process_local_data` — no cross-host data
# movement, identical epoch permutation on every process (same seed).
# ---------------------------------------------------------------------------


def process_batch_rows(mesh: Mesh, global_batch: int) -> np.ndarray:
    """Row indices of a global batch owned by THIS process under
    `batch_sharding(mesh)` — the per-host slice of the reference's
    DistributedSampler.  Derived from the sharding's addressable-shard
    index map, so it stays correct for any device→process layout."""
    if global_batch % mesh.shape.get(DATA_AXIS, 1):
        raise ValueError(
            f"global batch {global_batch} must divide the data axis "
            f"({mesh.shape.get(DATA_AXIS, 1)})")
    sh = batch_sharding(mesh)
    imap = sh.addressable_devices_indices_map((global_batch,))
    rows = set()
    for idx in imap.values():
        rows.update(range(*idx[0].indices(global_batch)))
    return np.asarray(sorted(rows), np.int64)


def put_global_batch(mesh: Mesh, x, global_batch: Optional[int] = None
                     ) -> jax.Array:
    """Assemble a GLOBAL batch array from this process's local rows.

    Single-process: plain sharded device_put (same as put_batch).
    Multi-process: `jax.make_array_from_process_local_data` — `x` must be
    exactly the rows `process_batch_rows(mesh, global_batch)` in order."""
    x = np.asarray(x)
    if jax.process_count() == 1:
        return put_batch(mesh, x)
    gb = (global_batch if global_batch is not None
          else x.shape[0] * jax.process_count())
    return jax.make_array_from_process_local_data(
        batch_sharding(mesh), x, (gb,) + x.shape[1:])


def put_global_tree(mesh: Mesh, tree, global_batch: Optional[int] = None):
    """put_global_batch over every leaf of a batch dict/pytree."""
    return jax.tree_util.tree_map(
        lambda v: put_global_batch(mesh, v, global_batch), tree)


# ---------------------------------------------------------------------------
# Parameter sharding rules (tensor parallelism)
#
# Megatron-style: column-parallel for qkv / mlp-in (shard output features),
# row-parallel for attn-proj / mlp-out (shard input features).  Everything
# else is replicated.  Rules are matched on the flattened param path.
# ---------------------------------------------------------------------------

# (regex over "a/b/c" param path, PartitionSpec factory applied to the leaf)
_TP_RULES = [
    # attention qkv & mlp up-projection: shard last (output-feature) dim.
    # ndim-aware on bias too: under the scan layout biases are STACKED
    # (n_blocks, features) — the model axis must land on the feature dim,
    # not the block-stack dim (which need not divide the TP degree).
    (re.compile(r"(qkv|fc1)/kernel$"), lambda ndim: P(*([None] * (ndim - 1) + [MODEL_AXIS]))),
    (re.compile(r"(qkv|fc1)/bias$"), lambda ndim: P(*([None] * (ndim - 1) + [MODEL_AXIS]))),
    # attention output proj & mlp down-projection: shard first-of-last-two (input) dim
    (re.compile(r"(attn/proj|fc2)/kernel$"), lambda ndim: P(*([None] * (ndim - 2) + [MODEL_AXIS, None]))),
]


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def param_pspec(path, leaf, tp: bool) -> P:
    if not tp:
        return P()
    s = _path_str(path)
    for rx, fn in _TP_RULES:
        if rx.search(s):
            return fn(leaf.ndim)
    return P()


def param_shardings(mesh: Mesh, params: Any) -> Any:
    """NamedSharding pytree for a param pytree; TP rules apply iff the model
    axis has >1 devices."""
    tp = mesh.shape[MODEL_AXIS] > 1

    def one(path, leaf):
        return NamedSharding(mesh, param_pspec(path, leaf, tp))

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params(mesh: Mesh, params: Any) -> Any:
    """Place a host param pytree onto the mesh with the rule-derived layout."""
    sh = param_shardings(mesh, params)
    return jax.tree_util.tree_map(jax.device_put, params, sh)
