"""Serving artifacts: `jax.export` StableHLO serialization for deployment.

The reference publishes research checkpoints only — serving means cloning
the repo and rebuilding the python model. A production TPU framework wants
a model artifact that is independent of the model code: `cli/export.py`
serializes a recipe's jitted predict function to versioned StableHLO
(portable across jax releases and, with `--platforms tpu,cpu`, across
backends), alongside the weights and an input-spec manifest. This module
rehydrates it — no flax/model imports needed at serve time.

Artifact layout (a directory):
    model.stablehlo   jax.export serialization of predict(weights, *inputs)
    weights.npz       flattened weight tree ('/'-joined keys)
    meta.json         {recipe, task, input fields/shapes/dtypes, outputs,
                       platforms, jax version}
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, Tuple

import numpy as np


def save_artifact(out_dir: str, exported, weights: Any,
                  meta: Dict[str, Any]) -> None:
    """Write the three artifact files. `exported` is a jax.export.Exported;
    `weights` the pytree passed as its first argument."""
    from mtp_tpu.ckpt.store import save_encoder
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "model.stablehlo"), "wb") as f:
        f.write(exported.serialize())
    save_encoder(os.path.join(out_dir, "weights.npz"), weights)
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)


def load_artifact(art_dir: str) -> Tuple[Callable[..., Any], Dict[str, Any]]:
    """(serve_fn, meta): serve_fn(*inputs) runs the exported computation
    with the stored weights bound. Inputs are arrays matching
    meta['inputs'] (batch and spatial dims are fixed at export time)."""
    from jax import export as jax_export
    from mtp_tpu.ckpt.store import load_encoder

    with open(os.path.join(art_dir, "model.stablehlo"), "rb") as f:
        exported = jax_export.deserialize(bytearray(f.read()))
    weights = load_encoder(os.path.join(art_dir, "weights.npz"))
    with open(os.path.join(art_dir, "meta.json")) as f:
        meta = json.load(f)

    def serve(*inputs):
        return exported.call(weights, *inputs)

    return serve, meta


def spec_of(tree: Any):
    """Pytree → matching jax.ShapeDtypeStruct tree."""
    import jax

    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
        tree)
