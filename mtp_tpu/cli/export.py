"""Export CLI: `python -m mtp_tpu.cli.export <recipe> --ckpt ... --out dir/`.

Serializes the recipe's jitted predict function + weights into a portable
StableHLO serving artifact (see mtp_tpu/serving.py). The reference has no
deployment path beyond its research checkpoints; this is the TPU-native
serving story: versioned StableHLO with cross-backend lowering
(`--platforms tpu,cpu`), weights separated from the program, rehydrated by
`mtp_tpu.serving.load_artifact` with no model code.

Per task family the exported signature is:
    classification     predict(weights, images)        → logits (B, C)
    segmentation       predict(weights, images)        → class map (B, H, W)
                       (slide protocol compiled in when the recipe has one)
    change_detection   predict(weights, a, b)          → change map (B, H, W)
    detection_*        predict(weights, images)        → dict(boxes, scores,
                       labels, valid[, mask_logits])   (fixed-shape, padded)
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def build_export_fn(task, cfg):
    """(jitted fn, weights pytree placeholderless, input specs, output note).
    The fn's first arg is the weights dict; detection outputs are converted
    to a plain dict so deserialization needs no custom pytree types."""
    import jax
    import jax.numpy as jnp

    S = cfg.backbone.img_size

    if cfg.task == "classification":
        model = task.model

        @jax.jit
        def fn(weights, images):
            return model.apply({"params": weights}, images,
                               deterministic=True)

        def weights_of(state):
            return state.params

        inputs = [("images", (None, S, S, 3), "float32")]
        out = "logits (B, num_classes)"
    elif cfg.task == "segmentation":
        inner = task.predict_fn()

        @jax.jit
        def fn(weights, images):
            return inner(weights, images)

        def weights_of(state):
            v = {"params": state.params}
            if state.batch_stats:
                v["batch_stats"] = state.batch_stats
            return v

        inputs = [("images", (None, S, S, 3), "float32")]
        out = "per-pixel class map (B, H, W) int32"
    elif cfg.task == "change_detection":
        inner = task.predict_fn()

        @jax.jit
        def fn(weights, a, b):
            return inner(weights, a, b)

        def weights_of(state):
            v = {"params": state.params}
            if state.batch_stats:
                v["batch_stats"] = state.batch_stats
            return v

        inputs = [("image_a", (None, S, S, 3), "float32"),
                  ("image_b", (None, S, S, 3), "float32")]
        out = "per-pixel change map (B, H, W) int32"
    elif cfg.task in ("detection_h", "detection_r", "instseg"):
        inner = task.predict_fn()

        @jax.jit
        def fn(weights, images):
            dets = inner(weights, images)
            d = {"boxes": dets.boxes, "scores": dets.scores,
                 "labels": dets.labels, "valid": dets.valid}
            if dets.mask_logits is not None:
                d["mask_logits"] = dets.mask_logits
            return d

        def weights_of(state):
            return state.params

        inputs = [("images", (None, S, S, 3), "float32")]
        out = "dict of fixed-shape padded detections"
    else:
        raise SystemExit(f"task {cfg.task} has no export path "
                         "(multitask: export the encoder + per-task heads "
                         "via the finetune recipes)")
    return fn, weights_of, inputs, out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("recipe")
    p.add_argument("--out", required=True, help="artifact directory")
    p.add_argument("--ckpt", default=None, help="orbax dir or encoder .npz")
    p.add_argument("--batch-size", type=int, default=1,
                   help="serving batch size baked into the program")
    p.add_argument("--img-size", type=int, default=None)
    p.add_argument("--platforms", default=None,
                   help="comma list (e.g. 'tpu,cpu'); default: current "
                        "backend")
    p.add_argument("--det-overrides", default=None)
    args = p.parse_args(argv)

    import jax
    from jax import export as jax_export
    from mtp_tpu import configs
    from mtp_tpu.cli.train import build_task, init_or_restore, shrink_recipe
    from mtp_tpu.serving import save_artifact, spec_of

    recipe = shrink_recipe(configs.get(args.recipe), args.img_size)
    det_overrides = (json.loads(args.det_overrides)
                     if args.det_overrides else None)
    task, cfg = build_task(recipe, 1, 1, det_overrides)
    state = init_or_restore(task, args.ckpt)

    fn, weights_of, inputs, out_desc = build_export_fn(task, cfg)
    weights = jax.tree.map(np.asarray, weights_of(state))
    B = args.batch_size
    in_specs = [jax.ShapeDtypeStruct((B,) + tuple(shape[1:]),
                                     np.dtype(dt))
                for _, shape, dt in inputs]
    platforms = (tuple(p.strip() for p in args.platforms.split(","))
                 if args.platforms else None)
    exported = jax_export.export(fn, platforms=platforms)(
        spec_of(weights), *in_specs)

    meta = {
        "recipe": recipe.name, "task": cfg.task,
        "num_classes": cfg.num_classes,
        "img_size": cfg.backbone.img_size, "batch_size": B,
        "inputs": [{"name": n, "shape": [B] + list(s[1:]), "dtype": d}
                   for n, s, d in inputs],
        "outputs": out_desc,
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
    }
    save_artifact(args.out, exported, weights, meta)
    print(json.dumps({"out": args.out, "platforms": meta["platforms"],
                      "inputs": meta["inputs"]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
