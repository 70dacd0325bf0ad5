"""Evaluation CLI: `python -m mtp_tpu.cli.test <recipe> --ckpt ... [--save-pred dir]`.

Replaces the reference's per-suite `tools/test.py <config> <ckpt>` drivers:
runs the recipe's eval protocol (top-k / mIoU with slide / F1 / mAP) on a
dataset or on synthetic smoke data, optionally saving prediction
visualizations (the reference's Seg/Det/CDVisualizationHook capability).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np


def save_seg_pred(path: str, pred: np.ndarray, num_classes: int):
    from PIL import Image
    # fixed palette (deterministic per class id)
    rng = np.random.default_rng(42)
    palette = rng.integers(0, 255, (max(num_classes, 2), 3), dtype=np.uint8)
    Image.fromarray(palette[pred.astype(np.int64) % len(palette)]).save(path)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("recipe")
    p.add_argument("--ckpt", default=None, help="orbax dir or encoder .npz")
    p.add_argument("--mesh-data", type=int, default=-1)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--batches", type=int, default=2)
    p.add_argument("--save-pred", default=None,
                   help="directory for prediction visualizations")
    args = p.parse_args(argv)

    import jax
    from mtp_tpu import configs
    from mtp_tpu.cli.train import build_task, synthetic_data

    recipe = configs.get(args.recipe)
    task, cfg = build_task(recipe, args.mesh_data, 1)

    pretrained = None
    if args.ckpt and args.ckpt.endswith(".npz"):
        from mtp_tpu.ckpt.store import load_encoder
        pretrained = load_encoder(args.ckpt)
    state = task.init_state(jax.random.PRNGKey(0),
                            pretrained_backbone=pretrained)
    if args.ckpt and not args.ckpt.endswith(".npz"):
        from mtp_tpu.ckpt.store import CheckpointStore
        store = CheckpointStore(args.ckpt)
        restored = store.restore(state)
        if restored is not None:
            state = restored

    if not args.synthetic:
        raise SystemExit("dataset paths are site-specific; use --synthetic "
                         "or the task API")
    gen = synthetic_data(cfg, cfg.train.batch_size)
    batches = [next(gen) for _ in range(args.batches)]
    res = task.evaluate(state, iter(batches))

    if args.save_pred and cfg.task in ("segmentation", "change_detection"):
        os.makedirs(args.save_pred, exist_ok=True)
        predict = getattr(task, "predict_fn", None)
        if predict is not None:
            fn = predict()
            variables = {"params": state.params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            pred = np.asarray(fn(variables, batches[0]["image"]))
            for i in range(min(4, len(pred))):
                save_seg_pred(os.path.join(args.save_pred, f"pred_{i}.png"),
                              pred[i], cfg.num_classes)

    print(json.dumps({"recipe": recipe.name,
                      "results": {k: (round(v, 4) if isinstance(v, float) else v)
                                  for k, v in res.items()
                                  if not isinstance(v, list)}}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
