"""Training CLI: `python -m mtp_tpu.cli.train <recipe> [options]`.

Replaces the reference's per-suite `tools/train.py <config> --launcher slurm`
entry points and the pretraining `main_pretrain.py` argparse CLI with one
recipe-registry driver.  There is no launcher flag: SPMD over the mesh
replaces process groups entirely.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys

import numpy as np


def build_task(recipe, mesh_data: int, mesh_model: int,
               det_overrides: dict = None, tasks=("ss", "is", "rd")):
    import jax
    from mtp_tpu import configs
    from mtp_tpu.utils.config import MeshConfig

    cfg = recipe.task
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, mesh=MeshConfig(data=mesh_data, model=mesh_model)))

    if cfg.task == "classification":
        from mtp_tpu.tasks.classification import ClassificationTask
        return ClassificationTask(cfg), cfg
    if cfg.task == "segmentation":
        from mtp_tpu.tasks.segmentation import SegmentationTask
        return SegmentationTask(cfg), cfg
    if cfg.task == "change_detection":
        from mtp_tpu.tasks.change_detection import ChangeDetectionTask
        return ChangeDetectionTask(cfg), cfg
    if cfg.task == "multitask":
        from mtp_tpu.tasks.multitask import MultiTaskPretrainTask
        return MultiTaskPretrainTask(cfg, det_overrides=det_overrides,
                                     tasks=tasks), cfg
    if cfg.task in ("detection_h", "detection_r", "instseg"):
        from mtp_tpu.tasks.detection_task import DetectionTask
        head = {"detection_h": "faster_rcnn", "instseg": "mask_rcnn",
                "detection_r": "oriented_rcnn"}[cfg.task]
        if "retinanet" in recipe.name:
            head = "retinanet"
        return DetectionTask(cfg, head=head, det_overrides=det_overrides), cfg
    raise SystemExit(f"task {cfg.task} has no generic CLI driver yet; "
                     f"use the task API directly")


def shrink_recipe(recipe, img_size):
    """--img-size override for eval/export CLIs: smaller backbone input,
    slide crop clamped to fit."""
    if not img_size:
        return recipe
    cfg = recipe.task
    cfg = dataclasses.replace(cfg, backbone=dataclasses.replace(
        cfg.backbone, img_size=img_size))
    if cfg.slide is not None and cfg.slide.crop > img_size:
        from mtp_tpu.utils.config import SlideConfig
        cfg = dataclasses.replace(cfg, slide=SlideConfig(
            crop=img_size, stride=max(img_size // 2, 1)))
    return dataclasses.replace(recipe, task=cfg)


def init_or_restore(task, ckpt):
    """Fresh state, optionally loaded from an encoder .npz (pretrained
    backbone), a full-variables .npz (converted released finetuned model,
    tools/validate.py), or an orbax checkpoint dir (full state)."""
    import jax
    import jax.numpy as jnp

    pretrained = None
    variables = None
    if ckpt and ckpt.endswith(".npz"):
        from mtp_tpu.ckpt.store import (load_encoder, load_variables,
                                        npz_is_full_variables)
        if npz_is_full_variables(ckpt):
            variables = load_variables(ckpt)
        else:
            pretrained = load_encoder(ckpt)
    state = task.init_state(jax.random.PRNGKey(0),
                            pretrained_backbone=pretrained)
    if variables is not None:
        def place(old, new):
            new = jnp.asarray(new, jnp.asarray(old).dtype)
            assert new.shape == old.shape, (new.shape, old.shape)
            return jax.device_put(new, old.sharding)

        state = state.replace(
            params=jax.tree.map(place, state.params, variables["params"]),
            batch_stats=jax.tree.map(place, state.batch_stats,
                                     variables.get("batch_stats", {})))
    if ckpt and not ckpt.endswith(".npz"):
        from mtp_tpu.ckpt.store import CheckpointStore
        restored = CheckpointStore(ckpt).restore(state)
        if restored is not None:
            state = restored
    return state


def synthetic_data(cfg, batch_size: int):
    """Synthetic batches for --synthetic smoke runs (shape-compatible with
    the recipe)."""
    rng = np.random.default_rng(0)
    s = cfg.backbone.img_size

    def gen():
        while True:
            if cfg.task == "classification":
                yield {"image": rng.standard_normal(
                    (batch_size, s, s, 3)).astype(np.float32),
                    "label": rng.integers(0, cfg.num_classes, batch_size)}
            elif cfg.task == "segmentation":
                yield {"image": rng.standard_normal(
                    (batch_size, s, s, 3)).astype(np.float32),
                    "label": rng.integers(0, cfg.num_classes,
                                          (batch_size, s, s))}
            elif cfg.task == "change_detection":
                yield {"image_a": rng.standard_normal(
                    (batch_size, s, s, 3)).astype(np.float32),
                    "image_b": rng.standard_normal(
                        (batch_size, s, s, 3)).astype(np.float32),
                    "label": rng.integers(0, 2, (batch_size, s, s))}
            elif cfg.task in ("detection_h", "detection_r", "instseg"):
                G = 16
                rotated = cfg.task == "detection_r"
                xy = rng.uniform(s * 0.1, s * 0.6, (batch_size, G, 2))
                wh = rng.uniform(s * 0.05, s * 0.25, (batch_size, G, 2))
                if rotated:
                    boxes = np.concatenate(
                        [xy + wh / 2, wh,
                         rng.uniform(-1.2, 1.2, (batch_size, G, 1))],
                        -1).astype(np.float32)
                else:
                    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
                batch = {
                    "image": rng.standard_normal(
                        (batch_size, s, s, 3)).astype(np.float32),
                    "gt_boxes": boxes,
                    "gt_labels": rng.integers(0, cfg.num_classes,
                                              (batch_size, G)).astype(np.int32),
                    "gt_valid": np.ones((batch_size, G), bool)}
                if cfg.task == "instseg":
                    batch["gt_masks"] = np.ones(
                        (batch_size, G, s // 4, s // 4), np.float32)
                yield batch
            elif cfg.task == "multitask":
                out = {}
                G = 8
                from mtp_tpu.models.multitask import SAMRS_CLASSES
                for d, nc in enumerate(SAMRS_CLASSES):
                    xy = rng.uniform(s * 0.1, s * 0.6, (batch_size, G, 2))
                    wh = rng.uniform(s * 0.05, s * 0.25, (batch_size, G, 2))
                    out[f"d{d}"] = {
                        "image": rng.standard_normal(
                            (batch_size, s, s, 3)).astype(np.float32),
                        "ss_label": rng.integers(0, nc, (batch_size, s, s)).astype(np.int32),
                        "gt_boxes": np.concatenate([xy, xy + wh], -1).astype(np.float32),
                        "gt_labels": rng.integers(0, nc - 1, (batch_size, G)).astype(np.int32),
                        "gt_valid": np.ones((batch_size, G), bool),
                        "gt_masks": np.ones((batch_size, G, s // 4, s // 4), np.float32),
                        "r_gt_boxes": np.concatenate(
                            [xy + wh / 2, wh,
                             rng.uniform(-1.2, 1.2, (batch_size, G, 1))],
                            -1).astype(np.float32),
                        "r_gt_labels": rng.integers(0, nc - 1, (batch_size, G)).astype(np.int32),
                        "r_gt_valid": np.ones((batch_size, G), bool)}
                yield out
            else:
                raise SystemExit(f"--synthetic not supported for {cfg.task}")

    return gen()


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("recipe", help="recipe name (see --list)")
    p.add_argument("--list", action="store_true")
    p.add_argument("--steps", type=int, default=None,
                   help="override total steps")
    p.add_argument("--epochs", type=int, default=None,
                   help="epoch-based run length (reference max_epochs, e.g. "
                        "12 for detection): total steps = "
                        "ceil(len(dataset)/batch) * epochs; needs "
                        "--data-root")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--img-size", type=int, default=None,
                   help="override backbone image size (smoke runs)")
    p.add_argument("--det-overrides", default=None,
                   help='JSON dict of DetConfig overrides, e.g. '
                        '\'{"nms_pre":128,"rcnn_num":32}\'')
    p.add_argument("--ckpt-dir", default=None,
                   help="orbax checkpoint directory (enables periodic saves)")
    p.add_argument("--ckpt-every", type=int, default=1000)
    p.add_argument("--resume", action="store_true",
                   help="restore the latest checkpoint from --ckpt-dir "
                        "(reference --ft/--resume)")
    p.add_argument("--encoder-out", default=None,
                   help="also export the encoder-only .npz at each save "
                        "(the finetune artifact)")
    p.add_argument("--mesh-data", type=int, default=-1)
    p.add_argument("--mesh-model", type=int, default=1)
    p.add_argument("--pretrained", default=None,
                   help="encoder checkpoint (.npz from save_encoder or a "
                        "torch .pth — converted automatically)")
    p.add_argument("--work-dir", default="work_dirs")
    p.add_argument("--synthetic", action="store_true",
                   help="train on synthetic data (smoke/benchmark runs)")
    p.add_argument("--data-root", default=None,
                   help="dataset root for real-data training (per-recipe "
                        "layouts: DATASETS.md / mtp_tpu/data/bindings.py)")
    p.add_argument("--max-gts", type=int, default=100,
                   help="fixed-shape padding cap for gt instances per image")
    p.add_argument("--num-workers", type=int, default=0,
                   help="fork-based decode worker processes per loader")
    p.add_argument("--tasks", nargs="+", default=["ss", "is", "rd"],
                   choices=("ss", "is", "rd"),
                   help="multitask pretrain task subset (reference "
                        "main_pretrain.py --tasks); ignored by other tasks")
    p.add_argument("--alloc", choices=("ratio", "avg"), default="ratio",
                   help="multitask per-dataset batch allocation (reference "
                        "--batch_mode)")
    p.add_argument("--eval-after", action="store_true",
                   help="run validation on the val/test split after training")
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--scan", action="store_true",
                   help="scan the backbone's repeated blocks (one compiled "
                        "block group per shape; smaller programs)")
    p.add_argument("--remat", action="store_true",
                   help="activation checkpointing per block (reference "
                        "use_ckpt/with_cp)")
    p.add_argument("--pallas", action="store_true",
                   help="Pallas kernels on the hot paths (fused window/full "
                        "attention for ViT, one-hot DCNv3 for InternImage)")
    args = p.parse_args(argv)

    from mtp_tpu import configs
    if args.list or args.recipe == "list":
        print("\n".join(configs.available()))
        return 0

    import jax
    from mtp_tpu.utils.log import JsonlLogger, make_logger

    recipe = configs.get(args.recipe)
    cfg = recipe.task
    if args.steps:
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, schedule=dataclasses.replace(
                cfg.train.schedule, total_steps=args.steps)))
    if args.batch_size:
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, batch_size=args.batch_size))
    if args.scan or args.remat or args.pallas:
        cfg = dataclasses.replace(cfg, backbone=dataclasses.replace(
            cfg.backbone, scan=args.scan or cfg.backbone.scan,
            remat=args.remat or cfg.backbone.remat,
            pallas_attn=args.pallas or cfg.backbone.pallas_attn))
    if args.img_size:
        cfg = dataclasses.replace(cfg, backbone=dataclasses.replace(
            cfg.backbone, img_size=args.img_size))
        if cfg.slide is not None and cfg.slide.crop > args.img_size:
            from mtp_tpu.utils.config import SlideConfig
            cfg = dataclasses.replace(cfg, slide=SlideConfig(
                crop=args.img_size, stride=max(args.img_size // 2, 1)))
    if args.epochs:
        if not args.data_root:
            raise SystemExit("--epochs needs --data-root (steps are "
                             "computed from the dataset length)")
        if args.steps:
            raise SystemExit("pass --steps or --epochs, not both")
        from mtp_tpu.data.bindings import (dataset_lengths_and_batches)
        bs = cfg.train.batch_size
        lengths, sizes = dataset_lengths_and_batches(
            recipe, cfg, args.data_root, bs, alloc=args.alloc,
            max_gts=args.max_gts)
        # multitask: zip of the 3 loaders ends at the shortest (reference
        # main_pretrain.py:689 epoch semantics); min() is a no-op for the
        # single-dataset tasks
        spe = min(-(-n // s) for n, s in zip(lengths, sizes))
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, schedule=dataclasses.replace(
                cfg.train.schedule, total_steps=spe * args.epochs)))
    recipe = dataclasses.replace(recipe, task=cfg)

    det_overrides = json.loads(args.det_overrides) if args.det_overrides else None
    task, cfg = build_task(recipe, args.mesh_data, args.mesh_model,
                           det_overrides, tasks=tuple(args.tasks))
    logger = make_logger(log_file=f"{args.work_dir}/{recipe.name}.log")
    jsonl = JsonlLogger(f"{args.work_dir}/{recipe.name}.jsonl")
    logger.info("recipe %s on mesh %s", recipe.name, task.mesh)

    pretrained = None
    if args.pretrained:
        if args.pretrained.endswith(".npz"):
            from mtp_tpu.ckpt.store import load_encoder
            pretrained = load_encoder(args.pretrained)
        else:
            # scan-layout restacking happens inside the converter (driven by
            # cfg.backbone.scan, both ViT and InternImage layouts)
            from mtp_tpu.ckpt.torch_convert import convert_backbone_checkpoint
            pretrained = convert_backbone_checkpoint(args.pretrained,
                                                     cfg.backbone)
        logger.info("loaded pretrained encoder from %s", args.pretrained)

    state = task.init_state(jax.random.PRNGKey(cfg.train.seed),
                            pretrained_backbone=pretrained)

    store = None
    if args.ckpt_dir:
        from mtp_tpu.ckpt.store import CheckpointStore
        store = CheckpointStore(args.ckpt_dir)
        if args.resume:
            restored = store.restore(state)
            if restored is not None:
                state = restored
                logger.info("resumed from step %d", int(state.step))

    # Resume trains only the REMAINDER of the schedule (reference --resume
    # restores start_epoch and continues, main_pretrain.py:486,679) — not
    # total_steps extra iterations past schedule end.
    total_steps = cfg.train.schedule.total_steps
    steps = max(0, total_steps - int(state.step))
    if steps < total_steps:
        logger.info("resume: %d/%d steps already done, %d remaining",
                    int(state.step), total_steps, steps)

    batch_size = args.batch_size or cfg.train.batch_size
    if args.synthetic:
        data = synthetic_data(cfg, batch_size)
    elif args.data_root:
        from mtp_tpu.data.bindings import build_train_data
        data, info = build_train_data(recipe, cfg, args.data_root,
                                      batch_size, max_gts=args.max_gts,
                                      num_workers=args.num_workers,
                                      alloc=args.alloc)
        logger.info("real data from %s: %s", args.data_root, info)
    else:
        raise SystemExit(
            "pass --data-root <dir> (layouts: DATASETS.md) for real-data "
            "training or --synthetic for smoke runs")

    def log_fn(i, m):
        logger.info("iter %d %s", i, {k: round(v, 4) for k, v in m.items()})
        jsonl.log(i, m)

    fit_kw = {}
    if store is not None:
        fit_kw = dict(ckpt=store, ckpt_every=args.ckpt_every,
                      encoder_path=args.encoder_out)
    state, metrics = task.fit(state, data, steps,
                              log_every=args.log_every, log_fn=log_fn,
                              **fit_kw)
    if store is None and args.encoder_out:
        import numpy as _np
        from mtp_tpu.ckpt.store import save_encoder
        enc_key = "encoder" if "encoder" in state.params else "backbone"
        save_encoder(args.encoder_out,
                     jax.tree.map(_np.asarray, state.params[enc_key]))
    logger.info("final %s", metrics)

    eval_metrics = None
    if args.eval_after:
        if not args.data_root:
            raise SystemExit("--eval-after needs --data-root")
        from mtp_tpu.data.bindings import build_eval_data
        eval_iter = build_eval_data(recipe, cfg, args.data_root, batch_size,
                                    max_gts=args.max_gts)
        if eval_iter is None:
            logger.warning("no val/test split under %s — skipping eval",
                           args.data_root)
        else:
            kw = {"coco": True} if cfg.task == "instseg" else {}
            eval_metrics = task.evaluate(state, eval_iter, **kw)
            eval_metrics = {k: v for k, v in eval_metrics.items()
                            if isinstance(v, (int, float))}
            logger.info("eval %s", eval_metrics)

    out = {"recipe": recipe.name, "final": metrics}
    if eval_metrics is not None:
        out["eval"] = eval_metrics
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
