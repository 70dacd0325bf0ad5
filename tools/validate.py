"""Released-weights validation runbook: ckpt → convert → eval → delta.

One command per recipe, runnable the day real released artifacts/datasets
are mounted:

    python tools/validate.py rvsa-l-upernet-384-mae-mtp-spacenetv1 \
        --ckpt /weights/rvsa-l-mae-mtp-spacenet.pth --data-root /data/spacenet

accepts either a released FINETUNED torch checkpoint (.pth — converted in
full via ckpt/full_convert for classification / segmentation / change
detection / horizontal & rotated detection), our own orbax checkpoint dir,
or an encoder .npz; runs the
recipe's evaluation protocol via cli.test, and prints the metric next to
the reference's published number (BASELINE.md accuracy table,
reference Readme.md:137-193) with the delta.

Reference baselines are keyed by recipe name below; recipes without a
published number still evaluate and print their metrics.
"""

from __future__ import annotations

import argparse
import json
import sys

# recipe name → (metric key in cli.test output, published reference value)
# values from BASELINE.md (reference Readme.md:137-193 + committed logs)
BASELINES = {
    # scene classification (OA == top1, %)
    "vit-rvsa-b-224-mae-mtp_eurosat": ("top1", 98.76),
    "vit-rvsa-l-224-mae-mtp_eurosat": ("top1", 98.78),
    "intern-xl-224-imp-mtp_eurosat": ("top1", 99.24),
    "vit-rvsa-b-224-mae-mtp_resisc45": ("top1", 95.57),
    "vit-rvsa-l-224-mae-mtp_resisc45": ("top1", 95.88),
    "intern-xl-224-imp-mtp_resisc45": ("top1", 96.27),
    # semantic segmentation (mIoU)
    "rvsa-b-upernet-384-mae-mtp-spacenetv1": ("mIoU", 79.63),
    "rvsa-l-upernet-384-mae-mtp-spacenetv1": ("mIoU", 79.54),
    "intern-xl-upernet-384-imp-mtp-spacenetv1": ("mIoU", 79.16),
    "rvsa-b-upernet-512-mae-mtp-loveda": ("mIoU", 52.39),
    "rvsa-l-upernet-512-mae-mtp-loveda": ("mIoU", 54.17),
    "intern-xl-upernet-512-imp-mtp-loveda": ("mIoU", 54.17),
    # change detection (change-class F1 == F1_change)
    "rvsa-b-unet-96-mae-mtp_oscd_rgb": ("F1_change", 53.36),
    "rvsa-l-unet-96-mae-mtp_oscd_rgb": ("F1_change", 55.92),
    "intern-xl-unet-96-imp-mtp_oscd_rgb": ("F1_change", 55.61),
    "rvsa-b-unet-256-mae-mtp_whu": ("F1_change", 94.32),
    "rvsa-l-unet-256-mae-mtp_whu": ("F1_change", 94.75),
    "intern-xl-unet-256-imp-mtp_whu": ("F1_change", 95.59),
    "rvsa-b-unet-256-mae-mtp_levir": ("F1_change", 92.22),
    "rvsa-l-unet-256-mae-mtp_levir": ("F1_change", 92.67),
    "intern-xl-unet-256-imp-mtp_levir": ("F1_change", 92.54),
    "rvsa-b-unet-256-mae-mtp_cdd": ("F1_change", 97.87),
    "rvsa-l-unet-256-mae-mtp_cdd": ("F1_change", 97.98),
    "intern-xl-unet-256-imp-mtp_cdd": ("F1_change", 98.33),
    # horizontal detection (VOC AP50 — our eval_map's mAP at IoU .5)
    "faster_rcnn_rvsa_b_800_mae_mtp_dior": ("mAP", 79.00),
    "faster_rcnn_rvsa_l_800_mae_mtp_dior": ("mAP", 81.70),
    "faster_rcnn_intern_xl_800_imp_mtp_dior": ("mAP", 78.30),
    "retinanet_rvsa_b_416_mae_mtp_xview": ("mAP", 16.40),
    "retinanet_rvsa_l_416_mae_mtp_xview": ("mAP", 19.40),
    "retinanet_intern_xl_416_imp_mtp_xview": ("mAP", 18.20),
    # rotated detection (VOC mAP50)
    "oriented_rcnn_rvsa_b_800_mae_mtp_diorr": ("mAP", 71.29),
    "oriented_rcnn_rvsa_l_800_mae_mtp_diorr": ("mAP", 74.54),
    "oriented_rcnn_intern_xl_800_imp_mtp_diorr": ("mAP", 72.17),
    # FAIR1M-2.0 mAP is scored by the challenge server on the merged
    # submission (cli.test --format-only --fair1m); the published numbers
    # are recorded for the delta printout when a local score is supplied
    "oriented_rcnn_rvsa_b_800_mae_mtp_fair1m20_branches": ("mAP", 51.92),
    "oriented_rcnn_rvsa_l_800_mae_mtp_fair1m20_branches": ("mAP", 53.00),
    "oriented_rcnn_intern_xl_800_imp_mtp_fair1m20": ("mAP", 50.93),
}

_FULL_CONVERT_TASKS = {"classification", "segmentation", "change_detection",
                       "detection_h", "detection_r"}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("recipe")
    p.add_argument("--ckpt", required=True,
                   help="released finetuned .pth, orbax dir, or encoder .npz")
    p.add_argument("--data-root", required=True)
    p.add_argument("--split", default=None,
                   help="dataset split (default: the recipe's test protocol)")
    p.add_argument("--batches", type=int, default=0,
                   help="0 = the full split (validation runs everything)")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--det-overrides", default=None,
                   help="JSON DetConfig overrides passed through to "
                        "cli.test (smoke-scale NMS/proposal counts)")
    p.add_argument("--out", default=None, help="write the JSON record here")
    args = p.parse_args(argv)

    from mtp_tpu import configs
    from mtp_tpu.cli import test as cli_test

    recipe = configs.get(args.recipe)
    task_kind = recipe.task.task

    ckpt = args.ckpt
    if ckpt.endswith((".pth", ".pt", ".bin")):
        kind = task_kind if task_kind in _FULL_CONVERT_TASKS else None
        if kind is None:
            raise SystemExit(
                f"full torch-checkpoint conversion for task '{task_kind}' is "
                "not wired — convert the backbone with cli.convert and "
                "finetune, or pass an orbax/npz checkpoint")
        import tempfile

        from mtp_tpu.ckpt.full_convert import convert_full_checkpoint
        from mtp_tpu.ckpt.store import save_variables

        variables = convert_full_checkpoint(ckpt, kind, recipe.task.backbone)
        tmp = tempfile.mkdtemp(prefix="mtp_validate_")
        ckpt = f"{tmp}/converted.npz"
        save_variables(ckpt, variables)
        print(f"converted {args.ckpt} -> {ckpt}", file=sys.stderr)

    cli_args = [args.recipe, "--ckpt", ckpt, "--data-root", args.data_root,
                "--batches", str(args.batches)]
    if args.split:
        cli_args += ["--split", args.split]
    if args.batch_size:
        cli_args += ["--batch-size", str(args.batch_size)]
    if args.det_overrides:
        cli_args += ["--det-overrides", args.det_overrides]
    metrics = cli_test.main(cli_args, return_metrics=True)

    key, ref = BASELINES.get(args.recipe, (None, None))
    rec = {"recipe": args.recipe, "metrics": metrics}
    if key is not None and key in metrics:
        ours = float(metrics[key])
        rec.update({"metric": key, "ours": ours, "reference": ref,
                    "delta": round(ours - ref, 2)})
        print(f"{args.recipe}: {key} ours={ours:.2f} reference={ref:.2f} "
              f"delta={ours - ref:+.2f}")
    else:
        print(f"{args.recipe}: no published baseline — metrics: {metrics}")
    print(json.dumps(rec))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rec, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
