"""Checkpoint converter CLI: released PyTorch MTP weights → mtp_tpu .npz.

`python -m mtp_tpu.cli.convert <ckpt.pth> <out.npz> --backbone vit_l_rvsa
 --img-size 512 [--scan]`

Implements the reference loaders' semantics (prefix surgery, cls-token strip,
bicubic pos-embed / rel-pos interpolation — see ckpt/torch_convert.py).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("ckpt")
    p.add_argument("out")
    p.add_argument("--backbone", default="vit_b_rvsa",
                   choices=["vit_b_rvsa", "vit_l_rvsa", "internimage_xl",
                            "internimage_t"])
    p.add_argument("--img-size", type=int, default=224)
    p.add_argument("--scan", action="store_true",
                   help="emit the scanned layout (ViT block_groups / "
                        "InternImage stage layers, stacked leading axis)")
    args = p.parse_args(argv)

    from mtp_tpu.ckpt.store import save_encoder
    from mtp_tpu.ckpt.torch_convert import convert_backbone_checkpoint

    if args.backbone.startswith("internimage"):
        from mtp_tpu.models.backbones import internimage_backbone_config
        cfg = internimage_backbone_config(args.backbone, args.img_size,
                                          scan=args.scan)
        params = convert_backbone_checkpoint(args.ckpt, cfg)
        desc = args.backbone + (" scan" if args.scan else "")
    else:
        from mtp_tpu.utils.config import BACKBONES
        cfg = BACKBONES[args.backbone](args.img_size, scan=args.scan)
        params = convert_backbone_checkpoint(args.ckpt, cfg)
        desc = (f"{args.backbone} grid {args.img_size // cfg.patch_size}²"
                f"{' scan' if args.scan else ''}")
    save_encoder(args.out, params)
    n = sum(np.asarray(v).size for v in
            __import__("jax").tree.leaves(params))
    print(f"wrote {args.out}: {n/1e6:.1f}M params ({desc})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
