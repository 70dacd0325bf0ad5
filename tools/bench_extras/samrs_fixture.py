"""SAMRS-shaped on-disk fixture at pretraining scale (VERDICT r3 item 3).

Builds {out}/{sota,sior,fast}/ each with images/ (PNG patches), ins.json
(COCO instances with RLE masks), segs/ (class+1 semantic PNGs) and rots/
(DOTA txt rboxes) — the exact layout `cli.train mtp_vit_l_rvsa_448_samrs
--data-root` consumes (data/bindings.py:_samrs_datasets).  Instance counts
and box-size mix follow the SAMRS patch statistics (~14 instances/patch,
16-160 px boxes); images are 1024² like the real SOTA patches so PNG decode
+ the joint augmentation pipeline carry realistic host cost.

    python tools/bench_extras/samrs_fixture.py --out /tmp/samrs_fx --n 60
"""
import argparse
import json
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from mtp_tpu.data.datasets import (FAST_CLASSES, SIOR_CLASSES,  # noqa: E402
                                   SOTA_CLASSES)
from mtp_tpu.data.parsers import mask_to_rle  # noqa: E402

# REAL class-name lists: the rots-txt parser maps names through the
# dataset's class tuple — synthetic names would silently drop every rbox
# (that exact bug produced all-zero rd losses in the first measurement run)
SUBS = (("sota", SOTA_CLASSES), ("sior", SIOR_CLASSES),
        ("fast", FAST_CLASSES))


def build_one(base, n, size, class_names, inst_per_img, rng):
    ncls = len(class_names)  # incl. background at index 0
    img_dir = os.path.join(base, "images")
    seg_dir = os.path.join(base, "segs")
    rot_dir = os.path.join(base, "rots")
    for d in (img_dir, seg_dir, rot_dir):
        os.makedirs(d, exist_ok=True)
    images, annotations = [], []
    ann_id = 0
    for i in range(n):
        name = f"im{i}.png"
        # textured image (cheap to generate, realistic PNG entropy):
        # low-frequency base + noise
        base_img = rng.integers(40, 200, (8, 8, 3), dtype=np.uint8)
        img = np.asarray(Image.fromarray(base_img).resize(
            (size, size), Image.BILINEAR), np.uint8)
        img = np.clip(img.astype(np.int16) +
                      rng.integers(-25, 25, img.shape), 0, 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(img_dir, name))

        seg = np.zeros((size, size), np.uint8)
        lines = []
        images.append({"id": i, "file_name": name, "height": size,
                       "width": size})
        for _ in range(inst_per_img):
            w = int(rng.integers(16, 160))
            h = int(rng.integers(16, 160))
            x0 = int(rng.integers(0, size - w))
            y0 = int(rng.integers(0, size - h))
            cls = int(rng.integers(0, ncls - 1))
            mask = np.zeros((size, size), np.uint8)
            # elliptical instance inside the box (non-trivial RLE)
            yy, xx = np.mgrid[0:h, 0:w]
            ell = (((yy - h / 2) / (h / 2)) ** 2 +
                   ((xx - w / 2) / (w / 2)) ** 2) <= 1.0
            mask[y0:y0 + h, x0:x0 + w] = ell
            seg[y0:y0 + h, x0:x0 + w][ell] = cls + 1
            annotations.append({
                "id": ann_id, "image_id": i, "category_id": cls,
                "bbox": [x0, y0, w, h], "area": int(ell.sum()),
                "iscrowd": 0, "segmentation": mask_to_rle(mask)})
            ann_id += 1
            cx, cy = x0 + w / 2, y0 + h / 2
            ang = float(rng.uniform(0, np.pi))
            dx, dy = np.cos(ang), np.sin(ang)
            ex, ey = dx * w / 2, dy * w / 2
            px, py = -dy * h / 2, dx * h / 2
            quad = [cx - ex - px, cy - ey - py, cx + ex - px, cy + ey - py,
                    cx + ex + px, cy + ey + py, cx - ex + px, cy - ey + py]
            quad = " ".join(f"{v:.1f}" for v in quad)
            lines.append(f"{quad} {class_names[cls + 1]} 0")
        Image.fromarray(seg).save(os.path.join(seg_dir, f"im{i}.png"))
        with open(os.path.join(rot_dir, f"im{i}.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")
    with open(os.path.join(base, "ins.json"), "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [{"id": c, "name": f"cls{c}"}
                                  for c in range(ncls - 1)]}, f)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--n", type=int, default=60, help="images per dataset")
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--instances", type=int, default=14)
    args = p.parse_args()
    rng = np.random.default_rng(0)
    for sub, class_names in SUBS:
        build_one(os.path.join(args.out, sub), args.n, args.size,
                  class_names, args.instances, rng)
        print(f"{sub}: {args.n} images ({args.size}²), "
              f"{args.n * args.instances} instances", flush=True)


if __name__ == "__main__":
    main()
