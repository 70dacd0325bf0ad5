"""DIOR-shaped on-disk detection fixture (VERDICT r4 item 4: host-feed the
800² detection recipes, same methodology as the 448² flagship host-feed).

Builds {out}/images/*.png + {out}/train.json — the COCO layout
`cli.train faster_rcnn_rvsa_l_800_mae_mtp_dior --data-root` consumes
(data/bindings.py detection_h branch).  DIOR images are 800×800 JPEG with a
long-tailed object count (reference RS_Tasks_Finetune horizontal detection,
~20 objects/img average at DIOR statistics); PNGs here carry realistic
decode cost at the same pixel count.

    python tools/bench_extras/dior_fixture.py --out /tmp/dior_fx --n 60
"""
import argparse
import json
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--n", type=int, default=60)
    p.add_argument("--size", type=int, default=800)
    p.add_argument("--instances", type=int, default=20)
    p.add_argument("--classes", type=int, default=20)  # DIOR has 20
    args = p.parse_args()

    rng = np.random.default_rng(0)
    size = args.size
    img_dir = os.path.join(args.out, "images")
    os.makedirs(img_dir, exist_ok=True)
    images, annotations = [], []
    ann_id = 0
    for i in range(args.n):
        name = f"im{i}.png"
        base_img = rng.integers(40, 200, (8, 8, 3), dtype=np.uint8)
        img = np.asarray(Image.fromarray(base_img).resize(
            (size, size), Image.BILINEAR), np.uint8)
        img = np.clip(img.astype(np.int16) +
                      rng.integers(-25, 25, img.shape), 0,
                      255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(img_dir, name))
        images.append({"id": i, "file_name": name, "height": size,
                       "width": size})
        for _ in range(args.instances):
            w = int(rng.integers(12, 200))
            h = int(rng.integers(12, 200))
            x0 = int(rng.integers(0, size - w))
            y0 = int(rng.integers(0, size - h))
            annotations.append({
                "id": ann_id, "image_id": i,
                "category_id": int(rng.integers(0, args.classes)),
                "bbox": [x0, y0, w, h], "area": w * h, "iscrowd": 0})
            ann_id += 1
    with open(os.path.join(args.out, "train.json"), "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [{"id": c, "name": f"cls{c}"}
                                  for c in range(args.classes)]}, f)
    print(f"dior_fixture: {args.n} images @ {size}² with "
          f"{args.instances}/img -> {args.out}")


if __name__ == "__main__":
    main()
