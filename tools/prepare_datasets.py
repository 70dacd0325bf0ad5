#!/usr/bin/env python
"""Dataset preparation CLI — TPU-framework port of the reference `scripts/`.

Subcommands (reference counterpart in parens):

  samrs-pkl-to-coco   SAMRS instance .pkl masks → COCO json (convert_pkl_json.py)
  voc-to-coco         VOC xml detections → COCO json (dior_h_2_coco.py)
  tile-images         Large GeoTIFF/PNG → fixed patches named base__x___y
                      (the offline DOTA tiling the reference assumes)
  loveda-shift        Subtract 1 from LoveDA prediction PNGs for submission
                      (change_loveda_label.py)
  ckpt-surgery        Checkpoint key surgery: strip `module./encoder.`
                      prefixes, optional encoder→backbone rename
                      (change_ckpt.py)
  dota-to-fair1m      DOTA Task1 submission txts → FAIR1M xml tree
                      (dota_submit_txt_to_fair1m_xml.py)

All parsing is dependency-light (json/xml/PIL/numpy; the COCO RLE codec is
mtp_tpu.data.parsers).
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import xml.etree.ElementTree as ET

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SAMRS_CATEGORY_SETS = {
    "sota": ('large-vehicle', 'swimming-pool', 'helicopter', 'bridge',
             'plane', 'ship', 'soccer-ball-field', 'basketball-court',
             'ground-track-field', 'small-vehicle', 'baseball-diamond',
             'tennis-court', 'roundabout', 'storage-tank', 'harbor',
             'container-crane', 'airport', 'helipad'),
    "sior": ('airplane', 'airport', 'baseballfield', 'basketballcourt',
             'bridge', 'chimney', 'expressway-service-area',
             'expressway-toll-station', 'dam', 'golffield',
             'groundtrackfield', 'harbor', 'overpass', 'ship', 'stadium',
             'storagetank', 'tenniscourt', 'trainstation', 'vehicle',
             'windmill'),
}


def samrs_pkl_to_coco(args):
    """Each .pkl holds a list of {label, mask(RLE dict)} (reference
    load_img_info, convert_pkl_json.py:83-113)."""
    from PIL import Image
    from mtp_tpu.data.parsers import rle_to_mask

    with open(os.path.join(args.root, f"{args.split}.txt")) as f:
        stems = [l.strip() for l in f if l.strip()]

    images, annotations = [], []
    ann_id = 0
    for img_id, stem in enumerate(stems):
        img_path = os.path.join(args.image_dir, stem + args.ext_img)
        with Image.open(img_path) as im:
            w, h = im.size
        images.append({"id": img_id, "file_name": os.path.basename(img_path),
                       "height": h, "width": w})
        with open(os.path.join(args.label_dir, stem + ".pkl"), "rb") as f:
            segm_list = pickle.load(f)
        for ins in segm_list:
            rle = ins["mask"]
            m = rle_to_mask(rle if isinstance(rle["counts"], (str, list))
                            else rle)
            ys, xs = np.nonzero(m)
            if not len(ys):
                continue
            x0, y0 = int(xs.min()), int(ys.min())
            bw, bh = int(xs.max() - x0 + 1), int(ys.max() - y0 + 1)
            annotations.append({
                "id": ann_id, "image_id": img_id, "iscrowd": 0,
                "category_id": int(ins["label"]),
                "bbox": [x0, y0, bw, bh], "area": int(m.sum()),
                "segmentation": {"size": rle["size"],
                                 "counts": rle["counts"]
                                 if isinstance(rle["counts"], str)
                                 else rle["counts"]},
            })
            ann_id += 1

    cats = [{"id": i, "name": n}
            for i, n in enumerate(SAMRS_CATEGORY_SETS.get(
                args.dataset, SAMRS_CATEGORY_SETS["sota"]))]
    out = {"images": images, "annotations": annotations, "categories": cats}
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(f"wrote {args.out}: {len(images)} images, {ann_id} instances")


def voc_to_coco(args):
    """VOC xml horizontal boxes → COCO json (reference dior_h_2_coco.py)."""
    classes = [c.strip() for c in open(args.classes)] if os.path.exists(
        args.classes) else args.classes.split(",")
    name_map = {n: i for i, n in enumerate(classes)}
    images, annotations = [], []
    ann_id = 0
    xmls = sorted(f for f in os.listdir(args.ann_dir) if f.endswith(".xml"))
    for img_id, x in enumerate(xmls):
        tree = ET.parse(os.path.join(args.ann_dir, x))
        size = tree.find("size")
        w = int(size.findtext("width"))
        h = int(size.findtext("height"))
        stem = os.path.splitext(x)[0]
        images.append({"id": img_id, "file_name": stem + args.ext_img,
                       "height": h, "width": w})
        for obj in tree.findall(".//object"):
            name = obj.findtext("name")
            if name not in name_map:
                continue
            b = obj.find("bndbox")
            x1, y1 = float(b.findtext("xmin")), float(b.findtext("ymin"))
            x2, y2 = float(b.findtext("xmax")), float(b.findtext("ymax"))
            annotations.append({
                "id": ann_id, "image_id": img_id, "iscrowd": 0,
                "category_id": name_map[name],
                "bbox": [x1, y1, x2 - x1, y2 - y1],
                "area": (x2 - x1) * (y2 - y1)})
            ann_id += 1
    out = {"images": images, "annotations": annotations,
           "categories": [{"id": i, "name": n} for i, n in enumerate(classes)]}
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(f"wrote {args.out}: {len(images)} images, {ann_id} boxes")


def tile_images(args):
    """Tile large images into patch²-pixel patches with the standard
    mmrotate split names `base__rate__x___y` (parsed back by
    eval.det_map.parse_patch_id; multi-scale via --rates, each image resized
    by the rate before windowing — reference img_split convention)."""
    from PIL import Image
    os.makedirs(args.out_dir, exist_ok=True)
    rates = [float(r) for r in (args.rates or "1.0").split(",")]
    n = 0
    for f in sorted(os.listdir(args.image_dir)):
        if not f.lower().endswith((".png", ".jpg", ".tif", ".tiff")):
            continue
        base = os.path.splitext(f)[0]
        full = Image.open(os.path.join(args.image_dir, f))
        for rate in rates:
            img = full if rate == 1.0 else full.resize(
                (max(1, round(full.size[0] * rate)),
                 max(1, round(full.size[1] * rate))), Image.BILINEAR)
            W, H = img.size
            step = args.patch - args.overlap
            xs = list(range(0, max(W - args.patch, 0) + 1, step)) or [0]
            ys = list(range(0, max(H - args.patch, 0) + 1, step)) or [0]
            if xs[-1] + args.patch < W:
                xs.append(W - args.patch)
            if ys[-1] + args.patch < H:
                ys.append(H - args.patch)
            rtag = f"{rate:g}"
            for y in ys:
                for x in xs:
                    patch = img.crop((x, y, x + args.patch, y + args.patch))
                    patch.save(os.path.join(
                        args.out_dir, f"{base}__{rtag}__{x}___{y}.png"))
                    n += 1
    print(f"wrote {n} patches to {args.out_dir}")


def geojson_to_coco(args):
    """xView-style geojson feature collection → COCO json (the label-
    conversion half of the reference prepare_xview_dataset.py; expects
    pixel-space bounds in each feature's properties)."""
    with open(args.geojson) as f:
        gj = json.load(f)
    # type_id → contiguous label
    type_ids = sorted({int(feat["properties"][args.class_key])
                       for feat in gj["features"]
                       if args.class_key in feat.get("properties", {})})
    cat_map = {t: i for i, t in enumerate(type_ids)}
    by_image = {}
    for feat in gj["features"]:
        props = feat.get("properties", {})
        if args.class_key not in props or args.image_key not in props:
            continue
        img = props[args.image_key]
        # bounds "x1,y1,x2,y2"
        b = [float(v) for v in str(props[args.bounds_key]).split(",")]
        by_image.setdefault(img, []).append((cat_map[int(props[args.class_key])], b))
    images, annotations = [], []
    ann_id = 0
    from PIL import Image
    for img_id, (name, anns) in enumerate(sorted(by_image.items())):
        path = os.path.join(args.image_dir, name)
        if os.path.exists(path):
            with Image.open(path) as im:
                w, h = im.size
        else:
            w = h = 0
        images.append({"id": img_id, "file_name": name,
                       "height": h, "width": w})
        for cat, (x1, y1, x2, y2) in anns:
            annotations.append({
                "id": ann_id, "image_id": img_id, "iscrowd": 0,
                "category_id": cat, "bbox": [x1, y1, x2 - x1, y2 - y1],
                "area": max(x2 - x1, 0) * max(y2 - y1, 0)})
            ann_id += 1
    out = {"images": images, "annotations": annotations,
           "categories": [{"id": i, "name": str(t)}
                          for t, i in sorted(cat_map.items(), key=lambda kv: kv[1])]}
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(f"wrote {args.out}: {len(images)} images, {ann_id} boxes, "
          f"{len(cat_map)} classes")


def loveda_shift(args):
    from PIL import Image
    os.makedirs(args.out_dir, exist_ok=True)
    for f in sorted(os.listdir(args.pred_dir)):
        if not f.endswith(".png"):
            continue
        arr = np.asarray(Image.open(os.path.join(args.pred_dir, f)))
        Image.fromarray((arr - 1).clip(0, 255).astype(np.uint8)).save(
            os.path.join(args.out_dir, f))
    print(f"shifted predictions into {args.out_dir}")


def ckpt_surgery(args):
    """Key surgery on torch or npz checkpoints (reference change_ckpt.py:
    encoder.* → backbone.*, strip module./decoder parts)."""
    if args.ckpt.endswith(".npz"):
        data = dict(np.load(args.ckpt))
        out = {}
        for k, v in data.items():
            k2 = k
            if k2.startswith("module."):
                k2 = k2[7:]
            if k2.startswith("encoder."):
                k2 = ("backbone." if args.rename_backbone else "") + k2[8:]
            out[k2] = v
        np.savez(args.out, **out)
    else:
        import torch
        ckpt = torch.load(args.ckpt, map_location="cpu", weights_only=False)
        sd = ckpt.get("state_dict", ckpt.get("model", ckpt))
        out = {}
        for k, v in sd.items():
            k2 = k
            if k2.startswith("module."):
                k2 = k2[7:]
            if k2.startswith("encoder."):
                k2 = ("backbone." if args.rename_backbone else "") + k2[8:]
            out[k2] = v
        torch.save(out, args.out)
    print(f"wrote {args.out}")


def dota_to_fair1m(args):
    """DOTA Task1_*.txt submissions → FAIR1M per-image xml tree (reference
    dota_submit_txt_to_fair1m_xml.py)."""
    os.makedirs(args.out_dir, exist_ok=True)
    per_image = {}
    for f in sorted(os.listdir(args.sub_dir)):
        if not (f.startswith("Task1_") and f.endswith(".txt")):
            continue
        cls = f[len("Task1_"):-4]
        for line in open(os.path.join(args.sub_dir, f)):
            parts = line.split()
            if len(parts) < 10:
                continue
            img_id, score = parts[0], float(parts[1])
            pts = [float(v) for v in parts[2:10]]
            per_image.setdefault(img_id, []).append((cls, score, pts))
    for img_id, dets in per_image.items():
        root = ET.Element("annotation")
        src = ET.SubElement(root, "source")
        ET.SubElement(src, "filename").text = img_id + ".tif"
        objs = ET.SubElement(root, "objects")
        for cls, score, pts in dets:
            o = ET.SubElement(objs, "object")
            ET.SubElement(o, "coordinate").text = "pixel"
            ET.SubElement(o, "type").text = "rectangle"
            ET.SubElement(o, "description").text = "None"
            poss = ET.SubElement(o, "possibleresult")
            ET.SubElement(poss, "name").text = cls
            ET.SubElement(poss, "probability").text = f"{score:.4f}"
            p = ET.SubElement(o, "points")
            for i in range(0, 8, 2):
                ET.SubElement(p, "point").text = f"{pts[i]:.2f},{pts[i+1]:.2f}"
            ET.SubElement(p, "point").text = f"{pts[0]:.2f},{pts[1]:.2f}"
        ET.ElementTree(root).write(
            os.path.join(args.out_dir, img_id + ".xml"))
    print(f"wrote {len(per_image)} xmls to {args.out_dir}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("samrs-pkl-to-coco")
    s.add_argument("--root", required=True)
    s.add_argument("--image-dir", required=True)
    s.add_argument("--label-dir", required=True)
    s.add_argument("--split", default="train")
    s.add_argument("--dataset", default="sota")
    s.add_argument("--ext-img", default=".png")
    s.add_argument("--out", required=True)
    s.set_defaults(fn=samrs_pkl_to_coco)

    s = sub.add_parser("voc-to-coco")
    s.add_argument("--ann-dir", required=True)
    s.add_argument("--classes", required=True,
                   help="file with one class per line, or comma list")
    s.add_argument("--ext-img", default=".jpg")
    s.add_argument("--out", required=True)
    s.set_defaults(fn=voc_to_coco)

    s = sub.add_parser("tile-images")
    s.add_argument("--image-dir", required=True)
    s.add_argument("--out-dir", required=True)
    s.add_argument("--patch", type=int, default=1024)
    s.add_argument("--overlap", type=int, default=200)
    s.add_argument("--rates", default="1.0",
                   help="comma list of resize rates for multi-scale splits "
                        "(e.g. 0.5,1.0,1.5)")
    s.set_defaults(fn=tile_images)

    s = sub.add_parser("geojson-to-coco")
    s.add_argument("--geojson", required=True)
    s.add_argument("--image-dir", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--class-key", default="type_id")
    s.add_argument("--image-key", default="image_id")
    s.add_argument("--bounds-key", default="bounds_imcoords")
    s.set_defaults(fn=geojson_to_coco)

    s = sub.add_parser("loveda-shift")
    s.add_argument("--pred-dir", required=True)
    s.add_argument("--out-dir", required=True)
    s.set_defaults(fn=loveda_shift)

    s = sub.add_parser("ckpt-surgery")
    s.add_argument("--ckpt", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--rename-backbone", action="store_true")
    s.set_defaults(fn=ckpt_surgery)

    s = sub.add_parser("dota-to-fair1m")
    s.add_argument("--sub-dir", required=True)
    s.add_argument("--out-dir", required=True)
    s.set_defaults(fn=dota_to_fair1m)

    args = p.parse_args(argv)
    args.fn(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
