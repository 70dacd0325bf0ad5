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


# xView raw type_ids 11-94 → contiguous 0-59 (reference
# prepare_xview_dataset.py:80-84, the ultralytics xView remap table)
XVIEW_CLASS2INDEX = [
    -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, 0, 1, 2, -1, 3, -1, 4, 5,
    6, 7, 8, -1, 9, 10, 11, 12, 13, 14, 15, -1, -1, 16, 17, 18, 19, 20, 21,
    22, -1, 23, 24, 25, -1, 26, 27, -1, 28, -1, 29, 30, 31, 32, 33, 34, 35,
    36, 37, -1, 38, 39, 40, 41, 42, 43, 44, 45, -1, -1, -1, -1, 46, 47, 48,
    49, -1, 50, 51, -1, 52, -1, -1, -1, 53, 54, -1, 55, -1, -1, 56, -1, 57,
    -1, 58, 59]


def xview_prepare(args):
    """Full xView preparation (reference prepare_xview_dataset.py:
    convert_labels :67-110 + clip_xview_yolo :187-311 + yolo→coco :405-520):
    geojson → class remap → per-image train/val split → 416² patches (gray
    padding, center-inside box assignment, clip-to-patch) → COCO jsons in
    the bindings.py detection layout ({out}/images + {out}/{split}.json)."""
    import numpy as np
    from PIL import Image

    with open(args.geojson) as f:
        gj = json.load(f)
    by_image = {}
    skipped = 0
    for feat in gj["features"]:
        p = feat.get("properties", {})
        if not p.get("bounds_imcoords") or "type_id" not in p:
            continue
        try:
            box = [float(v) for v in str(p["bounds_imcoords"]).split(",")]
            assert len(box) == 4
            cls = XVIEW_CLASS2INDEX[int(p["type_id"])]
            assert 0 <= cls <= 59
        except Exception:
            skipped += 1
            continue
        by_image.setdefault(p["image_id"], []).append((cls, box))

    names = sorted(n for n in by_image
                   if os.path.exists(os.path.join(args.image_dir, n)))
    rng = np.random.default_rng(args.seed)
    order = rng.permutation(len(names))
    n_val = int(round(len(names) * args.val_frac))
    val_set = {names[i] for i in order[:n_val]}

    img_out = os.path.join(args.out_dir, "images")
    os.makedirs(img_out, exist_ok=True)
    P = args.patch
    coco = {s: {"images": [], "annotations": [],
                "categories": [{"id": i, "name": f"xview_{i}"}
                               for i in range(60)]}
            for s in ("train", "val")}
    ann_id = {"train": 0, "val": 0}
    n_patches = 0
    for name in names:
        split = "val" if name in val_set else "train"
        img = np.asarray(Image.open(
            os.path.join(args.image_dir, name)).convert("RGB"))
        H, W = img.shape[:2]
        ph, pw = max(0, P - H), max(0, P - W)
        if ph or pw:
            img = np.pad(img, ((0, ph), (0, pw), (0, 0)),
                         constant_values=128)
            H, W = img.shape[:2]
        boxes = np.asarray([b for _, b in by_image[name]], np.float64)
        labels = np.asarray([c for c, _ in by_image[name]], np.int64)
        # clip to image (reference xyxy2xywhn(clip=True))
        boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, W - 1e-3)
        boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, H - 1e-3)
        cx = (boxes[:, 0] + boxes[:, 2]) / 2
        cy = (boxes[:, 1] + boxes[:, 3]) / 2
        xs = np.linspace(0, W - P, int(np.ceil((W - P) / max(P - args.overlap, 1))) + 1,
                         endpoint=True).astype(int) if W > P else [0]
        ys = np.linspace(0, H - P, int(np.ceil((H - P) / max(P - args.overlap, 1))) + 1,
                         endpoint=True).astype(int) if H > P else [0]
        base = os.path.splitext(name)[0]
        part = 0
        for y0 in ys:
            for x0 in xs:
                x1e, y1e = x0 + P, y0 + P
                keep = ((cx >= x0) & (cx < x1e) & (cy >= y0) & (cy < y1e))
                if not keep.any():
                    continue
                pname = f"{base}_{part}.png"
                Image.fromarray(img[y0:y1e, x0:x1e]).save(
                    os.path.join(img_out, pname))
                img_id = len(coco[split]["images"])
                coco[split]["images"].append(
                    {"id": img_id, "file_name": pname,
                     "width": P, "height": P})
                for b, c in zip(boxes[keep], labels[keep]):
                    bx1 = max(b[0], x0) - x0
                    by1 = max(b[1], y0) - y0
                    bx2 = min(b[2], x1e - 1) - x0
                    by2 = min(b[3], y1e - 1) - y0
                    coco[split]["annotations"].append(
                        {"id": ann_id[split], "image_id": img_id,
                         "iscrowd": 0, "category_id": int(c),
                         "bbox": [bx1, by1, bx2 - bx1, by2 - by1],
                         "area": max(bx2 - bx1, 0) * max(by2 - by1, 0)})
                    ann_id[split] += 1
                part += 1
                n_patches += 1
    for split in ("train", "val"):
        with open(os.path.join(args.out_dir, f"{split}.json"), "w") as f:
            json.dump(coco[split], f)
    print(f"wrote {n_patches} patches, "
          f"{ann_id['train']}+{ann_id['val']} boxes "
          f"({skipped} labels skipped) to {args.out_dir}")


def _tif_geotransform(img):
    """(origin_x, origin_y, scale_x, scale_y) from GeoTIFF tags
    (ModelTiepoint 33922 + ModelPixelScale 33550), or None for plain images
    — the pure-python stand-in for GDAL's GetGeoTransform."""
    tags = getattr(img, "tag_v2", None)
    if not tags or 33922 not in tags or 33550 not in tags:
        return None
    tie = [float(v) for v in tags[33922]]
    scale = [float(v) for v in tags[33550]]
    # tie: i, j, k, X, Y, Z (pixel (i,j) maps to world (X,Y))
    i, j, X, Y = tie[0], tie[1], tie[3], tie[4]
    sx, sy = scale[0], scale[1]
    return (X - i * sx, Y + j * sy, sx, sy)


def _rasterize_rings(rings, size, transform):
    """Fill a polygon (exterior + hole rings, geojson winding) into a
    uint8 mask — even-odd via draw-then-erase (GDAL RasterizeLayer burn)."""
    from PIL import Image, ImageDraw
    mask = Image.new("L", size, 0)
    draw = ImageDraw.Draw(mask)
    for ri, ring in enumerate(rings):
        pts = []
        for x, y in (p[:2] for p in ring):
            if transform is not None:
                ox, oy, sx, sy = transform
                x, y = (x - ox) / sx, (oy - y) / sy
            pts.append((x, y))
        if len(pts) >= 3:
            draw.polygon(pts, fill=0 if ri else 255)
    return mask


def spacenet_masks(args):
    """SpaceNet building-footprint geojson → binary segmentation masks
    (reference scripts/process_spacenet.py, GDAL-free: GeoTIFF tie-point/
    pixel-scale tags give the geo→pixel transform; plain images take the
    coordinates as pixels).  Output PNGs burn buildings to 255."""
    from PIL import Image
    import numpy as np

    os.makedirs(args.out_dir, exist_ok=True)
    n = 0
    for f in sorted(os.listdir(args.geojson_dir)):
        if not f.endswith(".geojson"):
            continue
        stem = os.path.splitext(f)[0]
        # Geo_AOI_1_RIO_img42 → 3band_AOI_1_RIO_img42.tif (reference naming)
        img_stem = stem.replace(args.vector_prefix, args.raster_prefix) \
            if args.vector_prefix else stem
        img_path = None
        for ext in (".tif", ".tiff", ".png", ".jpg"):
            p = os.path.join(args.image_dir, img_stem + ext)
            if os.path.exists(p):
                img_path = p
                break
        if img_path is None:
            continue
        with Image.open(img_path) as im:
            size = im.size
            transform = _tif_geotransform(im)
        with open(os.path.join(args.geojson_dir, f)) as fh:
            gj = json.load(fh)
        out = np.zeros(size[::-1], np.uint8)
        for feat in gj.get("features", []):
            geom = feat.get("geometry") or {}
            if geom.get("type") == "Polygon":
                polys = [geom["coordinates"]]
            elif geom.get("type") == "MultiPolygon":
                polys = geom["coordinates"]
            else:
                continue
            for rings in polys:
                m = np.asarray(_rasterize_rings(rings, size, transform))
                out = np.maximum(out, m)
        Image.fromarray(out).save(
            os.path.join(args.out_dir, img_stem + ".png"))
        n += 1
    print(f"wrote {n} masks to {args.out_dir}")


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

    s = sub.add_parser("xview-prepare")
    s.add_argument("--geojson", required=True)
    s.add_argument("--image-dir", required=True)
    s.add_argument("--out-dir", required=True)
    s.add_argument("--patch", type=int, default=416)
    s.add_argument("--overlap", type=int, default=0)
    s.add_argument("--val-frac", type=float, default=0.1)
    s.add_argument("--seed", type=int, default=0)
    s.set_defaults(fn=xview_prepare)

    s = sub.add_parser("spacenet-masks")
    s.add_argument("--geojson-dir", required=True)
    s.add_argument("--image-dir", required=True)
    s.add_argument("--out-dir", required=True)
    s.add_argument("--vector-prefix", default="Geo_",
                   help="geojson filename prefix replaced by --raster-prefix")
    s.add_argument("--raster-prefix", default="3band_")
    s.set_defaults(fn=spacenet_masks)

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
