"""tools/prepare_datasets.py round-trip tests on synthetic fixtures."""

import json
import os
import pickle
import subprocess
import sys

import numpy as np
from PIL import Image

TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tools", "prepare_datasets.py")
ENV = {"PATH": "/usr/bin:/bin", "PYTHONPATH": "/root/repo", "HOME": "/root",
       "JAX_PLATFORMS": "cpu"}


def run(*args):
    out = subprocess.run([sys.executable, TOOLS, *args],
                         capture_output=True, text=True, env=ENV)
    assert out.returncode == 0, out.stderr
    return out.stdout


def test_samrs_pkl_to_coco(tmp_path):
    from mtp_tpu.data.parsers import mask_to_rle, load_coco, coco_masks
    img_dir = tmp_path / "img"
    lbl_dir = tmp_path / "lbl"
    img_dir.mkdir()
    lbl_dir.mkdir()
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(img_dir / "a.png")
    m = np.zeros((16, 16), np.uint8)
    m[4:9, 3:8] = 1
    with open(lbl_dir / "a.pkl", "wb") as f:
        pickle.dump([{"label": 2, "mask": mask_to_rle(m)}], f)
    (tmp_path / "train.txt").write_text("a\n")

    out = tmp_path / "out.json"
    run("samrs-pkl-to-coco", "--root", str(tmp_path), "--image-dir",
        str(img_dir), "--label-dir", str(lbl_dir), "--out", str(out),
        "--dataset", "sota")
    recs, names = load_coco(str(out))
    assert len(recs) == 1 and names[2] == "helicopter"
    np.testing.assert_allclose(recs[0].hboxes[0], [3, 4, 8, 9])
    np.testing.assert_array_equal(coco_masks(recs[0])[0], m)


def test_voc_to_coco(tmp_path):
    xml = """<annotation><size><width>32</width><height>24</height></size>
    <object><name>ship</name><bndbox><xmin>2</xmin><ymin>3</ymin>
    <xmax>10</xmax><ymax>9</ymax></bndbox></object></annotation>"""
    ann = tmp_path / "ann"
    ann.mkdir()
    (ann / "x.xml").write_text(xml)
    out = tmp_path / "o.json"
    run("voc-to-coco", "--ann-dir", str(ann), "--classes", "plane,ship",
        "--out", str(out))
    d = json.loads(out.read_text())
    assert d["annotations"][0]["category_id"] == 1
    assert d["annotations"][0]["bbox"] == [2, 3, 8, 6]


def test_tile_images(tmp_path):
    src = tmp_path / "src"
    dst = tmp_path / "dst"
    src.mkdir()
    Image.fromarray(np.zeros((48, 64, 3), np.uint8)).save(src / "big.png")
    run("tile-images", "--image-dir", str(src), "--out-dir", str(dst),
        "--patch", "32", "--overlap", "8")
    names = sorted(os.listdir(dst))
    assert "big__1__0___0.png" in names
    assert "big__1__32___16.png" in names  # edge-aligned final patch
    from mtp_tpu.eval.det_map import parse_patch_id
    assert parse_patch_id("big__1__32___16") == ("big", 32, 16, 1.0)

    # multi-scale split: standard mmrotate names, one base across scales
    dst2 = tmp_path / "dst2"
    run("tile-images", "--image-dir", str(src), "--out-dir", str(dst2),
        "--patch", "32", "--overlap", "8", "--rates", "0.5,1.0")
    names2 = sorted(os.listdir(dst2))
    assert "big__0.5__0___0.png" in names2
    assert "big__1__0___0.png" in names2
    bases = {parse_patch_id(os.path.splitext(n)[0])[0] for n in names2}
    assert bases == {"big"}


def test_ckpt_surgery_npz(tmp_path):
    src = tmp_path / "in.npz"
    np.savez(src, **{"module.encoder.blocks.0.w": np.ones(2),
                     "module.head.w": np.zeros(1)})
    out = tmp_path / "out.npz"
    run("ckpt-surgery", "--ckpt", str(src), "--out", str(out),
        "--rename-backbone")
    d = dict(np.load(out))
    assert "backbone.blocks.0.w" in d and "head.w" in d


def test_dota_to_fair1m(tmp_path):
    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "Task1_Bridge.txt").write_text(
        "IMG1 0.9 0 0 10 0 10 5 0 5\n")
    out = tmp_path / "xmls"
    run("dota-to-fair1m", "--sub-dir", str(sub), "--out-dir", str(out))
    xml = (out / "IMG1.xml").read_text()
    assert "Bridge" in xml and "0.9000" in xml


def test_xview_prepare(tmp_path):
    """geojson → remapped classes → tiled patches → COCO (reference
    prepare_xview_dataset.py pipeline)."""
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    # 100x60 image → padded to 64 rows, tiled into 64² patches
    Image.fromarray(np.zeros((60, 100, 3), np.uint8)).save(img_dir / "a.tif")
    feats = [
        # type_id 11 → class 0, box near the left edge
        {"properties": {"image_id": "a.tif", "type_id": 11,
                        "bounds_imcoords": "5,5,20,20"}},
        # type_id 17 → class 4, center at x=80 → right patch
        {"properties": {"image_id": "a.tif", "type_id": 17,
                        "bounds_imcoords": "70,10,90,30"}},
        # type_id 75 → -1 (unused id) → skipped
        {"properties": {"image_id": "a.tif", "type_id": 75,
                        "bounds_imcoords": "1,1,9,9"}},
    ]
    (tmp_path / "l.geojson").write_text(json.dumps({"features": feats}))
    out = tmp_path / "out"
    msg = run("xview-prepare", "--geojson", str(tmp_path / "l.geojson"),
              "--image-dir", str(img_dir), "--out-dir", str(out),
              "--patch", "64", "--val-frac", "0")
    assert "skipped" in msg
    d = json.loads((out / "train.json").read_text())
    assert len(d["images"]) == 2  # two patches with centers inside
    cats = {a["category_id"] for a in d["annotations"]}
    assert cats == {0, 4}
    assert len(d["categories"]) == 60
    for im in d["images"]:
        assert (out / "images" / im["file_name"]).exists()
        assert im["width"] == 64 and im["height"] == 64
    # boxes live in patch coordinates
    for a in d["annotations"]:
        x, y, w, h = a["bbox"]
        assert 0 <= x < 64 and 0 <= y < 64 and w > 0 and h > 0
    assert json.loads((out / "val.json").read_text())["images"] == []


def test_spacenet_masks(tmp_path):
    """Pixel-space footprints rasterize to 0/255 masks (reference
    process_spacenet.py without GDAL); holes stay empty."""
    img_dir = tmp_path / "3band"
    gj_dir = tmp_path / "geojson"
    img_dir.mkdir()
    gj_dir.mkdir()
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(
        img_dir / "3band_AOI_1_RIO_img1.tif")
    poly = {"type": "Feature", "geometry": {
        "type": "Polygon",
        "coordinates": [
            [[4, 4], [28, 4], [28, 28], [4, 28]],      # exterior
            [[12, 12], [20, 12], [20, 20], [12, 20]],  # hole
        ]}}
    (gj_dir / "Geo_AOI_1_RIO_img1.geojson").write_text(
        json.dumps({"features": [poly]}))
    out = tmp_path / "masks"
    run("spacenet-masks", "--geojson-dir", str(gj_dir),
        "--image-dir", str(img_dir), "--out-dir", str(out))
    m = np.asarray(Image.open(out / "3band_AOI_1_RIO_img1.png"))
    assert m.shape == (32, 32)
    assert m[8, 8] == 255 and m[0, 0] == 0
    assert m[16, 16] == 0  # hole
