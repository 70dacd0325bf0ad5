"""Parser tests: RLE codec round-trip, COCO json, DOTA txt, VOC xml, loader
collation; synthetic fixtures on tmp_path (SURVEY.md §4 test pattern c)."""

import json
import math
import os

import numpy as np

from mtp_tpu.data.parsers import (load_coco, coco_masks, mask_to_rle,
                                  parse_dota_txt, parse_voc_rotated_xml,
                                  polygons_to_mask, quads_to_rboxes,
                                  rle_to_mask)
from mtp_tpu.data.loader import (Loader, collate_detection,
                                 collate_multitask, pad_instances)


def test_rle_roundtrip():
    rng = np.random.default_rng(0)
    mask = (rng.uniform(size=(23, 17)) > 0.6).astype(np.uint8)
    rle = mask_to_rle(mask)
    assert isinstance(rle["counts"], str)
    back = rle_to_mask(rle)
    np.testing.assert_array_equal(back, mask)


def test_rle_empty_and_full():
    for m in (np.zeros((5, 7), np.uint8), np.ones((5, 7), np.uint8)):
        np.testing.assert_array_equal(rle_to_mask(mask_to_rle(m)), m)


def test_polygon_rasterize():
    m = polygons_to_mask([[2, 2, 10, 2, 10, 8, 2, 8]], 12, 14)
    assert m[5, 5] == 1 and m[0, 0] == 0
    assert m.sum() >= 9 * 7  # at least the interior


def test_coco_json(tmp_path):
    mask = np.zeros((20, 30), np.uint8)
    mask[5:10, 5:15] = 1
    coco = {
        "images": [{"id": 1, "file_name": "a.png", "height": 20, "width": 30}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 7,
             "bbox": [5, 5, 10, 5], "area": 50, "iscrowd": 0,
             "segmentation": mask_to_rle(mask)},
            {"id": 2, "image_id": 1, "category_id": 3,
             "bbox": [0, 0, 4, 4], "area": 16, "iscrowd": 0,
             "segmentation": [[0, 0, 4, 0, 4, 4, 0, 4]]},
        ],
        "categories": [{"id": 3, "name": "car"}, {"id": 7, "name": "ship"}],
    }
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(coco))
    recs, names = load_coco(str(p))
    assert names == ["car", "ship"]
    r = recs[0]
    np.testing.assert_allclose(r.hboxes[0], [5, 5, 15, 10])
    assert r.labels.tolist() == [1, 0]  # remapped contiguous
    masks = coco_masks(r)
    np.testing.assert_array_equal(masks[0], mask)
    assert masks[1][2, 2] == 1


def test_dota_txt(tmp_path):
    p = tmp_path / "p.txt"
    p.write_text("imagesource:GoogleEarth\ngsd:0.5\n"
                 "10 10 30 10 30 20 10 20 ship 0\n"
                 "1 1 2 1 2 2 1 2 plane 2\n"
                 "5 5 6 5 6 6 5 6 unknown 0\n")
    quads, labels, diff = parse_dota_txt(str(p), ["plane", "ship"])
    assert quads.shape == (2, 8)
    assert labels.tolist() == [1, 0]
    assert diff.tolist() == [0, 2]
    rb = quads_to_rboxes(quads[:1])
    np.testing.assert_allclose(rb[0], [20, 15, 20, 10, 0], atol=1e-4)


def test_voc_xml(tmp_path):
    xml = """<annotation><object><name>ship</name>
    <robndbox><cx>50</cx><cy>60</cy><w>20</w><h>10</h><angle>0.5</angle></robndbox>
    </object><object><name>nope</name>
    <robndbox><cx>1</cx><cy>1</cy><w>1</w><h>1</h><angle>0</angle></robndbox>
    </object></annotation>"""
    p = tmp_path / "a.xml"
    p.write_text(xml)
    rb, lb = parse_voc_rotated_xml(str(p), ["ship"])
    assert rb.shape == (1, 5)
    np.testing.assert_allclose(rb[0], [50, 60, 20, 10, 0.5])
    assert lb.tolist() == [0]


def test_pad_instances_and_collate():
    s1 = {"image": np.zeros((32, 32, 3), np.float32),
          "sem_seg": np.zeros((32, 32), np.int32),
          "hboxes": np.asarray([[1, 1, 5, 5]], np.float32),
          "labels": np.asarray([2], np.int32),
          "masks": np.ones((1, 32, 32), np.uint8),
          "rboxes": np.asarray([[8, 8, 6, 3, 0.1]], np.float32),
          "rlabels": np.asarray([1], np.int32)}
    s2 = dict(s1, hboxes=np.zeros((0, 4), np.float32),
              labels=np.zeros((0,), np.int32),
              masks=np.zeros((0, 32, 32), np.uint8),
              rboxes=np.zeros((0, 5), np.float32),
              rlabels=np.zeros((0,), np.int32))
    b = collate_multitask([s1, s2], max_gts=4)
    assert b["gt_boxes"].shape == (2, 4, 4)
    assert b["gt_valid"][0].tolist() == [True, False, False, False]
    assert not b["gt_valid"][1].any()
    assert b["gt_mask_crops"].shape == (2, 4, 56, 56)
    assert b["gt_mask_crops"][0, 0].min() == 1.0  # full mask covers its box
    assert b["r_gt_boxes"].shape == (2, 4, 5)
    # legacy stride mode still produces the decimated full map
    bl = collate_multitask([s1, s2], max_gts=4, mask_mode="stride")
    assert bl["gt_masks"].shape == (2, 4, 8, 8)


def test_loader_epoch():
    class DS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"image": np.full((8, 8, 3), i, np.float32),
                    "hboxes": np.asarray([[0, 0, 4, 4]], np.float32),
                    "labels": np.asarray([0], np.int32)}

    ld = Loader(DS(), batch_size=4,
                collate=lambda s: collate_detection(s, max_gts=2))
    batches = list(ld.epoch(0))
    assert len(batches) == 2  # drop_last
    assert batches[0]["image"].shape == (4, 8, 8, 3)
    seen = {int(b["image"][i, 0, 0, 0]) for b in batches for i in range(4)}
    assert len(seen) == 8  # shuffled, no dup


def test_parse_fair1m_xml(tmp_path):
    from mtp_tpu.data.parsers import parse_fair1m_xml
    xml = """<annotation><objects>
      <object>
        <possibleresult><name>Boeing737</name></possibleresult>
        <points><point>10,20</point><point>50,20</point><point>50,40</point>
                <point>10,40</point><point>10,20</point></points>
      </object>
      <object>
        <possibleresult><name>UnknownThing</name></possibleresult>
        <points><point>0,0</point><point>1,0</point><point>1,1</point>
                <point>0,1</point><point>0,0</point></points>
      </object>
    </objects></annotation>"""
    p = tmp_path / "a.xml"
    p.write_text(xml)
    from mtp_tpu.data.datasets import FAIR1M_CLASSES
    quads, labels = parse_fair1m_xml(str(p), FAIR1M_CLASSES)
    assert quads.shape == (1, 8)  # unknown class dropped
    assert labels[0] == FAIR1M_CLASSES.index("Boeing737")
    np.testing.assert_allclose(quads[0][:4], [10, 20, 50, 20])


def test_rotated_detection_fair1m_fmt(tmp_path):
    from mtp_tpu.data.datasets import RotatedDetection, FAIR1M_CLASSES
    from PIL import Image
    (tmp_path / "images").mkdir()
    (tmp_path / "ann").mkdir()
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(
        tmp_path / "images" / "x.png")
    (tmp_path / "ann" / "x.xml").write_text(
        "<annotation><objects><object>"
        "<possibleresult><name>Bridge</name></possibleresult>"
        "<points><point>4,4</point><point>20,4</point><point>20,12</point>"
        "<point>4,12</point><point>4,4</point></points>"
        "</object></objects></annotation>")
    ds = RotatedDetection(str(tmp_path / "images"), str(tmp_path / "ann"),
                          FAIR1M_CLASSES, fmt="fair1m")
    s = ds[0]
    assert s["rboxes"].shape == (1, 5)
    np.testing.assert_allclose(s["rboxes"][0][:2], [12, 8], atol=1e-4)
    assert s["rlabels"][0] == FAIR1M_CLASSES.index("Bridge")
