"""Detection mAP evaluation (host-side numpy) + DOTA submission merging.

Capability parity with the reference metric stack:
- VOC-style rotated mAP: per-class TP/FP ranking + AP integration
  (`tpfp_default` rotated_detection/metric.py:93, `eval_rbbox_map` :236),
- COCO-style AP@[.5:.95] for horizontal/instance detection
  (instance_segmentation/metric.py via pycocotools — re-implemented here in
  numpy; same matching rules: score-sorted greedy, per-class, maxDets),
- DOTA patch→full-image merge with per-class rotated NMS and submission
  writer (`merge_results` rotated_detection/metric.py:473-580).

Detections arrive as padded arrays from the jitted predictors; padding is
dropped here on host.
"""

from __future__ import annotations

import os
import re
import zipfile
from collections import defaultdict
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np


def np_bbox_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:4], b[None, :, 2:4])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    aa = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    ab = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / np.maximum(aa[:, None] + ab[None, :] - inter, 1e-9)


def np_rbox_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Rotated IoU on host: C++ clipping kernel (native/mtp_native.cc) when
    built, else the jnp polygon-clipping kernel on CPU."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    from mtp_tpu.utils.native import rbox_iou_native
    native = rbox_iou_native(np.asarray(a, np.float32),
                             np.asarray(b, np.float32))
    if native is not None:
        return native
    import jax.numpy as jnp
    from mtp_tpu.ops.rotated_boxes import rbox_overlaps
    return np.asarray(rbox_overlaps(jnp.asarray(a, jnp.float32),
                                    jnp.asarray(b, jnp.float32)))


def np_quad_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Convex-quad IoU on host ((N,8) corner polygons) — the nms_quadri
    path of the reference merge (rotated_detection/metric.py:533).  C++
    clipping kernel when built, else the jnp kernel on CPU."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    from mtp_tpu.utils.native import quad_iou_native
    native = quad_iou_native(np.asarray(a, np.float32),
                             np.asarray(b, np.float32))
    if native is not None:
        return native
    import jax.numpy as jnp
    from mtp_tpu.ops.rotated_boxes import quad_overlaps
    return np.asarray(quad_overlaps(jnp.asarray(a, jnp.float32),
                                    jnp.asarray(b, jnp.float32)))


def average_precision(recall: np.ndarray, precision: np.ndarray,
                      mode: str = "area") -> float:
    """mmdet 'area' mode (all-point interpolation) or '11points'."""
    if mode == "area":
        mrec = np.concatenate([[0.0], recall, [1.0]])
        mpre = np.concatenate([[0.0], precision, [0.0]])
        for i in range(len(mpre) - 2, -1, -1):
            mpre[i] = max(mpre[i], mpre[i + 1])
        idx = np.nonzero(mrec[1:] != mrec[:-1])[0]
        return float(((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]).sum())
    ap = 0.0
    for t in np.arange(0.0, 1.1, 0.1):
        p = precision[recall >= t].max() if (recall >= t).any() else 0.0
        ap += p / 11
    return float(ap)


def tpfp(det_boxes: np.ndarray, det_scores: np.ndarray,
         gt_boxes: np.ndarray, gt_ignore: np.ndarray, iou_thr: float,
         iou_fn: Callable) -> Tuple[np.ndarray, np.ndarray]:
    """Greedy score-sorted matching, exact reference `tpfp_default`
    semantics (rotated_detection/metric.py:93): each det considers ONLY its
    argmax-IoU gt — if that gt clears the threshold and is uncovered it's a
    TP, if covered it's an FP (no re-matching to the next-best gt; pinned by
    tests/test_reference_eval_parity.py).  Dets whose argmax gt is ignored
    count as neither TP nor FP."""
    nd = len(det_boxes)
    tp = np.zeros(nd)
    fp = np.zeros(nd)
    if len(gt_boxes) == 0:
        fp[:] = 1
        return tp, fp
    matched = np.zeros(len(gt_boxes), bool)
    order = np.argsort(-det_scores)
    ious = iou_fn(det_boxes, gt_boxes)
    ious_max = ious.max(axis=1) if nd else np.zeros(0)
    ious_argmax = ious.argmax(axis=1) if nd else np.zeros(0, np.int64)
    for di in order:
        if ious_max[di] >= iou_thr:
            g = ious_argmax[di]
            if gt_ignore[g]:
                continue  # neither tp nor fp
            if not matched[g]:
                matched[g] = True
                tp[di] = 1
            else:
                fp[di] = 1
        else:
            fp[di] = 1
    return tp, fp


def eval_map(per_image: Sequence[dict], num_classes: int,
             iou_thr: float = 0.5, rotated: bool = False,
             mode: str = "area") -> Dict[str, float]:
    """per_image: [{'det_boxes', 'det_scores', 'det_labels',
                    'gt_boxes', 'gt_labels', 'gt_ignore'?}] (unpadded numpy).

    Returns mAP + per-class AP (VOC-style at one IoU threshold — the DIOR-R /
    DOTA protocol)."""
    iou_fn = np_rbox_iou if rotated else np_bbox_iou
    aps, recalls = [], []
    for c in range(num_classes):
        scores_all, tp_all, fp_all = [], [], []
        n_gt = 0
        for im in per_image:
            dm = im["det_labels"] == c
            gm = im["gt_labels"] == c
            gt_ign = im.get("gt_ignore")
            gt_ign = (gt_ign[gm] if gt_ign is not None
                      else np.zeros(gm.sum(), bool))
            n_gt += int((~gt_ign).sum())
            tp, fp = tpfp(im["det_boxes"][dm], im["det_scores"][dm],
                          im["gt_boxes"][gm], gt_ign, iou_thr, iou_fn)
            scores_all.append(im["det_scores"][dm])
            tp_all.append(tp)
            fp_all.append(fp)
        scores = np.concatenate(scores_all) if scores_all else np.zeros(0)
        tp = np.concatenate(tp_all) if tp_all else np.zeros(0)
        fp = np.concatenate(fp_all) if fp_all else np.zeros(0)
        order = np.argsort(-scores)
        tp_c = np.cumsum(tp[order])
        fp_c = np.cumsum(fp[order])
        rec = tp_c / max(n_gt, 1)
        prec = tp_c / np.maximum(tp_c + fp_c, 1e-9)
        aps.append(average_precision(rec, prec, mode) if n_gt else np.nan)
        recalls.append(rec[-1] if len(rec) and n_gt else 0.0)
    valid = [a for a in aps if not np.isnan(a)]
    return {"mAP": float(np.mean(valid) * 100) if valid else 0.0,
            "AP": [float(a * 100) if not np.isnan(a) else -1 for a in aps]}


def eval_coco_map(per_image: Sequence[dict], num_classes: int,
                  max_dets: int = 100) -> Dict[str, float]:
    """COCO-protocol bbox AP (and segm AP when masks are present).

    Thin alias over eval.coco_eval.evaluate_coco_bbox_segm, which carries
    the full COCOeval semantics (crowd/ignore handling, area ranges,
    maxDets sweep, AR) — one protocol implementation for every caller."""
    from mtp_tpu.eval.coco_eval import evaluate_coco_bbox_segm
    md = (1, 10, max_dets) if max_dets > 10 else (max_dets,)
    return evaluate_coco_bbox_segm(per_image, num_classes, max_dets=md)


# ---------------------------------------------------------------------------
# DOTA patch merge + submission
# ---------------------------------------------------------------------------

_XY_RX = re.compile(r"__(\d+)___(\d+)")


def parse_patch_id(img_id: str) -> Tuple[str, int, int, float]:
    """Standard mmrotate split ids 'P0006__1.0__0___512' → (base, x_off,
    y_off, rate).

    Reference semantics (rotated_detection/metric.py:489-497 and
    mmrotate0.3.4 dota.py merge_det): base is everything before the FIRST
    '__', offsets come from the first '__x___y' group — so all scales of
    one image merge under the same base id.  The rate segment (if any) is
    returned for optional coordinate rescaling."""
    base = img_id.split("__", 1)[0]
    m = _XY_RX.search(img_id)
    if not m:
        return img_id, 0, 0, 1.0
    rate = 1.0
    segs = img_id.split("__")
    if len(segs) >= 4:
        try:
            rate = float(segs[1])
        except ValueError:
            rate = 1.0
    return base, int(m.group(1)), int(m.group(2)), rate


def merge_dota_patches(per_patch: Dict[str, dict], num_classes: int,
                       nms_iou: float = 0.1,
                       max_per_img: int = 2000,
                       rescale_by_rate: bool = False,
                       box_type: str = "rbox") -> Dict[str, dict]:
    """Translate patch detections back to full-image coords and run
    per-class NMS per image.  box_type 'rbox' ((cx,cy,w,h,θ), nms_rotated)
    or 'qbox' ((x1..y4) corner polygons, nms_quadri — the FAIR1M multi-
    scale protocol, reference metric.py:504-535).

    `rescale_by_rate=False` matches the reference merge exactly (offsets
    added, no scale correction — metric.py:498-508).  With True, boxes from
    a `base__rate__x___y` patch are additionally divided by `rate`, mapping
    multi-scale detections into original-image pixels before NMS."""
    dim = 8 if box_type == "qbox" else 5
    iou_fn = np_quad_iou if box_type == "qbox" else np_rbox_iou
    merged: Dict[str, list] = defaultdict(list)
    for pid, det in per_patch.items():
        base, xo, yo, rate = parse_patch_id(pid)
        boxes = det["det_boxes"].copy()
        if len(boxes):
            if box_type == "qbox":
                boxes[:, 0::2] += xo
                boxes[:, 1::2] += yo
                if rescale_by_rate and rate != 1.0:
                    boxes /= rate
            else:
                boxes[:, 0] += xo
                boxes[:, 1] += yo
                if rescale_by_rate and rate != 1.0:
                    boxes[:, :4] /= rate
        merged[base].append((boxes, det["det_scores"], det["det_labels"]))

    out = {}
    for base, items in merged.items():
        boxes = np.concatenate([b for b, _, _ in items]) if items else np.zeros((0, dim))
        scores = np.concatenate([s for _, s, _ in items]) if items else np.zeros(0)
        labels = np.concatenate([l for _, _, l in items]) if items else np.zeros(0, np.int64)
        keep_b, keep_s, keep_l = [], [], []
        for c in range(num_classes):
            m = labels == c
            if not m.any():
                continue
            b, s = boxes[m], scores[m]
            order = np.argsort(-s)
            b, s = b[order], s[order]
            ious = iou_fn(b, b)
            alive = np.ones(len(b), bool)
            for i in range(len(b)):
                if not alive[i]:
                    continue
                sup = ious[i] > nms_iou
                sup[:i + 1] = False
                alive &= ~sup
            keep_b.append(b[alive])
            keep_s.append(s[alive])
            keep_l.append(np.full(alive.sum(), c))
        if keep_b:
            b = np.concatenate(keep_b)
            s = np.concatenate(keep_s)
            l = np.concatenate(keep_l)
            order = np.argsort(-s)[:max_per_img]
            out[base] = {"det_boxes": b[order], "det_scores": s[order],
                         "det_labels": l[order]}
        else:
            out[base] = {"det_boxes": np.zeros((0, dim)),
                         "det_scores": np.zeros(0),
                         "det_labels": np.zeros(0, np.int64)}
    return out


def rbox_to_quad_np(rb: np.ndarray) -> np.ndarray:
    """(N, 5) → (N, 8) corner polygons."""
    cx, cy, w, h, t = rb.T
    cos, sin = np.cos(t), np.sin(t)
    dx = np.stack([-w, w, w, -w], -1) * 0.5
    dy = np.stack([-h, -h, h, h], -1) * 0.5
    x = cx[:, None] + dx * cos[:, None] - dy * sin[:, None]
    y = cy[:, None] + dx * sin[:, None] + dy * cos[:, None]
    return np.stack([x, y], -1).reshape(-1, 8)


def write_dota_submission(results: Dict[str, dict], class_names: Sequence[str],
                          out_dir: str, zip_path: Optional[str] = None) -> None:
    """Task1 (rotated) submission: one txt per class, lines
    'imgid score x1 y1 ... x4 y4' (+ optional zip, reference metric.py zip
    writer)."""
    os.makedirs(out_dir, exist_ok=True)
    files = {}
    for c, name in enumerate(class_names):
        files[c] = open(os.path.join(out_dir, f"Task1_{name}.txt"), "w")
    for img_id, det in results.items():
        b = det["det_boxes"]
        if len(b) == 0:
            quads = np.zeros((0, 8))
        elif b.shape[1] == 8:  # already corner polygons (qbox path)
            quads = b
        else:
            quads = rbox_to_quad_np(b)
        for q, s, l in zip(quads, det["det_scores"], det["det_labels"]):
            files[int(l)].write(
                f"{img_id} {s:.4f} " + " ".join(f"{v:.2f}" for v in q) + "\n")
    for f in files.values():
        f.close()
    if zip_path:
        with zipfile.ZipFile(zip_path, "w") as z:
            for c, name in enumerate(class_names):
                p = os.path.join(out_dir, f"Task1_{name}.txt")
                z.write(p, os.path.basename(p))


def write_fair1m_submission(results: Dict[str, dict],
                            class_names: Sequence[str], out_dir: str) -> None:
    """FAIR1M per-image submission xml tree directly from merged results
    (the reference pipeline writes DOTA txts then converts with
    scripts/dota_submit_txt_to_fair1m_xml.py; same xml schema here)."""
    import xml.etree.ElementTree as ET
    os.makedirs(out_dir, exist_ok=True)
    for img_id, det in results.items():
        b = det["det_boxes"]
        quads = (np.zeros((0, 8)) if len(b) == 0
                 else b if b.shape[1] == 8 else rbox_to_quad_np(b))
        root = ET.Element("annotation")
        src = ET.SubElement(root, "source")
        ET.SubElement(src, "filename").text = img_id + ".tif"
        objs = ET.SubElement(root, "objects")
        for q, s, l in zip(quads, det["det_scores"], det["det_labels"]):
            o = ET.SubElement(objs, "object")
            ET.SubElement(o, "coordinate").text = "pixel"
            ET.SubElement(o, "type").text = "rectangle"
            ET.SubElement(o, "description").text = "None"
            poss = ET.SubElement(o, "possibleresult")
            ET.SubElement(poss, "name").text = class_names[int(l)]
            ET.SubElement(poss, "probability").text = f"{float(s):.4f}"
            p = ET.SubElement(o, "points")
            pts = list(q) + [q[0], q[1]]  # closed ring
            for i in range(0, 10, 2):
                ET.SubElement(p, "point").text = \
                    f"{pts[i]:.6f},{pts[i + 1]:.6f}"
        ET.ElementTree(root).write(os.path.join(out_dir, img_id + ".xml"))
