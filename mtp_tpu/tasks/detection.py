"""Detection task: fixed-shape training loss + padded prediction for
Faster R-CNN / Mask R-CNN / Oriented R-CNN.

Mirrors the reference two-stage flow (train_before_roihead →
gen_sampling_results → bbox_loss → mask branch; predict via proposals →
bbox head → NMS; instance_segmentation/mask_rcnn.py:137-243 and
rotated_detection/two_stage.py) with every list replaced by padded tensors:

batch dict:
  image     (B, H, W, 3)
  gt_boxes  (B, G, 4) hbox  or (B, G, 5) rbox when rotated
  gt_labels (B, G) int32
  gt_valid  (B, G) bool
  gt_mask_crops (B, G, 56, 56) float binary (only when with_mask; the
            DEFAULT pipeline output — box-aligned crops resampled per gt box
            like the reference's mask_target crop+resize,
            collate_detection(mask_mode="crop"), data/loader.py), or
  gt_masks  (B, G, H/s, W/s) stride-s rasterized maps (mask_mode="stride",
            the fallback: targets are RoIAligned from this map — a
            documented deviation, lower-fidelity at small boxes)

TPU deviations documented inline: per-image loss averaging (vs global
avg_factor), global top-k pre-NMS, capped multiclass candidates.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mtp_tpu.heads.rpn import RPNOut, gen_proposals, rpn_loss
from mtp_tpu.heads.roi_heads import bbox_head_loss, mask_head_loss
from mtp_tpu.models.detector import DetConfig, TwoStageDetector
from mtp_tpu.ops.anchors import AnchorGenerator
from mtp_tpu.ops.assign import AssignResult, max_iou_assign, random_sample
from mtp_tpu.ops.boxes import bbox_overlaps, delta_decode, delta_encode
from mtp_tpu.ops.nms import NEG_INF, batched_nms
from mtp_tpu.ops.roi_align import roi_align, roi_align_rotated
from mtp_tpu.ops.rotated_boxes import (delta_decode_rbox, delta_encode_rbox,
                                       midpoint_encode, rbox2hbox_overlaps,
                                       rbox_overlaps, rbox_to_hbox)

Array = jax.Array


def anchors_for(det: Optional[DetConfig], img_hw: Tuple[int, int]) -> np.ndarray:
    """RPN anchor grid for the standard 5-level FPN (det unused — kept for
    call-site symmetry)."""
    gen = AnchorGenerator(strides=(4, 8, 16, 32, 64))
    sizes = [( (img_hw[0] + s - 1) // s, (img_hw[1] + s - 1) // s)
             for s in (4, 8, 16, 32, 64)]
    return gen.grid_flat(sizes)


def anchor_level_sizes(img_hw: Tuple[int, int]) -> Tuple[int, ...]:
    """Static per-level flat anchor counts for the same 5-level grid — feeds
    gen_proposals' per-level top-k (reference rpn_head.py:236-304 takes
    nms_pre per level, not globally)."""
    gen = AnchorGenerator(strides=(4, 8, 16, 32, 64))
    return tuple(
        ((img_hw[0] + s - 1) // s) * ((img_hw[1] + s - 1) // s) * gen.num_base
        for s in (4, 8, 16, 32, 64))


class Detections(NamedTuple):
    boxes: Array    # (B, N, 4|5)
    scores: Array   # (B, N)
    labels: Array   # (B, N)
    valid: Array    # (B, N)
    mask_logits: Optional[Array] = None  # (B, N, m, m) gt-class channel


def mask_targets_from_crops(crops: Array, gt_boxes: Array, flat_rois: Array,
                            flat_gt: Array, m: int) -> Array:
    """(m, m) mask targets for each roi from its assigned gt's box-aligned
    crop.  crops (B, G, C, C); gt_boxes (B, G, 4); flat_rois (N, 4) in image
    coords; flat_gt (N,) absolute b*G+g index.  Sample points outside the
    gt box read 0 (an instance mask vanishes outside its own bbox)."""
    from mtp_tpu.ops.grid_sample import grid_sample

    B, G, C, _ = crops.shape
    N = flat_rois.shape[0]
    src = crops.reshape(B * G, C, C, 1)[flat_gt]
    gb = gt_boxes.reshape(B * G, 4)[flat_gt]
    x1, y1, x2, y2 = jnp.moveaxis(gb, -1, 0)
    t = (jnp.arange(m, dtype=jnp.float32) + 0.5) / m
    sx = flat_rois[:, 0:1] + t[None, :] * (flat_rois[:, 2:3] - flat_rois[:, 0:1])
    sy = flat_rois[:, 1:2] + t[None, :] * (flat_rois[:, 3:4] - flat_rois[:, 1:2])
    # box-relative [0,1] ↔ crop extent edge-to-edge ↔ [-1,1] normalized
    # under align_corners=False
    gx = 2.0 * (sx - x1[:, None]) / jnp.maximum(x2 - x1, 1e-6)[:, None] - 1.0
    gy = 2.0 * (sy - y1[:, None]) / jnp.maximum(y2 - y1, 1e-6)[:, None] - 1.0
    grid = jnp.stack([jnp.broadcast_to(gx[:, None, :], (N, m, m)),
                      jnp.broadcast_to(gy[:, :, None], (N, m, m))], -1)
    out = grid_sample(src, grid, align_corners=False, padding_mode="zeros")
    return out[..., 0]


def detection_loss(model: TwoStageDetector, variables, batch: Dict[str, Array],
                   rng: Array, anchors: np.ndarray) -> Tuple[Array, Dict[str, Array]]:
    """Single-task wrapper around `det_loss_core` using the detector's inline
    final layers."""
    det = model.det
    img = batch["image"]
    rng, drop_rng = jax.random.split(rng)
    # drop-path active during training (finetune det recipes use 0.1-0.3)
    feats = model.apply(variables, img, False,
                        method=TwoStageDetector.features,
                        rngs={"dropout": drop_rng})
    rpn_out = model.apply(variables, feats, method=TwoStageDetector.rpn)

    box_fn = lambda rois, bidx: model.apply(
        variables, feats, rois, bidx, method=TwoStageDetector.box_head)
    mask_fn = (lambda rois, bidx: model.apply(
        variables, feats, rois, bidx,
        method=TwoStageDetector.mask_head_logits)) if det.with_mask else None
    return det_loss_core(det, anchors, img.shape[1:3], rpn_out, box_fn,
                         mask_fn, batch, rng)


def det_loss_core(det: DetConfig, anchors: np.ndarray,
                  img_hw: Tuple[int, int], rpn_out: RPNOut, box_fn, mask_fn,
                  batch: Dict[str, Array], rng: Array
                  ) -> Tuple[Array, Dict[str, Array]]:
    """Detection training loss from precomputed RPN outputs and head
    callables — shared by single-task detectors and the multi-task
    pretrainer (which swaps per-dataset final layers into box_fn/mask_fn).

    One-segment wrapper around `det_loss_multi` (identical semantics and
    rng stream)."""
    bf = lambda rois, bidx, segs: [box_fn(rois, bidx)]
    mf = (None if mask_fn is None
          else lambda rois, bidx, segs: [mask_fn(rois, bidx)])
    total, mets = det_loss_multi([det], anchors, img_hw, rpn_out, bf, mf,
                                 [batch], rng)
    return total, mets[0]


def _pad_gt_axis1(t: Array, G: int) -> Array:
    pad = [(0, 0)] * t.ndim
    pad[1] = (0, G - t.shape[1])
    return jnp.pad(t, pad)


def det_loss_multi(dets: Sequence[DetConfig], anchors: np.ndarray,
                   img_hw: Tuple[int, int], rpn_out: RPNOut, box_fn, mask_fn,
                   batches: Sequence[Dict[str, Array]], rng: Array
                   ) -> Tuple[Array, list]:
    """Multi-dataset detection loss over ONE concatenated batch.

    The multitask pretrainer trains 3 per-dataset heads over a shared
    FPN/RPN/RoI stack (reference models.py:224-307).  Running the three
    datasets through that stack sequentially executes every op at the tiny
    per-dataset batch (1 img/dataset in the reference's 'avg' allocation);
    here the RPN loss, proposal generation, assignment/sampling, RoIAlign
    and the shared trunks all run ONCE over the concatenated batch — exact,
    since none of those modules couple samples (no norm layers in the
    detection path) — and only the per-dataset final layers and loss
    reductions operate on static row slices.

    dets may differ ONLY in num_classes (+ derived head widths); all
    sampling/NMS hyperparameters must match across segments.
    box_fn(flat_rois, batch_idx, segs) -> [(cls_logits_d, reg_pred_d)], one
    per segment, where segs are (start, end) ROW bounds into flat_rois.
    mask_fn likewise returns [mask_logits_d] for the positive-prefix rows.
    Returns (total, [metrics_d per segment])."""
    import dataclasses as _dc
    det = dets[0]
    for dd in dets[1:]:
        if _dc.replace(dd, num_classes=det.num_classes) != det:
            raise ValueError(
                "det_loss_multi segments may differ only in num_classes; "
                f"got {dd} vs {det}")
    H, W = img_hw
    B = rpn_out.cls_scores.shape[0]
    sizes = [b["image"].shape[0] if "image" in b else b["gt_valid"].shape[0]
             for b in batches]
    offs = np.cumsum([0] + sizes)
    assert offs[-1] == B, (sizes, B)

    # concatenate gts at a common padded G (extra slots are valid=False)
    G = max(int(b["gt_boxes"].shape[1]) for b in batches)
    gt_boxes = jnp.concatenate(
        [_pad_gt_axis1(b["gt_boxes"], G) for b in batches], axis=0)
    gt_labels = jnp.concatenate(
        [_pad_gt_axis1(b["gt_labels"], G) for b in batches], axis=0)
    gt_valid = jnp.concatenate(
        [_pad_gt_axis1(b["gt_valid"], G) for b in batches], axis=0)
    A = jnp.asarray(anchors)

    gt_hbox = rbox_to_hbox(gt_boxes) if det.rotated else gt_boxes

    # ---------------- RPN ----------------
    def rpn_one(scores, deltas, gh, gb, gv, r):
        assign = max_iou_assign(A, gh, gv, None, det.rpn_pos_iou,
                                det.rpn_neg_iou, det.rpn_min_pos_iou, True)
        sample = random_sample(assign, r, det.rpn_num, det.rpn_pos_fraction)
        a_s = A[sample.inds]
        if det.rotated:
            tgt = midpoint_encode(a_s, gb[sample.gt_inds],
                                  stds=(1., 1., 1., 1., 0.5, 0.5))
        else:
            tgt = delta_encode(a_s, gb[sample.gt_inds])
        return rpn_loss(RPNOut(scores, deltas), A, sample, tgt,
                        det.rpn_smooth_l1_beta)

    rngs = jax.random.split(rng, B + 1)
    rpn_losses = jax.vmap(rpn_one)(rpn_out.cls_scores, rpn_out.deltas,
                                   gt_hbox, gt_boxes, gt_valid, rngs[:B])
    seg_losses = [{k: v[offs[d]:offs[d + 1]].mean()
                   for k, v in rpn_losses.items()}
                  for d in range(len(batches))]

    # ---------------- proposals (no grad) ----------------
    props, prop_scores = gen_proposals(
        jax.tree.map(jax.lax.stop_gradient, rpn_out), A, (H, W),
        det.nms_pre, det.max_proposals, det.rpn_nms_iou, det.rotated,
        level_sizes=anchor_level_sizes((H, W)))

    # add gt as proposals (reference rcnn sampler add_gt_as_proposals=True)
    props_all = jnp.concatenate([props, gt_boxes], axis=1)
    prop_valid = jnp.concatenate(
        [prop_scores > NEG_INF / 2, gt_valid], axis=1)

    # ---------------- RCNN assign/sample ----------------
    # Static sample count: never ask the sampler for more rois than the
    # (proposals + gt-as-proposals) pool holds — diagnostic overrides may
    # shrink max_proposals below rcnn_num.
    R = min(det.rcnn_num, int(props_all.shape[1]))

    def rcnn_one(pb, pv, gb, gv, gl, r):
        if det.rotated:
            ious = rbox_overlaps(gb, pb)
        else:
            ious = bbox_overlaps(gb, pb)
        # padded gts → 0 overlap (no-gt image = all negatives);
        # invalid proposals → ignore
        ious = jnp.where(gv[:, None], ious, 0.0)
        ious = jnp.where(pv[None, :], ious, -1.0)
        assign = _assign_from_ious(ious, gl, det.rcnn_pos_iou,
                                   det.rcnn_neg_iou, det.rcnn_pos_iou,
                                   det.rcnn_match_low_quality)
        sample = random_sample(assign, r, R, det.rcnn_pos_fraction)
        rois = pb[sample.inds]
        gt_for = gb[sample.gt_inds]
        if det.rotated:
            tgt = delta_encode_rbox(rois, gt_for, stds=det.bbox_stds)
        else:
            tgt = delta_encode(rois, gt_for, stds=det.bbox_stds)
        return sample, rois, tgt

    samples, rois, tgts = jax.vmap(rcnn_one)(
        props_all, prop_valid, gt_boxes, gt_valid, gt_labels,
        jax.random.split(rngs[B], B))

    flat_rois = rois.reshape(B * R, rois.shape[-1])
    batch_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), R)
    segs = [(int(offs[d]) * R, int(offs[d + 1]) * R)
            for d in range(len(batches))]
    box_outs = box_fn(flat_rois, batch_idx, segs)

    flat_sample = jax.tree.map(lambda x: x.reshape(B * R, *x.shape[2:]), samples)
    flat_tgts = tgts.reshape(B * R, -1)
    for d, (s, e) in enumerate(segs):
        cls_logits, reg_pred = box_outs[d]
        seg_losses[d].update(bbox_head_loss(
            cls_logits, reg_pred,
            jax.tree.map(lambda x: x[s:e], flat_sample),
            flat_tgts[s:e], dets[d].num_classes,
            det.reg_class_agnostic, det.rcnn_smooth_l1_beta))

    # ---------------- mask branch ----------------
    if det.with_mask and mask_fn is not None:
        # Mask loss counts ONLY positive slots, and random_sample packs
        # positives first with at most int(R * pos_fraction) of them —
        # so running the mask trunk on just that static prefix is exact
        # and cuts the (biggest-ticket) 14x14 RoI extract + 4xconv trunk
        # by 1/pos_fraction (reference mmdet equally runs its mask head
        # on the positive subset).
        P_m = max(1, int(R * det.rcnn_pos_fraction))
        m_sample = jax.tree.map(
            lambda x: x[:, :P_m].reshape(B * P_m, *x.shape[2:]), samples)
        m_rois = rois[:, :P_m].reshape(B * P_m, rois.shape[-1])
        m_bidx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), P_m)
        m_segs = [(int(offs[d]) * P_m, int(offs[d + 1]) * P_m)
                  for d in range(len(batches))]
        mask_logit_list = mask_fn(m_rois, m_bidx, m_segs)
        m = det.mask_size
        if not det.rotated and all("gt_mask_crops" in b for b in batches):
            # targets from per-gt box-aligned full-res crops (reference
            # mask_target semantics: crop the FULL-RES gt mask at the
            # proposal box; an instance mask is zero outside its own bbox,
            # so sampling the crop is exact up to grid resolution)
            crops = jnp.concatenate(
                [_pad_gt_axis1(b["gt_mask_crops"], G) for b in batches],
                axis=0)  # (B, G, C, C)
            flat_gt = m_sample.gt_inds + m_bidx * G
            tgt = mask_targets_from_crops(
                crops, gt_boxes, m_rois, flat_gt, m)
        else:
            # legacy: RoIAlign the assigned instance's stride-4 binary mask
            gm = jnp.concatenate(
                [_pad_gt_axis1(b["gt_masks"], G) for b in batches], axis=0)
            flat_gt = m_sample.gt_inds + m_bidx * G
            mask_imgs = gm.reshape(B * G, gm.shape[2], gm.shape[3], 1)
            if det.rotated:
                tgt = roi_align_rotated(mask_imgs, m_rois, flat_gt,
                                        m, 0.25, clockwise=True)[..., 0]
            else:
                tgt = roi_align(mask_imgs, m_rois, flat_gt, m, 0.25)[..., 0]
        for d, (s, e) in enumerate(m_segs):
            seg_losses[d].update(mask_head_loss(
                mask_logit_list[d], tgt[s:e],
                jax.tree.map(lambda x: x[s:e], m_sample)))

    total = sum(v for mets in seg_losses for k, v in mets.items()
                if k.startswith("loss"))
    return total, seg_losses


def _assign_from_ious(ious: Array, gt_labels: Array, pos_thr: float,
                      neg_thr: float, min_pos_iou: float,
                      match_low_quality: bool) -> AssignResult:
    """MaxIoUAssigner core on a precomputed (G, P) IoU matrix (invalid
    entries already set to -1)."""
    P = ious.shape[1]
    max_ious = ious.max(axis=0)
    argmax_gt = ious.argmax(axis=0)
    gt_inds = jnp.full((P,), -1, jnp.int32)
    gt_inds = jnp.where((max_ious < neg_thr) & (max_ious >= 0), 0, gt_inds)
    gt_inds = jnp.where(max_ious >= pos_thr,
                        argmax_gt.astype(jnp.int32) + 1, gt_inds)
    if match_low_quality:
        gt_max = ious.max(axis=1)
        is_best = (ious == gt_max[:, None]) & (gt_max[:, None] >= min_pos_iou) \
            & (ious > 0)
        gt_ids = jnp.arange(ious.shape[0], dtype=jnp.int32) + 1
        best = jnp.where(is_best, gt_ids[:, None], 0).max(axis=0)
        gt_inds = jnp.where(best > 0, best, gt_inds)
    safe = jnp.clip(gt_inds - 1, 0, ious.shape[0] - 1)
    labels = jnp.where(gt_inds > 0, gt_labels[safe], -1)
    return AssignResult(gt_inds, max_ious, labels)


# ---------------------------------------------------------------------------
# prediction
# ---------------------------------------------------------------------------

def detection_predict(model: TwoStageDetector, variables,
                      img: Array, anchors: np.ndarray,
                      nms_pre: Optional[int] = None) -> Detections:
    det = model.det
    feats = model.apply(variables, img, method=TwoStageDetector.features)
    rpn_out = model.apply(variables, feats, method=TwoStageDetector.rpn)
    box_fn = lambda rois, bidx: model.apply(
        variables, feats, rois, bidx, method=TwoStageDetector.box_head)
    mask_fn = (lambda rois, bidx: model.apply(
        variables, feats, rois, bidx,
        method=TwoStageDetector.mask_head_logits)) if det.with_mask else None
    return det_predict_core(det, anchors, img.shape[1:3],
                            img.shape[0], rpn_out, box_fn, mask_fn, nms_pre)


def det_predict_core(det: DetConfig, anchors: np.ndarray,
                     img_hw: Tuple[int, int], B: int, rpn_out: RPNOut,
                     box_fn, mask_fn=None,
                     nms_pre: Optional[int] = None) -> Detections:
    """Prediction from precomputed RPN outputs and head callables (shared by
    single-task detectors and the multi-task validator)."""
    H, W = img_hw
    A = jnp.asarray(anchors)
    props, prop_scores = gen_proposals(rpn_out, A, (H, W),
                                       nms_pre or det.nms_pre,
                                       det.max_proposals, det.rpn_nms_iou,
                                       det.rotated,
                                       level_sizes=anchor_level_sizes((H, W)))

    P = props.shape[1]
    flat_rois = props.reshape(B * P, props.shape[-1])
    batch_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), P)
    cls_logits, reg_pred = box_fn(flat_rois, batch_idx)
    C = det.num_classes
    probs = jax.nn.softmax(cls_logits, axis=-1)[:, :C].reshape(B, P, C)
    D = 5 if det.rotated else 4
    if det.reg_class_agnostic:
        reg = jnp.broadcast_to(reg_pred.reshape(B, P, 1, D), (B, P, C, D))
    else:
        reg = reg_pred.reshape(B, P, C, D)

    decode = delta_decode_rbox if det.rotated else delta_decode

    # cap candidates before the O(N²) NMS (mmdet filters by score first)
    ncand = min(det.max_per_img * 10, P * C)

    def prep(pb, pv, pr, sc):
        """Decode + score-filter + candidate top-k (cheap to vmap).  The
        NMS itself runs natively batched below — vmapping it batches the
        suppression loop's slices into gathers (28x slower on-chip)."""
        rois_c = jnp.broadcast_to(pb[:, None, :], (P, C, D))
        if det.rotated:
            boxes = delta_decode_rbox(rois_c, pr, stds=det.bbox_stds)
        else:
            boxes = delta_decode(rois_c, pr, stds=det.bbox_stds,
                                 max_shape=(H, W))
        flat_boxes = boxes.reshape(P * C, D)
        flat_scores = jnp.where(
            (sc > det.score_thr) & pv[:, None], sc, NEG_INF).reshape(P * C)
        flat_labels = jnp.broadcast_to(
            jnp.arange(C, dtype=jnp.int32)[None, :], (P, C)).reshape(P * C)
        top_s, top_i = jax.lax.top_k(flat_scores, ncand)
        return flat_boxes[top_i], top_s, flat_labels[top_i]

    cand_b, cand_s, cand_l = jax.vmap(prep)(
        props, prop_scores > NEG_INF / 2, reg, probs)
    iou_fn = (lambda a, b: rbox_overlaps(a, b)) if det.rotated else None
    keep_i, scores = batched_nms(cand_b, cand_s, cand_l, det.test_nms_iou,
                                 det.max_per_img, iou_fn=iou_fn)
    boxes = jnp.take_along_axis(cand_b, keep_i[..., None], axis=1)
    labels = jnp.take_along_axis(cand_l, keep_i, axis=1)
    valid = scores > NEG_INF / 2

    mask_logits = None
    if det.with_mask and mask_fn is not None:
        N = det.max_per_img
        flat_b = boxes.reshape(B * N, D)
        bidx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), N)
        ml = mask_fn(flat_b, bidx)
        m = ml.shape[1]
        sel = jnp.clip(labels.reshape(B * N), 0, C - 1)
        ml = ml[jnp.arange(B * N), :, :, sel]
        mask_logits = ml.reshape(B, N, m, m)

    return Detections(boxes, scores, labels, valid, mask_logits)
