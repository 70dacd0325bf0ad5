"""Fixed-shape assigner + sampler for detection training.

Semantics of mmdet `MaxIoUAssigner` / `RandomSampler` (reference train_cfg,
instance_segmentation/mask_rcnn.py:71-106), re-designed for static shapes:
ground-truth boxes arrive zero-padded with a validity mask, and sampling
returns exactly `num` RoI slots (a validity mask marks unfilled slots) — the
reference's RandomSampler already targets fixed counts (256 RPN / 512 RCNN),
so this is behavior-preserving, just shape-static.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from mtp_tpu.ops.boxes import bbox_overlaps

Array = jax.Array


class AssignResult(NamedTuple):
    gt_inds: Array      # (A,) int32: -1 ignore, 0 negative, >0 = gt index + 1
    max_ious: Array     # (A,) best IoU per anchor
    labels: Array       # (A,) class label of assigned gt (or -1)


def max_iou_assign(anchors: Array, gt_boxes: Array, gt_valid: Array,
                   gt_labels: Optional[Array] = None,
                   pos_iou_thr: float = 0.7, neg_iou_thr: float = 0.3,
                   min_pos_iou: float = 0.3,
                   match_low_quality: bool = True,
                   anchor_valid: Optional[Array] = None) -> AssignResult:
    """anchors (A, 4), gt_boxes (G, 4) zero-padded, gt_valid (G,) bool."""
    A = anchors.shape[0]
    ious = bbox_overlaps(gt_boxes, anchors)           # (G, A)
    # padded gt rows contribute 0 overlap (so a no-gt image yields all
    # negatives, mmdet semantics); invalid anchors become ignore via -1
    ious = jnp.where(gt_valid[:, None], ious, 0.0)
    if anchor_valid is not None:
        ious = jnp.where(anchor_valid[None, :], ious, -1.0)

    max_ious = ious.max(axis=0)                        # (A,)
    argmax_gt = ious.argmax(axis=0)                    # (A,)

    gt_inds = jnp.full((A,), -1, jnp.int32)
    gt_inds = jnp.where(max_ious < neg_iou_thr, 0, gt_inds)
    # mmdet: negatives are anchors with 0 <= max_iou < neg_thr; padded rows
    # give max_iou == -1 which must stay ignore
    gt_inds = jnp.where(max_ious < 0, -1, gt_inds)
    gt_inds = jnp.where(max_ious >= pos_iou_thr,
                        argmax_gt.astype(jnp.int32) + 1, gt_inds)

    if match_low_quality:
        # for each gt, anchors achieving that gt's best IoU get assigned to it
        gt_max = ious.max(axis=1)                      # (G,)
        is_best = (ious == gt_max[:, None]) & gt_valid[:, None] \
            & (gt_max[:, None] >= min_pos_iou) & (ious > 0)
        # later gts override earlier ones on conflict (mmdet loop order)
        gt_ids = jnp.arange(gt_boxes.shape[0], dtype=jnp.int32) + 1
        best_assign = jnp.where(is_best, gt_ids[:, None], 0)  # (G, A)
        winner = best_assign.max(axis=0)

        def last_winner(col):  # mmdet keeps the LAST gt in iteration order
            nz = jnp.where(col > 0, jnp.arange(col.shape[0]), -1)
            j = nz.max()
            return jnp.where(j >= 0, col[jnp.maximum(j, 0)], 0)

        winner = jax.vmap(last_winner, in_axes=1)(best_assign)
        gt_inds = jnp.where(winner > 0, winner, gt_inds)

    if gt_labels is not None:
        safe = jnp.clip(gt_inds - 1, 0, gt_boxes.shape[0] - 1)
        labels = jnp.where(gt_inds > 0, gt_labels[safe], -1)
    else:
        labels = jnp.full((A,), -1, jnp.int32)
    if anchor_valid is not None:
        gt_inds = jnp.where(anchor_valid, gt_inds, -1)
    return AssignResult(gt_inds, max_ious, labels)


class SampleResult(NamedTuple):
    inds: Array       # (num,) int32 indices into the anchor/proposal set
    is_pos: Array     # (num,) bool
    valid: Array      # (num,) bool — False for unfilled slots
    gt_inds: Array    # (num,) int32 assigned gt index (0-based, clipped)
    labels: Array     # (num,) int32 class labels (pos slots only)


def random_sample(assign: AssignResult, rng: Array, num: int,
                  pos_fraction: float) -> SampleResult:
    """Sample exactly `num` slots: up to num*pos_fraction positives (random
    without replacement), the rest random negatives — mmdet RandomSampler with
    neg_pos_ub=-1."""
    A = assign.gt_inds.shape[0]
    expected_pos = int(num * pos_fraction)
    pos_mask = assign.gt_inds > 0
    neg_mask = assign.gt_inds == 0

    r1, r2 = jax.random.split(rng)
    pos_key = jnp.where(pos_mask, jax.random.uniform(r1, (A,)), -1.0)
    # rank positives: top `expected_pos` random positives survive
    pos_rank = jnp.argsort(jnp.argsort(-pos_key))  # rank 0 = best key
    pos_sel = pos_mask & (pos_rank < expected_pos)
    n_pos = pos_sel.sum()

    neg_key = jnp.where(neg_mask, jax.random.uniform(r2, (A,)), -1.0)
    neg_rank = jnp.argsort(jnp.argsort(-neg_key))
    n_neg = num - n_pos  # dynamic value, static bound num
    neg_sel = neg_mask & (neg_rank < n_neg)

    # priority pack: positives first, then negatives, then padding
    prio = jnp.where(pos_sel, 2.0, jnp.where(neg_sel, 1.0, 0.0))
    key = prio + jnp.where(prio > 0,
                           jax.random.uniform(jax.random.fold_in(rng, 7), (A,)) * 0.5,
                           0.0)
    _, inds = jax.lax.top_k(key, num)
    inds = inds.astype(jnp.int32)
    is_pos = pos_sel[inds]
    valid = (pos_sel | neg_sel)[inds]
    gt_inds = jnp.clip(assign.gt_inds[inds] - 1, 0, None)
    labels = assign.labels[inds]
    return SampleResult(inds, is_pos, valid, gt_inds, labels)
