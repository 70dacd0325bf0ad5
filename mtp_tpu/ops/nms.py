"""Fixed-shape NMS for TPU.

The reference uses mmcv's CUDA `batched_nms` / `nms_rotated`.  TPU cannot do
data-dependent shapes, so this is the padded-tensor design from SURVEY.md §7:
inputs are fixed-size (score = -inf marks padding), output is a fixed-size
keep mask + top-k selection.  The suppression loop is a `lax.fori_loop` over
boxes in score order against a precomputed IoU matrix — O(N²) memory, N ≤ a
few thousand, which the VPU handles easily.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from mtp_tpu.ops.boxes import bbox_overlaps

Array = jax.Array

NEG_INF = -1e10


def nms_mask(ious: Array, scores: Array, iou_thr: float,
             block: int = 128) -> Array:
    """Greedy NMS keep mask given a pairwise IoU matrix.

    ious (N, N) for boxes already in ANY order; scores (N,) with padding at
    -inf.  Returns bool (N,) keep mask — identical semantics to the fully
    sequential greedy scan.

    Blocked evaluation: boxes are processed in score order in tiles of
    `block`; within a tile the greedy scan runs on a (block, block) VMEM
    tile (cheap VPU steps), and each finished tile suppresses ALL later
    boxes with one masked row-reduction.  The serial region drops from N
    full-row updates to N tiny ones + N/block matrix ops (the round-1 PERF
    item: the 2000-step fori_loop was the largest serial region in the
    predict path)."""
    n = scores.shape[0]
    order = jnp.argsort(-scores)  # high→low
    ious_o = ious[order][:, order]
    valid = scores[order] > NEG_INF / 2

    T = min(block, n)
    n_pad = (n + T - 1) // T * T
    if n_pad != n:
        ious_o = jnp.pad(ious_o, ((0, n_pad - n), (0, n_pad - n)))
        valid = jnp.pad(valid, (0, n_pad - n))
    iota_T = jnp.arange(T)
    iota_N = jnp.arange(n_pad)

    def outer(bi, alive):
        s = bi * T
        rows = jax.lax.dynamic_slice(ious_o, (s, 0), (T, n_pad))  # (T, N)
        intra = jax.lax.dynamic_slice_in_dim(rows, s, T, axis=1)  # (T, T)
        a_blk = jax.lax.dynamic_slice(alive, (s,), (T,))

        def inner(i, ab):
            sup = (intra[i] > iou_thr) & (iota_T > i)
            return jnp.where(ab[i], ab & ~sup, ab)

        a_blk = jax.lax.fori_loop(0, T, inner, a_blk)
        alive = jax.lax.dynamic_update_slice(alive, a_blk, (s,))
        # kept boxes of this tile suppress all later boxes at once
        sup_later = ((rows > iou_thr) & a_blk[:, None]).any(0)
        return alive & ~(sup_later & (iota_N >= s + T))

    alive = jax.lax.fori_loop(0, n_pad // T, outer,
                              jnp.ones((n_pad,), bool) & valid)
    keep_o = alive[:n] & valid[:n]
    # scatter back to input order
    keep = jnp.zeros((n,), bool).at[order].set(keep_o)
    return keep


def nms(boxes: Array, scores: Array, iou_thr: float,
        max_out: int, iou_fn: Callable[[Array, Array], Array] = None,
        block: int = 128) -> Tuple[Array, Array]:
    """Fixed-shape NMS.

    boxes (N, 4[+]), scores (N,) with -inf padding → (idx (max_out,),
    keep_scores (max_out,)); idx is into the input, padded entries have
    score -inf (idx points at an arbitrary suppressed slot).

    Same greedy semantics as `nms_mask`, but the (N, N) IoU matrix is never
    materialized: boxes are gathered into score order ONCE (N×D) and each
    outer tile computes its (block, N) IoU rows on the fly.  At the RPN
    pretrain shape (N≈6.7k per head, 6 heads/step) this removes a 181 MB
    HBM intermediate plus two full (N, N) gathers per head.
    """
    squeeze = boxes.ndim == 2
    if squeeze:
        boxes, scores = boxes[None], scores[None]
    idx, s = nms_batched(boxes, scores, iou_thr, max_out, iou_fn, block)
    return (idx[0], s[0]) if squeeze else (idx, s)


def nms_batched(boxes: Array, scores: Array, iou_thr: float,
                max_out: int, iou_fn: Callable[[Array, Array], Array] = None,
                block: int = 128) -> Tuple[Array, Array]:
    """Batched fixed-shape NMS: boxes (B, N, D), scores (B, N).

    NEVER vmap `nms` — vmap turns the suppression loop's dynamic slices
    into gathers/scatters.  B > 1 runs `lax.map` (a scan) over the proven
    single-lane kernel: dedupe-proof chained timing on the chip at N=6735
    → 1000 measured the ride-along-batch-dim form at a flat ~234 ms wall
    for ANY B ≥ 2 (same as the vmap pathology; an earlier ~9 ms reading
    was an artifact of relay dispatch-deduplication), while lax.map scales
    linearly with the 8-9 ms single-lane cost: B=2 14.0 ms, B=3 19.4 ms
    (12× at the predict-path shape).  One compiled body regardless of B.
    """
    if boxes.shape[0] > 1:
        idx, s = jax.lax.map(
            lambda t: _nms_single_lane(t[0][None], t[1][None], iou_thr,
                                       max_out, iou_fn, block),
            (boxes, scores))
        return idx[:, 0], s[:, 0]
    return _nms_single_lane(boxes, scores, iou_thr, max_out, iou_fn, block)


def _nms_single_lane(boxes: Array, scores: Array, iou_thr: float,
                     max_out: int, iou_fn, block: int) -> Tuple[Array, Array]:
    """The (B=1-shaped) blocked greedy kernel behind `nms`/`nms_batched`;
    the batch dim of the loop-carried arrays must stay 1 (see above)."""
    iou_fn = iou_fn or (lambda a, b: bbox_overlaps(a, b))
    B, n, D = boxes.shape
    order = jnp.argsort(-scores, axis=1)                   # (B, N) high→low
    boxes_o = jnp.take_along_axis(boxes, order[..., None], axis=1)
    scores_o = jnp.take_along_axis(scores, order, axis=1)
    valid = scores_o > NEG_INF / 2

    T = min(block, n)
    n_pad = (n + T - 1) // T * T
    if n_pad != n:
        boxes_o = jnp.pad(boxes_o, ((0, 0), (0, n_pad - n), (0, 0)))
        valid = jnp.pad(valid, ((0, 0), (0, n_pad - n)))
    iota_T = jnp.arange(T)
    iota_N = jnp.arange(n_pad)
    biou = jax.vmap(iou_fn)  # pure math — safe to vmap (no dynamic slices)

    def outer(bi, alive):
        s = bi * T
        blk = jax.lax.dynamic_slice(boxes_o, (0, s, 0), (B, T, D))
        rows = biou(blk, boxes_o)                              # (B, T, N)
        intra = jax.lax.dynamic_slice_in_dim(rows, s, T, axis=2)
        a_blk = jax.lax.dynamic_slice(alive, (0, s), (B, T))

        def inner(i, ab):
            sup = (jax.lax.dynamic_slice_in_dim(intra, i, 1, axis=1)[:, 0]
                   > iou_thr) & (iota_T > i)[None, :]          # (B, T)
            on = jax.lax.dynamic_slice_in_dim(ab, i, 1, axis=1)  # (B, 1)
            return jnp.where(on, ab & ~sup, ab)

        a_blk = jax.lax.fori_loop(0, T, inner, a_blk)
        alive = jax.lax.dynamic_update_slice(alive, a_blk, (0, s))
        # kept boxes of this tile suppress all later boxes at once
        sup_later = ((rows > iou_thr) & a_blk[..., None]).any(1)  # (B, N)
        return alive & ~(sup_later & (iota_N >= s + T)[None, :])

    alive = jax.lax.fori_loop(0, n_pad // T, outer,
                              jnp.ones((B, n_pad), bool) & valid)
    keep_o = alive[:, :n] & valid[:, :n]
    # scores are descending, so top_k over kept sorted scores keeps order
    kept_scores = jnp.where(keep_o, scores_o[:, :n], NEG_INF)
    top_scores, idx_o = jax.lax.top_k(kept_scores, max_out)
    return (jnp.take_along_axis(order, idx_o, axis=1).astype(jnp.int32),
            top_scores)


def batched_nms(boxes: Array, scores: Array, idxs: Array, iou_thr: float,
                max_out: int,
                iou_fn: Callable[[Array, Array], Array] = None,
                class_agnostic: bool = False) -> Tuple[Array, Array]:
    """Category-aware NMS via the coordinate-offset trick (mmcv batched_nms):
    boxes of different `idxs` never overlap after shifting by idx * extent.

    Accepts (N, D)/(N,) or natively batched (B, N, D)/(B, N) inputs — like
    `nms`, never vmap this (see nms_batched).
    For rotated boxes pass a custom iou_fn and pre-offset centers upstream.
    """
    if class_agnostic:
        return nms(boxes, scores, iou_thr, max_out, iou_fn)
    # translate per class: x1y1x2y2 boxes shift all 4 coords, (cx, cy, w, h,
    # theta) rboxes shift only the center.
    ndim = 4 if boxes.shape[-1] == 4 else 2
    if ndim == 4:
        # corners bounded by max|coord| on both sides → 2x + 1 separates
        extent = jnp.max(jnp.abs(boxes)) * 2.0 + 1.0
    else:
        # rotated: centers span ±max|cx,cy| (decoded boxes can be negative)
        # and each box reaches up to sqrt(w²+h²)/2 ≤ √2·max(w,h)/2 beyond
        # its center, on both of the two adjacent clusters
        extent = (jnp.max(jnp.abs(boxes[..., :2])) * 2.0
                  + jnp.sqrt(2.0) * jnp.max(jnp.abs(boxes[..., 2:4])) + 1.0)
    off = idxs.astype(boxes.dtype)[..., None] * extent  # (..., N, 1)
    shifted = boxes.at[..., :ndim].add(
        jnp.broadcast_to(off, boxes[..., :ndim].shape))
    return nms(shifted, scores, iou_thr, max_out, iou_fn)
