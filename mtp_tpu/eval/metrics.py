"""Evaluation metrics: top-k accuracy, mIoU/mDice/mFscore, binary-change F1.

Capability parity with the reference metric stack: mmpretrain `Accuracy`,
`MTP_SS_Metric` (Multi-Task_Pretrain/semantic_segmentation/metric.py:19-285,
intersect-and-union accumulation :164), and the change-detection F1 from the
CD configs.  Accumulation is pure jnp so it can run inside jit on device and
cross-device reduction falls out of batch sharding (the reference needs an
explicit mmengine cross-rank gather instead).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def topk_accuracy(logits: jax.Array, labels: jax.Array,
                  ks: Tuple[int, ...] = (1, 5)) -> Dict[str, jax.Array]:
    out = {}
    order = jnp.argsort(logits, axis=-1)[:, ::-1]
    for k in ks:
        hit = (order[:, :k] == labels[:, None]).any(axis=1)
        out[f"top{k}"] = hit.mean() * 100.0
    return out


def intersect_and_union(pred: jax.Array, label: jax.Array, num_classes: int,
                        ignore_index: int = 255):
    """Per-class (intersect, union, pred_area, label_area), each (K,)."""
    valid = label != ignore_index
    pred = jnp.where(valid, pred, num_classes)  # dump ignored into extra bin
    label = jnp.where(valid, label, num_classes)
    inter = jnp.where(pred == label, pred, num_classes)
    area_i = jnp.bincount(inter.reshape(-1), length=num_classes + 1)[:num_classes]
    area_p = jnp.bincount(pred.reshape(-1), length=num_classes + 1)[:num_classes]
    area_l = jnp.bincount(label.reshape(-1), length=num_classes + 1)[:num_classes]
    return area_i, area_p + area_l - area_i, area_p, area_l


class SegAccumulator:
    """Host-side accumulator over batches; evaluate() → mIoU/mAcc/aAcc (%)"""

    def __init__(self, num_classes: int, ignore_index: int = 255):
        self.k = num_classes
        self.ignore = ignore_index
        self.i = np.zeros(num_classes, np.float64)
        self.u = np.zeros(num_classes, np.float64)
        self.p = np.zeros(num_classes, np.float64)
        self.l = np.zeros(num_classes, np.float64)

    def add(self, pred, label):
        i, u, p, l = intersect_and_union(jnp.asarray(pred), jnp.asarray(label),
                                         self.k, self.ignore)
        self.i += np.asarray(i, np.float64)
        self.u += np.asarray(u, np.float64)
        self.p += np.asarray(p, np.float64)
        self.l += np.asarray(l, np.float64)

    def evaluate(self) -> Dict[str, float]:
        eps = 1e-12
        iou = self.i / np.maximum(self.u, eps)
        acc = self.i / np.maximum(self.l, eps)
        seen = self.l > 0
        precision = self.i / np.maximum(self.p, eps)
        recall = acc
        f1 = 2 * precision * recall / np.maximum(precision + recall, eps)
        dice = 2 * self.i / np.maximum(self.p + self.l, eps)
        return {
            "mIoU": float(iou[seen].mean() * 100) if seen.any() else 0.0,
            "mAcc": float(acc[seen].mean() * 100) if seen.any() else 0.0,
            "aAcc": float(self.i.sum() / max(self.l.sum(), eps) * 100),
            "mFscore": float(f1[seen].mean() * 100) if seen.any() else 0.0,
            "mDice": float(dice[seen].mean() * 100) if seen.any() else 0.0,
            "IoU": (iou * 100).tolist(),
            "Fscore": (f1 * 100).tolist(),
        }


def binary_change_f1(self_i: np.ndarray, pred_area: np.ndarray,
                     label_area: np.ndarray) -> float:
    """F1 of the 'change' class (index 1) — open-cd LEVIR/WHU convention."""
    tp = self_i[1]
    precision = tp / max(pred_area[1], 1e-12)
    recall = tp / max(label_area[1], 1e-12)
    return float(2 * precision * recall / max(precision + recall, 1e-12) * 100)
