"""Decoder/eval-side parity against the REFERENCE'S OWN torch/numpy code.

Extends the backbone-oracle technique (test_reference_module_parity) to the
evaluation stack, per the round-2 verdict: the reference's
`rotated_detection/metric.py` (tpfp_default :93, eval_rbbox_map :236) and
`instance_segmentation/mask_head.py` (_do_paste_mask :401) are imported from
the read-only checkout (with API stubs for mmcv/mmengine/mmrotate imports)
and run as oracles against `mtp_tpu.eval.det_map.eval_map` and
`mtp_tpu.eval.masks.paste_masks` on randomized inputs.

The rotated-IoU backend is shared (our np_rbox_iou fills the mmcv
`box_iou_rotated` stub — it has its own parity tests), so these tests pin
the *matching/AP/pasting logic*: greedy score-sorted assignment, covered-gt
FP semantics, per-class accumulation, VOC 11-point and area AP, and the
detectron2-style grid-sampled mask pasting.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF_DIR = "/root/reference/Multi-Task_Pretrain"
REF_METRIC = os.path.join(REF_DIR, "rotated_detection", "metric.py")
REF_MASK_HEAD = os.path.join(REF_DIR, "instance_segmentation", "mask_head.py")

pytestmark = pytest.mark.skipif(not os.path.exists(REF_METRIC),
                                reason="reference checkout not present")


def _mod(name):
    m = types.ModuleType(name)
    sys.modules[name] = m
    return m


def _install_eval_stubs():
    """API stubs for the reference eval modules' imports.  The rotated IoU
    routes to OUR np_rbox_iou (shared backend); everything else is inert."""
    import torch

    from mtp_tpu.eval.det_map import average_precision, np_rbox_iou

    if "mmcv" not in sys.modules:
        mmcv = _mod("mmcv")
        ops = _mod("mmcv.ops")

        def box_iou_rotated(a, b):
            a = a.numpy() if hasattr(a, "numpy") else np.asarray(a)
            b = b.numpy() if hasattr(b, "numpy") else np.asarray(b)
            return torch.from_numpy(
                np_rbox_iou(a[:, :5].astype(np.float32),
                            b[:, :5].astype(np.float32)))

        ops.box_iou_rotated = box_iou_rotated
        ops.box_iou_quadri = None
        ops.nms_rotated = None
        ops.nms_quadri = None
        mmcv.ops = ops
        cnn = _mod("mmcv.cnn")
        cnn.ConvModule = object
        cnn.build_conv_layer = lambda *a, **k: None
        cnn.build_upsample_layer = lambda *a, **k: None
        carafe = _mod("mmcv.ops.carafe")
        carafe.CARAFEPack = object
        ops.carafe = carafe

    if "mmengine" not in sys.modules or not hasattr(
            sys.modules.get("mmengine", None), "evaluator"):
        mmengine = sys.modules.get("mmengine") or _mod("mmengine")
        ev = _mod("mmengine.evaluator")

        class BaseMetric:
            def __init__(self, *a, **k):
                pass

        ev.BaseMetric = BaseMetric
        fileio = _mod("mmengine.fileio")
        fileio.dump = lambda *a, **k: None
        logging_ = _mod("mmengine.logging")

        class MMLogger:
            @staticmethod
            def get_current_instance():
                return None

        logging_.MMLogger = MMLogger
        logging_.print_log = lambda *a, **k: None
        cfg = _mod("mmengine.config")

        class ConfigDict(dict):
            __getattr__ = dict.get

        cfg.ConfigDict = ConfigDict
        model = _mod("mmengine.model")

        class BaseModule:
            def __init__(self, *a, **k):
                pass

        model.BaseModule = BaseModule
        model.ModuleList = list
        structures = _mod("mmengine.structures")
        structures.InstanceData = object
        # the backbone-parity test's stubs want mmengine.dist too — the two
        # stub sets must compose in either import order
        dist = sys.modules.get("mmengine.dist") or _mod("mmengine.dist")
        if not hasattr(dist, "get_dist_info"):
            dist.get_dist_info = lambda: (0, 1)
        mmengine.evaluator = ev
        mmengine.fileio = fileio
        mmengine.logging = logging_
        mmengine.config = cfg
        mmengine.model = model
        mmengine.structures = structures
        mmengine.dist = dist

    if "mmrotate" not in sys.modules:
        mmrotate = _mod("mmrotate")
        rev = _mod("mmrotate.evaluation")
        rev.eval_rbbox_map = None  # shadowed by the module's own definition
        reg = _mod("mmrotate.registry")

        class _Registry:
            def register_module(self, *a, **k):
                return lambda cls: cls

        reg.METRICS = _Registry()
        sbox = _mod("mmrotate.structures.bbox")
        sbox.rbox2qbox = lambda x: x
        _mod("mmrotate.structures").bbox = sbox
        mmrotate.evaluation = rev
        mmrotate.registry = reg

    if "mmdet" not in sys.modules:
        mmdet = _mod("mmdet")
        f = _mod("mmdet.evaluation.functional")
        # the AP primitive is OURS — the oracle pins the matching/accum logic
        f.average_precision = average_precision
        _mod("mmdet.evaluation").functional = f
        mmdet.evaluation = sys.modules["mmdet.evaluation"]
        samplers = _mod("mmdet.models.task_modules.samplers")
        samplers.SamplingResult = object
        _mod("mmdet.models.task_modules").samplers = samplers
        mutils = _mod("mmdet.models.utils")
        mutils.empty_instances = lambda *a, **k: None
        _mod("mmdet.models").task_modules = sys.modules[
            "mmdet.models.task_modules"]
        sys.modules["mmdet.models"].utils = mutils
        reg = _mod("mmdet.registry")

        class _Registry:
            def register_module(self, *a, **k):
                return lambda cls: cls

        reg.MODELS = _Registry()
        smask = _mod("mmdet.structures.mask")
        smask.mask_target = lambda *a, **k: None
        _mod("mmdet.structures").mask = smask
        dutils = _mod("mmdet.utils")
        dutils.ConfigType = object
        dutils.InstanceList = list
        dutils.OptConfigType = object
        dutils.OptMultiConfig = object

    if "terminaltables" not in sys.modules:
        tt = _mod("terminaltables")

        class AsciiTable:
            def __init__(self, *a, **k):
                self.table = ""
                self.inner_footing_row_border = False

        tt.AsciiTable = AsciiTable


def _load(path, name):
    _install_eval_stubs()
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _random_rotated_scenes(seed, n_imgs=6, n_cls=3):
    """Random dets/gts in both the reference's and our record formats."""
    rng = np.random.default_rng(seed)
    det_results, annotations, per_image = [], [], []
    for _ in range(n_imgs):
        ng = int(rng.integers(0, 6))
        nd = int(rng.integers(0, 14))
        gt = np.stack([rng.uniform(20, 100, ng), rng.uniform(20, 100, ng),
                       rng.uniform(8, 30, ng), rng.uniform(5, 15, ng),
                       rng.uniform(-1.5, 1.5, ng)], -1).astype(np.float32)
        gl = rng.integers(0, n_cls, ng)
        # half the dets perturb a gt (plausible matches), half are random
        dets, dl = [], []
        for i in range(nd):
            if ng and i % 2 == 0:
                g = int(rng.integers(0, ng))
                d = gt[g] + rng.normal(0, 2.0, 5).astype(np.float32)
                d[2:4] = np.abs(d[2:4]) + 1.0
                dets.append(d)
                dl.append(gl[g] if rng.random() < 0.8
                          else int(rng.integers(0, n_cls)))
            else:
                dets.append(np.array(
                    [rng.uniform(20, 100), rng.uniform(20, 100),
                     rng.uniform(8, 30), rng.uniform(5, 15),
                     rng.uniform(-1.5, 1.5)], np.float32))
                dl.append(int(rng.integers(0, n_cls)))
        dets = (np.stack(dets) if dets else np.zeros((0, 5), np.float32))
        dl = np.asarray(dl, np.int64)
        scores = rng.uniform(0, 1, nd).astype(np.float32)

        det_results.append([
            np.concatenate([dets[dl == c], scores[dl == c][:, None]], -1)
            for c in range(n_cls)])
        annotations.append(dict(
            bboxes=gt, labels=np.asarray(gl, np.int64),
            bboxes_ignore=np.zeros((0, 5), np.float32),
            labels_ignore=np.zeros((0,), np.int64)))
        per_image.append(dict(det_boxes=dets, det_scores=scores,
                              det_labels=dl, gt_boxes=gt,
                              gt_labels=np.asarray(gl, np.int64)))
    return det_results, annotations, per_image


@pytest.mark.parametrize("use_07", [True, False])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_rotated_map_matches_reference(seed, use_07):
    from mtp_tpu.eval.det_map import eval_map

    ref = _load(REF_METRIC, "ref_rd_metric")
    det_results, annotations, per_image = _random_rotated_scenes(seed)
    mean_ap, _ = ref.eval_rbbox_map(det_results, annotations, iou_thr=0.5,
                                    use_07_metric=use_07)
    ours = eval_map(per_image, num_classes=3, iou_thr=0.5, rotated=True,
                    mode="11points" if use_07 else "area")
    np.testing.assert_allclose(ours["mAP"], mean_ap * 100, atol=1e-4)


def test_paste_mask_matches_reference():
    """_do_paste_mask (detectron2 grid-sample pasting) vs eval/masks.py."""
    import torch

    from mtp_tpu.eval.masks import paste_masks

    ref = _load(REF_MASK_HEAD, "ref_mask_head")
    rng = np.random.default_rng(0)
    N, m, H, W = 5, 28, 96, 128
    probs = rng.uniform(0, 1, (N, m, m)).astype(np.float32)
    # smooth the grids so the 0.5 level set is a stable contour
    from scipy.ndimage import gaussian_filter
    probs = np.stack([gaussian_filter(p, 3.0) for p in probs])
    probs = (probs - probs.min((1, 2), keepdims=True)) / np.maximum(
        np.ptp(probs, axis=(1, 2))[:, None, None], 1e-6)
    x1 = rng.uniform(0, W - 40, N)
    y1 = rng.uniform(0, H - 40, N)
    boxes = np.stack([x1, y1, x1 + rng.uniform(15, 40, N),
                      y1 + rng.uniform(15, 40, N)], -1).astype(np.float32)

    got = paste_masks(probs, boxes, H, W, thr=0.5)
    ref_masks, _ = ref._do_paste_mask(
        torch.from_numpy(probs)[:, None], torch.from_numpy(boxes), H, W,
        skip_empty=False)
    ref_bin = (ref_masks.numpy() >= 0.5).astype(np.uint8)

    for i in range(N):
        inter = (got[i] & ref_bin[i]).sum()
        union = (got[i] | ref_bin[i]).sum()
        assert union > 0
        assert inter / union > 0.97, (i, inter / union)
    # aggregate disagreement stays at the bilinear-boundary level
    assert np.mean(got != ref_bin) < 2e-3


def test_covered_gt_is_fp_not_rematched():
    """The reference tpfp rule: a det whose ARGMAX gt is already covered is
    an FP, even if another unmatched gt also clears the IoU threshold (no
    re-matching).  Deterministic scene pinning that edge."""
    from mtp_tpu.eval.det_map import eval_map

    ref = _load(REF_METRIC, "ref_rd_metric")
    gt = np.array([[50, 50, 20, 10, 0.0],
                   [58, 50, 20, 10, 0.0]], np.float32)   # overlapping pair
    # det0 = gt A exactly (covers A); det1 argmaxes A but also >0.5 with B
    det = np.array([[50, 50, 20, 10, 0.0],
                    [52, 50, 20, 10, 0.0]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)

    det_results = [[np.concatenate([det, scores[:, None]], -1)]]
    annotations = [dict(bboxes=gt, labels=np.zeros(2, np.int64),
                        bboxes_ignore=np.zeros((0, 5), np.float32),
                        labels_ignore=np.zeros((0,), np.int64))]
    mean_ap, res = ref.eval_rbbox_map(det_results, annotations, iou_thr=0.5,
                                      use_07_metric=False)
    per_image = [dict(det_boxes=det, det_scores=scores,
                      det_labels=np.zeros(2, np.int64), gt_boxes=gt,
                      gt_labels=np.zeros(2, np.int64))]
    ours = eval_map(per_image, num_classes=1, iou_thr=0.5, rotated=True,
                    mode="area")
    # sanity: the scene actually exercises the edge (det1 clears thr on B)
    from mtp_tpu.eval.det_map import np_rbox_iou
    ious = np_rbox_iou(det, gt)
    assert ious[1, 0] > ious[1, 1] >= 0.5
    np.testing.assert_allclose(ours["mAP"], mean_ap * 100, atol=1e-4)
