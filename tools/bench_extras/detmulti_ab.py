"""A/B: det_loss_multi concat-batched vs 3 sequential single-segment calls.

The multitask pretrainer batches the is/rd branches across the 3 datasets
(one det_loss_multi call over the concatenated batch) instead of three
det_loss_core calls.  This driver times both forms fwd+bwd at the exact
flagship shapes (448², 1 img/dataset, R=512, reference Mask R-CNN
geometry, real Shared2FC/FCNMask trunks) to attribute the full-step delta
(968 vs 542 ms) to the batching itself or elsewhere.

Run on the chip: `python tools/bench_extras/detmulti_ab.py`.
Env: DA_MASK=0 to drop the mask branch, DA_ROT=1 for the rotated variant.
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp
import numpy as np

from mtp_tpu.heads.roi_heads import FCNMaskTrunk, Shared2FCTrunk
from mtp_tpu.models.detector import DetConfig, oriented_rcnn_cfg
from mtp_tpu.ops.roi_align import multilevel_roi_align_fused
from mtp_tpu.tasks.detection import anchors_for, det_loss_core, det_loss_multi

SIZE = int(os.environ.get("DA_SIZE", "448"))
ITERS = int(os.environ.get("DA_ITERS", "8"))
WITH_MASK = os.environ.get("DA_MASK", "1") == "1"
ROT = os.environ.get("DA_ROT", "0") == "1"
G = 24
C = 256
STRIDES = (4, 8, 16, 32)


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name:52s} {dt:8.2f} ms", flush=True)
    return dt


def make_batch(rng, n, ncls):
    if ROT:
        gb = np.stack(
            [rng.uniform(64, SIZE - 64, (n, G)),
             rng.uniform(64, SIZE - 64, (n, G)),
             rng.uniform(24, 60, (n, G)), rng.uniform(12, 30, (n, G)),
             rng.uniform(-1.2, 1.2, (n, G))], -1).astype(np.float32)
    else:
        xy = rng.uniform(16, SIZE - 80, (n, G, 2))
        wh = rng.uniform(16, 64, (n, G, 2))
        gb = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    valid = np.zeros((n, G), bool)
    valid[:, :12] = True
    b = {"image": np.zeros((n, 8, 8, 3), np.float32),  # only shape[0] used
         "gt_boxes": gb,
         "gt_labels": rng.integers(0, ncls, (n, G)).astype(np.int32),
         "gt_valid": valid}
    if WITH_MASK and not ROT:
        b["gt_masks"] = (rng.uniform(
            size=(n, G, SIZE // 4, SIZE // 4)) > 0.5).astype(np.float32)
    return jax.tree.map(jnp.asarray, b)


def main():
    print(f"devices={jax.devices()} size={SIZE} rot={ROT} mask={WITH_MASK}",
          flush=True)
    rng = np.random.default_rng(0)
    import dataclasses
    if ROT:
        base = oriented_rcnn_cfg(20)
    else:
        base = DetConfig(num_classes=20)
    base = dataclasses.replace(base, with_mask=WITH_MASK and not ROT)
    dets = [dataclasses.replace(base, num_classes=k) for k in (18, 20, 37)]
    anchors = anchors_for(base, (SIZE, SIZE))
    A = anchors.shape[0]

    feats = [jnp.asarray(rng.standard_normal(
        (3, SIZE // s, SIZE // s, C)).astype(np.float32), jnp.bfloat16)
        for s in STRIDES]
    from mtp_tpu.heads.rpn import RPNOut
    scores = jnp.asarray(rng.standard_normal((3, A)).astype(np.float32))
    deltas = jnp.asarray(
        rng.standard_normal((3, A, base.rotated and 6 or 4)
                            ).astype(np.float32) * 0.1)
    rpn_all = RPNOut(scores, deltas)
    batches = [make_batch(rng, 1, d.num_classes) for d in dets]

    box_trunk = Shared2FCTrunk(1024, dtype=jnp.bfloat16)
    rf0 = jnp.zeros((8, 7, 7, C), jnp.bfloat16)
    bt_p = box_trunk.init(jax.random.PRNGKey(0), rf0)
    mask_trunk = FCNMaskTrunk(256, dtype=jnp.bfloat16)
    mt_p = mask_trunk.init(jax.random.PRNGKey(1), jnp.zeros(
        (8, 14, 14, C), jnp.bfloat16))
    r2 = np.random.default_rng(1)
    heads = []
    for d in dets:
        K = d.num_classes
        heads.append((
            jnp.asarray(r2.standard_normal((1024, K + 1)).astype(np.float32)
                        * 0.01, jnp.float32),
            jnp.asarray(r2.standard_normal(
                (1024, 5 if d.rotated else 4 * K)).astype(np.float32) * 0.01),
            jnp.asarray(r2.standard_normal((256, K)).astype(np.float32)
                        * 0.01)))

    def mk_box_fn(fs, params, hds):
        def fn(rois, bidx, segs):
            x = box_trunk.apply(params, multilevel_roi_align_fused(
                fs, rois, bidx, 7, STRIDES, rotated=base.rotated,
                clockwise=True))
            x = x.astype(jnp.float32)
            return [(x[s:e] @ hds[d][0], x[s:e] @ hds[d][1])
                    for d, (s, e) in enumerate(segs)]
        return fn

    def mk_mask_fn(fs, params, hds):
        def fn(rois, bidx, segs):
            x = mask_trunk.apply(params, multilevel_roi_align_fused(
                fs, rois, bidx, 14, STRIDES))
            x = x.astype(jnp.float32)
            return [jnp.einsum("rhwc,ck->rhwk", x[s:e], hds[d][2])
                    for d, (s, e) in enumerate(segs)]
        return fn

    key = jax.random.PRNGKey(7)

    # ---- concat-batched (det_loss_multi over 3 segments) ----
    def multi(fs, btp, mtp, hds, bts):
        bf = mk_box_fn(fs, btp, hds)
        mf = mk_mask_fn(fs, mtp, hds) if (WITH_MASK and not ROT) else None
        tot, _ = det_loss_multi(dets, anchors, (SIZE, SIZE), rpn_all,
                                bf, mf, bts, key)
        return tot

    @jax.jit
    def multi_g(fs, btp, mtp, hds, bts):
        return jax.grad(lambda f: multi(f, btp, mtp, hds, bts))(fs)

    # ---- 3 sequential single-segment calls (pre-rewrite structure) ----
    def seq(fs, btp, mtp, hds, bts):
        tot = 0.0
        keys = jax.random.split(key, 3)
        for d in range(3):
            fs_d = [f[d:d + 1] for f in fs]
            rpn_d = RPNOut(scores[d:d + 1], deltas[d:d + 1])
            bf1 = mk_box_fn(fs_d, btp, [hds[d]])
            bf = lambda rois, bidx: bf1(rois, bidx, [(0, rois.shape[0])])[0]
            if WITH_MASK and not ROT:
                mf1 = mk_mask_fn(fs_d, mtp, [hds[d]])
                mf = lambda rois, bidx: mf1(
                    rois, bidx, [(0, rois.shape[0])])[0]
            else:
                mf = None
            t, _ = det_loss_core(dets[d], anchors, (SIZE, SIZE), rpn_d,
                                 bf, mf, bts[d], keys[d])
            tot = tot + t
        return tot

    @jax.jit
    def seq_g(fs, btp, mtp, hds, bts):
        return jax.grad(lambda f: seq(f, btp, mtp, hds, bts))(fs)

    tag = "rd" if ROT else ("is+mask" if WITH_MASK else "is")
    timeit(f"[{tag}] concat det_loss_multi fwd+bwd", multi_g,
           feats, bt_p, mt_p, heads, batches)
    timeit(f"[{tag}] 3x sequential det_loss_core fwd+bwd", seq_g,
           feats, bt_p, mt_p, heads, batches)


if __name__ == "__main__":
    main()
