"""Per-component timing of the multitask detection path on one chip.

Decomposes the pretrain step's detector-side cost (measured: det knobs at
defaults cost ~1.76 s/step of the 2.27 s ViT-L 448 step) into independently
jitted pieces at the exact pretrain shapes (B=3 images, R=512 rcnn rois,
nms_pre=2000/level, reference Mask R-CNN geometry), each timed fwd and
fwd+bwd.  Directs kernel work at whatever actually dominates.

Run on the chip: `python tools/bench_extras/det_components.py`.
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

if os.environ.get("JAX_PLATFORMS"):
    # the axon sitecustomize force-registers the TPU backend; honor an
    # explicit platform request (e.g. cpu smoke runs) anyway
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp
import numpy as np

from mtp_tpu.heads.roi_heads import FCNMaskTrunk, Shared2FCTrunk
from mtp_tpu.heads.rpn import gen_proposals, RPNOut
from mtp_tpu.ops.anchors import AnchorGenerator
from mtp_tpu.ops.assign import max_iou_assign, random_sample
from mtp_tpu.ops.nms import nms
from mtp_tpu.ops.roi_align import (multilevel_roi_align,
                                   multilevel_roi_align_fused)

SIZE = int(os.environ.get("DC_SIZE", "448"))
B = int(os.environ.get("DC_B", "3"))
R = int(os.environ.get("DC_R", "512"))
ITERS = int(os.environ.get("DC_ITERS", "10"))
C = 256


def timeit(name, fn, *args):
    """Dedupe-proof chained timing: the relay DEDUPLICATES identical
    dispatches (PERF.md round 5), so each iteration mixes a seed scalar —
    chained through the previous iteration's checksum — into every float
    input leaf.  The seed buffer differs per dispatch (no dedupe) and the
    data dependency serializes iterations (honest per-iter latency).  The
    checksum sums ALL output leaves so XLA cannot DCE any branch."""
    try:
        @jax.jit
        def chained(seed, a):
            mixed = jax.tree.map(
                lambda t: t + (seed * 1e-12).astype(t.dtype)
                if jnp.issubdtype(jnp.asarray(t).dtype, jnp.inexact) else t,
                a)
            out = fn(*mixed)
            return sum(jnp.sum(l.astype(jnp.float32))
                       for l in jax.tree.leaves(out)) + seed * 0.5

        seed = chained(jnp.float32(1.0), args)  # compile + first run
        float(seed)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            seed = chained(seed, args)
        float(seed)
        dt = (time.perf_counter() - t0) / ITERS * 1000
        print(f"{name:44s} {dt:8.2f} ms", flush=True)
        return dt
    except Exception as e:  # HBM/compile limits: report, keep going
        print(f"{name:44s} FAILED {type(e).__name__}: "
              f"{str(e)[:120]}", flush=True)
        return float("nan")


def main():
    print(f"devices={jax.devices()} size={SIZE} B={B} R={R}", flush=True)
    rng = np.random.default_rng(0)
    strides = (4, 8, 16, 32)
    feats = [jnp.asarray(rng.standard_normal(
        (B, SIZE // s, SIZE // s, C)).astype(np.float32), jnp.bfloat16)
        for s in strides]
    Rtot = B * R
    x1 = rng.uniform(0, SIZE - 64, Rtot)
    y1 = rng.uniform(0, SIZE - 64, Rtot)
    sz = np.exp(rng.uniform(np.log(8), np.log(SIZE / 2), Rtot))
    rois = jnp.asarray(np.stack(
        [x1, y1, x1 + sz, y1 + sz], -1).astype(np.float32))
    bidx = jnp.asarray(np.repeat(np.arange(B), R).astype(np.int32))

    # ---- RoI extraction (atlas vs 4-level select), fwd and fwd+bwd ----
    @jax.jit
    def ex_atlas(fs):
        return multilevel_roi_align_fused(fs, rois, bidx, 7, strides)

    @jax.jit
    def ex_select(fs):
        return multilevel_roi_align(fs, rois, bidx, 7, strides)

    @jax.jit
    def ex_atlas_g(fs):
        return jax.grad(lambda f: (multilevel_roi_align_fused(
            f, rois, bidx, 7, strides).astype(jnp.float32) ** 2).sum())(fs)

    @jax.jit
    def ex_select_g(fs):
        return jax.grad(lambda f: (multilevel_roi_align(
            f, rois, bidx, 7, strides).astype(jnp.float32) ** 2).sum())(fs)

    timeit(f"roi_extract[atlas] fwd (R={Rtot}, 7x7)", ex_atlas, feats)
    timeit("roi_extract[atlas] fwd+bwd", ex_atlas_g, feats)
    if os.environ.get("DC_SELECT", "0") == "1":
        # standalone select-path compiles materialize the (R, H, W, C)
        # per-roi gather (9.9 GB at R=1536) — only runnable at small R
        timeit(f"roi_extract[select] fwd (R={Rtot}, 7x7)", ex_select, feats)
        timeit("roi_extract[select] fwd+bwd", ex_select_g, feats)

    # ---- mask-roi extraction at 14x14 ----
    @jax.jit
    def ex_atlas14_g(fs):
        return jax.grad(lambda f: (multilevel_roi_align_fused(
            f, rois, bidx, 14, strides).astype(jnp.float32) ** 2).sum())(fs)

    timeit("roi_extract[atlas] 14x14 fwd+bwd", ex_atlas14_g, feats)

    # ---- box trunk (Shared2FC) ----
    trunk = Shared2FCTrunk(1024, dtype=jnp.bfloat16)
    rf = jnp.asarray(rng.standard_normal(
        (Rtot, 7, 7, C)).astype(np.float32), jnp.bfloat16)
    tp = trunk.init(jax.random.PRNGKey(0), rf)

    @jax.jit
    def box_g(p, x):
        return jax.grad(lambda pp: (trunk.apply(
            pp, x).astype(jnp.float32) ** 2).sum())(p)

    timeit("box_trunk(2FC 12544->1024) fwd+bwd", box_g, tp, rf)

    # ---- mask trunk (4x conv3x3 on 14x14) ----
    mtr = FCNMaskTrunk(256, dtype=jnp.bfloat16)
    mf = jnp.asarray(rng.standard_normal(
        (Rtot, 14, 14, C)).astype(np.float32), jnp.bfloat16)
    mp = mtr.init(jax.random.PRNGKey(0), mf)

    @jax.jit
    def mask_g(p, x):
        return jax.grad(lambda pp: (mtr.apply(
            pp, x).astype(jnp.float32) ** 2).sum())(p)

    timeit("mask_trunk(4xconv3x3@14^2) fwd+bwd", mask_g, mp, mf)

    # ---- proposal generation (per-level topk + NMS) ----
    gen = AnchorGenerator(strides=(4, 8, 16, 32, 64), scales=(8,),
                          ratios=(0.5, 1.0, 2.0))
    sizes = [(SIZE // s, SIZE // s) for s in (4, 8, 16, 32, 64)]
    anchors = jnp.concatenate(gen.grid(sizes))
    lvl_sizes = [h * w * 3 for h, w in sizes]
    A = anchors.shape[0]
    scores = jnp.asarray(rng.standard_normal((B, A)).astype(np.float32))
    deltas = jnp.asarray(
        rng.standard_normal((B, A, 4)).astype(np.float32) * 0.1)

    @jax.jit
    def props(s, d):
        return gen_proposals(RPNOut(s, d), anchors, (SIZE, SIZE), 2000, 1000,
                             0.7, False, level_sizes=lvl_sizes)

    timeit(f"gen_proposals(A={A}, nms 6.7k->1000)", props, scores, deltas)

    # ---- rpn assign+sample over all anchors ----
    gt = jnp.asarray(rand_gt(rng, B), jnp.float32)

    @jax.jit
    def assign_sample(k):
        def one(gb, r):
            a = max_iou_assign(anchors, gb, jnp.ones(gb.shape[0], bool),
                               None, 0.7, 0.3, 0.3, True)
            return random_sample(a, r, 256, 0.5).inds
        return jax.vmap(one)(gt, jax.random.split(k, B))

    timeit(f"rpn assign+sample (A={A}, 256)", assign_sample,
           jax.random.PRNGKey(0))

    # ---- plain NMS at the pretrain candidate count ----
    nb = jnp.asarray(rand_gt(rng, 1, 6735)[0], jnp.float32)
    ns = jnp.asarray(rng.standard_normal(6735).astype(np.float32))

    @jax.jit
    def nms_only(b, s):
        return nms(b, s, 0.7, 1000)

    timeit("nms alone (N=6735 -> 1000)", nms_only, nb, ns)


def rand_gt(rng, B, n=24):
    xy = rng.uniform(0, SIZE - 80, (B, n, 2))
    wh = rng.uniform(8, 64, (B, n, 2))
    return np.concatenate([xy, xy + wh], -1).astype(np.float32)


if __name__ == "__main__":
    main()
