"""Stagewise decomposition of gen_proposals on the chip.

top_k measured at 1.5 ms, NMS-alone at 7.9 ms, yet the full
gen_proposals costs 235 ms at B=3 — find the missing 220 ms.
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp
import numpy as np

from mtp_tpu.heads.rpn import RPNOut, gen_proposals
from mtp_tpu.ops.anchors import AnchorGenerator
from mtp_tpu.ops.boxes import delta_decode
from mtp_tpu.ops.nms import nms

SIZE = int(os.environ.get("GP_SIZE", "448"))
B = int(os.environ.get("GP_B", "3"))
ITERS = int(os.environ.get("GP_ITERS", "10"))


def timeit(name, fn, *args):
    """Dedupe-proof chained timing (see det_components.timeit): the relay
    deduplicates identical dispatches, so chain a seed scalar through every
    iteration's inputs and checksum ALL output leaves."""
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

        seed = chained(jnp.float32(1.0), args)
        float(seed)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            seed = chained(seed, args)
        float(seed)
        dt = (time.perf_counter() - t0) / ITERS * 1000
        print(f"{name:44s} {dt:8.2f} ms", flush=True)
    except Exception as e:
        print(f"{name:44s} FAILED {type(e).__name__}: {str(e)[:100]}",
              flush=True)


def main():
    print(f"devices={jax.devices()} size={SIZE} B={B}", flush=True)
    rng = np.random.default_rng(0)
    gen = AnchorGenerator()
    sizes = [(SIZE // s, SIZE // s) for s in (4, 8, 16, 32, 64)]
    anchors = jnp.asarray(gen.grid_flat(sizes))
    lvl_sizes = [h * w * 3 for h, w in sizes]
    A = anchors.shape[0]
    scores = jnp.asarray(rng.standard_normal((B, A)).astype(np.float32))
    deltas = jnp.asarray(
        rng.standard_normal((B, A, 4)).astype(np.float32) * 0.1)
    K = sum(min(2000, s) for s in lvl_sizes)

    def topk_one(s):
        tops, idxs, off = [], [], 0
        for sz in lvl_sizes:
            v, i = jax.lax.top_k(
                jax.lax.dynamic_slice_in_dim(s, off, sz, 0), min(2000, sz))
            tops.append(v)
            idxs.append(i + off)
            off += sz
        return jnp.concatenate(tops), jnp.concatenate(idxs)

    @jax.jit
    def stage_topk(s):
        return jax.vmap(topk_one)(s)

    @jax.jit
    def stage_topk_gather(s, d):
        def one(sc, de):
            ts, idx = topk_one(sc)
            return ts, anchors[idx], de[idx]
        return jax.vmap(one)(s, d)

    @jax.jit
    def stage_decode(s, d):
        def one(sc, de):
            ts, idx = topk_one(sc)
            a = anchors[idx]
            dd = de[idx]
            return delta_decode(a, dd, max_shape=(SIZE, SIZE)), ts
        return jax.vmap(one)(s, d)

    @jax.jit
    def stage_full(s, d):
        return gen_proposals(RPNOut(s, d), anchors, (SIZE, SIZE), 2000, 1000,
                             0.7, False, level_sizes=lvl_sizes)

    @jax.jit
    def stage_nms_vmap(b, sc):
        return jax.vmap(lambda bb, ss: nms(bb, ss, 0.7, 1000))(b, sc)

    from mtp_tpu.ops.nms import nms_batched

    @jax.jit
    def stage_nms_batched(b, sc):
        return nms_batched(b, sc, 0.7, 1000)

    timeit(f"per-level topk (A={A})", stage_topk, scores)
    timeit("topk + anchor/delta gathers", stage_topk_gather, scores, deltas)
    timeit("topk + gathers + decode", stage_decode, scores, deltas)
    timeit("FULL gen_proposals", stage_full, scores, deltas)

    boxes = jnp.asarray(rng.uniform(0, SIZE, (B, K, 4)).astype(np.float32))
    bs = jnp.asarray(rng.standard_normal((B, K)).astype(np.float32))
    timeit(f"nms_batched B={B} (N={K})", stage_nms_batched, boxes, bs)
    if os.environ.get("GP_VMAP", "0") == "1":
        timeit(f"nms vmap B={B} (N={K})", stage_nms_vmap, boxes, bs)
    timeit("nms B=1 (N=%d)" % K,
           jax.jit(lambda b, s: nms(b, s, 0.7, 1000)), boxes[0], bs[0])


if __name__ == "__main__":
    main()
