"""Pallas TPU kernel: DCNv3 sampling as a masked one-hot matmul.

The DCNv3 core (spec: reference `dcnv3_core_pytorch`,
ops_dcnv3/functions/dcnv3_func.py:174-240) is, per (image, group),

    out[p, c] = sum_k m[p, k] * bilinear(img, loc[p, k])[c]

The jnp path (`ops/dcnv3.py`) lowers this to XLA gathers, which issue
gc=16-channel (32-byte) HBM rows — ~90% of every HBM transaction is wasted,
and the backward adds a 10M-update 16-lane scatter (measured: stage-0 of
InternImage-XL spends 132 ms/layer forward, PERF.md round 3).

TPUs have no vector gather; the native formulation is a CONTRACTION.  Each
bilinear sample is a rank-1 hat-product row over the flattened feature map:

    out[p, c] = sum_q A[p, q] * img[q, c]
    A[p, q]   = sum_k m[p,k] * hat(py[p,k] - qy(q)) * hat(px[p,k] - qx(q))

with hat(d) = max(0, 1 - |d|), q = qy*W + qx.  A row has <= 4*K*K nonzeros
but is built DENSE in VMEM per (Tp pixels) tile — hats are two broadcast
compares on the VPU — then contracted with the VMEM-resident group image on
the MXU.  A never exists in HBM; there are no gathers and no scatters:

    forward : out  = A @ img                      (MXU)
    backward: dimg = A^T @ g        (accumulated over pixel tiles, MXU)
              dA   = g @ img^T                    (MXU)
              dm   = sum_q dA * hy * hx           (VPU row-reduce)
              dpy  = m * sum_q dA * hx * hat'(dy) (hat'(d) = -sign(d)*1{|d|<1})
              dpx  = m * sum_q dA * hy * hat'(dx)

Zero-padding semantics come for free: hats vanish outside [0, H-1]x[0, W-1],
exactly grid_sample(padding_mode="zeros") on the conceptually padded map.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mtp_tpu.ops.pallas_attn import _force_interpret, _round_up  # noqa: F401

Array = jax.Array

_TP = 128  # output pixels per grid cell (one full MXU row tile)


def _hats(pyk, pxk, qy, qx):
    hy = jnp.maximum(1.0 - jnp.abs(pyk - qy), 0.0)   # (Tp, HWq)
    hx = jnp.maximum(1.0 - jnp.abs(pxk - qx), 0.0)
    return hy, hx


def _build_a(py, px, m, qy, qx, P: int):
    a = None
    for k in range(P):
        hy, hx = _hats(py[:, k:k + 1], px[:, k:k + 1], qy, qx)
        t = (m[:, k:k + 1] * hy) * hx
        a = t if a is None else a + t
    return a  # (Tp, HWq) f32


# f32 operands at DEFAULT precision take the single-pass bf16 MXU path —
# HIGHEST keeps the f32 (test/parity) path f32-exact.  bf16 operands multiply
# exactly on the MXU already; there HIGHEST is at best a no-op (and suspected
# of tripping the Mosaic compiler), so only request it for f32.
_EXACT = jax.lax.Precision.HIGHEST


def _prec(dtype):
    return _EXACT if dtype == jnp.float32 else None


# Chunked A build: the flat q-range is split into STATIC column chunks; a
# per-tile scalar overlap test (derived from min/max sampled row — DCNv3
# offsets are near-local in practice, zero-init regressors) skips every chunk
# the tile cannot touch.  All coordinates, slices and writes are static, so
# the predicate is the ONLY data-dependent thing; the result is exact for
# arbitrary offsets (a far offset just activates more chunks, degrading
# gracefully to the dense cost), temporaries never exceed (Tp, CH) in VMEM
# (a dense (Tp, H·W) build at detection-scale maps — 256² stage 0 = 65k
# columns — would spill), and Mosaic sees no dynamic slicing.  Measured at
# XL stage 0 (56², bs8): fwd 28.6 → 15.2 ms, fwd+bwd 128 → 42 ms at
# realistic offset spread (std 0.5), 30/108 ms worst-case (std 30).
_MIN_CH = 512
# Mosaic does NOT reuse stack slots across unrolled pl.when bodies — each
# chunk's ~0.8 MB of (Tp, CH) temporaries gets its own allocation (measured:
# 7 chunks fine, 16-25 chunks = 17-20 MB scoped-VMEM OOM at the 448² pretrain
# shapes).  Small maps therefore unroll (static coords/slices, fastest);
# large maps run ONE shared fori_loop body over row-aligned chunks, where the
# only dynamic pieces are the chunk's row offset (a scalar add to static
# local coordinates — no vector division) and an 8-aligned sublane slice.
_UNROLL_MAX = 7


def _chunk_cols(HW: int) -> int:
    return min(_MIN_CH, _round_up(HW, 128))


def _chunk_coords(lo: int, CH: int, HW: int, W: int):
    """Static qy/qx for flat columns [lo, lo+CH); padded columns pushed far
    away so every hat evaluates to zero there."""
    q = jax.lax.broadcasted_iota(jnp.int32, (1, CH), 1) + lo
    qy = jnp.where(q < HW, (q // W), -(2 ** 20)).astype(jnp.float32)
    qx = jnp.where(q < HW, (q % W), -(2 ** 20)).astype(jnp.float32)
    return qy, qx


def _tile_col_range(py, W: int):
    """Flat-column interval containing every nonzero hat of this tile: rows
    with |py - qy| < 1 lie in [floor(min py)-1, floor(max py)+1]."""
    rlo = jnp.floor(jnp.min(py)).astype(jnp.int32) - 1
    rhi = jnp.floor(jnp.max(py)).astype(jnp.int32) + 1
    return rlo * W, (rhi + 1) * W


def _fori_coords(c, CH: int, rpc: int, HW: int, W: int):
    """Chunk coords for the fori path: static local grid + a scalar row
    offset — no dynamic vector division."""
    qi = jax.lax.broadcasted_iota(jnp.int32, (1, CH), 1)
    valid = qi + c * CH < HW
    far = jnp.float32(-(2 ** 20))
    qy = jnp.where(valid, (qi // W).astype(jnp.float32)
                   + (c * rpc).astype(jnp.float32), far)
    qx = jnp.where(valid, (qi % W).astype(jnp.float32), far)
    return qy, qx


def _packed_coords(c, j: int, CH: int, rpc: int, HW: int, W: int):
    """Coords of lane-phase j of a packed chunk: flat columns
    q = c·CH + 8·i + j for i < CH/8.  Static per-j local grid + the scalar
    chunk-row offset (CH = rpc·W keeps chunks row-aligned)."""
    CH8 = CH // 8
    qi = jax.lax.broadcasted_iota(jnp.int32, (1, CH8), 1) * 8 + j
    valid = qi + c * CH < HW
    far = jnp.float32(-(2 ** 20))
    qy = jnp.where(valid, (qi // W).astype(jnp.float32)
                   + (c * rpc).astype(jnp.float32), far)
    qx = jnp.where(valid, (qi % W).astype(jnp.float32), far)
    return qy, qx


def _chunk_span(qlo, qhi, CH: int, NC: int):
    clo = jnp.clip(qlo // CH, 0, NC - 1)
    chi = jnp.clip((qhi - 1) // CH, 0, NC - 1)
    return clo, chi + 1


def _fwd_kernel(py_ref, px_ref, m_ref, img_ref, o_ref, acc_ref,
                *, P, W, HW, CH, rpc, packed):
    py, px, m = py_ref[0], px_ref[0], m_ref[0]
    qlo, qhi = _tile_col_range(py, W)
    acc_ref[:] = jnp.zeros_like(acc_ref)

    def accumulate(qy, qx, img_c):
        a = _build_a(py, px, m, qy, qx, P)
        acc_ref[:] += jax.lax.dot_general(
            a.astype(img_c.dtype), img_c,
            (((1,), (0,)), ((), ())), precision=_prec(img_c.dtype),
            preferred_element_type=jnp.float32)

    if rpc is None:  # unrolled: static coords and slices per chunk
        img = img_ref[0]                           # (HWq, gc)
        for c in range(img.shape[0] // CH):
            lo = c * CH

            @pl.when((qlo < lo + CH) & (qhi > lo))
            def _(lo=lo):
                qy, qx = _chunk_coords(lo, CH, HW, W)
                accumulate(qy, qx, img[lo:lo + CH])
    elif not packed:  # fori over row-aligned chunks, map VMEM-resident
        NC = img_ref.shape[1] // CH

        def body(c, carry):
            lo = pl.multiple_of(c * CH, 8)
            qy, qx = _fori_coords(c, CH, rpc, HW, W)
            accumulate(qy, qx, img_ref[0, pl.ds(lo, CH), :])
            return carry

        clo, cend = _chunk_span(qlo, qhi, CH, NC)
        jax.lax.fori_loop(clo, cend, body, 0)
    else:
        # fori over the lane-PACKED map (HWq//8, 8·gc): no ×8 lane padding,
        # so even 256² detection maps fit the VMEM block.  Mosaic cannot
        # reshape the packed chunk back (lane→sublane relayout crashes the
        # compiler), so A is built per lane-phase j against the static
        # j-subset coordinates and contracted with a static lane slice —
        # eight small builds/dots, same total work, nothing but proven
        # constructs
        gc = o_ref.shape[-1]
        CH8 = CH // 8
        NC = img_ref.shape[1] * 8 // CH

        def body(c, carry):
            lo8 = pl.multiple_of(c * CH8, 8)
            blk = img_ref[0, pl.ds(lo8, CH8), :]   # (CH8, 8·gc)
            for j in range(8):
                qy, qx = _packed_coords(c, j, CH, rpc, HW, W)
                accumulate(qy, qx, blk[:, j * gc:(j + 1) * gc])
            return carry

        clo, cend = _chunk_span(qlo, qhi, CH, NC)
        jax.lax.fori_loop(clo, cend, body, 0)

    o_ref[0] = acc_ref[:].astype(o_ref.dtype)


def _coord_grads(py, px, m, da, qy, qx, P):
    """Per-chunk gradient body: rebuilds hats once and returns (A_chunk,
    dmask, dpy, dpx) given dA = g @ img_chunk^T."""
    a = None
    dms, dpys, dpxs = [], [], []
    for k in range(P):
        pyk, pxk, mk = py[:, k:k + 1], px[:, k:k + 1], m[:, k:k + 1]
        dy = pyk - qy
        dx = pxk - qx
        hy = jnp.maximum(1.0 - jnp.abs(dy), 0.0)
        hx = jnp.maximum(1.0 - jnp.abs(dx), 0.0)
        t = (mk * hy) * hx
        a = t if a is None else a + t
        # hat'(d) with the grid_sample floor/frac subgradient rule:
        # d(sample)/dp = x[floor(p)+1] - x[floor(p)] → -1 on d ∈ [0,1),
        # +1 on d ∈ [-1,0) (closed at 0 and -1, open at 1)
        dhy = jnp.where((dy >= -1.0) & (dy < 1.0),
                        jnp.where(dy >= 0.0, -1.0, 1.0), 0.0)
        dhx = jnp.where((dx >= -1.0) & (dx < 1.0),
                        jnp.where(dx >= 0.0, -1.0, 1.0), 0.0)
        dahx = da * hx
        dms.append(jnp.sum(dahx * hy, axis=1, keepdims=True))
        dpys.append(mk * jnp.sum(dahx * dhy, axis=1, keepdims=True))
        dpxs.append(mk * jnp.sum((da * hy) * dhx, axis=1, keepdims=True))
    return (a, jnp.concatenate(dms, axis=1), jnp.concatenate(dpys, axis=1),
            jnp.concatenate(dpxs, axis=1))


def _bwd_kernel(py_ref, px_ref, m_ref, img_ref, g_ref,
                dimg_ref, dpy_ref, dpx_ref, dm_ref,
                dpy_acc, dpx_acc, dm_acc, *, P, W, HW, CH):
    """Fused backward: per active chunk one hat build per tap feeds both the
    dimg contraction (A^T @ g) and the dmask/doffset row-reductions over
    dA = g @ img^T.  Holds the img block AND the dimg block in VMEM — only
    used when both fit (see _sample_bwd)."""
    img = img_ref[0]                               # (HWq, gc)
    g = g_ref[0]                                   # (Tp, gc)
    py, px, m = py_ref[0], px_ref[0], m_ref[0]
    qlo, qhi = _tile_col_range(py, W)

    @pl.when(pl.program_id(1) == 0)
    def _():
        dimg_ref[0] = jnp.zeros_like(dimg_ref[0])

    for ref in (dpy_acc, dpx_acc, dm_acc):
        ref[:] = jnp.zeros_like(ref)

    for c in range(img.shape[0] // CH):
        lo = c * CH

        @pl.when((qlo < lo + CH) & (qhi > lo))
        def _(lo=lo):
            img_c = img[lo:lo + CH]
            # bf16 operands multiply exactly on the MXU with f32 accumulate;
            # f32 operands need HIGHEST (see _prec)
            da = jax.lax.dot_general(              # g @ img_c^T → (Tp, CH)
                g, img_c, (((1,), (1,)), ((), ())),
                precision=_prec(img.dtype),
                preferred_element_type=jnp.float32)
            qy, qx = _chunk_coords(lo, CH, HW, W)
            a, dm_c, dpy_c, dpx_c = _coord_grads(py, px, m, da, qy, qx, P)
            dm_acc[:] += dm_c
            dpy_acc[:] += dpy_c
            dpx_acc[:] += dpx_c
            dimg_ref[0, lo:lo + CH, :] += jax.lax.dot_general(
                a.astype(g.dtype), g, (((0,), (0,)), ((), ())),
                precision=_prec(g.dtype), preferred_element_type=jnp.float32)

    dm_ref[0] = dm_acc[:]
    dpy_ref[0] = dpy_acc[:]
    dpx_ref[0] = dpx_acc[:]


def _bwd_img_kernel(py_ref, px_ref, m_ref, g_ref, dimg_ref,
                    *, P, W, HW, CH, rpc, packed):
    """dimg half of the split backward (fori path): no img block needed —
    only g and the rebuilt A chunk.  In packed mode dimg accumulates in the
    lane-packed layout (HWq//8, 8·gc) per lane-phase; the driver unpacks."""
    g = g_ref[0]
    gc = g.shape[-1]
    py, px, m = py_ref[0], px_ref[0], m_ref[0]
    qlo, qhi = _tile_col_range(py, W)

    @pl.when(pl.program_id(1) == 0)
    def _():
        dimg_ref[0] = jnp.zeros_like(dimg_ref[0])

    def contrib(a):
        return jax.lax.dot_general(                # A^T @ g
            a.astype(g.dtype), g, (((0,), (0,)), ((), ())),
            precision=_prec(g.dtype), preferred_element_type=jnp.float32)

    if not packed:
        NC = dimg_ref.shape[1] // CH

        def body(c, carry):
            lo = pl.multiple_of(c * CH, 8)
            qy, qx = _fori_coords(c, CH, rpc, HW, W)
            a = _build_a(py, px, m, qy, qx, P)
            dimg_ref[0, pl.ds(lo, CH), :] += contrib(a)
            return carry
    else:
        CH8 = CH // 8
        NC = dimg_ref.shape[1] * 8 // CH

        def body(c, carry):
            lo8 = pl.multiple_of(c * CH8, 8)
            for j in range(8):
                qy, qx = _packed_coords(c, j, CH, rpc, HW, W)
                a = _build_a(py, px, m, qy, qx, P)
                dimg_ref[0, pl.ds(lo8, CH8),
                         j * gc:(j + 1) * gc] += contrib(a)
            return carry

    clo, cend = _chunk_span(qlo, qhi, CH, NC)
    jax.lax.fori_loop(clo, cend, body, 0)


def _bwd_coord_kernel(py_ref, px_ref, m_ref, img_ref, g_ref,
                      dpy_ref, dpx_ref, dm_ref,
                      dpy_acc, dpx_acc, dm_acc,
                      *, P, W, HW, CH, rpc, packed):
    """dmask/doffset half of the split backward (fori path)."""
    g = g_ref[0]
    gc = g.shape[-1]
    py, px, m = py_ref[0], px_ref[0], m_ref[0]
    qlo, qhi = _tile_col_range(py, W)

    for ref in (dpy_acc, dpx_acc, dm_acc):
        ref[:] = jnp.zeros_like(ref)

    def reduce(qy, qx, img_c):
        da = jax.lax.dot_general(
            g, img_c, (((1,), (1,)), ((), ())),
            precision=_prec(img_c.dtype), preferred_element_type=jnp.float32)
        _, dm_c, dpy_c, dpx_c = _coord_grads(py, px, m, da, qy, qx, P)
        dm_acc[:] += dm_c
        dpy_acc[:] += dpy_c
        dpx_acc[:] += dpx_c

    if not packed:
        NC = img_ref.shape[1] // CH

        def body(c, carry):
            lo = pl.multiple_of(c * CH, 8)
            qy, qx = _fori_coords(c, CH, rpc, HW, W)
            reduce(qy, qx, img_ref[0, pl.ds(lo, CH), :])
            return carry
    else:
        CH8 = CH // 8
        NC = img_ref.shape[1] * 8 // CH

        def body(c, carry):
            lo8 = pl.multiple_of(c * CH8, 8)
            blk = img_ref[0, pl.ds(lo8, CH8), :]
            for j in range(8):
                qy, qx = _packed_coords(c, j, CH, rpc, HW, W)
                reduce(qy, qx, blk[:, j * gc:(j + 1) * gc])
            return carry

    clo, cend = _chunk_span(qlo, qhi, CH, NC)
    jax.lax.fori_loop(clo, cend, body, 0)

    dm_ref[0] = dm_acc[:]
    dpy_ref[0] = dpy_acc[:]
    dpx_ref[0] = dpx_acc[:]


def _pad_inputs(img, py, px, m, CH):
    BG, HW, gc = img.shape
    _, HWo, P = py.shape
    HWq = _round_up(HW, CH)
    Tp = min(_TP, _round_up(HWo, 8))
    HWo_p = _round_up(HWo, Tp)
    pad2 = lambda t, n: jnp.pad(t, ((0, 0), (0, n - t.shape[1]), (0, 0)))
    # py/px pad by edge-replication (in-range coordinates) so the final
    # partial tile's _tile_col_range stays tight — zero-filled rows would
    # stretch every min/max window to row -1 and defeat the chunk skip
    # (masks m still zero-pad: padded rows contribute nothing)
    pad2e = lambda t, n: jnp.pad(t, ((0, 0), (0, n - t.shape[1]), (0, 0)),
                                 mode="edge")
    return (pad2(img, HWq), pad2e(py.astype(jnp.float32), HWo_p),
            pad2e(px.astype(jnp.float32), HWo_p),
            pad2(m.astype(jnp.float32), HWo_p), Tp, HWo_p // Tp)


def _specs(Tp, P, map_rows, map_cols, gc):
    """tile: per-(bg, pt) coordinate block; full: the whole (possibly
    lane-packed) map for one bg; out: per-tile output rows."""
    tile = pl.BlockSpec((1, Tp, P), lambda bg, pt: (bg, pt, 0),
                        memory_space=pltpu.VMEM)
    full = pl.BlockSpec((1, map_rows, map_cols), lambda bg, pt: (bg, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.BlockSpec((1, Tp, gc), lambda bg, pt: (bg, pt, 0),
                       memory_space=pltpu.VMEM)
    return tile, full, out


# above this many flat columns the unpacked VMEM map/dimg blocks (lane-padded
# ×8 at gc=16) stop fitting even with the split backward — switch to the
# lane-packed per-phase tier
_PALLAS_MAX_HW = 20000


def _chunk_rows(W: int, min_ch: int):
    """Row-aligned chunk width: rpc rows such that rpc·W is sublane(8)-
    aligned and ≥ ~min_ch columns."""
    step = 8 // np.gcd(W, 8)
    rpc = -(-max(1, min_ch // W) // step) * step
    return rpc * W, rpc


def _plan(HW: int, W: int):
    """(CH, rpc, Wk, packed): unrolled static chunks (rpc None) for small
    maps; fori over row-aligned chunks for mid-size ones (stack-slot reuse);
    above _PALLAS_MAX_HW additionally lane-PACK the map (no ×8 lane padding
    → detection-scale blocks fit VMEM), with the width padded to Wk =
    ceil64(W) so packed chunk starts stay sublane-aligned, and CH ≥ 1024 so
    each lane-phase works on ≥128 lanes."""
    CH = _chunk_cols(HW)
    if -(-HW // CH) <= _UNROLL_MAX:
        return CH, None, W, False
    if HW <= _PALLAS_MAX_HW:
        CH, rpc = _chunk_rows(W, _MIN_CH)
        return CH, rpc, W, False
    Wk = _round_up(W, 64)
    rpc = max(1, -(-1024 // Wk))
    return rpc * Wk, rpc, Wk, True


def _prep_fori(img, W, Wk, CH):
    """Pad the map width to Wk and lane-pack: (BG, H·W, gc) →
    (BG, H·Wk/8, 8·gc).  Samples landing in the padded columns hit zero
    pixels — exactly the grid_sample zero-padding semantics."""
    BG, HW, gc = img.shape
    H_ = HW // W
    if Wk != W:
        img = jnp.pad(img.reshape(BG, H_, W, gc),
                      ((0, 0), (0, 0), (0, Wk - W), (0, 0)))
        img = img.reshape(BG, H_ * Wk, gc)
    HWk = H_ * Wk
    HWq = _round_up(HWk, CH)
    img = jnp.pad(img, ((0, 0), (0, HWq - HWk), (0, 0)))
    return img.reshape(BG, HWq // 8, 8 * gc), HWk, HWq


# ---------------------------------------------------------------------------
# bg-packed tier for TINY maps (round-4, VERDICT r3 item 6): the 14²/7²
# InternImage stages cost ~10 ms/layer at grid=(BG≈768, PT) REGARDLESS of
# work — pure per-cell overhead.  This tier folds Gp (image, group) pairs
# into one grid cell: coords/outputs laid out (BG/Gp, PT, Gp·Tp, ·), the
# map (BG/Gp, Gp·HWq, gc), and ONE fori body loops j∈[0,Gp) with 8-aligned
# sublane `pl.ds` slices (stack slots reused — the Mosaic-safe construct
# set).  qy/qx are built once per cell: every bg shares the full-map column
# space (HWq ≤ 512 = one chunk, so no locality skip is lost).
# ---------------------------------------------------------------------------

_BGPACK_MAX_HWQ = 512


def _bg_pack(BG: int, HW: int) -> int:
    import os
    if os.environ.get("MTP_DCN_NO_BGPACK"):
        return 1
    if _round_up(HW, 128) > _BGPACK_MAX_HWQ:
        return 1
    for gp in (8, 4, 2):
        if BG % gp == 0 and BG // gp >= 8:
            return gp
    return 1


def _fwd_kernel_bgpack(py_ref, px_ref, m_ref, img_ref, o_ref,
                       *, P, W, HW, Gp, Tp, HWq):
    qy, qx = _chunk_coords(0, HWq, HW, W)

    def body(j, carry):
        ro = pl.multiple_of(j * Tp, 8)
        io = pl.multiple_of(j * HWq, 8)
        py = py_ref[0, 0, pl.ds(ro, Tp)]
        px = px_ref[0, 0, pl.ds(ro, Tp)]
        m = m_ref[0, 0, pl.ds(ro, Tp)]
        img_j = img_ref[0, pl.ds(io, HWq)]
        a = _build_a(py, px, m, qy, qx, P)
        o_ref[0, 0, pl.ds(ro, Tp)] = jax.lax.dot_general(
            a.astype(img_j.dtype), img_j, (((1,), (0,)), ((), ())),
            precision=_prec(img_j.dtype),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, Gp, body, 0)


def _bwd_kernel_bgpack(py_ref, px_ref, m_ref, img_ref, g_ref,
                       dimg_ref, dpy_ref, dpx_ref, dm_ref,
                       *, P, W, HW, Gp, Tp, HWq):
    qy, qx = _chunk_coords(0, HWq, HW, W)

    @pl.when(pl.program_id(1) == 0)
    def _():
        dimg_ref[0] = jnp.zeros_like(dimg_ref[0])

    def body(j, carry):
        ro = pl.multiple_of(j * Tp, 8)
        io = pl.multiple_of(j * HWq, 8)
        py = py_ref[0, 0, pl.ds(ro, Tp)]
        px = px_ref[0, 0, pl.ds(ro, Tp)]
        m = m_ref[0, 0, pl.ds(ro, Tp)]
        g = g_ref[0, 0, pl.ds(ro, Tp)]
        img_j = img_ref[0, pl.ds(io, HWq)]
        da = jax.lax.dot_general(g, img_j, (((1,), (1,)), ((), ())),
                                 precision=_prec(img_j.dtype),
                                 preferred_element_type=jnp.float32)
        a, dm_c, dpy_c, dpx_c = _coord_grads(py, px, m, da, qy, qx, P)
        dm_ref[0, 0, pl.ds(ro, Tp)] = dm_c
        dpy_ref[0, 0, pl.ds(ro, Tp)] = dpy_c
        dpx_ref[0, 0, pl.ds(ro, Tp)] = dpx_c
        dimg_ref[0, pl.ds(io, HWq)] += jax.lax.dot_general(
            a.astype(g.dtype), g, (((0,), (0,)), ((), ())),
            precision=_prec(g.dtype), preferred_element_type=jnp.float32)
        return carry

    jax.lax.fori_loop(0, Gp, body, 0)


def _bgpack_layout(t, Gp, PT, Tp):
    """(BG, PT·Tp, D) → (BG/Gp, PT, Gp·Tp, D)."""
    BG, _, D = t.shape
    return t.reshape(BG // Gp, Gp, PT, Tp, D).transpose(0, 2, 1, 3, 4) \
        .reshape(BG // Gp, PT, Gp * Tp, D)


def _bgpack_unlayout(t, Gp, PT, Tp):
    BGp, _, _, D = t.shape
    return t.reshape(BGp, PT, Gp, Tp, D).transpose(0, 2, 1, 3, 4) \
        .reshape(BGp * Gp, PT * Tp, D)


def _bgpack_specs(Gp, PT, Tp, P, HWq, gc):
    tile = pl.BlockSpec((1, 1, Gp * Tp, P), lambda b, pt: (b, pt, 0, 0),
                        memory_space=pltpu.VMEM)
    img = pl.BlockSpec((1, Gp * HWq, gc), lambda b, pt: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    out = pl.BlockSpec((1, 1, Gp * Tp, gc), lambda b, pt: (b, pt, 0, 0),
                       memory_space=pltpu.VMEM)
    return tile, img, out


def _bgpack_prep(img, py, px, m, Gp):
    BG, HW, gc = img.shape
    _, HWo, P = py.shape
    HWq = _round_up(HW, 128)
    Tp = min(_TP, _round_up(HWo, 8))
    HWo_p = _round_up(HWo, Tp)
    PT = HWo_p // Tp
    imgp = jnp.pad(img, ((0, 0), (0, HWq - HW), (0, 0))) \
        .reshape(BG // Gp, Gp * HWq, gc)
    pad2 = lambda t: jnp.pad(t, ((0, 0), (0, HWo_p - HWo), (0, 0)))
    pad2e = lambda t: jnp.pad(t.astype(jnp.float32),
                              ((0, 0), (0, HWo_p - HWo), (0, 0)), mode="edge")
    pyp = _bgpack_layout(pad2e(py), Gp, PT, Tp)
    pxp = _bgpack_layout(pad2e(px), Gp, PT, Tp)
    mp = _bgpack_layout(pad2(m.astype(jnp.float32)), Gp, PT, Tp)
    return imgp, pyp, pxp, mp, HWq, Tp, PT


def _forward_bgpack(img, py, px, m, H, W, Gp, interpret):
    BG, HW, gc = img.shape
    _, HWo, P = py.shape
    imgp, pyp, pxp, mp, HWq, Tp, PT = _bgpack_prep(img, py, px, m, Gp)
    tile, full, out = _bgpack_specs(Gp, PT, Tp, P, HWq, gc)
    o = pl.pallas_call(
        functools.partial(_fwd_kernel_bgpack, P=P, W=W, HW=HW, Gp=Gp,
                          Tp=Tp, HWq=HWq),
        out_shape=jax.ShapeDtypeStruct((BG // Gp, PT, Gp * Tp, gc),
                                       img.dtype),
        grid=(BG // Gp, PT),
        in_specs=[tile, tile, tile, full],
        out_specs=out,
        interpret=interpret or _force_interpret(),
    )(pyp, pxp, mp, imgp)
    return _bgpack_unlayout(o, Gp, PT, Tp)[:, :HWo]


def _backward_bgpack(img, py, px, m, g, H, W, Gp, interpret):
    BG, HW, gc = img.shape
    _, HWo, P = py.shape
    imgp, pyp, pxp, mp, HWq, Tp, PT = _bgpack_prep(img, py, px, m, Gp)
    gp = _bgpack_layout(
        jnp.pad(g, ((0, 0), (0, PT * Tp - HWo), (0, 0))), Gp, PT, Tp)
    tile, full, _ = _bgpack_specs(Gp, PT, Tp, P, HWq, gc)
    gtile = pl.BlockSpec((1, 1, Gp * Tp, gc), lambda b, pt: (b, pt, 0, 0),
                         memory_space=pltpu.VMEM)
    coord = jax.ShapeDtypeStruct((BG // Gp, PT, Gp * Tp, P), jnp.float32)
    dimg, dpy, dpx, dm = pl.pallas_call(
        functools.partial(_bwd_kernel_bgpack, P=P, W=W, HW=HW, Gp=Gp,
                          Tp=Tp, HWq=HWq),
        out_shape=[jax.ShapeDtypeStruct((BG // Gp, Gp * HWq, gc),
                                        jnp.float32), coord, coord, coord],
        grid=(BG // Gp, PT),
        in_specs=[tile, tile, tile, full, gtile],
        out_specs=[full, tile, tile, tile],
        interpret=interpret or _force_interpret(),
    )(pyp, pxp, mp, imgp, gp)
    dimg = dimg.reshape(BG, HWq, gc)[:, :HW]
    unl = lambda t, ref: _bgpack_unlayout(t, Gp, PT, Tp)[:, :HWo] \
        .astype(ref.dtype)
    return (dimg.astype(img.dtype), unl(dpy, py), unl(dpx, px), unl(dm, m))


def _forward(img, py, px, m, H, W, interpret):
    BG, HW, gc = img.shape
    _, HWo, P = py.shape
    Gp = _bg_pack(BG, HW)
    if Gp > 1:
        return _forward_bgpack(img, py, px, m, H, W, Gp, interpret)
    CH, rpc, Wk, packed = _plan(HW, W)
    imgp, pyp, pxp, mp, Tp, PT = _pad_inputs(img, py, px, m, CH)
    HWk = HW
    if packed:
        imgp, HWk, HWq = _prep_fori(img, W, Wk, CH)
    tile, full, out = _specs(Tp, P, imgp.shape[1], imgp.shape[2], gc)
    acc = pltpu.VMEM((Tp, gc), jnp.float32)
    o = pl.pallas_call(
        functools.partial(_fwd_kernel, P=P, W=Wk, HW=HWk, CH=CH, rpc=rpc,
                          packed=packed),
        out_shape=jax.ShapeDtypeStruct((BG, PT * Tp, gc), img.dtype),
        grid=(BG, PT),
        in_specs=[tile, tile, tile, full],
        out_specs=out,
        scratch_shapes=[acc],
        interpret=interpret or _force_interpret(),
    )(pyp, pxp, mp, imgp)
    return o[:, :HWo]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def dcnv3_sample(img: Array, py: Array, px: Array, m: Array,
                 H: int, W: int, interpret: bool = False) -> Array:
    """img (BG, H*W, gc); py/px/m (BG, HWo, P) with py/px absolute pixel
    coordinates on the UNPADDED map → (BG, HWo, gc)."""
    return _forward(img, py, px, m, H, W, interpret)


def _sample_fwd(img, py, px, m, H, W, interpret):
    return _forward(img, py, px, m, H, W, interpret), (img, py, px, m)


def _sample_bwd(H, W, interpret, res, g):
    img, py, px, m = res
    BG, HW, gc = img.shape
    _, HWo, P = py.shape
    interpret = interpret or _force_interpret()
    Gp = _bg_pack(BG, HW)
    if Gp > 1:
        return _backward_bgpack(img, py, px, m, g, H, W, Gp, interpret)
    CH, rpc, Wk, packed = _plan(HW, W)
    imgp, pyp, pxp, mp, Tp, PT = _pad_inputs(img, py, px, m, CH)
    HWq = imgp.shape[1]
    gp = jnp.pad(g, ((0, 0), (0, PT * Tp - HWo), (0, 0)))

    coord = jax.ShapeDtypeStruct((BG, PT * Tp, P), jnp.float32)
    coord_scratch = [pltpu.VMEM((Tp, P), jnp.float32)] * 3
    if rpc is None:
        # small map: fused kernel (img block + dimg block both fit in VMEM)
        tile, full, outs = _specs(Tp, P, HWq, gc, gc)
        dimg, dpy, dpx, dm = pl.pallas_call(
            functools.partial(_bwd_kernel, P=P, W=W, HW=HW, CH=CH),
            out_shape=[jax.ShapeDtypeStruct((BG, HWq, gc), jnp.float32),
                       coord, coord, coord],
            grid=(BG, PT),
            in_specs=[tile, tile, tile, full, outs],
            out_specs=[full, tile, tile, tile],
            scratch_shapes=coord_scratch,
            interpret=interpret,
        )(pyp, pxp, mp, imgp, gp)
        dimg = dimg[:, :HW]
    else:
        # mid/large map: split kernels so neither holds img AND dimg at once
        # (fused at the 448² stage 0 measured 17-20 MB scoped VMEM — over
        # the 16 MB limit); large maps additionally lane-packed
        HWk = HW
        if packed:
            imgp, HWk, HWq = _prep_fori(img, W, Wk, CH)
            dimg_shape = jax.ShapeDtypeStruct((BG, HWq // 8, 8 * gc),
                                              jnp.float32)
        else:
            dimg_shape = jax.ShapeDtypeStruct((BG, HWq, gc), jnp.float32)
        tile, full, outs = _specs(Tp, P, imgp.shape[1], imgp.shape[2], gc)
        dimg = pl.pallas_call(
            functools.partial(_bwd_img_kernel, P=P, W=Wk, HW=HWk, CH=CH,
                              rpc=rpc, packed=packed),
            out_shape=dimg_shape,
            grid=(BG, PT),
            in_specs=[tile, tile, tile, outs],
            out_specs=full,
            interpret=interpret,
        )(pyp, pxp, mp, gp)
        dpy, dpx, dm = pl.pallas_call(
            functools.partial(_bwd_coord_kernel, P=P, W=Wk, HW=HWk, CH=CH,
                              rpc=rpc, packed=packed),
            out_shape=[coord, coord, coord],
            grid=(BG, PT),
            in_specs=[tile, tile, tile, full, outs],
            out_specs=[tile, tile, tile],
            scratch_shapes=coord_scratch,
            interpret=interpret,
        )(pyp, pxp, mp, imgp, gp)
        if packed:
            # unpack (BG, HWq/8, 8gc) → (BG, HWq, gc); drop width/flat pad
            dimg = dimg.reshape(BG, HWq, gc)[:, :HWk]
            if Wk != W:
                H_ = HW // W
                dimg = dimg.reshape(BG, H_, Wk, gc)[:, :, :W].reshape(
                    BG, HW, gc)
        else:
            dimg = dimg[:, :HW]
    trim = lambda t, ref: t[:, :HWo].astype(ref.dtype)
    return (dimg.astype(img.dtype), trim(dpy, py), trim(dpx, px),
            trim(dm, m))


dcnv3_sample.defvjp(_sample_fwd, _sample_bwd)


def dcnv3_core_onehot(x: Array, offset: Array, mask: Array, *,
                      kernel: int = 3, stride: int = 1, pad: int = 1,
                      dilation: int = 1, group: int = 4,
                      offset_scale: float = 1.0,
                      interpret: bool = False) -> Array:
    """Drop-in for `dcnv3_core` (same spec, ops_dcnv3/functions/
    dcnv3_func.py:174) on the Pallas one-hot path.  Coordinates are computed
    directly in unpadded pixel units — algebraically identical to the
    reference's normalize-then-denormalize round trip:

        px = (dil*(K-1))//2 - pad + wo*stride + (tap_x + off_x)*offset_scale
    """
    N, H, W, C = x.shape
    import os
    # A/B diagnostics: route maps below a size floor to the gather path
    if H * W < int(os.environ.get("MTP_DCN_PALLAS_MIN_HW", "0")):
        from mtp_tpu.ops.dcnv3 import dcnv3_core
        return dcnv3_core(x, offset, mask, kernel=kernel, stride=stride,
                          pad=pad, dilation=dilation, group=group,
                          offset_scale=offset_scale)
    gc = C // group
    K = kernel
    P = K * K
    Ho = (H + 2 * pad - (dilation * (K - 1) + 1)) // stride + 1
    Wo = (W + 2 * pad - (dilation * (K - 1) + 1)) // stride + 1

    base = (dilation * (K - 1)) // 2 - pad  # ref base (+0.5) minus the 0.5
    ref_y = base + np.arange(Ho, dtype=np.float32) * stride
    ref_x = base + np.arange(Wo, dtype=np.float32) * stride
    start = -((dilation * (K - 1)) // 2)
    taps = start + np.arange(K, dtype=np.float32) * dilation
    tx, ty = np.meshgrid(taps, taps, indexing="ij")  # tap p = ix*K + iy
    tap_x = tx.reshape(-1) * offset_scale            # (P,)
    tap_y = ty.reshape(-1) * offset_scale

    off = offset.astype(jnp.float32).reshape(N, Ho, Wo, group, P, 2)
    px = (ref_x[None, None, :, None, None] + tap_x[None, None, None, None, :]
          + off[..., 0] * offset_scale)
    py = (ref_y[None, :, None, None, None] + tap_y[None, None, None, None, :]
          + off[..., 1] * offset_scale)

    def grp(t):  # (N, Ho, Wo, G, P) → (N*G, Ho*Wo, P)
        return t.transpose(0, 3, 1, 2, 4).reshape(N * group, Ho * Wo, P)

    m = grp(mask.astype(jnp.float32).reshape(N, Ho, Wo, group, P))
    xg = x.reshape(N, H * W, group, gc).transpose(0, 2, 1, 3)
    xg = xg.reshape(N * group, H * W, gc)

    out = dcnv3_sample(xg, grp(py), grp(px), m, H, W, interpret)
    out = out.reshape(N, group, Ho, Wo, gc).transpose(0, 2, 3, 1, 4)
    return out.reshape(N, Ho, Wo, group * gc)
