"""Pallas TPU kernel: fused windowed attention.

The RVSA/window-attention hot loop computes, per (window, head):
    softmax(q @ k^T * scale + bias) @ v
over tiny 49-token windows.  Left to XLA this is four ops with two
HBM round-trips of the (W, nH, 49, 49) score tensor; the Pallas kernel fuses
score → bias-add → stable softmax → value contraction in VMEM, one grid cell
per (window, head), with the token dim padded to the sublane multiple.

Used by `RVSAAttention`/`FullAttention` when `BackboneConfig.pallas_attn`
is set (falls back to the jnp path otherwise — e.g. under CPU tests unless
interpret mode is forced).  Numerics match the jnp path (fp32 softmax).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_NEG = -1e30


def _force_interpret() -> bool:
    """MTP_PALLAS_INTERPRET=1 runs every kernel in interpreter mode.  Needed
    on sharded CPU meshes: `pltpu.force_tpu_interpret_mode` does not survive
    the SPMD partitioning lowering path, so pallas_attn=True under a
    multi-device CPU mesh would otherwise fail to lower."""
    return bool(os.environ.get("MTP_PALLAS_INTERPRET"))


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float,
                 n_valid: int):
    q = q_ref[0, 0].astype(jnp.float32)        # (N, D)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    b = bias_ref[0, 0]                          # (N, N) fp32

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * scale + b
    # mask padded key rows
    n = s.shape[-1]
    if n_valid < n:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_valid, s, _NEG)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0, 0] = (o / denom).astype(o_ref.dtype)


def _attn_kernel_packed(q_ref, k_ref, v_ref, bias_ref, o_ref, *,
                        scale: float, n_valid: int, pack: int, np_: int):
    """P windows stacked along the MXU row dim: one (P·Np, P·Np) score
    matmul instead of P half-empty (Np, Np) passes.  49-token windows pad
    to Np=64 so P=2 fills the 128×128 systolic array exactly; cross-window
    blocks are masked to -inf, the per-window bias lands block-diagonally."""
    P, Np = pack, np_
    q = q_ref[:, 0].astype(jnp.float32).reshape(P * Np, -1)   # (P·Np, D)
    k = k_ref[:, 0].astype(jnp.float32).reshape(P * Np, -1)
    v = v_ref[:, 0].astype(jnp.float32).reshape(P * Np, -1)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    # block-diagonal bias: row-block p gets bias[p] at column-block p
    b = jnp.concatenate(
        [jnp.pad(bias_ref[p, 0], ((0, 0), (p * Np, (P - 1 - p) * Np)))
         for p in range(P)], axis=0)                           # (P·Np, P·Np)
    s = s + b
    row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    valid = (row // Np == col // Np) & (col % Np < n_valid)
    s = jnp.where(valid, s, _NEG)
    m = jnp.max(s, axis=-1, keepdims=True)
    p_ = jnp.exp(s - m)
    denom = jnp.sum(p_, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p_, v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[:, 0] = (o / denom).astype(o_ref.dtype).reshape(P, Np, -1)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _jnp_attention(q: Array, k: Array, v: Array, bias: Array,
                   scale: float) -> Array:
    """jnp reference (used for the backward pass: fp32 softmax like the
    kernel)."""
    s = jnp.einsum("whqd,whkd->whqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale + bias
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("whqk,whkd->whqd", p, v.astype(jnp.float32)).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_window_attention(q: Array, k: Array, v: Array, bias: Array,
                           scale: float, interpret: bool = False) -> Array:
    """Differentiable wrapper: Pallas kernel forward, jnp-recompute backward
    (custom_vjp — Pallas kernels have no automatic reverse rule)."""
    return _fused_forward(q, k, v, bias, scale, interpret)


def _fwd(q, k, v, bias, scale, interpret):
    return _fused_forward(q, k, v, bias, scale, interpret), (q, k, v, bias)


def _bwd(scale, interpret, res, g):
    q, k, v, bias = res
    if _use_jnp_bwd():
        # legacy path: re-run the jnp forward and differentiate it
        _, vjp = jax.vjp(lambda q, k, v, b: _jnp_attention(q, k, v, b, scale),
                         q, k, v, bias)
        return vjp(g)
    return _fused_backward(q, k, v, bias, g, scale, interpret)


fused_window_attention.defvjp(_fwd, _bwd)


def _use_jnp_bwd() -> bool:
    """MTP_ATTN_JNP_BWD=1 restores the jnp-recompute backward (A/B lever)."""
    return bool(os.environ.get("MTP_ATTN_JNP_BWD"))


def _win_bwd_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref,
                    dq_ref, dk_ref, dv_ref, db_ref, *, scale: float,
                    n_valid: int, pack: int, np_: int):
    """Window-attention backward, packed form (P=1 degenerates to the plain
    kernel).  Recomputes scores/softmax in VMEM from the same inputs the
    forward saw — exact because the full key row is resident (no online
    rescaling), so the recomputed row max equals the forward's.  Standard
    softmax-attention VJP:
        dV = Pᵀ dO;  dP = dO Vᵀ;  dS = P ∘ (dP − rowsum(P ∘ dP))
        dQ = dS K · scale;  dK = dSᵀ Q · scale;  dbias = dS
    Cross-window blocks of P are exactly zero (forward masks them to -inf),
    so dS is block-diagonal and the per-window dbias is its diagonal block."""
    P, Np = pack, np_
    D = q_ref.shape[-1]
    f32 = jnp.float32
    q = q_ref[:, 0].astype(f32).reshape(P * Np, D)
    k = k_ref[:, 0].astype(f32).reshape(P * Np, D)
    v = v_ref[:, 0].astype(f32).reshape(P * Np, D)
    do = do_ref[:, 0].astype(f32).reshape(P * Np, D)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=f32) * scale
    if P > 1:
        b = jnp.concatenate(
            [jnp.pad(bias_ref[p, 0], ((0, 0), (p * Np, (P - 1 - p) * Np)))
             for p in range(P)], axis=0)
    else:
        b = bias_ref[0, 0]
    s = s + b
    row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    valid = (row // Np == col // Np) & (col % Np < n_valid)
    s = jnp.where(valid, s, _NEG)
    m = jnp.max(s, axis=-1, keepdims=True)
    p_ = jnp.exp(s - m)
    pn = p_ / jnp.sum(p_, axis=-1, keepdims=True)       # (P·Np, P·Np)

    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=f32)
    delta = jnp.sum(pn * dp, axis=-1, keepdims=True)
    ds = pn * (dp - delta)                               # block-diagonal

    dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                             preferred_element_type=f32) * scale
    dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                             preferred_element_type=f32) * scale
    dv = jax.lax.dot_general(pn, do, (((0,), (0,)), ((), ())),
                             preferred_element_type=f32)
    dq_ref[:, 0] = dq.reshape(P, Np, D).astype(dq_ref.dtype)
    dk_ref[:, 0] = dk.reshape(P, Np, D).astype(dk_ref.dtype)
    dv_ref[:, 0] = dv.reshape(P, Np, D).astype(dv_ref.dtype)
    for p in range(P):
        db_ref[p, 0] = ds[p * Np:(p + 1) * Np,
                          p * Np:(p + 1) * Np].astype(db_ref.dtype)


# Above this padded token count the one-shot backward's ~6 (Np, Np) f32
# temporaries exceed the 16 MB scoped-VMEM budget (first hit: N=784, the
# 448² full-attention blocks — 17.8 MB); switch to the q-blocked variant.
_WIN_BWD_ONE_SHOT_MAX = 512
_WQBLK_B = 128


def _win_bwd_qblk_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref,
                         dq_ref, db_ref, dk_ref, dv_ref, *, scale: float,
                         n_valid: int):
    """Q-blocked window backward for large single-window N (the 448²-784 /
    intermediate full-attention shapes): K/V stay VMEM-resident per (w, h),
    scores are recomputed per q tile, dK/dV accumulate across q tiles into
    a resident f32 output block (q-block axis is the minor grid dim).  Same
    VJP math as `_win_bwd_kernel`; temporaries are (QB, Np) instead of
    (Np, Np)."""
    i = pl.program_id(2)
    f32 = jnp.float32
    q = q_ref[0, 0].astype(f32)        # (QB, Dp)
    k = k_ref[0, 0].astype(f32)        # (Np, Dp)
    v = v_ref[0, 0].astype(f32)
    do = do_ref[0, 0].astype(f32)      # (QB, Dp)
    b = bias_ref[0, 0]                 # (QB, Np) f32

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=f32) * scale + b
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < n_valid, s, _NEG)
    m = jnp.max(s, axis=-1, keepdims=True)
    p_ = jnp.exp(s - m)
    pn = p_ / jnp.sum(p_, axis=-1, keepdims=True)        # (QB, Np)

    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=f32)
    delta = jnp.sum(pn * dp, axis=-1, keepdims=True)
    ds = pn * (dp - delta)

    dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                             preferred_element_type=f32) * scale
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    db_ref[0, 0] = ds.astype(db_ref.dtype)

    dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                             preferred_element_type=f32) * scale
    dv = jax.lax.dot_general(pn, do, (((0,), (0,)), ((), ())),
                             preferred_element_type=f32)

    @pl.when(i == 0)
    def _init():
        dk_ref[0, 0] = dk
        dv_ref[0, 0] = dv

    @pl.when(i > 0)
    def _acc():
        dk_ref[0, 0] += dk
        dv_ref[0, 0] += dv


def _win_backward_qblocked(q, k, v, bias, g, scale, interpret):
    W, H, N, D = q.shape
    Np = _round_up(N, 128)
    Nqp = _round_up(N, _WQBLK_B)
    Dp = _round_up(D, 128)

    def pad(t, n3, n4):
        return jnp.pad(t, ((0, 0), (0, 0), (0, n3 - t.shape[2]),
                           (0, n4 - t.shape[3])))

    qp = pad(q, Nqp, Dp)
    kp = pad(k, Np, Dp)
    vp = pad(v, Np, Dp)
    bp = pad(bias.astype(jnp.float32), Nqp, Np)
    gp = pad(g.astype(q.dtype), Nqp, Dp)  # padded cotangent rows are zero

    qspec = pl.BlockSpec((1, 1, _WQBLK_B, Dp), lambda w, h, i: (w, h, i, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, 1, Np, Dp), lambda w, h, i: (w, h, 0, 0),
                          memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, 1, _WQBLK_B, Np), lambda w, h, i: (w, h, i, 0),
                         memory_space=pltpu.VMEM)
    dq, db, dk, dv = pl.pallas_call(
        functools.partial(_win_bwd_qblk_kernel, scale=scale, n_valid=N),
        out_shape=(jax.ShapeDtypeStruct((W, H, Nqp, Dp), q.dtype),
                   jax.ShapeDtypeStruct((W, H, Nqp, Np), jnp.float32),
                   jax.ShapeDtypeStruct((W, H, Np, Dp), jnp.float32),
                   jax.ShapeDtypeStruct((W, H, Np, Dp), jnp.float32)),
        grid=(W, H, Nqp // _WQBLK_B),
        in_specs=[qspec, kvspec, kvspec, bspec, qspec],
        out_specs=(qspec, bspec, kvspec, kvspec),
        interpret=interpret,
    )(qp, kp, vp, bp, gp)
    return (dq[:, :, :N, :D],
            dk[:, :, :N, :D].astype(k.dtype),
            dv[:, :, :N, :D].astype(v.dtype),
            db[:, :, :N, :N].astype(bias.dtype))


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def _fused_backward(q: Array, k: Array, v: Array, bias: Array, g: Array,
                    scale: float, interpret: bool = False):
    """Pallas backward for `fused_window_attention`: same grid/packing as
    the forward, one extra pass — no jnp re-forward, and the (W, H, N, N)
    score/probability tensors never hit HBM (the jnp VJP materialized
    both)."""
    interpret = interpret or _force_interpret()
    W, H, N, D = q.shape
    Np = _round_up(N, 8)
    Dp = _round_up(D, 128)
    pack = 128 // _round_up(N, 64) if N <= 64 else 1
    if os.environ.get("MTP_ATTN_NO_PACK"):
        pack = 1
    if pack == 1 and Np > _WIN_BWD_ONE_SHOT_MAX:
        return _win_backward_qblocked(q, k, v, bias, g, scale, interpret)
    if pack > 1:
        Np = _round_up(N, 64)
        Wp = _round_up(W, pack)
    else:
        Wp = W

    def pad(t, n3, n4):
        return jnp.pad(t, ((0, Wp - t.shape[0]), (0, 0),
                           (0, n3 - t.shape[2]), (0, n4 - t.shape[3])))

    qp = pad(q, Np, Dp)
    kp = pad(k, Np, Dp)
    vp = pad(v, Np, Dp)
    bp = pad(bias.astype(jnp.float32), Np, Np)
    gp = pad(g.astype(q.dtype), Np, Dp)  # padded cotangent rows are zero

    grid = (Wp // pack, H)
    spec3 = pl.BlockSpec((pack, 1, Np, Dp), lambda w, h: (w, h, 0, 0),
                         memory_space=pltpu.VMEM)
    specb = pl.BlockSpec((pack, 1, Np, Np), lambda w, h: (w, h, 0, 0),
                         memory_space=pltpu.VMEM)
    kernel = functools.partial(_win_bwd_kernel, scale=scale, n_valid=N,
                               pack=pack, np_=Np)
    dq, dk, dv, db = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((Wp, H, Np, Dp), q.dtype),
                   jax.ShapeDtypeStruct((Wp, H, Np, Dp), k.dtype),
                   jax.ShapeDtypeStruct((Wp, H, Np, Dp), v.dtype),
                   jax.ShapeDtypeStruct((Wp, H, Np, Np), jnp.float32)),
        grid=grid,
        in_specs=[spec3, spec3, spec3, specb, spec3],
        out_specs=(spec3, spec3, spec3, specb),
        interpret=interpret,
    )(qp, kp, vp, bp, gp)
    cut = lambda t: t[:W, :, :N, :D]
    return (cut(dq), cut(dk), cut(dv),
            db[:W, :, :N, :N].astype(bias.dtype))


# ---------------------------------------------------------------------------
# Q-blocked full attention with decomposed rel-pos bias (flash-style)
# ---------------------------------------------------------------------------
#
# The full-attention blocks (reference Attention + calc_rel_pos_spatial,
# vit_win_rvsa_v3_wsz7.py:64-131) run at the whole-image token count: 784 at
# the 448² pretrain size, 4096 at the 1024² detection sizes.  Materializing
# the (B, nH, N, N) score/bias tensors is 64 MB per head-batch at N=4096 —
# too big for one VMEM grid cell and an HBM-bandwidth hole for the jnp path.
#
# This kernel blocks over q only: K/V for one (batch, head) stay VMEM-resident
# (N≤4096: ~2 MB padded), and the bias is reconstructed per tile from the two
# decomposed factors
#     bias[q, k] = rel_h[q, ky(k)] + rel_w[q, kx(k)],   k = ky*Wk + kx
# via two constant 0/1 expansion matmuls built from iota in-register:
#     bias_tile = rel_h_blk @ Eh + rel_w_blk @ Ew
#     Eh[r, c] = (c // Wk == r),   Ew[r, c] = (c % Wk == r)
# so the (N, N) bias never exists in HBM.  Softmax is exact per row (full K
# is present — no online rescaling needed).

_QBLK = 128
_REL_PAD = 128  # Eh/Ew row count; requires grid H, W <= 128 (img <= 2048²)


def _flash_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref, *,
                  scale: float, n_valid: int, wk: int):
    q = q_ref[0].astype(jnp.float32)            # (Qb, Dp)
    k = k_ref[0].astype(jnp.float32)            # (Nkp, Dp)
    v = v_ref[0].astype(jnp.float32)
    rh = rh_ref[0]                              # (Qb, 128) fp32
    rw = rw_ref[0]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    nkp = s.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, (_REL_PAD, nkp), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (_REL_PAD, nkp), 0)
    eh = ((col // wk) == row).astype(jnp.float32)
    ew = ((col % wk) == row).astype(jnp.float32)
    s = s + jax.lax.dot_general(rh, eh, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    s = s + jax.lax.dot_general(rw, ew, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    kcol = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(kcol < n_valid, s, _NEG)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (o / denom).astype(o_ref.dtype)


def _flash_forward(q, k, v, rel_h, rel_w, grid_hw, scale, interpret=False):
    """q/k/v (BH, N, D); rel_h (BH, N, Hk); rel_w (BH, N, Wk) fp32.
    N = Hk*Wk (token-major k index = ky*Wk + kx).  Returns (BH, N, D)."""
    BH, N, D = q.shape
    Hk, Wk = grid_hw
    assert Hk * Wk == N and Hk <= _REL_PAD and Wk <= _REL_PAD
    interpret = interpret or _force_interpret()
    Nqp = _round_up(N, _QBLK)
    Nkp = _round_up(N, 128)
    Dp = _round_up(D, 128)

    pad3 = lambda t, n, c: jnp.pad(
        t, ((0, 0), (0, n - t.shape[1]), (0, c - t.shape[2])))
    qp = pad3(q, Nqp, Dp)
    kp = pad3(k, Nkp, Dp)
    vp = pad3(v, Nkp, Dp)
    rhp = pad3(rel_h.astype(jnp.float32), Nqp, _REL_PAD)
    rwp = pad3(rel_w.astype(jnp.float32), Nqp, _REL_PAD)

    qspec = pl.BlockSpec((1, _QBLK, Dp), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, Nkp, Dp), lambda b, i: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    rspec = pl.BlockSpec((1, _QBLK, _REL_PAD), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, n_valid=N, wk=Wk),
        out_shape=jax.ShapeDtypeStruct((BH, Nqp, Dp), q.dtype),
        grid=(BH, Nqp // _QBLK),
        in_specs=[qspec, kvspec, kvspec, rspec, rspec],
        out_specs=qspec,
        interpret=interpret,
    )(qp, kp, vp, rhp, rwp)
    return out[:, :N, :D]


def _flash_jnp(q, k, v, rel_h, rel_w, grid_hw, scale, chunk=512):
    """Chunked jnp reference/backward path: same math, scanning q in chunks
    of `chunk` rows so no (N, N) tensor is ever materialized."""
    BH, N, D = q.shape
    Hk, Wk = grid_hw
    Nc = _round_up(N, chunk)
    pad2 = lambda t: jnp.pad(t, ((0, 0), (0, Nc - N), (0, 0)))
    qs = pad2(q).reshape(BH, Nc // chunk, chunk, D).transpose(1, 0, 2, 3)
    rhs = pad2(rel_h).reshape(BH, Nc // chunk, chunk, Hk).transpose(1, 0, 2, 3)
    rws = pad2(rel_w).reshape(BH, Nc // chunk, chunk, Wk).transpose(1, 0, 2, 3)

    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    @jax.checkpoint  # backward re-builds each chunk's scores: O(chunk·N) live
    def one_chunk(qc, rhc, rwc):
        s = jnp.einsum("bqd,bkd->bqk", qc.astype(jnp.float32), kf) * scale
        s = s.reshape(BH, chunk, Hk, Wk)
        s = s + rhc[..., :, None] + rwc[..., None, :]
        s = s.reshape(BH, chunk, N)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bqk,bkd->bqd", p, vf).astype(q.dtype)

    _, outs = jax.lax.scan(
        lambda carry, blk: (carry, one_chunk(*blk)), (), (qs, rhs, rws))
    out = outs.transpose(1, 0, 2, 3).reshape(BH, Nc, D)
    return out[:, :N]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def flash_full_attention(q: Array, k: Array, v: Array, rel_h: Array,
                         rel_w: Array, grid_hw: tuple, scale: float,
                         interpret: bool = False) -> Array:
    """Full attention with decomposed rel-pos bias, never materializing the
    (N, N) scores in HBM.  q/k/v (BH, N, D); rel_h/rel_w (BH, N, Hk/Wk) are
    the q-contracted per-axis bias factors (see FullAttention).  Backward
    recomputes chunked in jnp (same memory bound)."""
    return _flash_forward(q, k, v, rel_h, rel_w, grid_hw, scale, interpret)


def _flash_fwd(q, k, v, rel_h, rel_w, grid_hw, scale, interpret):
    out = _flash_forward(q, k, v, rel_h, rel_w, grid_hw, scale, interpret)
    return out, (q, k, v, rel_h, rel_w)


def _flash_bwd(grid_hw, scale, interpret, res, g):
    q, k, v, rel_h, rel_w = res
    if _use_jnp_bwd():
        # legacy path: chunked jnp re-forward + autodiff
        _, vjp = jax.vjp(
            lambda q, k, v, rh, rw: _flash_jnp(q, k, v, rh, rw, grid_hw,
                                               scale),
            q, k, v, rel_h, rel_w)
        return vjp(g)
    return _flash_backward(q, k, v, rel_h, rel_w, g, grid_hw, scale,
                           interpret)


flash_full_attention.defvjp(_flash_fwd, _flash_bwd)


_QBLK_B = 64  # backward q block: half the forward's — ~5 (Qb, Nk) f32
              # temporaries live at once, VMEM-bounded at N=4096


def _flash_bwd_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, do_ref,
                      dq_ref, drh_ref, drw_ref, dk_ref, dv_ref, *,
                      scale: float, n_valid: int, wk: int):
    """Flash backward: grid (BH, q-blocks); K/V stay VMEM-resident per (BH),
    scores are recomputed per q tile (exactly — the full key row is present,
    so the row max equals the forward's; no saved logsumexp needed).  dK/dV
    accumulate across q tiles into one resident output block (the q-block
    axis is the minor grid dim, so the block persists while it sweeps).
    d(rel_h)/d(rel_w) are dS contracted with the same 0/1 expansion
    matrices the forward used to build the bias:
        bias = rh @ Eh + rw @ Ew  ⇒  drh = dS @ Ehᵀ,  drw = dS @ Ewᵀ."""
    i = pl.program_id(1)
    f32 = jnp.float32
    q = q_ref[0]                      # (Qb, Dp) primal dtype
    k = k_ref[0]                      # (Nkp, Dp)
    v = v_ref[0]
    rh = rh_ref[0]                    # (Qb, 128) f32
    rw = rw_ref[0]
    do = do_ref[0]                    # (Qb, Dp)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=f32) * scale
    nkp = s.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, (_REL_PAD, nkp), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (_REL_PAD, nkp), 0)
    eh = ((col // wk) == row).astype(f32)
    ew = ((col % wk) == row).astype(f32)
    s = s + jax.lax.dot_general(rh, eh, (((1,), (0,)), ((), ())),
                                preferred_element_type=f32)
    s = s + jax.lax.dot_general(rw, ew, (((1,), (0,)), ((), ())),
                                preferred_element_type=f32)
    kcol = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(kcol < n_valid, s, _NEG)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    pn = p / jnp.sum(p, axis=-1, keepdims=True)          # (Qb, Nkp) f32

    dof = do.astype(f32)
    dp = jax.lax.dot_general(dof, v.astype(f32), (((1,), (1,)), ((), ())),
                             preferred_element_type=f32)
    delta = jnp.sum(pn * dp, axis=-1, keepdims=True)
    ds = pn * (dp - delta)                               # (Qb, Nkp) f32

    dq = jax.lax.dot_general(ds, k.astype(f32), (((1,), (0,)), ((), ())),
                             preferred_element_type=f32) * scale
    dq_ref[0] = dq.astype(dq_ref.dtype)
    drh_ref[0] = jax.lax.dot_general(ds, eh, (((1,), (1,)), ((), ())),
                                     preferred_element_type=f32)
    drw_ref[0] = jax.lax.dot_general(ds, ew, (((1,), (1,)), ((), ())),
                                     preferred_element_type=f32)

    dk = jax.lax.dot_general(ds, q.astype(f32), (((0,), (0,)), ((), ())),
                             preferred_element_type=f32) * scale
    dv = jax.lax.dot_general(pn, dof, (((0,), (0,)), ((), ())),
                             preferred_element_type=f32)

    @pl.when(i == 0)
    def _init():
        dk_ref[0] = dk
        dv_ref[0] = dv

    @pl.when(i > 0)
    def _acc():
        dk_ref[0] += dk
        dv_ref[0] += dv


@functools.partial(jax.jit, static_argnames=("grid_hw", "scale", "interpret"))
def _flash_backward(q, k, v, rel_h, rel_w, g, grid_hw, scale,
                    interpret=False):
    """Pallas backward for `flash_full_attention` — one fused pass; the
    (N, N) scores/probabilities never exist in HBM, and the forward is NOT
    re-run (the jnp fallback re-ran it in full before differentiating)."""
    BH, N, D = q.shape
    Hk, Wk = grid_hw
    interpret = interpret or _force_interpret()
    Nqp = _round_up(N, _QBLK_B)
    Nkp = _round_up(N, 128)
    Dp = _round_up(D, 128)

    pad3 = lambda t, n, c: jnp.pad(
        t, ((0, 0), (0, n - t.shape[1]), (0, c - t.shape[2])))
    qp = pad3(q, Nqp, Dp)
    kp = pad3(k, Nkp, Dp)
    vp = pad3(v, Nkp, Dp)
    rhp = pad3(rel_h.astype(jnp.float32), Nqp, _REL_PAD)
    rwp = pad3(rel_w.astype(jnp.float32), Nqp, _REL_PAD)
    gp = pad3(g.astype(q.dtype), Nqp, Dp)   # padded cotangent rows are zero

    qspec = pl.BlockSpec((1, _QBLK_B, Dp), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, Nkp, Dp), lambda b, i: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    rspec = pl.BlockSpec((1, _QBLK_B, _REL_PAD), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM)
    accspec = pl.BlockSpec((1, Nkp, Dp), lambda b, i: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    dq, drh, drw, dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_kernel, scale=scale, n_valid=N, wk=Wk),
        out_shape=(jax.ShapeDtypeStruct((BH, Nqp, Dp), q.dtype),
                   jax.ShapeDtypeStruct((BH, Nqp, _REL_PAD), jnp.float32),
                   jax.ShapeDtypeStruct((BH, Nqp, _REL_PAD), jnp.float32),
                   jax.ShapeDtypeStruct((BH, Nkp, Dp), jnp.float32),
                   jax.ShapeDtypeStruct((BH, Nkp, Dp), jnp.float32)),
        grid=(BH, Nqp // _QBLK_B),
        in_specs=[qspec, kvspec, kvspec, rspec, rspec, qspec],
        out_specs=(qspec, rspec, rspec, accspec, accspec),
        interpret=interpret,
    )(qp, kp, vp, rhp, rwp, gp)
    return (dq[:, :N, :D],
            dk[:, :N, :D].astype(k.dtype),
            dv[:, :N, :D].astype(v.dtype),
            drh[:, :N, :Hk].astype(rel_h.dtype),
            drw[:, :N, :Wk].astype(rel_w.dtype))


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def _fused_forward(q: Array, k: Array, v: Array, bias: Array,
                   scale: float, interpret: bool = False) -> Array:
    """q/k/v (W, H, N, D); bias (W, H, N, N) fp32 → out (W, H, N, D).

    N is padded to the f32 sublane multiple (8) inside; padded key positions
    are masked, padded query rows are dropped on return."""
    interpret = interpret or _force_interpret()
    W, H, N, D = q.shape
    Np = _round_up(N, 8)
    Dp = _round_up(D, 128)

    # windows of ≤64 tokens half-fill the 128-row MXU tile: pack P windows
    # per grid cell (Np 49→64, P=2 → exactly 128 score rows)
    import os as _os
    pack = 128 // _round_up(N, 64) if N <= 64 else 1
    if _os.environ.get("MTP_ATTN_NO_PACK"):
        pack = 1
    if pack > 1:
        Np = _round_up(N, 64)
        Wp = _round_up(W, pack)
    else:
        Wp = W

    def pad(t, n3, n4):
        return jnp.pad(t, ((0, Wp - t.shape[0]), (0, 0),
                           (0, n3 - t.shape[2]), (0, n4 - t.shape[3])))

    qp = pad(q, Np, Dp)
    kp = pad(k, Np, Dp)
    vp = pad(v, Np, Dp)
    bp = pad(bias.astype(jnp.float32), Np, Np)

    if pack > 1:
        grid = (Wp // pack, H)
        spec3 = pl.BlockSpec((pack, 1, Np, Dp), lambda w, h: (w, h, 0, 0),
                             memory_space=pltpu.VMEM)
        specb = pl.BlockSpec((pack, 1, Np, Np), lambda w, h: (w, h, 0, 0),
                             memory_space=pltpu.VMEM)
        kernel = functools.partial(_attn_kernel_packed, scale=scale,
                                   n_valid=N, pack=pack, np_=Np)
    else:
        grid = (Wp, H)
        spec3 = pl.BlockSpec((1, 1, Np, Dp), lambda w, h: (w, h, 0, 0),
                             memory_space=pltpu.VMEM)
        specb = pl.BlockSpec((1, 1, Np, Np), lambda w, h: (w, h, 0, 0),
                             memory_space=pltpu.VMEM)
        kernel = functools.partial(_attn_kernel, scale=scale, n_valid=N)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Wp, H, Np, Dp), q.dtype),
        grid=grid,
        in_specs=[spec3, spec3, spec3, specb],
        out_specs=spec3,
        interpret=interpret,
    )(qp, kp, vp, bp)
    return out[:W, :, :N, :D]
