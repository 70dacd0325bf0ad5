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
    _, vjp = jax.vjp(lambda q, k, v, b: _jnp_attention(q, k, v, b, scale),
                     q, k, v, bias)
    return vjp(g)


fused_window_attention.defvjp(_fwd, _bwd)


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
    _, vjp = jax.vjp(
        lambda q, k, v, rh, rw: _flash_jnp(q, k, v, rh, rw, grid_hw, scale),
        q, k, v, rel_h, rel_w)
    return vjp(g)


flash_full_attention.defvjp(_flash_fwd, _flash_bwd)


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
