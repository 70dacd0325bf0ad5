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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_NEG = -1e30


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


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def _fused_forward(q: Array, k: Array, v: Array, bias: Array,
                   scale: float, interpret: bool = False) -> Array:
    """q/k/v (W, H, N, D); bias (W, H, N, N) fp32 → out (W, H, N, D).

    N is padded to the f32 sublane multiple (8) inside; padded key positions
    are masked, padded query rows are dropped on return."""
    W, H, N, D = q.shape
    Np = _round_up(N, 8)
    Dp = _round_up(D, 128)

    def pad(t, n3, n4):
        return jnp.pad(t, ((0, 0), (0, 0), (0, n3 - t.shape[2]),
                           (0, n4 - t.shape[3])))

    qp = pad(q, Np, Dp)
    kp = pad(k, Np, Dp)
    vp = pad(v, Np, Dp)
    bp = pad(bias.astype(jnp.float32), Np, Np)

    grid = (W, H)
    spec3 = pl.BlockSpec((1, 1, Np, Dp), lambda w, h: (w, h, 0, 0),
                         memory_space=pltpu.VMEM)
    specb = pl.BlockSpec((1, 1, Np, Np), lambda w, h: (w, h, 0, 0),
                         memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, n_valid=N),
        out_shape=jax.ShapeDtypeStruct((W, H, Np, Dp), q.dtype),
        grid=grid,
        in_specs=[spec3, spec3, spec3, specb],
        out_specs=spec3,
        interpret=interpret,
    )(qp, kp, vp, bp)
    return out[:, :, :N, :D]
