"""Relative position biases for attention.

Two schemes, both used by the reference backbone:

1. Decomposed spatial relative position (MViT-style): per-axis tables
   indexed by coordinate distance, contracted against q
   (reference `calc_rel_pos_spatial`, backbone/vit_win_rvsa_v3_wsz7.py:142-193).
2. Swin-style pairwise bias table indexed by a precomputed
   relative-position-index buffer (same file :266-284, :414-418).

Index tensors are computed with numpy at trace time (shapes are static), so
inside jit they are constants folded into the gather.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def rel_pos_indices(q_size: int, k_size: int) -> np.ndarray:
    """Distance index matrix (q_size, k_size) into a (q_size+k_size-1, C) table.

    Handles q/k resolution mismatch by the same ratio scaling as the
    reference (only hit when q_size != k_size)."""
    q_ratio = max(k_size / q_size, 1.0)
    k_ratio = max(q_size / k_size, 1.0)
    dist = (np.arange(q_size)[:, None] * q_ratio
            - np.arange(k_size)[None, :] * k_ratio)
    dist += (k_size - 1) * k_ratio
    return dist.astype(np.int64)


def decomposed_rel_pos_bias(q: jax.Array, q_shape: tuple[int, int],
                            k_shape: tuple[int, int], rel_pos_h: jax.Array,
                            rel_pos_w: jax.Array) -> jax.Array:
    """The decomposed bias alone: (..., q_h*q_w, k_h*k_w) fp32 (for fused
    attention kernels that take a precomputed bias)."""
    q_h, q_w = q_shape
    k_h, k_w = k_shape
    Rh = rel_pos_h[rel_pos_indices(q_h, k_h)].astype(jnp.float32)
    Rw = rel_pos_w[rel_pos_indices(q_w, k_w)].astype(jnp.float32)
    lead = q.shape[:-2]
    r_q = q.astype(jnp.float32).reshape(lead + (q_h, q_w, q.shape[-1]))
    rel_h = jnp.einsum("...hwc,hkc->...hwk", r_q, Rh)
    rel_w = jnp.einsum("...hwc,wkc->...hwk", r_q, Rw)
    bias = rel_h[..., :, :, :, None] + rel_w[..., :, :, None, :]
    return bias.reshape(lead + (q_h * q_w, k_h * k_w))


def decomposed_rel_pos_factors(q: jax.Array, q_shape: tuple[int, int],
                               k_shape: tuple[int, int], rel_pos_h: jax.Array,
                               rel_pos_w: jax.Array):
    """The two per-axis factors of the decomposed bias, WITHOUT forming the
    (N, N) bias: rel_h (..., q_h*q_w, k_h), rel_w (..., q_h*q_w, k_w), fp32.
    bias[q, k] = rel_h[q, ky] + rel_w[q, kx] with k = ky*k_w + kx — the
    contract consumed by `pallas_attn.flash_full_attention`."""
    q_h, q_w = q_shape
    k_h, k_w = k_shape
    Rh = rel_pos_h[rel_pos_indices(q_h, k_h)].astype(jnp.float32)
    Rw = rel_pos_w[rel_pos_indices(q_w, k_w)].astype(jnp.float32)
    lead = q.shape[:-2]
    r_q = q.astype(jnp.float32).reshape(lead + (q_h, q_w, q.shape[-1]))
    rel_h = jnp.einsum("...hwc,hkc->...hwk", r_q, Rh)
    rel_w = jnp.einsum("...hwc,wkc->...hwk", r_q, Rw)
    n = q_h * q_w
    return (rel_h.reshape(lead + (n, k_h)), rel_w.reshape(lead + (n, k_w)))


def add_decomposed_rel_pos(attn: jax.Array, q: jax.Array,
                           q_shape: tuple[int, int], k_shape: tuple[int, int],
                           rel_pos_h: jax.Array, rel_pos_w: jax.Array) -> jax.Array:
    """attn (..., q_h*q_w, k_h*k_w) += decomposed bias computed from q.

    q: (..., q_h*q_w, head_dim); rel_pos_h: (2*max(q_h,k_h)-1, head_dim).
    Leading dims of attn/q are arbitrary (batch, windows, heads...).
    """
    q_h, q_w = q_shape
    k_h, k_w = k_shape
    idx_h = rel_pos_indices(q_h, k_h)
    idx_w = rel_pos_indices(q_w, k_w)
    Rh = rel_pos_h[idx_h]  # (q_h, k_h, C)
    Rw = rel_pos_w[idx_w]  # (q_w, k_w, C)

    lead = q.shape[:-2]
    r_q = q.reshape(lead + (q_h, q_w, q.shape[-1]))
    # (..., q_h, q_w, k_h) / (..., q_h, q_w, k_w)
    rel_h = jnp.einsum("...hwc,hkc->...hwk", r_q, Rh.astype(q.dtype))
    rel_w = jnp.einsum("...hwc,wkc->...hwk", r_q, Rw.astype(q.dtype))

    attn = attn.reshape(lead + (q_h, q_w, k_h, k_w))
    attn = attn + rel_h[..., :, None] + rel_w[..., None, :]
    return attn.reshape(lead + (q_h * q_w, k_h * k_w))


def swin_rel_pos_index(q_ws: int, k_ws: int) -> np.ndarray:
    """Pairwise relative-position index (q_ws², k_ws²) into a
    ((q_ws+k_ws-1)², nH) bias table (reference builds it with attn_ws for both
    sides; q_ws == k_ws == 7 in all shipped configs)."""
    coords = np.stack(np.meshgrid(np.arange(k_ws), np.arange(k_ws), indexing="ij"))
    flat = coords.reshape(2, -1)  # (2, k_ws*k_ws)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += k_ws - 1
    rel[:, :, 1] += k_ws - 1
    rel[:, :, 0] *= 2 * k_ws - 1
    return rel.sum(-1)  # (N, N)


def swin_rel_pos_bias(table: jax.Array, index: np.ndarray) -> jax.Array:
    """table ((2ws-1)², nH), index (N, N) → bias (nH, N, N)."""
    n, _ = index.shape
    bias = table[index.reshape(-1)].reshape(n, n, -1)
    return bias.transpose(2, 0, 1)
