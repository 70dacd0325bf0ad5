"""ViT + RVSA (Rotated Varied-Size Window Attention) backbone, TPU-native.

Re-design of the reference `ViT_Win_RVSA_V3_WSZ7`
(Multi-Task_Pretrain/backbone/vit_win_rvsa_v3_wsz7.py:587-865) with equivalent
math but a TPU-first shape discipline:

- NHWC layout end to end (no NCHW permutes; convs, pools and window reshapes
  all operate on the channels-last layout XLA prefers on TPU),
- static shapes: padding, window counts and all gather indices are resolved at
  trace time, so the whole backbone jit-compiles to one fused program,
- rotated-window K/V sampling uses `mtp_tpu.ops.grid_sample` (a vectorized
  gather) instead of a CUDA grid_sampler,
- bf16 matmuls on the MXU with fp32 softmax/params.

Numeric semantics preserved from the reference (for released-checkpoint
parity), including its quirks:
- blocks are RVSA except every `interval`-th (1-indexed), which is full
  attention over the whole token grid (:625-631),
- full attention applies `scale` to q *before* the rel-pos contraction
  (:100-103) while RVSA applies it to the logits with unscaled-q rel-pos
  (:410-412),
- RVSA x-offsets are normalized by the *vertical* window count and y-offsets
  by the horizontal one (:359-360), using the unpadded size,
- qkv is computed on unpadded tokens and then zero-padded (:390-392), while
  the offset/scale/angle regressors pool the zero-padded features (:347-368),
- sampling grids use align_corners=True with zero padding (:397-404).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mtp_tpu.ops.grid_sample import grid_sample
from mtp_tpu.ops.rel_pos import (add_decomposed_rel_pos, swin_rel_pos_bias,
                                 swin_rel_pos_index)
from mtp_tpu.utils.config import BackboneConfig

Array = jax.Array


def trunc_normal_init(std: float = 0.02):
    return nn.initializers.truncated_normal(stddev=std, lower=-2.0, upper=2.0)


def drop_path(x: Array, rate, deterministic: bool, rng) -> Array:
    """Stochastic depth on the residual branch (per sample).  `rate` may be a
    traced scalar (scanned block groups pass per-block rates as inputs)."""
    if deterministic or (isinstance(rate, float) and rate == 0.0):
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: jnp.dtype = jnp.float32
    drop: float = 0.0

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        x = nn.Dense(self.hidden, dtype=self.dtype, kernel_init=trunc_normal_init(),
                     name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.out, dtype=self.dtype, kernel_init=trunc_normal_init(),
                     name="fc2")(x)
        if self.drop > 0.0:
            x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class FullAttention(nn.Module):
    """Global attention over the whole (H, W) token grid with decomposed
    relative position bias (reference `Attention` + `calc_rel_pos_spatial`)."""

    dim: int
    num_heads: int
    grid_size: Tuple[int, int]  # rel-pos table extent (Hp, Wp of the model grid)
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    pallas: bool = False

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        B, H, W, C = x.shape
        nH, hd = self.num_heads, self.dim // self.num_heads
        scale = hd ** -0.5

        rel_pos_h = self.param("rel_pos_h", nn.initializers.zeros,
                               (2 * self.grid_size[0] - 1, hd))
        rel_pos_w = self.param("rel_pos_w", nn.initializers.zeros,
                               (2 * self.grid_size[1] - 1, hd))

        qkv = nn.Dense(3 * self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                       kernel_init=trunc_normal_init(), name="qkv")(x)
        qkv = qkv.reshape(B, H * W, 3, nH, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (B, nH, N, hd)

        q = q * scale
        if self.pallas and max(H, W) <= 128:
            # q-blocked flash kernel at EVERY grid size: the (N, N)
            # scores/bias never hit HBM.  Originally gated to H*W > 1024
            # (VMEM safety of the one-cell window kernel); measured round 5,
            # flash also wins below the gate — 2.67 vs 8.24 ms fwd+bwd at
            # N=784 (448² bs3) and 2.12 vs 3.62 ms at N=196 (224² bs8) —
            # because the window path materializes the (B, nH, N, N)
            # decomposed bias in HBM for both passes.
            from mtp_tpu.ops.pallas_attn import flash_full_attention
            from mtp_tpu.ops.rel_pos import decomposed_rel_pos_factors
            rel_h, rel_w = decomposed_rel_pos_factors(
                q, (H, W), (H, W), rel_pos_h, rel_pos_w)
            f = lambda t: t.reshape((B * nH,) + t.shape[2:])
            out = flash_full_attention(f(q), f(k), f(v), f(rel_h),
                                       f(rel_w), (H, W), 1.0)
            out = out.reshape(B, nH, H * W, hd).astype(self.dtype)
        elif self.pallas:
            # >128-per-axis grids (2048²+ images): rel-pos expansion rows
            # exceed the kernel's _REL_PAD — fall back to the fused window
            # kernel with a materialized decomposed bias
            from mtp_tpu.ops.pallas_attn import fused_window_attention
            from mtp_tpu.ops.rel_pos import decomposed_rel_pos_bias
            bias = decomposed_rel_pos_bias(q, (H, W), (H, W),
                                           rel_pos_h, rel_pos_w)
            out = fused_window_attention(q, k, v, bias, 1.0)
            out = out.astype(self.dtype)
        else:
            attn = jnp.einsum("bhqc,bhkc->bhqk", q, k,
                              preferred_element_type=jnp.float32)
            # reference passes the scaled q into the rel-pos contraction
            attn = add_decomposed_rel_pos(attn, q.astype(jnp.float32), (H, W),
                                          (H, W), rel_pos_h, rel_pos_w)
            attn = jax.nn.softmax(attn.astype(jnp.float32),
                                  axis=-1).astype(self.dtype)
            out = jnp.einsum("bhqk,bhkc->bhqc", attn, v,
                             preferred_element_type=jnp.float32).astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, H, W, nH * hd)
        out = nn.Dense(self.dim, dtype=self.dtype,
                       kernel_init=trunc_normal_init(), name="proj")(out)
        return out


class RVSAAttention(nn.Module):
    """Rotated varied-size window attention (reference
    `RotatedVariedSizeWindowAttention`, vit_win_rvsa_v3_wsz7.py:195-433).

    Each 7x7 query window attends to a 7x7 set of K/V taps sampled on a
    per-window learned grid: the identity window grid scaled by (1+s),
    rotated by theta around the window center, and translated by a learned
    offset; K/V values are bilinearly gathered from the padded feature map.
    """

    dim: int
    num_heads: int
    ws: int = 7
    attn_ws: int = 7
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    pallas: bool = False

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        B, H, W, C = x.shape
        nH, hd = self.num_heads, self.dim // self.num_heads
        ws, aws = self.ws, self.attn_ws
        scale = hd ** -0.5

        rel_pos_h = self.param("rel_pos_h", nn.initializers.zeros, (2 * ws - 1, hd))
        rel_pos_w = self.param("rel_pos_w", nn.initializers.zeros, (2 * ws - 1, hd))
        bias_table = self.param("relative_position_bias_table",
                                trunc_normal_init(),
                                ((ws + aws - 1) ** 2, nH))

        # --- qkv on unpadded tokens, then zero-pad (reference order) -------
        qkv = nn.Dense(3 * self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                       kernel_init=trunc_normal_init(), name="qkv")(x)

        ph, pw = (ws - H % ws) % ws, (ws - W % ws) % ws
        pt, pl = ph // 2, pw // 2
        Hp, Wp = H + ph, W + pw
        nh, nw = Hp // ws, Wp // ws
        qkv = jnp.pad(qkv, ((0, 0), (pt, ph - pt), (pl, pw - pl), (0, 0)))
        x_pad = jnp.pad(x, ((0, 0), (pt, ph - pt), (pl, pw - pl), (0, 0)))

        qkv = qkv.reshape(B, Hp, Wp, 3, nH, hd).transpose(3, 0, 4, 1, 2, 5)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (B, nH, Hp, Wp, hd)

        # --- per-window offset / scale / angle regression ------------------
        pooled = nn.avg_pool(x_pad, (ws, ws), strides=(ws, ws))  # (B, nh, nw, C)
        pooled = nn.leaky_relu(pooled, negative_slope=0.01)
        off = nn.Dense(nH * 2, dtype=jnp.float32, kernel_init=trunc_normal_init(),
                       name="sampling_offsets")(pooled).reshape(B, nh, nw, nH, 2)
        scl = nn.Dense(nH * 2, dtype=jnp.float32, kernel_init=trunc_normal_init(),
                       name="sampling_scales")(pooled).reshape(B, nh, nw, nH, 2)
        ang = nn.Dense(nH, dtype=jnp.float32, kernel_init=trunc_normal_init(),
                       name="sampling_angles")(pooled)  # (B, nh, nw, nH)

        # reference quirk: x-offset normalized by the vertical window count
        # of the *unpadded* map and vice versa (:359-360)
        off_x = off[..., 0] / max(H // ws, 1)
        off_y = off[..., 1] / max(W // ws, 1)

        # --- sampling grid (fp32; all static except the regressed params) --
        ref_x = np.linspace(-1.0, 1.0, Wp, dtype=np.float32)
        ref_y = np.linspace(-1.0, 1.0, Hp, dtype=np.float32)
        wc_x = jnp.asarray(ref_x.reshape(nw, ws).mean(-1))  # window centers
        wc_y = jnp.asarray(ref_y.reshape(nh, ws).mean(-1))
        bc = np.arange(aws, dtype=np.float32) * 2.0 * ws / aws
        bc_x = bc / (Wp - 1)
        bc_y = bc / (Hp - 1)
        bc_x = jnp.asarray(bc_x - bc_x.mean())  # (aws,) in-window x offsets
        bc_y = jnp.asarray(bc_y - bc_y.mean())

        sx = scl[..., 0] + 1.0  # (B, nh, nw, nH)
        sy = scl[..., 1] + 1.0
        # (B, nh, nw, nH, aws_y, aws_x)
        ox = (bc_x[None, :] * sx[..., None])[..., None, :]
        oy = (bc_y[None, :] * sy[..., None])[..., :, None]
        sin, cos = jnp.sin(ang)[..., None, None], jnp.cos(ang)[..., None, None]
        rx = -oy * sin + ox * cos
        ry = oy * cos + ox * sin
        gx = wc_x[None, None, :, None, None, None] + rx + off_x[..., None, None]
        gy = wc_y[None, :, None, None, None, None] + ry + off_y[..., None, None]
        grid = jnp.stack([gx, gy], axis=-1)  # (B, nh, nw, nH, aws, aws, 2)
        grid = grid.transpose(0, 3, 1, 4, 2, 5, 6).reshape(
            B * nH, nh * aws, nw * aws, 2)

        # --- bilinear K/V gather on the learned grids ----------------------
        k_flat = k.reshape(B * nH, Hp, Wp, hd)
        v_flat = v.reshape(B * nH, Hp, Wp, hd)
        k_sel = grid_sample(k_flat, grid, align_corners=True,
                            padding_mode="zeros", pallas=self.pallas)
        v_sel = grid_sample(v_flat, grid, align_corners=True,
                            padding_mode="zeros", pallas=self.pallas)

        # --- windowed attention -------------------------------------------
        def to_windows(t, w):
            # (B*nH, nh*w, nw*w, hd) -> (B*nh*nw, nH, w*w, hd)
            t = t.reshape(B, nH, nh, w, nw, w, hd)
            return t.transpose(0, 2, 4, 1, 3, 5, 6).reshape(
                B * nh * nw, nH, w * w, hd)

        qw = to_windows(q.reshape(B * nH, Hp, Wp, hd), ws)
        kw = to_windows(k_sel, aws)
        vw = to_windows(v_sel, aws)

        if self.pallas:
            from mtp_tpu.ops.pallas_attn import fused_window_attention
            from mtp_tpu.ops.rel_pos import decomposed_rel_pos_bias
            bias = decomposed_rel_pos_bias(qw, (ws, ws), (aws, aws),
                                           rel_pos_h, rel_pos_w)
            bias = bias + swin_rel_pos_bias(
                bias_table, swin_rel_pos_index(ws, aws)).astype(jnp.float32)
            out = fused_window_attention(qw, kw, vw, bias, scale)
            out = out.astype(self.dtype)
        else:
            dots = jnp.einsum("wnqc,wnkc->wnqk", qw, kw,
                              preferred_element_type=jnp.float32) * scale
            # reference passes the *unscaled* q into the rel-pos contraction
            dots = add_decomposed_rel_pos(dots, qw.astype(jnp.float32),
                                          (ws, ws), (aws, aws),
                                          rel_pos_h, rel_pos_w)
            dots = dots + swin_rel_pos_bias(bias_table,
                                            swin_rel_pos_index(ws, aws))
            attn = jax.nn.softmax(dots.astype(jnp.float32),
                                  axis=-1).astype(self.dtype)
            out = jnp.einsum("wnqk,wnkc->wnqc", attn, vw,
                             preferred_element_type=jnp.float32).astype(self.dtype)

        out = out.reshape(B, nh, nw, nH, ws, ws, hd)
        out = out.transpose(0, 1, 4, 2, 5, 3, 6).reshape(B, Hp, Wp, nH * hd)
        out = out[:, pt:pt + H, pl:pl + W]
        out = nn.Dense(self.dim, dtype=self.dtype,
                       kernel_init=trunc_normal_init(), name="proj")(out)
        return out


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float
    full_attn: bool
    grid_size: Tuple[int, int]
    window_size: int = 7
    qkv_bias: bool = True
    drop_path_rate: float = 0.0
    init_values: Optional[float] = None
    dtype: jnp.dtype = jnp.float32
    pallas: bool = False

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True,
                 dp_rate=None) -> Array:
        if self.full_attn:
            attn = FullAttention(self.dim, self.num_heads, self.grid_size,
                                 self.qkv_bias, dtype=self.dtype,
                                 pallas=self.pallas, name="attn")
        else:
            attn = RVSAAttention(self.dim, self.num_heads, self.window_size,
                                 self.window_size, self.qkv_bias,
                                 dtype=self.dtype, pallas=self.pallas,
                                 name="attn")
        ln = lambda name: nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=name)

        def branch(h):
            return attn(ln("norm1")(h), deterministic)

        def mlp_branch(h):
            return Mlp(int(self.dim * self.mlp_ratio), self.dim,
                       dtype=self.dtype, name="mlp")(ln("norm2")(h), deterministic)

        g1 = g2 = None
        if self.init_values is not None:
            g1 = self.param("gamma_1", nn.initializers.constant(self.init_values),
                            (self.dim,))
            g2 = self.param("gamma_2", nn.initializers.constant(self.init_values),
                            (self.dim,))

        rate = dp_rate if dp_rate is not None else self.drop_path_rate
        use_dp = (not deterministic
                  and (dp_rate is not None or self.drop_path_rate > 0.0))
        rng = self.make_rng("dropout") if use_dp else None
        a = branch(x)
        if g1 is not None:
            a = a * g1.astype(a.dtype)
        x = x + drop_path(a, rate, deterministic, rng)
        m = mlp_branch(x)
        if g2 is not None:
            m = m * g2.astype(m.dtype)
        rng2 = self.make_rng("dropout") if use_dp else None
        x = x + drop_path(m, rate, deterministic, rng2)
        return x


class BlockGroup(nn.Module):
    """One scan unit: (interval-1) RVSA blocks followed by 1 full-attention
    block.  `nn.scan` over groups compiles the transformer once per group
    shape instead of once per block — a ~interval× jit-time reduction for
    deep models (ViT-L: 4 groups of 6 instead of 24 blocks)."""

    dim: int
    num_heads: int
    mlp_ratio: float
    grid_size: Tuple[int, int]
    window_size: int
    qkv_bias: bool
    init_values: Optional[float]
    dtype: jnp.dtype
    deterministic: bool = True  # static (scan would trace call-time args)
    use_dp: bool = True         # static: whether drop-path rng is needed
    pallas: bool = False

    @nn.compact
    def __call__(self, x: Array, dpr: Array):
        """x (B, H, W, C), dpr (interval,) per-block drop-path rates.
        Returns (x, stacked per-block outputs (interval, B, H, W, C))."""
        outs = []
        interval = dpr.shape[0]
        for p in range(interval):
            full = (p == interval - 1)
            x = Block(self.dim, self.num_heads, self.mlp_ratio, full,
                      self.grid_size, self.window_size, self.qkv_bias,
                      1.0 if self.use_dp else 0.0,  # placeholder; rate is dpr
                      self.init_values, dtype=self.dtype, pallas=self.pallas,
                      name=("full" if full else f"rvsa_{p}"))(
                x, self.deterministic,
                dp_rate=dpr[p] if self.use_dp else None)
            outs.append(x)
        return x, jnp.stack(outs)


class Norm2d(nn.Module):
    """Channels-last LayerNorm used inside the simple-FPN deconv stack."""

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.LayerNorm(epsilon=1e-6, name="ln")(x)


class SimpleFPN(nn.Module):
    """ViTDet-style simple feature pyramid (reference fpn1..fpn4, :640-668):
    strides 4, 8, 16, 32 from the token grid, all `dim` channels.  The
    patch-8 variant (reference :655-668) uses one deconv / identity / pool2 /
    pool4 instead."""

    dim: int
    patch_size: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[Array]) -> Tuple[Array, ...]:
        f1, f2, f3, f4 = feats
        up = lambda c, name: nn.ConvTranspose(
            c, (2, 2), strides=(2, 2), dtype=self.dtype, name=name)
        if self.patch_size == 8:
            x1 = up(self.dim, "fpn1_deconv1")(f1)
            x2 = f2
            x3 = nn.max_pool(f3, (2, 2), strides=(2, 2))
            x4 = nn.max_pool(f4, (4, 4), strides=(4, 4))
            return x1, x2, x3, x4
        x1 = up(self.dim, "fpn1_deconv1")(f1)
        x1 = Norm2d(name="fpn1_norm")(x1.astype(jnp.float32)).astype(self.dtype)
        x1 = nn.gelu(x1, approximate=False)
        x1 = up(self.dim, "fpn1_deconv2")(x1)
        x2 = up(self.dim, "fpn2_deconv1")(f2)
        x3 = f3
        x4 = nn.max_pool(f4, (2, 2), strides=(2, 2))
        return x1, x2, x3, x4


class ViTRVSA(nn.Module):
    """The backbone: patch embed → interleaved RVSA/full blocks → simple FPN.

    Returns 4 NHWC pyramid levels (strides 4/8/16/32, all embed_dim channels),
    like the reference `forward_features` (:787-813).  `features_only=True`
    skips the FPN and returns the raw 16-stride maps at out_indices.
    """

    cfg: BackboneConfig

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True,
                 features_only: bool = False):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        B, H, W, _ = x.shape
        p = cfg.patch_size
        Hp, Wp = H // p, W // p

        x = nn.Conv(cfg.embed_dim, (p, p), strides=(p, p), padding="VALID",
                    dtype=dtype, name="patch_embed")(x.astype(dtype))  # (B, Hp, Wp, D)

        if cfg.use_abs_pos_emb:
            pos = self.param("pos_embed", trunc_normal_init(),
                             (1, Hp, Wp, cfg.embed_dim))
            x = x + pos.astype(dtype)
        if cfg.drop_rate > 0.0:
            x = nn.Dropout(cfg.drop_rate)(x, deterministic=deterministic)

        dpr = np.linspace(0.0, cfg.drop_path_rate, cfg.depth)
        if cfg.scan and cfg.depth % cfg.interval == 0:
            G = cfg.depth // cfg.interval
            scan = nn.scan(
                nn.remat(BlockGroup) if cfg.remat else BlockGroup,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=0, out_axes=0, length=G)
            group = scan(cfg.embed_dim, cfg.num_heads, cfg.mlp_ratio,
                         (Hp, Wp), cfg.window_size, cfg.qkv_bias,
                         cfg.init_values, dtype, deterministic,
                         cfg.drop_path_rate > 0.0, cfg.pallas_attn,
                         name="block_groups")
            dpr_g = jnp.asarray(dpr.reshape(G, cfg.interval), jnp.float32)
            x, ys = group(x, dpr_g)
            # ys: (G, interval, B, H, W, C) → per-block outputs
            all_outs = ys.reshape((cfg.depth,) + ys.shape[2:])
            block_outs = {i: all_outs[i] for i in set(cfg.out_indices)}
        else:
            block_outs = {}
            for i in range(cfg.depth):
                block = Block(
                    dim=cfg.embed_dim, num_heads=cfg.num_heads,
                    mlp_ratio=cfg.mlp_ratio,
                    full_attn=((i + 1) % cfg.interval == 0),
                    grid_size=(Hp, Wp), window_size=cfg.window_size,
                    qkv_bias=cfg.qkv_bias, drop_path_rate=float(dpr[i]),
                    init_values=cfg.init_values, dtype=dtype,
                    pallas=cfg.pallas_attn, name=f"blocks_{i}")
                if cfg.remat:
                    x = nn.remat(Block.__call__, static_argnums=(2,))(block, x, deterministic)
                else:
                    x = block(x, deterministic)
                if i in cfg.out_indices:
                    block_outs[i] = x

        feats = [block_outs[i] for i in cfg.out_indices]
        if features_only:
            return tuple(feats)
        return SimpleFPN(cfg.embed_dim, patch_size=cfg.patch_size,
                         dtype=dtype, name="fpn")(feats)


def rescale_block_init(params: dict, depth: int) -> dict:
    """Reference `fix_init_weight` (:676-682): divide each block's attn-proj
    and mlp-fc2 kernels by sqrt(2*(layer_id+1)) at init time.  Handles both
    the unrolled (blocks_i) and scanned (block_groups with stacked leading
    group axis) layouts."""
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    p = params["params"] if "params" in params else params
    if "blocks_0" not in p and "block_groups" not in p:
        return params  # non-ViT backbone (e.g. InternImage): no rescale rule
    if "block_groups" in p:
        bg = p["block_groups"]
        names = sorted(k for k in bg if k.startswith("rvsa_")) + ["full"]
        interval = len(names)
        for pos, name in enumerate(names):
            blk = bg[name]
            G = blk["attn"]["proj"]["kernel"].shape[0]
            ids = np.arange(G) * interval + pos + 1  # 1-based layer ids
            r = (1.0 / np.sqrt(2.0 * ids)).astype(np.float32)
            for path in (("attn", "proj"), ("mlp", "fc2")):
                k = blk[path[0]][path[1]]["kernel"]
                blk[path[0]][path[1]]["kernel"] = \
                    k * r.reshape((G,) + (1,) * (k.ndim - 1))
        return params
    for i in range(depth):
        blk = p[f"blocks_{i}"]
        r = 1.0 / math.sqrt(2.0 * (i + 1))
        blk["attn"]["proj"]["kernel"] = blk["attn"]["proj"]["kernel"] * r
        blk["mlp"]["fc2"]["kernel"] = blk["mlp"]["fc2"]["kernel"] * r
    return params


def init_backbone(cfg: BackboneConfig, rng: jax.Array,
                  input_hw: Optional[Tuple[int, int]] = None) -> dict:
    """Initialize backbone params (with the reference's init rescaling)."""
    H, W = input_hw or (cfg.img_size, cfg.img_size)
    model = ViTRVSA(cfg)
    variables = model.init(rng, jnp.zeros((1, H, W, cfg.in_chans), jnp.float32))
    return rescale_block_init(variables["params"], cfg.depth)


def backbone_flops(cfg: BackboneConfig,
                   input_hw: Optional[Tuple[int, int]] = None) -> float:
    """Analytic forward-FLOPs estimate for the RVSA backbone (the analog of
    the reference's per-module `flops()` methods,
    vit_win_rvsa_v3_wsz7.py:447-477 + Attention/Mlp counts): patch embed,
    per-block qkv/proj/mlp, window-attention score/value matmuls, RVSA
    sampling (pool + offset/scale/angle regression + grid sample), and the
    quadratic full-attention blocks every `interval`."""
    H, W = input_hw or (cfg.img_size, cfg.img_size)
    ph = pw = cfg.patch_size
    h, w = H // ph, W // pw
    D, nH = cfg.embed_dim, cfg.num_heads
    ws = cfg.window_size
    hp = (h + ws - 1) // ws * ws
    wp = (w + ws - 1) // ws * ws
    n_tok, n_pad = h * w, hp * wp
    N = ws * ws

    patch_embed = H * W * cfg.in_chans * D * ph * pw // (ph * pw)
    per_tok_dense = (3 * D * D) + (D * D) + 2 * D * int(D * cfg.mlp_ratio)
    flops = float(patch_embed)
    n_windows = (hp // ws) * (wp // ws)
    for i in range(cfg.depth):
        full = (i + 1) % cfg.interval == 0
        flops += n_tok * per_tok_dense  # qkv + proj + mlp
        if full:
            flops += 2 * nH * n_tok * n_tok * (D // nH)  # QK^T + PV
        else:
            flops += n_windows * (2 * nH * N * N * (D // nH))
            # RVSA sampling: avg-pool, offset/scale/angle 1x1 convs on the
            # pooled map, grid construction, bilinear K/V gather
            flops += n_pad * D                       # pooling
            flops += n_windows * (3 * 2 * nH) * D    # regressors
            flops += n_pad * 2                       # coords
            flops += 2 * n_pad * D * 4               # bilinear gather K+V
    # simple-FPN deconvs/pools are <1% — counted as one 2x2 deconv level
    flops += n_tok * D * D * 4
    return flops
