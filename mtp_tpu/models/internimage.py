"""InternImage backbone (DCNv3 CNN), TPU-native NHWC.

Capability parity with the reference `InternImage`
(Multi-Task_Pretrain/backbone/intern_image.py:336-727): stem (2x stride-2
conv + LN), 4 stages of DCNv3 layers with MLPs, layer scale, post-norm
(XL config), stride-2 conv downsampling between stages.  Outputs 4 pyramid
levels at strides 4/8/16/32 with channels C, 2C, 4C, 8C.

XL configuration (reference models.py:92-104): channels=192,
depths (5, 5, 24, 5), groups (12, 24, 48, 96), layer_scale 1e-5,
offset_scale 2.0, post_norm True, drop_path 0.2.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mtp_tpu.models.vit_rvsa import drop_path
from mtp_tpu.ops.dcnv3 import DCNv3

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class InternImageConfig:
    channels: int = 192
    depths: Tuple[int, ...] = (5, 5, 24, 5)
    groups: Tuple[int, ...] = (12, 24, 48, 96)
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.2
    layer_scale: Optional[float] = 1e-5
    offset_scale: float = 2.0
    post_norm: bool = True
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    dtype: str = "bfloat16"
    # remat every layer (the analog of the reference's with_cp=True,
    # Multi-Task_Pretrain/models.py:102 — XL is TRAINED with checkpointing)
    remat: bool = False
    # nn.scan over each stage's layers: one compiled layer per stage instead
    # of depth copies (XL stage 3 has 24) — params under stage{s}_layers/l
    # with a stacked leading axis
    scan: bool = False
    # Pallas one-hot matmul DCNv3 sampling (ops/dcnv3_pallas.py)
    pallas_dcn: bool = False


def internimage_xl() -> InternImageConfig:
    return InternImageConfig()


def internimage_t() -> InternImageConfig:
    return InternImageConfig(channels=64, depths=(4, 4, 18, 4),
                             groups=(4, 8, 16, 32), layer_scale=None,
                             offset_scale=1.0, post_norm=False,
                             drop_path_rate=0.1)


class MLP(nn.Module):
    hidden: int
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)


class InternImageLayer(nn.Module):
    channels: int
    groups: int
    mlp_ratio: float
    drop_path_rate: float
    layer_scale: Optional[float]
    offset_scale: float
    post_norm: bool
    dtype: jnp.dtype = jnp.float32
    pallas_dcn: bool = False

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True,
                 dp_rate=None) -> Array:
        """dp_rate overrides the static drop-path rate (scanned stages pass
        per-layer rates as traced scan inputs, like the ViT BlockGroup)."""
        ln = lambda n: nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=n)
        dcn = DCNv3(self.channels, group=self.groups,
                    offset_scale=self.offset_scale, pallas=self.pallas_dcn,
                    dtype=self.dtype, name="dcn")
        mlp = MLP(int(self.channels * self.mlp_ratio), self.channels,
                  dtype=self.dtype, name="mlp")
        g1 = g2 = None
        if self.layer_scale is not None:
            g1 = self.param("gamma1",
                            nn.initializers.constant(self.layer_scale),
                            (self.channels,))
            g2 = self.param("gamma2",
                            nn.initializers.constant(self.layer_scale),
                            (self.channels,))

        rate = dp_rate if dp_rate is not None else self.drop_path_rate
        use_dp = (not deterministic
                  and (dp_rate is not None or self.drop_path_rate > 0))

        def dp(t):
            rng = self.make_rng("dropout") if use_dp else None
            return drop_path(t, rate, deterministic, rng)

        if self.post_norm:
            a = ln("norm1")(dcn(x))
            if g1 is not None:
                a = a * g1.astype(a.dtype)
            x = x + dp(a)
            b = ln("norm2")(mlp(x))
            if g2 is not None:
                b = b * g2.astype(b.dtype)
            x = x + dp(b)
        else:
            a = dcn(ln("norm1")(x))
            if g1 is not None:
                a = a * g1.astype(a.dtype)
            x = x + dp(a)
            b = mlp(ln("norm2")(x))
            if g2 is not None:
                b = b * g2.astype(b.dtype)
            x = x + dp(b)
        return x


class _StageLayer(nn.Module):
    """One scan unit: a single InternImageLayer with `deterministic` frozen
    as an attribute (scan would trace call-time args) and the per-layer
    drop-path rate arriving as a scanned input."""

    channels: int
    groups: int
    mlp_ratio: float
    layer_scale: Optional[float]
    offset_scale: float
    post_norm: bool
    dtype: jnp.dtype
    deterministic: bool = True
    use_dp: bool = False
    pallas_dcn: bool = False

    @nn.compact
    def __call__(self, x: Array, dpr: Array):
        x = InternImageLayer(
            self.channels, self.groups, self.mlp_ratio,
            1.0 if self.use_dp else 0.0,  # placeholder; real rate is dpr
            self.layer_scale, self.offset_scale, self.post_norm,
            dtype=self.dtype, pallas_dcn=self.pallas_dcn, name="l")(
            x, self.deterministic, dp_rate=dpr if self.use_dp else None)
        return x, ()


class InternImage(nn.Module):
    cfg: InternImageConfig

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True
                 ) -> Tuple[Array, ...]:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        x = x.astype(dtype)
        ln = lambda n: nn.LayerNorm(epsilon=1e-6, dtype=dtype, name=n)

        # stem: conv s2 → LN → GELU → conv s2 → LN
        x = nn.Conv(cfg.channels // 2, (3, 3), strides=(2, 2), padding=1,
                    dtype=dtype, name="stem_conv1")(x)
        x = nn.gelu(ln("stem_norm1")(x), approximate=False)
        x = nn.Conv(cfg.channels, (3, 3), strides=(2, 2), padding=1,
                    dtype=dtype, name="stem_conv2")(x)
        x = ln("stem_norm2")(x)

        total = sum(cfg.depths)
        dpr = np.linspace(0, cfg.drop_path_rate, total)
        outs = []
        li = 0
        for s, depth in enumerate(cfg.depths):
            ch = cfg.channels * (2 ** s)
            if cfg.scan:
                scan = nn.scan(
                    nn.remat(_StageLayer) if cfg.remat else _StageLayer,
                    variable_axes={"params": 0},
                    split_rngs={"params": True, "dropout": True},
                    in_axes=0, out_axes=0, length=depth)
                stage = scan(ch, cfg.groups[s], cfg.mlp_ratio,
                             cfg.layer_scale, cfg.offset_scale, cfg.post_norm,
                             dtype, deterministic,
                             not deterministic and cfg.drop_path_rate > 0,
                             cfg.pallas_dcn, name=f"stage{s}_layers")
                x, _ = stage(x, jnp.asarray(dpr[li:li + depth], jnp.float32))
                li += depth
            else:
                for i in range(depth):
                    layer = InternImageLayer(
                        ch, cfg.groups[s], cfg.mlp_ratio, float(dpr[li]),
                        cfg.layer_scale, cfg.offset_scale, cfg.post_norm,
                        dtype=dtype, pallas_dcn=cfg.pallas_dcn,
                        name=f"stage{s}_layer{i}")
                    if cfg.remat:
                        x = nn.remat(InternImageLayer.__call__,
                                     static_argnums=(2,))(layer, x, deterministic)
                    else:
                        x = layer(x, deterministic)
                    li += 1
            # reference InternImageBlock norms the STREAM before the
            # downsample when not post-norm (intern_image.py block forward)
            if not cfg.post_norm:
                x = ln(f"stage{s}_norm")(x)
            if s in cfg.out_indices:
                outs.append(x)
            if s < len(cfg.depths) - 1:
                # reference DownsampleLayer conv has no bias
                x = nn.Conv(ch * 2, (3, 3), strides=(2, 2), padding=1,
                            use_bias=False, dtype=dtype,
                            name=f"down{s}_conv")(x)
                x = ln(f"down{s}_norm")(x)
        return tuple(outs)

    @property
    def out_channels(self):
        return tuple(self.cfg.channels * (2 ** s) for s in self.cfg.out_indices)


def internimage_flops(cfg: InternImageConfig, img_size: int) -> float:
    """Analytic forward-FLOPs estimate for InternImage (the analog of
    vit_rvsa.backbone_flops): stem convs, per-layer DCNv3
    (input/output projections, depthwise offset trunk, offset/mask
    regressors, bilinear sampling) + MLP, and downsample convs.
    Multiply-add counted as 2 FLOPs.  XL at 224² lands near the paper's
    ~163 GFLOP figure."""
    fl = 2.0 * (img_size // 2) ** 2 * (cfg.channels // 2) * 3 * 9
    fl += 2.0 * (img_size // 4) ** 2 * cfg.channels * (cfg.channels // 2) * 9
    for s, depth in enumerate(cfg.depths):
        ch = cfg.channels * 2 ** s
        n = (img_size // (4 * 2 ** s)) ** 2
        g = cfg.groups[s]
        per = (2 * n * ch * ch * 2                    # input + output proj
               + 2 * n * ch * 9                      # 3x3 depthwise conv
               + 2 * n * ch * g * 27                 # offset(18)+mask(9)
               + n * g * (ch // g) * 9 * 8           # 4-tap bilinear x K²
               + 2 * n * ch * int(ch * cfg.mlp_ratio) * 2)
        fl += float(per) * depth
        if s < len(cfg.depths) - 1:
            fl += 2.0 * (n // 4) * (ch * 2) * ch * 9
    return fl
