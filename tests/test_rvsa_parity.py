"""Numeric parity of the JAX RVSA / full-attention blocks vs an independent
torch oracle.

The oracle below re-derives the published semantics of the reference backbone
(Multi-Task_Pretrain/backbone/vit_win_rvsa_v3_wsz7.py:65-193 full attention,
:195-433 RVSA) using torch CPU ops (grid_sample, avg_pool) as ground truth —
the same oracle pattern the reference uses for DCNv3 (`dcnv3_core_pytorch`).
Weights are taken from the flax init so both sides run identical parameters.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from mtp_tpu.models.vit_rvsa import FullAttention, RVSAAttention

T = torch.from_numpy


def dense(x, p):
    """flax Dense: y = x @ kernel + bias (kernel is (in, out))."""
    y = x @ T(np.asarray(p["kernel"]))
    if "bias" in p:
        y = y + T(np.asarray(p["bias"]))
    return y


def decomposed_rel_pos_oracle(attn, q, q_hw, k_hw, rel_h, rel_w):
    """attn (..., qh*qw, kh*kw), q (..., qh*qw, hd): naive torch version."""
    qh, qw = q_hw
    kh, kw = k_hw

    def idx(qs, ks):
        qr, kr = max(ks / qs, 1.0), max(qs / ks, 1.0)
        d = (torch.arange(qs)[:, None] * qr - torch.arange(ks)[None, :] * kr
             + (ks - 1) * kr)
        return d.long()

    Rh = T(np.asarray(rel_h))[idx(qh, kh)]  # (qh, kh, hd)
    Rw = T(np.asarray(rel_w))[idx(qw, kw)]
    rq = q.reshape(q.shape[:-2] + (qh, qw, q.shape[-1]))
    rel_hh = torch.einsum("...hwc,hkc->...hwk", rq, Rh)
    rel_ww = torch.einsum("...hwc,wkc->...hwk", rq, Rw)
    a = attn.reshape(attn.shape[:-2] + (qh, qw, kh, kw))
    a = a + rel_hh[..., :, None] + rel_ww[..., None, :]
    return a.reshape(attn.shape)


def full_attention_oracle(x, p, nH):
    B, H, W, C = x.shape
    hd = C // nH
    scale = hd ** -0.5
    xt = T(x).reshape(B, H * W, C)
    qkv = dense(xt, p["qkv"]).reshape(B, H * W, 3, nH, hd).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0] * scale, qkv[1], qkv[2]
    attn = q @ k.transpose(-2, -1)
    attn = decomposed_rel_pos_oracle(attn, q, (H, W), (H, W),
                                     p["rel_pos_h"], p["rel_pos_w"])
    attn = attn.softmax(-1)
    out = (attn @ v).transpose(1, 2).reshape(B, H * W, C)
    return dense(out, p["proj"]).reshape(B, H, W, C).numpy()


def rvsa_oracle(x, p, nH, ws=7):
    """Torch oracle for rotated varied-size window attention, ws == attn_ws."""
    B, H, W, C = x.shape
    hd = C // nH
    aws = ws
    scale = hd ** -0.5

    ph, pw = (ws - H % ws) % ws, (ws - W % ws) % ws
    pt, pl = ph // 2, pw // 2
    Hp, Wp = H + ph, W + pw
    nh, nw = Hp // ws, Wp // ws

    # qkv on unpadded tokens, then zero-pad spatially
    qkv = dense(T(x), p["qkv"])  # (B, H, W, 3C)
    qkv = F.pad(qkv.permute(0, 3, 1, 2), (pl, pw - pl, pt, ph - pt))  # B,3C,Hp,Wp
    qkv = qkv.reshape(B, 3, nH, hd, Hp, Wp).permute(1, 0, 2, 4, 5, 3)
    q, k, v = qkv[0], qkv[1], qkv[2]  # (B, nH, Hp, Wp, hd)

    # offset/scale/angle regression on padded input features
    xp = F.pad(T(x).permute(0, 3, 1, 2), (pl, pw - pl, pt, ph - pt))
    pooled = F.leaky_relu(F.avg_pool2d(xp, ws))  # (B, C, nh, nw)
    pooled = pooled.permute(0, 2, 3, 1)
    off = dense(pooled, p["sampling_offsets"]).reshape(B, nh, nw, nH, 2)
    scl = dense(pooled, p["sampling_scales"]).reshape(B, nh, nw, nH, 2)
    ang = dense(pooled, p["sampling_angles"])  # (B, nh, nw, nH)

    off_x = off[..., 0] / max(H // ws, 1)
    off_y = off[..., 1] / max(W // ws, 1)

    # identity grid + per-window transform (all in [-1, 1] coords)
    ref_x = torch.linspace(-1, 1, Wp)
    ref_y = torch.linspace(-1, 1, Hp)
    wc_x = ref_x.reshape(nw, ws).mean(-1)
    wc_y = ref_y.reshape(nh, ws).mean(-1)
    bc = torch.arange(aws, dtype=torch.float32) * 2 * ws / aws
    bc_x = bc / (Wp - 1)
    bc_x = bc_x - bc_x.mean()
    bc_y = bc / (Hp - 1)
    bc_y = bc_y - bc_y.mean()

    sx = (scl[..., 0] + 1)[..., None, None]  # (B, nh, nw, nH, 1, 1)
    sy = (scl[..., 1] + 1)[..., None, None]
    ox = bc_x.reshape(1, 1, 1, 1, 1, aws) * sx
    oy = bc_y.reshape(1, 1, 1, 1, aws, 1) * sy
    sin = torch.sin(ang)[..., None, None]
    cos = torch.cos(ang)[..., None, None]
    gx = -oy * sin + ox * cos + wc_x.reshape(1, 1, nw, 1, 1, 1) + off_x[..., None, None]
    gy = oy * cos + ox * sin + wc_y.reshape(1, nh, 1, 1, 1, 1) + off_y[..., None, None]
    grid = torch.stack([gx, gy], -1)  # (B, nh, nw, nH, aws, aws, 2)
    grid = grid.permute(0, 3, 1, 4, 2, 5, 6).reshape(B * nH, nh * aws, nw * aws, 2)

    kv = torch.stack([k, v]).reshape(2 * B * nH, Hp, Wp, hd).permute(0, 3, 1, 2)
    kv_sel = F.grid_sample(kv, grid.repeat(2, 1, 1, 1), mode="bilinear",
                           padding_mode="zeros", align_corners=True)
    kv_sel = kv_sel.reshape(2, B, nH, hd, nh, aws, nw, aws)
    kv_sel = kv_sel.permute(0, 1, 4, 6, 2, 5, 7, 3).reshape(
        2, B * nh * nw, nH, aws * aws, hd)
    k_w, v_w = kv_sel[0], kv_sel[1]

    q_w = q.reshape(B, nH, nh, ws, nw, ws, hd).permute(0, 2, 4, 1, 3, 5, 6)
    q_w = q_w.reshape(B * nh * nw, nH, ws * ws, hd)

    dots = q_w @ k_w.transpose(-2, -1) * scale
    dots = decomposed_rel_pos_oracle(dots, q_w, (ws, ws), (aws, aws),
                                     p["rel_pos_h"], p["rel_pos_w"])

    # swin pairwise bias
    coords = torch.stack(torch.meshgrid(torch.arange(aws), torch.arange(aws),
                                        indexing="ij")).flatten(1)
    rel = (coords[:, :, None] - coords[:, None, :]).permute(1, 2, 0)
    rel = rel + (aws - 1)
    index = rel[..., 0] * (2 * aws - 1) + rel[..., 1]
    table = T(np.asarray(p["relative_position_bias_table"]))
    bias = table[index.reshape(-1)].reshape(ws * ws, aws * aws, nH).permute(2, 0, 1)
    dots = dots + bias[None]

    out = dots.softmax(-1) @ v_w  # (B*nh*nw, nH, ws*ws, hd)
    out = out.reshape(B, nh, nw, nH, ws, ws, hd).permute(0, 1, 4, 2, 5, 3, 6)
    out = out.reshape(B, Hp, Wp, C)[:, pt:pt + H, pl:pl + W]
    return dense(out, p["proj"]).numpy()


@pytest.mark.parametrize("hw", [(14, 14), (10, 12)])
def test_rvsa_matches_oracle(hw):
    H, W = hw
    B, C, nH = 2, 16, 2
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, H, W, C)).astype(np.float32)

    mod = RVSAAttention(dim=C, num_heads=nH, dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    # randomize the zero-init rel-pos tables so the bias paths are exercised
    params = dict(params)
    params["rel_pos_h"] = jnp.asarray(rng.standard_normal((13, C // nH)).astype(np.float32) * 0.1)
    params["rel_pos_w"] = jnp.asarray(rng.standard_normal((13, C // nH)).astype(np.float32) * 0.1)

    ours = np.asarray(jax.jit(mod.apply)({"params": params}, jnp.asarray(x)))
    ref = rvsa_oracle(x, jax.tree.map(np.asarray, params), nH)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_full_attention_matches_oracle():
    B, H, W, C, nH = 2, 7, 7, 16, 2
    rng = np.random.default_rng(1)
    x = rng.standard_normal((B, H, W, C)).astype(np.float32)

    mod = FullAttention(dim=C, num_heads=nH, grid_size=(H, W), dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params = dict(params)
    params["rel_pos_h"] = jnp.asarray(rng.standard_normal((2 * H - 1, C // nH)).astype(np.float32) * 0.1)
    params["rel_pos_w"] = jnp.asarray(rng.standard_normal((2 * W - 1, C // nH)).astype(np.float32) * 0.1)

    ours = np.asarray(jax.jit(mod.apply)({"params": params}, jnp.asarray(x)))
    ref = full_attention_oracle(x, jax.tree.map(np.asarray, params), nH)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)
