"""Pallas fused window attention vs the jnp reference path (interpret mode
on the CPU test platform; the same kernel compiles on real TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from mtp_tpu.ops.pallas_attn import fused_window_attention


def jnp_reference(q, k, v, bias, scale):
    s = jnp.einsum("whqd,whkd->whqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale + bias
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("whqk,whkd->whqd", p, v.astype(jnp.float32))


def test_matches_jnp_path():
    rng = np.random.default_rng(0)
    W, H, N, D = 6, 2, 49, 64
    q = rng.standard_normal((W, H, N, D)).astype(np.float32)
    k = rng.standard_normal((W, H, N, D)).astype(np.float32)
    v = rng.standard_normal((W, H, N, D)).astype(np.float32)
    bias = (rng.standard_normal((W, H, N, N)) * 0.1).astype(np.float32)
    scale = D ** -0.5

    got = fused_window_attention(jnp.asarray(q), jnp.asarray(k),
                                 jnp.asarray(v), jnp.asarray(bias), scale,
                                 interpret=True)
    ref = jnp_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                        jnp.asarray(bias), scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_bf16_inputs():
    rng = np.random.default_rng(1)
    W, H, N, D = 2, 3, 49, 64
    q = jnp.asarray(rng.standard_normal((W, H, N, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((W, H, N, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((W, H, N, D)), jnp.bfloat16)
    bias = jnp.zeros((W, H, N, N), jnp.float32)
    got = fused_window_attention(q, k, v, bias, 0.125, interpret=True)
    ref = jnp_reference(q, k, v, bias, 0.125)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), atol=3e-2)


def test_odd_window_count_packed():
    """W=5 with the packed (pack=2) path: the 6th padded window must not
    leak into real outputs."""
    rng = np.random.default_rng(3)
    W, H, N, D = 5, 2, 49, 64
    q = jnp.asarray(rng.standard_normal((W, H, N, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((W, H, N, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((W, H, N, D)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((W, H, N, N)) * 0.1, jnp.float32)
    got = fused_window_attention(q, k, v, bias, 0.125, interpret=True)
    ref = jnp_reference(q, k, v, bias, 0.125)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5,
                               rtol=1e-4)


def test_large_n_unpacked():
    """N>64 (full-attention shape) stays on the single-window kernel."""
    rng = np.random.default_rng(4)
    W, H, N, D = 2, 2, 196, 64
    q = jnp.asarray(rng.standard_normal((W, H, N, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((W, H, N, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((W, H, N, D)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((W, H, N, N)) * 0.1, jnp.float32)
    got = fused_window_attention(q, k, v, bias, 0.125, interpret=True)
    ref = jnp_reference(q, k, v, bias, 0.125)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5,
                               rtol=1e-4)


def test_grad_through_pallas_path():
    """custom_vjp: grads flow (jnp-recompute backward) and match the pure
    jnp path's grads."""
    rng = np.random.default_rng(2)
    W, H, N, D = 2, 2, 49, 64
    q = jnp.asarray(rng.standard_normal((W, H, N, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((W, H, N, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((W, H, N, D)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((W, H, N, N)) * 0.1, jnp.float32)

    def loss_pallas(q, k, v, b):
        return jnp.sum(fused_window_attention(q, k, v, b, 0.125,
                                              True) ** 2)

    def loss_ref(q, k, v, b):
        return jnp.sum(jnp_reference(q, k, v, b, 0.125) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                   rtol=1e-3)


# ---------------------------------------------------------------------------
# flash_full_attention (q-blocked, decomposed-bias) — VERDICT r2 item 4
# ---------------------------------------------------------------------------

from mtp_tpu.ops.pallas_attn import _flash_jnp, flash_full_attention


def flash_reference(q, k, v, rel_h, rel_w, grid_hw, scale):
    """Dense jnp oracle: materializes the (N, N) bias the old way."""
    Hk, Wk = grid_hw
    BH, N, D = q.shape
    s = jnp.einsum("bqd,bkd->bqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    s = s.reshape(BH, N, Hk, Wk)
    s = s + rel_h[..., :, None] + rel_w[..., None, :]
    s = s.reshape(BH, N, N)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p, v.astype(jnp.float32))


def _flash_inputs(seed, BH, Hk, Wk, D):
    rng = np.random.default_rng(seed)
    N = Hk * Wk
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    return (mk(BH, N, D), mk(BH, N, D), mk(BH, N, D),
            mk(BH, N, Hk) * 0.1, mk(BH, N, Wk) * 0.1)


def test_flash_matches_dense_square_grid():
    """36×36 grid (N=1296 — above the flash threshold used by the model)."""
    q, k, v, rh, rw = _flash_inputs(0, 2, 36, 36, 64)
    got = flash_full_attention(q, k, v, rh, rw, (36, 36), 0.125,
                               interpret=True)
    ref = flash_reference(q, k, v, rh, rw, (36, 36), 0.125)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5,
                               rtol=1e-4)


def test_flash_rect_grid_unaligned():
    """Rectangular 18×28 grid: N=504 is not a multiple of the 128-row q
    block — padded rows/cols must not leak."""
    q, k, v, rh, rw = _flash_inputs(1, 3, 18, 28, 64)
    got = flash_full_attention(q, k, v, rh, rw, (18, 28), 0.1,
                               interpret=True)
    ref = flash_reference(q, k, v, rh, rw, (18, 28), 0.1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5,
                               rtol=1e-4)


def test_flash_chunked_jnp_matches_dense():
    """The chunked backward-path math equals the dense oracle."""
    q, k, v, rh, rw = _flash_inputs(2, 2, 28, 28, 32)
    got = _flash_jnp(q, k, v, rh, rw, (28, 28), 0.125, chunk=256)
    ref = flash_reference(q, k, v, rh, rw, (28, 28), 0.125)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), atol=3e-5,
                               rtol=1e-4)


def test_flash_grads_match_dense():
    q, k, v, rh, rw = _flash_inputs(3, 1, 14, 14, 32)

    def loss_flash(*a):
        return jnp.sum(flash_full_attention(*a, (14, 14), 0.125, True) ** 2)

    def loss_ref(*a):
        return jnp.sum(flash_reference(*a, (14, 14), 0.125) ** 2)

    gp = jax.grad(loss_flash, argnums=(0, 1, 2, 3, 4))(q, k, v, rh, rw)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, rh, rw)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                   rtol=1e-3)


def test_flash_bf16():
    q, k, v, rh, rw = _flash_inputs(4, 2, 12, 12, 64)
    qb, kb, vb = (t.astype(jnp.bfloat16) for t in (q, k, v))
    got = flash_full_attention(qb, kb, vb, rh, rw, (12, 12), 0.125,
                               interpret=True)
    ref = flash_reference(q, k, v, rh, rw, (12, 12), 0.125)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), atol=3e-2)


# ---------------------------------------------------------------------------
# Pallas kernels under the TP mesh (round-4: VERDICT r3 item 7 — TP shards
# the head dimension the packed window kernel assumes contiguous; this pins
# numeric equality of the pallas and jnp paths under model=2 sharding)
# ---------------------------------------------------------------------------

def test_pallas_attn_under_tp_mesh(monkeypatch):
    """Scanned ViT forward with pallas_attn=True (interpret mode — Mosaic
    can't lower on CPU) under a dp4×tp2 mesh must equal the jnp path on the
    same params.  Covers both kernels: the packed window kernel (RVSA blocks,
    49→64 tokens, pack=2) and the fused full-attention path."""
    import dataclasses

    from mtp_tpu.models.vit_rvsa import ViTRVSA
    from mtp_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                       shard_params)
    from mtp_tpu.utils.config import BackboneConfig, MeshConfig

    monkeypatch.setenv("MTP_PALLAS_INTERPRET", "1")

    cfg_j = BackboneConfig(img_size=112, patch_size=16, embed_dim=32,
                           depth=4, num_heads=2, interval=2,
                           out_indices=(0, 1, 2, 3), dtype="float32", scan=True,
                           drop_path_rate=0.0, pallas_attn=False)
    cfg_p = dataclasses.replace(cfg_j, pallas_attn=True)

    x = np.random.default_rng(0).standard_normal((4, 112, 112, 3)).astype(
        np.float32)
    params = ViTRVSA(cfg_j).init(jax.random.PRNGKey(0), jnp.asarray(x))[
        "params"]
    ref = jax.jit(lambda p, x: ViTRVSA(cfg_j).apply({"params": p}, x))(
        params, jnp.asarray(x))

    mesh = make_mesh(MeshConfig(data=4, model=2))
    sp = shard_params(mesh, params)
    qkv = sp["block_groups"]["rvsa_0"]["attn"]["qkv"]["kernel"]
    assert "model" in str(qkv.sharding.spec), "TP rules must shard qkv"
    xs = jax.device_put(jnp.asarray(x), batch_sharding(mesh))

    out = jax.jit(lambda p, x: ViTRVSA(cfg_p).apply({"params": p}, x))(
        sp, xs)
    for i, (a, b) in enumerate(zip(out, ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-5,
                                   err_msg=f"level {i}")


# ---------------------------------------------------------------------------
# Pallas backward kernels (round 5, VERDICT r4 item 3) — gradients computed
# by the fused backward kernels, pinned against the dense-oracle autodiff
# ---------------------------------------------------------------------------


def test_win_bwd_odd_window_count_packed():
    """W=5 → pack=2 pads a 6th window; its zero cotangent must not leak
    into dk/dv/dbias of real windows."""
    rng = np.random.default_rng(10)
    W, H, N, D = 5, 2, 49, 64
    mk = lambda: jnp.asarray(rng.standard_normal((W, H, N, D)), jnp.float32)
    q, k, v = mk(), mk(), mk()
    bias = jnp.asarray(rng.standard_normal((W, H, N, N)) * 0.1, jnp.float32)

    def loss_pallas(q, k, v, b):
        return jnp.sum(fused_window_attention(q, k, v, b, 0.125, True) ** 2)

    def loss_ref(q, k, v, b):
        return jnp.sum(jnp_reference(q, k, v, b, 0.125) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                   rtol=1e-3)


def test_win_bwd_large_n_unpacked():
    """N=196 (full-attention 224² shape) backward on the unpacked kernel."""
    rng = np.random.default_rng(11)
    W, H, N, D = 2, 2, 196, 32
    mk = lambda: jnp.asarray(rng.standard_normal((W, H, N, D)), jnp.float32)
    q, k, v = mk(), mk(), mk()
    bias = jnp.asarray(rng.standard_normal((W, H, N, N)) * 0.1, jnp.float32)
    gp = jax.grad(lambda *a: jnp.sum(
        fused_window_attention(*a, 0.125, True) ** 2),
        argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(lambda *a: jnp.sum(jnp_reference(*a, 0.125) ** 2),
                  argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3,
                                   rtol=1e-3)


def test_flash_bwd_rect_unaligned_accumulates():
    """18×28 grid: N=504 spans 8 backward q-blocks (Qb=64) — exercises the
    dk/dv accumulation across grid steps AND zero-padded q rows."""
    q, k, v, rh, rw = _flash_inputs(12, 2, 18, 28, 64)

    def loss_flash(*a):
        return jnp.sum(flash_full_attention(*a, (18, 28), 0.1, True) ** 2)

    def loss_ref(*a):
        return jnp.sum(flash_reference(*a, (18, 28), 0.1) ** 2)

    gp = jax.grad(loss_flash, argnums=(0, 1, 2, 3, 4))(q, k, v, rh, rw)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, rh, rw)
    for i, (a, b) in enumerate(zip(gp, gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3,
                                   rtol=1e-3, err_msg=f"cotangent {i}")


def test_flash_bwd_bf16():
    """bf16 primals: backward returns bf16 dq/dk/dv, f32 drh/drw; values
    match the f32 oracle at bf16 tolerance."""
    q, k, v, rh, rw = _flash_inputs(13, 1, 12, 12, 64)
    qb, kb, vb = (t.astype(jnp.bfloat16) for t in (q, k, v))
    gp = jax.grad(lambda *a: jnp.sum(flash_full_attention(
        *a, (12, 12), 0.125, True).astype(jnp.float32) ** 2),
        argnums=(0, 1, 2, 3, 4))(qb, kb, vb, rh, rw)
    gr = jax.grad(lambda *a: jnp.sum(flash_reference(
        *a, (12, 12), 0.125) ** 2), argnums=(0, 1, 2, 3, 4))(q, k, v, rh, rw)
    assert gp[0].dtype == jnp.bfloat16 and gp[3].dtype == jnp.float32
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), atol=5e-2,
                                   rtol=5e-2)


def test_jnp_bwd_env_fallback(monkeypatch):
    """MTP_ATTN_JNP_BWD=1 restores the legacy recompute backward — same
    gradients (it is the oracle)."""
    monkeypatch.setenv("MTP_ATTN_JNP_BWD", "1")
    rng = np.random.default_rng(14)
    W, H, N, D = 2, 1, 49, 32
    mk = lambda: jnp.asarray(rng.standard_normal((W, H, N, D)), jnp.float32)
    q, k, v = mk(), mk(), mk()
    bias = jnp.zeros((W, H, N, N), jnp.float32)
    gp = jax.grad(lambda *a: jnp.sum(
        fused_window_attention(*a, 0.125, True) ** 2),
        argnums=(0, 1, 2))(q, k, v, bias)
    gr = jax.grad(lambda *a: jnp.sum(jnp_reference(*a, 0.125) ** 2),
                  argnums=(0, 1, 2))(q, k, v, bias)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                   rtol=1e-3)


def test_win_bwd_qblocked_large_n():
    """N=784 (448² full-attention shape) routes to the q-blocked backward
    (the one-shot kernel's (N,N) f32 temporaries blow scoped VMEM there);
    gradients must still match the dense oracle, including dk/dv
    accumulation across 7 q-blocks and padded q rows (784 -> 896)."""
    from mtp_tpu.ops.pallas_attn import _WIN_BWD_ONE_SHOT_MAX
    rng = np.random.default_rng(15)
    W, H, N, D = 1, 2, 784, 32
    assert N > _WIN_BWD_ONE_SHOT_MAX
    mk = lambda: jnp.asarray(rng.standard_normal((W, H, N, D)), jnp.float32)
    q, k, v = mk(), mk(), mk()
    bias = jnp.asarray(rng.standard_normal((W, H, N, N)) * 0.1, jnp.float32)
    gp = jax.grad(lambda *a: jnp.sum(
        fused_window_attention(*a, 0.125, True) ** 2),
        argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(lambda *a: jnp.sum(jnp_reference(*a, 0.125) ** 2),
                  argnums=(0, 1, 2, 3))(q, k, v, bias)
    for i, (a, b) in enumerate(zip(gp, gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3,
                                   rtol=2e-3, err_msg=f"cotangent {i}")
