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
