"""DCNv3 core parity vs a torch grid_sample oracle implementing the
reference spec (`dcnv3_core_pytorch`, ops_dcnv3/functions/dcnv3_func.py:174),
mirroring the reference's own CUDA-vs-pytorch test (ops_dcnv3/test.py)."""

import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from mtp_tpu.ops.dcnv3 import DCNv3, dcnv3_core


def torch_oracle(x, offset, mask, K, stride, pad, dilation, group, offset_scale):
    """Channels-last torch implementation of the published spec."""
    N, H, W, C = x.shape
    gc = C // group
    P = K * K
    xp = F.pad(torch.from_numpy(x), (0, 0, pad, pad, pad, pad))
    _, H_in, W_in, _ = xp.shape
    Ho = (H_in - (dilation * (K - 1) + 1)) // stride + 1
    Wo = (W_in - (dilation * (K - 1) + 1)) // stride + 1

    base = (dilation * (K - 1)) // 2 + 0.5
    ref_y, ref_x = torch.meshgrid(
        torch.linspace(base, base + (Ho - 1) * stride, Ho),
        torch.linspace(base, base + (Wo - 1) * stride, Wo), indexing="ij")
    ref = torch.stack((ref_x.reshape(-1)[None] / W_in,
                       ref_y.reshape(-1)[None] / H_in), -1)
    ref = ref.reshape(1, Ho, Wo, 1, 2)

    start = -((dilation * (K - 1)) // 2)
    tx, ty = torch.meshgrid(
        torch.linspace(start, start + (K - 1) * dilation, K),
        torch.linspace(start, start + (K - 1) * dilation, K), indexing="ij")
    grid = torch.stack([tx.reshape(-1) / W_in, ty.reshape(-1) / H_in], -1)
    grid = grid.reshape(1, 1, 1, P, 2).repeat(1, 1, 1, group, 1) \
        if False else grid.reshape(-1, 1, 2).repeat(1, group, 1).permute(1, 0, 2)
    grid = grid.reshape(1, 1, 1, group * P, 2)

    spatial_norm = torch.tensor([W_in, H_in]).reshape(1, 1, 1, 2).repeat(
        1, 1, 1, group * P)
    loc = (ref + grid * offset_scale).repeat(N, 1, 1, 1, 1).flatten(3, 4)
    loc = loc + torch.from_numpy(offset) * offset_scale / spatial_norm
    grids = 2 * loc - 1

    input_ = xp.view(N, H_in * W_in, group * gc).transpose(1, 2).reshape(
        N * group, gc, H_in, W_in)
    sg = grids.view(N, Ho * Wo, group, P, 2).transpose(1, 2).flatten(0, 1)
    sampled = F.grid_sample(input_, sg, mode="bilinear", padding_mode="zeros",
                            align_corners=False)
    m = torch.from_numpy(mask).view(N, Ho * Wo, group, P).transpose(1, 2) \
        .reshape(N * group, 1, Ho * Wo, P)
    out = (sampled * m).sum(-1).view(N, group * gc, Ho * Wo)
    return out.transpose(1, 2).reshape(N, Ho, Wo, -1).numpy()


def test_core_matches_oracle():
    rng = np.random.default_rng(0)
    N, H, W, G, gc, K = 2, 9, 11, 3, 4, 3
    C = G * gc
    x = rng.standard_normal((N, H, W, C)).astype(np.float32)
    offset = (rng.standard_normal((N, H, W, G * K * K * 2)) * 2).astype(np.float32)
    mask = rng.uniform(0, 1, (N, H, W, G * K * K)).astype(np.float32)

    ours = np.asarray(jax.jit(
        lambda x, o, m: dcnv3_core(x, o, m, kernel=K, group=G,
                                   offset_scale=1.5))(x, offset, mask))
    ref = torch_oracle(x, offset, mask, K, 1, 1, 1, G, 1.5)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_core_zero_offset_uniform_mask_is_avgpool():
    """Zero offsets + uniform mask = dilated box filter over the padded map."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    K, G = 3, 2
    offset = np.zeros((1, 8, 8, G * K * K * 2), np.float32)
    mask = np.full((1, 8, 8, G * K * K), 1.0 / (K * K), np.float32)
    out = np.asarray(dcnv3_core(jnp.asarray(x), jnp.asarray(offset),
                                jnp.asarray(mask), kernel=K, group=G))
    ref = F.avg_pool2d(F.pad(torch.from_numpy(x).permute(0, 3, 1, 2),
                             (1, 1, 1, 1)), 3, stride=1).permute(0, 2, 3, 1)
    np.testing.assert_allclose(out, ref.numpy(), atol=1e-5)


def test_module_runs_and_grads():
    mod = DCNv3(channels=12, group=3)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((2, 8, 8, 12)),
                    jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    out = jax.jit(mod.apply)({"params": params}, x)
    assert out.shape == (2, 8, 8, 12)
    # zero-init offset/mask → first forward must be finite & non-degenerate
    assert np.isfinite(np.asarray(out)).all()
    g = jax.jit(jax.grad(lambda p: jnp.sum(mod.apply({"params": p}, x) ** 2)))(params)
    assert all(np.isfinite(np.asarray(t)).all() for t in jax.tree.leaves(g))
