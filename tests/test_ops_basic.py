"""Window partition round-trip + relative-position bias parity checks."""

import numpy as np
import jax.numpy as jnp

from mtp_tpu.ops.window import window_partition, window_reverse, pad_hw
from mtp_tpu.ops.rel_pos import (add_decomposed_rel_pos, rel_pos_indices,
                                 swin_rel_pos_bias, swin_rel_pos_index)


def test_window_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 14, 21, 8)).astype(np.float32))
    w = window_partition(x, 7)
    assert w.shape == (2 * 2 * 3, 49, 8)
    back = window_reverse(w, 7, 14, 21)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_pad_hw():
    x = jnp.ones((1, 10, 12, 3))
    xp, (pt, pb, pl, pr) = pad_hw(x, 7)
    assert xp.shape == (1, 14, 14, 3)
    # reference splits padding as top = pad//2
    assert (pt, pb, pl, pr) == (2, 2, 1, 1)
    assert float(xp[0, 0, 5, 0]) == 0.0  # padded row is zero
    assert float(xp[0, 2, 1, 0]) == 1.0


def test_rel_pos_indices_square():
    idx = rel_pos_indices(7, 7)
    assert idx.shape == (7, 7)
    assert idx.min() == 0 and idx.max() == 12
    # dist[i,k] = i - k + 6
    assert idx[0, 0] == 6 and idx[6, 0] == 12 and idx[0, 6] == 0


def test_decomposed_rel_pos_reference_math():
    """Check against a direct einsum of the definition."""
    rng = np.random.default_rng(1)
    B, nH, hd = 2, 3, 4
    qh = qw = kh = kw = 5
    q = rng.standard_normal((B, nH, qh * qw, hd)).astype(np.float32)
    attn = rng.standard_normal((B, nH, qh * qw, kh * kw)).astype(np.float32)
    rh = rng.standard_normal((qh + kh - 1, hd)).astype(np.float32)
    rw = rng.standard_normal((qw + kw - 1, hd)).astype(np.float32)

    out = add_decomposed_rel_pos(jnp.asarray(attn), jnp.asarray(q), (qh, qw),
                                 (kh, kw), jnp.asarray(rh), jnp.asarray(rw))

    # naive
    Rh = rh[np.asarray(rel_pos_indices(qh, kh))]
    Rw = rw[np.asarray(rel_pos_indices(qw, kw))]
    rq = q.reshape(B, nH, qh, qw, hd)
    rel_h = np.einsum("bnhwc,hkc->bnhwk", rq, Rh)
    rel_w = np.einsum("bnhwc,wkc->bnhwk", rq, Rw)
    ref = attn.reshape(B, nH, qh, qw, kh, kw) + rel_h[..., :, None] + rel_w[..., None, :]
    np.testing.assert_allclose(np.asarray(out), ref.reshape(attn.shape),
                               atol=1e-5, rtol=1e-5)


def test_swin_bias_symmetry():
    idx = swin_rel_pos_index(7, 7)
    assert idx.shape == (49, 49)
    assert idx.max() < 13 * 13
    # same relative displacement → same index
    assert idx[0, 1] == idx[1, 2]
    rng = np.random.default_rng(2)
    table = jnp.asarray(rng.standard_normal((169, 12)).astype(np.float32))
    bias = swin_rel_pos_bias(table, idx)
    assert bias.shape == (12, 49, 49)
    np.testing.assert_allclose(np.asarray(bias)[:, 0, 1], np.asarray(bias)[:, 1, 2])


def test_step_schedule_multistep_lr():
    """kind='step' == reference MultiStepLR (milestones [8,11]/12 epochs,
    gamma 0.1) over a 1200-step run."""
    from mtp_tpu.core.optim import make_schedule
    from mtp_tpu.utils.config import ScheduleConfig
    s = make_schedule(ScheduleConfig(kind="step", total_steps=1200,
                                     warmup_steps=0), 1e-4)
    import numpy as np
    assert np.isclose(float(s(0)), 1e-4)
    assert np.isclose(float(s(799)), 1e-4)
    assert np.isclose(float(s(800)), 1e-5)
    assert np.isclose(float(s(1100)), 1e-6)
