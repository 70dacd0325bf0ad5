"""DCNv3 core fwd/bwd timing at InternImage-XL stage shapes on the chip.

XL train step measured 5900 ms/iter (bs8 224²) — ~50x off a FLOPs
estimate.  Suspect: grid_sample's backward scatter-add (gc=16-channel
updates, ~10M taps) and/or the narrow-lane gathers.  This isolates
dcnv3_core per stage.
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp
import numpy as np

from mtp_tpu.ops.dcnv3 import dcnv3_core
from mtp_tpu.ops.dcnv3_pallas import dcnv3_core_onehot

if os.environ.get("DM_ONEHOT", "0") == "1":
    dcnv3_core = dcnv3_core_onehot  # noqa: F811 — A/B via env

BS = int(os.environ.get("DM_BS", "8"))
ITERS = int(os.environ.get("DM_ITERS", "5"))
# InternImage-XL stages at 224²: (H, C, G, depth)
STAGES = [(56, 192, 12, 5), (28, 384, 24, 5), (14, 768, 48, 24),
          (7, 1536, 96, 5)]


def timeit(name, fn, *args):
    try:
        out = fn(*args)
        jax.block_until_ready(out)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / ITERS * 1000
        print(f"{name:46s} {dt:8.2f} ms", flush=True)
        return dt
    except Exception as e:
        print(f"{name:46s} FAILED {type(e).__name__}: {str(e)[:100]}",
              flush=True)
        return float("nan")


def main():
    print(f"devices={jax.devices()} bs={BS}", flush=True)
    rng = np.random.default_rng(0)
    tot_f = tot_b = 0.0
    for H, C, G, depth in STAGES:
        P = 9
        x = jnp.asarray(rng.standard_normal(
            (BS, H, H, C)).astype(np.float32), jnp.bfloat16)
        off = jnp.asarray(rng.standard_normal(
            (BS, H, H, G * P * 2)).astype(np.float32) * 0.5, jnp.bfloat16)
        mask = jax.nn.softmax(jnp.asarray(rng.standard_normal(
            (BS, H, H, G * P)).astype(np.float32), jnp.bfloat16)
            .reshape(BS, H, H, G, P)).reshape(BS, H, H, G * P)

        @jax.jit
        def fwd(x, o, m):
            return dcnv3_core(x, o, m, group=G)

        @jax.jit
        def bwd(x, o, m):
            # value_and_grad: plain grad discards the primal and XLA DCEs
            # the forward kernel — "fwd+bwd" would time the backward alone
            return jax.value_and_grad(lambda xx, oo: jnp.sum(
                dcnv3_core(xx, oo, m, group=G).astype(jnp.float32)),
                argnums=(0, 1))(x, o)

        f = timeit(f"stage H={H} C={C} G={G} fwd", fwd, x, off, mask)
        b = timeit(f"stage H={H} C={C} G={G} fwd+bwd", bwd, x, off, mask)
        if f == f:
            tot_f += f * depth
        if b == b:
            tot_b += b * depth
    print(f"depth-weighted totals: fwd {tot_f:.0f} ms, "
          f"fwd+bwd {tot_b:.0f} ms (XL step measured 5900 ms)", flush=True)


if __name__ == "__main__":
    main()
