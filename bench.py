"""Benchmark: ViT-L+RVSA UperNet sliding-window segmentation on one TPU chip.

North-star metric (BASELINE.json): 512²-tile images/sec/chip.  The reference
datum is the SpaceNet test log (~0.84 s/img for ViT-L+RVSA UperNet slide
crop 384 / stride 256, BASELINE.md) — vs_baseline is measured against that
1/0.84 img/s figure.  Geometry matches: 512² tiles, 384² crops, 256 stride
→ 4 crops per tile.

Implementation notes (TPU + remote-compile environment):
- the backbone uses scanned block groups (one compiled group, not 24 blocks),
- the slide loop is a host loop over per-crop jitted programs with on-device
  logit accumulation (the fused whole-slide scan exceeds the remote compile
  server's program size limit; the per-crop program is the same hot code),
- timing is synced by fetching a scalar checksum (device-to-host of one f32),
  because block_until_ready on the relay transport returns early.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

# persistent compile cache: the ViT-L crop program is compiled once and
# reused across bench invocations/rounds
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

BATCH = int(os.environ.get("BENCH_BATCH", "4"))
TILE = int(os.environ.get("BENCH_TILE", "512"))
CROP = int(os.environ.get("BENCH_CROP", "384"))
STRIDE = int(os.environ.get("BENCH_STRIDE", "256"))
ITERS = int(os.environ.get("BENCH_ITERS", "8"))
BASELINE_IMGS_PER_SEC = 1.0 / 0.84


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from mtp_tpu.utils.config import vit_l_rvsa
    from mtp_tpu.models.segmentor import Segmentor
    from mtp_tpu.heads.upernet import resize_bilinear
    from mtp_tpu.eval.slide import slide_origins

    log(f"bench: devices={jax.devices()} batch={BATCH} tile={TILE} "
        f"crop={CROP} stride={STRIDE}")
    cfg = vit_l_rvsa(img_size=TILE, dtype="bfloat16", scan=True,
                     pallas_attn=os.environ.get("BENCH_PALLAS", "1") == "1")
    num_classes = 2  # SpaceNet building segmentation
    model = Segmentor(cfg, num_classes)

    t0 = time.perf_counter()
    variables = jax.jit(
        lambda r: model.init(r, jnp.zeros((1, CROP, CROP, 3), jnp.float32),
                             train=False))(jax.random.PRNGKey(0))
    jax.block_until_ready(variables)
    log(f"bench: init {time.perf_counter() - t0:.1f}s")

    origins = slide_origins(TILE, TILE, CROP, STRIDE)

    # ONE program per tile batch: all crops extracted with static slices,
    # stacked into a (n_crops*B) megabatch, one backbone+head application,
    # scatter-add back.  One dispatch per predict, full MXU batch.
    # `variables` must be an ARGUMENT (closing over it would embed 300M
    # params as HLO constants and blow up compile time).
    @jax.jit
    def predict_fused(variables, images):
        tiles = jnp.concatenate(
            [images[:, y:y + CROP, x:x + CROP, :] for (y, x) in origins], 0)
        out = model.apply(variables, tiles, train=False, deterministic=True)
        logits = resize_bilinear(out, (CROP, CROP)).astype(jnp.float32)
        preds = jnp.zeros((BATCH, TILE, TILE, num_classes), jnp.float32)
        for i, (y, x) in enumerate(origins):
            preds = preds.at[:, y:y + CROP, x:x + CROP].add(
                logits[i * BATCH:(i + 1) * BATCH])
        return preds

    @partial(jax.jit, donate_argnums=(1,))
    def crop_step(variables, preds, images, y, x):
        tile = jax.lax.dynamic_slice(images, (0, y, x, 0),
                                     (BATCH, CROP, CROP, 3))
        out = model.apply(variables, tile, train=False, deterministic=True)
        logits = resize_bilinear(out, (CROP, CROP)).astype(jnp.float32)
        patch = jax.lax.dynamic_slice(
            preds, (0, y, x, 0), (BATCH, CROP, CROP, num_classes))
        return jax.lax.dynamic_update_slice(preds, patch + logits, (0, y, x, 0))

    @jax.jit
    def checksum(preds):
        return preds.sum()

    # measured on this chip: per-crop dispatches beat the fused megabatch
    # (8.28 vs 6.38 img/s) — larger batches run past the throughput knee
    FUSED = os.environ.get("BENCH_FUSED", "0") == "1"

    def predict(images):
        if FUSED:
            return predict_fused(variables, images)
        preds = jnp.zeros((BATCH, TILE, TILE, num_classes), jnp.float32)
        for (y, x) in origins:
            preds = crop_step(variables, preds, images, y, x)
        return preds

    images = jnp.asarray(
        np.random.default_rng(0).standard_normal((BATCH, TILE, TILE, 3)),
        jnp.float32)

    # compile + warmup (sync via scalar fetch)
    t0 = time.perf_counter()
    float(checksum(predict(images)))
    log(f"bench: compile+warmup {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    for _ in range(ITERS):
        preds = predict(images)
    float(checksum(preds))
    dt = time.perf_counter() - t0

    imgs_per_sec = BATCH * ITERS / dt
    log(f"bench: {dt:.3f}s for {ITERS} iters of {BATCH} tiles")
    print(json.dumps({
        "metric": "vit_l_rvsa_upernet_slide512_images_per_sec_per_chip",
        "value": round(imgs_per_sec, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / BASELINE_IMGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
