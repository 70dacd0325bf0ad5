"""Benchmark: ViT-L+RVSA UperNet sliding-window segmentation on one TPU chip.

North-star metric (BASELINE.json): 512²-tile images/sec/chip.  The reference
datum is the SpaceNet test log (~0.84 s/img for ViT-L+RVSA UperNet slide
crop 384 / stride 256, BASELINE.md) — vs_baseline is measured against that
1/0.84 img/s figure.  Geometry here matches: 512² tiles, 384² crops, 256
stride → 4 crops per tile, compiled as one jitted scan.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

# persistent compile cache: the ViT-L slide program is compiled once and
# reused across bench invocations/rounds
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

BATCH = int(os.environ.get("BENCH_BATCH", "4"))
TILE = int(os.environ.get("BENCH_TILE", "512"))
ITERS = int(os.environ.get("BENCH_ITERS", "8"))
BASELINE_IMGS_PER_SEC = 1.0 / 0.84


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    log(f"bench: devices={jax.devices()} batch={BATCH} tile={TILE}")
    from mtp_tpu.utils.config import SlideConfig, vit_l_rvsa
    from mtp_tpu.models.segmentor import Segmentor
    from mtp_tpu.heads.upernet import resize_bilinear
    from mtp_tpu.eval.slide import slide_inference

    # scanned block groups: one compiled group instead of 24 unrolled blocks
    cfg = vit_l_rvsa(img_size=TILE, dtype="bfloat16", scan=True)
    num_classes = 2  # SpaceNet building segmentation
    model = Segmentor(cfg, num_classes)

    rng = jax.random.PRNGKey(0)
    # jit the init: eager init would dispatch hundreds of tiny ops (very slow
    # through a remote-device tunnel)
    t0 = time.perf_counter()
    variables = jax.jit(
        lambda r: model.init(r, jnp.zeros((1, 384, 384, 3), jnp.float32),
                             train=False))(rng)
    jax.block_until_ready(variables)
    log(f"bench: init {time.perf_counter() - t0:.1f}s")
    # pos_embed is sized for 384² crops inside the slide loop
    slide = SlideConfig(crop=384, stride=256)

    def apply_crop(tile):
        out = model.apply(variables, tile, train=False, deterministic=True)
        return resize_bilinear(out, tile.shape[1:3])

    @jax.jit
    def predict(images):
        logits = slide_inference(apply_crop, images, num_classes, slide)
        return logits.argmax(-1)

    images = jnp.asarray(
        np.random.default_rng(0).standard_normal((BATCH, TILE, TILE, 3)),
        jnp.float32)

    # compile + warmup
    t0 = time.perf_counter()
    predict(images).block_until_ready()
    log(f"bench: compile+warmup {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    for _ in range(ITERS):
        pred = predict(images)
    pred.block_until_ready()
    dt = time.perf_counter() - t0

    imgs_per_sec = BATCH * ITERS / dt
    print(json.dumps({
        "metric": "vit_l_rvsa_upernet_slide512_images_per_sec_per_chip",
        "value": round(imgs_per_sec, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / BASELINE_IMGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
