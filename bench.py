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

# Persistent compile cache.  NOTE (measured, round 3): the axon backend never
# writes chip executables into this cache — only host/CPU programs land here —
# so bench cold-starts always pay the remote compile server.  That server's
# latency swings wildly (a trivial 512² matmul compiled in 20 s … 218 s within
# one hour on 2026-08-17); the probe below measures it per run so warmup
# numbers can be read against the server's health at that moment.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

BATCH = int(os.environ.get("BENCH_BATCH", "4"))
TILE = int(os.environ.get("BENCH_TILE", "512"))
CROP = int(os.environ.get("BENCH_CROP", "384"))
STRIDE = int(os.environ.get("BENCH_STRIDE", "256"))
ITERS = int(os.environ.get("BENCH_ITERS", "8"))
BASELINE_IMGS_PER_SEC = 1.0 / 0.84


def log(msg):
    print(msg, file=sys.stderr, flush=True)


# A healthy compile server does the trivial probe in a few seconds; the
# measured pathology (round 3) is 20 s … 393 s for the SAME program within
# hours.  Past this threshold the env is flagged so cross-round BENCH
# comparisons stay honest (VERDICT r4 weak #6).
PROBE_DEGRADED_S = float(os.environ.get("BENCH_PROBE_DEGRADED_S", "60"))


def probe_compile_latency():
    """Compile a trivial fixed program on the chip and time it.  The remote
    compile server's latency dominates bench warmup and varies ~10× run to
    run; reporting it makes warmup regressions attributable.  If the first
    probe is degraded, re-probe once (fresh program shape — the server does
    not cache across shapes) to distinguish a blip from sustained load."""
    import jax
    import jax.numpy as jnp

    probes = []
    for n in (256, 272):
        @jax.jit
        def _probe(x):
            return (x @ x).sum()

        t0 = time.perf_counter()
        float(_probe(jnp.ones((n, n), jnp.bfloat16)))
        dt = time.perf_counter() - t0
        probes.append(dt)
        log(f"bench: compile-server probe ({n}^2 matmul, cold) {dt:.1f}s")
        if dt <= PROBE_DEGRADED_S:
            break
    degraded = min(probes) > PROBE_DEGRADED_S
    if degraded:
        log(f"bench: WARNING compile server degraded (probe min "
            f"{min(probes):.0f}s > {PROBE_DEGRADED_S:.0f}s threshold); "
            "warmup/compile times this run are not comparable across rounds")
    return {"probe_s": round(min(probes), 1), "env_degraded": degraded}


def bench_pretrain():
    """Flagship multitask pretraining step on the chip (VERDICT r2 item 1).

    Reference protocol (Readme.md:234-240): ViT-L+RVSA, image_size 448,
    batch 3 per device in 'avg' mode (1 image per SAMRS dataset), remat on
    (--use_ckpt 'True'), AdamW + layer decay + cosine.  The step here is the
    full 9-way loss (3 datasets × ss/is/rd) + optimizer update, jitted as one
    program.  Reports ms/step, images/sec/chip and peak HBM.

    vs_baseline is FLOPs-normalized against the reference's only published
    hardware datum (EuroSAT cls train, ViT-L 224² bs8, 1.18 s/iter →
    6.78 img/s/DCU, BASELINE.md): ratio of backbone train-FLOPs/sec, ours at
    448² vs the reference's at 224².
    """
    import jax
    import jax.numpy as jnp
    from mtp_tpu.models.vit_rvsa import backbone_flops
    from mtp_tpu.tasks.multitask import MultiTaskPretrainTask
    from mtp_tpu.utils.config import (MeshConfig, OptimizerConfig,
                                      ScheduleConfig, TaskConfig, TrainConfig,
                                      BACKBONES)

    name = os.environ.get("BENCH_BACKBONE", "vit_l_rvsa")
    size = int(os.environ.get("BENCH_PRETRAIN_SIZE", "448"))
    per_ds = int(os.environ.get("BENCH_PRETRAIN_BS", "1"))  # per dataset
    iters = int(os.environ.get("BENCH_PRETRAIN_ITERS", "8"))
    # remat default OFF: the reference needs use_ckpt=True to fit (torch
    # materializes (B,nH,N,N) scores); our Pallas kernels never materialize
    # them, bs3 448² ViT-L fits in HBM, and no-remat measures 477 vs 534
    # ms/step (PERF.md round 5).  BENCH_PRETRAIN_REMAT=1 restores parity
    # with the reference protocol's memory regime.
    remat = os.environ.get("BENCH_PRETRAIN_REMAT", "0") == "1"
    B = 3 * per_ds

    log(f"bench[pretrain]: devices={jax.devices()} backbone={name} "
        f"size={size} batch={B} (per-ds {per_ds}) remat={remat}")
    probe = probe_compile_latency()

    pallas = os.environ.get("BENCH_PALLAS", "1") == "1"
    if name.startswith("internimage"):
        # reference MTP also pretrains InternImage-XL (models.py:92-104)
        from mtp_tpu.models.backbones import internimage_backbone_config
        from mtp_tpu.models.internimage import (internimage_flops,
                                                internimage_t, internimage_xl)
        bb = internimage_backbone_config(
            name, img_size=size, dtype="bfloat16", scan=True, remat=remat,
            pallas_attn=pallas, drop_path_rate=0.2)
        icfg = internimage_t() if name.endswith("_t") else internimage_xl()
        flops_of = lambda s: internimage_flops(icfg, s)
    else:
        bb = BACKBONES[name](
            img_size=size, dtype="bfloat16", scan=True, remat=remat,
            pallas_attn=pallas, drop_path_rate=0.1)
        flops_of = lambda s: backbone_flops(
            BACKBONES[name](img_size=s) if s != size else bb)
    cfg = TaskConfig(
        task="multitask", num_classes=0, backbone=bb,
        train=TrainConfig(
            optimizer=OptimizerConfig(lr=1e-4),
            schedule=ScheduleConfig(kind="cosine", total_steps=80000,
                                    warmup_steps=1500),
            mesh=MeshConfig(data=1, model=1)))
    det_overrides = json.loads(os.environ.get("BENCH_DET_OVERRIDES", "{}"))
    # BENCH_TASKS=ss | ss,is | ... — task-subset knockout attribution
    # (mirrors the reference's --tasks; full 9-way step is the default)
    tasks = tuple(os.environ.get("BENCH_TASKS", "ss,is,rd").split(","))
    task = MultiTaskPretrainTask(cfg, det_overrides=det_overrides, tasks=tasks)

    t0 = time.perf_counter()
    state = task.init_state(jax.random.PRNGKey(0))
    jax.block_until_ready(state.params)
    log(f"bench[pretrain]: init {time.perf_counter() - t0:.1f}s")

    # synthetic batch at the reference training shape: G padded gt per image,
    # masks at stride-4 resolution (the detection task's target format)
    G = 24
    rng = np.random.default_rng(0)
    batch = {}
    for d, ncls in enumerate(task.model.classes):
        xy = rng.uniform(16, size - 80, (per_ds, G, 2))
        wh = rng.uniform(16, 64, (per_ds, G, 2))
        valid = np.zeros((per_ds, G), bool)
        valid[:, :12] = True
        batch[f"d{d}"] = {
            "image": rng.standard_normal(
                (per_ds, size, size, 3)).astype(np.float32),
            "ss_label": rng.integers(
                0, ncls, (per_ds, size, size)).astype(np.int32),
            "gt_boxes": np.concatenate([xy, xy + wh], -1).astype(np.float32),
            "gt_labels": rng.integers(0, ncls, (per_ds, G)).astype(np.int32),
            "gt_valid": valid,
            "gt_masks": (rng.uniform(size=(per_ds, G, size // 4, size // 4))
                         > 0.5).astype(np.float32),
            "r_gt_boxes": np.stack(
                [rng.uniform(64, size - 64, (per_ds, G)),
                 rng.uniform(64, size - 64, (per_ds, G)),
                 rng.uniform(24, 60, (per_ds, G)),
                 rng.uniform(12, 30, (per_ds, G)),
                 rng.uniform(-1.2, 1.2, (per_ds, G))], -1).astype(np.float32),
            "r_gt_labels": rng.integers(0, ncls, (per_ds, G)).astype(np.int32),
            "r_gt_valid": valid,
        }
    batch = jax.tree.map(jnp.asarray, batch)

    step = task.train_step_fn()
    t0 = time.perf_counter()
    state, metrics = step(state, batch)
    loss0 = float(metrics["loss"])
    log(f"bench[pretrain]: compile+first step {time.perf_counter() - t0:.1f}s "
        f"loss {loss0:.3f}")
    log("bench[pretrain]: losses " + " ".join(
        f"{k}={float(v):.2f}" for k, v in sorted(metrics.items())
        if np.isscalar(float(v))))
    assert np.isfinite(loss0), metrics

    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch)
    lossN = float(metrics["loss"])  # sync via scalar fetch (relay-safe)
    dt = time.perf_counter() - t0
    ms = dt / iters * 1e3
    imgs = B * iters / dt
    # fixed-batch overfit signal: the 9-way loss must decrease over the run
    log(f"bench[pretrain]: loss {loss0:.3f} -> {lossN:.3f} after "
        f"{iters + 1} steps")

    hbm_gb = float("nan")
    try:
        stats = jax.devices()[0].memory_stats()
        hbm_gb = stats.get("peak_bytes_in_use", stats.get("bytes_in_use", 0)) / 2**30
    except Exception:
        pass
    log(f"bench[pretrain]: {ms:.0f} ms/step, {imgs:.2f} img/s/chip, "
        f"peak HBM {hbm_gb:.2f} GiB")

    # FLOPs-normalized baseline: reference EuroSAT datum is a plain ViT-L
    # train step (fwd+bwd ≈ 3× fwd FLOPs) at 224² bs8, 1.18 s/iter (their
    # only published hardware number; for InternImage the ratio compares
    # OUR XL flops/sec against THEIR ViT-L flops/sec)
    ref_flops_s = 3 * backbone_flops(
        BACKBONES["vit_l_rvsa"](img_size=224)) * 8 / 1.18
    ours_flops_s = 3 * flops_of(size) * B / (dt / iters)
    rec = {
        "metric": f"{name}_multitask_pretrain{size}_images_per_sec_per_chip",
        "value": round(imgs, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(ours_flops_s / ref_flops_s, 3),
        "ms_per_step": round(ms, 1),
        **probe,
    }
    if np.isfinite(hbm_gb):  # memory_stats() is unavailable through the relay
        rec["peak_hbm_gib"] = round(hbm_gb, 2)
    print(json.dumps(rec))


def main():
    if os.environ.get("BENCH_MODE", "slide") == "pretrain":
        return bench_pretrain()
    import jax
    import jax.numpy as jnp
    from mtp_tpu.utils.config import vit_l_rvsa
    from mtp_tpu.models.segmentor import Segmentor
    from mtp_tpu.heads.upernet import resize_bilinear
    from mtp_tpu.eval.slide import slide_origins

    log(f"bench: devices={jax.devices()} batch={BATCH} tile={TILE} "
        f"crop={CROP} stride={STRIDE}")
    probe = probe_compile_latency()
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
        **probe,
    }))


if __name__ == "__main__":
    sys.exit(main())
