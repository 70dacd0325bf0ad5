"""Epoch-scale 9-way multitask evaluation on the chip (VERDICT r4 item 7).

The round-4 eval-host-share datum (41% -> 7%) came from 36 synthetic
images; real SAMRS validation is thousands.  This drives the REAL
`MultiTaskPretrainTask.evaluate` over an on-disk SAMRS-shaped fixture
(tools/bench_extras/samrs_fixture.py) for a full epoch — PNG decode, the
joint valid pipeline, the backpressure-bounded thread pool — and reports
img/s, the device/host split, and peak RSS (flat memory = the pending
deque bound works at epoch scale).

    python tools/bench_extras/samrs_fixture.py --out /tmp/samrs_ep --n 168
    python tools/bench_extras/epoch_eval.py --data-root /tmp/samrs_ep
"""
import argparse
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--size", type=int, default=448)
    ap.add_argument("--batch-size", type=int, default=6)  # global, 3 ds
    ap.add_argument("--backbone", default="vit_l_rvsa")
    ap.add_argument("--max-batches", type=int, default=0)
    args = ap.parse_args()

    from mtp_tpu.data.bindings import build_samrs_loaders
    from mtp_tpu.tasks.multitask import MultiTaskPretrainTask
    from mtp_tpu.utils.config import (BACKBONES, MeshConfig, OptimizerConfig,
                                      ScheduleConfig, TaskConfig, TrainConfig)

    bb = BACKBONES[args.backbone](img_size=args.size, dtype="bfloat16",
                                  scan=True, pallas_attn=True)
    cfg = TaskConfig(task="multitask", num_classes=0, backbone=bb,
                     train=TrainConfig(
                         optimizer=OptimizerConfig(lr=1e-4),
                         schedule=ScheduleConfig(kind="cosine",
                                                 total_steps=1000),
                         mesh=MeshConfig(data=1, model=1)))
    task = MultiTaskPretrainTask(cfg)
    print(f"devices={jax.devices()} size={args.size} "
          f"batch={args.batch_size}", flush=True)
    t0 = time.perf_counter()
    state = task.init_state(jax.random.PRNGKey(0))
    jax.block_until_ready(state.params)
    print(f"init {time.perf_counter()-t0:.1f}s", flush=True)

    datasets, loaders, sizes = build_samrs_loaders(
        args.data_root, args.size, args.batch_size, split="val",
        train=False, alloc="avg", max_gts=60)
    n_imgs = sum(len(d) for d in datasets)
    n_batches = min(len(l) for l in loaders)
    print(f"datasets {[len(d) for d in datasets]} per-ds batch {sizes} "
          f"-> {n_batches} batches", flush=True)

    def epoch():
        its = [l.epoch(0) for l in loaders]
        for _ in range(n_batches):
            yield {f"d{d}": next(it) for d, it in enumerate(its)}

    t0 = time.perf_counter()
    res = task.evaluate(state, epoch(), max_batches=args.max_batches)
    wall = time.perf_counter() - t0
    used = (min(args.max_batches, n_batches) if args.max_batches
            else n_batches) * sum(sizes)
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20
    dev, host = res.get("eval_device_s", 0), res.get("eval_host_s", 0)
    print({k: round(float(v), 2) for k, v in res.items()}, flush=True)
    print(f"epoch_eval: {used} images in {wall:.1f}s = {used/wall:.2f} "
          f"img/s | device {dev:.1f}s host {host:.1f}s "
          f"(host share {100*host/max(dev+host,1e-9):.0f}% of attributed) "
          f"| peak RSS {rss_gb:.2f} GiB", flush=True)


if __name__ == "__main__":
    main()
