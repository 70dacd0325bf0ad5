"""On-chip InternImage-XL classification train step (remat/scan analog of
the reference's with_cp=True training; VERDICT r2 item 5 'Done' condition)."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp
import numpy as np
from mtp_tpu.tasks.classification import ClassificationTask
from mtp_tpu.models.backbones import internimage_backbone_config
from mtp_tpu.utils.config import (MeshConfig, OptimizerConfig, ScheduleConfig,
                                  TaskConfig, TrainConfig)

BS = int(os.environ.get("II_BS", "8"))
SIZE = int(os.environ.get("II_SIZE", "224"))
REMAT = os.environ.get("II_REMAT", "1") == "1"
SCAN = os.environ.get("II_SCAN", "1") == "1"
PALLAS = os.environ.get("II_PALLAS", "0") == "1"  # one-hot DCNv3 kernel
ITERS = int(os.environ.get("II_ITERS", "6"))

bb = internimage_backbone_config("internimage_xl", SIZE, dtype="bfloat16",
                                 remat=REMAT, scan=SCAN, drop_path_rate=0.2,
                                 pallas_attn=PALLAS)
cfg = TaskConfig(task="classification", num_classes=10, backbone=bb,
                 train=TrainConfig(optimizer=OptimizerConfig(lr=2e-5, layer_decay=0.94),
                                   schedule=ScheduleConfig(kind="cosine", total_steps=1000),
                                   mesh=MeshConfig(data=1, model=1)))
task = ClassificationTask(cfg)
t0 = time.perf_counter()
state = task.init_state(jax.random.PRNGKey(0))
jax.block_until_ready(state.params)
print(f"init {time.perf_counter()-t0:.1f}s", flush=True)
rng = np.random.default_rng(0)
batch = {"image": jnp.asarray(rng.standard_normal((BS, SIZE, SIZE, 3)), jnp.float32),
         "label": jnp.asarray(rng.integers(0, 10, BS), jnp.int32)}
step = task.train_step_fn()
t0 = time.perf_counter()
state, m = step(state, batch)
print(f"compile+first {time.perf_counter()-t0:.1f}s loss {float(m['loss']):.3f}", flush=True)
t0 = time.perf_counter()
for _ in range(ITERS):
    state, m = step(state, batch)
float(m["loss"])
dt = (time.perf_counter()-t0)/ITERS*1e3
print(f"internimage_xl: bs={BS} size={SIZE} remat={REMAT} scan={SCAN} "
      f"{dt:.0f} ms/iter ({BS/dt*1e3:.1f} img/s)", flush=True)
