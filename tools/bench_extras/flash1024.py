"""On-chip ViT-L forward at 1024² (4096 tokens): flash kernel vs jnp path.

The detection/pretrain resolutions hit the full-attention blocks at token
counts where (N, N) scores can't live in one VMEM cell; this times the
q-blocked flash kernel end to end (VERDICT r2 item 4 'Done' condition)."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp
import numpy as np
from mtp_tpu.models.vit_rvsa import ViTRVSA
from mtp_tpu.utils.config import vit_l_rvsa

SIZE = int(os.environ.get("FLASH_SIZE", "1024"))
PALLAS = os.environ.get("FLASH_PALLAS", "1") == "1"
ITERS = int(os.environ.get("FLASH_ITERS", "6"))

cfg = vit_l_rvsa(img_size=SIZE, dtype="bfloat16", scan=True,
                 pallas_attn=PALLAS)
model = ViTRVSA(cfg)
x = jnp.asarray(np.random.default_rng(0).standard_normal(
    (1, SIZE, SIZE, 3)), jnp.float32)
t0 = time.perf_counter()
variables = jax.jit(lambda r: model.init(r, x))(jax.random.PRNGKey(0))
jax.block_until_ready(variables)
print(f"init {time.perf_counter()-t0:.1f}s", flush=True)

@jax.jit
def fwd(v, x):
    outs = model.apply(v, x)
    return sum(o.astype(jnp.float32).sum() for o in outs)

t0 = time.perf_counter()
c = float(fwd(variables, x))
print(f"compile+first {time.perf_counter()-t0:.1f}s checksum {c:.2f}", flush=True)
t0 = time.perf_counter()
for _ in range(ITERS):
    c = fwd(variables, x)
float(c)
dt = (time.perf_counter()-t0)/ITERS*1e3
print(f"flash1024: size={SIZE} pallas={PALLAS} {dt:.1f} ms/fwd", flush=True)
