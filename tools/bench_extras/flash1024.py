"""On-chip ViT-L at 1024² (4096 tokens): flash kernel vs jnp path.

The detection/pretrain resolutions hit the full-attention blocks at token
counts where (N, N) scores can't live in one VMEM cell; this times the
q-blocked flash kernel end to end (VERDICT r2 item 4 'Done' condition).

FLASH_BWD=1 also times fwd+bwd (grad wrt params) — the round-5 Pallas
backward vs the jnp-recompute fallback (MTP_ATTN_JNP_BWD=1 for the A/B).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp
import numpy as np
from mtp_tpu.models.vit_rvsa import ViTRVSA
from mtp_tpu.utils.config import vit_l_rvsa

SIZE = int(os.environ.get("FLASH_SIZE", "1024"))
PALLAS = os.environ.get("FLASH_PALLAS", "1") == "1"
ITERS = int(os.environ.get("FLASH_ITERS", "6"))
BWD = os.environ.get("FLASH_BWD", "0") == "1"
REMAT = os.environ.get("FLASH_REMAT", "1") == "1"

cfg = vit_l_rvsa(img_size=SIZE, dtype="bfloat16", scan=True, remat=REMAT,
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

@jax.jit
def fwdbwd(v, x):
    g = jax.grad(lambda v: fwd(v, x))(v)
    leaves = jax.tree.leaves(g)
    return sum(l.astype(jnp.float32).sum() for l in leaves)

def timeit(name, fn):
    t0 = time.perf_counter()
    c = float(fn(variables, x))
    print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s "
          f"checksum {c:.2f}", flush=True)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        c = fn(variables, x)
    float(c)
    dt = (time.perf_counter()-t0)/ITERS*1e3
    print(f"flash1024: size={SIZE} pallas={PALLAS} "
          f"jnp_bwd={bool(os.environ.get('MTP_ATTN_JNP_BWD'))} "
          f"{name} {dt:.1f} ms", flush=True)

timeit("fwd", fwd)
if BWD:
    timeit("fwd+bwd", fwdbwd)
