"""Micro-benchmark: exact large-k top-k strategies on the chip.

gen_proposals takes top-2000 per FPN level (lax.top_k), measured at
~235 ms per B=3 application — the largest single det-path cost.  XLA's
TPU top_k is optimized for small k; at k=2000 a full bitonic
sort-and-slice or a variadic lax.sort may be far faster.  approx_max_k
is included as a bound (not adopted without a documented deviation).
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp
import numpy as np

N = int(os.environ.get("TK_N", "37632"))
K = int(os.environ.get("TK_K", "2000"))
B = int(os.environ.get("TK_B", "1"))
ITERS = int(os.environ.get("TK_ITERS", "20"))


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
        print(f"{name:40s} {dt:8.2f} ms", flush=True)
    except Exception as e:
        print(f"{name:40s} FAILED {type(e).__name__}: {str(e)[:100]}",
              flush=True)


def main():
    print(f"devices={jax.devices()} N={N} K={K} B={B}", flush=True)
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.standard_normal((B, N)).astype(np.float32))

    @jax.jit
    def topk(x):
        return jax.vmap(lambda r: jax.lax.top_k(r, K))(x)

    @jax.jit
    def argsort_slice(x):
        def one(r):
            idx = jnp.argsort(-r)[:K]
            return r[idx], idx
        return jax.vmap(one)(x)

    @jax.jit
    def sort_pair(x):
        def one(r):
            vals, idx = jax.lax.sort(
                (-r, jnp.arange(N, dtype=jnp.int32)), num_keys=1)
            return -vals[:K], idx[:K]
        return jax.vmap(one)(x)

    @jax.jit
    def approx(x):
        return jax.vmap(lambda r: jax.lax.approx_max_k(r, K))(x)

    timeit(f"lax.top_k(k={K})", topk, s)
    timeit("argsort-neg + slice", argsort_slice, s)
    timeit("lax.sort pair + slice", sort_pair, s)
    timeit(f"approx_max_k(k={K})", approx, s)

    # the full gen_proposals per-level pattern: 5 levels of the 448 pyramid
    sizes = [37632, 9408, 2352, 588, 147]
    scores = jnp.asarray(
        rng.standard_normal((B, sum(sizes))).astype(np.float32))

    def per_level(fn_one):
        def run(x):
            def one(r):
                outs, off = [], 0
                for sz in sizes:
                    k = min(K, sz)
                    v, i = fn_one(jax.lax.dynamic_slice_in_dim(r, off, sz, 0),
                                  k)
                    outs.append((v, i + off))
                    off += sz
                return (jnp.concatenate([v for v, _ in outs]),
                        jnp.concatenate([i for _, i in outs]))
            return jax.vmap(one)(x)
        return jax.jit(run)

    timeit("5-level lax.top_k", per_level(jax.lax.top_k), scores)
    timeit("5-level sort-pair",
           per_level(lambda r, k: (lambda v, i: (-v[:k], i[:k]))(
               *jax.lax.sort((-r, jnp.arange(r.shape[0], dtype=jnp.int32)),
                             num_keys=1))), scores)


if __name__ == "__main__":
    main()
