"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the TPU-native analog of a fake multi-node backend (SURVEY.md §4):
sharding/collective correctness is validated on host devices; the real chip
is only used by bench.py.

The environment pins JAX_PLATFORMS=axon (single real TPU) via a sitecustomize
that registers the PJRT plugin at interpreter start, so we must override the
platform through jax.config *after* import but before backend init.
"""

import os

# XLA reads this env var at backend init (which happens on first device use,
# after conftest) — safe to set here.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = os.environ.get("MTP_TEST_PLATFORM", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compile cache: the slow lane is dominated by jit compiles of
# the big train-step programs on this 1-core host — cached reruns of the
# full slow lane drop from ~55 min to minutes.
_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

assert jax.devices()[0].platform == os.environ["JAX_PLATFORMS"], (
    "test platform override failed", jax.devices())
